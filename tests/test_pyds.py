"""Custom Python DataSource (wspr_queue) roundtrip tests."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from wsprnet_scraper_spark import pipeline
from wsprnet_scraper_spark.schema import SINK_COLUMNS
from wsprnet_scraper_spark.sources.pyds import WsprQueueDataSource
from wsprnet_scraper_spark.sources.sinks import write_queue_bz2

GOLDEN_JSON = "/root/repo/tests/golden/spots_input.json"


def _register(spark):
    spark.dataSource.register(WsprQueueDataSource)


def test_queue_roundtrip_through_named_format(spark):
    _register(spark)
    df = pipeline.enrich(
        pipeline.with_wd_time(pipeline.parse_json(spark, GOLDEN_JSON))
    )
    with tempfile.TemporaryDirectory() as d:
        write_queue_bz2(df, d)
        back = spark.read.format("wspr_queue").load(d)
        assert back.columns == SINK_COLUMNS
        assert back.count() == df.count() == 400
        # spot ids survive the wire exactly
        want = sorted(r.Spotnum for r in df.select("Spotnum").collect())
        got = sorted(int(r.Spotnum) for r in back.collect())
        assert got == want


def test_queue_partitions_per_file(spark):
    _register(spark)
    df = pipeline.enrich(
        pipeline.with_wd_time(pipeline.parse_json(spark, GOLDEN_JSON))
    )
    with tempfile.TemporaryDirectory() as d:
        # two appends -> at least two files -> at least two partitions
        write_queue_bz2(df.limit(5), d)
        write_queue_bz2(df.limit(5), d)
        back = spark.read.format("wspr_queue").load(d)
        assert back.rdd.getNumPartitions() >= 2
        assert back.count() == 10


def test_queue_empty_dir_is_empty_frame(spark):
    _register(spark)
    with tempfile.TemporaryDirectory() as d:
        back = spark.read.format("wspr_queue").load(d)
        assert back.count() == 0
        assert back.columns == SINK_COLUMNS


def test_queue_arity_filter_drops_malformed(spark):
    import bz2 as _bz2

    _register(spark)
    with tempfile.TemporaryDirectory() as d:
        good = ",".join(["x"] * len(SINK_COLUMNS))
        bad = "only,three,cols"
        with _bz2.open(f"{d}/q.csv.bz2", "wt") as fh:
            fh.write(f"{good}\n{bad}\n{good}\n")
        back = spark.read.format("wspr_queue").load(d)
        assert back.count() == 2


def test_queue_source_filters_pushably(spark):
    # the format composes with normal Catalyst ops downstream
    _register(spark)
    df = pipeline.enrich(
        pipeline.with_wd_time(pipeline.parse_json(spark, GOLDEN_JSON))
    )
    with tempfile.TemporaryDirectory() as d:
        write_queue_bz2(df, d)
        n_40 = (
            spark.read.format("wspr_queue")
            .load(d)
            .filter(F.col("Band") == "40")
            .count()
        )
        assert n_40 == df.filter(F.col("Band").cast("string") == "40").count()


def test_queue_streaming_drain_and_checkpoint_resume(spark):
    import tempfile

    _register(spark)
    df = pipeline.enrich(
        pipeline.with_wd_time(pipeline.parse_json(spark, GOLDEN_JSON))
    )
    with tempfile.TemporaryDirectory() as d:
        q, ckpt = f"{d}/q", f"{d}/ckpt"
        import os

        os.makedirs(q)
        write_queue_bz2(df.limit(5), q)

        got = []

        def drain():
            s = spark.readStream.format("wspr_queue").load(q)
            query = (
                s.writeStream.foreachBatch(
                    lambda b, _i: got.extend(
                        (int(r.Spotnum)) for r in b.collect()
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()

        drain()
        first = sorted(got)
        assert len(first) == 5
        # second drain from the SAME checkpoint: nothing new -> no rows
        drain()
        assert sorted(got) == first
        # append more files; a third drain picks up ONLY the new ones
        write_queue_bz2(df.limit(8), q)
        drain()
        assert len(got) == 13
