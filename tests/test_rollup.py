"""Continuous rollup: incremental merges must equal the batch aggregate."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from wsprnet_scraper_spark.streaming.rollup import RollupTable, continuous_rollup

SCHEMA = StructType(
    [
        StructField("ts", StringType()),
        StructField("band", StringType()),
        StructField("distance", StringType()),
    ]
)


def _land(landing, name, rows):
    landing.mkdir(exist_ok=True)
    (landing / name).write_text(
        "\n".join(
            json.dumps({"ts": t, "band": b, "distance": str(d)}) for t, b, d in rows
        )
        + "\n"
    )


def _run(spark, landing, rollup, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .json(str(landing))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("distance", F.col("distance").cast("double"))
    )
    q = continuous_rollup(
        stream, rollup, "ts", ["band"], "distance", checkpoint_dir=str(ckpt)
    )
    q.awaitTermination()


def test_continuous_rollup_incremental(spark, tmp_path):
    landing = tmp_path / "landing"
    rollup = RollupTable(spark, str(tmp_path / "rollup"))
    ckpt = tmp_path / "ckpt"

    _land(landing, "b1.json", [
        ("2024-01-01 00:00:30", "20", 100),
        ("2024-01-01 00:01:10", "20", 200),
        ("2024-01-01 00:00:40", "40", 50),
    ])
    _run(spark, landing, rollup, ckpt)
    t1 = {(r["bucket_start_s"], r["band"]): (r["n"], r["sum_value"])
          for r in rollup.current().collect()}
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert t1[(base, "20")] == (2, 300.0)
    assert t1[(base, "40")] == (1, 50.0)

    # batch 2 touches bucket (base, 20) again and adds a new bucket;
    # the merge must update the touched group and keep the untouched one
    _land(landing, "b2.json", [
        ("2024-01-01 00:01:50", "20", 25),
        ("2024-01-01 00:02:05", "20", 75),
    ])
    _run(spark, landing, rollup, ckpt)
    t2 = {(r["bucket_start_s"], r["band"]): (r["n"], r["sum_value"])
          for r in rollup.current().collect()}
    assert t2[(base, "20")] == (3, 325.0)   # updated in place
    assert t2[(base, "40")] == (1, 50.0)    # untouched, survived the merge
    assert t2[(base + 120, "20")] == (1, 75.0)  # new bucket

    # final state == one-shot batch aggregate over everything landed
    batch = (
        spark.read.schema(SCHEMA).json(str(landing))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("distance", F.col("distance").cast("double"))
        .groupBy(F.window("ts", "2 minutes").alias("w"), "band")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("distance").alias("sum_value"))
        .select(F.unix_timestamp("w.start").alias("b"), "band", "n", "sum_value")
    )
    want = {(r["b"], r["band"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    assert t2 == want
