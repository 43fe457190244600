"""Storage-layout maintenance tests: small-file compaction and
Z-order clustering."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from wsprnet_scraper_spark.sources import load_events
from wsprnet_scraper_spark.sources.sinks import (
    _morton_interleave,
    compact_dir,
    write_clustered,
)

SF = "/root/testdata/sf0.001"


def test_morton_known_values(spark):
    df = spark.createDataFrame([(3, 5), (1, 0), (0, 1)], "a long, b long")
    got = [
        r.z
        for r in df.select(
            _morton_interleave(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    # interleave(3,5): a bits -> even positions (1+4), b bits -> odd
    # positions (2+32) = 39; (1,0) -> 1; (0,1) -> 2
    assert got == [39, 1, 2]


def test_compact_preserves_content_and_merges_files(spark):
    ev = load_events(spark, SF).select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/frag"
        ev.repartition(24).write.parquet(path)
        before = sorted(map(str, spark.read.parquet(path).collect()))
        stats = compact_dir(spark, path)
        assert stats["files_before"] >= 24
        assert stats["files_after"] == 1  # tiny data, one target file
        after = sorted(map(str, spark.read.parquet(path).collect()))
        assert before == after


def test_compact_noop_below_min_files(spark):
    ev = load_events(spark, SF).limit(10)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/single"
        ev.coalesce(1).write.parquet(path)
        stats = compact_dir(spark, path)
        assert stats["files_before"] == stats["files_after"] == 1


def test_clustered_files_cover_disjoint_morton_ranges(spark):
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity")
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/zorder"
        write_clustered(li, path, "l_orderkey", "l_partkey", n_files=4)
        import glob

        parts = sorted(glob.glob(f"{path}/part-*.parquet"))
        assert len(parts) == 4
        ranges = []
        for p in parts:
            f = spark.read.parquet(p)
            r = f.select(
                F.min(
                    _morton_interleave(F.col("l_orderkey"), F.col("l_partkey"))
                ).alias("lo"),
                F.max(
                    _morton_interleave(F.col("l_orderkey"), F.col("l_partkey"))
                ).alias("hi"),
            ).first()
            ranges.append((r.lo, r.hi))
        # repartitionByRange guarantees non-overlapping per-file key
        # rectangles — the property min-max pruning depends on
        ranges.sort()
        for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
            assert hi_prev <= lo_next
        # and the layout is lossless
        back = spark.read.parquet(path)
        assert back.count() == li.count()


def test_delete_keys_anti_join_rewrite(spark):
    import tempfile

    from wsprnet_scraper_spark.sources.sinks import delete_keys

    ev = load_events(spark, SF).select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/tbl"
        ev.write.parquet(path)
        # ordered limit: the frame executes twice (collect + delete),
        # so the pick must be deterministic
        doomed = ev.select("user_id").distinct().orderBy("user_id").limit(7)
        doomed_ids = {r.user_id for r in doomed.collect()}
        n_doomed = ev.filter(F.col("user_id").isin(doomed_ids)).count()
        stats = delete_keys(spark, path, "user_id", doomed)
        assert stats["rows_deleted"] == n_doomed > 0
        back = spark.read.parquet(path)
        assert back.count() == stats["rows_after"]
        assert back.filter(F.col("user_id").isin(doomed_ids)).count() == 0


def test_schema_evolution_merge_read(spark):
    import tempfile

    ev = load_events(spark, SF)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/evolving"
        # v1 batch: two columns; v2 batch adds a third
        ev.select("event_id", "user_id").limit(50).write.mode(
            "append"
        ).parquet(path)
        ev.select("event_id", "user_id", "value").limit(50).write.mode(
            "append"
        ).parquet(path)
        merged = spark.read.option("mergeSchema", True).parquet(path)
        assert set(merged.columns) == {"event_id", "user_id", "value"}
        assert merged.count() == 100
        # rows from the v1 batch surface the new column as null
        assert merged.filter(F.col("value").isNull()).count() == 50
