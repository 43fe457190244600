"""Partition pruning through the Hive-layout sink.

Column pruning and predicate pushdown are asserted in
test_plan_properties; this covers the third leg — DIRECTORY-level
partition pruning: a filter on the partition column must appear as a
PartitionFilter on the scan (pruned at file-listing time, before any
I/O), and only the matching partition's files may be touched.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wsprnet_scraper_spark.plans.wspr import synth_spots
from wsprnet_scraper_spark.sources.sinks import write_partitioned_sink

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def band_archive(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("archive") / "spots")
    spots = synth_spots(spark, SF).select("Spotnum", "Date", "MHz", "Band")
    write_partitioned_sink(spots, path, ["Band"])
    return path


def test_partition_filter_reaches_scan(spark, band_archive):
    df = spark.read.parquet(band_archive).filter(F.col("Band") == 20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters" in scan and "Band" in scan.split("PartitionFilters")[1], scan
    # the predicate must NOT degrade to a data filter: it's a
    # directory prune, listed away before I/O
    assert "Band#" in scan.split("PartitionFilters")[1]


def test_pruned_read_equals_filtered_full_read(spark, band_archive):
    pruned = spark.read.parquet(band_archive).filter(F.col("Band") == 20)
    full = spark.read.parquet(band_archive)
    assert pruned.count() == full.filter(F.col("Band") == 20).count()
    assert pruned.count() > 0  # the fixture actually has band-20 spots
    # round-trip: partition column survives as a readable column
    assert set(pruned.select("Band").distinct().toPandas()["Band"]) == {20}


def test_day_partitioned_prune_judged_layout(spark, tmp_path):
    # the src_partitioned_prune judged query's layout: events
    # partitioned by day; a day IN (...) filter must be a
    # PartitionFilter (directory prune), not a data filter
    from wsprnet_scraper_spark.sources import load_events

    ev = load_events(spark, SF)
    out = str(tmp_path / "by_day")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).parquet(out)
    part = spark.read.parquet(out)
    days = [r.day for r in part.select("day").distinct().orderBy("day").limit(3).collect()]
    df = part.filter(F.col("day").isin(days))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters" in scan and "day#" in scan.split("PartitionFilters")[1], scan
    assert df.count() == ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).filter(
        F.col("day").isin(days)
    ).count()


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    # the join_dpp_partitioned shape: day-partitioned fact joined to a
    # dim filtered on a non-partition attribute — the fact scan must
    # carry a dynamicpruning subquery in its PartitionFilters
    from pyspark.sql import Window as W

    from wsprnet_scraper_spark.sources import load_events

    ev = load_events(spark, SF)
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).parquet(str(tmp_path / "fact"))
    dim = (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .distinct()
        .withColumn("idx", F.dense_rank().over(W.orderBy("day")))
    )
    dim.write.parquet(str(tmp_path / "dim"))
    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim_r = spark.read.parquet(str(tmp_path / "dim"))
    df = fact.join(dim_r, "day").filter(F.col("idx") <= 3).groupBy("day").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        l for l in plan.splitlines() if "FileScan" in l and "fact" in l
    )
    assert "dynamicpruning" in scan.split("PartitionFilters")[1], scan
    assert df.count() == 3
