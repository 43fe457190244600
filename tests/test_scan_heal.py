"""The under-parallel-scan heal must see DIRECTORY datasets: a
Spark-written parquet table is a directory, and os.path.getsize on it
returns the inode size (~4 KB), which silently disabled the heal and
left multi-file tables running file-count-wide on a 32-core session
(caught by the 10x probe: pipeline_enrich27 slope 9.2 -> 4.0)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from wsprnet_scraper_spark.sources import load
from wsprnet_scraper_spark.sources.tables import _dataset_bytes


def test_dataset_bytes_sums_directory(tmp_path, spark):
    df = spark.range(200_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    out = str(tmp_path / "t.parquet")
    df.repartition(4).write.parquet(out)
    total = _dataset_bytes(out)
    assert total is not None and total > 1_000_000  # real bytes, not inode size


def test_heal_fires_for_multifile_directory(tmp_path, spark):
    # few big-ish files, well under cores*maxPartitionBytes -> the
    # scan would run ~2-wide; the heal must repartition to cores
    df = spark.range(400_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    sf_dir = str(tmp_path)
    df.coalesce(2).write.parquet(f"{sf_dir}/wide.parquet")
    healed = load(spark, sf_dir, "wide")
    cores = spark.sparkContext.defaultParallelism
    assert healed.rdd.getNumPartitions() == cores
    plan = healed._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan, plan
    raw = load(spark, sf_dir, "wide", parallel="never")
    raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in raw_plan, raw_plan
