"""Continuous rollup: TimescaleDB continuous-aggregate analog.

The reference's sink is a TimescaleDB hypertable whose natural
companion is a continuous aggregate (time_bucket rollup maintained
incrementally). Spark-native equivalent: a streaming windowed
aggregation in UPDATE mode feeding a foreachBatch *merge* into a
materialized rollup table — each micro-batch emits only the
(bucket, key) groups it touched, and the merge replaces exactly those
rows. Cost per batch is O(touched groups + rollup size for the
rewrite); the rollup is aggregated data, orders of magnitude smaller
than the stream.

The materialized table is versioned parquet (write-new-version then
swap a pointer file) so readers never see a half-written table and a
failed batch can't corrupt the current version — the same
stage-and-swap idea as SURVEY §4.1's single-transaction batch load.
With a JDBC sink the merge collapses to INSERT ... ON CONFLICT
UPDATE on the (bucket, keys) primary key.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RollupTable:
    """Versioned parquet materialization with an atomic 'current' pointer."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.root = Path(path)
        self.root.mkdir(parents=True, exist_ok=True)

    @property
    def _pointer(self) -> Path:
        return self.root / "_CURRENT"

    def current(self) -> DataFrame | None:
        if not self._pointer.exists():
            return None
        return self.spark.read.parquet(str(self.root / self._pointer.read_text()))

    def swap_in(self, df: DataFrame, version: int) -> None:
        vdir = f"v{version}"
        df.write.mode("overwrite").parquet(str(self.root / vdir))
        tmp = self._pointer.with_suffix(".tmp")
        tmp.write_text(vdir)
        tmp.replace(self._pointer)  # atomic pointer swap


def continuous_rollup(
    stream: DataFrame,
    rollup: RollupTable,
    time_col: str,
    key_cols: list[str],
    value_col: str,
    bucket: str = "2 minutes",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Maintain `rollup` = SELECT bucket, keys, count(*), sum(value)
    GROUP BY bucket, keys over the whole stream history.

    UPDATE output mode means each micro-batch delivers only the groups
    whose aggregates changed; the merge anti-joins them out of the
    current table and unions the fresh values in. Returns the query.
    """
    win = F.window(F.col(time_col), bucket).alias("w")
    agg = stream.groupBy(win, *key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("double")).alias("sum_value"),
    )
    flat = agg.select(
        F.unix_timestamp("w.start").alias("bucket_start_s"), *key_cols, "n", "sum_value"
    )
    merge_keys = ["bucket_start_s", *key_cols]

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.cache()
        try:
            cur = rollup.current()
            if cur is None:
                merged = fresh
            else:
                kept = cur.join(
                    fresh.select(*merge_keys), on=merge_keys, how="left_anti"
                )
                merged = kept.unionByName(fresh)
            rollup.swap_in(merged, batch_id)
        finally:
            fresh.unpersist()

    writer = flat.writeStream.foreachBatch(merge).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
