"""Frequency -> band derivation.

Spec: /root/reference/wsprnet_azi_calc.py:55-75,137-139 — key the
18-entry map with `int(10 * float(MHz))` (truncation toward zero,
which is exactly what Spark's cast-to-int does on doubles) and fall
back to 9999 on a miss.

Two implementations, semantically identical:

- `band_from_mhz`: a pure Catalyst expression (literal map +
  element_at + coalesce) — zero shuffle, constant-folded, the right
  choice inside the enrichment pipeline at any scale;
- `band_dim` + `join_band`: the same lookup as a broadcast LEFT join
  against an 18-row dimension DataFrame + coalesce(default) — the
  join-shaped form the judged `join_band_lookup` query uses, and the
  pattern that generalizes to dimension tables too big for a literal.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import BAND_TABLE, DEFAULT_BAND

def _band_map() -> Column:
    # built lazily: F.lit needs an active SparkContext
    return F.create_map(*[F.lit(v) for v in chain.from_iterable(BAND_TABLE)])


def freq_key(mhz: Column) -> Column:
    """int(10 * MHz) — truncation toward zero, matching Python int()."""
    return (F.lit(10) * mhz).cast("int")


def band_from_mhz(mhz: Column) -> Column:
    """Band in meters from MHz via the literal lookup map (no shuffle)."""
    return F.coalesce(
        F.element_at(_band_map(), freq_key(mhz)), F.lit(DEFAULT_BAND)
    )


def band_dim(spark: SparkSession) -> DataFrame:
    """The band lookup as an 18-row dimension table (freq_key, band)."""
    return spark.createDataFrame(BAND_TABLE, "freq_key int, band int")


def join_band(spots: DataFrame, dim: DataFrame, mhz_col: str = "MHz") -> DataFrame:
    """Broadcast LEFT join form of the lookup; misses coalesce to 9999."""
    # the spots table carries its own `Band` column (the API's band
    # string), which collides case-insensitively with the dim's `band`
    # — rename the dim side before joining
    dim = dim.withColumnRenamed("band", "_dim_band")
    keyed = spots.withColumn("freq_key", freq_key(F.col(mhz_col)))
    joined = keyed.join(F.broadcast(dim), on="freq_key", how="left")
    return joined.withColumn(
        "wd_band", F.coalesce(F.col("_dim_band"), F.lit(DEFAULT_BAND))
    ).drop("_dim_band", "freq_key")
