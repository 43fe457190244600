"""Loaders for the driver test tables (TPC-H-ish star schema + events).

`load` is a thin parquet scan — Catalyst handles column pruning and
predicate pushdown, so callers just read and filter/select.

`load_events` papers over a reader gap: events.parquet stores its
`ts` column as parquet TIMESTAMP(NANOS), which Spark's vectorized
reader rejects outright. With spark.sql.legacy.parquet.nanosAsLong
(set in session.py) the column arrives as Long nanoseconds; the
conversion to TimestampType must use integer division (`div 1000`) —
a float division of an int64 epoch-nanos loses precision above 2^53.
DuckDB truncates ns->us on read the same way, so both engines see
identical microsecond timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "events")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
