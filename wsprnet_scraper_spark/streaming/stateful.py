"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only cross-batch state is the scalar spotnum cursor,
which `ingest.GapMonitor` keeps as driver state (SURVEY §7.3.6). This
module adds the *distributed* form for state that doesn't fit a
driver scalar: per-key sequence tracking over an unbounded stream —
each key (e.g. reporter) carries its last-seen id and accumulated gap
count across micro-batches, partitioned by key across executors.

This is the applyInPandasWithState shape from the brief: Arrow-batched
per-group pandas processing with a GroupState per key, timeout-free
(spot sequences never expire in the reference's model).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("last_id", LongType()),
        StructField("total_gaps", LongType()),
        StructField("total_missing", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("batch_rows", IntegerType()),
        StructField("last_id", LongType()),
        StructField("total_gaps", LongType()),
        StructField("total_missing", LongType()),
    ]
)


def _track_group(key, pdf_iter, state: GroupState):
    """Per-key sequence tracker: folds each micro-batch's sorted ids
    into (last_id, total_gaps, total_missing) carried in GroupState."""
    last_id, total_gaps, total_missing = (
        state.get if state.exists else (None, 0, 0)
    )
    n = 0
    for pdf in pdf_iter:
        for sid in sorted(int(v) for v in pdf["id"]):
            if last_id is not None and sid > last_id + 1:
                total_gaps += 1
                total_missing += sid - last_id - 1
            if last_id is None or sid > last_id:
                last_id = sid
            n += 1
    state.update((last_id, total_gaps, total_missing))
    yield pd.DataFrame(
        [
            {
                "key": key[0],
                "batch_rows": n,
                "last_id": last_id,
                "total_gaps": total_gaps,
                "total_missing": total_missing,
            }
        ]
    )


def track_sequences(stream: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Streaming per-key gap tracking. Input: any streaming DataFrame
    with (key_col, id_col); output: one update row per key per
    micro-batch with the cumulative telemetry."""
    from pyspark.sql import functions as F

    keyed = stream.select(
        F.col(key_col).alias("key"), F.col(id_col).cast("long").alias("id")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _track_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
