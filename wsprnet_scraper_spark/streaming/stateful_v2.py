"""Custom stateful streaming via transformWithStateInPandas (the
Spark 4 arbitrary-state API, successor to applyInPandasWithState).

Same per-key cross-batch accounting as streaming/stateful.py, but on
the new StatefulProcessor surface: typed ValueState handles backed by
the RocksDB state store, explicit init/close lifecycle, and (unlike
the old API) state that composes with timers and multiple state
variables. The processor keeps a per-user running event count and
running decimal-cents value total across micro-batches — the
unbounded-stream form of a per-key ledger.

Worker-import note: the processor class lives at package module level
(cloudpickle serializes it by reference; get_session ships the
package to executors on PYTHONPATH). Value totals are integer cents —
cross-batch float accumulation would be order-dependent.

Dependency gate: Spark's transformWithState protocol speaks protobuf
between the JVM and the Python state server; this container has no
google.protobuf, so `user_ledger` raises NotImplementedError up front
(same gate pattern as the psycopg2/Pillow transports) and the
processor's accounting logic is unit-tested directly. On a cluster
with protobuf installed the streaming path runs as written —
`tests/test_stateful_v2.py::test_ledger_streaming_e2e` executes it
whenever the import succeeds.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


LEDGER_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ]
)


class UserLedgerProcessor(StatefulProcessor):
    """Per-user running (count, integer-cents total) ledger."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("ledger", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n = 0
        cents = 0
        for pdf in rows:
            n += len(pdf)
            # quantize per row BEFORE summing: exact integer math
            cents += int(
                (pdf["value"] * 100).round().astype("int64").sum()
            )
        if self._state.exists():
            prev_n, prev_cents = self._state.get()
            n += int(prev_n)
            cents += int(prev_cents)
        self._state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def user_ledger(events: DataFrame) -> DataFrame:
    """Wire the processor over a (streaming or batch) events frame.

    Partitioned by user_id: state shards across executors with the
    key space, the transformWithState contract — no driver state, no
    single-task reduce, unbounded key cardinality."""
    if not _protobuf_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (the "
            "JVM<->Python state-server protocol); not present in this "
            "environment — use streaming.stateful (applyInPandasWithState) "
            "which covers the same per-key state semantics"
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserLedgerProcessor(),
            outputStructType=LEDGER_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
