"""Child process for tests/test_driver_parity.py.

Builds a VANILLA SparkSession (no engine confs — exactly what the
driver's harness owns), applies only __spark_entry__._tune(), and runs
every ts-sensitive query family against $PARITY_SF_DIR. Prints one
JSON line {query: row_count} on success; any exception is fatal.

This is the tripwire for the round-2 regression class: the testdata
regenerates every round and its parquet physical types have drifted
twice (TIMESTAMP(NANOS) in r1, naive timestamp[us] in r2/r3). The
engine's own session factory can be right while the driver's session
— which only ever sees _tune() — is broken; this child runs in a
fresh JVM so no engine-session conf can leak in.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# The 11 queries red in the driver's context in round 2 (VERDICT.md),
# i.e. one per ts-sensitive family: time-bucket analytics, asof join,
# lead/lag + sessionize windows, event funnel, and the four
# event-time streaming queries.
TS_SENSITIVE = [
    "agg_time_bucket",
    "agg_time_gapfill",
    "agg_ols_slope",
    "join_asof",
    "win_lead_lag",
    "win_sessionize",
    "evt_funnel",
    "strm_watermark",
    "strm_dedup_watermark",
    "strm_session",
    "strm_stream_join",
    # round-3 additions that touch events.ts the same ways
    "win_time_range_avg",
    "join_interval_overlap",
    "strm_rate_limited",
    "src_partitioned_prune",
]


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("driver_parity_child")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    entry_mod._tune(spark)

    # Every conf _tune claims must actually be live on the session —
    # catches a silently-immutable key before it bites a query.
    for key in (
        "spark.sql.session.timeZone",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.ansi.enabled",
    ):
        assert spark.conf.get(key) is not None, key

    qs = entry_mod.queries()
    out = {}
    for name in TS_SENSITIVE:
        out[name] = qs[name](spark, sf_dir).count()
    print("PARITY_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
