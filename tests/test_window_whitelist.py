"""Engine-wide window policy enforcement (VERDICT r1 item 3).

Every registered query's optimized plan is audited: no Window may
have an empty partition spec, and the pinned (`partitionBy(lit(0))`)
single-partition idiom is only legal over already-reduced input
(block summaries, per-cell counts). This turns SCALE.md's argued
whitelist into a failing test — a new query can't silently
reintroduce the single-task global sort.
"""

from __future__ import annotations

import pytest

from wsprnet_scraper_spark.plans import QUERIES
from wsprnet_scraper_spark.plans.audit import audit_windows, window_policy_violations

SF = "/root/testdata/sf0.001"

# queries whose construction runs a real structured stream (their
# returned frame is a memory-sink read; windows inside the stream are
# covered by their own plan tests) — auditing them here would just
# re-run the stream
_STREAM_BUILDS = {
    "strm_ingest_e2e",
    "strm_microbatch",
    "strm_watermark",
    "strm_tumbling",
    "strm_sliding",
    "strm_session",
    "strm_dedup_watermark",
    "strm_atleastonce_dedup",
    "strm_rate_limited",
}


@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if n not in _STREAM_BUILDS)
)
def test_no_unpartitioned_windows(spark, name):
    df = QUERIES[name](spark, SF)
    bad = window_policy_violations(df)
    assert not bad, f"{name}: {bad}"


def test_sanctioned_tiny_windows_are_seen_and_reduced(spark):
    # guard against the audit being vacuous: the block-summary
    # queries DO have single-partition windows, and the audit proves
    # each one sits on reduced input
    tiny = [
        w
        for w in audit_windows(QUERIES["agg_gap_stats"](spark, SF))
        if w["spec"] != "partitioned"
    ]
    assert tiny and all(w["reduced"] for w in tiny), tiny


def test_audit_flags_naked_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert window_policy_violations(df), "audit must flag the naked window"
    # a lit(0) pin over unreduced input is equally illegal (Catalyst
    # folds the pin away; the audit must still catch it)
    df2 = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("id"))
    )
    assert window_policy_violations(df2), "pin over unreduced input must flag"
