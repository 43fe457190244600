"""Plan-shape assertions for the time-series/OLAP analytics suite.

Same discipline as test_plan_properties: correctness is the DuckDB
differential's job; these pin the physical properties that keep the
hypertable-style queries viable at 100 TB — single-shuffle rollups,
pruned scans, broadcast of the reduced sides, no cartesian products.
"""

from __future__ import annotations

import re

from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_time_bucket_scan_prunes_and_partial_aggs(spark):
    plan = _plan(QUERIES["agg_time_bucket"](spark, SF))
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # the rollup touches ts/event_type/user_id/value only — props and
    # event_id must not be read (at 100 TB props is most of the bytes)
    assert "props" not in scan and "event_id" not in scan, scan
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


def test_time_bucket_single_scan(spark):
    # all four measures (count, distinct users, decimal sum) come out
    # of ONE pass over events — no self-join fan-out
    plan = _plan(QUERIES["agg_time_bucket"](spark, SF))
    assert plan.count("FileScan") == 1, plan


def test_gapfill_grid_sides_are_broadcast(spark):
    plan = _plan(QUERIES["agg_time_gapfill"](spark, SF))
    # the dense grid (hour sequence × distinct types) joins the rollup
    # via broadcast — the aggregated side never re-shuffles for the
    # grid join; and the LOCF window is partitioned (never global)
    assert "BroadcastExchange" in plan, plan
    assert "Window" in plan
    assert re.search(r"Window \[last", plan), plan


def test_filtered_agg_is_one_pass(spark):
    plan = _plan(QUERIES["agg_filtered"](spark, SF))
    assert plan.count("FileScan") == 1, plan
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    schema = scan.split("ReadSchema:")[1]
    assert "props" not in schema and "ts:" not in schema, scan


def test_argmax_is_single_aggregate_no_join(spark):
    # max_by folds the argmax into the same hash aggregate — the
    # oracle's max-then-join-back shape (two scans) is exactly what
    # the Spark plan must NOT do
    plan = _plan(QUERIES["agg_argmax"](spark, SF))
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan


def test_moments_single_exchange(spark):
    plan = _plan(QUERIES["agg_stats_moments"](spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


def test_retention_broadcasts_firsts(spark):
    plan = _plan(QUERIES["evt_retention"](spark, SF))
    # per-user firsts (≤ #users rows) must broadcast back onto the
    # activity set — the big side joins without a shuffle
    assert "BroadcastHashJoin" in plan, plan


def test_cross_join_is_broadcast_nested_loop(spark):
    plan = _plan(QUERIES["join_cross"](spark, SF))
    # both sides reduced before the product; the product itself must
    # be a broadcast nested-loop, never a shuffled CartesianProduct
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_full_outer_joins_reduced_side(spark):
    plan = _plan(QUERIES["join_full_outer"](spark, SF))
    assert "FullOuter" in plan, plan
    # the events side is pre-aggregated below the join: the join input
    # is the groupBy output, not raw events
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
