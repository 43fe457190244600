"""Graph-analytics tests: hand-computed quantized PageRank, plan
shape of the superstep loop, and stream-stream join ≡ batch join."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators.graph import pagerank_quantized
from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_pagerank_hand_computed_path_graph(spark):
    # undirected path 1-2-3: deg 1,2,1. Three damped rounds in exact
    # integer micro-units, worked by hand.
    e0 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r.nid: r.rank_q for r in pagerank_quantized(edges, 3).collect()}
    assert got == {1: 629187, 2: 1741625, 3: 629187}


def test_pagerank_mass_is_conserved_approximately(spark):
    # integer flooring can only leak mass downward (≤ deg-1 units per
    # source per round, plus 1 for the damping floor) — on this graph
    # that is well under 1% of total mass across 3 rounds
    df = QUERIES["graph_pagerank"](spark, SF)
    rows = df.collect()
    n = len(rows)
    total = sum(r.rank_q for r in rows)
    assert n * 1_000_000 * 0.99 < total <= n * 1_000_000


def test_pagerank_three_supersteps_in_plan(spark):
    plan = QUERIES["graph_pagerank"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    # one degree aggregation + 3 per-round (dst) aggregations, each
    # preceded by a rank-onto-edges join; partial aggs double the count
    assert len(re.findall(r"HashAggregate", plan)) >= 8, plan
    assert len(re.findall(r"Join", plan)) >= 4, plan


def test_stream_join_equals_batch_join(spark):
    got = sorted(
        (r.click_id, r.error_id, r.user_id, r.lag_us)
        for r in QUERIES["strm_stream_join"](spark, SF).collect()
    )
    from wsprnet_scraper_spark.sources import load_events

    ev = load_events(spark, SF)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("cts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("u2"),
        F.col("ts").alias("ets"),
    )
    want = sorted(
        (r.click_id, r.error_id, r.user_id, r.lag_us)
        for r in c.join(
            e,
            (c.user_id == e.u2)
            & (e.ets >= c.cts)
            & (e.ets <= c.cts + F.expr("INTERVAL 120 MINUTES")),
        )
        .select(
            "click_id",
            "error_id",
            "user_id",
            (F.unix_micros("ets") - F.unix_micros("cts")).alias("lag_us"),
        )
        .collect()
    )
    assert got == want and len(got) > 0
