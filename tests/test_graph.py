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


def test_pagerank_bucketed_bit_identical_to_broadcast(spark):
    e0 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    bc = {r.nid: r.rank_q for r in pagerank_quantized(edges, 3).collect()}
    bk = {
        r.nid: r.rank_q
        for r in pagerank_quantized(edges, 3, strategy="bucketed").collect()
    }
    assert bc == bk == {1: 629187, 2: 1741625, 3: 629187}


def test_pagerank_bucketed_never_broadcasts_ranks(spark):
    # the whole point of the bucketed dial: nothing node-sized may be
    # broadcast, even after AQE replanning (the SHUFFLE_HASH hint pins
    # it) — check the FINAL adaptive plan, post-execution
    df = QUERIES["graph_pagerank_bucketed"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the edge DERIVATION (orders ⋈ lineitem) may legitimately
    # broadcast at this SF — AQE sizes that at runtime — but no join
    # against the rank relation (right key nid) may ever be broadcast,
    # and the supersteps must run as shuffled hash joins: deg attach +
    # one per iteration
    assert not re.search(r"BroadcastHashJoin \[[^\]]*\], \[nid#", plan), plan
    assert len(re.findall(r"ShuffledHashJoin", plan)) >= 4, plan


def test_pagerank_bucketed_checkpoint_truncates_lineage(spark):
    e0 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    def rank_joins(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # a superstep's signature: shuffled hash join whose right
        # (build) key is the rank relation's nid
        return plan, len(re.findall(r"ShuffledHashJoin \[[^\]]*\], \[nid#", plan))

    plan_ck, n_ck = rank_joins(
        pagerank_quantized(edges, 6, strategy="bucketed", checkpoint_every=2)
    )
    _, n_full = rank_joins(
        pagerank_quantized(edges, 6, strategy="bucketed", checkpoint_every=0)
    )
    # checkpoints at rounds 2 and 4 cut the unrolled lineage: the
    # final plan is rooted at the materialized RDD and holds only the
    # post-checkpoint rounds, never all 6
    assert "ExistingRDD" in plan_ck, plan_ck
    assert n_full >= 6, n_full
    assert n_ck <= 2, plan_ck


def test_kcore_peels_to_known_core(spark):
    """Triangle {1,2,3} plus a tail 3-4-5: the 2-core is exactly the
    triangle (peeling removes 5, then 4), and every survivor keeps
    degree 2. A second round after the fixed point changes nothing."""
    from wsprnet_scraper_spark.operators.graph import kcore

    e0 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    sym = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r["nid"]: r["deg"] for r in kcore(sym, 2, rounds=5).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_k_too_high_empties(spark):
    from wsprnet_scraper_spark.operators.graph import kcore

    e0 = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    sym = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    assert kcore(sym, 3, rounds=4).count() == 0


def test_label_propagation_two_cliques_converge(spark):
    """Two triangles bridged by one edge: after enough synchronous
    rounds each triangle agrees on its minimum member id (the
    neighbor-majority + smallest-label tie rule pulls 1 through
    triangle {1,2,3} and 4 through {4,5,6}; the single bridge vote
    is always outvoted by the two in-clique votes)."""
    from wsprnet_scraper_spark.operators.graph import label_propagation

    e0 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    sym = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r["nid"]: r["label"] for r in label_propagation(sym, 4).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6]


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    """A path 1-2-3: node 2 sees labels {1, 3} with equal counts and
    must take 1 (count DESC, label ASC) — pinning the deterministic
    tie rule the oracle replays."""
    from wsprnet_scraper_spark.operators.graph import label_propagation

    e0 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    sym = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    one = {r["nid"]: r["label"] for r in label_propagation(sym, 1).collect()}
    # generation 1: each node = mode of NEIGHBOR labels (not its own)
    assert one == {1: 2, 2: 1, 3: 2}


def test_bfs_layers_path_graph_exact_distances(spark):
    """Path 1-2-3-4-5 from source 1: layer = exact hop distance,
    capped by rounds (rounds=2 never reaches 4 or 5)."""
    from wsprnet_scraper_spark.operators.graph import bfs_layers

    e0 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    sym = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    src = sym.agg(F.min("src").alias("nid"))
    got = {r["nid"]: r["layer"] for r in bfs_layers(sym, src, 4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    capped = {r["nid"]: r["layer"] for r in bfs_layers(sym, src, 2).collect()}
    assert capped == {1: 0, 2: 1, 3: 2}


def test_bfs_layers_stops_at_component_boundary(spark):
    """Two components: BFS from the min node never crosses into the
    other component, and the early exit on an empty frontier returns
    the fixed point."""
    from wsprnet_scraper_spark.operators.graph import bfs_layers

    e0 = spark.createDataFrame([(1, 2), (10, 11)], "src long, dst long")
    sym = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    src = sym.agg(F.min("src").alias("nid"))
    got = {r["nid"]: r["layer"] for r in bfs_layers(sym, src, 6).collect()}
    assert got == {1: 0, 2: 1}


def test_triangle_count_crafted_graphs(spark):
    """Exact census on hand-countable graphs — the focused guard for
    the r13 edge-iterator rewrite (adjacency-array intersection in
    place of the wedge-materializing node-iterator). Covers the
    all-dropped-closing case (star: no dst has out-edges, the sum
    must coalesce to 0, not NULL), shared-edge triangles, and K4."""
    from wsprnet_scraper_spark.operators.graph import triangle_count

    def census(pairs):
        df = spark.createDataFrame(pairs, "a long, b long")
        r = triangle_count(df).collect()[0]
        return (r.n_nodes, r.n_edges, r.n_triangles)

    # K4: C(4,3) = 4 triangles, 6 edges
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert census(k4) == (4, 6, 4)
    # two triangles sharing edge (2,3)
    bowtie = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    assert census(bowtie) == (4, 5, 2)
    # star around 1: wedges exist, zero triangles (all-dropped closing)
    star = [(1, 2), (1, 3), (1, 4), (1, 5)]
    assert census(star) == (5, 4, 0)
    # single edge and a path: zero triangles
    assert census([(7, 9)]) == (2, 1, 0)
    assert census([(1, 2), (2, 3), (3, 4)]) == (4, 3, 0)
    # triangle + pendant vertex
    assert census([(1, 2), (1, 3), (2, 3), (3, 9)]) == (4, 4, 1)
