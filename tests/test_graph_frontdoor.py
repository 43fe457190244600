"""The shared materialized edge front door (r5 verdict #1) and the
bucketed HITS twin (r5 verdict #2).

Every graph_* plan reads its edge relation through
plans.graph_q._materialized_edges, which writes the derived relation
to a write-once scratch parquet ONCE per (application, sf_dir,
derivation) and hands every later caller a plain scan of the written
files — the in-session form of the 100 TB pattern (materialize the
edge relation once, run every graph workload against it). These tests pin that the
amortization is real (one build per key, identity-stable returns,
survives spark.catalog.clearCache()), that the cache keys distinguish
what must be distinguished, and that the SHUFFLE_HASH HITS twin is
bit-identical to the broadcast plan while sharing its oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wsprnet_scraper_spark.plans import QUERIES, graph_q


def _fresh(spark):
    graph_q.clear_edge_cache()
    spark.catalog.clearCache()


def test_one_build_per_key_and_identity_stable(spark, monkeypatch):
    _fresh(spark)
    builds = []
    orig = graph_q._materialized_edges

    def counting(sp, sf_dir, kind, build):
        def counted_build():
            builds.append(kind)
            return build()

        return orig(sp, sf_dir, kind, counted_build)

    monkeypatch.setattr(graph_q, "_materialized_edges", counting)
    try:
        e1 = graph_q._edges(spark, SF_SMOKE)
        e2 = graph_q._edges(spark, SF_SMOKE)
        s1 = graph_q._sliced_edges(spark, SF_SMOKE)
        s2 = graph_q._sliced_edges(spark, SF_SMOKE + "/")  # normalized
        p1 = graph_q._copurchase_pairs(spark, SF_SMOKE)
        # one build per derivation, no matter how many callers
        assert builds == [
            "full_directed", "sliced_directed", "copurchase_pairs"
        ]
        # the sliced relation is the SAME materialized DataFrame object
        assert s1 is s2
        # _edges symmetrizes on top of the one shared directed
        # relation: both calls see identical content
        assert e1.count() == e2.count() > 0
        assert p1.columns == ["a", "b"]
    finally:
        graph_q.clear_edge_cache()


def test_materialization_survives_clearCache(spark):
    """The probe discipline clears CacheManager before every timed
    run; the front door must NOT live there (localCheckpoint is a new
    lineage root, not a cached plan), or the amortization would be an
    artifact of cache hits the probe deliberately forbids."""
    _fresh(spark)
    try:
        e = graph_q._sliced_edges(spark, SF_SMOKE)
        n = e.count()
        spark.catalog.clearCache()
        e2 = graph_q._sliced_edges(spark, SF_SMOKE)
        assert e2 is e
        assert e2.count() == n
        # and the plan is a parquet scan of the written edge files,
        # not the join derivation
        plan = e2._jdf.queryExecution().simpleString()
        assert "parquet" in plan.lower() and "Join" not in plan
    finally:
        graph_q.clear_edge_cache()


def test_clear_edge_cache_releases_and_rebuilds(spark):
    _fresh(spark)
    try:
        e1 = graph_q._sliced_edges(spark, SF_SMOKE)
        rows1 = sorted(map(tuple, e1.collect()))
        graph_q.clear_edge_cache()  # deletes the backing files too
        e2 = graph_q._sliced_edges(spark, SF_SMOKE)
        assert e1 is not e2
        assert sorted(map(tuple, e2.collect())) == rows1
    finally:
        graph_q.clear_edge_cache()


def test_hits_bucketed_bit_identical_and_no_broadcast(spark):
    _fresh(spark)
    try:
        broad = QUERIES["graph_hits"](spark, SF_SMOKE)
        brows = sorted(map(tuple, broad.collect()))
        bucketed = QUERIES["graph_hits_bucketed"](spark, SF_SMOKE)
        krows = sorted(map(tuple, bucketed.collect()))
    finally:
        graph_q.clear_edge_cache()
    assert brows == krows and len(brows) > 0
    # the twin shares graph_hits's oracle registration
    from wsprnet_scraper_spark.plans import ORACLE

    assert ORACLE["graph_hits_bucketed"] == ORACLE["graph_hits"]


def test_hits_bucketed_halfstep_plan_pins_shuffle_hash(spark):
    """The strategy dial must survive into the physical plan: a
    half-step join of scores against edges under strategy='bucketed'
    is a ShuffledHashJoin, never a BroadcastHashJoin (AQE would flip
    a small score table back to broadcast without the hint)."""
    from wsprnet_scraper_spark.operators.graph import hits_quantized

    _fresh(spark)
    edges = spark.createDataFrame(
        [(i, (i * 7) % 5 + 100) for i in range(40)], "src long, dst long"
    )
    # capture the first half-step join plan by building it the way
    # hits_quantized does under the bucketed strategy
    hub = edges.select("src").distinct().select(
        F.col("src").alias("nid"), F.lit(1_000_000).cast("bigint").alias("h")
    )
    stepped = edges.join(hub.hint("shuffle_hash"), edges.src == hub.nid)
    plan = stepped._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # and the full bucketed run agrees with broadcast on a graph with
    # asymmetric hub/authority structure
    a = sorted(map(tuple, hits_quantized(edges, 2, strategy="broadcast").collect()))
    b = sorted(map(tuple, hits_quantized(edges, 2, strategy="bucketed").collect()))
    assert a == b and len(a) > 0


def _exchange_keys_by_plan_id(df):
    """(key_column -> count) over DISTINCT Exchange plan_ids in the
    printed physical plan — cached subtrees print the same plan_id at
    every reference, so deduping by id counts each real exchange
    once."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    seen = {}
    for m in re.finditer(r"Exchange hashpartitioning\((\w+)#\d+", plan):
        pid = re.search(r"plan_id=(\d+)", plan[m.start() : m.start() + 200])
        if pid:
            seen[pid.group(1)] = m.group(1)
    from collections import Counter

    return Counter(seen.values())


def test_pagerank_bucketed_supersteps_reuse_edge_distribution(spark):
    """r6 verdict #8: the bucketed PageRank's 100× cost claim is that
    the edge relation shuffles onto hash(src) ONCE and every
    superstep reuses that distribution. With a lazy edge persist the
    cached plan's partitioning is unknown at planning time and
    EnsureRequirements inserts one EDGE-SIZED src-exchange per round
    (the 24.8 s vs 17.4 s probe gap); the eager materialization in
    pagerank_quantized fixes it. Pin the invariants:
    - dst-keyed exchanges == visible rounds (the per-round aggregate,
      the only per-superstep exchange);
    - src-keyed (edge-sized) exchanges are BUILD-ONLY: the count does
      not grow with iterations;
    - nid-keyed rank re-exchanges appear only at localCheckpoint
      truncation boundaries (the checkpointed RDD's AQE-coalesced
      partitioning can't be proven compatible), never per round."""
    from wsprnet_scraper_spark.operators.graph import pagerank_quantized

    _fresh(spark)

    def counts(iters):
        spark.catalog.clearCache()
        edges = spark.range(0, 2000).selectExpr(
            "id % 97 AS src", "(id * 7) % 97 AS dst"
        )
        return _exchange_keys_by_plan_id(
            pagerank_quantized(edges, iterations=iters, strategy="bucketed")
        )

    c3, c6 = counts(3), counts(6)
    assert c3["dst"] == 3 and c3["nid"] == 0, c3
    # checkpoint at round 3 truncates rounds 1-3 out of the printed
    # plan: 3 visible rounds, and at most one nid re-exchange at the
    # truncation boundary
    assert c6["dst"] == 3 and c6["nid"] <= 1, c6
    # the edge side never re-exchanges per round: same fixed build
    # count at 3 and 6 iterations
    assert c3["src"] == c6["src"], (c3, c6)
    spark.catalog.clearCache()
