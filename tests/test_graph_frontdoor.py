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
