"""Physical-plan assertions for the scale-critical properties.

Correctness is gated by the DuckDB differential; these tests pin the
*plan shapes* that make the same queries viable at 100 TB — broadcast
joins for dims, partial aggregation, column pruning + predicate
pushdown reaching the parquet scan, and the zero-shuffle property of
the ANN bucket/cell assignments. A regression here wouldn't change
answers, it would change the 1000-executor bill.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from wsprnet_scraper_spark.plans import QUERIES
from wsprnet_scraper_spark.operators import similarity
from wsprnet_scraper_spark.sources import load

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_5way_join_broadcasts_dims(spark):
    plan = _plan(QUERIES["join_inner_5way"](spark, SF))
    # region/nation (and at this SF customer/supplier) are dims: the
    # join tree must broadcast them, never shuffle the fact table for
    # a dim lookup
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastExchange" in plan


def test_band_lookup_is_broadcast_left(spark):
    plan = _plan(QUERIES["join_band_lookup"](spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan


def test_group_agg_is_partial_final(spark):
    plan = _plan(QUERIES["agg_group_q1"](spark, SF))
    # map-side combine: two HashAggregate levels around one exchange
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_curation_pipeline_single_exchange(spark):
    plan = _plan(QUERIES["pipe_curation"](spark, SF))
    # score -> filter -> dedup composes into ONE shuffle (the dedup
    # groupBy); the quality filter runs map-side below it
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_column_pruning_reaches_scan(spark):
    df = load(spark, SF, "lineitem", parallel="never").select(
        "l_orderkey", "l_quantity"
    )
    scan = next(l for l in _plan(df).splitlines() if "FileScan" in l)
    assert "l_orderkey" in scan and "l_quantity" in scan
    assert "l_comment" not in scan and "l_shipdate" not in scan, scan


def test_predicate_pushdown_reaches_scan(spark):
    df = load(spark, SF, "lineitem", parallel="never").filter(
        F.col("l_quantity") > 40
    )
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_quantity,40", plan), plan


def test_lsh_bucket_assignment_zero_shuffle(spark):
    emb = load(spark, SF, "embeddings", parallel="never")
    plan = _plan(similarity.hyperplane_buckets(emb, num_planes=8))
    assert "Exchange" not in plan, plan


def test_ivf_corpus_side_zero_shuffle(spark):
    # the full sim_ivf plan's only exchanges are the broadcast of the
    # tiny query set and the final per-query top-k window — cell
    # assignment over the corpus adds none (codebook is inlined)
    plan = _plan(QUERIES["sim_ivf"](spark, SF))
    shuffles = re.findall(r"Exchange (?:hash|range|SinglePartition)\S*", plan)
    assert len(shuffles) <= 1, (shuffles, plan)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_topk1_plans_take_ordered(spark):
    plan = _plan(QUERIES["topk_1"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_sub_exists_plans_semi_join(spark):
    # EXISTS must become a semi-join (stops at first match), with the
    # correlated shipdate>orderdate predicate riding in the join
    plan = _plan(QUERIES["sub_exists"](spark, SF))
    assert "LeftSemi" in plan, plan


def test_sub_not_exists_plans_anti_join_with_pushed_filter(spark):
    # NOT EXISTS -> anti join; the o_orderpriority filter must sit
    # below the join (scan-side), not above it
    plan = _plan(QUERIES["sub_not_exists"](spark, SF))
    assert "LeftAnti" in plan, plan
    assert re.search(r"PushedFilters: \[.*o_orderpriority", plan), plan


def test_sub_scalar_avg_single_shuffle(spark):
    # the per-part average is a window over l_partkey: exactly one
    # hash exchange for the whole query (agg-then-rejoin would cost 2+)
    plan = _plan(QUERIES["sub_scalar_avg"](spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_win_sessionize_single_shuffle(spark):
    # lag + running-sum + final groupBy all share the user_id
    # distribution: one hash exchange end to end
    plan = _plan(QUERIES["win_sessionize"](spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_plan_cache_returns_same_plan_object(spark):
    a = QUERIES["agg_group_q1"](spark, SF)
    b = QUERIES["agg_group_q1"](spark, SF)
    assert a is b  # prepared-plan cache hit
    # streaming builders have side effects and must never be cached
    from wsprnet_scraper_spark.plans.registry import _PLAN_CACHE

    assert not any(k[0].startswith("strm_") for k in _PLAN_CACHE)


def test_semantic_dedup_assignment_zero_shuffle(spark):
    # cluster assignment must be a pure projection over the inlined
    # codebook; the only exchanges in the full plan are the cell
    # self-join, the dup aggregation, and the final left join — no
    # exchange may appear below the scan->assignment pipeline, and no
    # Python boundary anywhere.
    emb = load(spark, SF, "embeddings")
    assigned = similarity.semantic_dedup(emb, cache_key=SF)
    plan = _plan(assigned)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_lm_score_no_python_boundary_and_partial_aggs(spark):
    plan = _plan(QUERIES["text_lm_score"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # both count tables and the per-doc score reduce with partial
    # aggregation (map-side combine): every HashAggregate pairs
    # partial_/final
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_weighted_sample_is_map_only(spark):
    # acceptance filter is a zero-shuffle projection; the only
    # exchange allowed is the single-row max(weight) broadcast side
    plan = _plan(QUERIES["pipe_sample_weighted"](spark, SF))
    data_shuffles = re.findall(r"Exchange (?:hash|range)partitioning", plan)
    assert not data_shuffles, plan


def test_bloom_prefilter_is_scan_side(spark):
    # the inlined-bitmap membership test must evaluate below any
    # exchange on the fact side: the Filter containing element_at
    # sits directly over the parquet scan in the same codegen stage
    plan = _plan(QUERIES["join_bloom_pruned"](spark, SF))
    assert "element_at" in plan, plan
    # tree prints parents first, so "below any exchange" textually
    # means: between the bloom Filter and its child scan there is no
    # Exchange (nothing reshuffles the fact side before the filter)
    filt = plan.index("element_at")
    scan = plan.index("Scan parquet", filt)
    assert "Exchange" not in plan[filt:scan], plan[filt:scan]


def test_disjunctive_pred_pushes_to_both_scans(spark):
    # Q19 shape: the OR-of-ANDs must decompose into per-relation OR
    # filters pushed into BOTH parquet scans
    from wsprnet_scraper_spark.plans import QUERIES

    df = QUERIES["join_disjunctive_pred"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2, plan
    li_scan = next(s for s in scans if "l_quantity" in s)
    p_scan = next(s for s in scans if "p_size" in s)
    assert "PushedFilters: [IsNotNull(l_partkey), Or(" in li_scan, li_scan
    assert "PushedFilters: [IsNotNull(p_partkey), Or(" in p_scan, p_scan


def test_q18_prunes_before_joining(spark):
    """sub_large_orders_q18: the HAVING-filtered quantity rollup is
    the BUILD side of broadcast joins into orders/customer — the
    aggregate-then-prune happens before any fact join, and the
    surviving sliver broadcasts."""
    plan = _plan(QUERIES["sub_large_orders_q18"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 1, plan
    # the rollup (partial+final HashAggregate) feeds a BroadcastExchange
    assert "BroadcastExchange" in plan and "HashAggregate" in plan, plan


def test_q2_min_cost_uses_partitioned_window(spark):
    """sub_min_cost_supplier: the correlated min collapses into a
    Window over l_partkey (never a single-task empty-partition
    window), and the region/nation/part dims broadcast."""
    plan = _plan(QUERIES["sub_min_cost_supplier"](spark, SF))
    assert "Window" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q15_max_is_broadcast_scalar(spark):
    """agg_top_supplier_q15: the scalar MAX side joins as a 1-row
    broadcast (BroadcastNestedLoopJoin/BroadcastExchange), never a
    shuffle of the revenue view against itself."""
    plan = _plan(QUERIES["agg_top_supplier_q15"](spark, SF))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan, plan
