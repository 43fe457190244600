"""Plan-shape tests for the interop/mutation surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_unpivot_is_single_scan_expand(spark):
    # the oracle restates the melt as a 4-way UNION ALL (4 scans);
    # the engine must compile it to ONE scan + Expand
    plan = _plan(QUERIES["proj_unpivot"](spark, SF))
    assert plan.count("FileScan") == 1, plan
    assert "Expand" in plan, plan


def test_merge_joins_on_aggregated_source(spark):
    plan = _plan(QUERIES["snk_merge_upsert"](spark, SF))
    assert "FullOuter" in plan, plan
    # source must be reduced to key level BELOW the merge join
    assert "HashAggregate" in plan, plan


def test_merge_branch_counts(spark):
    rows = QUERIES["snk_merge_upsert"](spark, SF).groupBy("action").count()
    counts = {r["action"]: r["count"] for r in rows.collect()}
    # all three MERGE branches must be exercised by the synthetic source
    assert set(counts) == {"updated", "inserted", "kept"}, counts
    assert all(v > 0 for v in counts.values()), counts


def test_editdist_runs_only_on_candidates(spark):
    # the O(len^2) levenshtein kernel must sit above the candidate
    # joins — never a cartesian of documents
    plan = _plan(QUERIES["dedup_editdist"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_orc_roundtrip_identity(spark):
    got = {
        r.event_type: (r.n, r.sum_value)
        for r in QUERIES["src_orc_roundtrip"](spark, SF).collect()
    }
    from wsprnet_scraper_spark.sources import load_events

    ev = load_events(spark, SF)
    want = {
        r.event_type: (r.n, r.sum_value)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got == want and len(got) == 5
