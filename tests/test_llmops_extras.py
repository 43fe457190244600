"""Plan/semantics tests for emb_centroid and pipe_pack."""

from __future__ import annotations

import re

from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_centroid_single_pass_pruned(spark):
    df = QUERIES["emb_centroid"](spark, SF)
    plan = _plan(df)
    assert plan.count("FileScan") == 1, plan
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # vec_id must be pruned — only label + embedding are read
    assert "vec_id" not in scan.split("ReadSchema:")[1], scan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_centroid_exactness_invariant(spark):
    # sum_q / (1000 * n) must reproduce the centroid column exactly —
    # the single-division contract the oracle relies on
    for r in QUERIES["emb_centroid"](spark, SF).collect():
        assert r.centroid == r.sum_q / (1000 * r.n)


def test_pack_window_is_partitioned(spark):
    plan = _plan(QUERIES["pipe_pack"](spark, SF))
    m = re.search(r"Window .*windowspecdefinition\(([^,]+),", plan)
    assert m and "source" in m.group(1), plan


def test_pack_offsets_and_bins_consistent(spark):
    rows = QUERIES["pipe_pack"](spark, SF).collect()
    assert all(0 <= r.offset_in_bin < 2048 for r in rows)
    # replay the packing per source in doc_id order
    by_src = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        cum = by_src.get(r.source, 0)
        assert r.bin == cum // 2048 and r.offset_in_bin == cum % 2048, r
        by_src[r.source] = cum + r.n_tokens
