"""Deterministic-sketch invariants (operators/sketch.py).

The differential gate proves both engines agree; these pin the
SKETCH guarantees the curation pipeline relies on — Bloom never
misses a true overlap (decontamination may over-flag, never
under-flag) and Count-Min never under-counts — plus the fixed-size
shuffle property that makes the sketches viable at 100 TB.
"""

from __future__ import annotations

import re

from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_bloom_never_misses_true_overlap(spark):
    bloom = {
        r["doc"]: r
        for r in QUERIES["pipe_bloom_decontam"](spark, SF).collect()
    }
    exact = {
        r["doc"]: r for r in QUERIES["pipe_contamination"](spark, SF).collect()
    }
    assert set(bloom) == set(exact)
    for doc, ex in exact.items():
        bl = bloom[doc]
        assert bl["n_shingles"] == ex["n_shingles"]
        # one-sided: every true shared shingle hits the filter
        assert bl["n_bloom_hits"] >= ex["n_shared"], doc
        if ex["contaminated"]:
            assert bl["flagged"], doc


def test_count_min_never_undercounts(spark):
    rows = QUERIES["agg_count_min"](spark, SF).collect()
    assert rows, "empty heavy-hitter list"
    for r in rows:
        assert r["cm_estimate"] >= r["exact_n"], r


def test_sketch_aggregations_are_partial(spark):
    # the bitmap build and the CM grid must partial-aggregate
    # (map-side combine) so the shuffle is sketch-sized, and no
    # Python boundary may appear anywhere
    for name in ("pipe_bloom_decontam", "agg_count_min"):
        plan = QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert re.search(r"partial_(count|sum|bit_or)", plan), name
