"""Plan-shape + unit tests for the corpus-curation suite.

Correctness vs DuckDB is the differential gate's job; these pin the
physical properties (broadcast membership join, projection-only
redaction, no join-back in the repetition rollup) and the masking
semantics on handcrafted rows.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators import quality
from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_no_join_back(spark):
    # distinct-token ratio rides the aggregation keys — the per-doc
    # profile must come out of stacked aggregates over ONE scan, never
    # a join of two per-doc aggregates
    plan = _plan(QUERIES["text_repetition"](spark, SF))
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan
    assert len(re.findall(r"HashAggregate", plan)) >= 3, plan


def test_contamination_broadcasts_eval_side(spark):
    # eval shingles are tiny vs a 100 TB corpus: membership must be a
    # broadcast join, and the corpus side must not shuffle for it
    plan = _plan(QUERIES["pipe_contamination"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftOuter" in plan, plan


def test_pii_redact_is_pure_projection(spark):
    plan = _plan(QUERIES["text_pii_redact"](spark, SF))
    assert "Exchange" not in plan, plan
    assert plan.count("FileScan") == 1, plan


def test_length_hist_single_aggregation(spark):
    plan = _plan(QUERIES["text_length_hist"](spark, SF))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # histogram reads ONLY n_chars — not text (most of the bytes)
    assert "text" not in scan.split("ReadSchema:")[1], scan


def test_masking_kernels(spark):
    df = spark.createDataFrame(
        [("12-345-678-9012", "a1b22c333", "Bob <bob.smith@corp.io> x")],
        "phone string, addr string, contact string",
    )
    row = df.select(
        quality.mask_phone(F.col("phone")).alias("p"),
        quality.redact_digits(F.col("addr")).alias("a"),
        quality.digit_run_count(F.col("addr")).alias("n"),
        quality.redact_emails(F.col("contact")).alias("c"),
    ).first()
    assert row.p == "XXX-XXX-XXX-9012"
    assert row.a == "a#b#c#"
    assert row.n == 3
    assert row.c == "Bob <[EMAIL]> x"


def test_repetition_values(spark):
    # 'x y x y x' -> bigrams: [x y, y x, x y, y x] top=2/4, distinct 2/5
    df = spark.createDataFrame([(1, "x y x y x")], "doc_id long, text string")
    row = quality.repetition_signals(df, "doc_id", "text").first()
    assert row.n_bigrams == 4 and row.top_bigram_n == 2
    assert row.top_frac == 0.5 and row.distinct_ratio == 0.4


def test_contamination_flags_full_overlap(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "p q r s t")],
        "doc_id long, text string",
    )
    from wsprnet_scraper_spark.operators import dedup

    sh = dedup.word_shingles(docs, "doc_id", "text", 3)
    out = quality.contamination(
        sh.filter(F.col("doc") != 0), sh.filter(F.col("doc") == 0)
    ).collect()
    by_doc = {r.doc: r for r in out}
    assert by_doc[1].contaminated and by_doc[1].contamination == 1.0
    assert not by_doc[2].contaminated and by_doc[2].n_shared == 0
