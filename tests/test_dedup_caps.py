"""Adversarial hot-bucket tests for the near-dup frequency caps.

VERDICT r1's one weak mark: a shingle (or band bucket) shared by d
documents emits d² join rows, and natural corpora are power-law, so
the uncapped candidate joins have an OOM reducer at 100×. These tests
build exactly that corpus — one shingle in EVERY doc / one
duplicate-dominated bucket — and pin (a) the uncapped blowup exists,
(b) the cap bounds it, (c) survivor pairs keep exact capped-universe
Jaccard, and (d) the cap's removal join is a broadcast anti-join
(the big side must NOT shuffle for the cap).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators import dedup


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _stopword_corpus(spark, n_docs: int = 40):
    # every doc starts with the same 3 words -> one shingle with df =
    # n_docs; docs 0 and 1 additionally share a rare 3-word tail
    rows = []
    for i in range(n_docs):
        tail = "alpha beta gamma" if i < 2 else f"u{i}a u{i}b u{i}c"
        rows.append((i, f"the quick brown {tail}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_uncapped_jaccard_blows_up_quadratically(spark):
    sh = dedup.word_shingles(_stopword_corpus(spark, 40), "doc_id", "text", 3)
    pairs = dedup.ngram_jaccard_pairs(sh)  # max_df=None: old behavior
    # the df=40 shingle alone forces C(40,2) = 780 candidate pairs
    assert pairs.count() >= 780


def test_capped_jaccard_is_bounded_and_exact(spark):
    sh = dedup.word_shingles(_stopword_corpus(spark, 40), "doc_id", "text", 3)
    rows = dedup.ngram_jaccard_pairs(sh, max_df=5).collect()
    # hot head shingles (df=40 > 5) are gone; only the docs sharing
    # the rare tail survive as a pair
    assert {(r.doc_a, r.doc_b) for r in rows} == {(0, 1)}
    (pair,) = rows
    # capped universe per doc: "quick brown alpha", "brown alpha
    # beta", "alpha beta gamma" (the 3 head shingles are dropped;
    # "the quick brown"/"quick brown alpha"... check: shingles of
    # "the quick brown alpha beta gamma" are [the quick brown,
    # quick brown alpha, brown alpha beta, alpha beta gamma]; only
    # "the quick brown" has df=40, the rest df=2 -> sz=3 each,
    # intersection=3, union=3)
    assert pair.n_common == 3
    assert pair.jaccard == 1.0


def test_capped_minhash_bucket_bounded(spark):
    # duplicate-dominated corpus: 30 identical docs + 4 unique ones.
    # All 30 collide in every band -> uncapped candidates explode.
    rows = [(i, "spam spam spam spam wonderful spam") for i in range(30)]
    rows += [(100 + i, f"v{i}x v{i}y v{i}z v{i}w") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.word_shingles(docs, "doc_id", "text", 3)
    sigs = dedup.minhash_signatures(sh, num_hashes=8, rows_per_band=2)
    uncapped = dedup.candidate_pairs(sigs).count()
    assert uncapped == 30 * 29 // 2  # 435 — the d² blowup
    capped = dedup.candidate_pairs(sigs, max_bucket=5).count()
    assert capped == 0  # the duplicate cluster is exact_dedup's job


def test_cap_removal_join_is_broadcast_anti(spark):
    sh = dedup.word_shingles(_stopword_corpus(spark, 40), "doc_id", "text", 3)
    plan = _plan(dedup.frequency_cap(sh, 5))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan
    # the probe (big shingle stream) branch of the anti-join — the
    # ":"-prefixed lines under the join — must carry NO shuffle: hot
    # rows are dropped map-side, before the distinct's exchange. The
    # build side may aggregate freely; it's small by construction.
    lines = plan.splitlines()
    join_at = next(i for i, l in enumerate(lines) if "LeftAnti" in l)
    probe = [l for l in lines[join_at + 1 :] if l.lstrip().startswith(":")]
    assert probe and not any("Exchange" in l for l in probe), plan
