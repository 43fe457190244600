"""Regression tests for the ADVICE r8 robustness items (fixed r9):

1. candidate_pairs must keep the strict doc_a < doc_b contract even
   when the input carries duplicate (band, sig, doc) rows — the old
   self-join's `a.doc < b.doc` was robust to that; the r8 streamed
   explode emitted self-pairs.
2. sq8_topk on an empty (or all-null-embedding) relation must return
   an empty typed frame, not TypeError from first() -> None.
3. Personalized PageRank: a source node with NO in-edges must keep
   its teleport share every round (standard RWR) instead of dropping
   out of the groupBy(dst) output after round one.
4. strm_minhash_dedup with an empty batch slice must degrade to zero
   rows (typed seed), not die on parquet schema inference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators import dedup, graph, similarity


def test_candidate_pairs_no_self_pairs_on_duplicate_rows(spark):
    # docs 10 and 20 collide in (band 0, sig "x"); doc 10's row is
    # duplicated — exactly the precondition violation ADVICE r8 named
    rows = [
        (10, 0, "x"),
        (10, 0, "x"),
        (20, 0, "x"),
        (30, 1, "y"),
    ]
    sigs = spark.createDataFrame(rows, ["doc", "band", "sig"])
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.candidate_pairs(sigs).collect()
    }
    assert got == {(10, 20)}
    assert all(a < b for a, b in got)


def test_sq8_topk_empty_relation_returns_typed_empty(spark):
    emb = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = similarity.sq8_topk(emb, [1, 2], k=3)
    assert out.count() == 0
    assert out.columns == ["qid", "vec_id", "score"]


def test_sq8_topk_all_null_embeddings_returns_typed_empty(spark):
    emb = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id bigint, embedding array<double>"
    )
    out = similarity.sq8_topk(emb, [1], k=3)
    assert out.count() == 0
    assert out.columns == ["qid", "vec_id", "score"]


def test_ppr_source_without_in_edges_keeps_teleport_mass(spark):
    # 1 <-> 2, plus 3 -> 1: node 3 has an out-edge (no-sink holds)
    # but NO in-edges. Source = {3}: its restart mass must survive.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src bigint, dst bigint"
    )
    out = {
        r["nid"]: r["rank_q"]
        for r in graph.pagerank_quantized(
            edges, iterations=2, sources=[3]
        ).collect()
    }
    # hand-rolled recurrence (SCALE=1e6, DAMP_Q=850000, BASE_Q=150000):
    # r0 = {3: 1_000_000}; r1 = {1: 850_000, 2: 0, 3: 150_000};
    # r2 = {1: 127_500, 2: 722_500, 3: 150_000}
    assert out == {1: 127_500, 2: 722_500, 3: 150_000}


def test_strm_minhash_dedup_empty_batch_degrades_to_zero_rows(
    spark, tmp_path
):
    # a documents table with NO doc_id % 10 == 0 rows -> empty batch
    spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (3, "epsilon zeta eta theta")],
        "doc_id bigint, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from wsprnet_scraper_spark.plans.llmops import strm_minhash_dedup

    out = strm_minhash_dedup(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == [
        "doc_id",
        "dup_of_corpus_id",
        "n_corpus_matches",
        "dup_in_batch_id",
        "status",
    ]
