"""numpy GEMM top-k must agree with the exact-fold baseline."""

from __future__ import annotations

import math

from wsprnet_scraper_spark.operators.similarity import cosine_topk, cosine_topk_pandas


def test_pandas_topk_matches_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in cosine_topk(emb, qids, k=10).collect()
    }
    fast = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in cosine_topk_pandas(emb, qids, k=10).collect()
    }
    # same (qid, vec_id) sets; scores equal to float-summation-order noise
    assert set(exact) == set(fast)
    for key, v in exact.items():
        assert math.isclose(v, fast[key], rel_tol=1e-12), (key, v, fast[key])


def test_ivf_scores_exact_and_self_first(spark):
    from wsprnet_scraper_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in cosine_topk(emb, qids, k=1000).collect()
    }
    ivf = ivf_topk(emb, qids, k=3, num_centroids=8, nprobe=2).collect()
    by_q: dict[int, list] = {}
    for r in ivf:
        # every IVF hit carries the bit-exact brute-force cosine
        assert exact[(r["qid"], r["vec_id"])] == r["cosine"]
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        # the query's own vector lives in its own nearest cell, which
        # is always probed -> rank 1 is itself at cosine 1.0
        top = max(rows, key=lambda r: (r["cosine"], -r["vec_id"]))
        assert top["vec_id"] == qid
        assert math.isclose(top["cosine"], 1.0, rel_tol=1e-12)


def test_assign_cells_pandas_matches_expression_path(spark):
    # the GEMM assignment must place every vector in the same cell as
    # the inlined-expression path (tie-free synthetic data), and the
    # full semantic_dedup result must be identical through either
    from wsprnet_scraper_spark.operators import similarity
    from wsprnet_scraper_spark.sources import load

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    expr_rows = sorted(
        (r["vec_id"], r["cell"], r["dup_of"], r["n_near"])
        for r in similarity.semantic_dedup(emb, cache_key=sf).collect()
    )
    gemm_rows = sorted(
        (r["vec_id"], r["cell"], r["dup_of"], r["n_near"])
        for r in similarity.semantic_dedup(
            emb, cache_key=sf, assign="pandas"
        ).collect()
    )
    assert expr_rows == gemm_rows


def test_dedup_semantic_scaled_runs_distributed_join_with_scaled_k(spark):
    # the judged scale entry must actually exercise the scale
    # configuration: a k > 8 trained codebook (k = max(16, n//256))
    # AND the DataFrame-resident assignment (round 4) — the plan must
    # show the codebook arriving as a collapsed one-row book via
    # broadcast (collect_list aggregate + broadcast join feeding the
    # argmax fold), NOT an inlined O(k) expression tree and NOT a
    # MapInPandas closure (the GEMM kernel is the alternate path,
    # covered by test_assign_cells_pandas_matches_expression_path)
    from wsprnet_scraper_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    df = QUERIES["dedup_semantic_scaled"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan
    assert "collect_list" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the clustering-independent invariants the r3 oracle checked now
    # live here (the r4 oracle is exact-value, which subsumes them for
    # the judged SFs; keeping them as test assertions preserves the
    # property statement for any data)
    rows = df.collect()
    n_emb = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert len(rows) == n_emb  # row conservation
    assert all(r["cell"] is not None for r in rows)
    assert all(r["dup_of"] is None or r["dup_of"] < r["vec_id"] for r in rows)
