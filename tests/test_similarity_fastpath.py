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
