"""The r7 Arrow/GEMM pair stages, pinned against their fold-expression
twins on crafted corpora.

Three kernels ship behind the ORACLE_BOUND dispatch (fold-expression
below FLAT_ASSIGN_MAX — the oracle-bit-parity region — GEMM above):
`_twolevel_pairs_gemm` (semantic_dedup_auto's balanced branch),
`_incremental_cell_pairs_gemm` (the incremental twin), and
`_bucket_pairs_gemm` (embedding_near_dups). The full-corpus parity
runs live at the 100× probe corpus (SCALE.md round 7); these tests
pin the same contracts at unit scale so a kernel regression fails in
seconds, not in a probe:

- identical ROW SETS for the thresholded/aggregated outputs
  (dup_of / n_near / status are integer decisions);
- identical pair ID SETS for the raw-score kernel, with the cosine
  column allowed only BLAS-vs-fold summation noise (documented
  deviation: max |Δ| observed 1.1e-15 over 6.03M pairs at 100×).

The vectors are integer-valued so most cosines are exactly equal in
both summation orders; the threshold sits away from any attainable
cosine, so no flip can hide in the tolerance.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, n=240, dim=8, groups=12):
    """Integer-valued embeddings in `groups` planted direction
    families, ids 0..n-1 — every family yields within-family cosines
    well above 0.5 and cross-family cosines well below."""
    rows = []
    for i in range(n):
        g = i % groups
        base = [1.0 if d == g % dim else 0.2 for d in range(dim)]
        # small integer jitter, deterministic
        vec = [base[d] * (3 + ((i * 7 + d) % 2)) for d in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_twolevel_gemm_matches_expr(spark):
    from wsprnet_scraper_spark.operators import similarity as S

    emb = _emb(spark)
    kwargs = dict(threshold=0.5, k_coarse=3, k_fine=3, iters=1, cache_key=None)
    e = S.semantic_dedup_twolevel(emb, pair_stage="expr", **kwargs)
    g = S.semantic_dedup_twolevel(emb, pair_stage="gemm", **kwargs)
    cols = ["vec_id", "ccell", "fcell", "dup_of", "n_near"]
    assert e.select(cols).exceptAll(g.select(cols)).count() == 0
    assert g.select(cols).exceptAll(e.select(cols)).count() == 0
    assert e.count() == 240
    # the kernel actually marks duplicates on this corpus
    assert e.filter(F.col("dup_of").isNotNull()).count() > 0


def test_incremental_gemm_matches_expr(spark):
    from wsprnet_scraper_spark.operators import similarity as S

    emb = _emb(spark)
    pre = emb.select(
        "vec_id",
        S._as_double(F.col("embedding")).alias("v"),
        (F.col("vec_id") % 4 == 0).alias("is_batch"),
    ).withColumn("n2", S._norm2(F.col("v")))
    assigned = pre.withColumn("cell", (F.col("vec_id") % 6).cast("long"))
    e = S._incremental_cell_pairs(assigned, 0.5)
    g = S._incremental_cell_pairs_gemm(assigned, 0.5)
    cols = [
        "vec_id", "cell", "dup_of_corpus_id", "n_corpus_near",
        "dup_in_batch_id", "status",
    ]
    assert e.select(cols).exceptAll(g.select(cols)).count() == 0
    assert g.select(cols).exceptAll(e.select(cols)).count() == 0
    # batch rows only, and all three statuses reachable on this corpus
    assert e.count() == 60
    statuses = {r["status"] for r in g.select("status").distinct().collect()}
    assert "dup_of_corpus" in statuses


def test_bucket_pairs_gemm_matches_fold(spark):
    from wsprnet_scraper_spark.operators import similarity as S

    emb = _emb(spark)
    f = S.embedding_near_dups(emb, threshold=0.5, num_planes=4, pair_stage="fold")
    g = S.embedding_near_dups(emb, threshold=0.5, num_planes=4, pair_stage="gemm")
    ids_f = f.select("id_a", "id_b")
    ids_g = g.select("id_a", "id_b")
    assert ids_f.exceptAll(ids_g).count() == 0
    assert ids_g.exceptAll(ids_f).count() == 0
    assert f.count() > 0
    j = f.alias("f").join(g.alias("g"), ["id_a", "id_b"])
    mx = j.agg(
        F.max(F.abs(F.col("f.cosine") - F.col("g.cosine"))).alias("m")
    ).collect()[0]["m"]
    assert mx < 1e-12  # summation-order noise only
