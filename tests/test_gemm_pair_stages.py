"""The r7 vectorized pair kernels, pinned against their fold-expression
twins on crafted corpora.

Four kernels ship behind the pair-stage dispatch:
- `_twolevel_pairs_gemm` / `_incremental_cell_pairs_gemm` (BLAS M·Mᵀ,
  summation order differs in the last ulps) — used ONLY in
  semantic_dedup_auto's above-FLAT_ASSIGN_MAX branches, where the
  balanced clustering differs from the flat oracle anyway and
  ORACLE_BOUND declares rows-only checking; pinned here for identical
  ROW SETS of the thresholded/aggregated outputs (dup_of / n_near /
  status are integer decisions on cosines that agree to ~1e-15).
- `_twolevel_pairs_foldvec` / `_bucket_pairs_vec` (fold-ORDER
  vectorization: dots accumulated dimension-by-dimension — the same
  float ops in the same IEEE order as the fold expression) — the
  judged configurations of dedup_semantic_2level and the above-bound
  stage of dedup_embedding/dedup_cluster; pinned here for FULL-ROW
  bitwise equality, raw cosine doubles included.

The full-corpus parity runs live at the 100× probe corpus (SCALE.md
round 7); these fail in seconds instead. The vectors are
integer-valued and thresholds sit away from attainable cosines, so a
summation-order flip cannot hide.
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


def test_bucket_pairs_vec_bit_identical_to_fold(spark):
    """The fold-order vectorized kernel performs the fold expression's
    float ops in the same IEEE order, so FULL ROWS — including the raw
    cosine doubles — must match exactly, not within tolerance."""
    from wsprnet_scraper_spark.operators import similarity as S

    emb = _emb(spark)
    f = S.embedding_near_dups(emb, threshold=0.5, num_planes=4, pair_stage="fold")
    g = S.embedding_near_dups(emb, threshold=0.5, num_planes=4, pair_stage="vec")
    assert f.count() > 0
    assert f.exceptAll(g).count() == 0
    assert g.exceptAll(f).count() == 0


def test_bucket_pairs_vec_tiled_bit_identical(spark):
    """ADVICE r7: the vec kernel must not materialize an m×m dots
    matrix per LSH bucket — it tiles the upper triangle. A tile edge
    of 3 forces every bucket here through MULTIPLE tiles (diagonal
    and off-diagonal, including ragged edge tiles), and the output
    must still be bit-identical to the single-buffer fold path:
    tiling changes which pairs share a buffer, never any pair's
    dimension-ordered accumulation."""
    from wsprnet_scraper_spark.operators import similarity as S

    emb = _emb(spark)
    f = S.embedding_near_dups(emb, threshold=0.5, num_planes=4, pair_stage="fold")
    g = S.embedding_near_dups(
        emb, threshold=0.5, num_planes=4, pair_stage="vec", pair_tile=3
    )
    assert f.count() > 0
    assert f.exceptAll(g).count() == 0
    assert g.exceptAll(f).count() == 0


def test_twolevel_foldvec_bit_identical_to_expr(spark):
    """Same property for the judged dedup_semantic_2level kernel."""
    from wsprnet_scraper_spark.operators import similarity as S

    emb = _emb(spark)
    kwargs = dict(threshold=0.5, k_coarse=3, k_fine=3, iters=1, cache_key=None)
    e = S.semantic_dedup_twolevel(emb, pair_stage="expr", **kwargs)
    v = S.semantic_dedup_twolevel(emb, pair_stage="foldvec", **kwargs)
    assert e.exceptAll(v).count() == 0
    assert v.exceptAll(e).count() == 0
    assert e.count() == 240
