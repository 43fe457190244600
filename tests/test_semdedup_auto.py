"""Scale dispatch of the SemDeDup auto front doors (r4 verdict #1).

The judged dedup_semantic / dedup_semantic_scaled /
dedup_semantic_incremental entries route through semantic_dedup_auto
and semantic_dedup_incremental_auto: the flat k∝n form (Θ(n²/256)
assignment) may only ever run below FLAT_ASSIGN_MAX corpus rows; above
it the balanced two-level quantizer serves the same schema through a
composite cell id. These tests pin (a) bit-identity with the flat path
in the oracle-certified region, (b) that the above-ceiling branch is
exactly the two-level plan flattened through the collision-free
composite mapping, and (c) that the judged registry entries actually
go through the front doors.
"""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wsprnet_scraper_spark.operators import similarity


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def synth(spark):
    """A deterministic 120-vector corpus (dim 6) with planted
    near-dup pairs: vectors come in id-adjacent duplicate pairs every
    10 ids, so any sane clustering finds in-cell near-dups."""
    base = spark.range(120).select(
        F.col("id").cast("long").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(6)),
            # pair ids 10k and 10k+1 share (id - id%10*... ) keep simple:
            # direction keyed on id//2 so 2j and 2j+1 are identical
            lambda i: (
                F.cos((F.col("id") / F.lit(2)).cast("long") * i * 0.7)
            ).cast("float"),
        ).alias("embedding"),
    )
    return base.localCheckpoint(eager=True)


def test_auto_below_ceiling_is_bit_identical_to_flat(emb):
    auto = similarity.semantic_dedup_auto(emb, threshold=0.2, k_min=8)
    flat = similarity.semantic_dedup(
        emb, threshold=0.2, num_centroids=max(8, emb.count() // 256),
        iters=2, assign="join",
    )
    assert auto.columns == ["vec_id", "cell", "dup_of", "n_near"]
    assert _rows(auto) == _rows(flat)


def test_auto_above_ceiling_is_the_twolevel_plan_flattened(synth):
    n = synth.count()
    assert n == 120
    auto = similarity.semantic_dedup_auto(
        synth, threshold=0.9, flat_max=50
    )
    k = similarity._balanced_k(n)
    two = similarity.semantic_dedup_twolevel(
        synth, threshold=0.9, k_coarse=k, k_fine=k, iters=2
    )
    flattened = two.select(
        "vec_id",
        similarity._composite_cell(k).alias("cell"),
        "dup_of",
        "n_near",
    )
    got = _rows(auto)
    assert len(got) == n
    assert got == _rows(flattened)
    # the planted id-pairs are exact duplicates, and identical vectors
    # always route to identical (coarse, fine) cells — so every odd id
    # 2j+1 must be marked a dup of SOME lower id (≤ 2j; the corpus also
    # contains incidental near-periodic collisions, so dup_of can be
    # lower than the planted partner)
    by_id = {r[0]: r for r in got}
    for j in range(0, n, 2):
        assert by_id[j + 1][2] is not None, j + 1
        assert by_id[j + 1][2] <= j


def test_composite_cell_is_collision_free():
    k = 5
    seen = set()
    for ccell in range(7):
        for fcell in range(-1, k):
            seen.add(ccell * (k + 1) + fcell + 1)
    assert len(seen) == 7 * (k + 1)


def test_incremental_auto_below_ceiling_matches_flat(emb):
    is_batch = F.col("vec_id") % 10 == 0
    corpus_n = emb.filter(~is_batch).count()
    auto = similarity.semantic_dedup_incremental_auto(
        emb, is_batch, threshold=0.2, k_min=8
    )
    flat = similarity.semantic_dedup_incremental(
        emb, is_batch, threshold=0.2,
        num_centroids=max(8, corpus_n // 256), iters=2,
    )
    assert _rows(auto) == _rows(flat)


def test_incremental_auto_above_ceiling_dedups_against_corpus(synth):
    # batch = odd ids; every odd id 2j+1 duplicates corpus id 2j
    # exactly (identical vectors route to identical cells), so ALL
    # batch vectors must come back dup_of_corpus. dup_of_corpus_id is
    # the MIN corpus neighbor, and the near-periodic synth corpus has
    # incidental ≥0.9 collisions, so it can be lower than the planted
    # partner — but never higher.
    is_batch = F.col("vec_id") % 2 == 1
    out = similarity.semantic_dedup_incremental_auto(
        synth, is_batch, threshold=0.9, flat_max=50
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 60
    assert all(r["status"] == "dup_of_corpus" for r in rows.values())
    assert all(
        rows[j + 1]["dup_of_corpus_id"] <= j for j in range(0, 120, 2)
    )


def test_oracle_bound_records_the_dispatch_ceiling():
    """ADVICE r5 (medium): the registered SQL oracles encode the FLAT
    k-means form, so exact-value gating only applies below
    FLAT_ASSIGN_MAX embeddings — the dispatch ceiling. The boundary
    must be machine-readable (ORACLE_BOUND) for every judged entry
    that routes through the auto front doors, so the gate downgrades
    an out-of-domain corpus to rows-only instead of a false FAIL."""
    import wsprnet_scraper_spark.plans  # noqa: F401  (populates registry)
    from wsprnet_scraper_spark.plans.registry import ORACLE, ORACLE_BOUND

    for name in ("dedup_semantic", "dedup_semantic_scaled",
                 "dedup_semantic_incremental", "pipe_semdedup_e2e"):
        assert ORACLE_BOUND[name] == (
            "embeddings", similarity.FLAT_ASSIGN_MAX
        ), name
    # every bounded entry must still HAVE an oracle (the bound scopes
    # it, it doesn't replace it), and nothing else claims a bound
    for name in ORACLE_BOUND:
        assert name in ORACLE, name
    # r7 additions: the LSH pair machinery dispatches its pair stage
    # (fold below / per-bucket GEMM above) on the same ceiling;
    # r10: the semantic STREAM twin joined the dispatch (the probe
    # caught its flat trainer still live at the 100x corpus)
    assert set(ORACLE_BOUND) == {
        "dedup_semantic", "dedup_semantic_scaled",
        "dedup_semantic_incremental", "pipe_semdedup_e2e",
        "dedup_embedding", "dedup_cluster", "strm_semantic_dedup",
    }


def test_judged_entries_route_through_the_front_doors():
    from wsprnet_scraper_spark.plans import QUERIES

    def src(name):
        fn = QUERIES[name]
        return inspect.getsource(getattr(fn, "__wrapped__", fn))

    for name in ("dedup_semantic", "dedup_semantic_scaled",
                 "pipe_semdedup_e2e"):
        assert "semantic_dedup_auto(" in src(name), name
    assert "semantic_dedup_incremental_auto(" in src(
        "dedup_semantic_incremental"
    )
    # and nothing judged calls the flat form directly anymore
    for name in ("dedup_semantic", "dedup_semantic_scaled",
                 "dedup_semantic_incremental", "pipe_semdedup_e2e"):
        s = src(name)
        assert "semantic_dedup(" not in s, name
        assert "semantic_dedup_incremental(" not in s.replace(
            "semantic_dedup_incremental_auto(", ""
        ), name


def test_strm_semantic_dedup_above_ceiling_scale_branch(spark, tmp_path):
    """r10: the STREAM twin runs the same FLAT_ASSIGN_MAX dispatch as
    semantic_dedup_incremental_auto (the r10 probe caught the flat
    k=n/256 trainer still live in the stream fixture: 219 s at the
    100x corpus vs 14.5 s dispatched). Above the ceiling the
    two-level composite cells must still produce the contract's
    statuses: every planted identical pair (10k batch vector, 10k+1
    corpus vector) routes to the same cell in ANY deterministic
    assignment, so all batch vectors come back dup_of_corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod

    n = 5010  # corpus side 4509 > FLAT_ASSIGN_MAX = 4096
    vecs = []
    for i in range(n):
        j = i - (i % 2)  # 2j and 2j+1 identical
        vecs.append([float(((j * 7 + d * 3) % 11) - 5) for d in range(4)])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = entrymod.queries()["strm_semantic_dedup"](spark, str(tmp_path))
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == (n - 1) // 10 + 1  # vec_id % 10 == 0 slice
    assert all(r["status"] == "dup_of_corpus" for r in rows.values())
    assert all(r["n_corpus_near"] >= 1 for r in rows.values())
