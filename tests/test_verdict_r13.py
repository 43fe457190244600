"""Regression tests for the VERDICT r12 build tasks executed in r13.

T1 verify-kernel exact-first collapse: dedup_editdist /
   dedup_minhash_estimate now collapse identical texts to one
   representative, run the candidate + kernel cascade per DISTINCT
   text, and reconstruct the judged pair relation by membership
   fan-out. The emitted relation must be IDENTICAL to the pre-r13
   direct form — pinned here by running both forms on a crafted
   duplicated corpus (the direct form is reproduced inline as the
   reference).
T4 executor-loss recovery for pinned shared relations:
   run_with_state_recovery recognizes lost-block failures, drops
   every pinned handle (session_maintenance), and retries once —
   pinned by unpersisting the frame store's checkpoint blocks under
   a live consumer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators import dedup
from wsprnet_scraper_spark.sources import load
from wsprnet_scraper_spark.streaming.daemon import (
    is_lost_state_error,
    run_with_state_recovery,
)
from __spark_entry__ import queries

QUERIES = queries()
SF = "/root/testdata/sf0.001"


def _write_documents(tmp_path, texts_by_id):
    ids = sorted(texts_by_id)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts_by_id[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["web"] * len(ids)),
            "n_chars": pa.array(
                [len(texts_by_id[i] or "") for i in ids], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# Crafted corpus: deep exact duplication (the collapse's target), a
# near-dup group (shares shingles, differs in one token), a disjoint
# doc, and a duplicated too-short-to-shingle text (must emit NO
# pairs, including no intra-group pair).
T0 = "alpha beta gamma delta epsilon zeta"
T1 = "alpha beta gamma delta epsilon theta"
T2 = "one two three four five six"
SHORT = "xx yy"


def _editdist_reference(spark, sf_dir):
    """The pre-r13 direct form of dedup_editdist (kernel per emitted
    pair) — the semantic spec the collapsed form must reproduce."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    sh = dedup.word_shingles(d, "doc_id", "text", 3)
    pairs = (
        dedup.ngram_jaccard_pairs(sh)
        .filter(F.col("jaccard") >= 0.01)
        .select("doc_a", "doc_b")
    )
    ta = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.cast("bigint").alias("edit_dist"),
            (
                dist <= 0.3 * F.greatest(F.length("_ta"), F.length("_tb"))
            ).alias("is_dup"),
        )
    )


def _minhash_estimate_reference(spark, sf_dir):
    """The pre-r13 direct form of dedup_minhash_estimate."""
    d = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(d, "doc_id", "text", 3)
    salts = spark.range(8).select(F.col("id").cast("int").alias("salt"))
    hashed = (
        sh.crossJoin(F.broadcast(salts))
        .select(
            "doc",
            "salt",
            F.md5(
                F.concat(
                    F.col("salt").cast("string"), F.lit("|"), F.col("shingle")
                )
            ).alias("h"),
        )
        .groupBy("doc", "salt")
        .agg(F.min("h").alias("minh"))
    )
    sigs = dedup.minhash_signatures(sh, num_hashes=8, rows_per_band=2)
    cand = dedup.candidate_pairs(sigs)
    ha = hashed.select(
        F.col("doc").alias("doc_a"), "salt", F.col("minh").alias("minh_a")
    )
    hb = hashed.select(
        F.col("doc").alias("b_doc"),
        F.col("salt").alias("salt_b"),
        F.col("minh").alias("minh_b"),
    )
    m = (
        cand.join(ha, "doc_a")
        .join(
            hb,
            (F.col("doc_b") == F.col("b_doc"))
            & (F.col("salt") == F.col("salt_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("minh_a") == F.col("minh_b"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_match")
        )
    )
    return m.select(
        "doc_a",
        "doc_b",
        "n_match",
        (F.col("n_match").cast("double") / F.lit(8.0)).alias("est_jaccard"),
    )


def test_editdist_collapse_matches_direct_form(spark, tmp_path):
    # only doc_id % 10 == 0 survives the entry's sample filter, so
    # the interesting texts sit at ids {0,10,20,30,40,50}; fillers at
    # other ids must not influence the result.
    texts = {
        0: T0,
        10: T0,
        20: T0,  # 3-deep exact duplicate group
        30: T1,  # near-dup of T0
        40: T2,  # disjoint vocabulary
        50: SHORT,
        1: "filler one text here",
        11: T1,  # same text as 30 but id % 10 != 0: filtered out
        21: "other filler",
    }
    sf = _write_documents(tmp_path, texts)
    got = {tuple(r) for r in QUERIES["dedup_editdist"](spark, sf).collect()}
    want = {tuple(r) for r in _editdist_reference(spark, sf).collect()}
    assert got == want
    # structural expectations: all three intra pairs of the T0 group
    # at distance 0, both T0-group x T1 cross pairs, nothing touching
    # the disjoint or short docs
    by_pair = {(a, b): (dist, dup) for a, b, dist, dup in got}
    assert by_pair[(0, 10)] == (0, True)
    assert by_pair[(0, 20)] == (0, True)
    assert by_pair[(10, 20)] == (0, True)
    assert (0, 30) in by_pair and (10, 30) in by_pair and (20, 30) in by_pair
    assert len({by_pair[(0, 30)], by_pair[(10, 30)], by_pair[(20, 30)]}) == 1
    assert not any(40 in p or 50 in p for p in by_pair)


def test_minhash_estimate_collapse_matches_direct_form(spark, tmp_path):
    texts = {
        0: T0,
        1: T0,
        2: T0,
        3: T1,
        4: T1,
        5: T2,
        6: SHORT,
        7: SHORT,  # duplicated but unshingleable: NO intra pair
    }
    sf = _write_documents(tmp_path, texts)
    got = {tuple(r) for r in QUERIES["dedup_minhash_estimate"](spark, sf).collect()}
    want = {tuple(r) for r in _minhash_estimate_reference(spark, sf).collect()}
    assert got == want
    by_pair = {(a, b): (n, est) for a, b, n, est in got}
    # identical texts match on every salt
    for p in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        assert by_pair[p] == (8, 1.0)
    assert not any(6 in p or 7 in p for p in by_pair)


# ------------------------------------------- T2: BPE serve dispatch


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_encode_dispatches_by_merge_count(spark, monkeypatch):
    """pipe_bpe_encode must serve the chain form at/below the
    threshold (pure projection, no join) and the join form above it
    (depth-independent), with identical results either way."""
    from wsprnet_scraper_spark.plans import llmops

    d = spark.createDataFrame(
        [(0, "aa bb aa cc"), (1, "bb cc"), (2, None)],
        "doc_id bigint, text string",
    )
    # fabricated never-matching merge pairs: semantically a no-op
    # encode, which makes chain/join equality easy to assert at any
    # fabricated depth
    fake = [(i, f"z{i}x", f"q{i}y", f"z{i}xq{i}y", 1) for i in range(1, 101)]

    shallow_chain = llmops._bpe_encode_chain_df(d, fake[:10])
    shallow_join = llmops._bpe_encode_join_df(d, fake[:10])
    deep_join = llmops._bpe_encode_join_df(d, fake)
    want = sorted(map(tuple, shallow_chain.collect()))
    assert sorted(map(tuple, shallow_join.collect())) == want
    assert sorted(map(tuple, deep_join.collect())) == want
    assert "Join" not in _plan(shallow_chain)
    assert "Join" in _plan(shallow_join)

    # the registered entry routes through the dispatch (plan cache
    # cleared around each probe: the registry memoizes built plans
    # per (name, sf_dir) and would otherwise serve a stale shape)
    from wsprnet_scraper_spark.plans.registry import clear_plan_cache

    monkeypatch.setattr(llmops, "_bpe_train_merges", lambda dd: fake[:10])
    clear_plan_cache()
    assert "Join" not in _plan(QUERIES["pipe_bpe_encode"](spark, SF))
    monkeypatch.setattr(llmops, "_bpe_train_merges", lambda dd: fake)
    clear_plan_cache()
    assert "Join" in _plan(QUERIES["pipe_bpe_encode"](spark, SF))
    clear_plan_cache()  # drop the monkeypatched plans from the cache


# --------------------------------------------------- T4: recovery


def test_is_lost_state_error_classification():
    assert is_lost_state_error(
        Exception("Checkpoint block rdd_42_7 not found! Either the executor")
    )
    assert is_lost_state_error(Exception("FetchFailed(BlockManagerId(...)"))
    # cause chain is walked
    inner = Exception("java.io.FileNotFoundException: /tmp/gone.parquet")
    outer = RuntimeError("query failed")
    outer.__cause__ = inner
    assert is_lost_state_error(outer)
    assert not is_lost_state_error(ValueError("division by zero"))


def test_recovery_does_not_retry_semantic_errors(spark):
    calls = []

    def action():
        calls.append(1)
        raise ValueError("semantic bug, not lost state")

    with pytest.raises(ValueError):
        run_with_state_recovery(spark, action)
    assert len(calls) == 1


def test_recovery_retries_once_on_lost_state(spark):
    calls = []

    def action():
        calls.append(1)
        if len(calls) == 1:
            raise Exception("Checkpoint block rdd_9_0 not found!")
        return "ok"

    assert run_with_state_recovery(spark, action) == "ok"
    assert len(calls) == 2


def test_frame_store_recovery_after_checkpoint_block_loss(spark):
    """The real failure mode: materialize the pinned frame relation,
    kill its localCheckpoint blocks (what executor loss does on a
    cluster), observe the consumer fail with the lost-block
    signature, then recover through the wrapper."""
    thunk = lambda: sorted(  # noqa: E731
        tuple(r) for r in QUERIES["win_ewma"](spark, SF).collect()
    )
    want = thunk()  # materializes + pins the shared frame relation

    # simulate executor loss: drop every persisted RDD's blocks.
    # localCheckpoint registers its RDD in persistentRdds, and a
    # LocalCheckpointRDD cannot recompute a removed block.
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    jrdds = list(jmap.values())  # py4j exposes the java Map dict-like
    assert jrdds, "expected a pinned checkpoint RDD"
    for jrdd in jrdds:
        jrdd.unpersist(True)

    with pytest.raises(Exception) as ei:
        thunk()
    assert is_lost_state_error(ei.value), str(ei.value)[:500]

    assert run_with_state_recovery(spark, thunk) == want
    # and the session is healthy again without further intervention
    assert thunk() == want
