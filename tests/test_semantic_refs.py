"""Independent semantic checks backing MIRRORED oracles (r9 verdict
task #1).

The differential gate cannot see a spec bug when the oracle replays
the engine's own recurrence (the evt_seasonal_outliers near-miss).
Entries tagged `oracle_style="mirrored"` in the registry therefore
each point at an independent semantic check — most live in older
files (test_graph.py, test_r9_continuation.py, ...); this file adds
the checks that were missing. Styles used, per the audit contract in
plans/registry.py:

- crafted-corpus expected values (identical/orthogonal vectors,
  identical/disjoint-vocab texts make the expectations provable
  WITHOUT re-running the engine's chain);
- pure-Python/numpy reference implementations of the documented
  recurrence (a different medium than the shared SQL/DataFrame
  algebra — a cleared-form bug on the SQL side cannot hide);
- bit-identity to a twin entry whose own semantic check is
  independent (the bucketed-strategy pattern).

tests/test_mirrored_oracle_audit.py sweeps that every mirrored entry
resolves to one of these.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators.graph import (
    hits_quantized,
    pagerank_quantized,
)
from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


# ---------- crafted fixtures -------------------------------------


def _write_embeddings(tmp_path, vecs, labels=None):
    """embeddings.parquet with float32 vectors (the testdata dtype)."""
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels or [0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _write_documents(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# Identical vectors ALWAYS share a k-means cell / LSH bucket (equal
# inputs give equal assignments under any deterministic rule), and
# orthogonal vectors have cosine 0 < threshold — so the expected dup
# structure below is provable without replaying the clustering.
DUP_VECS = [
    [1.0, 0.0, 0.0, 0.0],  # 0  group A
    [1.0, 0.0, 0.0, 0.0],  # 1  dup of 0
    [1.0, 0.0, 0.0, 0.0],  # 2  dup of 0
    [0.0, 1.0, 0.0, 0.0],  # 3  group B
    [0.0, 1.0, 0.0, 0.0],  # 4  dup of 3
    [0.0, 0.0, 1.0, 0.0],  # 5  singleton
    [0.0, 0.0, 0.0, 1.0],  # 6  singleton
    [0.0, 0.0, 3.0, 4.0],  # 7  cos 0.6 / 0.8 to 5 / 6 -> near both
]


def test_semantic_dedup_crafted_near_dups(spark, tmp_path):
    # Backs dedup_semantic / dedup_semantic_scaled / pipe_semdedup_e2e
    # (all route through semantic_dedup_auto,
    # test_semdedup_auto.py::test_judged_entries_route_through_the_front_doors).
    sf = _write_embeddings(tmp_path, DUP_VECS)
    got = {
        r["vec_id"]: r["dup_of"]
        for r in QUERIES["dedup_semantic"](spark, sf).collect()
    }
    assert got[1] == 0 and got[2] == 0  # identical -> min-id winner
    assert got[4] == 3
    assert got[0] is None and got[3] is None  # group minima survive
    # 5,6,7: cos(5,7)=0.6 and cos(6,7)=0.8 exceed the 0.2 threshold,
    # but only IF clustered together — an approximate operator may
    # split them, so the only universal guarantee there is that a
    # dup_of, when present, points at a lower-id genuine near-dup
    for vid in (5, 6, 7):
        if got[vid] is not None:
            assert got[vid] < vid and got[vid] in (5, 6)


def test_embedding_near_dup_pairs_crafted(spark, tmp_path):
    # Backs dedup_embedding / dedup_cluster (shared plane rule +
    # pair stage): identical vectors must pair at cosine 1.0; the
    # orthogonal groups must never pair.
    sf = _write_embeddings(tmp_path, DUP_VECS)
    rows = QUERIES["dedup_embedding"](spark, sf).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in rows}
    for must in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        assert must in pairs and abs(pairs[must] - 1.0) < 1e-12, pairs
    for (a, b), _ in pairs.items():
        va, vb = np.array(DUP_VECS[a]), np.array(DUP_VECS[b])
        cos = float(
            va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        )
        assert cos >= 0.2  # no below-threshold pair ever emitted


def test_knn_graph_matches_numpy_bruteforce(spark, tmp_path):
    # Backs sim_knn_graph: the exact all-pairs top-3 neighbor list
    # must equal an independent numpy brute force (rank order only —
    # the engine's fold cosine is compared bit-level elsewhere).
    vecs = [
        [3.0, 1.0, 0.0],
        [2.0, 2.0, 1.0],
        [1.0, 3.0, 2.0],
        [0.0, 1.0, 4.0],
        [4.0, 0.0, 1.0],
        [1.0, 1.0, 1.0],
    ]
    sf = _write_embeddings(tmp_path, vecs)
    m = np.array(vecs)
    norm = np.linalg.norm(m, axis=1)
    cos = (m @ m.T) / np.outer(norm, norm)
    expected = {}
    for i in range(len(vecs)):
        order = sorted(
            (j for j in range(len(vecs)) if j != i),
            key=lambda j: (-cos[i, j], j),
        )
        gaps = np.diff(sorted(cos[i][order[:4]]))
        assert all(abs(g) > 1e-9 for g in gaps)  # no rank ties
        expected[i] = order[:3]
    got = {}
    for r in QUERIES["sim_knn_graph"](spark, sf).collect():
        got.setdefault(r["vec_id"], {})[r["rn"]] = r["nbr_id"]
    assert {
        i: [got[i][rn] for rn in (1, 2, 3)] for i in got
    } == expected


def test_centroid_classify_confusion_is_diagonal(spark, tmp_path):
    # Backs sim_centroid_classify: two well-separated labeled groups
    # must classify onto the diagonal of the confusion matrix.
    vecs = [[1.0, 0.0], [3.0, 0.0], [2.0, 0.0], [0.0, 2.0], [0.0, 1.0]]
    labels = [0, 0, 0, 1, 1]
    sf = _write_embeddings(tmp_path, vecs, labels)
    got = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in QUERIES["sim_centroid_classify"](spark, sf).collect()
    }
    assert got == {(0, 0): 3, (1, 1): 2}


def test_sq8_recall_bounds_and_self_hit(spark):
    # Backs diag_sq8_recall: recall@10 in [0,1] with the self-vector
    # always recovered (cosine 1 survives any 8-bit quantization of
    # this corpus), mirroring the diag_ann_recall check.
    rows = QUERIES["diag_sq8_recall"](spark, SF).collect()
    assert {r["qid"] for r in rows} == {0, 1, 2, 3, 4}
    for r in rows:
        assert 1 <= r["n_hit"] <= 10
        assert abs(r["recall_at_10"] - r["n_hit"] / 10.0) < 1e-15


def test_ivf_sharded_bit_identical_to_ivf(spark):
    # Backs sim_ivf_sharded: the equi-join sharded serving plan must
    # produce the same rows as sim_ivf (whose own semantic check is
    # test_similarity_fastpath.py::test_ivf_scores_exact_and_self_first).
    a = sorted(map(tuple, QUERIES["sim_ivf"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["sim_ivf_sharded"](spark, SF).collect()))
    assert a == b and a


DUP_TEXTS = [
    "alpha beta gamma delta epsilon zeta",       # 0
    "alpha beta gamma delta epsilon zeta",       # 1 identical to 0
    "eta theta iota kappa lambda mu",            # 2 disjoint vocab
    "nu xi omicron pi rho sigma",                # 3 disjoint vocab
]


def test_minhash_crafted_identical_pair_only(spark, tmp_path):
    # Backs dedup_minhash / dedup_minhash_capped / dedup_minhash_cluster:
    # identical texts share every band signature (pair guaranteed);
    # disjoint vocabularies share no shingle, and with 2-row bands a
    # spurious collision would need two simultaneous hash collisions —
    # deterministic here, verified absent.
    sf = _write_documents(tmp_path, DUP_TEXTS)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash"](spark, sf).collect()
    }
    assert pairs == {(0, 1)}


def test_minhash_estimate_is_exact_on_identical_docs(spark, tmp_path):
    # Backs dedup_minhash_estimate: identical docs agree on all 8
    # minhashes -> est_jaccard exactly 1.0 (true Jaccard is 1).
    sf = _write_documents(tmp_path, DUP_TEXTS)
    rows = {
        (r["doc_a"], r["doc_b"]): (r["n_match"], r["est_jaccard"])
        for r in QUERIES["dedup_minhash_estimate"](spark, sf).collect()
    }
    assert rows[(0, 1)] == (8, 1.0)


def test_simhash_identical_equal_disjoint_differ(spark, tmp_path):
    # Backs dedup_simhash: identical texts MUST collide; the two
    # disjoint-vocabulary fingerprints differ on this corpus
    # (deterministic, checked — 16-bit space, distinct vote vectors).
    sf = _write_documents(tmp_path, DUP_TEXTS)
    h = {
        r["doc"]: r["simhash"]
        for r in QUERIES["dedup_simhash"](spark, sf).collect()
    }
    assert h[0] == h[1]
    assert h[0] != h[2] and h[2] != h[3]


def _hits_python_reference(edges, iterations):
    """The documented HITS recurrence (operators/graph.hits_quantized
    docstring) in pure Python: integer micro-units, per-half-step
    max-normalization via truncating integer division."""
    hubs = {s: 1_000_000 for s, _ in edges}
    auth = {}
    for _ in range(iterations):
        a_raw = {}
        for s, d in edges:
            a_raw[d] = a_raw.get(d, 0) + hubs.get(s, 0)
        am = max(a_raw.values())
        auth = {d: (1_000_000 * v) // am for d, v in a_raw.items()}
        h_raw = {}
        for s, d in edges:
            h_raw[s] = h_raw.get(s, 0) + auth.get(d, 0)
        hm = max(h_raw.values())
        hubs = {s: (1_000_000 * v) // hm for s, v in h_raw.items()}
    return auth


def test_hits_crafted_graph_reference(spark):
    # Backs graph_hits / graph_hits_bucketed (the bucketed twin also
    # has its bit-identity pin in test_graph_frontdoor.py): a pure-
    # Python rendering of the DOCUMENTED recurrence on a crafted
    # directed graph — every quantity non-negative, so Python // is
    # the same truncating division as Spark div / DuckDB //.
    edges = [(1, 3), (2, 3), (1, 4), (4, 5), (3, 5)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["nid"]: r["auth_q"]
        for r in hits_quantized(e, iterations=2).collect()
    }
    assert got == _hits_python_reference(edges, 2)
    # and the standard-HITS ordering facts on this graph
    assert got[3] == 1_000_000  # argmax authority pinned by norm
    assert got[3] > got[5] > 0


def _bpe_python_reference(token_counts, rounds):
    """Classic BPE training (Sennrich et al. 2016) in pure Python:
    vocabulary entries as symbol LISTS, pair counts weighted by token
    frequency (every adjacent position counts), best pair by
    (count desc, pair lexicographic), leftmost non-overlapping merge.
    Independent of the engine's framed-string representation."""
    vocab = {tok: list(tok) for tok in token_counts}
    merges = []
    for r in range(1, rounds + 1):
        counts = {}
        for tok, syms in vocab.items():
            n = token_counts[tok]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + n
                )
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, a + b, cnt))
        for tok, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[tok] = out
    return merges


def test_bpe_train_matches_python_reference(spark, tmp_path):
    # Backs pipe_bpe_train (and transitively the single-step entries
    # pipe_bpe_merge_step / pipe_bpe_apply_step that share its pair
    # algebra): the engine's framed-string merge loop must learn the
    # same merge table as textbook BPE. The corpus includes repeated
    # characters ("aaaa") so the leftmost-non-overlapping rule and
    # the abab double-merge case are both exercised.
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "aaaa abab low new",
        "wider wide wide low",
    ]
    sf = _write_documents(tmp_path, texts)
    counts = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    expected = _bpe_python_reference(counts, 10)
    got = sorted(
        (r["rn"], r["pair_a"], r["pair_b"], r["merged"], r["cnt"])
        for r in QUERIES["pipe_bpe_train"](spark, sf).collect()
    )
    assert got == expected and len(got) == 10


def test_bpe_vocab_matches_python_reference(spark, tmp_path):
    # Backs pipe_bpe_vocab: the post-merge symbol vocabulary must
    # equal textbook BPE's — train with the pure-Python reference,
    # apply its merges to every token's symbol list, count symbols
    # weighted by token frequency.
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "aaaa abab low new",
        "wider wide wide low",
    ]
    sf = _write_documents(tmp_path, texts)
    counts = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    merges = _bpe_python_reference(counts, 10)
    expected: dict[str, int] = {}
    for tok, n in counts.items():
        syms = list(tok)
        for _, a, b, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        for s in syms:
            expected[s] = expected.get(s, 0) + n
    got = {
        r["symbol"]: (r["cnt"], r["is_merged"])
        for r in QUERIES["pipe_bpe_vocab"](spark, sf).collect()
    }
    assert got == {
        s: (c, len(s) > 1) for s, c in expected.items()
    }


def test_bpe_train_rounds_knob_matches_reference(spark, tmp_path):
    # r10 verdict task #5: rounds is a knob and lineage is truncated
    # every checkpoint_every rounds. 25 rounds with checkpoint_every=4
    # crosses six truncation boundaries — the learned table must still
    # equal textbook BPE exactly, and early convergence (a corpus that
    # runs out of pairs) must break identically to the reference.
    from wsprnet_scraper_spark.plans.llmops import _bpe_train_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "aaaa abab low new",
        "wider wide wide low",
    ]
    sf = _write_documents(tmp_path, texts)
    counts = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    expected = _bpe_python_reference(counts, 25)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    got = _bpe_train_merges(d, rounds=25, checkpoint_every=4)
    assert got == expected


def test_bpe_encode_matches_python_reference(spark, tmp_path):
    # Backs pipe_bpe_encode: encoding the corpus with the learned
    # merges must equal a textbook BPE encoder — train with the
    # pure-Python reference, then apply its merges left-to-right
    # non-overlapping to each document's character sequence (spaces
    # are ordinary symbols; learned pairs never contain one, so
    # merges cannot cross word boundaries).
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "aaaa abab low new",
        "wider wide wide low",
    ]
    sf = _write_documents(tmp_path, texts)
    counts = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    merges = _bpe_python_reference(counts, 10)

    def encode(text):
        syms = list(text)
        for _, a, b, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {
        r["doc_id"]: r["n_symbols"]
        for r in QUERIES["pipe_bpe_encode"](spark, sf).collect()
    }
    assert got == {i: len(encode(t)) for i, t in enumerate(texts)}


def test_bpe_encode_joined_bit_identical_to_chain(spark, tmp_path):
    # Backs pipe_bpe_encode_joined: the join-based serving twin must
    # reproduce the replace-chain form BIT for bit — full rows
    # including the encoded md5, so the exact symbol sequence (not
    # just counts) is pinned. The corpus stresses the decomposition
    # identity: repeated merges inside a token ("abab" merging
    # twice), consecutive/leading/trailing spaces (empty tokens), and
    # tokens the training filter skips.
    texts = [
        "low lower lowest low low",
        "abab ababab aabb abab",
        " leading and  double  spaces ",
        "new newer newest new",
        "",
    ]
    sf = _write_documents(tmp_path, texts)
    chain = {
        r["doc_id"]: (r["n_symbols"], r["encoded_md5"])
        for r in QUERIES["pipe_bpe_encode"](spark, sf).collect()
    }
    joined = {
        r["doc_id"]: (r["n_symbols"], r["encoded_md5"])
        for r in QUERIES["pipe_bpe_encode_joined"](spark, sf).collect()
    }
    assert joined == chain and len(chain) == len(texts)


def test_bpe_encode_joined_deep_merge_table(spark, tmp_path):
    # The twin's reason to exist is merge-table depth: apply a
    # 40-merge table (past the judged 10 and past one
    # checkpoint_every=32 truncation boundary) through the iterative
    # vocab loop and compare against the pure-Python encoder.
    from wsprnet_scraper_spark.plans.llmops import (
        _bpe_encode_vocab,
        _bpe_train_merges,
    )

    texts = [
        "abcdefgh ijklmnop qrstuvwx yzABCDEF",
        "abcdefgh abcdefgh ijklmnop qrstuvwx",
        "GHIJKLMN OPQRSTUV WXYZabcd efghijkl",
        "mnopqrst uvwxyzAB CDEFGHIJ KLMNOPQR",
    ]
    sf = _write_documents(tmp_path, texts)
    counts = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    expected = _bpe_python_reference(counts, 40)

    def encode(text):
        syms = list(text)
        for _, a, b, _, _ in expected:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    d = spark.read.parquet(f"{sf}/documents.parquet")
    merges = _bpe_train_merges(d, rounds=40, checkpoint_every=8)
    assert merges == expected
    vocab = {
        r["tok"]: r["enc"]
        for r in _bpe_encode_vocab(d, merges).collect()
    }
    for tok in counts:
        got = vocab[tok].replace("\x1e", "").replace("\x1f", "")
        assert got == tok  # framing round-trips the token text
        n = vocab[tok].count("\x1e")
        assert n == len(encode(tok))


def test_ppr_bucketed_bit_identical_to_broadcast(spark):
    # Backs graph_ppr_bucketed: the SHUFFLE_HASH serving strategy must
    # reproduce the broadcast walk bit for bit (graph_ppr's own
    # semantic check is the teleport-mass test in test_advice_r9.py).
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1), (2, 3), (3, 4), (4, 3)],
        "src bigint, dst bigint",
    )
    kw = dict(iterations=3, sources=[3])
    a = {
        r["nid"]: r["rank_q"]
        for r in pagerank_quantized(edges, strategy="broadcast", **kw).collect()
    }
    b = {
        r["nid"]: r["rank_q"]
        for r in pagerank_quantized(edges, strategy="bucketed", **kw).collect()
    }
    assert a == b and sum(a.values()) > 0
