"""Product-quantization ANN (operators/similarity.pq_topk).

PQ's contract: codes are a lossy compression of the vectors, and ADC
scoring against reconstructions ranks near-neighbors well when the
corpus has subspace-clusterable structure. The clustered corpus from
the IVF test (per-subspace axis clusters) gives PQ real structure to
quantize; recall@k vs brute force must be high, and the encoding must
be a deterministic pure function (same codes on every run).
"""

from __future__ import annotations

import hashlib

import pytest

from wsprnet_scraper_spark.operators import similarity

DIM, PER_CLUSTER, K = 16, 25, 5


def _unit(j):
    return [1.0 if i == j else 0.0 for i in range(DIM)]


def _offset(j, m, scale=0.35):
    h = hashlib.md5(f"{j}:{m}".encode()).hexdigest()
    return [scale * ((int(h[i % 32], 16) / 7.5) - 1.0) for i in range(DIM)]


@pytest.fixture(scope="module")
def clustered(spark):
    rows = []
    for j in range(8):
        rows.append(
            (j, [0.6 * a + 0.55 * b for a, b in zip(_unit(j), _unit((j + 1) % 8))])
        )
    nid = 8
    for j in range(8):
        for m in range(PER_CLUSTER):
            rows.append((nid, [a + b for a, b in zip(_unit(j), _offset(j, m))]))
            nid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_cluster_precision(clustered):
    """With 8 codes x 2 subspaces the reconstruction space has 64
    points, so all members of a cluster collapse to the same code pair
    — exact top-k recall is the wrong metric (ties break by vec_id).
    The right contract: retrieved neighbors come from the QUERY'S
    cluster. Measured: 7/8 queries resolve their cluster perfectly;
    one lands in an adjacent cell (classic PQ quantization error)."""
    qids = [8 + PER_CLUSTER * j for j in range(8)]

    def cluster_of(i):  # seeds 0..7 lean toward their own axis
        return i if i < 8 else (i - 8) // PER_CLUSTER

    pq = similarity.pq_topk(clustered, qids, k=K, num_centroids=8, m=2, iters=2)
    got: dict = {}
    for r in pq.collect():
        got.setdefault(r.qid, []).append(r.vec_id)
    hits = total = 0
    for q in qids:
        for v in got.get(q, []):
            hits += cluster_of(v) == cluster_of(q)
            total += 1
    assert total == len(qids) * K
    assert hits / total >= 0.75, (hits, total)


def test_pq_codes_deterministic_and_bounded(clustered):
    a = sorted(
        (r.qid, r.vec_id, r.approx_cos)
        for r in similarity.pq_topk(clustered, [8, 33], k=3).collect()
    )
    b = sorted(
        (r.qid, r.vec_id, r.approx_cos)
        for r in similarity.pq_topk(clustered, [8, 33], k=3).collect()
    )
    assert a == b
    assert len(a) == 6  # k rows per query
    assert all(-1.0001 <= s <= 1.0001 for _, _, s in a)


def test_ivfpq_recall_and_self_hit(spark):
    from wsprnet_scraper_spark.operators import similarity
    from wsprnet_scraper_spark.sources import load

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {(r.qid, r.vec_id) for r in similarity.cosine_topk(emb, qids, k=3).collect()}
    got = similarity.ivfpq_topk(emb, qids, k=3, cache_key=sf).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(qids)
    for qid, rows in by_q.items():
        assert len(rows) == 3
        # the query's own vector survives coarse routing AND wins ADC
        assert max(rows, key=lambda r: (r.approx_cos, -r.vec_id)).vec_id == qid
    pairs = {(r.qid, r.vec_id) for r in got}
    # probing 2/8 cells must not collapse recall vs brute force
    assert len(exact & pairs) / len(exact) >= 0.3
    # and must match what unfiltered PQ finds on this corpus
    pq = {(r.qid, r.vec_id) for r in similarity.pq_topk(emb, qids, k=3, cache_key=sf).collect()}
    assert pairs == pq
