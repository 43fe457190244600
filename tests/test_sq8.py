"""SQ8 operator edges (r8): the constant-dimension branch and the
centering property. Exactness vs DuckDB is the gate's job; these pin
operator-level behavior the gate data doesn't exercise (sf corpora
have no constant dimension).
"""

from __future__ import annotations

from wsprnet_scraper_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_constant_dimension_quantizes_to_zero_and_serving_survives(spark):
    # dim 0 constant across the corpus (mx == mn -> code 0 for all),
    # dim 1 carries the signal; opposite-sign vectors must rank a
    # same-sign vector above an opposite-sign one for each query.
    rows = [
        (0, [5.0, 1.0]),
        (1, [5.0, 0.9]),
        (2, [5.0, -1.0]),
        (3, [5.0, -0.8]),
    ]
    out = similarity.sq8_topk(_emb(spark, rows), [0, 2], k=2)
    got = {
        (r["qid"], r["vec_id"]): r["score"] for r in out.collect()
    }
    by_q = {}
    for (q, v), s in got.items():
        by_q.setdefault(q, []).append((s, v))
    # each query's top hit is itself; the runner-up is its same-sign
    # neighbor, which is only possible if centering preserved sign
    # structure despite the constant dim contributing (0-128)^2 to
    # every pair equally
    top = {q: [v for _, v in sorted(p, reverse=True)] for q, p in by_q.items()}
    assert top[0] == [0, 1]
    assert top[2] == [2, 3]


def test_scores_are_symmetric_integers(spark):
    rows = [(i, [float(i) / 3 - 1.0, 1.0 - float(i) / 5]) for i in range(8)]
    out = similarity.sq8_topk(_emb(spark, rows), [1, 4], k=8).collect()
    scores = {(r["qid"], r["vec_id"]): r["score"] for r in out}
    # integer scores, and dot-product symmetry between the two queries
    assert all(isinstance(s, int) for s in scores.values())
    assert scores[(1, 4)] == scores[(4, 1)]
