"""Semantics pin for dedup.minhash_cluster_incremental (r8): the
lexical incremental cluster dedup. A constructed corpus exercises all
three statuses, standing-label inheritance through the contraction
edge, and the batch-sized novel-subgraph closure. Identical texts
guarantee identical MinHash signatures, so matches are deterministic;
distinct texts use disjoint vocabularies so no accidental band
collisions occur.
"""

from __future__ import annotations

from wsprnet_scraper_spark.operators import dedup


def _corpus(spark):
    rows = [
        # corpus (doc_id % 10 != 0)
        (1, "alpha beta gamma delta epsilon"),     # cluster {1, 11, 21}
        (11, "alpha beta gamma delta epsilon"),
        (21, "alpha beta gamma delta epsilon"),
        (31, "zeta eta theta iota kappa"),          # corpus singleton
        # batch (doc_id % 10 == 0)
        (10, "alpha beta gamma delta epsilon"),     # dup_of_corpus -> 1
        (60, "zeta eta theta iota kappa"),          # dup_of_corpus -> 31
        (20, "lambda mu nu xi omicron"),            # dup_in_batch pair
        (40, "lambda mu nu xi omicron"),            #   with 20 -> 20
        (50, "rho sigma tau upsilon phi"),          # new_unique
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_incremental_statuses_and_labels(spark):
    out = dedup.minhash_cluster_incremental(
        _corpus(spark), lambda c: c % 10 == 0, "doc_id", "text", n=3
    )
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == {10, 20, 40, 50, 60}

    # corpus-match inheritance: batch doc 10 matches corpus docs
    # {1, 11, 21}, whose standing cluster label is 1 — and the final
    # cluster is min(10, 1) = 1
    assert got[10]["status"] == "dup_of_corpus"
    assert got[10]["cluster"] == 1
    assert got[10]["n_corpus_matches"] == 3

    # singleton corpus doc (never in a corpus pair) still contracts
    # to itself as the label
    assert got[60]["status"] == "dup_of_corpus"
    assert got[60]["cluster"] == 31
    assert got[60]["n_corpus_matches"] == 1

    # batch-batch novel pair: both land in cluster min(20, 40) = 20
    for d in (20, 40):
        assert got[d]["status"] == "dup_in_batch"
        assert got[d]["cluster"] == 20
        assert got[d]["n_corpus_matches"] == 0

    # untouched batch doc is its own cluster
    assert got[50] == {
        "doc_id": 50,
        "cluster": 50,
        "n_corpus_matches": 0,
        "status": "new_unique",
    }
