"""pipe_dedup_cascade: all four verdicts on a crafted corpus.

The testdata fires only the near-dup stage at sf0.01 (and 8 exact
dups at sf0.1), so the driver gate alone under-exercises the cascade
ordering. This corpus plants one representative per verdict and pins
the PRIORITY: an exact copy is exact_dup even though it would also
collide at stages 2 and 3; a re-punctuated copy is normalized_dup
even though MinHash would also pair it; a one-token-edit copy only
the LSH stage can catch is near_dup; the originals and the loner stay
kept.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog near the riverbank "
    "while autumn leaves drift slowly down onto the quiet water below"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),                                   # kept (first holder)
        (1, BASE),                                   # exact_dup of 0
        (2, BASE.replace("quick", "Quick,")),        # normalized_dup of 0
        (3, BASE.replace("autumn", "summer")),       # near_dup (LSH only)
        (4, "completely unrelated text about spark catalyst optimizer "
            "plans and tungsten codegen stages running on the cluster"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cascade_verdicts_and_priority(corpus, monkeypatch):
    from wsprnet_scraper_spark.plans import llmops

    monkeypatch.setattr(
        llmops, "load", lambda spark, sf_dir, name, **kw: corpus
    )
    out = {
        r["doc_id"]: r["status"]
        for r in llmops.pipe_dedup_cascade(corpus.sparkSession, "/x").collect()
    }
    assert out == {
        0: "kept",
        1: "exact_dup",
        2: "normalized_dup",
        3: "near_dup",
        4: "kept",
    }


def test_cascade_oracle_agrees_on_crafted_corpus(corpus):
    """The DuckDB oracle produces the identical verdicts on the same
    crafted rows — the cross-engine check at the corner the sf-data
    gate can't reach."""
    import duckdb

    from wsprnet_scraper_spark.plans import ORACLE

    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    got = {
        int(r[0]): r[1]
        for r in con.execute(ORACLE["pipe_dedup_cascade"]).fetchall()
    }
    assert got == {
        0: "kept",
        1: "exact_dup",
        2: "normalized_dup",
        3: "near_dup",
        4: "kept",
    }
