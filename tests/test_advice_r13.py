"""Regression tests for the r12 ADVICE findings closed in r13.

A1 stores.materialized scratch tier: a corpus dir without the named
   table must fall back to an unkeyed one-shot scratch build (the
   pre-r12 behavior) instead of propagating corpus_fingerprint's
   FileNotFoundError; the persistent tier must still fail (a
   constant key would serve stale state across corpus rewrites).
A2 stores._land: a build()/write failure must not leak its
   `.{kind}_wip_*` temp dir into the store root.
A3 strm_dedup_watermark: the previous generation's workdir is
   reclaimed only AFTER the new invocation's query finished (no
   debris accumulation, and a failed rebuild leaves the old
   generation intact).
A4 agg_approx_sketches: degenerate groups (all-NULL prices, NULL
   flag) survive the exact-median/quantile joins with NULL q50_ok
   instead of being dropped by a null-unsafe inner join.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wsprnet_scraper_spark.operators import stores
from __spark_entry__ import queries

QUERIES = queries()


def test_materialized_scratch_falls_back_without_table(
    spark, tmp_path, monkeypatch
):
    monkeypatch.delenv(stores.ENV_VAR, raising=False)
    sf = tmp_path / "no_table_corpus"
    sf.mkdir()
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).toDF("v")

    df = stores.materialized(spark, str(sf), "k_a1", build)
    assert df.count() == 5
    # the handle is cached: a second serve must not rebuild
    df2 = stores.materialized(spark, str(sf), "k_a1", build)
    assert df2.count() == 5
    assert len(calls) == 1


def test_materialized_persistent_still_fails_without_table(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv(stores.ENV_VAR, str(tmp_path / "store"))
    sf = tmp_path / "no_table_corpus_p"
    sf.mkdir()
    with pytest.raises(FileNotFoundError):
        stores.materialized(
            spark, str(sf), "k_a1p", lambda: spark.range(1).toDF("v")
        )


def test_failed_build_leaves_no_wip_debris(spark, tmp_path, monkeypatch):
    store = tmp_path / "store"
    monkeypatch.setenv(stores.ENV_VAR, str(store))
    sf = tmp_path / "corpus"
    sf.mkdir()
    (sf / "documents.parquet").write_bytes(b"\x00" * 16)

    def bad_build():
        raise RuntimeError("synthetic build failure")

    with pytest.raises(RuntimeError):
        stores.materialized(spark, str(sf), "k_a2", bad_build)
    debris = [p for p in os.listdir(store) if "wip" in p]
    assert debris == [], debris
    # the store still works after the failure
    ok = stores.materialized(
        spark, str(sf), "k_a2", lambda: spark.range(3).toDF("v")
    )
    assert ok.count() == 3


def test_dedup_watermark_reclaims_only_after_success(spark):
    from wsprnet_scraper_spark.plans import streaming_q

    sf = "/root/testdata/sf0.001"
    n1 = QUERIES["strm_dedup_watermark"](spark, sf).count()
    gen1 = streaming_q._WM_WORK
    assert gen1 is not None and os.path.isdir(gen1)
    n2 = QUERIES["strm_dedup_watermark"](spark, sf).count()
    gen2 = streaming_q._WM_WORK
    assert n1 == n2
    # generation 1 reclaimed exactly once generation 2 succeeded
    assert gen2 != gen1
    assert not os.path.exists(gen1)
    assert os.path.isdir(gen2)


def test_approx_sketches_degenerate_groups_survive(spark, tmp_path):
    # group "Z": prices all NULL -> exact median has no row; group
    # NULL: a null-unsafe equi-join would drop it. Both must survive
    # with NULL q50_ok (the oracle's single GROUP BY keeps them).
    flags = ["A"] * 6 + ["Z"] * 4 + [None] * 3
    keys = list(range(1, 14))
    prices = [100.0, 110.0, 120.0, 130.0, 140.0, 150.0] + [None] * 4 + [
        50.0,
        60.0,
        70.0,
    ]
    tbl = pa.table(
        {
            "l_returnflag": pa.array(flags),
            "l_orderkey": pa.array(keys, pa.int64()),
            "l_extendedprice": pa.array(prices, pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_sketches"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"A", "Z", None}
    assert rows["Z"]["exact_nd"] == 4
    assert rows["Z"]["q50_ok"] is None
    assert rows["Z"]["hll_ok"] is not None
    assert rows[None]["exact_nd"] == 3
    assert rows["A"]["q50_ok"] is True
