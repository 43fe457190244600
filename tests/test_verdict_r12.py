"""Round-12 verdict-task regression tests.

- VERDICT r11 task #2: agg_approx_sketches' exact-median harness is
  distributed (`_exact_median_by_key`) — must equal `percentile()`
  bit for bit on arbitrary multisets.
- VERDICT r11 task #4: win_rolling_median's per-row frame median is
  the array form (`_percentile_of_sorted_array`) — must equal the
  `percentile` window aggregate bit for bit, including the
  adversarial last-ulp frames that sank the r11 attempt.
"""

from __future__ import annotations

import math
import random
import struct

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wsprnet_scraper_spark.plans.analytics import (
    _exact_median_by_key,
    _percentile_of_sorted_array,
)


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


def _random_values(rng, n):
    # mix of 2-decimal "prices" (the l_extendedprice shape, including
    # the 69.62/69.64 neighborhood from SCALE.md's r11 ulp example),
    # exact ties, and raw uniform doubles
    out = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.4:
            out.append(round(rng.uniform(1, 200), 2))
        elif kind < 0.6:
            out.append(rng.choice([69.62, 69.63, 69.64, 69.65]))
        elif kind < 0.8:
            out.append(float(rng.randint(1, 50)))
        else:
            out.append(rng.uniform(0, 1e6))
    return out


def test_percentile_of_sorted_array_bit_identical(spark):
    # trailing-9 frames over 6 groups x 400 rows: every frame size
    # 1..10, heavy ties, the ulp-adversarial price neighborhood —
    # the array form must reproduce the percentile window aggregate
    # to the last bit on every row.
    rng = random.Random(1206)
    rows = [
        (g, i, v)
        for g in range(6)
        for i, v in enumerate(_random_values(rng, 400))
    ]
    df = spark.createDataFrame(rows, "g int, seq int, v double")
    w = W.partitionBy("g").orderBy("seq").rowsBetween(-9, 0)
    got = (
        df.select(
            "g",
            "seq",
            F.percentile(F.col("v"), F.lit(0.5)).over(w).alias("ref"),
            _percentile_of_sorted_array(
                F.array_sort(F.collect_list("v").over(w)), 0.5
            ).alias("arr"),
        )
        .collect()
    )
    assert len(got) == 2400
    bad = [
        (r["g"], r["seq"], r["ref"], r["arr"])
        for r in got
        if _bits(r["ref"]) != _bits(r["arr"])
    ]
    assert bad == []


@pytest.mark.parametrize("p", [0.25, 0.5, 0.9])
def test_percentile_of_sorted_array_other_quantiles(spark, p):
    # the helper is general in p — pin a non-median quantile too
    rng = random.Random(int(p * 100))
    rows = [(0, i, v) for i, v in enumerate(_random_values(rng, 300))]
    df = spark.createDataFrame(rows, "g int, seq int, v double")
    w = W.partitionBy("g").orderBy("seq").rowsBetween(-6, 0)
    got = df.select(
        F.percentile(F.col("v"), F.lit(p)).over(w).alias("ref"),
        _percentile_of_sorted_array(
            F.array_sort(F.collect_list("v").over(w)), p
        ).alias("arr"),
    ).collect()
    assert all(_bits(r["ref"]) == _bits(r["arr"]) for r in got)


def test_exact_median_by_key_bit_identical_to_percentile(spark):
    # groups of odd/even/1/2 sizes, duplicate values, values straddling
    # the block_width boundary — distributed selection must equal the
    # single-reducer percentile() bit for bit per group.
    rng = random.Random(1212)
    rows = []
    for g, n in [("A", 501), ("B", 500), ("C", 1), ("D", 2), ("E", 37)]:
        for v in _random_values(rng, n):
            rows.append((g, v))
    rows += [("F", 999.995), ("F", 1000.005)]  # straddles block 0/1
    df = spark.createDataFrame(rows, "k string, val double")
    ref = {
        r["k"]: r["m"]
        for r in df.groupBy("k")
        .agg(F.expr("percentile(val, 0.5)").alias("m"))
        .collect()
    }
    got = {
        r["flag"]: r["exact_med"]
        for r in _exact_median_by_key(
            df, F.col("k").alias("flag"), F.col("val").alias("price")
        ).collect()
    }
    assert set(got) == set(ref)
    assert all(_bits(got[k]) == _bits(ref[k]) for k in ref), {
        k: (ref[k], got[k]) for k in ref if _bits(got[k]) != _bits(ref[k])
    }


def test_exact_median_by_key_negative_values(spark):
    # negative values exercise floor() blocking below zero
    rows = [("n", float(v)) for v in [-5, -3, -2, 2, 7]]
    df = spark.createDataFrame(rows, "k string, val double")
    got = _exact_median_by_key(
        df, F.col("k").alias("flag"), F.col("val").alias("price")
    ).collect()
    assert got[0]["exact_med"] == -2.0


def test_ppr_frontier_prune_bit_identical(spark):
    # VERDICT r11 task #6: the forward-push serve (prune_zero) must
    # reproduce the unpruned recurrence exactly on the judged r > 0
    # relation — random directed graph with sink-free nodes, sources
    # both with and without in-edges, 4 rounds so the frontier grows
    # across checkpoints.
    rng = random.Random(126)
    n = 40
    edges = list({(rng.randint(1, n), rng.randint(1, n)) for _ in range(160)})
    edges = [(a, b) for a, b in edges if a != b]
    # ensure no sinks: every node gets one out-edge to its successor
    edges += [(i, i % n + 1) for i in range(1, n + 1)]
    df = spark.createDataFrame(sorted(set(edges)), "src bigint, dst bigint")
    from wsprnet_scraper_spark.operators.graph import pagerank_quantized

    for strategy in ("broadcast", "bucketed"):
        kw = dict(iterations=4, sources=[3, 7], strategy=strategy)
        ref = {
            r["nid"]: r["rank_q"]
            for r in pagerank_quantized(df, prune_zero=False, **kw)
            .filter(F.col("rank_q") > 0)
            .collect()
        }
        got = {
            r["nid"]: r["rank_q"]
            for r in pagerank_quantized(df, prune_zero=True, **kw)
            .filter(F.col("rank_q") > 0)
            .collect()
        }
        assert got == ref and len(ref) > 0, strategy


def test_ppr_frontier_prune_stays_neighborhood_sized(spark):
    # two disconnected components; sources live in the small one —
    # the pruned walk's raw output must never contain nodes of the
    # unreachable component (the frontier property that makes serving
    # neighborhood-sized).
    small = [(1, 2), (2, 1), (2, 3), (3, 2)]
    big = [(k, k + 1) for k in range(100, 140)] + [(140, 100)]
    df = spark.createDataFrame(small + big, "src bigint, dst bigint")
    from wsprnet_scraper_spark.operators.graph import pagerank_quantized

    out = pagerank_quantized(df, iterations=3, sources=[1]).collect()
    assert {r["nid"] for r in out} <= {1, 2, 3}


def test_agg_approx_sketches_no_single_reducer_sort(spark):
    # the r11 'weak' finding: the harness plan buffered whole groups
    # on single reducers via the percentile() aggregate. The fixed
    # plan must not contain any percentile aggregate at all (the
    # sketch side keeps approx_percentile; the exact side is the
    # blocked selection).
    from wsprnet_scraper_spark.plans import QUERIES

    import re

    df = QUERIES["agg_approx_sketches"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_percentile" in plan
    assert not re.search(r"(?<!approx_)percentile\(l_extendedprice", plan)
