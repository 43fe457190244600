"""interval_overlap_join ≡ the naive theta join, including intervals
spanning many buckets (replication + the emit-once rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wsprnet_scraper_spark.operators.intervals import interval_overlap_join


def _naive(a, b, spark):
    a = a.select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.col("start").alias("a_s"),
        F.col("end").alias("a_e"),
    )
    b = b.select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("b_id"),
        F.col("start").alias("b_s"),
        F.col("end").alias("b_e"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.u2) & (a.a_s <= b.b_e) & (b.b_s <= a.a_e),
        )
        .select(
            "user_id",
            "a_id",
            "b_id",
            F.greatest("a_s", "b_s").alias("ov_start"),
            F.least("a_e", "b_e").alias("ov_end"),
        )
    )


def test_matches_naive_with_multi_bucket_spans(spark):
    # deterministic mix: short intervals, intervals spanning 7+
    # buckets (heavy replication), exact-touch endpoints, disjoint
    # pairs, and cross-user non-matches
    rows_a, rows_b = [], []
    for i in range(60):
        u = i % 5
        s = (i * 137) % 1000
        rows_a.append((u, 1000 + i, s, s + (i % 4) * 250))   # 0..750 long
        t = (i * 311 + 40) % 1000
        rows_b.append((u, 2000 + i, t, t + (i % 7) * 130))   # 0..780 long
    schema = "user_id long, event_id long, start long, end long"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)

    got = sorted(
        (r.user_id, r.a_event_id, r.b_event_id, r.ov_start, r.ov_end)
        for r in interval_overlap_join(
            a, b, on=["user_id"], bucket_width=100
        ).collect()
    )
    want = sorted(
        (r.user_id, r.a_id, r.b_id, r.ov_start, r.ov_end)
        for r in _naive(a, b, spark).collect()
    )
    assert got == want and len(got) > 50
    # each pair exactly once despite multi-bucket co-occurrence
    assert len({(g[0], g[1], g[2]) for g in got}) == len(got)


def test_exact_endpoint_touch_counts_as_overlap(spark):
    a = spark.createDataFrame(
        [(1, 10, 100, 200)], "user_id long, event_id long, start long, end long"
    )
    b = spark.createDataFrame(
        [(1, 20, 200, 300), (1, 21, 201, 300)],
        "user_id long, event_id long, start long, end long",
    )
    got = {
        (r.a_event_id, r.b_event_id)
        for r in interval_overlap_join(a, b, on=["user_id"], bucket_width=64).collect()
    }
    assert got == {(10, 20)}  # closed-interval touch matches; 201 > 200 does not
