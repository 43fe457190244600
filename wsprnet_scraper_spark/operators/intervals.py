"""Interval-overlap join by bucket decomposition.

A pure inequality (theta) join of two interval relations —
"a overlaps b" = a.start <= b.end AND b.start <= a.end — has no
native Spark operator: the naive plan is a broadcast nested loop
(dies when neither side fits) or a cross join (dies always). The
scalable re-expression turns it into an EQUI-join: chop the time
axis into fixed-width buckets, replicate each interval onto every
bucket it touches, hash-join on (key, bucket), and post-filter the
true overlap predicate. Replication factor is interval_len/width + 1
(pick width ~ median interval length); the shuffle is hash(key,
bucket) — fully parallel, no broadcast of either side, and AQE's
skew-join split handles a hot (key, bucket).

Dedup without a distinct: a pair of intervals can co-occur in many
buckets, so each pair is emitted ONLY in the bucket containing the
overlap's start (max of the two starts). That turns the usual
explode -> join -> DISTINCT into explode -> join -> filter — one
shuffle fewer, and the filter is evaluated inside the join's codegen
stage.

The same decomposition is the standard distributed range-join
strategy (cf. Spark's own range-join hints in the Databricks
runtime, and the interval-join of Flink); it's here as a first-class
operator because the engine's workloads join event windows at 100 TB
where both sides are fact-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    start: str = "start",
    end: str = "end",
    bucket_width: int = 300_000_000,
    prefix: tuple[str, str] = ("a_", "b_"),
) -> DataFrame:
    """Join rows of `a` and `b` sharing `on` keys whose [start, end]
    intervals overlap (closed ends, integer units — e.g. epoch
    micros). Returns the key columns plus every non-key column of
    each side under its prefix, with `ov_start`/`ov_end` for the
    intersection. Each qualifying pair appears exactly once.
    """
    pa, pb = prefix

    def explode_buckets(df: DataFrame, p: str) -> DataFrame:
        cols = [F.col(c) for c in on] + [
            F.col(c).alias(f"{p}{c}")
            for c in df.columns
            if c not in on
        ]
        return df.select(
            *cols,
            F.explode(
                F.sequence(
                    (F.col(start) / bucket_width).cast("long"),
                    (F.col(end) / bucket_width).cast("long"),
                )
            ).alias("_bkt"),
        )

    ea = explode_buckets(a, pa)
    eb = explode_buckets(b, pb)
    a_start, a_end = F.col(f"{pa}{start}"), F.col(f"{pa}{end}")
    b_start, b_end = F.col(f"{pb}{start}"), F.col(f"{pb}{end}")
    ov_start = F.greatest(a_start, b_start)
    ov_end = F.least(a_end, b_end)
    joined = ea.join(eb, on=on + ["_bkt"]).filter(
        (a_start <= b_end)
        & (b_start <= a_end)
        # emit each pair only in the bucket where its overlap starts
        & ((ov_start / bucket_width).cast("long") == F.col("_bkt"))
    )
    return joined.select(
        *[F.col(c) for c in on],
        *[
            F.col(c)
            for c in joined.columns
            if c not in on and c != "_bkt"
        ],
        ov_start.alias("ov_start"),
        ov_end.alias("ov_end"),
    )
