"""Global order statistics without the single-task window.

`ntile/percent_rank/cume_dist OVER (ORDER BY ...)` with no partition
key is semantically a total order — Spark executes it as ONE task
(WindowExec warns "Moving all data to a single partition"), which is
the plan that dies at 100 TB. `with_global_rank` computes the exact
global row number with bounded parallelism instead:

1. `repartitionByRange` on the order columns — non-overlapping,
   ordered cells (the explicit partition count keeps AQE from
   re-planning it); the range sample pass is one extra parallel scan;
2. per-cell `row_number` — a partitioned window, fully parallel;
3. a per-cell count summary (`cells` rows, not billions) carries a
   running-sum offset and the grand total; its window is deliberately
   single-partition — sanctioned because the input is already reduced
   (plans/audit.py enforces exactly this invariant);
4. broadcast the offsets back: global rank = cell offset + local
   row number.

Every rank-derived statistic then becomes exact integer arithmetic
over (rank, total): percent_rank = (rank-1)/(n-1), cume_dist =
rank/n (when the order key is unique, rank == row_number), and
ntile's remainder-to-the-front bucket sizing is reproduced literally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "grn",
    total_col: str = "grn_total",
    cells: int | None = None,
) -> DataFrame:
    """df + (`rank_col`: exact 1-based global row number under
    `order_cols`, `total_col`: total row count), no single-task
    window over the big relation.

    Requires a tie-free ordering (include a unique key in
    `order_cols`) — with ties, rows within a tie group get an
    arbitrary but valid order, like row_number itself.
    """
    if cells is None:
        cells = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(cells, *order_cols).withColumn(
        "_cell", F.spark_partition_id()
    )
    wl = Window.partitionBy("_cell").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(wl))
    counts = ranged.groupBy("_cell").agg(F.count(F.lit(1)).alias("_cnt"))
    # summary frame: `cells` rows — single partition by design
    # (input is the per-cell Aggregate; audited in plans/audit.py)
    ws = Window.orderBy("_cell")
    offsets = counts.select(
        "_cell",
        F.coalesce(
            F.sum("_cnt").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
        F.sum("_cnt")
        .over(
            ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias(total_col),
    )
    return (
        local.join(F.broadcast(offsets), "_cell")
        .withColumn(rank_col, F.col("_off") + F.col("_lrn"))
        .drop("_cell", "_lrn", "_off")
    )


def _idiv(a: Column, b) -> Column:
    # exact integer floor-division for non-negative operands: the
    # numerator is made exactly divisible first, so the double
    # division is exact and the cast can't truncate a .999...
    return ((a - a % b) / b).cast("long")


def ntile_of(rank: Column, total: Column, k: int) -> Column:
    """Exact ntile(k) for a global `rank` out of `total`: the first
    (total % k) buckets take ceil(total/k) rows — Spark's and
    DuckDB's shared remainder-to-the-front contract, restated as
    integer arithmetic."""
    n = total.cast("long")
    base = _idiv(n, k)
    rem = n - base * k
    big = base + 1
    cutoff = rem * big
    return (
        F.when(rank <= cutoff, _idiv(rank - 1, big) + 1)
        .otherwise(rem + _idiv(rank - 1 - cutoff, base) + 1)
        .cast("long")
    )


def percent_rank_of(rank: Column, total: Column) -> Column:
    """(rank-1)/(n-1) — exact when the ordering is tie-free (rank ==
    row_number), the same double division both engines perform."""
    return (rank - 1).cast("double") / (total - 1).cast("double")


def cume_dist_of(rank: Column, total: Column) -> Column:
    """rank/n — exact when the ordering is tie-free."""
    return rank.cast("double") / total.cast("double")
