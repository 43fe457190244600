"""Block-partitioned bounded ROWS frames with halo rows.

A trailing-k-rows window partitioned only by a low-cardinality series
key (e.g. 5 event types) is CORRECT at any scale but its sort/window
parallelism is capped at the key cardinality — the whole series sorts
through one task per key. This module runs the same frame at full
parallelism:

1. block the stream by time (`time_col div block_us`) — contiguous in
   the (time, tiebreak) order, so the within-block window is exact
   except for each block's first k rows;
2. per-(series, block) counts -> cumulative offsets (a tiny
   aggregate-reduced summary window, sanctioned by plans/audit.py)
   give every row its exact GLOBAL row number rn = offset + local rn;
3. every block keeps its last k rows as a `tails` relation
   (k x blocks rows). The k rows globally preceding block b are all
   within k of their own block's end (blocks are contiguous in rn),
   so they all live in `tails`; assigning tails rows with
   rn in [off(b)-k+1, off(b)] to block b as HALO rows makes each
   block self-sufficient;
4. one more (series, block)-partitioned window over big+halo rows
   computes the trailing frame aggregates; halo rows are dropped from
   the output.

The result is bit-identical to the single-window form (same frame
multiset, same global rn, same expressions) — the oracle-differential
gate verifies exactly that for win_weighted_ma_blocked vs the shared
SQL. Cost: one extra exchange of the fact relation; gain: sort and
frame work parallelize over blocks x series instead of series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _halo_blocks(
    df: DataFrame,
    series_col: str,
    time_col: str,
    tiebreak_col: str,
    value_col: str | list[str],
    k: int,
    block_us: int,
):
    """Shared steps 1–3 of the module recipe: returns (both, wf)
    where `both` is the big+halo relation carrying (series, _blk,
    time, tiebreak, value(s), _rn, _halo) and `wf` is the
    (series, _blk)-partitioned trailing-k frame over _rn. The
    public entry points (sums, multi-sums, arrays) each run their
    own step-4 aggregate over this identical frame multiset.
    `value_col` may be a list — every listed column rides the halo
    rows, so one pass serves frames needing several measures."""
    s, t, tb = series_col, time_col, tiebreak_col
    vs = [value_col] if isinstance(value_col, str) else list(value_col)
    base = df.withColumn("_blk", F.expr(f"{t} div {block_us}"))

    wl = Window.partitionBy(s, "_blk").orderBy(t, tb)
    local = base.withColumn("_lrn", F.row_number().over(wl))

    counts = base.groupBy(s, "_blk").agg(F.count(F.lit(1)).alias("_cnt"))
    # summary window: blocks x series rows, input is an Aggregate —
    # the audit-sanctioned reduced shape
    ws = Window.partitionBy(s).orderBy("_blk")
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_cnt").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("bigint"),
    )

    ranked = local.join(F.broadcast(offsets), [s, "_blk"]).withColumn(
        "_rn", (F.col("_off") + F.col("_lrn")).cast("bigint")
    )

    tails = ranked.where(F.col("_lrn") > F.col("_cnt") - k).select(
        s, F.col("_blk").alias("_src_blk"), t, tb, *vs, "_rn"
    )
    starts = offsets.select(s, F.col("_blk").alias("_tgt_blk"), "_off")
    halo = tails.join(
        F.broadcast(starts),
        (tails[s] == starts[s])
        & (F.col("_src_blk") < F.col("_tgt_blk"))
        & (F.col("_rn") > F.col("_off") - k)
        & (F.col("_rn") <= F.col("_off")),
    ).select(
        tails[s],
        F.col("_tgt_blk").alias("_blk"),
        tails[t],
        tails[tb],
        *[tails[v] for v in vs],
        F.col("_rn"),
        F.lit(True).alias("_halo"),
    )

    big = ranked.select(
        s, "_blk", t, tb, *vs, "_rn", F.lit(False).alias("_halo")
    )
    both = big.unionByName(halo)

    wf = (
        Window.partitionBy(s, "_blk")
        .orderBy("_rn")
        .rowsBetween(-k, Window.currentRow)
    )
    return both, wf


def trailing_frame_sums(
    df: DataFrame,
    series_col: str,
    time_col: str,
    tiebreak_col: str,
    value_col: str,
    k: int = 19,
    block_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """df + (rn, s1, s0, c): the exact global row number per series
    under (time, tiebreak), and SUM(value*rn), SUM(value), COUNT(*)
    over the trailing ROWS BETWEEN k PRECEDING AND CURRENT ROW frame
    — computed block-parallel as documented above. `value_col` must
    be integral (the sums are exact in any accumulation order)."""
    s, t, tb, v = series_col, time_col, tiebreak_col, value_col
    both, wf = _halo_blocks(df, s, t, tb, v, k, block_us)
    out = both.select(
        s,
        t,
        tb,
        v,
        F.col("_rn").alias("rn"),
        "_halo",
        F.sum(F.col(v) * F.col("_rn")).over(wf).alias("s1"),
        F.sum(v).over(wf).alias("s0"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("c"),
    )
    return out.where(~F.col("_halo")).drop("_halo")


def trailing_frame_multi_sums(
    df: DataFrame,
    series_col: str,
    time_col: str,
    tiebreak_col: str,
    value_cols: list[str],
    k: int = 19,
    block_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """df + (rn, c, s_<col> per value col): trailing ROWS BETWEEN k
    PRECEDING AND CURRENT ROW sums of SEVERAL integral columns in one
    block+halo pass — for frame statistics needing multiple measures
    (Bollinger's Σx and Σx², RSI's Σδ and Σ|δ|) where running the
    single-sum helper per measure would pay the exchange repeatedly."""
    s, t, tb = series_col, time_col, tiebreak_col
    both, wf = _halo_blocks(df, s, t, tb, value_cols, k, block_us)
    out = both.select(
        s,
        t,
        tb,
        *value_cols,
        F.col("_rn").alias("rn"),
        "_halo",
        F.count(F.lit(1)).over(wf).cast("bigint").alias("c"),
        *[F.sum(v).over(wf).alias(f"s_{v}") for v in value_cols],
    )
    return out.where(~F.col("_halo")).drop("_halo")


def trailing_frame_arrays(
    df: DataFrame,
    series_col: str,
    time_col: str,
    tiebreak_col: str,
    value_col: str,
    k: int = 19,
    block_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """df + (rn, arr): the exact global row number per series and the
    trailing ROWS BETWEEN k PRECEDING AND CURRENT ROW frame VALUES in
    frame order (oldest first, current row last) — for frame
    aggregates that are position-dependent (e.g. geometric EWMA
    weights) and so can't run through the two-integer-sums identity.
    collect_list over the _rn-ordered window appends in frame order,
    and _rn is a unique total order per (series, _blk), so the array
    is deterministic and identical to the single-window form's frame
    sequence. Same block+halo machinery, same frame multiset."""
    s, t, tb, v = series_col, time_col, tiebreak_col, value_col
    both, wf = _halo_blocks(df, s, t, tb, v, k, block_us)
    out = both.select(
        s,
        t,
        tb,
        v,
        F.col("_rn").alias("rn"),
        "_halo",
        F.collect_list(v).over(wf).alias("arr"),
    )
    return out.where(~F.col("_halo")).drop("_halo")
