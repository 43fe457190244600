"""Iterative graph analytics on DataFrames (Pregel-style unrolled).

PageRank over an edge relation as a fixed number of join+aggregate
rounds — the DataFrame re-expression of the message-passing loop
(contributions flow along edges, ranks re-sum per destination).
Connected components (pointer-jumping) lives in operators/dedup.py;
this module holds the rank-propagation family.

Cross-engine discipline: ranks are integer-quantized micro-units
(1.0 == 1_000_000). Every step is BIGINT arithmetic — integer
division for the per-edge contribution, exact integer sums, integer
damping — so three iterations produce bit-identical results in any
engine with 64-bit integer semantics; no float accumulation order to
disagree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DAMP_Q = 850_000  # 0.85 in micro-units
BASE_Q = 150_000  # (1 - 0.85) in micro-units


def pagerank_quantized(
    edges: DataFrame, iterations: int = 3, persist_edges: bool = True
) -> DataFrame:
    """Damped PageRank, `iterations` unrolled rounds, integer math.

    `edges` is a directed (src, dst) relation where every node has at
    least one outgoing edge (make the graph undirected first if it
    has sinks — dangling-mass redistribution is deliberately out of
    scope for the quantized form). Returns (nid, rank_q) with rank_q
    in micro-units.

    Scale shape: out-degrees are attached to the edge relation ONCE
    and the result is persisted (`persist_edges`) — without it, plan
    unrolling recomputes the whole edge derivation every round, the
    classic iterative-DataFrame trap. Each round then joins the
    node-sized rank table onto the cached edges and reduces with one
    groupBy(dst) shuffle — the canonical Pregel superstep. The rank
    table is broadcast: #nodes ≪ #edges on real graphs, so the edge
    side never shuffles for the join; if the node table outgrows
    broadcast range, pre-bucket both relations by src/nid instead
    (operators tested in test_bucketing.py). On very deep iteration
    counts, checkpoint ranks every few rounds to truncate lineage —
    semantics unchanged.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").select("src", "dst", "deg")
    if persist_edges:
        ed = ed.persist()
    ranks = deg.select(
        F.col("src").alias("nid"),
        F.lit(SCALE).cast("bigint").alias("r"),
    )
    for _ in range(iterations):
        ranks = (
            ed.join(F.broadcast(ranks), ed.src == ranks.nid)
            .select("dst", F.expr("r div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("dst").alias("nid"),
                (
                    F.lit(BASE_Q)
                    + F.expr(f"({DAMP_Q} * s) div {SCALE}")
                ).cast("bigint").alias("r"),
            )
        )
    return ranks.select("nid", F.col("r").alias("rank_q"))
