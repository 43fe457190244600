"""Graph-analytics queries over the customer–supplier interaction
graph (edges = distinct (o_custkey, l_suppkey) pairs via orders ⋈
lineitem, made undirected so every node has outgoing edges).

The oracle replays the unrolled Pregel supersteps as chained CTEs;
because ranks are integer-quantized (operators/graph.py), the CTE
chain is bit-identical to the DataFrame loop — no float tolerance
needed even after three propagation rounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.graph import pagerank_quantized
from ..sources import load
from .registry import register

_ITERATIONS = 3

_GRAPH_SQL = """
e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1)
"""


def _pagerank_oracle(iterations: int) -> str:
    steps = [
        "ed AS (SELECT e.src, e.dst, d.deg FROM edges e"
        " JOIN deg d ON d.src = e.src)",
        "it0 AS (SELECT src AS nid, CAST(1000000 AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, iterations + 1):
        steps.append(
            f"it{i} AS (SELECT ed.dst AS nid,"
            f" CAST(150000 + (850000 * SUM(r.r // ed.deg)) // 1000000"
            f" AS BIGINT) AS r"
            f" FROM ed JOIN it{i - 1} r ON ed.src = r.nid GROUP BY ed.dst)"
        )
    return (
        f"WITH {_GRAPH_SQL}, {', '.join(steps)}\n"
        f"SELECT nid, r AS rank_q FROM it{iterations}"
    )


def _edges(spark, sf_dir):
    o = load(spark, sf_dir, "orders", parallel="never")
    li = load(spark, sf_dir, "lineitem", parallel="never")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


@register("graph_pagerank", _pagerank_oracle(_ITERATIONS))
def graph_pagerank(spark, sf_dir):
    """Three-round damped PageRank over the undirected
    customer–supplier graph; integer-quantized supersteps (see
    operators/graph.py for the scale shape and the exactness
    argument)."""
    return pagerank_quantized(_edges(spark, sf_dir), _ITERATIONS)


@register(
    "graph_degree_dist",
    f"""
WITH {_GRAPH_SQL}
SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY deg
""",
)
def graph_degree_dist(spark, sf_dir):
    """Degree distribution of the interaction graph — the stacked
    two-level aggregation (per-node degree, then nodes per degree);
    second level runs on node-count-sized input."""
    e = _edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
