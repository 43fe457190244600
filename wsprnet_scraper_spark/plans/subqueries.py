"""Subquery / CTE / sessionization capability suite.

The reference has no query language at all (SURVEY.md §3: "no parser,
no planner — the plan is the call graph"), so correlated subqueries,
CTEs, and sessionization are pure capability fills. Each query is
expressed the way Spark wants it:

- EXISTS / IN            -> left-semi joins (Catalyst plans the same
                            RewritePredicateSubquery result either way);
- NOT EXISTS             -> left-anti join;
- correlated scalar agg  -> a window over the correlation key (one
                            shuffle) instead of agg + self-join (two);
- scalar subquery vs all -> broadcast of a 1-row aggregate;
- CTE chains             -> the real SQL surface (spark.sql over temp
                            views) so the engine's SQL front door is
                            exercised, not just the DataFrame API.

Cross-engine exactness: avg comparisons are cross-multiplied into
integer/decimal arithmetic (qty < sum/(5*cnt) becomes
5*qty*cnt < sum), so no float division ever feeds a predicate.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import load, load_events
from .registry import register

DEC = "decimal(12,2)"


def dec(c):
    return F.col(c).cast(DEC)


def one():
    return F.lit(1).cast(DEC)


def _money(x: str) -> str:
    return f"CAST({x} AS DECIMAL(12,2))"


@register(
    "sub_exists",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
""",
)
def sub_exists(spark, sf_dir):
    """Correlated EXISTS (TPC-H Q4 shape): orders with at least one
    lineitem shipped after the order date. The correlated predicate
    references both sides, so it rides in the semi-join condition —
    one shuffle on orderkey, probe side short-circuits on first match."""
    orders = load(spark, sf_dir, "orders", parallel="never")
    li = load(spark, sf_dir, "lineitem", parallel="never")
    cond = (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "sub_not_exists",
    """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
""",
)
def sub_not_exists(spark, sf_dir):
    """Correlated NOT EXISTS -> left-anti join: customers who have
    never placed an urgent order. The inner filter (o_orderpriority)
    is pushed below the join, so the anti probe builds on ~1/5 of
    orders; the join shuffles on custkey only."""
    cust = load(spark, sf_dir, "customer", parallel="never")
    urgent = load(spark, sf_dir, "orders", parallel="never").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@register(
    "sub_in",
    f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(CAST(SUM({_money('l_extendedprice')}) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
""",
)
def sub_in(spark, sf_dir):
    """Uncorrelated IN subquery -> left-semi join (never a collected
    value list: the inner relation can be billions of keys at 100 TB)."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    urgent = (
        load(spark, sf_dir, "orders", parallel="never")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
    )


@register(
    "sub_scalar_avg",
    f"""
WITH pa AS (
  SELECT l_partkey,
    SUM({_money('l_quantity')}) AS sum_qty,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM({_money('l_extendedprice')}) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_weekly
FROM lineitem JOIN pa USING (l_partkey)
WHERE 5 * {_money('l_quantity')} * cnt < sum_qty
""",
)
def sub_scalar_avg(spark, sf_dir):
    """Correlated scalar-aggregate subquery (TPC-H Q17 shape):
    lineitems with quantity below 20% of their part's average.

    Spark plan: the per-part average is a window over l_partkey — ONE
    shuffle total, vs two for the aggregate-then-rejoin the SQL oracle
    spells (Catalyst can't fuse that rejoin; the window form is the
    scale-out win). The avg comparison is cross-multiplied to decimal
    (5*qty*cnt < sum) so it is exact in both engines."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    w = W.partitionBy("l_partkey")
    return (
        li.withColumn("sum_qty", F.sum(dec("l_quantity")).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.lit(5) * dec("l_quantity") * F.col("cnt") < F.col("sum_qty"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_weekly"))
    )


@register(
    "sub_scalar_global",
    f"""
WITH g AS (
  SELECT SUM({_money('l_extendedprice')}) AS total,
    CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem
)
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_above
FROM lineitem, g
WHERE {_money('l_extendedprice')} * cnt > total
GROUP BY l_returnflag
""",
)
def sub_scalar_global(spark, sf_dir):
    """Uncorrelated scalar subquery: rows above the global average
    price. The 1-row global aggregate is broadcast (a literal-sized
    build side regardless of fact-table scale); price > sum/cnt is
    cross-multiplied to exact decimal arithmetic."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    g = li.agg(
        F.sum(dec("l_extendedprice")).alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.crossJoin(F.broadcast(g))
        .filter(dec("l_extendedprice") * F.col("cnt") > F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@register(
    "sub_min_cost_supplier",
    f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    MIN({_money('l_extendedprice')}) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, s.s_name, n.n_name,
  CAST(ps.cost AS DOUBLE) AS cost
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND p.p_size <= 5
  AND ps.cost = (
    SELECT MIN(ps2.cost) FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
""",
)
def sub_min_cost_supplier(spark, sf_dir):
    """Correlated min-over-group subquery (TPC-H Q2 shape) with the
    part-supplier catalog derived from lineitem (the testdata has no
    partsupp; MIN(extendedprice) per (part, supplier) stands in for
    ps_supplycost): for each small European-sourced part, every
    supplier offering it at the regional minimum cost.

    Spark plan: the correlated `= (SELECT MIN ...)` collapses into a
    window MIN over l_partkey computed on the already
    region-filtered catalog — one extra exchange on partkey instead
    of Catalyst's agg + rejoin decorrelation (two). Cost stays
    DECIMAL through the MIN and the equality, so the predicate is
    exact in both engines; ties (several suppliers at the minimum)
    are returned in full, making the result a well-defined set with
    no tiebreaker needed. The nation/region dimension joins
    broadcast; only the catalog aggregation shuffles at scale."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    part = load(spark, sf_dir, "part", parallel="never")
    supp = load(spark, sf_dir, "supplier", parallel="never")
    nat = load(spark, sf_dir, "nation", parallel="never")
    reg = load(spark, sf_dir, "region", parallel="never")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("cost")
    )
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    eu_ps = ps.join(F.broadcast(eu_supp), ps.l_suppkey == F.col("s_suppkey"))
    w = W.partitionBy("l_partkey")
    return (
        eu_ps.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(
            F.broadcast(part.filter(F.col("p_size") <= 5)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_partkey", "s_name", "n_name", F.col("cost").cast("double").alias("cost")
        )
    )


@register(
    "agg_top_supplier_q15",
    f"""
WITH rev AS (
  SELECT l_suppkey,
    SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def agg_top_supplier_q15(spark, sf_dir):
    """Scalar-max-over-view subquery (TPC-H Q15 shape): the
    supplier(s) with the highest one-quarter revenue. The revenue
    view aggregates once; the scalar MAX is a 1-row broadcast against
    it — the view is never recomputed (vs Q15's textual repetition).
    Revenue is summed in DECIMAL, so partial-aggregation order can't
    perturb the MAX-equality predicate: ties are exact and the entry
    returns every supplier at the maximum."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    supp = load(spark, sf_dir, "supplier", parallel="never")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_extendedprice") * (one() - dec("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )


@register(
    "sub_large_orders_q18",
    f"""
WITH big AS (
  SELECT l_orderkey, SUM({_money('l_quantity')}) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM({_money('l_quantity')}) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(b.sum_qty AS DOUBLE) AS sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def sub_large_orders_q18(spark, sf_dir):
    """HAVING-filtered IN subquery (TPC-H Q18 shape): customers
    behind orders totalling > 250 units. The quantity rollup shuffles
    on l_orderkey once and the HAVING prunes it to a sliver BEFORE
    the orders/customer joins — the aggregate-then-semi-join order a
    hand-planner would pick, expressed declaratively. Quantity sums
    in DECIMAL (exact HAVING threshold); the surviving key set is
    tiny at any scale, so both joins broadcast the aggregated side,
    touching orders and customer with no shuffle at all."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    orders = load(spark, sf_dir, "orders", parallel="never")
    cust = load(spark, sf_dir, "customer", parallel="never")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(250).cast(DEC))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


_CTE_SQL = f"""
WITH nat_rev AS (
  SELECT n.n_name, n.n_regionkey,
    SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, n.n_regionkey
),
reg_rev AS (
  SELECT n_regionkey, SUM(revenue) AS region_total
  FROM nat_rev GROUP BY n_regionkey
)
SELECT r.r_name, nr.n_name,
  CAST(nr.revenue AS DOUBLE) AS revenue,
  CAST(nr.revenue AS DOUBLE) / CAST(rr.region_total AS DOUBLE) AS region_share
FROM nat_rev nr
JOIN reg_rev rr ON nr.n_regionkey = rr.n_regionkey
JOIN region r ON nr.n_regionkey = r.r_regionkey
"""


@register("cte_chain", _CTE_SQL)
def cte_chain(spark, sf_dir):
    """Multi-CTE chain through the engine's SQL front door: nation
    revenue -> region totals -> per-nation share. Registers the base
    tables as temp views and runs the same ANSI text Spark-side, so
    the judged artifact is the SQL surface itself (parser -> Catalyst),
    not a DataFrame translation. Revenue stays DECIMAL through both
    CTE hops; the share division happens once, on identical doubles.
    The nation/region joins broadcast; only the lineitem⋈orders⋈
    customer chain shuffles."""
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        load(spark, sf_dir, t, parallel="never").createOrReplaceTempView(t)
    return spark.sql(_CTE_SQL)


@register(
    "win_sessionize",
    """
WITH d AS (
  SELECT user_id, event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      OR LAG(epoch_us(ts)) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, event_id,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM d
)
SELECT user_id,
  CAST(MAX(session_id) AS BIGINT) AS n_sessions,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id
""",
)
def win_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30-minute inactivity timeout)
    — the batch mirror of F.session_window. lag + running-sum share
    one Window.partitionBy(user_id), so the whole query is a single
    shuffle on user_id; the groupBy re-uses that partitioning (AQE
    sees the child distribution). Timestamps are compared as integer
    microseconds (unix_micros / epoch_us) — no interval arithmetic,
    identical in both engines. event_id is the tiebreaker everywhere
    ordering matters."""
    ev = load_events(spark, sf_dir, parallel="never")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    ws = W.partitionBy("user_id").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(wl)
    return (
        ev.withColumn(
            "new_session",
            F.when(prev.isNull() | (us - prev > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(ws))
        .groupBy("user_id")
        .agg(
            F.max("session_id").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "agg_percentiles",
    """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.25) AS p25,
  quantile_cont(l_quantity, 0.50) AS p50,
  quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group. Spark `percentile`
    and DuckDB `quantile_cont` share the same continuous-interpolation
    definition; quantities are small integers stored as doubles, so
    the (1-f)*a + f*b interpolation is exact in IEEE754 and the
    results match bit-for-bit. (The 100 TB path swaps this for
    approx_percentile — see agg_approx_sketches — this query is the
    exactness anchor.)"""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
    )


@register(
    "join_self",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS n_orders
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey
 AND a.l_linenumber < b.l_linenumber
 AND a.l_suppkey <> b.l_suppkey
""",
)
def join_self(spark, sf_dir):
    """Self-join: pairs of lines in the same order from different
    suppliers (TPC-H Q21's inner shape). Both sides shuffle on
    l_orderkey once; the inequality predicates ride in the join
    condition, evaluated per matching orderkey group — never a
    cartesian. At 100 TB this is the canonical sort-merge self-join;
    per-order line counts are bounded (≤7) so no skew salting needed."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    a = li.select("l_orderkey", "l_linenumber", "l_suppkey").alias("a")
    b = li.select("l_orderkey", "l_linenumber", "l_suppkey").alias("b")
    cond = (
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey"))
    )
    return a.join(b, cond, "inner").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("a.l_orderkey").alias("n_orders"),
    )


_LATERAL_SQL = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) c
"""


@register("join_lateral_topn", _LATERAL_SQL)
def join_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery through the SQL front door: top-2
    customers per nation, the per-row-subquery surface (Spark 'lateral
    join', DuckDB LATERAL — same ANSI text runs in both engines).
    Catalyst decorrelates this into a ranked window over the
    customer⋈nation join rather than N correlated executions — the
    plan a user would hand-write, derived from the declarative form."""
    for t in ("nation", "customer"):
        load(spark, sf_dir, t, parallel="never").createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


@register(
    "evt_funnel",
    """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
c AS (
  SELECT e.user_id, min(us) AS t2 FROM e JOIN v USING (user_id)
  WHERE event_type = 'click' AND us > t1 AND us <= t1 + 3600000000
  GROUP BY 1
),
p AS (
  SELECT e.user_id, min(us) AS t3 FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 3600000000
  GROUP BY 1
)
SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
""",
)
def evt_funnel(spark, sf_dir):
    """Ordered event funnel (view -> click -> purchase, each step
    within 1 h of the previous): per-user first-view, first
    qualifying click after it, first qualifying purchase after that —
    the ClickHouse windowFunnel / product-analytics conversion op,
    expressed as three groupBy-min stages over exact epoch-micro
    integers. Each stage shuffles on user_id only; the step frames
    shrink monotonically, so the joins get cheaper down the funnel."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    hour_us = 3_600_000_000

    def first_after(prev, etype, tcol):
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(
                (F.col("us") > F.col(tcol)) & (F.col("us") <= F.col(tcol) + hour_us)
            )
            .groupBy("user_id")
            .agg(F.min("us").alias(f"_t_{etype}"))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("_t_view"))
    )
    c = first_after(v, "click", "_t_view")
    p = first_after(c, "purchase", "_t_click")

    def cnt(df, name):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("step"), "n_users"
        )

    return (
        cnt(v, "1_view").unionByName(cnt(c, "2_click")).unionByName(cnt(p, "3_purchase"))
    )


@register(
    "sub_small_qty_q17",
    """
WITH pb AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'
),
li AS (
  SELECT l_partkey, l_quantity, CAST(l_extendedprice AS DECIMAL(12,2)) AS price
  FROM lineitem JOIN pb ON l_partkey = p_partkey
),
avgs AS (
  SELECT l_partkey AS ak,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_qty
  FROM li GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM li JOIN avgs ON l_partkey = ak
WHERE l_quantity < 0.2 * avg_qty
""",
)
def sub_small_qty_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems of
    one brand's parts whose quantity is below 20% of that part's
    average — the correlated scalar-average-per-group pattern,
    decorrelated into one grouped aggregate joined back on the part
    key. The brand filter reduces parts to a broadcast; the per-part
    average is one double division of a decimal sum and an integer
    count, and the 0.2 cut is the same IEEE expression in both
    engines. One shuffle on l_partkey; the revenue aggregate is a
    1-row map-side-partial reduce."""
    p = load(spark, sf_dir, "part", parallel="never").where(
        F.col("p_brand") == "Brand#13"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "l_quantity",
            F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        )
    )
    avgs = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        li.join(avgs, F.col("l_partkey") == F.col("ak"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum("price") / F.lit(7.0)).cast("double").alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
        )
    )


@register(
    "sub_division_all_types",
    """
WITH t AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types FROM events),
u AS (
  SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_seen
  FROM events GROUP BY user_id
)
SELECT u.user_id, u.n_seen
FROM u, t
WHERE u.n_seen = t.n_types
""",
)
def sub_division_all_types(spark, sf_dir):
    """Relational division — the textbook 'suppliers who supply ALL
    parts' operator, here 'users who performed every event type':
    divide events(user, type) by the distinct type set. Expressed as
    the count-comparison decorrelation (distinct-count per user =
    global distinct count) instead of double-NOT-EXISTS — one grouped
    distinct-count over the fact plus a broadcast 1-row divisor
    cardinality. Exact integers; output is the quotient relation."""
    ev = load_events(spark, sf_dir)
    t = ev.agg(F.count_distinct("event_type").cast("bigint").alias("n_types"))
    u = ev.groupBy("user_id").agg(
        F.count_distinct("event_type").cast("bigint").alias("n_seen")
    )
    return (
        u.crossJoin(F.broadcast(t))
        .where(F.col("n_seen") == F.col("n_types"))
        .select("user_id", "n_seen")
    )
