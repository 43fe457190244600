"""Relational capability suite over the driver test tables.

The reference has no true joins, group-bys, window ranks, or set ops
(SURVEY.md §2.3-2.7 marks them ∅); these queries fill the gaps with
idiomatic DataFrame plans: broadcast hints for dimensions, decimal
aggregation for cross-engine exactness, unique tiebreakers in every
window ordering.
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


# ------------------------------------------------------------- aggregations


@register(
    "agg_group_q1",
    # decimal -> double goes through the VARCHAR hop (like
    # agg_stats_moments): DuckDB's direct DECIMAL(38,6)->DOUBLE cast
    # is int128->double THEN /1e6 — double-rounded once the scaled
    # units exceed 2^53, which bit-diverged from Spark's correctly-
    # rounded BigDecimal.doubleValue by 1 ulp at the 100x probe
    # corpus (sum_charge, group N/O). The string hop is a correctly-
    # rounded single conversion at any magnitude.
    f"""
SELECT l_returnflag, l_linestatus,
  SUM(l_quantity) AS sum_qty,
  CAST(CAST(SUM({_money('l_extendedprice')}) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')}) * ({_money('1')} + {_money('l_tax')})) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(SUM({_money('l_extendedprice')}) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_group_q1(spark, sf_dir):
    """TPC-H Q1-style multi-aggregate group-by — the flagship agg.
    Money math in DECIMAL so partial/final aggregation is exact and
    order-independent (gap-fill for SURVEY §2.4 ∅ group-by)."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    price, disc, tax = dec("l_extendedprice"), dec("l_discount"), dec("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one() - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one() - disc) * (one() + tax)).cast("double").alias("sum_charge"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_avg_having",
    f"""
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
  CAST(CAST(SUM({_money('c_acctbal')}) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_bal
FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 3
""",
)
def agg_avg_having(spark, sf_dir):
    """Group-by with HAVING filter over the aggregate."""
    cu = load(spark, sf_dir, "customer", parallel="never")
    return (
        cu.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"),
        )
        .filter(F.col("n_cust") >= 3)
    )


@register(
    "agg_count_distinct",
    """
SELECT l_returnflag,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_count_distinct(spark, sf_dir):
    """Exact distinct aggregation (expands + re-aggregates under the
    hood; partial aggregation still applies)."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup",
    """
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem", parallel="never")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_cube",
    """
SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem", parallel="never")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_pivot",
    """
SELECT l_returnflag,
  SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
  SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_pivot(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem", parallel="never")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_f"),
            F.col("O").alias("qty_o"),
        )
    )


# -------------------------------------------------------------------- joins


@register(
    "join_inner_5way",
    f"""
SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_inner_5way(spark, sf_dir):
    """Revenue by region/nation through a 5-way join. Fact-to-fact
    (lineitem-orders) shuffles on the key; every dimension side is
    explicitly broadcast so the plan stays a single shuffle."""
    li = load(spark, sf_dir, "lineitem")
    # broadcast-destined sides skip the scan-parallelism heal: a
    # repartition ahead of a BroadcastExchange is pure overhead.
    # orders sits under the broadcast threshold at every bench SF (the
    # planner broadcasts it); on a real cluster the scan splits
    # natively and the heal is a no-op either way.
    o = load(spark, sf_dir, "orders", parallel="never")
    c = load(spark, sf_dir, "customer", parallel="never")
    n = load(spark, sf_dir, "nation", parallel="never")
    r = load(spark, sf_dir, "region", parallel="never")
    price, discount = dec("l_extendedprice"), dec("l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(price * (one() - discount)).cast("double").alias("revenue"),
        )
    )


@register(
    "join_left",
    f"""
SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
  CAST(CAST(COALESCE(SUM({_money('o_totalprice')}), 0) AS VARCHAR) AS DOUBLE) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left(spark, sf_dir):
    """LEFT join keeping customers without orders (count of NULL key = 0)."""
    c = load(spark, sf_dir, "customer", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_semi",
    """
SELECT o_orderkey, o_custkey FROM orders
WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 5000)
""",
)
def join_semi(spark, sf_dir):
    """LEFT SEMI join = EXISTS (gap-fill, SURVEY §2.3 ∅)."""
    o = load(spark, sf_dir, "orders", parallel="never")
    rich = load(spark, sf_dir, "customer", parallel="never").filter(
        F.col("c_acctbal") > 5000
    )  # broadcast build side: healing it would just add an exchange
    return o.join(
        F.broadcast(rich), o.o_custkey == rich.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey")


@register(
    "join_anti",
    """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark, sf_dir):
    """LEFT ANTI join = NOT EXISTS (gap-fill, SURVEY §2.3 ∅)."""
    c = load(spark, sf_dir, "customer", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_range",
    """
SELECT p_size, CAST(COUNT(*) AS BIGINT) AS n_pairs, SUM(l_quantity) AS sum_qty
FROM lineitem JOIN part ON l_quantity >= p_size - 1 AND l_quantity <= p_size + 1
GROUP BY p_size
""",
)
def join_range(spark, sf_dir):
    """Pure inequality (range) join aggregated by the range key
    (gap-fill, SURVEY §2.3 ∅).

    Scale shape (r12 — probe-caught): the naive broadcast
    nested-loop evaluates |lineitem| x |part| predicates; at the
    100x-lineitem corpus that is 1.2e12 evaluations and the probe
    run sat on one stage for 15+ minutes. Because the judged output
    is an AGGREGATE over the pairs, both sides collapse to their
    value DOMAINS first — map-side-combinable groupBys to
    (l_quantity, cnt, sum) and (p_size, cnt), both domain-bounded
    (~50 rows each regardless of corpus size) — and the nested-loop
    range join runs on the two tiny summaries. Pair counts and sums
    reconstruct exactly: for a p_size group s,
    n_pairs = cnt_p(s) * sum of cnt_li(q) over q in [s-1, s+1] and
    sum_qty = cnt_p(s) * sum of (per-quantity sums). All arithmetic
    is exact (integral doubles far below 2^53 times exact longs), so
    the result is bit-identical to the pairwise plan — same oracle,
    gate-exact. The fact tables never pairwise materialize: total
    cost is two scans + a domain-sized join."""
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_quantity")
        .agg(
            F.count(F.lit(1)).alias("_ln"),
            F.sum("l_quantity").alias("_lsum"),
        )
    )
    p = (
        load(spark, sf_dir, "part", parallel="never")
        .groupBy("p_size")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    cond = (li.l_quantity >= p.p_size - 1) & (li.l_quantity <= p.p_size + 1)
    return (
        li.join(F.broadcast(p), cond)
        .groupBy("p_size")
        .agg(
            F.sum(F.col("_pn") * F.col("_ln")).cast("bigint").alias("n_pairs"),
            F.sum(F.col("_pn") * F.col("_lsum")).alias("sum_qty"),
        )
    )


@register(
    "join_asof",
    """
SELECT a.event_id, max(epoch_us(b.ts)) AS asof_signup_us
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id AND b.event_type = 'signup'
 AND (epoch_us(b.ts) < epoch_us(a.ts)
      OR (epoch_us(b.ts) = epoch_us(a.ts) AND b.event_id < a.event_id))
WHERE a.event_type = 'purchase'
GROUP BY a.event_id
""",
)
def join_asof(spark, sf_dir):
    """As-of join: for each purchase, the latest prior signup of the
    same user. Implemented scalably as one window pass over the
    time-ordered union (no range-join blowup); the oracle states the
    same semantics as a relational max (gap-fill, SURVEY §2.3 ∅)."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    signup_ts = F.when(F.col("event_type") == "signup", F.col("ts_us"))
    return (
        ev.withColumn("asof_signup_us", F.last(signup_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "asof_signup_us")
    )


@register(
    "join_date_enrich",
    """
SELECT e.event_id, strftime(dd.d, '%Y-%m-%d') AS day_str
FROM events e
JOIN (SELECT DISTINCT date_trunc('day', ts) AS d FROM events) dd
  ON date_trunc('day', e.ts) = dd.d
""",
)
def join_date_enrich(spark, sf_dir):
    """Distinct-build + probe: the reference's compute-once-per-
    distinct-date loop (wsprnet-scraper.sh:315-323) as an explicit
    broadcast join against the distinct-dates build side."""
    ev = load_events(spark, sf_dir).withColumn("d", F.date_trunc("day", F.col("ts")))
    days = ev.select("d").distinct()
    return (
        ev.join(F.broadcast(days), "d")
        .select("event_id", F.date_format("d", "yyyy-MM-dd").alias("day_str"))
    )


@register(
    "join_skew_salted",
    """
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items, SUM(l_quantity) AS sum_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
)
def join_skew_salted(spark, sf_dir):
    """Hot-key-safe join: the salted plan (operators/skew.py — small
    side replicated `salt` ways, big side scattered by row hash) must
    return exactly the plain join's rows; the oracle IS the plain
    join. At 100 TB this is how a power-law key (domain, language,
    empty-doc fingerprint) spreads over `salt` reducers instead of
    one straggler. The fill for SURVEY §2.3 ∅ skew handling."""
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem", parallel="never").select(
        "l_suppkey", "l_quantity"
    )
    su = load(spark, sf_dir, "supplier", parallel="never").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, su, on="l_suppkey", salt=8)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


# ------------------------------------------------------------------ windows


@register(
    "win_rank_suite",
    """
WITH ranked AS (
  SELECT o_orderkey, o_orderpriority,
    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn,
    rank()       OVER (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice / 10000) DESC) AS rnk,
    dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice / 10000) DESC) AS drnk
  FROM orders
)
SELECT o_orderkey, o_orderpriority, CAST(rn AS BIGINT) AS rn,
       CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk
FROM ranked WHERE rn <= 50
""",
)
def win_rank_suite(spark, sf_dir):
    """Ranking window suite (gap-fill, SURVEY §2.5 ∅). row_number's
    ordering carries a unique tiebreaker; rank/dense_rank rank a
    coarsened key so ties genuinely occur."""
    o = load(spark, sf_dir, "orders", parallel="never")
    unique_order = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    coarse = W.partitionBy("o_orderpriority").orderBy(
        F.desc(F.floor(F.col("o_totalprice") / 10000))
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(unique_order).cast("long").alias("rn"),
            F.rank().over(coarse).cast("long").alias("rnk"),
            F.dense_rank().over(coarse).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 50)
    )


@register(
    "win_running_sum",
    f"""
SELECT o_orderkey,
  CAST(CAST(SUM({_money('o_totalprice')}) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS run_total
FROM orders
""",
)
def win_running_sum(spark, sf_dir):
    """Running total per customer; DECIMAL accumulation keeps the
    prefix sums exact in both engines."""
    o = load(spark, sf_dir, "orders", parallel="never")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("run_total"),
    )


@register(
    "win_lead_lag",
    """
SELECT event_id,
  lag(value)  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_value,
  lead(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_value,
  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
FROM events
""",
)
def win_lead_lag(spark, sf_dir):
    """lead/lag analytics per user (the reference's inter-spot gap
    check generalized, wsprnet-scraper.sh:284-309)."""
    ev = load_events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )


@register(
    "win_range_frame",
    """
SELECT o_orderkey, o_totalprice,
  CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
       RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar
FROM orders
""",
)
def win_range_frame(spark, sf_dir):
    """RANGE frame (value-based bounds) — counts orders within $1000
    below, peers included (gap-fill, SURVEY §2.5 ∅)."""
    o = load(spark, sf_dir, "orders", parallel="never")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).cast("long").alias("n_similar"),
    )


@register(
    "win_ntile_dist",
    """
SELECT o_orderkey,
  CAST(ntile(7) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket,
  percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr,
  cume_dist() OVER (ORDER BY o_totalprice, o_orderkey) AS cd
FROM orders
""",
)
def win_ntile_dist(spark, sf_dir):
    """ntile / percent_rank / cume_dist over a global ordering —
    computed from an exact distributed global rank (range-partitioned
    local row_number + tiny offset summary, operators/ranking.py)
    instead of the single-task unpartitioned window; the ordering
    includes the unique o_orderkey, so rank == row_number and the
    integer-ratio doubles are identical across engines."""
    from ..operators import ranking

    o = load(spark, sf_dir, "orders", parallel="never")
    ranked = ranking.with_global_rank(
        o.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
    )
    rn, n = F.col("grn"), F.col("grn_total")
    return ranked.select(
        "o_orderkey",
        ranking.ntile_of(rn, n, 7).alias("bucket"),
        ranking.percent_rank_of(rn, n).alias("pr"),
        ranking.cume_dist_of(rn, n).alias("cd"),
    )


# ------------------------------------------------------- sorts / limits / topk


@register(
    "topk_per_group",
    """
WITH ranked AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 3
""",
)
def topk_per_group(spark, sf_dir):
    """Top-k per group via row_number (gap-fill, SURVEY §2.6 ∅)."""
    c = load(spark, sf_dir, "customer", parallel="never")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "sort_limit_offset",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10",
)
def sort_limit_offset(spark, sf_dir):
    """Deterministic LIMIT/OFFSET over a total order (gap-fill)."""
    o = load(spark, sf_dir, "orders", parallel="never")
    return o.orderBy("o_orderkey").offset(10).limit(20).select(
        "o_orderkey", "o_totalprice"
    )


@register("sort_u", "SELECT DISTINCT o_orderpriority FROM orders")
def sort_u(spark, sf_dir):
    """sort -u ≡ DISTINCT (ref: wsprnet-scraper.sh:315)."""
    return load(spark, sf_dir, "orders", parallel="never").select("o_orderpriority").distinct()


# ----------------------------------------------------------------- set ops


@register(
    "set_union_all",
    """
SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000
""",
)
def set_union_all(spark, sf_dir):
    """UNION ALL — the reference's append-only accumulation shape
    (SURVEY §2.7); duplicates preserved."""
    o = load(spark, sf_dir, "orders", parallel="never")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey", "o_totalprice")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey", "o_totalprice")
    return a.unionAll(b)


@register(
    "set_union",
    """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
""",
)
def set_union(spark, sf_dir):
    o = load(spark, sf_dir, "orders", parallel="never")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
""",
)
def set_intersect(spark, sf_dir):
    o = load(spark, sf_dir, "orders", parallel="never")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
""",
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct) semantics = subtract: a key present in b at
    all is dropped. NOT exceptAll().distinct(), which keeps keys whose
    multiplicity in a exceeds that in b."""
    o = load(spark, sf_dir, "orders", parallel="never")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.subtract(b)


# -------------------------------------------------- projections / predicates


@register(
    "proj_drop_unknown",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
)
def proj_drop_unknown(spark, sf_dir):
    """Whitelist projection — unknown columns dropped, pruned at the
    scan (ref: wsprnet_azi_calc.py:194)."""
    return load(spark, sf_dir, "lineitem", parallel="never").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "proj_reorder",
    "SELECT o_orderpriority, o_totalprice, o_custkey, o_orderkey FROM orders",
)
def proj_reorder(spark, sf_dir):
    """Reorder-to-sink-schema projection (ref: wsprnet_azi_calc.py:227)."""
    return load(spark, sf_dir, "orders", parallel="never").select(
        "o_orderpriority", "o_totalprice", "o_custkey", "o_orderkey"
    )


@register(
    "proj_prepend_time",
    "SELECT event_id, strftime(ts, '%Y-%m-%d:%H:%M') AS wd_time FROM events",
)
def proj_prepend_time(spark, sf_dir):
    """Computed-column projection: the scraper's wd_time prepend
    (ref: wsprnet-scraper.sh:313-323)."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd:HH:mm").alias("wd_time")
    )


@register(
    "flt_malformed",
    "SELECT doc_id, n_chars FROM documents WHERE length(text) = n_chars AND n_chars > 300",
)
def flt_malformed(spark, sf_dir):
    """Arity/consistency predicate (ref: wsprnet_azi_calc.py:145)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(
        (F.length("text") == F.col("n_chars")) & (F.col("n_chars") > 300)
    ).select("doc_id", "n_chars")


@register(
    "flt_auth_page",
    "SELECT doc_id FROM documents WHERE contains(text, 'join')",
)
def flt_auth_page(spark, sf_dir):
    """contains() predicate (ref auth-failure guard:
    wsprnet-scraper.sh:240-243)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("text").contains("join")).select("doc_id")


@register(
    "flt_has_spots",
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_matching FROM documents WHERE contains(text, 'stream')",
)
def flt_has_spots(spark, sf_dir):
    """Emptiness guard as a count (ref: wsprnet-scraper.sh:245-247)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("text").contains("stream")).agg(
        F.count(F.lit(1)).alias("n_matching")
    )


@register(
    "flt_exclude_special",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag <> 'A'",
)
def flt_exclude_special(spark, sf_dir):
    """Source-side predicate (pushed to the parquet scan — the
    reference pushes exclude_special to the API,
    wsprnet-scraper.sh:232)."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    return li.filter(F.col("l_returnflag") != "A").select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "xform_unescape",
    "SELECT doc_id, md5(replace(text, 'e', '')) AS cleaned_md5 FROM documents",
)
def xform_unescape(spark, sf_dir):
    """Literal strip transform (ref unescape: wsprnet-scraper.sh:266);
    md5 fingerprints keep the payload compact."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.md5(F.replace(F.col("text"), F.lit("e"), F.lit(""))).alias("cleaned_md5")
    )


@register(
    "xform_session_extract",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val FROM events",
)
def xform_session_extract(spark, sf_dir):
    """JSON field extraction (ref sessid sed-extraction:
    wsprnet-scraper.sh:174-175) done properly with a JSON path."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@register(
    "join_bloom_pruned",
    """
SELECT o.o_orderstatus,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders o JOIN customer c
  ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
GROUP BY 1
""",
)
def join_bloom_pruned(spark, sf_dir):
    """Fact⋈dim join with an EXPLICIT Bloom runtime filter on the
    fact side (operators/sketch.bloom_might_contain): the dim's key
    set is sketched into a 4096-bit bitmap, inlined as literals, and
    applied as a zero-shuffle projection inside the fact scan's
    codegen stage — rows that cannot match die before any exchange.
    The oracle is the PLAIN join: Bloom false positives pass the
    prefilter and are removed by the real join, so the result is
    exactly the unfiltered join's at any false-positive rate — only
    the shuffled/broadcast-probed row count changes. This is Spark's
    runtime.bloomFilter rewrite made first-class, which matters at
    100 TB when the filter must survive across stages the optimizer
    won't inject it into (e.g. ahead of a repartition or a UDF)."""
    from ..operators.sketch import bloom_might_contain

    o = load(spark, sf_dir, "orders", parallel="never")
    c = load(spark, sf_dir, "customer", parallel="never")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    # hash_fn="xxhash": the filter's internals never reach the oracle
    # (plain-join semantics), so the native 64-bit hash replaces the
    # md5 hex path — measured ~4x cheaper per probed row
    pre = o.filter(
        bloom_might_contain(
            dim, "c_custkey", F.col("o_custkey"), hash_fn="xxhash"
        )
    )
    return (
        pre.join(F.broadcast(dim), pre.o_custkey == dim.c_custkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "join_nation_volume",
    f"""
SELECT supp_nation, cust_nation, l_year,
  CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
    {_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')}) AS vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name < n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def join_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between ordered nation pairs
    by ship-year. The nation dimension joins twice (supplier side and
    customer side) — both broadcast, so the only shuffles are the
    fact-side equi-joins; the pair filter n1 < n2 prunes before the
    aggregate and money math stays in DECIMAL until one final cast."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never")
    c = load(spark, sf_dir, "customer", parallel="never")
    s = load(spark, sf_dir, "supplier", parallel="never")
    n = load(spark, sf_dir, "nation", parallel="never")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    vol = dec("l_extendedprice") * (one() - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            vol.alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("vol").cast("double").alias("revenue"))
    )


@register(
    "agg_market_share",
    f"""
SELECT o_year,
  CAST(CAST(COALESCE(SUM(vol) FILTER (WHERE supp_nation = 'NATION_3'), 0) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS mkt_share,
  CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS total_vol
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
    n1.n_name AS supp_nation,
    {_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')}) AS vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
GROUP BY o_year
""",
)
def agg_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of revenue to
    ASIA-region customers per order-year. Numerator and denominator
    are exact DECIMAL sums in the SAME aggregation pass (a
    conditional sum, the FILTER-clause idiom), divided once as
    doubles — no second scan, no join-back. The region filter
    reaches the customer side through broadcast dimensions before
    the fact shuffles."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never")
    c = load(spark, sf_dir, "customer", parallel="never")
    s = load(spark, sf_dir, "supplier", parallel="never")
    n = load(spark, sf_dir, "nation", parallel="never")
    r = load(spark, sf_dir, "region", parallel="never")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    asia = n2.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n2.c_rk == F.col("r_regionkey"),
    ).select("c_nk")
    vol = dec("l_extendedprice") * (one() - dec("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            "supp_nation",
            vol.alias("vol"),
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")))
    den = F.sum("vol")
    return base.groupBy("o_year").agg(
        (
            F.coalesce(num, F.lit(0)).cast("double") / den.cast("double")
        ).alias("mkt_share"),
        den.cast("double").alias("total_vol"),
    )


@register(
    "join_disjunctive_pred",
    f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE
  (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
  OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
  OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50)
""",
)
def join_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19 shape: an OR-of-ANDs predicate spanning both join
    sides. The single-side conjuncts are weakened into per-relation
    OR filters that Catalyst pushes below the join on BOTH inputs
    (brand/type/size prune part at the scan; quantity prunes
    lineitem), so the join sees pre-filtered inputs and the full
    disjunction re-checks only the survivors — the predicate
    pushdown pattern that matters when the OR arms each drop 90% of
    a 100 TB fact."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    p = load(spark, sf_dir, "part", parallel="never")
    price, disc = dec("l_extendedprice"), dec("l_discount")
    b = F.col("p_brand")
    ty = F.col("p_type")
    sz = F.col("p_size")
    q = F.col("l_quantity")
    arm1 = (b == "Brand#15") & sz.between(1, 15) & q.between(1, 20)
    arm2 = (b == "Brand#23") & sz.between(10, 30) & q.between(10, 35)
    arm3 = (ty == "PROMO") & sz.between(20, 50) & q.between(25, 50)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(price * (one() - disc)).cast("double").alias("revenue"),
        )
    )


@register(
    "join_null_safe",
    """
WITH a AS (
  SELECT nullif(event_type, 'error') AS k, CAST(count(*) AS BIGINT) AS n_a
  FROM events WHERE event_id % 2 = 0 GROUP BY nullif(event_type, 'error')
),
b AS (
  SELECT nullif(event_type, 'error') AS k, CAST(count(*) AS BIGINT) AS n_b
  FROM events WHERE event_id % 2 = 1 GROUP BY nullif(event_type, 'error')
)
SELECT a.k, a.n_a, b.n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL
    key buckets MATCH instead of silently dropping — the semantics
    CDC merge keys and sentinel-coded dimensions need. Both sides
    pre-aggregate to key level first, so the null-safe hash join
    runs on reduced inputs — and unlike `=`, Spark can still plan
    <=> as an equi-join (it hashes the null bucket like any key)
    rather than falling back to nested-loop."""
    from ..sources import load_events

    e = load_events(spark, sf_dir)
    k = F.nullif(F.col("event_type"), F.lit("error"))
    a = (
        e.filter(F.col("event_id") % 2 == 0)
        .groupBy(k.alias("k"))
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        e.filter(F.col("event_id") % 2 == 1)
        .groupBy(k.alias("k"))
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(a.k.alias("k"), "n_a", "n_b")


@register(
    "join_interval_overlap",
    """
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) AS s FROM events
  WHERE event_type = 'click'
),
e AS (
  SELECT event_id, user_id, epoch_us(ts) AS s FROM events
  WHERE event_type = 'error'
)
SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
  CAST(greatest(c.s, e.s) AS BIGINT) AS ov_start_us,
  CAST(least(c.s + 300000000, e.s + 300000000) AS BIGINT) AS ov_end_us
FROM c JOIN e ON c.user_id = e.user_id
  AND c.s <= e.s + 300000000 AND e.s <= c.s + 300000000
""",
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join (5-minute activity windows around each
    click vs each error, per user) via bucket decomposition
    (operators/intervals.py): explode intervals onto fixed-width
    buckets, hash-join on (user, bucket), post-filter true overlap,
    and emit each pair only in its overlap-start bucket — an
    EQUI-join plan where the naive form is a broadcast nested loop.
    The oracle states the plain theta join; the decomposition must
    reproduce it pair-for-pair."""
    from ..operators.intervals import interval_overlap_join

    win = 300_000_000  # 5 minutes in micros
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("s")
    )

    def side(etype):
        return ev.filter(F.col("event_type") == etype).select(
            "event_id",
            "user_id",
            F.col("s").alias("start"),
            (F.col("s") + win).alias("end"),
        )

    out = interval_overlap_join(
        side("click"),
        side("error"),
        on=["user_id"],
        bucket_width=win,
    )
    return out.select(
        "user_id",
        F.col("a_event_id").alias("click_id"),
        F.col("b_event_id").alias("error_id"),
        F.col("ov_start").cast("long").alias("ov_start_us"),
        F.col("ov_end").cast("long").alias("ov_end_us"),
    )


@register(
    "agg_null_semantics",
    """
WITH t AS (
  SELECT l_returnflag AS g,
    NULLIF(l_quantity, 1.0) AS q,
    NULLIF(l_linestatus, l_linestatus) AS always_null
  FROM lineitem
)
SELECT g,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(q) AS BIGINT) AS n_nonnull,
  CAST(count(always_null) AS BIGINT) AS n_all_null,
  CAST(SUM(CAST(always_null AS DOUBLE)) AS DOUBLE) AS sum_all_null,
  CAST(count(DISTINCT q) AS BIGINT) AS n_distinct_nonnull,
  CAST(min(q) AS DOUBLE) AS min_q,
  CAST(SUM(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
FROM t GROUP BY g
""",
)
def agg_null_semantics(spark, sf_dir):
    """SQL NULL-handling parity sweep, pinned against the oracle:
    count(*) counts NULL rows, count(col) / count(DISTINCT col) /
    min() skip them, SUM over an all-NULL column is NULL (not 0) —
    the semantics the reference's permissive pipeline (and ANSI-off
    Spark) relies on. NULLs are injected deterministically with
    NULLIF so both engines see identical null patterns."""
    li = load(spark, sf_dir, "lineitem", parallel="never")
    t = li.select(
        F.col("l_returnflag").alias("g"),
        F.nullif(F.col("l_quantity"), F.lit(1.0)).alias("q"),
        F.nullif(F.col("l_linestatus"), F.col("l_linestatus")).alias("always_null"),
    )
    return t.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("q").alias("n_nonnull"),
        F.count("always_null").alias("n_all_null"),
        F.sum(F.col("always_null").cast("double")).alias("sum_all_null"),
        F.count_distinct("q").alias("n_distinct_nonnull"),
        F.min("q").cast("double").alias("min_q"),
        F.sum(F.when(F.col("q").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
    )


@register(
    "agg_custdist_q13",
    """
WITH co AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority NOT LIKE '%URGENT%'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
""",
)
def agg_custdist_q13(spark, sf_dir):
    """TPC-H Q13 shape — the customer order-count distribution. The
    LEFT join with the non-key predicate INSIDE the join condition
    (not a post-filter: that would drop zero-order customers) feeds
    two stacked aggregations, the second over customer-count-sized
    input. count(o_orderkey) — not count(*) — so unmatched customers
    land in the c_count=0 bucket, which is the point of the query.
    Scale: both groupBys are map-side combinable; the join shuffles
    on custkey once and AQE handles the mild popular-customer skew."""
    c = load(spark, sf_dir, "customer", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never")
    co = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (~o.o_orderpriority.like("%URGENT%")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "join_waiting_supp_q21",
    """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN late l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE EXISTS (
  SELECT 1 FROM lineitem l2
  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
  SELECT 1 FROM late l3
  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
)
GROUP BY s.s_name
""",
)
def join_waiting_supp_q21(spark, sf_dir):
    """TPC-H Q21 shape — suppliers who were the SOLE flagged shipper
    on a multi-supplier finished order (the synthetic lineitem has no
    receipt/commit dates, so "late" is the returned flag; the judged
    shape is identical): a semi-join (some other supplier on the
    order) and an anti-join (no OTHER supplier was flagged)
    against the same fact, both correlated on orderkey with a <>
    guard. Expressed as LEFT SEMI / LEFT ANTI joins — Catalyst's
    native operators for EXISTS/NOT EXISTS — so both sides shuffle
    once on l_orderkey and no subquery is re-evaluated per row; the
    supplier dim rides in broadcast. The <> correlation is the part
    plain joins can't fake: it needs the pair condition inside the
    semi/anti join criterion."""
    s = load(spark, sf_dir, "supplier", parallel="never")
    li = load(spark, sf_dir, "lineitem", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never")
    late = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    cand = (
        l1.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l1.l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        cand.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "agg_cntry_balance_q22",
    """
WITH coded AS (
  SELECT c_custkey,
         substr(c_name, 17, 2) AS cntrycode,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
  WHERE substr(c_name, 17, 2) IN ('13', '31', '23', '29', '30', '18', '17')
),
pos AS (
  SELECT SUM(cents) // COUNT(*) AS avg_cents
  FROM coded WHERE cents > 0
)
SELECT cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(cents) AS BIGINT) AS totacctbal_cents
FROM coded, pos
WHERE cents > avg_cents
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY cntrycode
""",
)
def agg_cntry_balance_q22(spark, sf_dir):
    """TPC-H Q22 shape — promising idle customers: country code
    from a name-digit prefix (the synthetic customer has no phone
    column), balance above the positive-balance average (an
    uncorrelated scalar subquery), and no urgent order on file (the
    synthetic generator gives every customer SOME order, so the
    classic never-ordered predicate is vacuous — the anti-join is
    against the urgent slice instead, same shape, non-empty answer).
    The scalar average is computed once and crossed in — at scale a
    1-row broadcast, never a per-row subquery. All money math is
    integer cents (floor(bal*100) is the same double op in both
    engines; sums and the floor-division average are exact BIGINT),
    so the boundary customers the threshold admits are bit-pinned —
    a double or decimal-avg threshold flips them in the last ulp.
    The never-ordered test is a LEFT ANTI join shuffling on custkey
    once; the aggregate output stays integral."""
    c = load(spark, sf_dir, "customer", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never")
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    coded = c.filter(F.substring("c_name", 17, 2).isin(codes)).select(
        "c_custkey",
        F.substring("c_name", 17, 2).alias("cntrycode"),
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    pos = coded.filter(F.col("cents") > 0).agg(
        F.expr("sum(cents) div count(1)").alias("avg_cents")
    )
    return (
        coded.crossJoin(F.broadcast(pos))
        .filter(F.col("cents") > F.col("avg_cents"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("cents").cast("bigint").alias("totacctbal_cents"),
        )
    )


@register(
    "win_pct_of_total",
    """
WITH t AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT event_id, event_type, cents,
         SUM(cents) OVER (PARTITION BY event_type) AS type_total
  FROM t
)
SELECT event_id,
       CAST(cents AS BIGINT) AS cents,
       CAST(type_total AS BIGINT) AS type_total,
       CAST(cents AS DOUBLE) / nullif(type_total, 0) AS pct_of_type
FROM g
""",
)
def win_pct_of_total(spark, sf_dir):
    """Ratio-to-report: each event's share of its type's total — the
    reporting idiom behind every '% of segment' column. The window is
    an unordered PARTITION-only frame (one shuffle on event_type, no
    ordering, no single-task risk) and the money math is integer
    cents, so the group totals are exact and the single double
    division is bit-identical in both engines. The divisor is
    nullif-guarded in BOTH engines: a type whose integer-cents total
    is exactly 0 would otherwise yield NULL here (non-ANSI Spark)
    but inf/nan in DuckDB's IEEE division (ADVICE r3)."""
    ev = load_events(spark, sf_dir)
    t = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = W.partitionBy("event_type")
    total = F.sum("cents").over(w)
    return t.select(
        "event_id",
        "cents",
        total.cast("bigint").alias("type_total"),
        (
            F.col("cents").cast("double")
            / F.nullif(total, F.lit(0).cast("bigint"))
        ).alias("pct_of_type"),
    )


@register(
    "sort_nulls_last",
    """
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL
              ELSE o_totalprice END AS sort_key
  FROM orders
)
SELECT o_orderkey, sort_key
FROM t
ORDER BY sort_key ASC NULLS LAST, o_orderkey
LIMIT 50
""",
)
def sort_nulls_last(spark, sf_dir):
    """NULL-ordering parity, pinned: Spark sorts NULLs FIRST on ASC
    by default while DuckDB sorts them LAST — an ORDER BY that leaves
    null placement implicit silently disagrees across engines, so the
    engine's sort surface always states it (asc_nulls_last here). A
    third of the keys are nulled to make the placement land inside
    the LIMIT window if it were wrong; unique tiebreaker keeps the
    cut deterministic. TakeOrderedAndProject does the global top-50
    without a full sort."""
    o = load(spark, sf_dir, "orders", parallel="never")
    t = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority") == "3-MEDIUM", F.lit(None)
        ).otherwise(F.col("o_totalprice")).alias("sort_key"),
    )
    return t.orderBy(
        F.col("sort_key").asc_nulls_last(), "o_orderkey"
    ).limit(50)


@register(
    "join_asof_tolerance",
    """
WITH base AS (
  SELECT a.event_id,
         max(CASE WHEN epoch_us(b.ts) >= epoch_us(a.ts) - 86400000000
                  THEN epoch_us(b.ts) END) AS asof_us,
         CAST(count(CASE WHEN epoch_us(b.ts) >= epoch_us(a.ts) - 86400000000
                         THEN 1 END) > 0 AS BOOLEAN) AS matched
  FROM events a
  LEFT JOIN events b
    ON b.user_id = a.user_id AND b.event_type = 'click'
   AND (epoch_us(b.ts) < epoch_us(a.ts)
        OR (epoch_us(b.ts) = epoch_us(a.ts) AND b.event_id < a.event_id))
  WHERE a.event_type = 'purchase'
  GROUP BY a.event_id
)
SELECT event_id, asof_us, matched FROM base
""",
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join WITH a staleness tolerance (pandas merge_asof's
    `tolerance`): each purchase takes the latest prior click of the
    same user only if it happened within the last 24 h — an older
    click is noise, not context. Same single window pass as
    join_asof (conditional IGNORE-NULLS last over the per-user
    time-ordered stream — no range-join blowup, one user_id
    shuffle); the tolerance is a post-window NULL-out, so the scale
    shape is unchanged. `matched` makes the tolerance cut judged
    explicitly, not just via NULLs."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_us"))
    last_click = F.last(click_ts, ignorenulls=True).over(w)
    tol = 86_400_000_000
    return (
        ev.withColumn("_lc", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.when(
                F.col("_lc") >= F.col("ts_us") - tol, F.col("_lc")
            ).alias("asof_us"),
            (
                F.col("_lc").isNotNull()
                & (F.col("_lc") >= F.col("ts_us") - tol)
            ).alias("matched"),
        )
    )


@register(
    "join_asof_nearest",
    """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT user_id, epoch_us(ts) AS us, event_id
  FROM events WHERE event_type = 'signup'
),
j AS (
  SELECT p.event_id, s.us AS s_us,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(s.us - p.us), s.us, s.event_id
         ) AS rn
  FROM p LEFT JOIN s ON s.user_id = p.user_id
)
SELECT event_id, s_us AS nearest_signup_us
FROM j WHERE rn = 1
""",
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-in-time as-of join (sensor-fusion flavor): each
    purchase matched to the signup of the same user closest in time,
    EITHER direction, ties to the earlier one. join_asof is the
    backward-only variant; nearest needs both sides of the timeline.

    The oracle states the semantics as an arg-min over the per-user
    purchase x signup fan-out; the engine is one window pass over the
    time-ordered per-user stream — last-prior and first-following
    signup timestamps from two frames of the SAME (user | us,
    event_id) sort (one exchange, one sort), then an integer distance
    compare. Equal-timestamp edges are safe because the output is the
    matched microsecond value, identical whichever frame captures it;
    the abs-tie goes to the earlier signup in both engines."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    base = W.partitionBy("user_id").orderBy("us", "event_id")
    sig = F.when(F.col("event_type") == "signup", F.col("us"))
    prev = F.last(sig, ignorenulls=True).over(
        base.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    nxt = F.first(sig, ignorenulls=True).over(
        base.rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    nearest = (
        F.when(nxt.isNull(), prev)
        .when(prev.isNull(), nxt)
        .when((F.col("us") - prev) <= (nxt - F.col("us")), prev)
        .otherwise(nxt)
    )
    return (
        ev.withColumn("nearest_signup_us", nearest)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "nearest_signup_us")
    )


@register(
    "join_ship_priority_q3",
    f"""
SELECT l_orderkey AS orderkey,
  CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS VARCHAR) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, orderdate, orderkey
LIMIT 10
""",
)
def join_ship_priority_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): top-10 unshipped-revenue
    orders for one market segment — selective dimension filter,
    fact-to-fact join, decimal revenue rollup, global top-k. The
    segment-filtered customer side broadcasts; lineitem-orders is the
    one shuffle; the ORDER BY + LIMIT compiles to
    TakeOrderedAndProject (no global sort materializes); dates leave
    the plan as formatted strings per the registry's cross-engine
    discipline. Both date predicates push into the parquet scans."""
    c = load(spark, sf_dir, "customer", parallel="never").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders", parallel="never").where(
        F.col("o_orderdate") < "1997-06-01"
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1997-06-01")
    price, discount = dec("l_extendedprice"), dec("l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price * (one() - discount)).cast("double").alias("revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "orderdate", "orderkey")
        .limit(10)
    )


@register(
    "agg_forecast_q6",
    f"""
SELECT CAST(CAST(SUM({_money('l_extendedprice')} * {_money('l_discount')}) AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
)
def agg_forecast_q6(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change) — THE
    predicate-pushdown benchmark: three range predicates, two read
    columns beyond them, one global aggregate row. All three
    predicates reach the parquet scan as PushedFilters and the
    ReadSchema carries only the four touched columns (plan-asserted);
    the decimal product keeps the revenue sum exact and
    order-independent. The aggregate is map-side partial + one 1-row
    exchange."""
    li = load(spark, sf_dir, "lineitem")
    price, discount = dec("l_extendedprice"), dec("l_discount")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * discount).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


@register(
    "join_returned_q10",
    f"""
SELECT c_custkey, c_name, n_name,
  CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def join_returned_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue in one quarter. The quarter filter cuts orders
    before the fact join; the returnflag filter cuts lineitem at the
    scan; customer and nation broadcast; ORDER BY + LIMIT compiles to
    TakeOrderedAndProject. One fact shuffle."""
    c = load(spark, sf_dir, "customer", parallel="never")
    n = load(spark, sf_dir, "nation", parallel="never")
    o = load(spark, sf_dir, "orders", parallel="never").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    price, discount = dec("l_extendedprice"), dec("l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * (one() - discount)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "join_local_supplier_q5",
    f"""
SELECT n_name,
  CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def join_local_supplier_q5(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): revenue per nation
    where the CUSTOMER and the SUPPLIER share the nation — the 6-way
    star join whose distinguishing feature is the non-key equality
    (c_nationkey = s_nationkey) carried as a join condition rather
    than a filter. lineitem-orders is the one fact shuffle; customer,
    supplier, nation, region all broadcast; the year predicate cuts
    orders at its scan."""
    c = load(spark, sf_dir, "customer", parallel="never")
    s = load(spark, sf_dir, "supplier", parallel="never")
    n = load(spark, sf_dir, "nation", parallel="never")
    r = load(spark, sf_dir, "region", parallel="never").where(
        F.col("r_name") == "ASIA"
    )
    o = load(spark, sf_dir, "orders", parallel="never").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    price, discount = dec("l_extendedprice"), dec("l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(price * (one() - discount)).cast("double").alias("revenue"))
    )


@register(
    "agg_promo_share_q14",
    f"""
SELECT
  100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
    THEN {_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})
    ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM({_money('l_extendedprice')} * ({_money('1')} - {_money('l_discount')})) AS VARCHAR) AS DOUBLE)
    AS promo_revenue_pct,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
""",
)
def agg_promo_share_q14(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue from promo-type parts — the conditional-aggregate-ratio
    pattern. Both sums stay DECIMAL-exact (the ELSE arm is a decimal
    zero so the conditional sum never mixes types), cast once, one
    division. The month predicate pushes to the lineitem scan; part
    broadcasts; 1-row output from a map-side-partial reduce."""
    p = load(spark, sf_dir, "part", parallel="never")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    price, discount = dec("l_extendedprice"), dec("l_discount")
    rev = price * (one() - discount)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


@register(
    "join_order_gap_median",
    """
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS us, o_orderkey,
         lag(epoch_us(o_orderdate)) OVER (
           PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey
         ) AS pus
  FROM orders
),
g AS (
  SELECT o_custkey,
         CAST(floor((us - pus) / 86400000000.0) AS BIGINT) AS gap_days
  FROM o WHERE pus IS NOT NULL
)
SELECT o_custkey AS custkey,
       CAST(count(*) AS BIGINT) AS n_gaps,
       median(gap_days) AS median_gap_days
FROM g GROUP BY o_custkey
HAVING count(*) >= 3
""",
)
def join_order_gap_median(spark, sf_dir):
    """Repeat-purchase cycle per customer: the median days between
    consecutive orders (3+ repeat intervals required) — the metric
    replenishment and win-back campaigns key on. One customer-
    partitioned lag window, integer day gaps, exact grouped median:
    Spark's percentile at p=0.5 interpolates the same two middle
    values as DuckDB's median on the identical integer multiset, so
    the doubles are bit-equal (the win_rolling_median argument).
    Scale: window and median both run per customer key; nothing
    global."""
    o = load(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy(
        F.unix_micros("o_orderdate"), "o_orderkey"
    )
    g = (
        o.select(
            "o_custkey",
            F.unix_micros("o_orderdate").alias("us"),
            F.lag(F.unix_micros("o_orderdate")).over(wo).alias("pus"),
        )
        .where(F.col("pus").isNotNull())
        .select(
            "o_custkey",
            F.floor((F.col("us") - F.col("pus")) / F.lit(86400000000.0))
            .cast("bigint")
            .alias("gap_days"),
        )
    )
    return (
        g.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.percentile(F.col("gap_days"), F.lit(0.5)).alias("median_gap_days"),
        )
        .where(F.col("n_gaps") >= 3)
        .select(
            F.col("o_custkey").alias("custkey"), "n_gaps", "median_gap_days"
        )
    )
