"""TPC-H partsupp-family shapes over a synthesized partsupp relation.

The driver's test schema has no partsupp table, which blocked the
Q11/Q16/Q20 shapes (r4 verdict #6). This module synthesizes one
DETERMINISTICALLY from the tables both engines share — pure integer
arithmetic over part × {0,1,2,3} (TPC-H's four suppliers per part),
supplier keyed by modular placement — expressed identically as a
DataFrame plan and as the oracle's SQL CTE, so the synthesized rows
are bit-equal in both engines and the downstream query shapes get
real exact-value oracles.

Design notes:
- `ps_suppkey = (p_partkey*7 + i*13) % s_cnt + s_min` assumes dense
  supplier surrogate keys (true of the testdata and the standard
  warehouse dim layout); a hole would drop the same row in both
  engines at the supplier join, preserving parity regardless.
- supply cost is carried in integer CENTS (`ps_cost_cents`) — no
  decimal division anywhere, every aggregate is exact BIGINT
  arithmetic, and the Q11 threshold compare is cross-multiplied
  (10000*part_value > total) so no float ever feeds a predicate.
- s_cnt/s_min ride a broadcast 1-row aggregate crossJoin (the
  engine's standard scalar-graft pattern), never a collect.

Scale: partsupp is 4×|part| rows built from a broadcast-sized dim
cross a 4-row range — at 100 TB this synthesizes partition-parallel
with the part scan and never shuffles; the Q20 lineitem aggregation
is the only fact-sized shuffle in the family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources import load
from .registry import register

# The shared SQL prelude: dims + partsupp, verbatim in every oracle.
PARTSUPP_CTE = """
dims AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s_cnt,
         CAST(MIN(s_suppkey) AS BIGINT) AS s_min
  FROM supplier
),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey*7 + i*13) % s_cnt + s_min AS ps_suppkey,
         (p_partkey*31 + ((p_partkey*7 + i*13) % s_cnt + s_min)*17)
           % 9999 + 1 AS ps_availqty,
         (p_partkey*131 + ((p_partkey*7 + i*13) % s_cnt + s_min)*29)
           % 100000 + 100 AS ps_cost_cents
  FROM part
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i)
  CROSS JOIN dims
)
"""


def partsupp_df(spark, sf_dir: str) -> DataFrame:
    """The Spark twin of the partsupp CTE above, column for column."""
    part = load(spark, sf_dir, "part")
    sup = load(spark, sf_dir, "supplier")
    dims = sup.agg(
        F.count(F.lit(1)).cast("bigint").alias("s_cnt"),
        F.min("s_suppkey").cast("bigint").alias("s_min"),
    )
    four = spark.range(4).select(F.col("id").cast("bigint").alias("i"))
    pk, i = F.col("p_partkey"), F.col("i")
    suppkey = F.pmod(pk * 7 + i * 13, F.col("s_cnt")) + F.col("s_min")
    return (
        part.select("p_partkey")
        .crossJoin(F.broadcast(four))
        .crossJoin(F.broadcast(dims))
        .select(
            pk.alias("ps_partkey"),
            suppkey.alias("ps_suppkey"),
            (F.pmod(pk * 31 + suppkey * 17, F.lit(9999)) + 1).alias(
                "ps_availqty"
            ),
            (F.pmod(pk * 131 + suppkey * 29, F.lit(100000)) + 100).alias(
                "ps_cost_cents"
            ),
        )
    )


@register(
    "agg_ps_value_q11",
    f"""
WITH {PARTSUPP_CTE},
val AS (
  SELECT ps.ps_partkey,
         CAST(SUM(ps.ps_cost_cents * ps.ps_availqty) AS BIGINT)
           AS value_cents
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_7', 'NATION_3')
  GROUP BY ps.ps_partkey
)
SELECT ps_partkey, value_cents
FROM val
WHERE 10000 * value_cents > (SELECT CAST(SUM(value_cents) AS BIGINT)
                             FROM val)
""",
)
def agg_ps_value_q11(spark, sf_dir):
    """TPC-H Q11 shape: per-part stock value within a nation group,
    kept when above fraction 0.0001 of the group total. The scalar
    total rides a broadcast 1-row crossJoin; the compare is
    cross-multiplied BIGINT (10000*v > total) — exact, no division.
    Scale: one shuffle for the per-part aggregate; supplier⋈nation
    broadcasts; the total is a second pass over the (already small)
    per-part aggregate, not the facts."""
    ps = partsupp_df(spark, sf_dir)
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    dim = sup.join(
        F.broadcast(nat.filter(F.col("n_name").isin("NATION_7", "NATION_3"))),
        sup.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = (
        ps.join(F.broadcast(dim), ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_cost_cents") * F.col("ps_availqty"))
            .cast("bigint")
            .alias("value_cents")
        )
    )
    total = val.agg(
        F.sum("value_cents").cast("bigint").alias("total_cents")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.lit(10000) * F.col("value_cents") > F.col("total_cents"))
        .select("ps_partkey", "value_cents")
    )


@register(
    "agg_supplier_cnt_q16",
    f"""
WITH {PARTSUPP_CTE}
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'ECONOMY%'
  AND p.p_size IN (1, 4, 7, 10, 15, 23, 45)
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def agg_supplier_cnt_q16(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    surviving (brand, type, size) bucket, excluding suppliers on the
    complaint list (here: negative acctbal — the schema has no
    comment column). NOT IN becomes a broadcast left-anti join
    (s_suppkey is non-null, so the null-semantics trap is moot); the
    part predicates broadcast with the dim. One distinct-agg
    shuffle."""
    ps = partsupp_df(spark, sf_dir)
    part = load(spark, sf_dir, "part")
    sup = load(spark, sf_dir, "supplier")
    pdim = part.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").startswith("ECONOMY")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(pdim), ps.ps_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            ps.ps_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


@register(
    "sub_excess_avail_q20",
    f"""
WITH {PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE '%red%'
JOIN shipped q
  ON q.l_partkey = ps.ps_partkey AND q.l_suppkey = ps.ps_suppkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
WHERE 2 * ps.ps_availqty > q.sq
""",
)
def sub_excess_avail_q20(spark, sf_dir):
    """TPC-H Q20 shape: suppliers holding excess stock of red parts —
    availqty exceeds half of what they shipped in 1996. Quantities
    are integral doubles; the BIGINT cast is exact in both engines
    (trunc-vs-round divergence needs a fractional part). The half
    compare is cross-multiplied (2*avail > shipped). Scale: the
    lineitem aggregation is the one fact shuffle; partsupp and the
    dims broadcast onto it."""
    ps = partsupp_df(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    sup = load(spark, sf_dir, "supplier")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sq"))
    )
    red = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    return (
        ps.join(F.broadcast(red), ps.ps_partkey == F.col("p_partkey"))
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.lit(2) * F.col("ps_availqty") > F.col("sq"))
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "agg_profit_q9",
    f"""
WITH {PARTSUPP_CTE}
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l.l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)
         - ps.ps_cost_cents * CAST(l.l_quantity AS BIGINT) * 100
       ) AS BIGINT) AS profit_e4
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN partsupp ps
  ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%blue%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
""",
)
def agg_profit_q9(spark, sf_dir):
    """TPC-H Q9 shape: product-type profit by nation and order year —
    revenue minus synthesized supply cost, over lineitem joined to
    partsupp on BOTH keys. All money in exact integer ten-thousandths:
    price(2dp) x (1-discount)(2dp) is an exact 4dp decimal scaled by
    1e4; cost cents x integral quantity scales by 1e2 to match — the
    SUM is pure BIGINT, order-independent, bit-equal across engines.
    Scale: partsupp rides the broadcast part dim onto the lineitem
    scan (it IS 4x|part| rows); orders joins on the orderkey shuffle;
    one aggregate by (nation, year). The reference's remaining
    unported TPC-H shapes (Q12/Q16-comment) need shipmode/comment
    columns the driver schema lacks."""
    ps = partsupp_df(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    blue = part.filter(F.col("p_name").like("%blue%")).select("p_partkey")
    sn = sup.join(
        F.broadcast(nat), sup.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "n_name")
    dec = "decimal(12,2)"
    profit_e4 = (
        F.col("l_extendedprice").cast(dec)
        * (F.lit(1) - F.col("l_discount").cast(dec))
        * 10000
    ).cast("bigint") - (
        F.col("ps_cost_cents") * F.col("l_quantity").cast("bigint") * 100
    )
    return (
        li.join(F.broadcast(blue), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(ps),
            (li.l_partkey == F.col("ps_partkey"))
            & (li.l_suppkey == F.col("ps_suppkey")),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit_e4.alias("pe4"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("pe4").cast("bigint").alias("profit_e4"))
    )


# Q12's shipmode/commitdate/receiptdate columns, synthesized from the
# keys the schema does have — same both-engine determinism as
# partsupp: mode = 7-way modular pick, commit = ship + ([-30, 29]
# days), receipt = ship + ([1, 30] days). Day arithmetic on a UTC
# session is exact and DST-free in both engines.
SHIPMODES = ["AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"]

LINEMODE_CTE = f"""
lm AS (
  SELECT l_orderkey, l_linenumber, l_shipdate,
         (['{"','".join(SHIPMODES)}'])
           [(l_orderkey*3 + l_linenumber) % 7 + 1] AS l_shipmode,
         l_shipdate + ((l_orderkey + l_linenumber) % 60 - 30)
           * INTERVAL 1 DAY AS l_commitdate,
         l_shipdate + ((l_orderkey*7 + l_linenumber*3) % 30 + 1)
           * INTERVAL 1 DAY AS l_receiptdate
  FROM lineitem
)
"""


def linemode_df(spark, sf_dir: str) -> DataFrame:
    """Spark twin of the lm CTE, column for column."""
    li = load(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("bigint")
    mode = F.element_at(
        F.array(*[F.lit(m) for m in SHIPMODES]),
        (F.pmod(ok * 3 + ln, F.lit(7)) + 1).cast("int"),
    )
    commit_off = (F.pmod(ok + ln, F.lit(60)) - 30).cast("int")
    receipt_off = (F.pmod(ok * 7 + ln * 3, F.lit(30)) + 1).cast("int")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        mode.alias("l_shipmode"),
        F.timestamp_add("DAY", commit_off, F.col("l_shipdate")).alias(
            "l_commitdate"
        ),
        F.timestamp_add("DAY", receipt_off, F.col("l_shipdate")).alias(
            "l_receiptdate"
        ),
    )


@register(
    "agg_shipmode_q12",
    f"""
WITH {LINEMODE_CTE}
SELECT lm.l_shipmode,
       CAST(SUM(CASE WHEN coalesce(o.o_orderpriority, '') IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN coalesce(o.o_orderpriority, '') NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lm
JOIN orders o ON o.o_orderkey = lm.l_orderkey
WHERE lm.l_shipmode IN ('MAIL', 'SHIP')
  AND lm.l_commitdate < lm.l_receiptdate
  AND lm.l_shipdate < lm.l_commitdate
  AND lm.l_receiptdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND lm.l_receiptdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY lm.l_shipmode
""",
)
def agg_shipmode_q12(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority audit) — the last
    TPC-H query shape the driver schema blocked, unlocked by the
    synthesized line-mode columns above. The mode + late-commit
    predicates are pure integer/day arithmetic pushed below the join,
    so only the qualifying sliver of lineitem ever joins orders (one
    orderkey shuffle at scale; orders carries just the priority).
    Conditional counts in one aggregation pass."""
    lm = linemode_df(spark, sf_dir)
    o = load(spark, sf_dir, "orders")
    # coalesce on BOTH sides (ADVICE r5): on a NULL priority Spark's
    # when/otherwise counted the line as low while SQL's NOT IN
    # yielded NULL and counted it as neither — coalescing to '' makes
    # high/low an exact partition in both engines.
    hi = F.coalesce(F.col("o_orderpriority"), F.lit("")).isin(
        "1-URGENT", "2-HIGH"
    )
    return (
        lm.filter(
            F.col("l_shipmode").isin("MAIL", "SHIP")
            & (F.col("l_commitdate") < F.col("l_receiptdate"))
            & (F.col("l_shipdate") < F.col("l_commitdate"))
            & (F.col("l_receiptdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_receiptdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(o.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )
