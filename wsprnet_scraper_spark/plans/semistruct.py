"""Semi-structured & extensibility queries: JSON/array/map scalar
functions over `events.props`, table-function (explode) shapes, the
pandas-UDAF surface, and grouping sets.

Fills SURVEY.md §2.8's ∅ array/map/json row and §2.10's ∅ UDAF/UDTF
rows. The reference has no array/map/JSON columns at all (its one
JSON touchpoint is shredded with sed, wsprnet-scraper.sh:265); the
driver `events.props` column (a JSON object string) is the substrate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from ..sources import load, load_events
from .registry import register

# --------------------------------------------------------- JSON scalar ops


@register(
    "json_get_props",
    """
SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(json_extract(props, '$.missing') AS INT) AS missing
FROM events
""",
)
def json_get_props(spark, sf_dir):
    """get_json_object over the props JSON string; absent path -> null
    (the by-name-with-unknown-drop semantics of wsprnet_azi_calc.py:194
    generalized to real JSON ops)."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing"),
    )


@register(
    "json_variant_extract",
    """
SELECT event_id,
  CAST(json_extract(props, '$.k') AS INT) AS k_typed,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract(props, '$.absent') AS INT) AS absent
FROM events WHERE event_id % 7 = 0
""",
)
def json_variant_extract(spark, sf_dir):
    """Semi-structured extraction through Spark 4's VARIANT type:
    `parse_json` once into an open-schema binary-encoded column
    (staged, so the parse is not repeated per path), then typed
    `try_variant_get` path reads — int, string-cast-of-number, and a
    missing path yielding NULL instead of an error. VARIANT is the
    shredded-storage answer for 100 TB of heterogeneous JSON: parse
    cost is paid once at ingest, path reads are binary field lookups
    instead of string re-parsing (get_json_object re-parses per
    call — `json_get_props` is that baseline), and unknown keys stay
    queryable without schema migration."""
    ev = load_events(spark, sf_dir).filter(F.col("event_id") % 7 == 0)
    staged = ev.select("event_id", F.parse_json("props").alias("v"))
    return staged.select(
        "event_id",
        F.try_variant_get("v", "$.k", "int").alias("k_typed"),
        F.try_variant_get("v", "$.k", "string").alias("k_str"),
        F.try_variant_get("v", "$.absent", "int").alias("absent"),
    )


@register(
    "map_from_json",
    """
SELECT event_id,
  CAST(len(json_keys(props)) AS INT) AS n_keys,
  CAST(json_extract(props, '$.k') AS INT) AS k_val
FROM events
""",
)
def map_from_json(spark, sf_dir):
    """from_json into a typed map<string,int>, then map functions
    (size, element_at) — the schema-on-read path for semi-structured
    columns."""
    ev = load_events(spark, sf_dir)
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


# ------------------------------------------------------------ array ops


@register(
    "arr_token_stats",
    """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3,
  CAST(list_contains(string_split(text, ' '), 'data') AS BOOLEAN) AS has_data
FROM documents
""",
)
def arr_token_stats(spark, sf_dir):
    """split -> array ops (size, array_distinct, sort, slice,
    array_contains) with scalar outputs so the cross-engine hash is
    stable."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    dist = F.array_distinct(toks)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(dist).alias("n_distinct"),
        F.concat_ws(",", F.slice(F.array_sort(dist), 1, 3)).alias("first3"),
        F.array_contains(toks, "data").alias("has_data"),
    )


@register(
    "udtf_explode_tokens",
    """
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
""",
)
def udtf_explode_tokens(spark, sf_dir):
    """Table-function shape: one row in -> many rows out via explode
    (the JVM-native UDTF; a Python `@udtf` variant lives in
    operators/udf_variants.py for the API surface)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


# --------------------------------------------------------------- UDAF


@register(
    "udaf_grouped_range",
    """
SELECT l_returnflag, CAST(max(l_quantity) - min(l_quantity) AS DOUBLE) AS qty_range,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def udaf_grouped_range(spark, sf_dir):
    """Custom aggregate via an Arrow-vectorized pandas GROUPED_AGG UDF
    (max-min: order-independent, exact in doubles — deliberately so
    the differential hash is stable). Fills SURVEY §2.10 ∅ UDAF."""

    @F.pandas_udf(DoubleType())
    def qty_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    @F.pandas_udf(LongType())
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas grouped-agg with built-in
        # aggregates in one agg(), so the count is a pandas UDF too
        return len(v)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qty_range("l_quantity").alias("qty_range"),
        n_rows("l_quantity").alias("n"),
    )


# ------------------------------------------------- grouped-map applyInPandas


@register(
    "udf_grouped_map_rank",
    """
SELECT o_custkey, o_orderkey,
  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
       AS INT) AS price_rank
FROM orders WHERE o_custkey % 10 = 0
""",
)
def udf_grouped_map_rank(spark, sf_dir):
    """Grouped-map applyInPandas: whole group in, whole group out —
    per-customer price ranking computed in pandas. Integer semantics
    with a deterministic tiebreaker so the result is exact (the
    native Window.rank is the oracle). The shape a per-group
    featurizer/normalizer uses at scale: one Arrow exchange per
    group, no driver involvement."""
    import pandas as pd

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).reset_index(drop=True)
        # the sort key includes the unique orderkey, so rank() over it
        # never ties: positions ARE the ranks
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "price_rank": range(1, len(pdf) + 1),
            }
        )

    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(
            rank_group, schema="o_custkey long, o_orderkey long, price_rank int"
        )
    )


# ------------------------------------------------------------- sketches


@register(
    "agg_approx_sketches",
    """
SELECT l_returnflag,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_nd,
  CAST(abs(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
       <= 0.05 * COUNT(DISTINCT l_orderkey) AS BOOLEAN) AS hll_ok,
  CAST(abs(approx_quantile(l_extendedprice, 0.5) - median(l_extendedprice))
       <= 0.05 * median(l_extendedprice) AS BOOLEAN) AS q50_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_sketches(spark, sf_dir):
    """Sketch aggregates (HyperLogLog count-distinct, approximate
    percentile) judged on their ACCURACY CONTRACT: each engine runs
    its own sketch and asserts it lands within 5% of its own exact
    value — the booleans (plus the exact counts) are what cross-engine
    comparison checks, since sketch internals legitimately differ
    between engines. These are the 100 TB cardinality/quantile tools:
    one pass, fixed memory, mergeable partials.

    r12 (VERDICT r11 task #2 — the documented dial, implemented):
    the exact median judging the 5% contract no longer runs
    `percentile()` (which buffers each l_returnflag group's values on
    ONE reducer — the whole of the entry's former 9.9 s at sf0.1, and
    a genuine single-reducer death at 100 TB). It now computes the
    identical number distributed, the agg_weighted_median_blocked
    shape: pre-aggregate counts by (flag, price) — fully parallel,
    map-side-combinable, and DOMAIN-bounded (l_extendedprice draws
    from the fixed TPC-H price domain, so the reduced relation stops
    growing with the corpus) — then a price-blocked prefix sum
    reconstructs the exact global cumulative count, the two
    bracketing order statistics are min-price selections over the
    cumulative relation, and the interpolation (inline in
    `_exact_median_by_key`, same arithmetic as
    `_percentile_of_sorted_array`) replicates Percentile.scala bit
    for bit
    (tests/test_verdict_r12.py pins distributed == percentile() on
    random multisets). The sketch pass itself is unchanged: one
    fixed-memory scan with mergeable partials."""
    from .analytics import _exact_median_by_key

    li = load(spark, sf_dir, "lineitem")
    exact_nd = F.countDistinct("l_orderkey")
    approx_nd = F.approx_count_distinct("l_orderkey", rsd=0.02)
    # accuracy=1000 (r12, probe-caught): the digest's guarantee is a
    # RANK error of 1/accuracy — 0.1% of rank at 1000, orders of
    # magnitude inside the 5% VALUE contract judged here; merge cost
    # is linear in the dial.
    approx_med = F.expr("approx_percentile(l_extendedprice, 0.5, 1000)")
    # The quantile digest runs in its OWN aggregation (r12, the
    # second probe catch on this entry): countDistinct in the same
    # GROUP BY forces Spark's distinct-expand rewrite, under which
    # the ObjectHashAggregate allocates one PercentileDigest buffer
    # PER (flag, l_orderkey) expanded group — millions of digests at
    # the 100x corpus, and a thread dump showed every executor pinned
    # in PercentileDigest.merge. Split, the digest aggregates
    # per-partition partials into |flags| groups (3), and the
    # distinct rewrite keeps its plain hash-agg plan. The 3-row
    # results join back by flag — two broadcast joins of scalar
    # relations.
    # ... and the EXACT distinct runs alone too: mixed with any
    # non-distinct aggregate, the distinct rewrite expands every row
    # once per aggregate group (measured 82.5 s of the entry's 97.8 s
    # at 100x); alone, it plans the clean two-phase
    # (flag, l_orderkey) partial -> flag count with no Expand. Both
    # SKETCHES share one simple single-pass aggregation.
    sk = li.groupBy("l_returnflag").agg(exact_nd.alias("exact_nd"))
    qd = li.groupBy(F.col("l_returnflag").alias("_qflag")).agg(
        approx_nd.alias("_and"), approx_med.alias("_amed")
    )
    med = _exact_median_by_key(
        li, F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    )
    # LEFT + null-safe joins (ADVICE r12): a group whose prices are
    # all NULL has no exact-median row, and a NULL flag group fails a
    # null-unsafe equi-join — either would silently drop the group
    # where the oracle's single GROUP BY keeps it with NULL q50_ok.
    # Degenerate-corpus-only on TPC-H, but shape must match.
    return (
        sk.join(F.broadcast(qd), sk.l_returnflag.eqNullSafe(qd._qflag), "left")
        .join(F.broadcast(med), sk.l_returnflag.eqNullSafe(med.flag), "left")
        .select(
            "l_returnflag",
            "exact_nd",
            (F.abs(F.col("_and") - F.col("exact_nd"))
             <= 0.05 * F.col("exact_nd")).alias("hll_ok"),
            (F.abs(F.col("_amed") - F.col("exact_med"))
             <= 0.05 * F.col("exact_med")).alias("q50_ok"),
        )
    )


# ---------------------------------------------------------- grouping sets


@register(
    "agg_grouping_sets",
    """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
  SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping() disambiguation of the
    generated nulls (complements the cube/rollup entries)."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
          CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
          SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
