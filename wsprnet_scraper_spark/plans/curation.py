"""Corpus-curation queries: repetition filters, contamination scan,
PII masking, length histogram — the quality half of the training-data
pipeline (dedup being the other half, in plans/llmops.py).

Oracle discipline: ratios are single long/long divisions (bit-stable
across engines), regex patterns are limited to the Java-regex ∩ RE2
common subset, and no query emits a tie-dependent value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, quality, sketch
from ..sources import load, load_events
from .registry import register

# ------------------------------------------------------------ repetition


@register(
    "text_repetition",
    """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
grams AS (
  SELECT doc_id AS doc,
    len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio,
    toks[i] || ' ' || toks[i+1] AS gram
  FROM docs, unnest(generate_series(1, len(toks) - 1)) AS t(i)
),
gcnt AS (
  SELECT doc, distinct_ratio, gram, count(*) AS c
  FROM grams GROUP BY 1, 2, 3
)
SELECT doc, CAST(sum(c) AS BIGINT) AS n_bigrams,
  CAST(max(c) AS BIGINT) AS top_bigram_n,
  max(c)::DOUBLE / sum(c) AS top_frac,
  distinct_ratio
FROM gcnt GROUP BY doc, distinct_ratio
""",
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition filter signals (distinct-token ratio,
    top-2-gram fraction) per document; see
    operators/quality.py::repetition_signals for the scale shape."""
    d = load(spark, sf_dir, "documents")
    return quality.repetition_signals(d, "doc_id", "text")


# --------------------------------------------------------- contamination


@register(
    "pipe_contamination",
    """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id AS doc,
    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM docs, unnest(generate_series(1, len(toks) - 2)) AS t(i)
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc % 97 = 0),
corp AS (SELECT * FROM sh WHERE doc % 97 <> 0)
SELECT corp.doc AS doc, CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(count(ev.shingle) AS BIGINT) AS n_shared,
  count(ev.shingle)::DOUBLE / count(*) AS contamination,
  count(ev.shingle)::DOUBLE / count(*) >= 0.2 AS contaminated
FROM corp LEFT JOIN ev ON corp.shingle = ev.shingle
GROUP BY 1
""",
)
def pipe_contamination(spark, sf_dir):
    """Benchmark-contamination scan: 3-gram overlap of every corpus
    document against a held-out eval slice (doc_id % 97), eval
    shingles broadcast so the corpus side never shuffles for the
    membership join."""
    d = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(d, "doc_id", "text", 3)
    ev_sh = sh.filter(F.col("doc") % 97 == 0)
    corp_sh = sh.filter(F.col("doc") % 97 != 0)
    return quality.contamination(corp_sh, ev_sh, threshold=0.2)


# ------------------------------------------------------------------- PII


@register(
    "text_pii_redact",
    """
SELECT c_custkey,
  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_redacted,
  CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS INT) AS n_redactions,
  regexp_replace(
    c_name || ' <' || lower(c_mktsegment) || '.' ||
      CAST(c_custkey AS VARCHAR) || '@example.com>',
    '[a-z0-9.]+@[a-z0-9.]+', '[EMAIL]', 'g') AS contact_redacted
FROM customer
""",
)
def text_pii_redact(spark, sf_dir):
    """PII masking pass over the customer dim: numeric-identifier
    suppression in names plus email-pattern redaction over a
    deterministically synthesized contact string (the tables carry no
    raw PII columns, so the email is constructed, then redacted — the
    redaction regex is the op under test). Pure `regexp_replace`
    projection — zero shuffles at any scale, and the patterns sit in
    the Java-regex ∩ RE2 common subset so both engines rewrite
    identically."""
    c = load(spark, sf_dir, "customer")
    contact = F.concat(
        F.col("c_name"),
        F.lit(" <"),
        F.lower(F.col("c_mktsegment")),
        F.lit("."),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com>"),
    )
    return c.select(
        "c_custkey",
        quality.redact_digits(F.col("c_name")).alias("name_redacted"),
        quality.digit_run_count(F.col("c_name")).alias("n_redactions"),
        quality.redact_emails(contact).alias("contact_redacted"),
    )


# ------------------------------------------------------- length histogram


@register(
    "text_length_hist",
    """
SELECT (n_chars // 50) * 50 AS bucket_lo,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(n_chars) AS BIGINT) AS min_chars,
  CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY 1
""",
)
def text_length_hist(spark, sf_dir):
    """Document-length histogram (50-char buckets) — the first plot
    anyone makes of a new corpus. Integer floor-div bucketing is a
    projection; one aggregation, map-side combined, output is
    #buckets rows regardless of corpus size."""
    d = load(spark, sf_dir, "documents")
    bucket = (F.expr("n_chars DIV 50") * 50).alias("bucket_lo")
    return d.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ------------------------------------------------- deterministic sketches


def _hex_sql(md5_expr: str, digits: int) -> str:
    """First-`digits` hex nibbles of an md5 VARCHAR expression as an
    integer — the oracle mirror of operators.sketch._hexpos."""
    e = "0"
    for i in range(1, digits + 1):
        e = (
            f"({e} * 16 + strpos('0123456789abcdef',"
            f" substr({md5_expr}, {i}, 1)) - 1)"
        )
    return e


_BLOOM_MD5 = "md5(CAST(j AS VARCHAR) || '|' || shingle)"
_BLOOM_POS = f"{_hex_sql(_BLOOM_MD5, 3)} % 4096"


@register(
    "pipe_bloom_decontam",
    f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id AS doc,
    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM docs, unnest(generate_series(1, len(toks) - 2)) AS t(i)
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc % 97 = 0),
corp AS (SELECT * FROM sh WHERE doc % 97 <> 0),
evbits AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM (SELECT {_BLOOM_POS} AS pos
        FROM ev, (VALUES (0),(1),(2)) AS s(j))
  GROUP BY 1
),
probe AS (
  SELECT doc, shingle, {_BLOOM_POS} AS pos
  FROM corp, (VALUES (0),(1),(2)) AS s(j)
),
ph AS (
  SELECT doc, shingle,
    SUM(CASE WHEN (COALESCE(b.bits, 0)
                   & (1::BIGINT << CAST(p.pos % 32 AS INT))) <> 0
        THEN 1 ELSE 0 END) AS n_bits_hit
  FROM probe p LEFT JOIN evbits b ON p.pos // 32 = b.word
  GROUP BY doc, shingle
)
SELECT doc, CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(SUM(CASE WHEN n_bits_hit = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
  SUM(CASE WHEN n_bits_hit = 3 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS bloom_rate,
  SUM(CASE WHEN n_bits_hit = 3 THEN 1 ELSE 0 END)::DOUBLE / count(*) >= 0.2 AS flagged
FROM ph GROUP BY doc
""",
)
def pipe_bloom_decontam(spark, sf_dir):
    """Contamination scan against a 4096-bit Bloom filter of the eval
    shingles instead of the raw set — the decontamination shape that
    survives an eval suite too large to broadcast verbatim (the
    filter is 512 bytes regardless). One-sided error: true overlaps
    always hit; false positives only over-flag (the safe direction).
    Same eval/corpus split as pipe_contamination so the two are
    directly comparable. r13: shingles flow through MULTISET
    (distinct=False) — the operator's own (doc, shingle)
    dropDuplicates is the single dedup exchange, where the old
    distinct-then-regroup shape paid the token-volume shuffle twice
    (and a probe explode + bitmap join besides; see
    sketch.bloom_decontaminate)."""
    d = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(d, "doc_id", "text", 3, distinct=False)
    return sketch.bloom_decontaminate(
        sh.filter(F.col("doc") % 97 != 0),
        sh.filter(F.col("doc") % 97 == 0),
        m_bits=4096,
        k=3,
        threshold=0.2,
    )


_CM_MD5 = "md5('cm' || CAST(r AS VARCHAR) || '|' || tok)"
_CM_COL = f"{_hex_sql(_CM_MD5, 2)} % 64"


@register(
    "agg_count_min",
    f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cells AS (
  SELECT r, {_CM_COL} AS c, count(*) AS cell_n
  FROM toks, (VALUES (0),(1),(2),(3)) AS d(r)
  GROUP BY 1, 2
),
exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok),
cand AS (
  SELECT tok, exact_n, r, {_CM_COL} AS c
  FROM exact, (VALUES (0),(1),(2),(3)) AS d(r)
),
est AS (
  SELECT cand.tok, cand.exact_n, min(cells.cell_n) AS cm_estimate
  FROM cand JOIN cells ON cand.r = cells.r AND cand.c = cells.c
  GROUP BY 1, 2
),
ranked AS (
  SELECT tok, exact_n, cm_estimate,
    row_number() OVER (ORDER BY cm_estimate DESC, tok) AS rn
  FROM est
)
SELECT tok, CAST(exact_n AS BIGINT) AS exact_n,
       CAST(cm_estimate AS BIGINT) AS cm_estimate
FROM ranked WHERE rn <= 10
""",
)
def agg_count_min(spark, sf_dir):
    """Heavy hitters via a 4×64 Count-Min sketch with the exact count
    alongside (estimate >= exact, one-sided). The sketch shuffle is
    fixed-size (≤256 cells) no matter the corpus; the judged query
    ranks the vocabulary by estimate to expose collision inflation."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    return sketch.count_min_topk(toks, "term", depth=4, width=64, k=10)


_KMV_MD5 = "md5(CAST(user_id AS VARCHAR))"


@register(
    "agg_kmv_distinct",
    f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, {_hex_sql(_KMV_MD5, 8)} AS hv FROM du),
r AS (
  SELECT event_type, hv,
    row_number() OVER (PARTITION BY event_type ORDER BY hv, event_type) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n_exact
  FROM h
),
kth AS (
  SELECT event_type, CAST(max(n_exact) AS BIGINT) AS n_exact,
         max(CASE WHEN rn = 8 THEN hv END) AS uk
  FROM r WHERE rn <= 8 GROUP BY event_type
)
SELECT event_type, n_exact,
  CASE WHEN uk IS NULL THEN CAST(n_exact AS DOUBLE)
       ELSE 7.0 * 4294967296.0 / CAST(uk AS DOUBLE) END AS kmv_estimate
FROM kth
""",
)
def agg_kmv_distinct(spark, sf_dir):
    """Distinct-cardinality estimation by K-Minimum-Values sketch
    (Bar-Yossef et al. 2002) — the mergeable approx-count-distinct
    shape, deterministically seeded: per group, keep the k=8 smallest
    md5 hash values; estimate = (k-1)/u_k with u_k the kth smallest
    hash normalized to [0,1). Exact count rides along to expose the
    estimation error. Groups with fewer than k distinct keys fall
    back to the exact count (the sketch IS the key set there).

    Completes the deterministic-sketch family: Bloom (membership),
    Count-Min (frequency), KMV (cardinality). Scale shape: the
    distinct reduces map-side; the per-group k-smallest is a
    partitioned window over the already-reduced distinct-key relation
    — at 100 TB a two-level min-k aggregation (partial top-k per
    partition) replaces the window, same answer."""
    ev = load_events(spark, sf_dir)
    from pyspark.sql import Window as W

    du = ev.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("hv"),
    )
    w = W.partitionBy("event_type").orderBy("hv", "event_type")
    wc = W.partitionBy("event_type")
    r = h.select(
        "event_type",
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_exact"),
    ).filter(F.col("rn") <= 8)
    kth = r.groupBy("event_type").agg(
        F.max("n_exact").cast("long").alias("n_exact"),
        F.max(F.when(F.col("rn") == 8, F.col("hv"))).alias("uk"),
    )
    return kth.select(
        "event_type",
        "n_exact",
        F.when(F.col("uk").isNull(), F.col("n_exact").cast("double"))
        .otherwise(
            F.lit(7.0) * F.lit(4294967296.0) / F.col("uk").cast("double")
        )
        .alias("kmv_estimate"),
    )


_HLL_HX = "md5('hll|' || CAST(user_id AS VARCHAR))"

# ln(64/V) literals shared with the Spark plan (sketch.hll_ln_table):
# repr() round-trips each double exactly, so neither engine runs ln()
from ..operators.sketch import hll_ln_table as _hll_ln_table

_HLL_LN_LIST = "[" + ", ".join(repr(x) for x in _hll_ln_table(64)) + "]"


@register(
    "agg_hll_distinct",
    f"""
WITH r AS (
  SELECT event_type,
    ({_hex_sql(_HLL_HX, 2)}) % 64 AS bkt,
    ltrim(substr({_HLL_HX}, 3, 10), '0') AS tr
  FROM events
),
rho AS (
  SELECT event_type, bkt,
    CASE WHEN length(tr) = 0 THEN 41
         ELSE (10 - length(tr)) * 4 +
           CASE WHEN strpos('0123456789abcdef', substr(tr, 1, 1)) - 1 >= 8 THEN 0
                WHEN strpos('0123456789abcdef', substr(tr, 1, 1)) - 1 >= 4 THEN 1
                WHEN strpos('0123456789abcdef', substr(tr, 1, 1)) - 1 >= 2 THEN 2
                ELSE 3 END + 1
    END AS rho
  FROM r
),
mb AS (SELECT event_type, bkt, max(rho) AS mr FROM rho GROUP BY 1, 2),
pg AS (
  SELECT event_type, count(*) AS nbh, SUM(2199023255552 >> mr) AS hs
  FROM mb GROUP BY 1
),
ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1),
est AS (
  SELECT event_type, nbh,
    CAST(hs + (64 - nbh) * 2199023255552 AS BIGINT) AS s_q41,
    CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(2199023255552 AS DOUBLE)
      / CAST(hs + (64 - nbh) * 2199023255552 AS DOUBLE) AS e_raw,
    CAST(64 - nbh AS INT) AS v_empty
  FROM pg
)
SELECT est.event_type, CAST(n_exact AS BIGINT) AS n_exact,
  CAST(nbh AS BIGINT) AS n_buckets_hit, s_q41,
  CAST(CASE WHEN e_raw <= 160.0 AND v_empty > 0
       THEN floor(CAST(64 AS DOUBLE) * ({_HLL_LN_LIST}::DOUBLE[])[v_empty])
       ELSE floor(e_raw) END AS BIGINT) AS hll_est
FROM est JOIN ex USING (event_type)
""",
)
def agg_hll_distinct(spark, sf_dir):
    """Per-event-type HyperLogLog distinct-user estimate next to the
    exact count (operators/sketch.hll_distinct) — the third distinct
    sketch (after KMV and bitmap) and the only one that needs NO
    pre-distinct shuffle: per-bucket max(rho) combines map-side, so
    the shuffle is <= 64 rows per group per partition at any scale.
    Integer-exact harmonic sum (2^(41-rho) BIGINT terms) keeps the
    sketch bit-identical across engines."""
    ev = load_events(spark, sf_dir)
    return sketch.hll_distinct(ev, "event_type", "user_id", m_buckets=64)


_HLL_EST_SQL = """
  SELECT event_type, count(*) AS nbh,
    CAST(SUM(2199023255552 >> mr) + (64 - count(*)) * 2199023255552 AS BIGINT) AS s_q41
  FROM {regs} GROUP BY 1
"""


@register(
    "agg_hll_merge_rollup",
    f"""
WITH r AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS shard,
    ({_hex_sql(_HLL_HX, 2)}) % 64 AS bkt,
    ltrim(substr({_HLL_HX}, 3, 10), '0') AS tr
  FROM events
),
rho AS (
  SELECT event_type, shard, bkt,
    CASE WHEN length(tr) = 0 THEN 41
         ELSE (10 - length(tr)) * 4 +
           CASE WHEN strpos('0123456789abcdef', substr(tr, 1, 1)) - 1 >= 8 THEN 0
                WHEN strpos('0123456789abcdef', substr(tr, 1, 1)) - 1 >= 4 THEN 1
                WHEN strpos('0123456789abcdef', substr(tr, 1, 1)) - 1 >= 2 THEN 2
                ELSE 3 END + 1
    END AS rho
  FROM r
),
sregs AS (SELECT event_type, shard, bkt, max(rho) AS mr FROM rho GROUP BY 1, 2, 3),
mregs AS (SELECT event_type, bkt, max(mr) AS mr FROM sregs GROUP BY 1, 2),
dregs AS (SELECT event_type, bkt, max(rho) AS mr FROM rho GROUP BY 1, 2),
ns AS (SELECT event_type, count(DISTINCT shard) AS n_shards FROM sregs GROUP BY 1),
pm AS ({_HLL_EST_SQL.format(regs="mregs")}),
pd AS ({_HLL_EST_SQL.format(regs="dregs")}),
em AS (
  SELECT event_type, nbh,
    CAST(CASE WHEN CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(2199023255552 AS DOUBLE) / CAST(s_q41 AS DOUBLE) <= 160.0
              AND 64 - nbh > 0
         THEN floor(64.0 * ({{_HLL_LN_LIST}}::DOUBLE[])[CAST(64 - nbh AS INT)])
         ELSE floor(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(2199023255552 AS DOUBLE) / CAST(s_q41 AS DOUBLE)) END
         AS BIGINT) AS est
  FROM pm
),
ed AS (
  SELECT event_type,
    CAST(CASE WHEN CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(2199023255552 AS DOUBLE) / CAST(s_q41 AS DOUBLE) <= 160.0
              AND 64 - nbh > 0
         THEN floor(64.0 * ({{_HLL_LN_LIST}}::DOUBLE[])[CAST(64 - nbh AS INT)])
         ELSE floor(CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(2199023255552 AS DOUBLE) / CAST(s_q41 AS DOUBLE)) END
         AS BIGINT) AS est
  FROM pd
)
SELECT em.event_type, CAST(ns.n_shards AS BIGINT) AS n_shards,
  CAST(em.nbh AS BIGINT) AS n_buckets_hit,
  em.est AS hll_merged, ed.est AS hll_direct,
  em.est = ed.est AS merge_exact
FROM em JOIN ed ON em.event_type = ed.event_type
JOIN ns ON ns.event_type = em.event_type
""".replace("{_HLL_LN_LIST}", _HLL_LN_LIST),
)
def agg_hll_merge_rollup(spark, sf_dir):
    """HLL MERGE re-aggregatability as a judged value (r7): one
    sketch per (event_type, day) — the granularity a hypertable
    continuous aggregate materializes — merged by per-bucket max and
    estimated, next to the direct single-pass estimate. Register
    merge is lossless (max is associative), so hll_merged ==
    hll_direct EXACTLY and the output's merge_exact column judges the
    property itself. The merge input is m rows per (group, day):
    at 100 TB the rollup table is what this query reads — the corpus
    is scanned once to build the daily sketches and never again."""
    ev = load_events(spark, sf_dir)
    return sketch.hll_merge_rollup(
        ev,
        "event_type",
        F.date_format(F.col("ts"), "yyyy-MM-dd"),
        "user_id",
        m_buckets=64,
    )


_KMV_HA = "md5(CAST(user_id AS VARCHAR))"


@register(
    "agg_kmv_setops",
    f"""
WITH a AS (
  SELECT DISTINCT {_hex_sql(_KMV_HA, 8)} AS hv FROM events
  WHERE event_type = 'click' AND event_id % 2 = 0
),
b AS (
  SELECT DISTINCT {_hex_sql(_KMV_HA, 8)} AS hv FROM events
  WHERE event_type = 'purchase' AND event_id % 3 = 0
),
ska AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM a) WHERE rn <= 8),
skb AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM b) WHERE rn <= 8),
m AS (
  SELECT hv FROM (
    SELECT hv, row_number() OVER (ORDER BY hv) AS rn
    FROM (SELECT hv FROM ska UNION SELECT hv FROM skb)
  ) WHERE rn <= 8
),
th AS (SELECT max(hv) AS theta, count(*) AS n_m FROM m),
com AS (
  SELECT count(*) AS n_common
  FROM ska JOIN skb USING (hv), th
  WHERE hv <= th.theta
),
exact AS (
  SELECT
    (SELECT count(*) FROM (SELECT hv FROM a UNION SELECT hv FROM b)) AS n_union_exact,
    (SELECT count(*) FROM a JOIN b USING (hv)) AS n_inter_exact
),
est AS (
  SELECT
    CASE WHEN n_m < 8 THEN CAST(n_m AS DOUBLE)
         ELSE 7.0 * 4294967296.0 / CAST(theta AS DOUBLE) END AS union_est,
    n_common
  FROM th, com
)
SELECT CAST(n_union_exact AS BIGINT) AS n_union_exact,
  CAST(n_inter_exact AS BIGINT) AS n_inter_exact,
  union_est AS kmv_union_est,
  CAST(n_common AS DOUBLE) / 8.0 * union_est AS kmv_inter_est
FROM exact, est
""",
)
def agg_kmv_setops(spark, sf_dir):
    """Set ALGEBRA on mergeable KMV sketches (the theta-sketch trick,
    Dasgupta et al. 2016): estimate |A∪B| and |A∩B| from two k=8
    sketches alone — union = k smallest of the merged sketches with
    theta = its kth value, intersection = (common hashes under theta)
    / k x union estimate. This is what makes sketch-based distinct
    counting COMPOSABLE at 100 TB: per-partition/per-day sketches
    merge associatively, and set overlaps between cohorts never
    rescan raw data. Exact counts ride along to expose the error;
    every hash is the same md5 arithmetic as agg_kmv_distinct, so the
    whole derivation is engine-exact."""
    from pyspark.sql import Window as W

    ev = load_events(spark, sf_dir)
    hv = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("hv")
    )

    def hashes(etype, mod):
        return (
            ev.filter(
                (F.col("event_type") == etype) & (F.col("event_id") % mod == 0)
            )
            .select(hv)
            .distinct()
        )

    a, b = hashes("click", 2), hashes("purchase", 3)

    def sketch_of(df):
        # two-phase k-smallest, never a global single-task window:
        # per-partition top-8 (parallel window on partition id), then
        # ONE aggregate collapses the <=8*P survivors into a sorted
        # 8-array — partial-agg combinable, policy-clean at any scale
        w_local = W.partitionBy("_pid").orderBy("hv")
        return (
            df.withColumn("_pid", F.spark_partition_id())
            .withColumn("rn", F.row_number().over(w_local))
            .filter(F.col("rn") <= 8)
            .agg(
                F.slice(F.array_sort(F.collect_list("hv")), 1, 8).alias("top")
            )
            .select(F.explode("top").alias("hv"))
        )

    ska, skb = sketch_of(a), sketch_of(b)
    m = sketch_of(ska.union(skb).distinct())
    th = m.agg(
        F.max("hv").alias("theta"), F.count(F.lit(1)).alias("n_m")
    )
    com = (
        ska.join(skb, "hv")
        .crossJoin(F.broadcast(th.select("theta")))
        .filter(F.col("hv") <= F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exact = (
        a.union(b)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_union_exact"))
        .crossJoin(a.join(b, "hv").agg(F.count(F.lit(1)).alias("n_inter_exact")))
    )
    union_est = F.when(
        F.col("n_m") < 8, F.col("n_m").cast("double")
    ).otherwise(F.lit(7.0) * F.lit(4294967296.0) / F.col("theta").cast("double"))
    return (
        th.crossJoin(com)
        .crossJoin(exact)
        .select(
            F.col("n_union_exact").cast("long").alias("n_union_exact"),
            F.col("n_inter_exact").cast("long").alias("n_inter_exact"),
            union_est.alias("kmv_union_est"),
            (F.col("n_common").cast("double") / F.lit(8.0) * union_est).alias(
                "kmv_inter_est"
            ),
        )
    )


@register(
    "pipe_dataset_card",
    """
SELECT
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS est_tokens,
  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
  CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM documents
""",
)
def pipe_dataset_card(spark, sf_dir):
    """The dataset card in one aggregate — the summary block every
    corpus release ships (docs, languages, sources, size, token
    estimate, exact-dup count): one scan, one shuffle, the three
    distinct-counts expanded by Catalyst inside the same aggregate.
    est_tokens is the whitespace estimate (split on ' '), identical
    in both engines; the dup count is docs minus distinct content
    hashes — at 100 TB swap the exact distincts for the judged
    sketch family (agg_hll_distinct / agg_kmv_distinct) when ±2% is
    acceptable, which is the documented dial, not a different op."""
    d = load(spark, sf_dir, "documents", parallel="never")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " ", -1)))
        .cast("bigint")
        .alias("est_tokens"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5(F.col("text"))))
        .cast("bigint")
        .alias("n_exact_dups"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "avg_chars"
        ),
    )


@register(
    "pipe_shard_manifest",
    """
WITH s AS (
  SELECT doc_id, text,
         CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
              AS BIGINT) % 8 AS shard
  FROM documents
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(CAST(strpos('0123456789abcdef',
                            substr(md5(text), 1, 1)) - 1 AS BIGINT))
            AS BIGINT) AS content_sig
FROM s GROUP BY shard
""",
)
def pipe_shard_manifest(spark, sf_dir):
    """The dataset-release manifest: deterministic md5-bucket shard
    assignment (shard = first md5 nibble of the id, mod 8 — stable
    across engines, reruns, and cluster sizes, unlike repartition's
    physical round-robin) plus per-shard row count, byte count, and
    an order-independent content signature (sum of a per-doc content
    hash) — what a consumer verifies before training on a published
    shard set. One scan, one 8-row aggregate; at 100 TB the shard
    column is also the partitionBy key for the actual write, so the
    manifest and the layout derive from the same projection."""
    d = load(spark, sf_dir, "documents", parallel="never")
    nib = lambda c: (
        F.conv(F.substring(F.md5(c), 1, 1), 16, 10).cast("bigint")
    )
    s = d.select(
        "doc_id",
        "text",
        F.pmod(nib(F.col("doc_id").cast("string")), F.lit(8)).alias("shard"),
    )
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.sum(nib(F.col("text"))).cast("bigint").alias("content_sig"),
    )


@register(
    "pipe_importance_select",
    """
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
uni AS (
  SELECT doc_id, source, toks[i] AS f
  FROM d, unnest(generate_series(1, len(toks))) AS t(i)
),
bi AS (
  SELECT doc_id, source, toks[i] || ' ' || toks[i+1] AS f
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2
),
feats AS (
  SELECT doc_id, source,
    CAST((strpos('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 16
       + strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1 AS BIGINT) AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
tgt AS (SELECT b, count(*) AS ct FROM feats WHERE source = 'src0' GROUP BY b),
raw AS (SELECT b, count(*) AS cr FROM feats WHERE source <> 'src0' GROUP BY b),
tot AS (
  SELECT (SELECT COALESCE(SUM(ct), 0) FROM tgt) AS t_total,
         (SELECT COALESCE(SUM(cr), 0) FROM raw) AS r_total
),
model AS (
  SELECT bs.b,
    CAST(floor(
      ((COALESCE(tgt.ct, 0) + 1) * (tot.r_total + 256))::DOUBLE
      / ((COALESCE(raw.cr, 0) + 1) * (tot.t_total + 256))::DOUBLE
      * 1000000000
    ) AS BIGINT) AS qb
  FROM (SELECT DISTINCT b FROM feats) bs
  LEFT JOIN tgt ON tgt.b = bs.b
  LEFT JOIN raw ON raw.b = bs.b
  CROSS JOIN tot
),
ds AS (SELECT doc_id, b, count(*) AS c FROM feats GROUP BY doc_id, b),
score AS (
  SELECT doc_id AS doc, CAST(SUM(c) AS BIGINT) AS n_feats,
         CAST(SUM(c * qb) AS BIGINT) AS score
  FROM ds JOIN model USING (b) GROUP BY doc_id
)
SELECT doc, n_feats, score FROM score
ORDER BY score DESC, doc LIMIT 100
""",
)
def pipe_importance_select(spark, sf_dir):
    """DSIR-style importance selection (Xie et al. 2023): hashed
    unigram+bigram bucket distributions for a target domain vs the
    rest, per-document target-likeness score in the engine's log-free
    rational arithmetic, top-100 selection — the domain-matching data
    selection step of a pretraining pipeline. Target domain pinned to
    'src0' (the lexicographically first source shard). See
    operators/text.importance_select for the estimator deviation
    (quantized ratio instead of log-ratio) and the bucket-sized-model
    scale argument."""
    from ..operators import text as text_ops

    d = load(spark, sf_dir, "documents", parallel="always")
    return text_ops.importance_select(
        d, "doc_id", "text", "source", "src0", buckets=256, k=100
    )


@register(
    "text_readability",
    """
WITH m AS (
  SELECT doc_id,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
      AS n_sentences,
    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
  206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
          - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
    AS reading_ease,
  0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
    - 15.59 AS fk_grade
FROM m
WHERE n_words > 0
""",
)
def text_readability(spark, sf_dir):
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic readability pair that quality-filtered pretraining
    recipes bucket on (alongside text_quality's Gopher-style rules).
    Counts are the standard heuristics: words = whitespace tokens,
    syllables = contiguous vowel groups, sentences = terminal-
    punctuation runs floored at 1 (operators/text.sentence_count —
    unpunctuated corpora read as one sentence rather than zeroing
    the ratio). All three counts are exact integers from the
    Java-regex ∩ RE2 common subset; the two formula evaluations are
    fixed-shape double expressions (left-associated identically in
    both engines), so the gate is exact-value. Pure per-row
    projection: zero shuffle at any corpus size. The n_words > 0
    guard keeps the div-by-zero edge out of the contract (Spark ANSI-
    off yields NULL where DuckDB yields inf)."""
    from ..operators import text as text_ops

    d = load(spark, sf_dir, "documents", parallel="always")
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return (
        d.select(
            "doc_id",
            text_ops.ws_token_count(F.col("text")).cast("bigint").alias("n_words"),
            text_ops.sentence_count(F.col("text")).alias("n_sentences"),
            text_ops.syllable_count(F.col("text")).alias("n_syllables"),
        )
        .where(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
                "reading_ease"
            ),
            (
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
            ).alias("fk_grade"),
        )
    )
