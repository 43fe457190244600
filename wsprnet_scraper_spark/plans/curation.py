"""Corpus-curation queries: repetition filters, contamination scan,
PII masking, length histogram — the quality half of the training-data
pipeline (dedup being the other half, in plans/llmops.py).

Oracle discipline: ratios are single long/long divisions (bit-stable
across engines), regex patterns are limited to the Java-regex ∩ RE2
common subset, and no query emits a tie-dependent value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, quality
from ..sources import load
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
