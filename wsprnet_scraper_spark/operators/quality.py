"""Corpus-quality operators for training-data curation.

The Gopher/C4-style repetition filters, benchmark-contamination
detection, and PII masking that a large-scale pretraining pipeline
runs alongside dedup. Everything is pure Catalyst — token/ngram
construction with higher-order array functions, masking with
`regexp_replace` — so the hot path stays inside whole-stage codegen
with no Python boundary.

Cross-engine discipline: counts are exact longs; every ratio is a
single long/long IEEE division (no transcendental functions), so
DuckDB reproduces the doubles bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams_expr(n: int) -> str:
    """SQL expression producing the word n-gram array over `toks`."""
    parts = ", ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"transform(sequence(0, size(toks) - {n}),"
        f" i -> concat_ws(' ', {parts}))"
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document repetition profile: distinct-token ratio and the
    fraction of word bigrams taken by the single most frequent bigram
    (the Gopher `top-2-gram fraction` filter — boilerplate and
    template spam score high).

    Shape at scale: the distinct-token ratio is computed on the
    un-exploded token ARRAY (`array_distinct` — a projection, no
    shuffle); only the bigram mode needs the explode → two stacked
    hash aggregates, both map-side combined, keyed by (doc, gram)
    then doc. The ratio rides the aggregation keys so no join-back
    is needed. Only max/sum counts are emitted — never the winning
    gram itself — so ties cannot make the result nondeterministic.
    """
    toks = F.split(F.col(text_col), " ")
    base = (
        df.select(F.col(id_col).alias("doc"), toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc",
            (F.size(F.array_distinct("toks")) / F.size("toks")).alias(
                "distinct_ratio"
            ),
            F.explode(F.expr(_grams_expr(2))).alias("gram"),
        )
    )
    gcnt = base.groupBy("doc", "distinct_ratio", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        gcnt.groupBy("doc", "distinct_ratio")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_n"),
        )
        .select(
            "doc",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.col("top_bigram_n").cast("bigint").alias("top_bigram_n"),
            (F.col("top_bigram_n") / F.col("n_bigrams")).alias("top_frac"),
            "distinct_ratio",
        )
    )


def contamination(
    corpus_shingles: DataFrame,
    eval_shingles: DataFrame,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination scan: for each corpus document, the
    fraction of its distinct word n-grams that also occur anywhere in
    the eval set (the pre-training hygiene check run before any eval
    is trusted; cf. the n-gram overlap decontamination in GPT-3 §C /
    PaLM app. The inputs are (doc, shingle) relations as produced by
    `dedup.word_shingles`.

    Shape at scale: the eval side collapses to DISTINCT shingles —
    benchmark suites are tiny relative to a 100 TB corpus — and is
    broadcast, so the corpus side never shuffles for the join; the
    per-doc rollup is the single data-sized aggregation.
    """
    ev = F.broadcast(
        eval_shingles.select("shingle").distinct().withColumn(
            "hit", F.lit(1)
        )
    )
    return (
        corpus_shingles.join(ev, "shingle", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_shared"),
        )
        .select(
            "doc",
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            (F.col("n_shared") / F.col("n_shingles")).alias("contamination"),
            (F.col("n_shared") / F.col("n_shingles") >= F.lit(threshold)).alias(
                "contaminated"
            ),
        )
    )


def mask_phone(phone: Column) -> Column:
    """Mask the routing prefix of a phone number, keeping the last
    group (the standard PII-redaction shape: enough left to debug,
    not enough to dial). Anchored pattern → exactly one replacement,
    identical under Java regex and RE2."""
    return F.regexp_replace(phone, r"^[0-9]+-[0-9]+-[0-9]+", "XXX-XXX-XXX")


def redact_emails(s: Column) -> Column:
    """Replace email-shaped substrings with the '[EMAIL]' token."""
    return F.regexp_replace(s, r"[a-z0-9.]+@[a-z0-9.]+", "[EMAIL]")


def redact_digits(s: Column) -> Column:
    """Replace every digit run with '#' (addresses, ids, zips)."""
    return F.regexp_replace(s, r"[0-9]+", "#")


def digit_run_count(s: Column) -> Column:
    """How many digit runs a redaction pass would touch."""
    return F.regexp_count(s, F.lit(r"[0-9]+"))
