"""Text-analysis column functions for corpus curation.

All pure Catalyst expressions over the `documents` table — language
ID (marker-word heuristic), quality scoring, token counting
(whitespace and BPE-ish regex), document fingerprinting. No UDFs;
everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of"]


def ws_token_count(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.size(F.split(text, r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish segment count: letter runs, digit runs, other symbols."""
    return F.regexp_count(text, F.lit("[a-z]+|[0-9]+"))


def stopword_hits(text: Column) -> Column:
    toks = F.split(text, " ")
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))


def stopword_ratio(text: Column) -> Column:
    return stopword_hits(text) / ws_token_count(text)


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.!?,]", ""))


def avg_token_len(text: Column) -> Column:
    return F.length(F.replace(text, F.lit(" "), F.lit(""))) / ws_token_count(text)


def lang_id(text: Column) -> Column:
    """Marker-word language heuristic (demo rule over the synthetic
    corpus): 'the'-heavy -> en, else 'xx'."""
    toks = F.split(text, " ")
    the_hits = F.size(F.filter(toks, lambda t: t == "the"))
    data_hits = F.size(F.filter(toks, lambda t: t == "data"))
    return F.when(the_hits >= data_hits, F.lit("en")).otherwise(F.lit("xx"))


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of the lowercased
    alphanumeric-only text (catches whitespace/punct-variant dups)."""
    return F.md5(F.lower(F.regexp_replace(text, r"[^a-zA-Z0-9]", "")))
