"""Run-twice idempotence for side-effectful queries.

Queries that write tmp dirs / tables, run real streams, or execute
eagerly at build time (graph_cc's convergence loop, RFM's lineage
cuts) must return the same relation when invoked twice in ONE
session — the long-running-service contract, and the regression that
plan-caching an eager builder would hide (a cached materialized
result silently skips re-execution; see the graph_cc cache_plans
lesson in plans/graph_q.py).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from wsprnet_scraper_spark.plans import QUERIES

SIDE_EFFECTFUL_PREFIXES = (
    "snk_",
    "src_",
    "strm_",
    "graph_cc",
    "graph_kcore",
    "join_bucketed",
    "evt_rfm",
)

NAMES = sorted(
    n for n in QUERIES if n.startswith(SIDE_EFFECTFUL_PREFIXES)
)


def _content_fingerprint(df):
    """Order-insensitive content checksum: (row_count, sorted tuple of
    per-row reprs). Catches a second run that returns same-cardinality
    but different CONTENT (stale cached table, different tmp-dir
    state) — a pure count() comparison would not (ADVICE r3). Floats
    repr round-trips exactly, so bit-level drift is visible too."""
    rows = df.collect()
    return len(rows), sorted(repr(tuple(r)) for r in rows)


@pytest.mark.parametrize("name", NAMES)
def test_second_invocation_matches_first(spark, name):
    n_a, c_a = _content_fingerprint(QUERIES[name](spark, SF_SMOKE))
    n_b, c_b = _content_fingerprint(QUERIES[name](spark, SF_SMOKE))
    assert n_a == n_b, f"{name}: first run {n_a} rows, second {n_b}"
    assert c_a == c_b, f"{name}: same cardinality, different content"
