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


@pytest.mark.parametrize("name", NAMES)
def test_second_invocation_matches_first(spark, name):
    a = QUERIES[name](spark, SF_SMOKE).count()
    b = QUERIES[name](spark, SF_SMOKE).count()
    assert a == b, f"{name}: first run {a} rows, second {b}"
