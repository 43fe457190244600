"""Eager-builder plan-caching audit (engine-wide, mechanical).

Builders that EXECUTE work at build time — the iterative graph/CC
operators run their whole loop eagerly (per-round localCheckpoint +
convergence counts) before returning a label relation — must opt out
of the prepared-plan cache: a cached "plan" for such a query is
really a materialized result, so a second in-session invocation
times ~0 and overstates steady-state throughput (and, for sinks,
skips the side effect). This bit three times before it was made
mechanical: graph_cc (r3 bench), snk_dynamic_partition_overwrite
(r3 ADVICE), and dedup_cluster (r4 100x probe measured it at 14 ms).

The audit is source-level: any registered builder whose body calls
one of the KNOWN eager operators must be registered with
cache_plans=False (detected as: the registry stored the raw builder,
not the functools.wraps memoizing wrapper).
"""

from __future__ import annotations

import inspect

from wsprnet_scraper_spark.plans import QUERIES

# operators whose invocation runs Spark jobs before returning
EAGER_OPS = (
    "connected_components",
    "kcore(",
    "label_propagation(",
    "bfs_layers(",
    "hits_quantized(",
)


def _raw(fn):
    return getattr(fn, "__wrapped__", fn)


def _cacheable(fn) -> bool:
    # register() wraps cacheable builders with functools.wraps (which
    # sets __wrapped__); non-cacheable ones are stored raw
    return hasattr(fn, "__wrapped__")


def test_every_eager_operator_caller_opts_out_of_plan_caching():
    offenders = []
    for name, fn in QUERIES.items():
        src = inspect.getsource(_raw(fn))
        if any(op in src for op in EAGER_OPS) and _cacheable(fn):
            offenders.append(name)
    assert offenders == [], (
        "builders executing eager operators must register "
        f"cache_plans=False: {offenders}"
    )


def test_known_eager_queries_are_not_cached():
    for name in (
        "graph_cc",
        "graph_kcore",
        "graph_label_propagation",
        "dedup_cluster",
        "pipe_dedup_e2e",
        "evt_rfm_segments",
        "snk_dynamic_partition_overwrite",
    ):
        assert not _cacheable(QUERIES[name]), name
