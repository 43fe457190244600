"""Regression tests for the ADVICE r1 robustness items."""

from __future__ import annotations

import pytest

from wsprnet_scraper_spark.plans import registry
from wsprnet_scraper_spark.plans.registry import QUERIES, _PLAN_CACHE
from wsprnet_scraper_spark.sources.tables import _size_to_bytes


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("134217728", 134217728),
        ("134217728b", 134217728),
        ("128m", 128 << 20),
        ("128MB", 128 << 20),
        ("128M", 128 << 20),
        ("1g", 1 << 30),
        ("64k", 64 << 10),
        (" 2G ", 2 << 30),
        ("garbage", 128 << 20),  # fallback, never a crash
        (None, 128 << 20),
        ("", 128 << 20),
    ],
)
def test_size_suffix_parsing(raw, expected):
    assert _size_to_bytes(raw) == expected


def test_plan_cache_evicts_stopped_applications(spark):
    registry.clear_plan_cache()
    QUERIES["agg_count_rows"](spark, "/root/testdata/sf0.001")
    app = spark.sparkContext.applicationId
    assert app in _PLAN_CACHE and _PLAN_CACHE[app]
    # simulate plans left behind by a stopped application: the first
    # miss from the live app must evict the dead bucket
    dead = {"dead-app-0001": {("q", "sf", ""): object()}}
    _PLAN_CACHE.clear()
    _PLAN_CACHE.update(dead)
    QUERIES["agg_count_rows"](spark, "/root/testdata/sf0.001")
    assert "dead-app-0001" not in _PLAN_CACHE
    assert app in _PLAN_CACHE
