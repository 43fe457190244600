"""Headline membership rule (r8, VERDICT r7 #3): every probe-tracked
entry is in the bench headline — if an entry's 100x scaling is
published, its sf0.1 latency is published too. agg_hll_merge_rollup
landing in the probe but not the bench (r7) is the drift this pins
against. Also sanity: every headline / probe name resolves in the
registry, so a renamed entry can't silently drop out of both.
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _names(src: str, list_name: str) -> list[str]:
    m = re.search(rf"{list_name} = \[(.*?)\n\]", src, re.S)
    assert m, f"{list_name} not found"
    return re.findall(r'"([^"]+)"', m.group(1))


def _headline() -> set[str]:
    src = (ROOT / "bench.py").read_text()
    base = _names(src, "HEADLINE")
    m = re.search(r"HEADLINE \+= \[(.*?)\n\]", src, re.S)
    extra = re.findall(r'"([^"]+)"', m.group(1)) if m else []
    return set(base) | set(extra)


def _probed() -> set[str]:
    src = (ROOT / "tools" / "probe_100x.py").read_text()
    return (
        set(_names(src, "QUERIES_100X"))
        | set(_names(src, "GRAPH_QUERIES_100X"))
        | set(_names(src, "LINEITEM_100X"))
    )


def test_probe_tracked_entries_are_in_headline():
    missing = _probed() - _headline()
    assert not missing, (
        "probe-tracked entries missing from the bench headline "
        f"(the r8 membership rule): {sorted(missing)}"
    )


def test_headline_and_probe_names_resolve():
    from wsprnet_scraper_spark.plans import QUERIES

    unknown = (_headline() | _probed()) - set(QUERIES)
    assert not unknown, f"names not in the registry: {sorted(unknown)}"
