"""Mirrored-oracle audit sweep (r9 verdict task #1).

The exact-value differential gate proves engine == oracle; it cannot
prove either matches the SPEC when the oracle was authored by
mirroring the engine's own chain — the r9c evt_seasonal_outliers
near-miss gate-PASSED a wrong algebra because the oracle replayed the
same cleared form. This sweep mechanizes the protection the r9 fix
applied ad hoc:

- every registry entry whose oracle mirrors the engine chain is
  tagged `oracle_style="mirrored"` and names its independent
  `semantic_check` (a test authored from the spec: crafted-corpus
  expected values, a pure-Python/numpy reference, or bit-identity to
  a twin whose check is independent);
- a mirrored entry with a missing or dangling check FAILS here, so
  new mirrored entries cannot land unprotected;
- tag criteria + the tagged census live in COVERAGE.md.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

import __spark_entry__ as entrymod
from wsprnet_scraper_spark.plans.registry import (
    ORACLE,
    ORACLE_STYLE,
    QUERIES,
    SEMANTIC_CHECK,
)

entrymod.queries()  # force full registration

REPO = Path(__file__).resolve().parent.parent

# Families whose oracles REPLAY an engine recurrence/chain. A new
# entry whose name matches one of these must be tagged mirrored (or
# consciously added to the documented exceptions below) — this is the
# guard against forgetting the tag on the next superstep/recurrence
# entry, not a definition of mirroredness (COVERAGE.md holds that).
MIRRORED_NAME_HINTS = re.compile(
    r"^(graph_(pagerank|ppr|hits|cc|bfs|kcore|label|modularity)"
    r"|dedup_(semantic|minhash|simhash|cluster|embedding)"
    r"|sim_|strm_(minhash|semantic|changepoint)"
    r"|win_(ewma|bollinger|rsi)"
    r"|agg_(cusum|seasonality)"
    r"|evt_(markov|seasonal)"
    r"|diag_(t_closeness|dp_sensitivity|sq8|ann|ivf_balance))"
)

# Name-hint matches that are deliberately NOT tagged mirrored: their
# oracles are independent relational formulations (simple counts,
# set algebra, or spec-level math re-derived in SQL), reviewed in
# COVERAGE.md's audit note.
REVIEWED_INDEPENDENT = {
    "sim_topk_bruteforce",  # cosine re-derived: left-fold on sorted
    # dims both sides IS the spec (pinned by test_gemm numpy parity)
}


def test_every_mirrored_entry_names_a_semantic_check():
    mirrored = {n for n, s in ORACLE_STYLE.items() if s == "mirrored"}
    missing = sorted(mirrored - set(SEMANTIC_CHECK))
    assert not missing, f"mirrored entries without semantic_check: {missing}"


def test_semantic_check_refs_resolve_to_real_tests():
    for name, ref in sorted(SEMANTIC_CHECK.items()):
        file_part, func = ref.split("::")
        path = REPO / file_part
        assert path.exists(), f"{name}: {file_part} does not exist"
        tree = ast.parse(path.read_text())
        funcs = {
            n.name for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        assert func in funcs, f"{name}: {ref} dangles (no {func})"
        assert func.startswith("test_"), f"{name}: {ref} is not a test"


def test_semantic_check_implies_mirrored_tag():
    untagged = sorted(
        set(SEMANTIC_CHECK) - {n for n, s in ORACLE_STYLE.items() if s == "mirrored"}
    )
    assert not untagged, f"semantic_check without mirrored tag: {untagged}"


def test_recurrence_named_entries_are_tagged_or_reviewed():
    suspects = sorted(
        n for n in QUERIES
        if n in ORACLE  # rows-only entries have no oracle to mirror
        and MIRRORED_NAME_HINTS.match(n)
        and ORACLE_STYLE.get(n) != "mirrored"
        and n not in REVIEWED_INDEPENDENT
    )
    assert not suspects, (
        "entries in mirrored-prone families neither tagged nor "
        f"reviewed-independent: {suspects}"
    )


def test_coverage_census_matches_registry():
    # The r10 verdict's doc-drift finding: COVERAGE.md's hand-written
    # mirrored-entry census went stale twice (55/336, 56/337 vs the
    # actual 57). The doc now states ONE number and this test pins it
    # to the registry's ORACLE_STYLE map, so a new mirrored entry
    # that forgets the doc update fails the suite.
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"\*\*(\d+)\*\* entries are tagged", text)
    assert m, "COVERAGE.md census line ('**N** entries are tagged') missing"
    actual = sum(1 for s in ORACLE_STYLE.values() if s == "mirrored")
    assert int(m.group(1)) == actual, (
        f"COVERAGE.md census says {m.group(1)} mirrored entries, "
        f"registry has {actual} — update the doc line"
    )


def test_oracle_style_values_are_known():
    assert set(ORACLE_STYLE.values()) <= {"independent", "mirrored"}
    # every oracle-bearing entry has a recorded style
    assert set(ORACLE_STYLE) == set(ORACLE)
