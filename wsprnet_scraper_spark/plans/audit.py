"""Plan audits: machine-checkable guards for the engine's scale policy.

The engine's policy (SCALE.md) bans unbounded `Window.orderBy(...)`
with no partition key on big data: Spark executes it as ONE task. The
policy has sanctioned exceptions — windows whose input is provably
tiny (a per-block summary, a ≤k-row aggregate) — and this module
makes the exception checkable instead of argued: `audit_windows`
walks a DataFrame's optimized logical plan and reports every
unpartitioned Window together with whether its input subtree is
REDUCED (contains an Aggregate/Limit below it, i.e. cardinality is
already collapsed before the window sees it).

tests/test_window_whitelist.py runs this over every registered query
and fails on any single-task window over un-collapsed input — so a
new query can't silently reintroduce the single-task sort. Because
the policy is enforced mechanically there, session.get_session
silences WindowExec's per-run log warning (it would only ever flag
the sanctioned tiny windows the audit has already proven reduced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _iter_nodes(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_nodes(children.apply(i))


def audit_windows(df: DataFrame) -> list[dict]:
    """All Window nodes in the optimized logical plan.

    Each entry: {"spec": "partitioned"|"pinned"|"unpartitioned",
    "reduced": bool, "node": str}.

    - "partitioned": real data-dependent partition keys — parallel.
    - "pinned": all-foldable partition spec (a `lit(0)` that the
      optimizer didn't strip) — single-partition, same rules as
      unpartitioned. (Catalyst's FoldablePropagation usually rewrites
      these to empty specs before this audit sees them.)
    - "unpartitioned": empty spec — single task; only legal over
      reduced input.

    `reduced` = an Aggregate or Limit sits below the window, so its
    input cardinality is already collapsed (block summaries, top-k
    leftovers) and a single-task window is safe by construction.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    out = []
    for n in _iter_nodes(plan):
        if n.nodeName() != "Window":
            continue
        part = n.partitionSpec()
        if part.isEmpty():
            spec = "unpartitioned"
        elif all(part.apply(i).foldable() for i in range(part.size())):
            spec = "pinned"
        else:
            spec = "partitioned"
        reduced = any(
            c.nodeName() in ("Aggregate", "GlobalLimit", "LocalLimit")
            for c in _iter_nodes(n.children().apply(0))
        )
        out.append(
            {
                "spec": spec,
                "reduced": reduced,
                "node": n.simpleStringWithNodeId()
                if hasattr(n, "simpleStringWithNodeId")
                else n.nodeName(),
            }
        )
    return out


def window_policy_violations(df: DataFrame) -> list[dict]:
    """Windows that would run as one task over un-collapsed input —
    the plan shape the engine bans outright."""
    return [
        w for w in audit_windows(df) if w["spec"] != "partitioned" and not w["reduced"]
    ]
