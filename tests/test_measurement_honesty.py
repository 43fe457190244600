"""Measurement-honesty pins (VERDICT r8 #1/#2): the committed
artifacts must carry the controlled-protocol evidence, so a future
round can't silently regress to hand-written claims or uncontrolled
numbers. Both checks read the NEWEST committed artifact only —
earlier rounds predate the mechanisms.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parents[1] / "tools"


def _latest(pattern: str) -> Path | None:
    files = sorted(
        TOOLS.glob(pattern),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    return files[-1] if files else None


def test_latest_probe_graph_keys_carry_protocol():
    latest = _latest("probe_results_r*_100x.json")
    assert latest is not None
    if int(re.search(r"r(\d+)", latest.name).group(1)) < 9:
        pytest.skip("pre-r9 artifact: protocol predates it")
    d = json.loads(latest.read_text())
    missing = [
        k
        for k, v in d.items()
        if k.endswith("@grownodes")
        and k != "graph_edge_build@grownodes"
        and "protocol" not in v
    ]
    assert not missing, (
        "graph probe keys without the controlled-protocol note "
        f"(VERDICT r8 #1): {missing}"
    )


def test_latest_bench_artifact_has_generated_regression_section():
    latest = TOOLS / "bench_results_latest.json"
    if not latest.is_file():
        pytest.skip("no bench artifact on this checkout")
    d = json.loads(latest.read_text())
    if "regressions_vs_prev" not in d:
        pytest.skip("pre-r9 bench artifact: section predates it")
    sect = d["regressions_vs_prev"]
    assert set(sect) == {"baseline_artifact", "threshold_ratio", "flagged"}
    for f in sect["flagged"]:
        assert {"query", "prev_median", "cur_median", "ratio",
                "overlapping_spread"} <= set(f)
