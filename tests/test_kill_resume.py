"""Streaming restart-under-failure: SIGKILL the ingest JVM mid-batch,
restart from the same checkpoint, and prove no Spotnum is lost or
duplicated (round-3 verdict item #5).

The in-process at-least-once and idempotence suites exercise clean
restarts; this one kills the WHOLE process group (Python driver + its
JVM) with SIGKILL — no shutdown hooks, no finally blocks — in the
window between the parquet sink write and the checkpoint commit (the
victim's mirror sink sleeps there), then resumes. Structured
Streaming replays the uncommitted batch; the sink-side anti-join
(streaming/ingest.py:_dedup_against_sink — the parquet stand-in for
the reference's `ON CONFLICT ("Spotnum") DO NOTHING`) must absorb the
replay. Mirrors the reference's cursor-hold crash semantics
(wsprnet-scraper.sh:341: the cursor only advances on success, so a
crashed batch is re-fetched and the PK dedups it).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
CHILD = str(REPO / "tests" / "kill_resume_child.py")


def _run_child(mode: str, env: dict) -> str:
    proc = subprocess.run(
        [sys.executable, CHILD, mode],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"{mode} child failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout


def test_sigkill_mid_batch_then_resume(tmp_path):
    work = str(tmp_path / "kr")
    os.makedirs(work)
    env = dict(os.environ, KR_WORK=work, KR_SF="/root/testdata/sf0.001")

    # 1. land the spots as 24 small NDJSON files and learn the truth
    out = _run_child("land", env)
    line = next(l for l in out.splitlines() if l.startswith("LAND "))
    expected = json.loads(line.removeprefix("LAND "))
    assert expected["n_distinct"] > 0

    # 2. start the victim (own process group), wait until it has
    #    committed >= 2 micro-batches, then SIGKILL the whole group —
    #    Python driver and JVM die instantly, mid-batch by
    #    construction (each batch sleeps 0.4 s between sink write and
    #    checkpoint commit)
    victim = subprocess.Popen(
        [sys.executable, CHILD, "victim"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
        cwd=str(REPO),
        start_new_session=True,
    )
    commits = Path(work) / "ckpt" / "commits"
    killed = False
    try:
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            if victim.poll() is not None:
                break  # finished before we could kill — assert below
            n_commits = (
                len([p for p in commits.iterdir() if not p.name.startswith(".")])
                if commits.is_dir()
                else 0
            )
            if n_commits >= 2:
                os.killpg(os.getpgid(victim.pid), signal.SIGKILL)
                killed = True
                break
            time.sleep(0.05)
        victim.wait(timeout=60)
    finally:
        if victim.poll() is None:  # pragma: no cover - cleanup only
            os.killpg(os.getpgid(victim.pid), signal.SIGKILL)
            victim.wait(timeout=60)

    # 24 batches x >= 0.4 s sleep each vs a 0.05 s poll: the kill must
    # land. If this ever flakes on a pathologically slow start, the
    # resume still proves correctness, but the kill is the point.
    assert killed, "victim drained all batches before the kill window"

    # 3. resume from the same checkpoint in a fresh JVM and drain
    out = _run_child("resume", env)
    line = next(l for l in out.splitlines() if l.startswith("RESUME "))
    got = json.loads(line.removeprefix("RESUME "))

    # no duplicates (replayed batch absorbed by the sink anti-join) …
    assert got["n_rows"] == got["n_distinct"], got
    # … and no loss: the distinct Spotnum set equals the landed set
    assert got["n_distinct"] == expected["n_distinct"], (got, expected)
    assert got["sum_ids"] == expected["sum_ids"], (got, expected)
