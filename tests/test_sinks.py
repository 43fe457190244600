"""Sink fabric tests: bzip2 queue, at-least-once sweep, session extraction."""

from __future__ import annotations

import bz2

from wsprnet_scraper_spark.sources.sinks import sweep_upload_queue, write_queue_bz2
from wsprnet_scraper_spark.streaming.fetcher import extract_session_cookie


def test_queue_bz2_roundtrip(spark, tmp_path):
    from wsprnet_scraper_spark import pipeline

    df = pipeline.parse_json(spark, "/root/repo/tests/golden/spots_input.json")
    enriched = pipeline.enrich(pipeline.with_wd_time(df))
    qdir = tmp_path / "upload.d"
    write_queue_bz2(enriched, str(qdir))
    files = list(qdir.glob("*.csv.bz2"))
    assert files, "no bz2 parts written"
    lines = []
    for f in files:
        lines += bz2.decompress(f.read_bytes()).decode().strip().splitlines()
    assert len(lines) == df.count()
    assert all(len(line.split(",")) == 27 for line in lines)


def test_sweep_at_least_once(tmp_path):
    qdir = tmp_path / "upload.d"
    qdir.mkdir()
    for i in range(4):
        (qdir / f"f{i}.csv.bz2").write_bytes(b"x")

    # transport fails for f1 (returns False) and f2 (raises)
    def flaky(path: str) -> bool:
        if "f1" in path:
            return False
        if "f2" in path:
            raise OSError("connection reset")
        return True

    uploaded, kept = sweep_upload_queue(str(qdir), flaky)
    assert (uploaded, kept) == (2, 2)
    remaining = sorted(p.name for p in qdir.iterdir())
    assert remaining == ["f1.csv.bz2", "f2.csv.bz2"]  # retried next sweep

    # next sweep with a healthy transport drains the queue
    uploaded, kept = sweep_upload_queue(str(qdir), lambda p: True)
    assert (uploaded, kept) == (2, 0)
    assert list(qdir.iterdir()) == []


def test_extract_session_cookie():
    body = '{"sessid": "abc123", "session_name": "SESSd41d8cd"}'
    assert extract_session_cookie(body) == "SESSd41d8cd=abc123"
