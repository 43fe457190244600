"""End-to-end tests for the streaming ingest subsystem.

Covers the reference's streaming semantics (SURVEY.md §2.9): cursor
tracking and recovery, cycle-aligned scheduling, at-least-once landing
with idempotent sink (duplicate injection), gap telemetry (gap
injection), and checkpointed restart.
"""

from __future__ import annotations

import json

import pytest

from wsprnet_scraper_spark.streaming import (
    Cursor,
    fetch_once,
    recover_cursor_from_sink,
    seconds_until_next_offset,
    start_ingest,
)
from wsprnet_scraper_spark.streaming.ingest import GapMonitor


def make_spot(spotnum: int) -> dict:
    """A valid raw (stringly-typed, API-shaped) spot record."""
    return {
        "Spotnum": str(spotnum),
        "Date": str(1700000000 + 120 * (spotnum % 50)),
        "Reporter": f"R{spotnum % 7}",
        "ReporterGrid": "EN50wc",
        "dB": str((spotnum % 40) - 25),
        "MHz": "14.097123",
        "CallSign": f"C{spotnum % 11}",
        "Grid": "JO62qm",
        "Power": "37",
        "Drift": "0",
        "distance": str((spotnum * 13) % 9000),
        "azimuth": str(spotnum % 360),
        "Band": "20",
        "version": "2.6.1",
        "code": "1",
    }


# ------------------------------------------------------------- pure pieces


def test_cycle_offsets():
    # fire offsets are {55, 85, 115} within the 120 s cycle
    assert seconds_until_next_offset(0) == 55
    assert seconds_until_next_offset(55.0) == 30  # at an offset -> next one
    assert seconds_until_next_offset(100) == 15
    assert seconds_until_next_offset(116) == 59  # wraps to 55 next cycle
    # phase-locked: absolute epoch doesn't matter, only cycle position
    assert seconds_until_next_offset(1700000000 % 120) == seconds_until_next_offset(
        1700000000
    )


def test_cursor_roundtrip(tmp_path):
    c = Cursor(tmp_path / "cursor.json")
    assert c.read() == 0
    c.advance(4242)
    assert c.read() == 4242
    assert Cursor(tmp_path / "cursor.json").read() == 4242  # durable


def test_fetch_once_lands_and_advances(tmp_path):
    cursor = Cursor(tmp_path / "cursor.json")
    landing = tmp_path / "landing"

    def fake_fetch(start: int) -> list[dict]:
        return [make_spot(n) for n in range(start + 1, start + 6)]

    assert fetch_once(fake_fetch, cursor, landing) == 5
    assert cursor.read() == 5
    files = list(landing.glob("spots-*.json"))
    assert len(files) == 1
    lines = files[0].read_text().strip().splitlines()
    assert len(lines) == 5
    assert json.loads(lines[0])["Spotnum"] == "1"
    # failure path: cursor untouched
    def bad_fetch(start: int):
        raise ConnectionError("API down")

    with pytest.raises(ConnectionError):
        fetch_once(bad_fetch, cursor, landing)
    assert cursor.read() == 5


# --------------------------------------------------------------- end-to-end


def test_ingest_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    cursor = Cursor(tmp_path / "cursor.json")

    # batch 1: spots 1..20 with a gap (13, 14 missing) and an in-batch dup
    def fetch1(start):
        nums = [n for n in range(1, 21) if n not in (13, 14)]
        return [make_spot(n) for n in nums] + [make_spot(7)]  # dup 7

    fetch_once(fetch1, cursor, landing)
    monitor = GapMonitor()
    q = start_ingest(spark, str(landing), sink, ckpt, monitor=monitor)
    q.awaitTermination()

    out = spark.read.parquet(sink)
    assert out.count() == 18  # 20 - 2 missing, dup dropped
    assert out.select("Spotnum").distinct().count() == 18
    # enrichment happened: all 27 columns, typed
    assert len(out.columns) == 27
    row = out.filter("Spotnum = 7").first()
    assert row["wd_band"] == 20  # 14.097 MHz -> 20 m
    assert row["wd_time"] is not None and ":" in row["wd_time"]
    # gap telemetry: one gap of size 2
    [rec] = monitor.records
    assert rec["total_gaps"] == 1
    assert rec["total_missing"] == 2
    assert rec["max_gap_size"] == 2
    assert rec["boundary_gap"] is None  # first batch ever

    # batch 2: overlaps the sink (18..20 replayed) + new 21..25
    def fetch2(start):
        return [make_spot(n) for n in range(18, 26)]

    fetch_once(fetch2, cursor, landing)
    q = start_ingest(spark, str(landing), sink, ckpt, monitor=monitor)
    q.awaitTermination()

    out = spark.read.parquet(sink)
    assert out.count() == 23  # 18 + only the 5 genuinely-new spots
    assert out.select("Spotnum").distinct().count() == 23
    rec2 = monitor.records[-1]
    assert rec2["boundary_gap"] == 0  # 21 follows 20 contiguously
    assert rec2["n_spots"] == 5

    # cursor recovery from the sink's high-water mark (cold start)
    assert recover_cursor_from_sink(spark, sink) == 25
    assert cursor.read() == 25


def test_checkpoint_restart_no_reprocess(spark, tmp_path):
    landing = tmp_path / "landing"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    cursor = Cursor(tmp_path / "cursor.json")

    fetch_once(lambda s: [make_spot(n) for n in range(1, 6)], cursor, landing)
    q = start_ingest(spark, str(landing), sink, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(sink).count() == 5

    # restart with the same checkpoint and no new files: nothing happens
    q = start_ingest(spark, str(landing), sink, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(sink).count() == 5


def test_recover_cursor_empty_sink(spark, tmp_path):
    assert recover_cursor_from_sink(spark, str(tmp_path / "nope")) is None


def test_mirror_fanout_two_sinks(spark, tmp_path):
    """The ClickHouse-analog: a second sink fed from the same deduped
    batch in one foreachBatch (SURVEY §2.1 snk_clickhouse)."""
    landing = tmp_path / "landing"
    mirror_dir = str(tmp_path / "mirror")
    cursor = Cursor(tmp_path / "cursor.json")
    fetch_once(lambda s: [make_spot(n) for n in range(1, 8)], cursor, landing)

    def mirror(batch_df, batch_id):
        batch_df.select("Spotnum", "wd_band").write.mode("append").parquet(mirror_dir)

    q = start_ingest(
        spark,
        str(landing),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        mirror_fn=mirror,
    )
    q.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 7
    m = spark.read.parquet(mirror_dir)
    assert m.count() == 7 and set(m.columns) == {"Spotnum", "wd_band"}


def test_rate_limited_stream_runs_bounded_microbatches(spark):
    # maxFilesPerTrigger=1 over a 4-file dataset must process in 4
    # bounded micro-batches (availableNow drains them all), and the
    # result must equal the one-shot batch aggregate — rate limiting
    # changes scheduling, never results
    from wsprnet_scraper_spark.plans import QUERIES
    from wsprnet_scraper_spark.plans.streaming_q import strm_rate_limited

    sf = "/root/testdata/sf0.001"
    got = {
        (r.win_start_s, r.n)
        for r in QUERIES["strm_rate_limited"](spark, sf).collect()
    }
    assert strm_rate_limited.last_progress_batches >= 4
    from pyspark.sql import functions as F

    from wsprnet_scraper_spark.sources import load_events

    ev = load_events(spark, sf)
    want = {
        (r.win_start_s, r.n)
        for r in ev.groupBy(F.window("ts", "2 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("win_start_s"), "n")
        .collect()
    }
    assert got == want
