"""Streaming ingest: the reference daemon as Structured Streaming.

fetcher — driver-side poll loop (cursor, cycle-aligned scheduling,
          atomic NDJSON landing writes); the piece that replaces
          wsprnet-scraper.sh's curl/sed orchestration.
ingest  — the Spark side: landing-dir file source -> parse -> enrich
          -> foreachBatch idempotent sink with gap telemetry.
"""

from .daemon import phase_locked_loop, run_scrape_daemon
from .fetcher import (
    Cursor,
    fetch_once,
    land_batch,
    recover_cursor_from_sink,
    seconds_until_next_offset,
)
from .ingest import read_spot_stream, start_ingest
from .rollup import RollupTable, continuous_rollup
from .stateful import track_sequences

__all__ = [
    "Cursor",
    "RollupTable",
    "continuous_rollup",
    "fetch_once",
    "land_batch",
    "phase_locked_loop",
    "read_spot_stream",
    "run_scrape_daemon",
    "recover_cursor_from_sink",
    "seconds_until_next_offset",
    "start_ingest",
    "track_sequences",
]
