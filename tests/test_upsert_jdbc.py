"""Replay-idempotency proof for the JDBC upsert sink (VERDICT r1 item 5).

The environment has no psycopg2/Postgres, so the transport is
injected two ways:

- a RECORDING connection that journals every executed page to disk
  (workers are separate processes — in-memory mocks can't report
  back), pinning the generated SQL and the paging behavior;
- stdlib sqlite3 as a REAL SQL engine with primary-key + upsert
  semantics, executing the very statement the sink generates (modulo
  the %s->? paramstyle shim): writing a batch, replaying it, and
  writing an overlapping batch must leave exactly the distinct rows —
  `ON CONFLICT ("Spotnum") DO NOTHING` end to end.
"""

from __future__ import annotations

import json
import sqlite3
import uuid
from pathlib import Path

import pytest

from wsprnet_scraper_spark.sources.sinks import (
    insert_on_conflict_sql,
    upsert_jdbc_on_conflict,
)


# The transports are built INSIDE local factories: classes defined at
# test-module level pickle by reference, and Spark's Python workers
# can't import the test module — cloudpickle serializes locally
# defined classes by value instead.


def _make_sqlite_connect():
    """DB-API-ish shim: psycopg2 paramstyle -> sqlite qmark."""

    class SqliteCursor:
        def __init__(self, cur):
            self._cur = cur

        def executemany(self, sql, rows):
            self._cur.executemany(
                sql.replace("%s", "?"), [tuple(r) for r in rows]
            )

    class SqliteConn:
        def __init__(self, path):
            self._conn = sqlite3.connect(path, timeout=30)

        def cursor(self):
            return SqliteCursor(self._conn.cursor())

        def commit(self):
            self._conn.commit()

        def close(self):
            self._conn.close()

    return SqliteConn


def _make_recording_connect():
    """Journals every executed page + commit to files in conninfo."""

    class RecordingCursor:
        def __init__(self, sink_dir):
            self.sink_dir = sink_dir

        def executemany(self, sql, rows):
            out = Path(self.sink_dir) / f"page-{uuid.uuid4().hex}.json"
            out.write_text(
                json.dumps({"sql": sql, "rows": [list(r) for r in rows]})
            )

    class RecordingConn:
        def __init__(self, sink_dir):
            self.sink_dir = sink_dir

        def cursor(self):
            return RecordingCursor(self.sink_dir)

        def commit(self):
            (Path(self.sink_dir) / f"commit-{uuid.uuid4().hex}").touch()

        def close(self):
            pass

    return RecordingConn


def _spot_rows(start, n):
    return [
        (start + i, f"R{(start + i) % 7}", (start + i) % 40 - 25, 14.097123)
        for i in range(n)
    ]


def _spot_df(spark, start, n):
    return spark.createDataFrame(
        _spot_rows(start, n), "Spotnum long, Reporter string, dB long, MHz double"
    )


def test_insert_sql_generation():
    sql = insert_on_conflict_sql("wsprnet.spots", ["Spotnum", "Reporter"])
    assert sql == (
        'INSERT INTO "wsprnet"."spots" ("Spotnum", "Reporter") VALUES (%s, %s) '
        'ON CONFLICT ("Spotnum") DO NOTHING'
    )


def test_upsert_replay_is_idempotent(spark, tmp_path):
    db = str(tmp_path / "spots.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            'CREATE TABLE spots ("Spotnum" INTEGER PRIMARY KEY, '
            '"Reporter" TEXT, "dB" INTEGER, "MHz" REAL)'
        )

    connect = _make_sqlite_connect()
    batch = _spot_df(spark, 1000, 10).coalesce(1)
    upsert_jdbc_on_conflict(batch, db, connect_fn=connect)
    # replay the SAME batch (foreachBatch redelivery after a crash
    # between sink write and checkpoint commit)
    upsert_jdbc_on_conflict(batch, db, connect_fn=connect)
    # and an overlapping batch: 5 dupes + 5 new
    upsert_jdbc_on_conflict(
        _spot_df(spark, 1005, 10).coalesce(1), db, connect_fn=connect
    )

    with sqlite3.connect(db) as conn:
        got = sorted(conn.execute("SELECT * FROM spots").fetchall())
    assert got == sorted(_spot_rows(1000, 15))  # no dupes, no losses


def test_pages_and_statement_shape(spark, tmp_path):
    journal = tmp_path / "journal"
    journal.mkdir()
    upsert_jdbc_on_conflict(
        _spot_df(spark, 1, 10).coalesce(1),
        str(journal),
        page_size=3,
        connect_fn=_make_recording_connect(),
    )
    pages = [json.loads(p.read_text()) for p in journal.glob("page-*.json")]
    assert sorted(len(p["rows"]) for p in pages) == [1, 3, 3, 3]
    expected_sql = insert_on_conflict_sql(
        "spots", ["Spotnum", "Reporter", "dB", "MHz"]
    )
    assert all(p["sql"] == expected_sql for p in pages)
    assert all(len(r) == 4 for p in pages for r in p["rows"])
    assert len(list(journal.glob("commit-*"))) == 1  # one commit per partition


def test_gate_without_transport(spark):
    try:
        import psycopg2  # noqa: F401

        pytest.skip("psycopg2 present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        upsert_jdbc_on_conflict(_spot_df(spark, 1, 1), "dbname=nope")
