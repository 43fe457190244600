"""Real-database round-trip for the JDBC/upsert sink (r4 verdict #2).

The prior suite (tests/test_upsert_jdbc.py) proved the delivery
semantics through wrapper shims; this one removes the shim entirely:
`upsert_jdbc_on_conflict(..., connect_fn=sqlite_connect,
paramstyle="qmark")` hands the partition task a RAW stdlib sqlite3
connection — the real cursor/executemany/commit/rollback code path,
the generated `INSERT ... ON CONFLICT ("Spotnum") DO NOTHING`
executed verbatim by a genuine SQL engine with a genuine PK index
(SQLite ≥3.24 shares PostgreSQL's upsert clause; reference:
ts_upload_batch.py:23-52, insert-spots.sql:1-3).

Covered: rows land and are queryable; replay + overlap idempotence on
the PK; page boundaries; transaction atomicity (a failing page rolls
back the WHOLE partition — commit only happens at the end); the
foreachBatch mirror fan-out ending in a queryable DB after a full
redelivery; and concurrent multi-partition writers serializing on
SQLite's single-writer lock instead of corrupting or failing.
"""

from __future__ import annotations

import sqlite3

import pytest

from wsprnet_scraper_spark.sources.sinks import (
    insert_on_conflict_sql,
    sqlite_connect,
    upsert_jdbc_on_conflict,
)

DDL = (
    'CREATE TABLE spots ("Spotnum" INTEGER PRIMARY KEY, '
    '"Reporter" TEXT, "dB" INTEGER NOT NULL, "MHz" REAL)'
)


def _mkdb(tmp_path) -> str:
    db = str(tmp_path / "spots.db")
    with sqlite3.connect(db) as conn:
        conn.execute(DDL)
    return db


def _spot_rows(start, n):
    return [
        (start + i, f"R{(start + i) % 7}", (start + i) % 40 - 25, 14.097123)
        for i in range(n)
    ]


def _spot_df(spark, start, n):
    return spark.createDataFrame(
        _spot_rows(start, n), "Spotnum long, Reporter string, dB long, MHz double"
    )


def _all(db):
    with sqlite3.connect(db) as conn:
        return sorted(conn.execute("SELECT * FROM spots").fetchall())


def test_qmark_sql_generation():
    sql = insert_on_conflict_sql(
        "spots", ["Spotnum", "Reporter"], paramstyle="qmark"
    )
    assert sql == (
        'INSERT INTO "spots" ("Spotnum", "Reporter") VALUES (?, ?) '
        'ON CONFLICT ("Spotnum") DO NOTHING'
    )
    with pytest.raises(ValueError):
        insert_on_conflict_sql("spots", ["a"], paramstyle="named")


def test_identifiers_are_quoted_and_escaped():
    # ADVICE r5: table names with spaces/quotes must survive (and the
    # untrusted .option("table", ...) path must not be an injection
    # vector). Each dot part of a qualified name quotes separately.
    sql = insert_on_conflict_sql(
        'my sch.we"ird', ['a"b'], conflict_col='a"b', paramstyle="qmark"
    )
    assert sql == (
        'INSERT INTO "my sch"."we""ird" ("a""b") VALUES (?) '
        'ON CONFLICT ("a""b") DO NOTHING'
    )
    with pytest.raises(ValueError):
        insert_on_conflict_sql("sp\x00ots", ["a"], paramstyle="qmark")


def test_raw_sqlite_upsert_replay_and_overlap(spark, tmp_path):
    db = _mkdb(tmp_path)
    batch = _spot_df(spark, 1000, 10).coalesce(1)
    kw = dict(connect_fn=sqlite_connect, paramstyle="qmark")
    upsert_jdbc_on_conflict(batch, db, **kw)
    assert _all(db) == sorted(_spot_rows(1000, 10))  # queryable, typed
    # exact replay (foreachBatch redelivery) is a no-op
    upsert_jdbc_on_conflict(batch, db, **kw)
    # overlapping batch: 5 dupes + 5 new
    upsert_jdbc_on_conflict(_spot_df(spark, 1005, 10).coalesce(1), db, **kw)
    assert _all(db) == sorted(_spot_rows(1000, 15))


def test_paging_crosses_page_boundaries(spark, tmp_path):
    db = _mkdb(tmp_path)
    upsert_jdbc_on_conflict(
        _spot_df(spark, 1, 25).coalesce(1),
        db,
        page_size=7,  # 7+7+7+4
        connect_fn=sqlite_connect,
        paramstyle="qmark",
    )
    assert _all(db) == sorted(_spot_rows(1, 25))


def test_failed_page_rolls_back_whole_partition(spark, tmp_path):
    """Atomicity: commit happens once per partition, AFTER all pages.
    A NOT NULL violation in the SECOND page must abort the task and
    roll back the already-executed first page — the single-transaction
    semantics of the reference's per-file commit
    (ts_upload_batch.py:41)."""
    db = _mkdb(tmp_path)
    rows = _spot_rows(1, 6) + [(7, "R0", None, 14.097123)] + _spot_rows(8, 2)
    bad = spark.createDataFrame(
        rows, "Spotnum long, Reporter string, dB long, MHz double"
    ).coalesce(1)
    with pytest.raises(Exception, match="(?i)not null|IntegrityError"):
        upsert_jdbc_on_conflict(
            bad, db, page_size=5, connect_fn=sqlite_connect, paramstyle="qmark"
        )
    assert _all(db) == []  # page 1 (5 good rows) was NOT committed
    # the retry with the row fixed lands everything exactly once
    fixed = _spot_df(spark, 1, 8).coalesce(1)
    upsert_jdbc_on_conflict(
        fixed, db, page_size=5, connect_fn=sqlite_connect, paramstyle="qmark"
    )
    assert _all(db) == sorted(_spot_rows(1, 8))


def test_concurrent_partitions_serialize_on_writer_lock(spark, tmp_path):
    """4 partition tasks writing the same DB file concurrently: the
    30 s busy-timeout in sqlite_connect serializes them on SQLite's
    single-writer lock; every row lands exactly once."""
    db = _mkdb(tmp_path)
    upsert_jdbc_on_conflict(
        _spot_df(spark, 1, 200).repartition(4),
        db,
        page_size=50,
        connect_fn=sqlite_connect,
        paramstyle="qmark",
    )
    assert _all(db) == sorted(_spot_rows(1, 200))


def test_foreachbatch_mirror_redelivery_ends_in_queryable_db(spark, tmp_path):
    """End-to-end: the streaming ingest's second-sink fan-out
    (streaming/ingest.py mirror_fn) upserts each deduped micro-batch
    into sqlite through the real connection; then the ENTIRE stream is
    redelivered (fresh checkpoint over the same landing dir — the
    at-least-once worst case) and the PK upsert absorbs it: the DB
    holds each Spotnum exactly once and is queryable with SQL."""
    from wsprnet_scraper_spark.streaming.fetcher import Cursor, fetch_once
    from wsprnet_scraper_spark.streaming.ingest import start_ingest
    from tests.test_streaming_ingest import make_spot

    landing = tmp_path / "landing"
    cursor = Cursor(tmp_path / "cursor.json")
    fetch_once(lambda s: [make_spot(n) for n in range(1, 9)], cursor, landing)

    db = str(tmp_path / "spots.db")
    with sqlite3.connect(db) as conn:
        conn.execute('CREATE TABLE spots ("Spotnum" INTEGER PRIMARY KEY)')

    def mirror(batch_df, batch_id):
        upsert_jdbc_on_conflict(
            batch_df.select("Spotnum"),
            db,
            connect_fn=sqlite_connect,
            paramstyle="qmark",
        )

    # separate parquet sinks per run so the stand-in's anti-join can't
    # pre-dedup the replay — the FULL duplicate stream must reach the
    # sqlite mirror, where only the PK upsert stands between the
    # redelivery and double-counting
    for attempt in ("1", "2"):
        q = start_ingest(
            spark,
            str(landing),
            str(tmp_path / f"sink{attempt}"),
            str(tmp_path / f"ckpt{attempt}"),
            mirror_fn=mirror,
        )
        q.awaitTermination()

    with sqlite3.connect(db) as conn:
        got = [r[0] for r in conn.execute(
            'SELECT "Spotnum" FROM spots ORDER BY "Spotnum"'
        )]
        n_total = conn.execute("SELECT COUNT(*) FROM spots").fetchone()[0]
    assert got == list(range(1, 9))
    assert n_total == 8
