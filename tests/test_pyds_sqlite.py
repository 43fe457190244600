"""spots_sqlite Python DataSource writer: batch + streaming upsert.

The foreachBatch form (test_jdbc_sqlite_roundtrip) proves the
statement; this suite proves the same delivery contract through
Spark's OWN sink API — `df.write.format("spots_sqlite")` and
`writeStream.format("spots_sqlite")` — including replay idempotence
and a full stream redelivery, with the DB queryable afterward.
"""

from __future__ import annotations

import sqlite3

import pytest

from wsprnet_scraper_spark.sources.pyds_sqlite import SpotsSqliteDataSource


def _mkdb(tmp_path, name="spots.db"):
    db = str(tmp_path / name)
    with sqlite3.connect(db) as conn:
        conn.execute(
            'CREATE TABLE spots ("Spotnum" INTEGER PRIMARY KEY, '
            '"Reporter" TEXT, "dB" INTEGER)'
        )
    return db


def _rows(start, n):
    return [(start + i, f"R{(start + i) % 5}", (start + i) % 30 - 20)
            for i in range(n)]


def _df(spark, start, n):
    return spark.createDataFrame(
        _rows(start, n), "Spotnum long, Reporter string, dB long"
    )


def _all(db):
    with sqlite3.connect(db) as conn:
        return sorted(conn.execute("SELECT * FROM spots").fetchall())


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SpotsSqliteDataSource)


def test_batch_write_and_replay_idempotence(spark, tmp_path):
    db = _mkdb(tmp_path)
    w = lambda df: (  # noqa: E731
        df.write.format("spots_sqlite").mode("append")
        .option("path", db).save()
    )
    w(_df(spark, 100, 40).repartition(4))
    assert _all(db) == sorted(_rows(100, 40))
    w(_df(spark, 100, 40).repartition(4))        # exact replay
    w(_df(spark, 120, 40).repartition(3))        # 20 dupes + 20 new
    assert _all(db) == sorted(_rows(100, 60))


def test_overwrite_mode_rejected(spark, tmp_path):
    db = _mkdb(tmp_path)
    with pytest.raises(Exception, match="append-only"):
        _df(spark, 1, 3).write.format("spots_sqlite").mode(
            "overwrite"
        ).option("path", db).save()


def test_paging_option(spark, tmp_path):
    db = _mkdb(tmp_path)
    (_df(spark, 1, 23).coalesce(1).write.format("spots_sqlite")
     .mode("append").option("path", db).option("page_size", "7").save())
    assert _all(db) == sorted(_rows(1, 23))


def test_stream_writer_redelivery_exactly_once(spark, tmp_path):
    """writeStream.format('spots_sqlite'): land NDJSON batches, run
    the stream to completion, then REDELIVER the whole stream from a
    fresh checkpoint — the DB must hold each Spotnum exactly once."""
    import json

    db = _mkdb(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    for b in range(3):
        with open(src / f"b{b}.json", "w") as f:
            for s, r, d in _rows(1 + 10 * b, 10):
                f.write(json.dumps(
                    {"Spotnum": s, "Reporter": r, "dB": d}) + "\n")

    def run(ckpt):
        stream = (
            spark.readStream.schema("Spotnum long, Reporter string, dB long")
            .json(str(src))
        )
        q = (
            stream.writeStream.format("spots_sqlite")
            .option("path", db)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ckpt1")
    assert _all(db) == sorted(_rows(1, 30))
    run("ckpt2")  # full redelivery
    assert _all(db) == sorted(_rows(1, 30))
