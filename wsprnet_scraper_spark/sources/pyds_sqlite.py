"""Custom Python DataSource WRITER (Spark 4 DataSource API): the
idempotent spot-upsert sink as a named format.

`upsert_jdbc_on_conflict` (sources/sinks.py) exposes the reference's
terminal stage (ts_upload_batch.py:23-52 + insert-spots.sql:1-3) as a
foreachBatch helper; this module exposes the SAME statement through
Spark's own sink API, so a consumer writes idiomatically:

    spark.dataSource.register(SpotsSqliteDataSource)
    df.write.format("spots_sqlite").mode("append") \\
        .option("path", "/data/spots.db").save()
    # or, streaming:
    stream.writeStream.format("spots_sqlite") \\
        .option("path", "/data/spots.db") \\
        .option("checkpointLocation", ckpt).start()

Delivery contract — identical to the foreachBatch form: each
partition task executes `INSERT ... ON CONFLICT ("<pk>") DO NOTHING`
pages on its own connection and commits once (partition-atomic; a
failing page rolls the whole task back, and Spark's task retry
replays it). Across retries/redeliveries the PK makes the sink
effectively exactly-once. `commit()`/`abort()` are bookkeeping only:
partition transactions are already durable, which is exactly the
semantics the reference's per-file commit + Spotnum PK has.

The engine is stdlib sqlite3 (file path in `path`) — a real DBAPI
engine with a real PK index; swapping `_connect` for a server DBAPI
(psycopg2) changes one function, not the plan. Single-file SQLite is
a single-node sink by nature (the reference's TimescaleDB is
localhost too, wsprnet-scraper.sh); concurrent partition writers
serialize on the 30 s busy-timeout.

Executor note: like pyds.py, this module must be importable on
workers (get_session ships the package via PYTHONPATH); cloudpickle
serializes the writer by reference.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

from .sinks import insert_on_conflict_sql, sqlite_connect


class SpotsCommit(WriterCommitMessage):
    def __init__(self, rows: int):
        self.rows = rows


class _UpsertWriterCore:
    """Shared per-partition upsert: pages + one commit per task."""

    def __init__(self, options, schema):
        self.db = options.get("path")
        if not self.db:
            raise ValueError("spots_sqlite requires option 'path' (db file)")
        self.table = options.get("table", "spots")
        self.conflict = options.get("conflict", "Spotnum")
        self.page_size = int(options.get("page_size", "1000"))
        self.cols = [f.name for f in schema.fields]
        self.sql = insert_on_conflict_sql(
            self.table, self.cols, conflict_col=self.conflict,
            paramstyle="qmark",
        )

    def write_rows(self, iterator):
        conn = sqlite_connect(self.db)
        n = 0
        try:
            cur = conn.cursor()
            page = []
            for row in iterator:
                page.append([row[c] for c in self.cols])
                if len(page) >= self.page_size:
                    cur.executemany(self.sql, page)
                    n += len(page)
                    page = []
            if page:
                cur.executemany(self.sql, page)
                n += len(page)
            conn.commit()
        finally:
            conn.close()  # close without commit = rollback on failure
        return SpotsCommit(n)


class SpotsSqliteWriter(DataSourceWriter):
    def __init__(self, options, schema):
        self._core = _UpsertWriterCore(options, schema)

    def write(self, iterator):
        return self._core.write_rows(iterator)

    def commit(self, messages):
        # partition transactions already committed; PK absorbs replays
        return None

    def abort(self, messages):
        # committed partitions stay (at-least-once); the PK makes the
        # inevitable retry a no-op on them — same recovery story as
        # the reference's cursor-hold crash path (wsprnet-scraper.sh:341)
        return None


class SpotsSqliteStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema):
        self._core = _UpsertWriterCore(options, schema)

    def write(self, iterator):
        return self._core.write_rows(iterator)

    def commit(self, messages, batchId):  # noqa: N803 - API name
        return None

    def abort(self, messages, batchId):  # noqa: N803 - API name
        return None


class SpotsSqliteDataSource(DataSource):
    """`df.write.format("spots_sqlite")` — see module docstring."""

    @classmethod
    def name(cls):
        return "spots_sqlite"

    def schema(self):
        # write-only source: schema comes from the written DataFrame
        return "`Spotnum` long"

    def writer(self, schema, overwrite):
        if overwrite:
            raise ValueError(
                "spots_sqlite is append-only (ON CONFLICT DO NOTHING); "
                "use mode('append')"
            )
        return SpotsSqliteWriter(self.options, schema)

    def streamWriter(self, schema, overwrite):  # noqa: N802 - API name
        return SpotsSqliteStreamWriter(self.options, schema)
