"""Sinks: compressed upload queue, at-least-once mirror sweep, JDBC.

The reference's sink fabric (SURVEY.md §2.1): bzip2'd CSV into an
upload-queue directory (wsprnet-scraper.sh:126-141), an FTP mirror
that retries forever and deletes on success (:96-124), and the
batched TimescaleDB INSERT (ts_upload_batch.py:23-52). Network sinks
are expressed as injectable callables so the delivery semantics are
testable without a server; the real transports (ftplib, JDBC) sit
behind them.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame

from .. import pipeline


def write_queue_bz2(df: DataFrame, queue_dir: str) -> None:
    """Compressed queue sink: wire-format CSV, bzip2, unique names.

    Spark's task-UUID part filenames subsume the reference's
    epoch-suffix collision loop (wsprnet-scraper.sh:126-141 sleeps and
    re-stamps on name collision); compression is the same bzip2.
    """
    pipeline.to_wire(df).write.mode("append").option("compression", "bzip2").option(
        "header", False
    ).csv(queue_dir)


def sweep_upload_queue(
    queue_dir: str, upload_fn: Callable[[str], bool], suffix: str = ".csv.bz2"
) -> tuple[int, int]:
    """One at-least-once queue sweep: upload each file, delete on
    success, LEAVE on failure so the next sweep retries — exactly the
    reference's FTP mirror loop semantics (wsprnet-scraper.sh:103-123,
    10 s between sweeps, retried forever). Returns (uploaded, kept).

    `upload_fn(path) -> bool` is the transport; `ftp_uploader` builds
    the real one. Exceptions count as failure (file kept).
    """
    uploaded = kept = 0
    for path in sorted(Path(queue_dir).glob(f"*{suffix}")):
        try:
            ok = upload_fn(str(path))
        except Exception:
            ok = False
        if ok:
            path.unlink(missing_ok=True)
            uploaded += 1
        else:
            kept += 1
    return uploaded, kept


def ftp_uploader(
    host: str, user: str, password: str, remote_dir: str, timeout: int = 30
) -> Callable[[str], bool]:
    """Real FTP transport for `sweep_upload_queue` (stdlib ftplib;
    30 s timeout like the reference's `curl -m 30`,
    wsprnet-scraper.sh:112). Built lazily; connects per file so a
    wedged control connection can't poison the whole sweep."""

    def upload(path: str) -> bool:
        import ftplib  # noqa: PLC0415

        try:
            with ftplib.FTP(host, user, password, timeout=timeout) as ftp:
                ftp.cwd(remote_dir)
                with open(path, "rb") as f:
                    ftp.storbinary(f"STOR {os.path.basename(path)}", f)
            return True
        except (OSError, ftplib.all_errors):  # type: ignore[misc]
            return False

    return upload


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str = "spots",
    batchsize: int = 1000,
    coalesce_one: bool = False,
    properties: dict | None = None,
) -> None:
    """Plain JDBC append sink — the batch-INSERT path
    (ts_upload_batch.py:37's execute_batch becomes the JDBC writer's
    `batchsize`; "1.7 s vs 124 s line-by-line" is the same batching).

    `coalesce_one=True` reproduces the reference's one-transaction-
    per-file atomicity (ts_upload_batch.py:41 commits once): Spark's
    JDBC writer commits per partition, so a single partition = a
    single transaction. Leave it False at scale and rely on Spotnum
    idempotency instead.

    Needs a JDBC driver jar on the classpath; the test environment
    has none, so this function is exercised in production only — the
    delivery semantics around it (dedup, queue, retry) are what the
    tests cover.
    """
    writer = df.coalesce(1) if coalesce_one else df
    writer.write.mode("append").option("batchsize", str(batchsize)).jdbc(
        url, table, mode="append", properties=properties or {}
    )


def write_partitioned_sink(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "append"
) -> None:
    """Hive-layout parquet sink partitioned by low-cardinality
    columns (e.g. the band): directory-level partition pruning is the
    cheapest filter there is — a band-scoped query on a 100 TB spot
    archive reads only that band's directories, and the pruning
    happens at file-listing time, before any I/O.
    `tests/test_partition_pruning.py` asserts PartitionFilters (not
    PushedFilters) carry the predicate for reads through this layout.

    Low-cardinality keys only: the WSPR band dimension is ~18 values,
    so file counts stay sane; partitioning by a high-cardinality key
    (Spotnum, callsign) would explode the metadata instead.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def _quote_ident(name: str) -> str:
    """SQL-standard identifier quoting (PostgreSQL + SQLite): wrap in
    double quotes, double any embedded double quote. NUL is the one
    character neither engine accepts inside an identifier at all."""
    if "\x00" in name:
        raise ValueError(f"NUL byte in SQL identifier: {name!r}")
    return '"' + name.replace('"', '""') + '"'


def insert_on_conflict_sql(
    table: str,
    cols: list[str],
    conflict_col: str = "Spotnum",
    paramstyle: str = "format",
) -> str:
    """The idempotent insert statement, generated from the batch's
    columns — the engine-side equivalent of the reference's
    insert-spots.sql:1 (`INSERT INTO wsprnet.spots (...) VALUES (...)
    ON CONFLICT ("Spotnum") DO NOTHING`). Quoted identifiers because
    the spot columns are mixed-case on the TimescaleDB side.

    `paramstyle` follows PEP 249 module attributes: "format" (`%s`,
    psycopg2) or "qmark" (`?`, sqlite3 and most JDBC bridges) — the
    ON CONFLICT clause itself is identical in PostgreSQL ≥9.5 and
    SQLite ≥3.24, which is what lets the sqlite3 round-trip suite
    drive this exact statement through a real DBAPI engine.

    EVERY identifier — table (each dot-separated part, so schema
    qualification survives), columns, conflict column — is
    double-quoted with embedded quotes doubled. The table name used
    to be interpolated raw, which broke on names with spaces and was
    an injection vector once the spots_sqlite DataSource started
    feeding it from a user-supplied .option("table", ...) (ADVICE
    r5).

    Quoting contract (ADVICE r6): names are taken LITERALLY. A quoted
    identifier in PostgreSQL is case-SENSITIVE, so pass the exact
    stored case — `MyTable` no longer matches a table created as
    unquoted `mytable` (lower-folded). Every `.` in `table` is a
    schema separator; an identifier containing a literal dot cannot
    be expressed through this function. In-tree callers pass
    lowercase dot-qualified names, which behave identically under
    both conventions."""
    if paramstyle not in ("format", "qmark"):
        raise ValueError(f"unsupported paramstyle: {paramstyle!r}")
    marker = "%s" if paramstyle == "format" else "?"
    table_q = ".".join(_quote_ident(p) for p in table.split("."))
    col_list = ", ".join(_quote_ident(c) for c in cols)
    params = ", ".join([marker] * len(cols))
    return (
        f'INSERT INTO {table_q} ({col_list}) VALUES ({params}) '
        f'ON CONFLICT ({_quote_ident(conflict_col)}) DO NOTHING'
    )


def sqlite_connect(conninfo: str):
    """Picklable `connect_fn` for `upsert_jdbc_on_conflict` backed by
    stdlib sqlite3 — a REAL DBAPI engine (cursor/executemany/commit/
    rollback, ON CONFLICT enforced by a genuine PK index), so the
    sink's transaction logic is exercised end-to-end without a
    driver jar or server. `conninfo` is the database file path.

    timeout=30 mirrors the reference's 30 s transport ceiling
    (wsprnet-scraper.sh:112) and serializes concurrent partition
    writers on SQLite's single-writer lock instead of failing."""
    import sqlite3  # noqa: PLC0415

    return sqlite3.connect(conninfo, timeout=30)


def _psycopg2_connect(conninfo: str):  # pragma: no cover - needs a database
    import psycopg2  # noqa: PLC0415

    return psycopg2.connect(conninfo)


def upsert_jdbc_on_conflict(
    batch_df: DataFrame,
    conninfo: str,
    insert_sql: str | None = None,
    page_size: int = 1000,
    table: str = "spots",
    connect_fn: Callable | None = None,
    paramstyle: str = "format",
) -> None:
    """Exactly-once JDBC sink: `INSERT ... ON CONFLICT ("Spotnum") DO
    NOTHING` executed in pages per partition — the upsert form of
    ts_upload_batch.py:23-52 (SURVEY.md §4.3) for use inside
    foreachBatch. Replaying a batch (foreachBatch's at-least-once
    redelivery) is a no-op on the conflicting primary keys, which is
    what upgrades the pipeline to effective exactly-once.

    `connect_fn(conninfo) -> DB-API connection` is the injectable
    transport (must be picklable; it runs inside the partition task).
    The default is psycopg2 — gated: raises NotImplementedError when
    psycopg2 is absent and nothing is injected. Paging uses
    psycopg2's execute_batch when available (the reference's "1.7 s
    vs 124 s" batching, ts_upload_batch.py:37) and falls back to
    DB-API executemany per page for other transports. `paramstyle`
    flows to `insert_on_conflict_sql` so a qmark engine (sqlite3 —
    see `sqlite_connect`) runs the generated statement verbatim, no
    shim in between.
    """
    if insert_sql is None:
        insert_sql = insert_on_conflict_sql(
            table, batch_df.columns, paramstyle=paramstyle
        )
    if connect_fn is None:
        try:
            import psycopg2  # noqa: F401, PLC0415
        except ImportError as e:
            raise NotImplementedError(
                "upsert_jdbc_on_conflict needs psycopg2 (or an injected "
                "connect_fn); use the parquet stand-in sink "
                "(streaming.ingest) in this environment"
            ) from e
        connect_fn = _psycopg2_connect

    cols = batch_df.columns

    def write_partition(rows):
        try:
            from psycopg2.extras import execute_batch  # noqa: PLC0415
        except ImportError:
            execute_batch = None
        conn = connect_fn(conninfo)
        try:
            cur = conn.cursor()
            params = ([row[c] for c in cols] for row in rows)
            if execute_batch is not None:  # pragma: no cover - needs pg
                execute_batch(cur, insert_sql, params, page_size=page_size)
            else:
                page = []
                for p in params:
                    page.append(p)
                    if len(page) >= page_size:
                        cur.executemany(insert_sql, page)
                        page = []
                if page:
                    cur.executemany(insert_sql, page)
            conn.commit()
        finally:
            conn.close()

    batch_df.rdd.foreachPartition(write_partition)


def compact_dir(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ceil(bytes / target_bytes) files.

    Streaming micro-batch sinks (and over-parallel writers) leave
    thousands of KB-sized files; at 100 TB the file-listing and
    per-file open costs dominate reads long before the data does
    (NameNode/S3-LIST pressure, one scheduler task per tiny split).
    Compaction is the standard maintenance pass: read, repartition to
    the target file size, write to a staging dir, atomic swap.

    Returns {"files_before", "files_after", "bytes"}; no-op (and no
    rewrite) when the directory already has fewer than `min_files`
    files. The swap is rename-based — safe on a local/HDFS-style
    filesystem; an object store deployment would swap a table-format
    pointer (Delta/Iceberg commit) instead, same read path.
    """
    import math
    import shutil

    p = Path(path)
    files = [f for f in p.rglob("*.parquet") if f.is_file()]
    total = sum(f.stat().st_size for f in files)
    if len(files) < min_files:
        return {
            "files_before": len(files),
            "files_after": len(files),
            "bytes": total,
        }
    n_out = max(1, math.ceil(total / target_bytes))
    staging = str(p) + "__compact_staging"
    df = spark.read.parquet(str(p))
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    old = str(p) + "__compact_old"
    shutil.move(str(p), old)
    shutil.move(staging, str(p))
    shutil.rmtree(old)
    after = len([f for f in p.rglob("*.parquet") if f.is_file()])
    return {"files_before": len(files), "files_after": after, "bytes": total}


def _morton_interleave(col_a, col_b, bits: int = 16):
    """Morton (Z-order) code of two non-negative ints as a Catalyst
    expression: bit-interleave so files cluster on BOTH keys at
    once."""
    from pyspark.sql import functions as F

    one = F.lit(1).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftrightunsigned(col_a.cast("bigint"), i).bitwiseAND(one)
        bit_b = F.shiftrightunsigned(col_b.cast("bigint"), i).bitwiseAND(one)
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def write_clustered(
    df: DataFrame,
    path: str,
    key_a: str,
    key_b: str,
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: rows are range-partitioned
    and sorted by the Morton interleave of two keys, so each output
    file covers a small rectangle of (key_a, key_b) space and
    parquet's per-file/rowgroup min-max stats prune reads filtered
    on EITHER key — the poor man's Delta OPTIMIZE ZORDER, built from
    repartitionByRange + sortWithinPartitions.

    Directory partitioning (write_partitioned_sink) handles one
    low-cardinality key; Z-ordering is the tool when queries slice
    two higher-cardinality dimensions (e.g. time × frequency over a
    100 TB spot archive)."""
    from pyspark.sql import functions as F  # noqa: F401

    z = _morton_interleave(df[key_a], df[key_b], bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def delete_keys(
    spark,
    path: str,
    key_col: str,
    keys_df: DataFrame,
) -> dict:
    """Right-to-be-forgotten delete: rewrite a parquet directory
    without the rows whose `key_col` appears in `keys_df` (a
    one-column DataFrame of keys), via broadcast anti-join + atomic
    rename swap.

    This is the immutable-storage deletion pattern: parquet files
    can't be edited in place, so deletion is a filtered rewrite —
    on a table format (Delta/Iceberg) the same anti-join feeds a
    commit instead of a rename. The key set is broadcast (deletion
    requests are tiny vs a 100 TB table), so the rewrite is one scan
    with no shuffle. Returns {"rows_before", "rows_deleted",
    "rows_after"}.
    """
    import shutil

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    before = df.count()
    kept = df.join(
        F.broadcast(keys_df.select(F.col(keys_df.columns[0]).alias(key_col))),
        key_col,
        "left_anti",
    )
    staging = path + "__delete_staging"
    kept.write.mode("overwrite").parquet(staging)
    old = path + "__delete_old"
    shutil.move(path, old)
    shutil.move(staging, path)
    shutil.rmtree(old)
    after = spark.read.parquet(path).count()
    return {
        "rows_before": before,
        "rows_deleted": before - after,
        "rows_after": after,
    }
