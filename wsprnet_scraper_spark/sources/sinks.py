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


def upsert_jdbc_on_conflict(
    batch_df: DataFrame,
    conninfo: str,
    insert_sql: str,
    page_size: int = 1000,
) -> None:
    """Exactly-once JDBC sink: `INSERT ... ON CONFLICT ("Spotnum") DO
    NOTHING` via psycopg2 execute_batch per partition — the upsert
    form of ts_upload_batch.py:23-52 (SURVEY.md §4.3) for use inside
    foreachBatch. Gated: raises NotImplementedError without psycopg2.
    """
    try:
        import psycopg2  # noqa: F401, PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "upsert_jdbc_on_conflict needs psycopg2; use the parquet "
            "stand-in sink (streaming.ingest) in this environment"
        ) from e

    cols = batch_df.columns

    def write_partition(rows):  # pragma: no cover - needs a database
        import psycopg2
        from psycopg2.extras import execute_batch

        conn = psycopg2.connect(conninfo)
        try:
            with conn.cursor() as cur:
                execute_batch(
                    cur,
                    insert_sql,
                    ([row[c] for c in cols] for row in rows),
                    page_size=page_size,
                )
            conn.commit()
        finally:
            conn.close()

    batch_df.rdd.foreachPartition(write_partition)  # pragma: no cover
