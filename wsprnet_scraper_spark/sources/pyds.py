"""Custom Python DataSource (Spark 4 DataSource API) for the bz2
spot-queue format.

The upload queue (sinks.write_queue_bz2 ↔ wsprnet-scraper.sh's
curl/FTP mirror loop) holds wire-format CSV — 27 columns, no header,
bzip2 — which no built-in reader exposes as a *named format*. This
registers `wspr_queue` so a consumer writes simply:

    spark.dataSource.register(WsprQueueDataSource)
    spark.read.format("wspr_queue").load("/path/to/queue")

Partitioning: one InputPartition per file. bzip2 is not splittable,
so file granularity IS the maximum parallelism for this format; at
scale the queue naturally contains many micro-batch files, so tasks
still fan out across executors. Rows are emitted as the 27 wire
strings (the wire is text; typed parsing is the downstream
pipeline's job, same contract as parse_csv) with the same
arity-filter semantics (short/long rows dropped, mirroring
genfromtxt-loose — wsprnet-scraper.sh feeds the same CSV shape).

Executor note: this class is importable from the installed package
(get_session ships the package to workers via PYTHONPATH), which is
what the DataSource API requires — cloudpickle serializes the reader
by reference to this module.
"""

from __future__ import annotations

import bz2
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schema import SINK_COLUMNS


class _QueueFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WsprQueueReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("wspr_queue requires a path")
        self.suffix = options.get("suffix", ".csv.bz2")

    def partitions(self):
        files = sorted(
            str(p)
            for p in Path(self.dir).glob(f"*{self.suffix}")
            if p.is_file()
        )
        # empty queue -> one empty partition (Spark requires >= 1)
        return [_QueueFilePartition(f) for f in files] or [
            _QueueFilePartition("")
        ]

    def read(self, partition):
        if not partition.path:
            return
        n = len(SINK_COLUMNS)
        with bz2.open(partition.path, "rt", encoding="utf-8") as fh:
            for line in fh:
                parts = line.rstrip("\n").split(",")
                if len(parts) == n:
                    yield tuple(parts)


class WsprQueueDataSource(DataSource):
    """`spark.read.format("wspr_queue")` — see module docstring."""

    @classmethod
    def name(cls):
        return "wspr_queue"

    def schema(self):
        return ", ".join(f"`{c}` string" for c in SINK_COLUMNS)

    def reader(self, schema):
        return WsprQueueReader(self.options)

    def simpleStreamReader(self, schema):
        return WsprQueueSimpleStreamReader(self.options)


class WsprQueueSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming reader for the queue (Spark 4
    SimpleDataSourceStreamReader): each batch drains the files not
    yet seen, and the offset is the sorted manifest of consumed
    filenames — exactly the reference daemon's "process what's new in
    the queue dir each tick" loop, but with Spark-owned offsets, so a
    restarted query resumes from the checkpoint instead of a
    hand-rolled cursor file.

    `readBetweenOffsets` replays the set difference of two manifests,
    which is what makes a batch reconstructible after failure
    (exactly the contract checkpoint recovery needs). The manifest
    offset grows with total file count — fine for a queue that is
    swept (files deleted after upload); an unswept archive should use
    the built-in file stream source (streaming/ingest.py) instead.
    """

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("wspr_queue requires a path")
        self.suffix = options.get("suffix", ".csv.bz2")

    def _list(self):
        return sorted(
            p.name
            for p in Path(self.dir).glob(f"*{self.suffix}")
            if p.is_file()
        )

    def _rows(self, names):
        n = len(SINK_COLUMNS)
        for name in names:
            with bz2.open(
                Path(self.dir) / name, "rt", encoding="utf-8"
            ) as fh:
                for line in fh:
                    parts = line.rstrip("\n").split(",")
                    if len(parts) == n:
                        yield tuple(parts)

    def initialOffset(self):
        return {"seen": "[]"}

    def read(self, start):
        import json

        seen = set(json.loads(start["seen"]))
        now = self._list()
        new = [f for f in now if f not in seen]
        end = {"seen": json.dumps(sorted(seen | set(new)))}
        # iter(list): the prefetch cache copy.copy()s this iterator
        # (generators can't be copied) and next()s it on the
        # empty-batch path (bare lists can't be next()ed)
        return iter(list(self._rows(new))), end

    def readBetweenOffsets(self, start, end):
        import json

        a = set(json.loads(start["seen"]))
        b = set(json.loads(end["seen"]))
        return iter(list(self._rows(sorted(b - a))))

    def commit(self, end):
        # files are deleted by the upload sweep, not the reader —
        # at-least-once delivery stays the sweep's contract
        pass
