"""Distributed landing-file fixtures for the strm_* entries.

The three streaming entries that fabricate their own ingest slice
(strm_changepoint_monitor, strm_minhash_dedup, strm_semantic_dedup)
need the slice landed as a small, ORDERED set of NDJSON files: file i
must hold a contiguous lower range of the order column and carry an
mtime increasing with i, because Spark's file stream source drains
files in (mtime, path) order and the entries' batch-equivalence
argument ("processed earlier" == "lower id / earlier time") rests on
the cuts being contiguous in that order.

Through round 9 the fixtures built those files by collecting the
slice to the driver and writing NDJSON in a Python loop — the only
corpus-sized driver materializations in the judged surface, and at
the 100x probe scale the scaffolding dominated the probe (12.3 s of
strm_changepoint_monitor's 24.8 s). This helper lands the slice
DISTRIBUTED instead (r9 verdict task #2):

- one aggregate computes the order column's min/max (two scalars);
- each row gets a file index by contiguous value range — fid =
  (order - lo) div span, an integer expression, no global sort and
  no single-task window (the cut placement does not need to match
  the old count-median cuts: every entry's output is proven
  cut-invariant, and the 2-vs-3-file split test pins that);
- one distributed write (`partitionBy(fid).json`) produces exactly
  one part file per non-empty fid (repartition on fid puts each fid
  in exactly one task);
- the driver then only RENAMES the n_files part files into
  landing/batch-%03d.json and stamps their mtimes — O(n_files)
  metadata operations, no row ever passes through the driver.
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MTIME_BASE = 1_700_000_000


def snapshot_or_restore(state: dict, snaps: dict, bid) -> None:
    """foreachBatch at-least-once discipline for driver-held state
    (ADVICE r9): on the FIRST delivery of batch `bid`, snapshot the
    pre-batch state; on a RE-delivery (same bid), restore that
    snapshot so the retry re-applies its deltas from the same point
    instead of double-applying. Pairs with per-bid overwrite sinks
    (results/b<bid>), which make the file side of the batch
    idempotent the same way."""
    if bid in snaps:
        state.clear()
        state.update(snaps[bid])
    else:
        snaps[bid] = dict(state)


def land_ordered_ndjson(
    df: DataFrame,
    order_col: str,
    landing_dir: str,
    n_files: int,
    mtime_base: int = MTIME_BASE,
    bounds: tuple | None = None,
) -> int:
    """Land df under landing_dir as up-to-n_files NDJSON files,
    file i holding a contiguous lower range of integral `order_col`
    (ties never split across files) with mtime mtime_base+i.

    Returns the number of landing files written. An empty df lands
    one empty file so downstream availableNow streams still run one
    (empty) micro-batch — the empty-slice degradation path the r8
    advice tests pin.

    `bounds` (r14): the caller may pass the (min, max) of `order_col`
    if it already computed them — a fixture that calibrates standing
    state in the same aggregation can fold the bounds scan into that
    job and skip this one (guide §1.2: don't compute things twice).
    (None, None) means a known-empty slice.
    """
    os.makedirs(landing_dir, exist_ok=True)
    if bounds is None:
        row = df.agg(
            F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
        ).first()
        bounds = (row["lo"], row["hi"])
    if bounds[0] is None:  # empty slice
        path = f"{landing_dir}/batch-000.json"
        open(path, "w").close()
        os.utime(path, (mtime_base, mtime_base))
        return 1

    lo, hi = int(bounds[0]), int(bounds[1])
    n = max(1, int(n_files))
    span = (hi - lo) // n + 1  # ceil-ish: fid = (x-lo) div span < n
    staging = f"{landing_dir.rstrip('/')}_stage"
    (
        df.withColumn(
            "fid",
            F.expr(f"CAST((({order_col}) - ({lo})) div ({span}) AS INT)"),
        )
        .repartition(n, "fid")
        .write.partitionBy("fid")
        .mode("overwrite")
        .json(staging)
    )
    fid_dirs = sorted(
        glob.glob(f"{staging}/fid=*"),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    count = 0
    for d in fid_dirs:
        # Glob part-* with ANY suffix: a session-level compression
        # codec changes the extension, and maxRecordsPerFile can split
        # one fid's task output into several part files — concatenate
        # them in sorted (part-number) order, which preserves the
        # single task's write order within the fid.
        parts = sorted(
            p for p in glob.glob(f"{d}/part-*")
            if not p.endswith((".crc", "._SUCCESS"))
        )
        assert parts, f"no part files under {d}"
        # Refuse compressed parts LOUDLY (r11 review finding): the
        # rename strips the codec extension, and the downstream file
        # stream source infers codec by extension — moving .json.gz
        # bytes into batch-NNN.json would silently parse gzip as
        # NDJSON. The fixture contract is uncompressed NDJSON; a
        # session-level codec must fail here, not corrupt the stream.
        bad = [p for p in parts if not p.endswith(".json")]
        if bad:
            raise ValueError(
                "land_ordered_ndjson requires uncompressed .json part"
                f" files; a session-level codec produced {bad[:2]}"
            )
        # All parts must come from ONE task (ADVICE r11): lexicographic
        # part order equals row order only for a single task's
        # maxRecordsPerFile splits (c000 < c001 share the
        # part-NNNNN-uuid prefix). Parts from multiple tasks would
        # concatenate in task-id order, silently mis-ordering rows —
        # fail loudly like the pre-r11 one-part assert did.
        prefixes = {
            re.sub(r"[-.]c\d+$", "", os.path.basename(p)[: -len(".json")])
            for p in parts
        }
        if len(prefixes) != 1:  # ValueError, not assert: the guard
            # must survive python -O (r12 review) — it exists to stop
            # SILENT row mis-ordering, same class as the codec guard
            raise ValueError(
                f"fid dir {d} holds parts from {len(prefixes)} tasks; "
                "row order across tasks is undefined"
            )
        path = f"{landing_dir}/batch-{count:03d}.json"
        if len(parts) == 1:
            shutil.move(parts[0], path)
        else:
            with open(path, "wb") as out:
                for p in parts:
                    with open(p, "rb") as src:
                        shutil.copyfileobj(src, out)
        os.utime(path, (mtime_base + count, mtime_base + count))
        count += 1
    shutil.rmtree(staging, ignore_errors=True)
    return count
