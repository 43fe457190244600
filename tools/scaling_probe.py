#!/usr/bin/env python3
"""One-off scaling evidence: synthesize a ~10x corpus from sf0.1
(≈ sf1) and time the bench headline queries against it.

Usage: python tools/scaling_probe.py [--base /root/testdata/sf0.1]

The synthetic corpus is 10 id-offset copies of the FACT tables
(lineitem/orders with consistent orderkey offsets, events, documents,
embeddings), with dimensions kept single-copy — scaling facts under
fixed dims is what a real 10x looks like. Content is decorrelated per
copy so near-dup/ANN queries keep their real complexity class instead
of degenerating into all-copies-collide:

- documents.text goes through a per-copy letter rotation (translate),
  so shingle/minhash/simhash universes are disjoint across copies;
- embeddings get a small per-copy, per-dimension deterministic shift,
  so LSH buckets and IVF cells spread instead of stacking 10 deep.

Prints per-query seconds at the base and 10x SFs and the slope;
results are recorded in SCALE.md §"Measured scaling".
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

COPIES = 10
OFFSET = 10_000_000_000  # multiple of 10: doc_id%10 sampling unchanged
FACTS = ["lineitem", "orders", "events", "documents", "embeddings"]
DIMS = ["region", "nation", "customer", "supplier", "part"]
ALPHA = "abcdefghij"

# Which columns get the per-copy id offset. Module-level so probe
# variants can extend it — the graph-growth probe (probe_100x.py)
# additionally offsets o_custkey/l_suppkey so each copy is a DISJOINT
# subgraph and the node set actually grows with the data (r4 verdict
# #9: facts-under-fixed-dims growth never grew the graph).
ID_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def synth_10x(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    outp = Path(out)
    if outp.exists():
        shutil.rmtree(outp)
    outp.mkdir(parents=True)
    for t in DIMS:
        shutil.copy(f"{base}/{t}.parquet", outp / f"{t}.parquet")
    id_cols = ID_COLS
    for t in FACTS:
        df = spark.read.parquet(f"{base}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = df
            for col in id_cols[t]:
                c = c.withColumn(col, F.col(col) + F.lit(i * OFFSET))
            if t == "documents" and i > 0:
                rot = ALPHA[i:] + ALPHA[:i]
                c = c.withColumn("text", F.translate("text", ALPHA, rot))
            if t == "embeddings" and i > 0:
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> cast(x + "
                        f"0.011 * (((j + 3) * {i}) % 7 - 3) as float))"
                    ),
                )
            parts.append(c)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(str(outp / f"{t}.parquet"))
        # id-disjointness guard: every copy's key space must be
        # disjoint, i.e. distinct(id) grows exactly COPIES-fold
        # (stated against the BASE distinct count because some keys —
        # l_orderkey — are legitimately non-unique within a copy).
        # The round-4 100x corpus violated this silently (composing
        # the synth reused the same offset, colliding ids across
        # copies) and cost a debugging session; fail loudly instead.
        out_df = spark.read.parquet(str(outp / f"{t}.parquet"))
        for col in id_cols[t]:
            base_d = df.select(col).distinct().count()
            out_d = out_df.select(col).distinct().count()
            assert out_d == COPIES * base_d, (
                f"{t}.{col}: id collision across copies "
                f"({out_d} distinct, expected {COPIES} x {base_d} — "
                f"is OFFSET smaller than the input id span?)"
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/wspr_sf1_probe")
    args = ap.parse_args()

    from bench import HEADLINE
    from wsprnet_scraper_spark.plans import QUERIES
    from wsprnet_scraper_spark.session import get_session

    spark = get_session("scaling-probe")
    print("synthesizing 10x corpus ...", file=sys.stderr)
    synth_10x(spark, args.base, args.out)

    def run(name: str, at: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, at).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        run(name, args.base)  # warm plan shape
        base_t = min(run(name, args.base), run(name, args.base))
        big_t = min(run(name, args.out), run(name, args.out))
        results[name] = {
            "sf0.1_sec": round(base_t, 3),
            "x10_sec": round(big_t, 3),
            "slope": round(big_t / base_t, 2) if base_t > 0 else None,
        }
        print(name, results[name], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
