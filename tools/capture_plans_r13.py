#!/usr/bin/env python3
"""Capture .explain('formatted') for the r13 optimization targets.

Usage: python tools/capture_plans_r13.py <suffix> [name ...]
Writes plans/r13/<name>_<suffix>.txt for each target (default list below).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT = [
    "graph_triangles", "graph_clustering_coeff", "strm_stream_join",
    "dedup_cluster", "pipe_dedup_e2e", "strm_minhash_dedup", "graph_cc",
    "pipe_dedup_survivors", "strm_semantic_dedup", "dedup_minhash_cluster",
    "dedup_minhash_cluster_incremental", "strm_dedup_watermark",
    "dedup_editdist", "agg_approx_sketches", "strm_changepoint_monitor",
    "evt_rfm_segments", "graph_hits_bucketed", "pipe_bpe_vocab",
    "pipe_bpe_train", "pipe_dedup_cascade", "agg_weighted_median_blocked",
    "pipe_semdedup_e2e", "text_collocation_lift", "dedup_minhash_estimate",
    "win_rolling_median", "graph_cc_incremental", "sim_ivfpq",
    "graph_pagerank_bucketed", "graph_hits", "evt_markov_stationary",
    "evt_lift_pairs", "pipe_bloom_decontam", "sim_hard_negatives",
]


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT

    from wsprnet_scraper_spark.plans import QUERIES
    from wsprnet_scraper_spark.session import get_session

    spark = get_session("plan-capture")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    sf = "/root/testdata/sf0.1"
    for name in names:
        dest = out_dir / f"{name}_{suffix}.txt"
        if dest.exists():
            print(f"{name}: skip (exists)")
            continue
        try:
            t0 = time.time()
            df = QUERIES[name](spark, sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            dest.write_text(plan)
            print(f"{name}: ok ({time.time() - t0:.1f}s build)")
        except Exception as e:
            print(f"{name}: ERR {e}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
