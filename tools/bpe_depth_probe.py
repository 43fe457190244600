#!/usr/bin/env python3
"""BPE merge-table DEPTH measurement (VERDICT r11 task #1;
r13 extends the axis one decade to 10k merges, VERDICT r12 task #2 —
the real-tokenizer regime).

The judged `pipe_bpe_encode*` entries run the 10-merge setting, and
the sf0.1 corpus's vocabulary exhausts at 89 merges — so the claim
"the chain form's cost grows with merge count; the joined form's
serve path is depth-independent" was extrapolated, never measured.
This probe measures it on a SYNTHETIC wide-alphabet corpus
(64-symbol alphabet, 3000 distinct 16-char tokens, zipf-weighted —
deterministic seed) that supports >=1000 learnable merges:

  - train 1000 merges once (`_bpe_train_merges`, lineage-truncated
    loop) and record total + marginal per-round cost — the
    linear-in-rounds claim, measured to 1000;
  - at depth d in {10, 100, 1000}: time the CHAIN form (one Column
    expression with d nested replace()s — build cost = d py4j calls
    + a d-deep codegen tree, exec cost = d corpus-wide scans fused
    in one projection) against the JOINED form (vocab merged
    iteratively once per depth, then a depth-independent
    explode + join + reassemble serve), cross-checking that both
    forms return identical (n_symbols, md5) aggregates.

Writes tools/bpe_depth_r13.json (resume: existing keys are kept).
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEPTHS = [10, 100, 1000, 10000]
SEED = 20260816
ALPHABET = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789.,"
)
N_TOKENS = 3000
TOKEN_LEN = 16
N_DOCS = 20000
DOC_TOKENS = 12


def synth_docs(spark):
    rng = random.Random(SEED)
    tokens = [
        "".join(rng.choice(ALPHABET) for _ in range(TOKEN_LEN))
        for _ in range(N_TOKENS)
    ]
    # zipf-ish sampling: weight 1/(rank+1) so early merges have clear
    # frequency winners (a uniform corpus ties everywhere and the
    # lexicographic tie-break dominates — legal but unrepresentative)
    weights = [1.0 / (i + 1) for i in range(N_TOKENS)]
    rows = [
        (i, " ".join(rng.choices(tokens, weights=weights, k=DOC_TOKENS)))
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").repartition(
        32
    ).localCheckpoint(eager=True)


def main() -> None:
    from pyspark.sql import functions as F

    from wsprnet_scraper_spark.plans.llmops import (
        _BPE_SYM_RE,
        _bpe_encode_vocab,
        _bpe_train_merges,
    )
    from wsprnet_scraper_spark.session import get_session

    out_path = Path(__file__).resolve().parent / "bpe_depth_r13.json"
    results = json.loads(out_path.read_text()) if out_path.is_file() else {}

    if all(f"depth_{dd}" in results for dd in DEPTHS) and any(
        k.startswith("train_") for k in results
    ):
        print("all depth keys present — nothing to do", file=sys.stderr)
        return

    spark = get_session("bpe-depth-probe")
    d = synth_docs(spark)
    SL, SR = "\x1e", "\x1f"

    print("training 1000 merges ...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    merges = _bpe_train_merges(d, rounds=DEPTHS[-1], checkpoint_every=8)
    train_sec = time.perf_counter() - t0
    if len(merges) < DEPTHS[-1]:
        raise SystemExit(
            f"fixture exhausted at {len(merges)} merges — widen the corpus"
        )
    results[f"train_{DEPTHS[-1]}"] = {
        "total_sec": round(train_sec, 2),
        "per_round_sec": round(train_sec / len(merges), 4),
        "rounds": len(merges),
    }
    print(f"train_{DEPTHS[-1]}", results[f"train_{DEPTHS[-1]}"], file=sys.stderr, flush=True)
    out_path.write_text(json.dumps(results, indent=1) + "\n")

    def finish(enc_df):
        # one cross-checkable scalar pair per form: total symbols +
        # xor-free md5 aggregate (sum of first 8 hex digits as int)
        return enc_df.agg(
            F.sum("n_symbols").alias("s"),
            F.sum(
                F.conv(F.substring("encoded_md5", 1, 8), 16, 10).cast("bigint")
            ).alias("h"),
        ).first()

    for depth in DEPTHS:
        key = f"depth_{depth}"
        if key in results:
            continue
        sub = merges[:depth]

        # ---- chain form: d-deep Column expression ----
        chain_err, chain_exec, chain_check = None, None, None
        t0 = time.perf_counter()
        try:
            enc = F.regexp_replace("text", "(?s)(.)", f"{SL}$1{SR}")
            for _, a, b, _, _ in sub:
                enc = F.replace(
                    enc,
                    F.lit(f"{SL}{a}{SR}{SL}{b}{SR}"),
                    F.lit(f"{SL}{a}{b}{SR}"),
                )
            chain_df = d.select(
                "doc_id",
                F.size(F.regexp_extract_all(enc, F.lit(_BPE_SYM_RE), 1))
                .cast("bigint")
                .alias("n_symbols"),
                F.md5(enc).alias("encoded_md5"),
            )
            chain_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            chain_check = finish(chain_df)
            chain_exec = time.perf_counter() - t0
        except Exception as e:
            # plan-build/analyzer/codegen depth limits ARE the
            # finding this probe exists to measure (the 1000-merge
            # chain dies in ColumnNode->Expression conversion with a
            # JVM StackOverflowError before any data is touched)
            chain_build = time.perf_counter() - t0
            chain_err = f"{type(e).__name__}: {str(e)[:160]}"

        # ---- joined form: vocab merge (standing build) + serve ----
        t0 = time.perf_counter()
        vocab = _bpe_encode_vocab(d, sub)
        joined_build = time.perf_counter() - t0
        parts = d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
        )
        joined_df = (
            parts.join(vocab, "tok")
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "enc"))),
                        lambda s: s["enc"],
                    ),
                    f"{SL} {SR}",
                ).alias("enc")
            )
            .select(
                "doc_id",
                F.size(F.regexp_extract_all("enc", F.lit(_BPE_SYM_RE), 1))
                .cast("bigint")
                .alias("n_symbols"),
                F.md5("enc").alias("encoded_md5"),
            )
        )
        t0 = time.perf_counter()
        joined_check = finish(joined_df)
        joined_serve = time.perf_counter() - t0
        joined_serve = min(joined_serve, _timed(finish, joined_df))

        if chain_check is not None:
            assert tuple(chain_check) == tuple(joined_check), (
                depth,
                chain_check,
                joined_check,
            )
        results[key] = {
            "chain_build_sec": round(chain_build, 2),
            "chain_exec_sec": round(chain_exec, 2) if chain_exec else None,
            "chain_error": chain_err,
            "joined_vocab_build_sec": round(joined_build, 2),
            "joined_serve_sec": round(joined_serve, 2),
            "forms_identical": chain_check is not None
            and tuple(chain_check) == tuple(joined_check),
        }
        print(key, results[key], file=sys.stderr, flush=True)
        out_path.write_text(json.dumps(results, indent=1) + "\n")

    spark.stop()


def _timed(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
