"""Plan/semantics tests for emb_centroid and pipe_pack."""

from __future__ import annotations

import re

from wsprnet_scraper_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_centroid_single_pass_pruned(spark):
    df = QUERIES["emb_centroid"](spark, SF)
    plan = _plan(df)
    assert plan.count("FileScan") == 1, plan
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    # vec_id must be pruned — only label + embedding are read
    assert "vec_id" not in scan.split("ReadSchema:")[1], scan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_centroid_exactness_invariant(spark):
    # sum_q / (1000 * n) must reproduce the centroid column exactly —
    # the single-division contract the oracle relies on
    for r in QUERIES["emb_centroid"](spark, SF).collect():
        assert r.centroid == r.sum_q / (1000 * r.n)


def test_pack_window_is_partitioned(spark):
    plan = _plan(QUERIES["pipe_pack"](spark, SF))
    m = re.search(r"Window .*windowspecdefinition\(([^,]+),", plan)
    assert m and "source" in m.group(1), plan


def test_pack_offsets_and_bins_consistent(spark):
    rows = QUERIES["pipe_pack"](spark, SF).collect()
    assert all(0 <= r.offset_in_bin < 2048 for r in rows)
    # replay the packing per source in doc_id order
    by_src = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        cum = by_src.get(r.source, 0)
        assert r.bin == cum // 2048 and r.offset_in_bin == cum % 2048, r
        by_src[r.source] = cum + r.n_tokens


def test_chunk_overlap_geometry(spark):
    docs = {
        r.doc_id: len(r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    rows = QUERIES["text_chunk_overlap"](spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        n = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        k = 1 if n <= 120 else (n - 120 + 79) // 80 + 1
        assert [c.chunk_idx for c in chunks] == list(range(k))
        # full windows everywhere; the last chunk may be a tail stub
        for c in chunks[:-1]:
            assert c.chunk_len == 120
        last = chunks[-1]
        assert last.chunk_len == min(120, n - (k - 1) * 80)
        # stride-80 windows cover every character up to the end
        assert (k - 1) * 80 + last.chunk_len == n


def test_pack_segments_reassemble(spark):
    rows = QUERIES["pipe_pack_segments"](spark, SF).collect()
    docs = {}
    for r in rows:
        assert 0 <= r.seg_begin < r.seg_end <= 256, r
        docs.setdefault((r.source, r.doc_id), []).append(r)
    for (_, _), segs in docs.items():
        segs.sort(key=lambda r: r.bin)
        # segments tile the document's token range without gaps
        assert segs[0].tok_from == 0
        covered = 0
        for i, s in enumerate(segs):
            assert s.tok_from == covered
            covered += s.seg_end - s.seg_begin
            if i:  # continuation segments start at a fresh bin boundary
                assert s.bin == segs[i - 1].bin + 1
                assert s.seg_begin == 0
                assert segs[i - 1].seg_end == 256
    # packing is dense per source: every bin except a source's last is full
    by_src_bin = {}
    for r in rows:
        key = (r.source, r.bin)
        by_src_bin[key] = by_src_bin.get(key, 0) + (r.seg_end - r.seg_begin)
    for src in {s for s, _ in by_src_bin}:
        bins = sorted(b for s, b in by_src_bin if s == src)
        assert bins == list(range(len(bins)))
        for b in bins[:-1]:
            assert by_src_bin[(src, b)] == 256, (src, b)


def test_gram_matches_numpy_exactly(spark):
    import numpy as np

    emb = np.stack(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("embedding")
            .collect()
        ]
    )
    q = np.floor(emb * 1000).astype(np.int64)
    want = q.T @ q
    rows = QUERIES["emb_gram"](spark, SF).collect()
    d = emb.shape[1]
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        assert r.i <= r.j
        assert r.sum_q == want[r.i, r.j], (r.i, r.j)
        assert r.n == emb.shape[0]
        assert r.moment == r.sum_q / (r.n * 1000000)


def test_gram_shuffles_only_partials(spark):
    plan = _plan(QUERIES["emb_gram"](spark, SF))
    # once AQE finalizes, the string repeats the plan under
    # "== Initial Plan ==" — audit the executed section only
    plan = plan.split("== Initial Plan ==")[0]
    # one scan, embedding-only read, and the single exchange sits on
    # the sketch-sized partial rows produced by mapInPandas
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "vec_id" not in scan.split("ReadSchema:")[1], scan
    assert "label" not in scan.split("ReadSchema:")[1], scan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "MapInPandas" in plan, plan


def test_dedup_incremental_statuses(spark):
    # sf0.01 exercises all three statuses; replay the semantics in
    # plain python against the raw table
    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text").collect()
    import hashlib

    fp = {r.doc_id: hashlib.md5(r.text[:120].encode()).hexdigest() for r in docs}
    corpus = {m for d, m in fp.items() if d % 2 == 0}
    batch = sorted(d for d in fp if d % 2 == 1)
    want = {}
    seen = set()
    for d in batch:
        m = fp[d]
        if m in corpus:
            want[d] = "dup_of_corpus"
        elif m in seen:
            want[d] = "dup_in_batch"
        else:
            want[d] = "new_unique"
        seen.add(m)
    got = {
        r.doc_id: r.status
        for r in QUERIES["dedup_incremental"](spark, sf).collect()
    }
    assert got == want
    assert len(set(got.values())) == 3  # degenerate data would hide branches


def test_train_ready_e2e_two_exchanges(spark):
    # score -> filter -> dedup -> split -> pack must cost exactly two
    # shuffles: the dedup fingerprint window and the pack shard window
    plan = _plan(QUERIES["pipe_train_ready_e2e"](spark, SF))
    plan = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan
    # quality filter is applied on the scanned side, upstream of both
    # shuffles: in the printed tree (top-down), that means a Filter
    # node occurs BELOW the last Exchange, i.e. after it in the string
    last_exchange = plan.rindex("Exchange hashpartitioning")
    assert "Filter" in plan[last_exchange:], plan
    rows = QUERIES["pipe_train_ready_e2e"](spark, SF).collect()
    for r in rows:
        assert 0 <= r.offset_in_bin < 512
        assert r.bin >= 0 and r.n_tokens >= 20


def test_cap_per_domain_two_phase_plan(spark):
    # the per-source counts must broadcast (never shuffle the corpus
    # on the join) and the top-K must run through WindowGroupLimit so
    # each map task emits <= K rows per source BEFORE the exchange —
    # the property that keeps a 10^10-document domain off one task
    plan = _plan(QUERIES["pipe_cap_per_domain"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("WindowGroupLimit") == 2, plan  # Partial + Final
    assert "Partial" in plan and "Final" in plan, plan


def test_cap_per_domain_equals_naive_topk(spark):
    # the two-phase hash-threshold pick must equal the naive global
    # row_number<=K per source (the filter is downward-closed in the
    # (hx, doc_id) order, so survivors always contain the true top-K)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    got = {
        (r.source, r.doc_id): r.rnk
        for r in QUERIES["pipe_cap_per_domain"](spark, SF).collect()
    }
    d = spark.read.parquet(f"{SF}/documents.parquet")
    w = W.partitionBy("source").orderBy("hx", "doc_id")
    naive = (
        d.select(
            "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("hx")
        )
        .select("source", "doc_id", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 50)
        .collect()
    )
    assert got == {(r.source, r.doc_id): r.rnk for r in naive}
    # every source is capped at 50 and ranks are dense from 1
    by_src = {}
    for (src, _), rnk in got.items():
        by_src.setdefault(src, []).append(rnk)
    for src, rnks in by_src.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), src
        assert len(rnks) <= 50, src


def test_mixture_epochs_broadcast_only_and_dense_copies(spark):
    # both join-backs (per-source copies, 1-row totals) must broadcast;
    # the corpus itself never shuffles for a join
    df = QUERIES["pipe_mixture_epochs"](spark, SF)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "Generate explode" in plan or "explode" in plan, plan
    rows = df.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    for doc, idxs in by_doc.items():
        # copy indices are dense 1..n and the 8.0 clamp bounds n at 9
        assert sorted(idxs) == list(range(1, len(idxs) + 1)), doc
        assert len(idxs) <= 9, doc


def test_dedup_pr_counts_consistent(spark):
    # tp+fn must equal the truth-pair count and tp+fp the candidate
    # count; ratios are the single divisions of those BIGINTs
    from wsprnet_scraper_spark.operators import dedup as D
    from pyspark.sql import functions as F

    r = QUERIES["diag_dedup_pr"](spark, SF).collect()[0]
    d = spark.read.parquet(f"{SF}/documents.parquet")
    sh = D.word_shingles(d, "doc_id", "text", 3)
    truth = D.ngram_jaccard_pairs(sh).where(F.col("jaccard") >= 0.5).count()
    cand = D.candidate_pairs(D.minhash_signatures(sh, 8, 2)).count()
    assert r.tp + r.fn == truth
    assert r.tp + r.fp == cand
    if r.tp + r.fp:
        assert abs(r.precision_ - r.tp / (r.tp + r.fp)) < 1e-15


def test_substring_strip_identity_and_removal(spark):
    from pyspark.sql import functions as F

    out = {r.doc_id: r for r in QUERIES["dedup_substring_strip"](spark, SF).collect()}
    orig = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    import hashlib

    touched = 0
    for doc_id, r in out.items():
        assert r.n_kept + r.n_removed == len(orig[doc_id].split(" "))
        if r.n_removed == 0:
            # untouched docs reassemble to exactly the original text
            assert r.stripped_md5 == hashlib.md5(orig[doc_id].encode()).hexdigest()
        else:
            touched += 1
    assert touched > 0  # the corpus has duplicated spans at this SF


def test_ann_recall_bounds_and_self_hit(spark):
    # recall@3 in [0,1]; every query's own vector is in both top-3
    # sets (cosine 1 with itself), so n_hit >= 1 always
    rows = QUERIES["diag_ann_recall"](spark, SF).collect()
    assert {r.qid for r in rows} == {0, 1, 2, 3, 4}
    for r in rows:
        assert 1 <= r.n_hit <= 3, r
        assert abs(r.recall_at_3 - r.n_hit / 3.0) < 1e-15


def test_balanced_shards_token_balance(spark):
    rows = QUERIES["pipe_balanced_shards"](spark, SF).collect()
    assert {r.shard for r in rows} == set(range(8))
    tot = {}
    mx = 0
    for r in rows:
        tot[r.shard] = tot.get(r.shard, 0) + r.n_tok
        mx = max(mx, r.n_tok)
    # LPT round-robin: shard token totals within ~one max doc
    assert max(tot.values()) - min(tot.values()) <= mx, tot


def test_source_gini_bounds(spark):
    rows = QUERIES["diag_source_gini"](spark, SF).collect()
    for r in rows:
        assert 0.0 <= r.lang_gini < 1.0, r
        assert r.n_docs > 0


def test_mrl_rerank_subset_of_coarse_and_exact_scores(spark):
    from wsprnet_scraper_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = QUERIES["sim_mrl_prefix_rerank"](spark, SF).collect()
    assert len(got) == 15  # 5 queries x top-3
    # final scores are the TRUE full-dim cosines (re-rank is exact):
    exact = {
        (r.qid, r.vec_id): r.cosine
        for r in S.cosine_topk(emb, [0, 1, 2, 3, 4], k=10000).collect()
    }
    for r in got:
        assert abs(exact[(r.qid, r.vec_id)] - r.cosine) < 1e-12
        # every query's own vector survives the prefix shortlist
    assert all(any(r.qid == r.vec_id for r in got if r.qid == q) for q in range(5))


def test_novelty_first_doc_is_fully_novel(spark):
    rows = {r.doc_id: r for r in QUERIES["text_novelty_ratio"](spark, SF).collect()}
    first = min(rows)
    # the earliest doc can only contain first occurrences
    assert rows[first].novelty == 1.0
    for r in rows.values():
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_shingles


def test_multiprobe_recall_at_least_single_probe(spark):
    from wsprnet_scraper_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.qid, r.vec_id)
        for r in S.cosine_topk(emb, [0, 1, 2, 3, 4], k=3).collect()
    }
    single = {
        (r.qid, r.vec_id)
        for r in S.lsh_bucket_topk(emb, [0, 1, 2, 3, 4], k=3).collect()
    }
    multi = {
        (r.qid, r.vec_id)
        for r in S.lsh_multiprobe_topk(emb, [0, 1, 2, 3, 4], k=3).collect()
    }
    # widening the probe set can only add candidates, so recall of the
    # exact top-3 never decreases
    assert len(multi & exact) >= len(single & exact)
