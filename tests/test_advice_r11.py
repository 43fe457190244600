"""Regression tests for the ADVICE r10 findings (fixed r11).

A1 (audit exemption drift) is test-side: strm_semantic_dedup is
   dropped from REVIEWED_INDEPENDENT in test_mirrored_oracle_audit,
   so the name-hint guard re-covers it now that the entry carries the
   mirrored tag directly.
A2 land_ordered_ndjson multi-part fids: a session with
   spark.sql.files.maxRecordsPerFile set splits one fid's output into
   several part files — the rename step now globs part-* (any
   extension) and concatenates multiple parts in sorted order instead
   of asserting exactly one .json part.
A3 BPE framing regex: '.' differs across engines on line terminators
   (RE2 frames CR / NEL U+0085 / LS U+2028 / PS U+2029; Java regex frames none of them), so a
   corpus token containing one would silently diverge engine vs
   oracle in pipe_bpe_train / pipe_bpe_encode. Both sides now frame
   with (?s)(.) — DOTALL dot, which matches every char in BOTH
   engines at Dot-node speed (the any-char CLASS alternative framed
   identically but cost 23x at the 100x corpus: 22.5 s vs 0.96 s for
   the framing pass — Java's per-char class check vs the optimized
   dot). The tests here gate the exact entries on a corpus crafted
   to contain every line-terminator class member inside tokens.
A4 _FRAME_STORE pinning (also r10 verdict task #3): the shared frame
   relation is localCheckpoint'ed instead of persist()'ed, so the
   probe's per-run spark.catalog.clearCache() cannot drop it — the
   trained-codebook discipline; eviction of a stopped application's
   entries needs no unpersist because its checkpoint blocks died
   with that application's context.
"""

from __future__ import annotations

import glob
import json

from tests.conftest import SF_SMOKE
from tests.test_advice_r10 import _assert_matches_oracle, _write_documents
from wsprnet_scraper_spark.streaming.landing import land_ordered_ndjson

# Every Java-regex line-terminator class member embedded INSIDE
# tokens (mid-token, so an unframed character would glue two framed
# symbols together and change pair counts / encode md5s).
LT_TEXTS = [
    "lo\rw lo\rw lo\rwer low low",
    "ne\u0085w ne\u0085w ne\u0085wer new",
    "wi\u2028de wi\u2028de wi\u2028dest wide",
    "pa\u2029ge pa\u2029ge pa\u2029ges page",
    "aaaa abab low new plain",
    "the quick brown fox jumps over the lazy dog",
]


def test_bpe_train_gates_on_line_terminator_corpus(spark, tmp_path):
    sf = _write_documents(tmp_path, LT_TEXTS)
    _assert_matches_oracle(spark, "pipe_bpe_train", sf)


def test_bpe_encode_gates_on_line_terminator_corpus(spark, tmp_path):
    sf = _write_documents(tmp_path, LT_TEXTS)
    _assert_matches_oracle(spark, "pipe_bpe_encode", sf)


def test_landing_concatenates_multipart_fids(spark, tmp_path):
    # Force every fid's single task to split its output: 9 rows into
    # 2 fids with at most 2 records per file -> 2-3 part files per
    # fid. The helper must still land exactly n_files files, each
    # holding its full contiguous id range.
    landing = str(tmp_path / "landing")
    df = spark.range(9).selectExpr("id AS k", "id * 10 AS v")
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2")
    try:
        n = land_ordered_ndjson(df, "k", landing, 2)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
    assert n == 2
    files = sorted(glob.glob(f"{landing}/batch-*.json"))
    assert len(files) == 2
    seen, prev_max = [], -1
    for f in files:
        ks = sorted(
            json.loads(line)["k"] for line in open(f) if line.strip()
        )
        assert ks and ks[0] > prev_max, "file ranges must be contiguous"
        prev_max = ks[-1]
        seen.extend(ks)
    assert sorted(seen) == list(range(9))


def test_frame_relation_survives_clear_cache(spark):
    from wsprnet_scraper_spark.plans.analytics import (
        _FRAME_STORE,
        _frame_relation,
    )

    df = _frame_relation(spark, SF_SMOKE)
    n = df.count()  # materializes the lazy localCheckpoint
    assert n > 0
    # the pin is a checkpoint scan, not a CacheManager entry ...
    assert "ExistingRDD" in df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    # ... so clearCache (the probe's isolation) cannot drop it: the
    # store still serves the same relation and it still answers.
    df2 = _frame_relation(spark, SF_SMOKE)
    assert df2 is df and df2.count() == n
    app = spark.sparkContext.applicationId
    assert SF_SMOKE in _FRAME_STORE[app]


def test_landing_refuses_compressed_parts(spark, tmp_path):
    # r11 review finding: a session-level JSON codec changes the part
    # extension; renaming .json.gz bytes into batch-NNN.json would
    # make the downstream file stream source parse gzip as NDJSON.
    # The helper must fail loudly instead.
    import pytest

    landing = str(tmp_path / "landing")
    df = spark.range(6).selectExpr("id AS k")
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("mapreduce.output.fileoutputformat.compress", "true")
    hc.set(
        "mapreduce.output.fileoutputformat.compress.codec",
        "org.apache.hadoop.io.compress.GzipCodec",
    )
    try:
        with pytest.raises(ValueError, match="uncompressed"):
            land_ordered_ndjson(df, "k", landing, 2)
    finally:
        hc.unset("mapreduce.output.fileoutputformat.compress")
        hc.unset("mapreduce.output.fileoutputformat.compress.codec")
