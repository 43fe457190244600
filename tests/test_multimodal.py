"""Decode-kernel contract tests (VERDICT r1 item 7).

One output schema (DECODE_SCHEMA) regardless of which kernel decodes:
the 'stub' kernel (deterministic fake, any payload) always runs; the
'pil' kernel (real Pillow decode) runs when Pillow is importable and
must produce the same schema with REAL image dimensions. Without
Pillow, requesting 'pil' must fail at plan-build time with a clear
NotImplementedError, not an executor-side ImportError mid-job.
"""

from __future__ import annotations

import pytest

from wsprnet_scraper_spark.operators import multimodal

_HAS_PIL = "pil" in multimodal.available_decode_kernels()


def _payload_df(spark, payloads: list[bytes]):
    from pyspark.sql import functions as F

    rows = [(i, p) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


@pytest.mark.parametrize(
    "kernel",
    ["stub"] + (["pil"] if _HAS_PIL else []),
)
def test_decode_schema_identical_across_kernels(spark, kernel):
    if kernel == "pil":
        payloads = [_tiny_png(w, h) for w, h in [(3, 2), (1, 1), (7, 5)]]
    else:
        payloads = [b"hello world", b"", b"x" * 1000]
    out = multimodal.decode_metadata(_payload_df(spark, payloads), kernel=kernel)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,byte_len:bigint,first_byte:int,width:int,height:int>"
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(payloads)
    for i, p in enumerate(payloads):
        assert rows[i].byte_len == len(p)
        assert rows[i].first_byte == (p[0] if p else 0)
    if kernel == "pil":
        assert (rows[0].width, rows[0].height) == (3, 2)  # REAL dims
        assert (rows[1].width, rows[1].height) == (1, 1)
        assert (rows[2].width, rows[2].height) == (7, 5)
    else:
        assert rows[2].width == 1000 % 640 and rows[2].height == (1000 * 7) % 480


def _tiny_png(w: int, h: int) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), (1, 2, 3)).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(_HAS_PIL, reason="Pillow present; gate not reachable")
def test_pil_kernel_gates_cleanly(spark):
    df = _payload_df(spark, [b"not an image"])
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.decode_metadata(df, kernel="pil")


def test_unknown_kernel_rejected(spark):
    with pytest.raises(KeyError):
        multimodal.decode_metadata(_payload_df(spark, [b"x"]), kernel="libav")


def test_perceptual_hash_matches_reimplementation(spark):
    import hashlib

    import numpy as np

    from wsprnet_scraper_spark.operators import multimodal

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    payload = multimodal.with_binary_payload(docs, "doc_id", "text")
    got = {r.doc_id: r.phash for r in multimodal.perceptual_hash(payload).collect()}

    def ref(raw: bytes) -> str:
        h = np.zeros(64, dtype=np.int64)
        for byte in raw:
            h[byte % 64] += 1
        nxt = np.append(h[1:], 0)
        bits = "".join("1" if a > b else "0" for a, b in zip(h, nxt))
        return hashlib.md5(bits.encode()).hexdigest()

    for r in docs.select("doc_id", "text").collect():
        assert got[r.doc_id] == ref(r.text.encode()), r.doc_id

    # permuting bytes preserves the hash (distribution-based by design)
    a = ref(b"abcabcxyz")
    assert a == ref(b"zyxcbacba")
    assert a != ref(b"abcabcxyy")


def test_voiced_spans_islands(spark):
    from wsprnet_scraper_spark.operators import multimodal

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    payload = multimodal.with_binary_payload(docs, "doc_id", "text")
    frames = {
        (r.doc_id, r.frame_idx): r.energy
        for r in multimodal.audio_energy(payload, frame=40).collect()
    }
    spans = multimodal.voiced_spans(payload, frame=40, threshold=80_000).collect()
    # replay gaps-and-islands in python
    want = {}
    for doc_id in {d for d, _ in frames}:
        idxs = sorted(i for (d, i), e in frames.items() if d == doc_id and e > 80_000)
        runs = []
        for i in idxs:
            if runs and i == runs[-1][-1] + 1:
                runs[-1].append(i)
            else:
                runs.append([i])
        want[doc_id] = [
            (run[0], run[-1], len(run), sum(frames[(doc_id, j)] for j in run))
            for run in runs
        ]
    got = {}
    for r in sorted(spans, key=lambda r: (r.doc_id, r.span_id)):
        got.setdefault(r.doc_id, []).append(
            (r.start_frame, r.end_frame, r.n_frames, r.span_energy)
        )
    assert got == {d: v for d, v in want.items() if v}
    # data must actually alternate: some doc has >1 span, some frames silent
    assert any(len(v) > 1 for v in got.values())
