"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns. Decode is a
pluggable kernel behind one output contract (DECODE_SCHEMA):

- "stub": deterministic fake metadata from the raw bytes — works on
  any payload, used where the real decode libraries are absent (this
  container) and in the oracle-checked queries (the fake is pure
  arithmetic, so DuckDB can mirror it);
- "pil": real Pillow image decode (width/height from the actual
  image), available when Pillow is importable; the Spark-side
  plumbing — binary schema, Arrow batches through mapInPandas, typed
  output — is byte-for-byte the same code path.

Everything Spark-side is real and tested either way; only the
per-payload kernel swaps.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, byte_len long, first_byte int, width int, height int"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, payload binary) — UTF-8 bytes standing in for media blobs."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode kernel. Derives deterministic 'image' metadata
    from the raw bytes so the plumbing is testable end to end on any
    payload (and mirrorable in the SQL oracle)."""
    n = len(payload)
    return n, payload[0] if n else 0, n % 640, (n * 7) % 480


def _pil_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Real image decode via Pillow: actual (width, height) from the
    encoded image. Import happens inside the kernel — it runs on the
    executors, which must resolve PIL themselves."""
    import io

    from PIL import Image  # noqa: PLC0415

    with Image.open(io.BytesIO(payload)) as img:
        w, h = img.size
    return len(payload), payload[0] if payload else 0, int(w), int(h)


_DECODE_KERNELS = {"stub": _fake_decode, "pil": _pil_decode}


def available_decode_kernels() -> list[str]:
    """Kernels usable in this environment ('stub' always; 'pil' when
    Pillow imports)."""
    out = ["stub"]
    try:
        import PIL  # noqa: F401, PLC0415

        out.append("pil")
    except ImportError:
        pass
    return out


def decode_metadata(binary_df: DataFrame, kernel: str = "stub") -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata rows, same
    DECODE_SCHEMA whichever kernel decodes.

    The Arrow batch shape is the part that matters at scale: payloads
    stream through in columnar batches, the Python worker touches
    each batch once, and output is a typed DataFrame — the same
    pattern a real image/audio featurizer would use. `kernel="pil"`
    is gated at plan-build time: NotImplementedError with a clear
    message when Pillow is absent, instead of an executor-side
    ImportError mid-job.
    """
    if kernel == "pil":
        try:
            import PIL  # noqa: F401, PLC0415
        except ImportError as e:
            raise NotImplementedError(
                "decode_metadata(kernel='pil') needs Pillow; this "
                "environment has only the 'stub' kernel"
            ) from e
    decode = _DECODE_KERNELS[kernel]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": meta.map(lambda t: t[0]),
                    "first_byte": meta.map(lambda t: t[1]),
                    "width": meta.map(lambda t: t[2]),
                    "height": meta.map(lambda t: t[3]),
                }
            )

    return binary_df.mapInPandas(op, schema=DECODE_SCHEMA)


FEATURE_SCHEMA = (
    "doc_id long, feat_dim int, feature_csv string,"
    " top_bin int, top_count long, nonzero_bins int"
)


def extract_features(binary_df: DataFrame, num_bins: int = 16) -> DataFrame:
    """mapInPandas featurizer: `num_bins`-bin byte histogram per
    payload, plus summary stats. STUB for a real embedding/CNN
    featurizer — swap `np.bincount` for a model call and nothing else
    changes: the Arrow batch path, the per-batch numpy vectorization,
    and the typed output contract are the real scale plumbing. The
    feature vector rides along serialized (`feature_csv`, exact
    integers) so the cross-engine hash stays stable.

    Ties on `top_bin` go to the lowest bin (np.argmax first-hit).
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # whole-batch vectorization: concatenate every payload,
            # attribute each byte to its row, and build ALL histograms
            # with one scatter-add — no per-document Python loop
            payloads = list(pdf["payload"])
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            rows = len(payloads)
            flat = np.zeros(rows * num_bins, dtype=np.int64)
            if lens.sum():
                data = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                row_of = np.repeat(np.arange(rows, dtype=np.int64), lens)
                np.add.at(flat, row_of * num_bins + (data >> 4), 1)
            hist = flat.reshape(rows, num_bins)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feat_dim": np.full(rows, num_bins, dtype=np.int32),
                    "feature_csv": [
                        ",".join(map(str, h)) for h in hist.tolist()
                    ],
                    "top_bin": hist.argmax(axis=1).astype(np.int32),
                    "top_count": hist.max(axis=1),
                    "nonzero_bins": (hist > 0).sum(axis=1).astype(np.int32),
                }
            )

    return binary_df.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, in_w int, in_h int, out_w int, out_h int, out_bytes long"


def resize_meta(binary_df: DataFrame, box: int = 64) -> DataFrame:
    """Aspect-preserving resize into a `box`×`box` bounding box.

    Input dims come from the stubbed decode (`_fake_decode` geometry,
    clamped to ≥1); the integer fit arithmetic is the real contract a
    pixel kernel would honor (floor scaling, never upscale, min dim
    1). Vectorized numpy over Arrow batches — no per-row Python.
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            w = np.maximum(1, n % 640)
            h = np.maximum(1, (n * 7) % 480)
            m = np.maximum(w, h)
            out_w = np.where(m <= box, w, np.maximum(1, w * box // m))
            out_h = np.where(m <= box, h, np.maximum(1, h * box // m))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_w": w, "in_h": h,
                    "out_w": out_w, "out_h": out_h,
                    "out_bytes": out_w * out_h,
                }
            )

    return binary_df.mapInPandas(op, schema=RESIZE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, text_col: str, stride: int = 3) -> DataFrame:
    """UDTF-shaped frame sampler: one row per sampled 'frame'
    (64-byte chunk), every `stride`-th frame, with a deterministic
    frame fingerprint. Pure exprs — explode, not a Python loop."""
    nf = (F.octet_length(F.col(text_col)) / 64).cast("long")
    return (
        df.select(F.col(id_col).alias("doc_id"), nf.alias("n_frames"))
        .filter(F.col("n_frames") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.lit(stride).cast("long"))
            ).alias("frame_idx"),
        )
        .withColumn(
            "frame_hash",
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("frame_idx"))),
        )
    )


AUDIO_SCHEMA = "doc_id long, frame_idx int, energy long, peak int"


def audio_energy(binary_df: DataFrame, frame: int = 40) -> DataFrame:
    """Audio-shaped windowed analysis over binary payloads: treat each
    byte as a centered int8 PCM sample, emit per-frame energy
    (sum of squares) and peak (max |sample|) — the VAD/silence-trim
    primitive of an audio curation pipeline. STUB for a real PCM
    decode the same way extract_features stubs a CNN: swap the
    byte->sample view for soundfile/ffmpeg output and the Arrow batch
    path, whole-batch numpy vectorization, and typed per-frame output
    contract are unchanged.

    Integer arithmetic end to end, so the DuckDB oracle mirrors it
    exactly. Frames are non-overlapping; trailing partial frames are
    dropped (a doc shorter than one frame emits nothing).
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = list(pdf["payload"])
            ids = pdf["doc_id"].to_numpy()
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            nf = lens // frame
            total = int(nf.sum())
            if total == 0:
                continue
            # concatenate only the frame-aligned prefixes, then one
            # reshape gives every frame of every row — no per-doc loop
            data = np.frombuffer(
                b"".join(p[: int(k) * frame] for p, k in zip(payloads, nf)),
                dtype=np.uint8,
            )
            m = data.astype(np.int64).reshape(total, frame) - 128
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, nf),
                    "frame_idx": (
                        np.arange(total) - np.repeat(np.cumsum(nf) - nf, nf)
                    ).astype(np.int32),
                    "energy": (m * m).sum(axis=1),
                    "peak": np.abs(m).max(axis=1).astype(np.int32),
                }
            )

    return binary_df.mapInPandas(op, schema=AUDIO_SCHEMA)


PHASH_SCHEMA = "doc_id long, phash string"


def perceptual_hash(binary_df: DataFrame, num_bins: int = 64) -> DataFrame:
    """dHash-style perceptual fingerprint per payload: build the
    `num_bins`-bin byte histogram (bin = byte mod num_bins), take the
    gradient bit string bit_i = (h[i] > h[i+1]) with h[num_bins] = 0,
    and md5 it. Payloads with the same byte distribution collide even
    when bytes are reordered — the property a perceptual hash trades
    exactness for. STUB for a real image dHash — swap the byte
    histogram for the decoded-and-downscaled luma grid and the bit
    rule is the classic gradient hash; batch path and output
    contract stay identical.

    Same whole-batch vectorization as extract_features: one scatter-
    add builds every histogram, one vectorized compare emits every
    bit; only the final md5 runs per document, on a num_bins-char
    string — O(1) per doc regardless of payload size.
    """
    import hashlib

    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = list(pdf["payload"])
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            rows = len(payloads)
            flat = np.zeros(rows * num_bins, dtype=np.int64)
            if lens.sum():
                data = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                row_of = np.repeat(np.arange(rows, dtype=np.int64), lens)
                np.add.at(flat, row_of * num_bins + (data % num_bins), 1)
            hist = flat.reshape(rows, num_bins)
            nxt = np.concatenate(
                [hist[:, 1:], np.zeros((rows, 1), dtype=np.int64)], axis=1
            )
            bits = np.where(hist > nxt, ord("1"), ord("0")).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [
                        hashlib.md5(row.tobytes()).hexdigest() for row in bits
                    ],
                }
            )

    return binary_df.mapInPandas(op, schema=PHASH_SCHEMA)


SPAN_SCHEMA = "doc_id long, span_id int, start_frame int, end_frame int, n_frames long, span_energy long"


def voiced_spans(
    binary_df: DataFrame, frame: int = 40, threshold: int = 80_000
) -> DataFrame:
    """VAD-style silence trimming: frames above the energy threshold
    are 'voiced'; consecutive voiced frames collapse to spans
    (gaps-and-islands over the frame index). The downstream shape of
    every speech pipeline: keep the utterances, drop the silence.

    Composition: `audio_energy` (Arrow batch kernel, integer-exact)
    -> threshold filter -> per-document islands window -> span
    rollup. The islands window partitions by doc_id over FRAMES
    (≤ len/frame rows per doc, bounded by payload size), and the
    rollup is map-side combined — at 100 TB the audio bytes are
    touched once in the kernel and never shuffle; only frame
    summaries move.
    """
    frames = audio_energy(binary_df, frame=frame)
    from pyspark.sql import Window

    voiced = frames.filter(F.col("energy") > threshold)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    grp = (F.col("frame_idx") - F.row_number().over(w)).alias("grp")
    spans = (
        voiced.select("doc_id", "frame_idx", "energy", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("energy").alias("span_energy"),
        )
    )
    ws = Window.partitionBy("doc_id").orderBy("start_frame")
    return spans.select(
        "doc_id",
        F.row_number().over(ws).cast("int").alias("span_id"),
        F.col("start_frame").cast("int"),
        F.col("end_frame").cast("int"),
        "n_frames",
        F.col("span_energy").cast("long"),
    )
