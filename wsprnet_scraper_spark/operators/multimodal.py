"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns. The real
decode libraries are not in this container, so the decode kernel is a
clearly-marked STUB (deterministic fake) — but everything Spark-side
is real and tested: the binary schema, the Arrow batch path through
mapInPandas, the output schema contract, and the frame-explosion
(UDTF-shaped) operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, byte_len long, first_byte int, fake_width int, fake_height int"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, payload binary) — UTF-8 bytes standing in for media blobs."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode kernel. A real implementation would call
    PIL/libav/etc; this deterministic fake derives 'image' metadata
    from the bytes so the plumbing is testable end to end."""
    n = len(payload)
    return n, payload[0] if n else 0, n % 640, (n * 7) % 480


def decode_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata rows.

    The Arrow batch shape is the part that matters at scale: payloads
    stream through in columnar batches, the Python worker touches
    each batch once, and output is a typed DataFrame — the same
    pattern a real image/audio featurizer would use.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": meta.map(lambda t: t[0]),
                    "first_byte": meta.map(lambda t: t[1]),
                    "fake_width": meta.map(lambda t: t[2]),
                    "fake_height": meta.map(lambda t: t[3]),
                }
            )

    return binary_df.mapInPandas(op, schema=DECODE_SCHEMA)


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
