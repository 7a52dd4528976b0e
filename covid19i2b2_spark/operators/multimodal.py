"""Multimodal (binary) columns (SURVEY.md §2.11 X5 extension).

Contract: image/audio/video payloads travel as opaque ``binary`` columns
with typed metadata alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` operators so the heavy
bytes never round-trip a Python row at a time.

The container has no image/audio codecs, so the actual decode is STUBBED:
``decode_media(..., use_real_codecs=True)`` raises NotImplementedError;
the default path emits a DETERMINISTIC FAKE decode (metadata derived from
the bytes themselves) so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in media source: payload = utf-8 bytes of a text column.
    Real deployments read payloads from parquet binary columns or object
    storage; everything downstream only sees (id, type, payload, meta)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def decode_media(df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode payloads to (dims, checksum) metadata via mapInPandas.

    FAKE decode (default): width/height are deterministic functions of the
    byte length and first byte — stable across runs, so tests can assert
    on values.  Real codecs are not available in this container.
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real image/audio codecs are not installed in this environment; "
            "plug Pillow/ffmpeg into _decode_batches here"
        )

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len).astype("int64")
            first = payload.map(lambda b: b[0] if len(b) else 0).astype("int64")
            # deterministic fake "dimensions": a codec would parse headers
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "width": ((first % 16 + 1) * 64).astype("int32"),
                    "height": ((n_bytes % 16 + 1) * 64).astype("int32"),
                    "checksum": payload.map(
                        lambda b: sum(b[:64]) if len(b) else 0
                    ).astype("int64"),
                }
            )

    return df.mapInPandas(_decode_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, use_real_codecs: bool = False
) -> DataFrame:
    """Resize stub via mapInPandas: emits a payload deterministically
    truncated/cycled to width*height bytes (a codec would decode, resample
    and re-encode here — plug Pillow in when available).  The plumbing a
    real resize needs — binary in/out through Arrow batches, new dims in
    the schema — is exercised for real."""
    if use_real_codecs:
        raise NotImplementedError(
            "real image codecs are not installed in this environment; "
            "plug Pillow into _resize_batches here"
        )
    target = width * height

    def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fit(b: bytes) -> bytes:
                if not b:
                    return bytes(target)
                reps = -(-target // len(b))  # ceil
                return (b * reps)[:target]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": pdf["payload"].map(fit),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_resize_batches, RESIZED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Feature extraction: payload -> L1-normalized byte-histogram
    embedding (array<float> of ``dim`` buckets).  Unlike decode/resize
    this is NOT a stub — a byte histogram is a real (if crude) content
    feature — and its output feeds the similarity operators directly
    (cosine_topk / IVF / near-dup run unchanged on it)."""

    def _feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": feats}
            )

    return df.mapInPandas(
        _feat_batches, "media_id long, embedding array<float>"
    )


def frame_sample(df: DataFrame, chunk_bytes: int = 256, every_n: int = 4) -> DataFrame:
    """Frame sampling stub: slice each payload into fixed-size "frames"
    and keep every n-th — the video-pipeline shape (payload -> frames ->
    per-frame features) with deterministic fake frames.  Array ops stay
    JVM-side; only a real codec would need Python here."""
    n_frames = F.ceil(F.length("payload") / chunk_bytes).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(F.col("payload"), i * chunk_bytes + 1, chunk_bytes),
    )
    sampled = F.filter(frames, lambda fr, i: i % every_n == 0)
    return df.select(
        "media_id",
        n_frames.alias("n_frames"),
        F.size(sampled).alias("n_sampled"),
        sampled.alias("frames"),
    )
