"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

The decode step is STUBBED (image/audio libraries are not available in
this environment): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic
fake feature vector is derived from the bytes. The Spark-side plumbing —
schema handling, partition-sized Arrow batches, UDF signatures — is real
and tested; swapping in PIL/librosa later only changes the kernel body.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),       # image | audio | video
    StructField("payload", BinaryType(), True),    # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("n_bytes", LongType(), True),
])


def attach_media(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Demo adapter: wrap a text column as an opaque binary payload with
    typed metadata (stands in for real image/audio ingestion)."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col(id_col) % 3 + 1).cast("int")).alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB — real implementation would PIL-decode and resize.
    fake=True derives a deterministic 4-dim feature from the bytes."""
    if not fake:
        raise NotImplementedError("image decoding requires PIL; not available here")
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [float(n), float(payload[0]), float(payload[-1]),
            float(sum(payload[:16]) % 256)]


FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("feat", ArrayType(DoubleType()), True),
])


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow streams
    partition-sized batches; the kernel never materializes more than one
    batch of payloads, so executor memory is bounded by batch size, not
    partition size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=True) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"],
                "feat": feats,
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_audio(payload: bytes, fake: bool = False) -> list[float]:
    """STUB — real implementation would librosa-decode to PCM.
    fake=True derives a deterministic 2-dim feature from the bytes."""
    if not fake:
        raise NotImplementedError("audio decoding requires librosa; not available here")
    if payload is None or len(payload) == 0:
        return [0.0, 0.0]
    return [float(len(payload)), float(sum(payload[:8]) % 97)]


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  ) -> DataFrame:
    """Binary -> binary image resize kernel (1:1 rows). The resize body
    is STUBBED as a deterministic truncate-or-pad of the payload to
    width*height bytes — the schema contract (payload stays BinaryType,
    dims recorded as metadata) and batch shape are the real thing."""
    target = width * height

    out_schema = StructType(MEDIA_SCHEMA.fields + [
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                None if p is None else
                (bytes(p[:target]) if len(p) >= target
                 else bytes(p) + b"\x00" * (target - len(p)))
                for p in pdf["payload"]]
            out = pdf.copy()
            out["payload"] = resized
            out["n_bytes"] = [len(p) if p is not None else 0 for p in resized]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(kernel, schema=out_schema)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling as a 1->N mapInPandas kernel: each payload
    yields up to ``max_frames`` evenly-spaced 'frames' (STUB: fixed-size
    byte slices stand in for real ffmpeg frame extraction). Demonstrates
    the row-expanding batch shape — output batches are not 1:1 with
    input batches, which is exactly what mapInPandas (vs pandas_udf)
    exists for."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(p[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, schema=FRAME_SCHEMA)
