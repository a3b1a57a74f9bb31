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
