"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (training-data pipeline requirement).

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (``decode_media`` raises NotImplementedError unless a
deterministic fake is requested); everything Spark-side — schema, salted
partitioning, mapInPandas batch shape, size-capped chunking — is real and
tested. Swapping in Pillow/librosa in prod changes only ``_decode_real``.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),  # image | audio | video
    StructField("payload", BinaryType(), True),      # opaque encoded bytes
    StructField("width", IntegerType(), True),       # typed metadata…
    StructField("height", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, sha1 string, "
    "byte_entropy_x1000 bigint, feat array<double>, decode_ok int"
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload bytes are a pure function of
    media_id) — the test corpus for the plumbing."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].tolist()
            rows = []
            for i in ids:
                kind = ("image", "audio", "video")[i % 3]
                payload = hashlib.sha256(
                    f"media-{i}".encode()).digest() * (8 + i % 32)
                rows.append({
                    "media_id": i, "media_type": kind, "payload": payload,
                    "width": 640 if kind != "audio" else None,
                    "height": 480 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": 1000 + (i * 37) % 9000
                    if kind != "image" else None,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MEDIA_SCHEMA.fields])

    base = spark.range(n).select(F.col("id").alias("media_id"))
    return base.repartition(4).mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(payload: bytes, media_type: str, fake: bool = False):
    """STUB — media decoding needs Pillow/soundfile/ffmpeg, none of which
    exist in this container. ``fake=True`` returns a deterministic
    pseudo-decode (byte histogram) so the downstream plumbing is testable;
    prod replaces this body with the real decoder."""
    if not fake:
        raise NotImplementedError(
            "media decode requires Pillow/soundfile/ffmpeg (absent in this "
            "container); call with fake=True for the deterministic stub")
    counts = [0] * 16
    for b in payload:
        counts[b >> 4] += 1
    return counts


def extract_media_features(media: DataFrame,
                           byte_cap: int = 64 << 20) -> DataFrame:
    """mapInPandas feature extraction over binary payloads with the same
    size-capped batching discipline as the HTML pipeline."""
    import math

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["payload"].map(
                lambda b: len(b) if b is not None else 0)
            # byte-capped re-chunk (mirrors mre.pipeline._chunks_by_bytes)
            start, acc = 0, 0
            bounds = []
            for i, sz in enumerate(sizes):
                if acc + sz > byte_cap and i > start:
                    bounds.append((start, i))
                    start, acc = i, 0
                acc += sz
            bounds.append((start, len(pdf)))
            for s, e in bounds:
                chunk = pdf.iloc[s:e]
                out = []
                for _, row in chunk.iterrows():
                    payload = row["payload"]
                    if payload is None:
                        out.append({"media_id": row["media_id"],
                                    "media_type": row["media_type"],
                                    "n_bytes": 0, "sha1": None,
                                    "byte_entropy_x1000": 0,
                                    "feat": None, "decode_ok": 0})
                        continue
                    payload = bytes(payload)
                    hist = decode_media(payload, row["media_type"],
                                        fake=True)
                    total = max(sum(hist), 1)
                    probs = [c / total for c in hist if c]
                    ent = -sum(p * math.log2(p) for p in probs)
                    out.append({
                        "media_id": row["media_id"],
                        "media_type": row["media_type"],
                        "n_bytes": len(payload),
                        "sha1": hashlib.sha1(payload).hexdigest(),
                        "byte_entropy_x1000": int(ent * 1000),
                        "feat": [float(c) / total for c in hist],
                        "decode_ok": 1,
                    })
                yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


__all__ = ["MEDIA_SCHEMA", "FEATURE_SCHEMA", "synth_media", "decode_media",
           "extract_media_features"]
