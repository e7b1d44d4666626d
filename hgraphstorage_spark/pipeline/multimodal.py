"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition-friendly batch iteration,
Arrow-batched UDF signatures) is real and tested; the actual media
decoding is STUBBED — the image/audio libraries are not available in this
container. Each decode hook either raises NotImplementedError (real mode)
or produces a deterministic fake (test mode), clearly marked.

Design for 100 TB of media:
- binary payloads stay opaque in parquet (no driver round-trips);
- per-batch processing via ``mapInPandas`` so one Arrow batch of blobs is
  decoded at a time (bounded executor memory, vectorized transfer);
- metadata (codec, width, height, duration) lives in a sibling struct
  column so planning-time filters (e.g. width > 512) prune without
  touching blobs — parquet column pruning does the rest.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _decode_stub(payload: bytes, kind: str, fake: bool) -> list[float] | None:
    """STUB: real implementation would decode via PIL/librosa/ffmpeg.

    ``fake=True`` produces a deterministic 8-dim feature from the payload
    bytes (md5-derived) so the distributed plumbing is testable without
    media libraries."""
    if payload is None:
        return None
    if not fake:
        raise NotImplementedError("media decoding requires image/audio libs not present in this environment")
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Decode + feature-extract each blob, one Arrow batch at a time.

    ``mapInPandas`` keeps peak memory at one batch of blobs per task;
    payload column is only read where decode actually runs (filter/prune
    metadata *before* calling this)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    f = _decode_stub(payload, kind, fake_decode)
                    feats.append(f)
                    oks.append(f is not None)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resize_ok", T.BooleanType(), False),
    ]
)


def resize_images(
    media: DataFrame, max_w: int = 256, max_h: int = 256, fake_decode: bool = False
) -> DataFrame:
    """Resize image payloads to fit (max_w, max_h), aspect-preserving.

    Same execution shape as `extract_features`: metadata-only pre-filter
    (images already small enough pass through without payload decode —
    checked from the meta struct, prunable at plan time), then
    ``mapInPandas`` over Arrow batches for the rest. The pixel work is
    STUBBED (no PIL here): real mode raises, fake mode returns the
    original bytes with the computed target dimensions — the partitioning,
    batch shape, and dimension arithmetic are real and tested.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h, oks = [], [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if payload is None or pd.isna(w) or pd.isna(h):
                    out_payload.append(None), out_w.append(None), out_h.append(None)
                    oks.append(False)
                    continue
                scale = min(max_w / int(w), max_h / int(h), 1.0)
                tw, th = max(1, int(int(w) * scale)), max(1, int(int(h) * scale))
                if not fake_decode:
                    out_payload.append(None), out_w.append(tw), out_h.append(th)
                    oks.append(False)  # NotImplemented: pixel decode needs PIL
                    continue
                out_payload.append(bytes(payload)), out_w.append(tw), out_h.append(th)
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": out_w,
                    "height": out_h,
                    "resize_ok": oks,
                }
            )

    images = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Planning-side frame sampling for video: expand each video row into
    (media_id, frame_ts_ms) rows using metadata only — no payload access,
    so the planner can partition decode work before touching bytes."""
    return (
        media.filter((F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        meta = {
            "codec": {"image": "png", "audio": "wav", "video": "h264"}[kind],
            "width": 64 + i if kind != "audio" else None,
            "height": 48 + i if kind != "audio" else None,
            "duration_ms": 5000 + i * 100 if kind != "image" else None,
        }
        rows.append({"media_id": i, "kind": kind, "payload": payload, "meta": meta})
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
