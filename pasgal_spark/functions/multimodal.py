"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct — the same pattern as the ``html: binary`` pages column.
The Spark-side plumbing (schemas, Arrow batch shapes, partition-preserving
``mapInPandas`` transforms) is real and tested; the codec step itself is
stubbed because media libraries are not available in this container:

- ``decode_image`` raises ``NotImplementedError`` unless a PIL-compatible
  decoder is importable (import-gated, never a hard dependency);
- ``fake_decode_image`` is the deterministic test double: it "decodes" the
  payload into a small fixed-shape feature vector derived from the bytes
  (md5-seeded), exercising the identical UDF signature, schema and batch
  path that a real decoder would use.

At 100 TB the payloads dominate storage: transforms below never shuffle
payload bytes — feature extraction happens in ``mapInPandas`` on the scan
partitioning and only the (tiny) features are aggregated downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int"
)
FEATURE_DIM = 16


def synthesize_media(spark: SparkSession, n: int, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from xxhash64.

    Payload = concatenated hash bytes (opaque, like a real JPEG would be);
    kind cycles image/audio/video; metadata columns typed per kind.
    """
    ids = spark.range(n).withColumnRenamed("id", "media_id")
    h = F.abs(F.xxhash64("media_id", F.lit(seed)))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    # payload: 64 deterministic bytes from chained hashes (JVM-side)
    payload = F.concat(
        *[
            F.unhex(F.lpad(F.hex(F.abs(F.xxhash64("media_id", F.lit(seed + i)))), 16, "0"))
            for i in range(8)
        ]
    )
    return ids.select(
        "media_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image", (h % 1920 + 16).cast("int")).alias("width"),
        F.when(kind == "image", (h % 1080 + 16).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
    )


def _bytes_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-seeded feature vector."""
    digest = hashlib.md5(payload).digest()
    raw = (digest * ((dim * 4) // len(digest) + 1))[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return (arr % 1000) / 1000.0


def fake_decode_image(media: DataFrame, *, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, features array<double>): the stubbed decode/extract stage.

    Real Spark plumbing: Arrow-batched mapInPandas, payload bytes never
    leave the input partition, output is the narrow feature relation.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _bytes_features(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(batches, "media_id long, features array<double>")


def decode_image(media: DataFrame) -> DataFrame:
    """Real decoder — import-gated; unavailable in this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires a PIL-compatible library, not present "
            "in this environment; use fake_decode_image for the pipeline path"
        ) from e
    raise NotImplementedError("real decoder wiring reserved for round 2+")


def frame_sample(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """(media_id, frame_idx, frame_payload): video frame sampling stub.

    Deterministic frame index fan-out via posexplode of a JVM-side
    sequence — the partition/batch shape of a real ffmpeg-backed sampler.
    """
    n_frames = (F.abs(F.xxhash64("media_id", F.lit(7))) % 300 + 1).cast("int")
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
    # "frame" payload = slice of the container payload (stub for decode)
    return frames.select(
        "media_id",
        "frame_idx",
        F.substring("payload", (F.col("frame_idx") % 32 + 1).cast("int"), 16).alias(
            "frame_payload"
        ),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """(kind, n, total_bytes, avg_width): metadata-only scan — payload
    column pruned away by Catalyst (verify with .explain: ReadSchema
    excludes payload)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("width"), 2).alias("avg_width"),
    )
