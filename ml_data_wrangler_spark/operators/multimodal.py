"""Multimodal columns (north-star extension, BASELINE.json).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs riding alongside. The Spark-side plumbing — schemas,
partition-aware batch iteration via ``mapInPandas``, Arrow transfer of
binary blobs, output shapes — is real and tested; the codec step is a
deterministic STUB (media libraries are not in this environment) kept
behind one function so a real decoder (PIL/torchaudio/ffmpeg) drops in
without touching the Spark plumbing.

Scale design: decode/feature-extract are per-row map operators —
zero shuffle; batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs can't OOM a worker; blobs never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_hash string, "
    "feature array<float>"
)


def _decode_stub(content: bytes, kind: str) -> np.ndarray:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg.

    Real deployments replace this one function (e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(content)))``). The fake
    derives an 8-dim feature from the bytes so tests get stable,
    content-dependent output with the exact production signature.
    """
    if content is None or len(content) == 0:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), 8)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + featurize via mapInPandas: per-partition Arrow batch
    iterator, one decode call per row, no shuffle, no driver transit."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(c, k).tolist()
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "content_hash": [
                        hashlib.md5(c if c is not None else b"").hexdigest()
                        for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes blobs through the stub 'resize'
    (identity on bytes, metadata updated) — schema/partitioning shape
    of a real resize operator."""
    return media.where(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.format").alias("format"),
        ),
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (posexplode over the sampling grid); the decode of each frame is
    the stub. Demonstrates the explode-shape (1 video → N frames)."""
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_idx", "frame_ts_ms"),
        "content",
    )
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ts_ms",
        F.xxhash64(F.col("content"), F.col("frame_ts_ms")).alias("frame_token"),
    )


def chunk_audio(media: DataFrame, chunk_ms: int = 1000) -> DataFrame:
    """Fixed-duration audio chunking: split each audio blob into
    ``chunk_ms`` windows, mapping time to byte ranges proportionally
    (uncompressed PCM assumption — the metadata's duration covers the
    blob uniformly; a codec-aware splitter would drop in behind the
    same schema).

    Everything is integer arithmetic + one binary ``substring`` per
    chunk — deterministic, shuffle-free, and the chunk PLAN
    (start/end bytes) is reproducible by any engine from the metadata
    alone, so the emitted byte lengths prove the slicing honored the
    plan. The chunk grid explodes map-side: 1 row → ceil(duration /
    chunk_ms) rows, the same shape a 100 TB ASR pre-processing pass
    uses.

    Returns (media_id, chunk_idx, start_ms, end_ms, start_byte,
    n_chunk_bytes, chunk_bytes).
    """
    if chunk_ms < 1:
        raise ValueError(f"chunk_ms must be >= 1: {chunk_ms}")
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    n_bytes = F.length("content").cast("long")
    n_chunks = F.ceil(dur / F.lit(chunk_ms)).cast("long")
    rows = (
        media.where((F.col("kind") == "audio") & (dur > 0))
        .select("media_id", "content", dur.alias("dur"), n_bytes.alias("nb"),
                n_chunks.alias("nc"))
        .select(
            "media_id", "content", "dur", "nb",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("nc") - 1)).alias("i"),
        )
    )
    start_ms = F.col("i") * chunk_ms
    end_ms = F.least(start_ms + chunk_ms, F.col("dur"))
    # integer floor division via expr's div (both operands LONG) —
    # DuckDB's // mirrors it exactly
    start_byte = F.expr(f"nb * (i * {chunk_ms}) div dur")
    end_byte = F.expr(f"nb * least(i * {chunk_ms} + {chunk_ms}, dur) div dur")
    return rows.select(
        "media_id",
        F.col("i").cast("long").alias("chunk_idx"),
        start_ms.cast("long").alias("start_ms"),
        end_ms.cast("long").alias("end_ms"),
        start_byte.cast("long").alias("start_byte"),
        (end_byte - start_byte).cast("long").alias("n_chunk_bytes"),
        F.col("content").substr(
            (start_byte + 1).cast("int"), (end_byte - start_byte).cast("int")
        ).alias("chunk_bytes"),
    )


def patch_grid(media: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch grid over the image subset: one row per
    ``patch × patch`` tile of each image's (metadata) dimensions, with
    its grid position and pixel origin — the tokenization step of a
    vision-transformer pipeline expressed as pure arithmetic over the
    metadata (the per-patch pixel decode is the documented codec
    stub, same contract as frame sampling).

    Map-only explode: image count → image count × (w/patch)·(h/patch)
    rows, no shuffle. Images whose dimensions don't divide evenly
    drop the ragged right/bottom margin (floor grid), mirroring the
    standard ViT center-crop-then-patch convention.
    """
    if patch < 1:
        raise ValueError(f"patch must be positive: {patch}")
    imgs = media.where(F.col("kind") == "image").select(
        "media_id",
        F.floor(F.col("meta.width") / patch).cast("long").alias("cols"),
        F.floor(F.col("meta.height") / patch).cast("long").alias("rows"),
        "content",
    )
    g = imgs.where((F.col("cols") > 0) & (F.col("rows") > 0)).select(
        "media_id",
        "cols",
        "content",
        F.explode(F.sequence(F.lit(0), F.col("rows") * F.col("cols") - 1)).alias(
            "patch_idx"
        ),
    )
    row = (F.col("patch_idx") / F.col("cols")).cast("long")
    col = F.col("patch_idx") % F.col("cols")
    return g.select(
        "media_id",
        F.col("patch_idx").cast("long").alias("patch_idx"),
        row.alias("grid_row"),
        col.alias("grid_col"),
        (col * patch).cast("long").alias("x0"),
        (row * patch).cast("long").alias("y0"),
        F.xxhash64(F.col("content"), F.col("patch_idx")).alias("patch_token"),
    )
