"""Multimodal-column queries (north-star extension): exercise the
binary-column plumbing end-to-end against the driver tables.

No media files exist in the testdata, so blobs are synthesized
deterministically from `documents.text` (utf-8 bytes) — the POINT is
the Spark-side pipeline: binary column + typed metadata struct →
Arrow-batched ``mapInPandas`` decode/feature-extract → typed feature
output. The codec itself is the documented stub
(operators/multimodal._decode_stub).

Rows-only check (content hashing via the stub is not SQL-expressible),
but qx01's n_bytes/content_hash ARE asserted against DuckDB-computable
values in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_wrangler_spark.operators.multimodal import extract_features
from ml_data_wrangler_spark.plans._util import t
from ml_data_wrangler_spark.plans.registry import query


def synth_media(spark, sf_dir):
    """documents → MEDIA_SCHEMA-shaped frame: utf-8 blob + metadata."""
    return t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit("synthetic").alias("format"),
        ).alias("meta"),
    )


@query("qx01_multimodal_features")  # stub codec → rows-only oracle
def qx01(spark, sf_dir):
    """Binary-column feature extraction: synthesized media blobs →
    mapInPandas (Arrow batches) → (media_id, kind, n_bytes,
    content_hash, feature array<float>)."""
    feats = extract_features(synth_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "content_hash",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
        F.size("feature").alias("feature_dim"),
    )
