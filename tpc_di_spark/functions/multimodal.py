"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — typed metadata structs,
Arrow-batched ``mapInPandas`` transforms, partition-size-aware batching —
while the actual codec work is stubbed behind ``_decode_image_bytes``
(the decode libraries are not installed in this environment; the stub is
a deterministic fake so tests can assert the full pipeline shape).

Layout convention (one row per asset):
  asset_id: long, modality: string ('image'|'audio'|'video'),
  content: binary, meta: struct<width:int, height:int, sample_rate:int,
  duration_ms:int, codec:string>
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ]
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField("meta", ASSET_META, True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("content_hash", StringType(), True),
        StructField("feat_mean", IntegerType(), True),
    ]
)


def _decode_image_bytes(buf: bytes) -> dict:
    """STUB — real implementation requires an image codec library (not
    installed here). Deterministic fake: 'decodes' byte statistics so the
    distributed plumbing (schema, batching, hashing) is fully exercised.
    Replace the body with PIL/libvips/ffmpeg calls in production."""
    if buf is None:
        return {"n_bytes": None, "feat_mean": None}
    return {"n_bytes": len(buf), "feat_mean": int(sum(buf) / max(len(buf), 1))}


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    ``mapInPandas`` streams record batches, so executor memory is bounded
    by the Arrow batch size, not the partition size — the correct shape
    for multi-MB binary payloads at 100 TB (pair with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned to asset size).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["content"].map(_decode_image_bytes)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "content_hash": [
                        hashlib.md5(b).hexdigest() if b is not None else None
                        for b in pdf["content"]
                    ],
                    "feat_mean": [d["feat_mean"] for d in decoded],
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per frame to extract, computed
    from metadata only (no decode) — the cheap pre-pass that sizes the
    decode stage. Pure column expressions."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )
