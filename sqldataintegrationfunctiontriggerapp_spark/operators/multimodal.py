"""Multimodal column plumbing (north-star C7): image/audio/video as opaque
binary columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step itself is STUBBED (no image/audio libraries in this
container): `decode_stub=True` produces deterministic fake features;
`decode_stub=False` raises NotImplementedError where a real libvips/ffmpeg
call would go. Everything around the stub -- schema, binary handling,
mapInPandas batch iteration, partition sizing -- is real and tested.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; with
`spark.sql.files.maxPartitionBytes` at 128 MB a 100 TB media table yields
~800k splits processed independently. mapInPandas streams Arrow batches, so
executor memory is bounded by batch size (spark.sql.execution.arrow.
maxRecordsPerBatch), not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, content binary, media_type string, "
    "byte_len bigint, content_md5 string"
)

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, byte_len bigint, "
    "content_md5 string, width int, height int, n_channels int, "
    "feature_0 double, feature_1 double"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: text encoded to a
    binary content column + typed metadata -- the engine's canonical
    multimodal layout (binary payload, metadata columns beside it)."""
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.length(content).cast("long").alias("byte_len"),
        F.md5(content).alias("content_md5"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas. With decode_stub, features
    are deterministic functions of the bytes (testable end-to-end); without,
    this is the seam where a real decoder plugs in."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires an image/audio library; "
                    "install and replace this branch"
                )
            content = pdf["content"]
            lens = content.map(len)
            # deterministic fake 'decode': dimensions and features derived
            # from byte statistics so tests can assert exact values
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "content_md5": pdf["content_md5"],
                    "width": (lens % 640).astype("int32"),
                    "height": (lens % 480).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "feature_0": content.map(lambda b: (sum(b[:64]) % 1000) / 1000.0),
                    "feature_1": lens / 1000.0,
                }
            )
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled offset
    (for video this is the keyframe-extraction shape: explode a binary blob
    into per-frame rows executor-side, no driver involvement)."""
    n_frames = (F.col("byte_len") / every_n_bytes).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_no"),
    ).withColumn("byte_offset", F.col("frame_no") * every_n_bytes)
