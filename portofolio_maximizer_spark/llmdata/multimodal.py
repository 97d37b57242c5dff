"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Charter extension (SURVEY.md §7.1 step 10). Images/audio/video ride Spark
as `binary` columns with a metadata struct; decode / feature-extraction is
an Arrow-batched `mapInPandas` stage. The decode itself is STUBBED here
(no imaging/audio libs in this container — see `decode_image`), but the
Spark-side contract is real and tested: schema, batch iteration, partition
behavior, and the deterministic fake featurizer.

At 100 TB the payloads dominate IO: the schema keeps metadata in ordinary
columns so Catalyst can prune/filter WITHOUT touching the binary blob
(parquet column pruning skips the payload pages entirely when a query
only reads metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("payload_bytes", LongType()),
        StructField("content_hash", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column from text (the testdata has no
    real media); in production this is the raw bytes column as landed."""
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias(
            "payload_bytes"
        ),
        F.md5(F.col(text_col)).alias("content_hash"),
    )


def decode_image(payload: bytes) -> object:
    """REAL DECODE STUB — requires an imaging library not present in this
    container. The Spark plumbing around it (batching, schema, partition
    parallelism) is exercised with `fake_features` instead."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. Pillow); "
        "not available in this environment"
    )


def fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in featurizer: derives (width, height, n_frames)
    from payload bytes so tests are reproducible without codecs."""
    n = len(payload)
    return (64 + n % 512, 64 + (n * 7) % 512, 1 + n % 16)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` streams record batches through Python once — the payload
    bytes never round-trip more than necessary, and partitions process
    independently (shard by any key upstream; no shuffle here).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload_bytes"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("scale_x1000", IntegerType()),
    ]
)


def resize_plan(features: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning (charter: image resize): computes the aspect-
    preserving target geometry from METADATA ONLY — the actual pixel
    resample would live inside the decode stub (`decode_image`), but the
    geometry math, schema and partition behavior are the real pipeline.
    Keeping this JVM-side means a 100 TB resize job prunes to metadata
    columns for planning and only streams payload bytes through the
    Arrow stage that materializes output images."""
    scale = F.least(
        F.lit(target) / F.col("width"), F.lit(target) / F.col("height")
    )
    return features.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
        F.floor(scale * 1000).cast("int").alias("scale_x1000"),
    )


def sample_frames(features: DataFrame, k: int = 4) -> DataFrame:
    """Frame sampling (charter: video frame-sample): emit up to ``k``
    evenly-spaced frame indices per media row — `explode(sequence)` over
    metadata, one row in → k out, no payload touched until the decode
    stage consumes (doc_id, frame_idx) pairs."""
    n = F.col("n_frames")
    idx = F.explode(F.sequence(F.lit(0), F.least(n, F.lit(k)) - 1))
    return features.select("doc_id", "n_frames", idx.alias("sample_slot")).select(
        "doc_id",
        "n_frames",
        "sample_slot",
        F.floor(F.col("sample_slot") * n / F.least(n, F.lit(k)))
        .cast("int")
        .alias("frame_idx"),
    )
