"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

North-star extension (SURVEY.md §2.B bottom row). The container has no
image/audio codecs, so the decode kernels are STUBBED — clearly marked,
deterministic fakes behind ``_decode_stub`` — while everything Spark
cares about is real and tested: the schema contract, the binary source,
the ``mapInPandas`` batch iteration, partition sizing, and the
feature-vector output shape.

Scale design: blobs stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak usage);
metadata-only predicates (media_type, n_bytes) prune before any decode
runs; decoded features are fixed-width vectors, so downstream joins/ANN
never touch the raw bytes again.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Schema contract for a multimodal asset table.
ASSET_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, content binary"
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, "
    f"feature array<double>, decode_ok boolean"
)


def binary_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a typed multimodal asset table from the documents corpus
    (text bytes standing in for media blobs — the plumbing under test is
    identical for real image/audio content)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw files as binary rows (Spark's ``binaryFile`` source):
    path, modificationTime, length, content."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _decode_stub(content: bytes, media_type: str) -> list[float] | None:
    """STUB decode kernel.

    Real deployments would dispatch on ``media_type`` to PIL / torchaudio
    / pyav here (not installed in this container). The stub is a
    deterministic fake: an 8-dim feature from the content's sha256, so
    tests can pin exact outputs. Raises ``NotImplementedError`` for
    unknown media types — the marked seam where real codecs plug in.
    """
    if media_type not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for media_type={media_type}")
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(assets: DataFrame, batch_size: int | None = None) -> DataFrame:
    """Decode + featurize every asset via ``mapInPandas`` (Arrow batches;
    one Python process per partition, vectorized columns in/out — never
    a row-at-a-time UDF)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for content, mt in zip(pdf["content"], pdf["media_type"]):
                try:
                    feats.append(_decode_stub(bytes(content), mt))
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return assets.mapInPandas(decode_batches, schema=FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled offset.
    The sampler itself is metadata math (JVM-side ``sequence``), so a
    100 TB corpus plans its sampling without touching a single blob;
    only the sampled offsets would be handed to the (stubbed) decoder."""
    return assets.filter(F.col("media_type") == "video/mp4").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )
