"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

North-star extension (SURVEY.md §2.B bottom row). Decode kernels:

- ``audio/wav``, ``image/x-portable-pixmap``, and ``image/png`` decode
  FOR REAL — pure-Python RIFF/PCM, P6, and zlib+unfilter PNG parsers
  over numpy/stdlib (:mod:`.codecs`), no codec libraries needed; tests
  pin exact features from exact bytes (and pin PNG == PPM on
  pixel-identical images).
- ``video/mp4`` remains the one STUB (clearly marked, deterministic
  sha256 fake) — the container has no h264 codec; this is the
  documented seam where pyav plugs in.

Everything Spark cares about is real either way: the schema contract,
the binary source, the ``mapInPandas`` batch iteration, partition
sizing, and the feature-vector output shape.

Scale design: blobs stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak usage);
metadata-only predicates (media_type, n_bytes) prune before any decode
runs; decoded features are fixed-width vectors, so downstream joins/ANN
never touch the raw bytes again.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    (text bytes standing in for opaque blobs — the plumbing under test
    is identical for real media content). Types here all route to the
    stub kernel (PNG now decodes for real, so text bytes can't pose as
    it); for real decodable bytes use :func:`synthetic_media_assets`."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 1, "text/plain")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def synthetic_media_assets(docs: DataFrame) -> DataFrame:
    """Asset table with REAL media bytes: WAV (RIFF/PCM16 sine), PPM
    (P6 gradient), and PNG (zlib-compressed gradient) synthesized
    deterministically from ``doc_id`` — the decoders parse genuine
    headers, samples, and compressed scanlines, not fakes. Generated in
    Arrow batches (``mapInPandas``), exactly how real blobs would arrive
    from a binaryFile scan."""
    from map_reduce_framework_using_python_spark.operators.codecs import (
        synth_png,
        synth_ppm,
        synth_wav,
    )

    _SYNTH = {
        0: ("audio/wav", synth_wav),
        1: ("image/x-portable-pixmap", synth_ppm),
        2: ("image/png", synth_png),
    }

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            blobs = [_SYNTH[i % 3][1](i) for i in ids]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": [_SYNTH[i % 3][0] for i in ids],
                    "n_bytes": [len(b) for b in blobs],
                    "content": blobs,
                }
            )

    return docs.select("doc_id").mapInPandas(gen, schema=ASSET_SCHEMA)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw files as binary rows (Spark's ``binaryFile`` source):
    path, modificationTime, length, content."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _decode_stub(content: bytes, media_type: str) -> list[float]:
    """STUB decode kernel for formats whose codecs aren't in this
    container (MP4 needs h264). A deterministic fake — an 8-dim feature
    from the content's sha256 — so tests can pin exact outputs."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _decode(content: bytes, media_type: str) -> list[float]:
    """Dispatch on media type: REAL decoders where the format permits
    (WAV, PPM, PNG — :mod:`.codecs`), stub where the container lacks
    codecs (MP4), ``NotImplementedError`` for everything else (the
    plug-in seam). ``ValueError`` from a real decoder means malformed
    bytes."""
    from map_reduce_framework_using_python_spark.operators.codecs import (
        decode_png,
        decode_ppm,
        decode_wav,
    )

    if media_type == "audio/wav":
        return decode_wav(content)
    if media_type == "image/x-portable-pixmap":
        return decode_ppm(content)
    if media_type == "image/png":
        return decode_png(content)
    if media_type in ("video/mp4", "text/plain"):
        return _decode_stub(content, media_type)
    raise NotImplementedError(f"no decoder for media_type={media_type}")


def extract_features(assets: DataFrame, batch_size: int | None = None) -> DataFrame:
    """Decode + featurize every asset via ``mapInPandas`` (Arrow batches;
    one Python process per partition, vectorized columns in/out — never
    a row-at-a-time UDF)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for content, mt in zip(pdf["content"], pdf["media_type"]):
                try:
                    feats.append(_decode(bytes(content), mt))
                    oks.append(True)
                except (NotImplementedError, ValueError, zlib.error, struct.error):
                    # Unknown type or malformed bytes: flagged row, not
                    # a failed task — corrupt blobs are routine at 100 TB.
                    # zlib/struct cover CRC-valid chunks hiding corrupt
                    # deflate data or truncated fixed-width headers.
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
