"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

North-star extension (SURVEY.md §2.B bottom row). Decode kernels — ALL
real as of round 5, no stub kernel remains:

- ``audio/wav``, ``image/x-portable-pixmap``, ``image/png`` decode
  FOR REAL — pure-Python RIFF/PCM, P6, and zlib+unfilter PNG parsers
  over numpy/stdlib (:mod:`.codecs`), no codec libraries needed; tests
  pin exact features from exact bytes (and pin PNG == PPM on
  pixel-identical images).
- ``video/mp4`` parses the ISO BMFF CONTAINER for real (ftyp/moov/
  mvhd/tkhd/hdlr/stsd: duration, track layout, dimensions, codec
  fourcc). Sample data is NOT decoded — no h264 codec exists in this
  environment; frame-pixel features are the one documented pyav
  plug-in seam (``NotImplementedError`` on unknown media types marks
  where it goes).
- ``text/plain`` computes byte-statistics features (line/word counts,
  ascii/alpha/digit/space ratios).

The Spark side is real throughout: the schema contract, the binary
source, the ``mapInPandas`` batch iteration, partition sizing, and the
feature-vector output shape.

Scale design: blobs stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak usage);
metadata-only predicates (media_type, n_bytes) prune before any decode
runs; decoded features are fixed-width vectors, so downstream joins/ANN
never touch the raw bytes again.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.codecs import (
    N_FEATURES as FEATURE_DIM,
)

#: Schema contract for a multimodal asset table.
ASSET_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, content binary"
)

FEATURES_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, "
    f"feature array<double>, decode_ok boolean"
)


def binary_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a typed multimodal asset table from the documents corpus:
    text bytes labeled 1/3 ``text/plain`` (decodes for real via the
    byte-statistics featurizer) and 2/3 ``video/mp4`` (text bytes are
    NOT a valid ISO BMFF stream, so these rows exercise the
    flag-don't-fail path: ``decode_ok = false``, task survives — the
    mislabeled/corrupt-blob mix every 100 TB crawl contains). For
    decodable media bytes use :func:`synthetic_media_assets`."""
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
    (P6 gradient), PNG (zlib-compressed gradient), and MP4 (ISO BMFF
    ftyp/moov/trak boxes) synthesized deterministically from
    ``doc_id`` — the decoders parse genuine headers, samples,
    compressed scanlines, and container boxes, not fakes. Generated in
    Arrow batches (``mapInPandas``), exactly how real blobs would arrive
    from a binaryFile scan."""
    from map_reduce_framework_using_python_spark.operators.codecs import (
        synth_mp4,
        synth_png,
        synth_ppm,
        synth_wav,
    )

    _SYNTH = {
        0: ("audio/wav", synth_wav),
        1: ("image/x-portable-pixmap", synth_ppm),
        2: ("image/png", synth_png),
        3: ("video/mp4", synth_mp4),
    }

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            blobs = [_SYNTH[i % 4][1](i) for i in ids]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "media_type": [_SYNTH[i % 4][0] for i in ids],
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


def _decode(content: bytes, media_type: str) -> list[float]:
    """Dispatch on media type: every supported type has a REAL decoder
    (:mod:`.codecs` — WAV/PPM/PNG down to pixels/samples, MP4 to full
    container metadata, text to byte statistics);
    ``NotImplementedError`` for everything else — the plug-in seam
    where a codec library (pyav etc.) would slot in. ``ValueError``
    from a decoder means malformed bytes."""
    from map_reduce_framework_using_python_spark.operators.codecs import (
        decode_mp4,
        decode_png,
        decode_ppm,
        decode_text,
        decode_wav,
    )

    if media_type == "audio/wav":
        return decode_wav(content)
    if media_type == "image/x-portable-pixmap":
        return decode_ppm(content)
    if media_type == "image/png":
        return decode_png(content)
    if media_type == "video/mp4":
        return decode_mp4(content)
    if media_type == "text/plain":
        return decode_text(content)
    raise NotImplementedError(f"no decoder for media_type={media_type}")


def extract_features(assets: DataFrame, batch_size: int | None = None) -> DataFrame:
    """Decode + featurize every asset via ``mapInPandas`` (Arrow batches;
    one Python process per partition, vectorized columns in/out — never
    a row-at-a-time UDF)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for content, mt in zip(pdf["content"], pdf["media_type"]):
                if content is None:
                    # NULL content is allowed by ASSET_SCHEMA and routine
                    # in a real crawl table; bytes(None) would TypeError
                    # past the catch below and kill the task.
                    feats.append(None)
                    oks.append(False)
                    continue
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
    only the sampled offsets would be handed to a frame decoder (the
    pyav plug-in seam — the container parser yields the metadata)."""
    # n_bytes > 0: an empty blob must plan ZERO offsets — greatest(-1, 0)
    # would otherwise emit a phantom offset 0 into a blob with no bytes.
    return assets.filter(
        (F.col("media_type") == "video/mp4") & (F.col("n_bytes") > 0)
    ).select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_bytes") - 1, F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )
