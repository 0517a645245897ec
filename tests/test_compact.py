"""Small-file compaction (operators/compact.py): fewer files, same
rows, atomic swap, optional hash-clustering by key."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.compact import compact_parquet


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10_000).withColumn("k", F.col("id") % 7).repartition(
        64
    ).write.parquet(path)
    before = spark.read.parquet(path)
    want = sorted(r["id"] for r in before.collect())
    assert sum(1 for f in os.listdir(path) if f.endswith(".parquet")) == 64

    stats = compact_parquet(spark, path, target_rows=5_000)

    assert stats["files_before"] == 64
    assert stats["files_after"] == 2
    assert stats["rows"] == 10_000
    after = spark.read.parquet(path)
    assert sorted(r["id"] for r in after.collect()) == want
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_compact_by_key_clusters_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(1_000).withColumn("k", F.col("id") % 4).repartition(
        32
    ).write.parquet(path)

    compact_parquet(spark, path, target_rows=250, by=["k"])

    # hash-clustered: each key's rows live in exactly one file (two keys
    # may share a file on hash collision; empty partitions write no file)
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    assert 1 <= len(files) <= 4
    per_file_keys = [
        {r["k"] for r in spark.read.parquet(f).select("k").distinct().collect()}
        for f in files
    ]
    seen = set()
    for keys in per_file_keys:
        assert seen.isdisjoint(keys)
        seen |= keys
    assert seen == {0, 1, 2, 3}


def test_compact_recovers_from_crashed_prior_run(spark, tmp_path):
    """Crash between the two swap renames leaves the live data stranded
    at path__compact_old with path missing; leftover tmp/old dirs from
    other crash points must not fail the next run (ADVICE r2)."""
    import shutil

    path = str(tmp_path / "frag")
    spark.range(100).repartition(8).write.parquet(path)
    want = sorted(r["id"] for r in spark.read.parquet(path).collect())

    # Simulate the mid-swap crash: data at __compact_old, path gone,
    # plus a stale half-written __compact_tmp.
    os.rename(path, path + "__compact_old")
    os.makedirs(path + "__compact_tmp")

    stats = compact_parquet(spark, path, target_rows=100)

    assert stats["rows"] == 100
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == want
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_compact_clears_stale_dirs_when_live_intact(spark, tmp_path):
    """Leftover tmp/old with the live dir intact (crash during the final
    rmtree) must be cleared, not EEXIST the renames."""
    path = str(tmp_path / "frag")
    spark.range(50).repartition(4).write.parquet(path)
    spark.range(5).write.parquet(path + "__compact_old")  # stale survivor
    os.makedirs(path + "__compact_tmp")

    stats = compact_parquet(spark, path, target_rows=50)
    assert stats["rows"] == 50
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == list(range(50))
