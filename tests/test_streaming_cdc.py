"""Streaming CDC-apply sink (foreachBatch MERGE over versioned parquet)
and RocksDB state store: the streaming-hardening items from round 1's
NOTES/VERDICT."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.sources.io import load_table
from map_reduce_framework_using_python_spark.streaming.cdc import (
    apply_cdc_stream,
    current_version,
    init_table,
    read_table,
)
from map_reduce_framework_using_python_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
)
from tests.conftest import SF_SMOKE


def _seed(spark):
    # Initial dimension snapshot: users 0-4 with a sentinel total.
    return spark.createDataFrame(
        [(u, -1.0) for u in range(5)], "user_id long, total double"
    )


def _updates_stream(spark):
    # CDC update stream: per event, the user's new total; _ord orders
    # multiple updates for one key within a batch (latest wins).
    return read_events_stream(spark, SF_SMOKE).select(
        "user_id",
        F.col("value").alias("total"),
        F.struct("ts", "event_id").alias("_ord"),
    )


def _expected(spark, seed):
    """Batch oracle: latest event value per user merged over the seed."""
    ev = load_table(spark, SF_SMOKE, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("total")
    )
    kept = seed.join(latest.select("user_id"), "user_id", "left_anti")
    return {tuple(r) for r in kept.unionByName(latest).collect()}


def test_cdc_apply_stream_matches_batch_merge(spark, tmp_path):
    root = str(tmp_path / "dim")
    init_table(_seed(spark), root)
    apply_cdc_stream(
        _updates_stream(spark),
        root,
        key="user_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        order_col="_ord",
    )
    got = {tuple(r) for r in read_table(spark, root).collect()}
    assert got == _expected(spark, _seed(spark))
    # No user appears twice (MERGE, not append).
    n_keys = read_table(spark, root).select("user_id").distinct().count()
    assert n_keys == read_table(spark, root).count()


def test_cdc_apply_rerun_is_idempotent(spark, tmp_path):
    """Replaying the drained stream against the same checkpoint applies
    nothing new: table version and contents are unchanged (the
    exactly-once contract of checkpointed foreachBatch)."""
    root = str(tmp_path / "dim")
    init_table(_seed(spark), root)
    ckpt = str(tmp_path / "ckpt")
    apply_cdc_stream(_updates_stream(spark), root, "user_id", ckpt, order_col="_ord")
    v1 = current_version(root)
    rows1 = {tuple(r) for r in read_table(spark, root).collect()}
    apply_cdc_stream(_updates_stream(spark), root, "user_id", ckpt, order_col="_ord")
    assert current_version(root) == v1
    assert {tuple(r) for r in read_table(spark, root).collect()} == rows1


def test_rocksdb_state_store_stateful_totals(spark):
    """applyInPandasWithState runs on the RocksDB state store provider
    (disk-backed state — the 100 TB configuration, where key cardinality
    exceeds executor heap) and produces the same final states as the
    default in-memory HDFS-backed provider."""
    from map_reduce_framework_using_python_spark.streaming.stateful import (
        stateful_user_totals,
    )

    def run(provider: str | None):
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key, None)
        if provider:
            spark.conf.set(key, provider)
        try:
            out = run_available_now(
                stateful_user_totals(read_events_stream(spark, SF_SMOKE)),
                f"st_cdc_{uuid.uuid4().hex[:8]}",
                output_mode="update",
            )
            latest = out.groupBy("user_id").agg(
                F.max("n_events").alias("n_events"),
                F.max_by("total_value", "n_events").alias("total_value"),
            )
            return {tuple(r) for r in latest.collect()}
        finally:
            if provider:
                if old:
                    spark.conf.set(key, old)
                else:
                    spark.conf.unset(key)

    rocks = run(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    default = run(None)
    assert rocks == default and len(rocks) > 0


def test_time_travel_versions(spark, tmp_path):
    """Copy-on-write retains history: after the CDC apply, the initial
    snapshot is still readable as-of 'vinit' (Delta-style VERSION AS OF
    mechanics on the pointer-file commit protocol)."""
    from map_reduce_framework_using_python_spark.streaming.cdc import (
        list_versions,
        read_version,
    )

    root = str(tmp_path / "dim")
    init_table(_seed(spark), root)
    apply_cdc_stream(
        _updates_stream(spark), root, "user_id", str(tmp_path / "ckpt"), order_col="_ord"
    )
    versions = list_versions(root)
    assert versions[0] == "vinit" and len(versions) >= 2
    asof_init = {tuple(r) for r in read_version(spark, root, "vinit").collect()}
    assert asof_init == {tuple(r) for r in _seed(spark).collect()}
    # Latest version == the live pointer's contents.
    live = {tuple(r) for r in read_table(spark, root).collect()}
    assert {tuple(r) for r in read_version(spark, root, versions[-1]).collect()} == live


def test_vacuum_prunes_history_keeps_live(spark, tmp_path):
    """Retention keeps the live version + keep_last most recent others;
    pruned versions stop resolving, the live table is untouched."""
    import pytest

    from map_reduce_framework_using_python_spark.streaming.cdc import (
        list_versions,
        read_version,
        vacuum,
    )

    root = str(tmp_path / "dim")
    init_table(_seed(spark), root)
    apply_cdc_stream(
        _updates_stream(spark), root, "user_id", str(tmp_path / "ckpt"), order_col="_ord"
    )
    before = list_versions(root)
    assert len(before) >= 2
    live = {tuple(r) for r in read_table(spark, root).collect()}

    removed = vacuum(root, keep_last=0)

    assert removed == before[:-1]  # everything but the live (latest) version
    assert list_versions(root) == [before[-1]]
    assert {tuple(r) for r in read_table(spark, root).collect()} == live
    with pytest.raises(FileNotFoundError):
        read_version(spark, root, "vinit")


def test_cdc_replay_onto_live_version_is_safe(spark, tmp_path):
    """Crash-window replay (ADVICE r2): when the live pointer already
    names v<batch_id>, re-running the MERGE would read root/v<batch_id>
    and overwrite the same path — Spark refuses. The sink publishes via
    a temp dir + rename swap, so the batch re-applies cleanly (batch
    ids are only unique per checkpoint — a fresh checkpoint may deliver
    NEW data as batch 0, so skipping by id would lose data). Simulated
    with a FRESH checkpoint redelivering the same source while v0 is
    live: version name and contents must be unchanged."""
    root = str(tmp_path / "dim")
    init_table(_seed(spark), root)
    apply_cdc_stream(
        _updates_stream(spark), root, "user_id",
        str(tmp_path / "ckpt1"), order_col="_ord",
    )
    v_after = current_version(root)
    rows_after = {tuple(r) for r in read_table(spark, root).collect()}

    # Fresh checkpoint ⇒ the drained source is redelivered as batch 0.
    apply_cdc_stream(
        _updates_stream(spark), root, "user_id",
        str(tmp_path / "ckpt2"), order_col="_ord",
    )
    assert current_version(root) == v_after
    assert {tuple(r) for r in read_table(spark, root).collect()} == rows_after


def test_cdc_recovers_mid_swap_crash(spark, tmp_path):
    """Crash between the publish renames leaves the live version only at
    v<id>__old with the pointer dangling; the next replay must restore
    it BEFORE side-dir cleanup (deleting __old first would destroy the
    only copy) and then re-apply the batch."""
    import os

    root = str(tmp_path / "dim")
    init_table(_seed(spark), root)
    apply_cdc_stream(
        _updates_stream(spark), root, "user_id",
        str(tmp_path / "ckpt1"), order_col="_ord",
    )
    rows_good = {tuple(r) for r in read_table(spark, root).collect()}
    live = current_version(root)

    # Simulate the mid-swap crash: live dir stranded at __old, plus a
    # stale half-written __tmp.
    os.rename(live, live + "__old")
    os.makedirs(live + "__tmp")
    assert not os.path.exists(live)

    apply_cdc_stream(
        _updates_stream(spark), root, "user_id",
        str(tmp_path / "ckpt2"), order_col="_ord",
    )
    assert {tuple(r) for r in read_table(spark, root).collect()} == rows_good
    assert not os.path.exists(live + "__old")
    assert not os.path.exists(live + "__tmp")


def test_versions_survive_swap_transient_dirs_and_heal(spark, tmp_path):
    """r7 streaming review: v5__old / v5__tmp must not crash
    list_versions (the old int parse did, exactly when a crashed table
    needed inspection), and a dangling v5__old with no v5 — the
    mid-swap crash shape, possibly the LIVE version — is healed by ANY
    reader (read_table / list_versions), not only a replay of the same
    batch id."""
    import os
    import shutil

    from map_reduce_framework_using_python_spark.streaming.cdc import (
        init_table,
        list_versions,
        read_table,
    )

    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    init_table(df, root)
    # commit a numbered version by hand (the publish path's end state)
    df.write.parquet(os.path.join(root, "v5"))
    with open(os.path.join(root, "_CURRENT"), "w") as fh:
        fh.write("v5")
    # swap-transient litter alongside the live version
    os.makedirs(os.path.join(root, "v6__tmp"))
    assert list_versions(root) == ["vinit", "v5"]  # no crash, no transients
    # the mid-swap crash: live version renamed aside, new one never landed
    os.rename(os.path.join(root, "v5"), os.path.join(root, "v5__old"))
    got = {tuple(r) for r in read_table(spark, root).collect()}  # heals
    assert got == {(1, "a"), (2, "b")}
    assert os.path.isdir(os.path.join(root, "v5"))
    assert not os.path.isdir(os.path.join(root, "v5__old"))
    shutil.rmtree(os.path.join(root, "v6__tmp"))
