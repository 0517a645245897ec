"""Pins for the auto-maintenance planner
(operators/ann_index.plan_maintenance): decisions must FLIP exactly as
the lifecycle advances — build → noop, streamed appends → compact,
compact → noop, small delete → compact (broadcast comfort), big delete
→ rebuild, rebuild → noop — and each maintenance verb must CLEAR the
decision that called for it. The registered form is
ns_index_maintenance_plan (plans/ann_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ann_index import (
    append_to_lsh_index,
    build_lsh_index,
    compact_lsh_index,
    delete_from_index,
    plan_maintenance,
    rebuild_lsh_index,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_decisions_flip_with_lifecycle(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    idx = str(tmp_path / "idx")
    build_lsh_index(emb, idx, n_planes=4, seed=42)

    def plan(**knobs):
        return plan_maintenance({"idx": idx}, **knobs)[0]

    assert plan()["decision"] == "noop"

    # streamed re-deliveries fan the layout out → compact
    batch = emb.limit(40)
    for _ in range(5):
        append_to_lsh_index(batch, idx)
    d = plan()
    assert d["decision"] == "compact" and "append fan-out" in d["reason"]
    compact_lsh_index(spark, idx)
    assert plan()["decision"] == "noop"

    # a ~10% takedown → compact (tombstone set vs broadcast comfort)
    victims = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % 10 == 1)
        .select("vec_id")
        .collect()
    ]
    delete_from_index(victims, idx, spark=spark)
    d = plan()
    assert d["decision"] == "compact" and "broadcast comfort" in d["reason"]
    assert 0.05 <= d["tombstone_frac"] < 0.3
    compact_lsh_index(spark, idx)
    assert plan()["decision"] == "noop"

    # a mass takedown → rebuild (quantizers fit on a corpus the layout
    # no longer stores)
    survivors = emb.filter(F.col("vec_id") % 2 != 0)
    delete_from_index(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), idx
    )
    d = plan()
    assert d["decision"] == "rebuild" and d["tombstone_frac"] >= 0.3
    rebuild_lsh_index(survivors, idx, spark=spark, ids_already_filtered=True)
    assert plan()["decision"] == "noop"


def test_delete_log_file_fanout_triggers_compact(spark, tmp_path):
    """Many tiny delete files are their own signal: every probe's
    anti-join reads the whole log dir."""
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    idx = str(tmp_path / "idx")
    build_lsh_index(emb, idx, n_planes=4, seed=42)
    for i in range(3):
        delete_from_index([1000 + i], idx, spark=spark)
    d = plan_maintenance(
        {"idx": idx}, max_tombstone_files=3, compact_tombstone_frac=0.99
    )[0]
    assert d["decision"] == "compact" and "file fan-out" in d["reason"]


def test_registry_query_decisions(spark):
    from map_reduce_framework_using_python_spark.plans import REGISTRY

    got = {
        r["index"]: r
        for r in REGISTRY["ns_index_maintenance_plan"].fn(spark, SF_SMOKE).collect()
    }
    assert got["fresh"]["decision"] == "noop"
    assert got["appended"]["decision"] == "compact"
    assert got["deleted"]["decision"] == "rebuild"
    # the signals ride along for auditability
    assert got["deleted"]["tombstone_frac"] >= 0.3
    assert got["appended"]["files_per_partition"] >= 4


def test_auto_maintain_executes_and_clears_decisions(spark, tmp_path):
    """The executor half: compact clears the fan-out, rebuild (with the
    executor doing the tombstone filtering) clears the mass-delete, the
    post-action re-plan is noop everywhere, and probes after the
    rebuild equal brute force over the survivors."""
    import shutil

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        auto_maintain,
        lsh_probe_index_batch,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    fresh = str(tmp_path / "fresh")
    build_lsh_index(emb, fresh, n_planes=4, seed=42)
    appended = str(tmp_path / "appended")
    shutil.copytree(fresh, appended)
    batch = emb.limit(40)
    for _ in range(5):
        append_to_lsh_index(batch, appended)
    deleted = str(tmp_path / "deleted")
    shutil.copytree(fresh, deleted)
    delete_from_index(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), deleted
    )

    rows = {
        r["index"]: r
        for r in auto_maintain(
            spark,
            {"fresh": fresh, "appended": appended, "deleted": deleted},
            # deliberately UNFILTERED: the executor must anti-join the
            # tombstones itself before the refit
            vectors={"deleted": emb},
        )
    }
    assert rows["fresh"]["action"] == "noop"
    assert rows["appended"]["action"] == "compact"
    assert rows["deleted"]["action"] == "rebuild"
    assert all(r["decision_after"] == "noop" for r in rows.values())

    # the rebuilt index answers exactly like one built on survivors
    survivors = emb.filter(F.col("vec_id") % 2 != 0)
    ref = str(tmp_path / "ref")
    build_lsh_index(survivors, ref, n_planes=4, seed=42)
    q = emb.filter(F.col("vec_id") < 8)
    got = sorted(map(tuple, lsh_probe_index_batch(
        spark, q, deleted, k=5, probe_hamming=2
    ).collect()))
    want = sorted(map(tuple, lsh_probe_index_batch(
        spark, q, ref, k=5, probe_hamming=2
    ).collect()))
    assert got == want and got


def test_auto_maintain_degrades_rebuild_to_compact_without_vectors(
    spark, tmp_path
):
    """No vectors → the purge half still lands (probes correct,
    tombstones retired) and the degradation is recorded."""
    import shutil

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        auto_maintain,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    idx = str(tmp_path / "idx")
    build_lsh_index(emb, idx, n_planes=4, seed=42)
    delete_from_index(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), idx
    )
    (row,) = auto_maintain(spark, {"idx": idx})
    assert row["decision"] == "rebuild"
    assert row["action"].startswith("compact (degraded")
    assert row["decision_after"] == "noop"


def test_auto_maintain_registry_query(spark):
    from map_reduce_framework_using_python_spark.plans import REGISTRY

    got = {
        r["index"]: r
        for r in REGISTRY["ns_index_auto_maintain"].fn(spark, SF_SMOKE).collect()
    }
    assert {(r["decision"], r["action"]) for r in got.values()} == {
        ("noop", "noop"), ("compact", "compact"), ("rebuild", "rebuild")
    }
    assert all(r["decision_after"] == "noop" for r in got.values())


def test_dedup_lane_mass_takedown_routes_to_purge(spark, tmp_path):
    """The dedup lanes under the same loop (r12): a minhash index with
    40% of its docs retracted plans COMPACT with the purge rationale
    (no quantizer to refit — never rebuild), auto_maintain executes
    compact_index, the tombstone log retires, and the decision clears."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        TOMBSTONE_DIR,
        auto_maintain,
    )
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_minhash_index,
        retract_docs_from_index,
    )

    d = load_table(spark, SF_SMOKE, "documents").limit(200)
    idx = str(tmp_path / "mh")
    build_minhash_index(d, idx, n=3, num_hashes=32, bands=16)
    assert plan_maintenance({"mh": idx})[0]["decision"] == "noop"
    retract_docs_from_index(
        d.filter(F.col("doc_id") % 5 != 4).select("doc_id"), idx
    )
    before = plan_maintenance({"mh": idx})[0]
    assert before["decision"] == "compact" and "purge" in before["reason"]
    (row,) = auto_maintain(spark, {"mh": idx})
    assert row["action"] == "compact" and row["decision_after"] == "noop"
    import os

    assert not os.path.isdir(os.path.join(idx, "buckets", TOMBSTONE_DIR))
