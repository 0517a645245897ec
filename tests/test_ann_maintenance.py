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
