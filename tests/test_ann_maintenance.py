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


def test_auto_maintain_pq_lane_degrades_rebuild_to_compact(spark, tmp_path):
    """Flat PQ under the loop (r13 ADVICE): the planner treats pq as
    quantized (mass takedown → rebuild decision) but the lane has no
    in-place rebuilder — auto_maintain must DEGRADE to compact_pq_index
    (even with vectors offered), record the degradation, clear the
    decision, and a mixed index dict containing the pq lane must not
    abort the other lanes' pass."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        auto_maintain,
        delete_from_index,
    )
    from map_reduce_framework_using_python_spark.operators.pq import (
        build_pq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    pq_idx = str(tmp_path / "pq")
    build_pq_index(emb, pq_idx, m=4, k=4, seed=42)
    lsh_idx = str(tmp_path / "lsh")
    build_lsh_index(emb, lsh_idx, n_planes=4, seed=42)
    assert plan_maintenance({"pq": pq_idx})[0]["decision"] == "noop"

    delete_from_index(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), pq_idx
    )
    before = plan_maintenance({"pq": pq_idx})[0]
    assert before["kind"] == "pq" and before["decision"] == "rebuild"

    rows = {
        r["index"]: r
        for r in auto_maintain(
            spark, {"pq": pq_idx, "lsh": lsh_idx}, vectors={"pq": emb}
        )
    }
    assert rows["lsh"]["action"] == "noop"
    assert rows["pq"]["action"].startswith("compact (degraded")
    assert "no in-place rebuilder" in rows["pq"]["action"]
    assert rows["pq"]["decision_after"] == "noop"


def test_corrupt_live_data_file_fails_loud_tombstone_side_tolerated(
    spark, tmp_path
):
    """The planner's row counts come from parquet footers; an
    unreadable LIVE data file must PROPAGATE (silently undercounting
    data_rows inflates tombstone_frac — the direction that flips a
    cheap compact into a ~28x rebuild), while garbage on the tombstone
    side (appended concurrently by takedown streams) and under
    in-progress dirs stays tolerated (r13 ADVICE)."""
    import os

    import pytest

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        TOMBSTONE_DIR,
        delete_from_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    idx = str(tmp_path / "idx")
    build_lsh_index(emb, idx, n_planes=4, seed=42)
    delete_from_index([1], idx, spark=spark)

    # garbage tombstone-side file: tolerated (plan still lands)
    tomb_dir = os.path.join(idx, TOMBSTONE_DIR)
    with open(os.path.join(tomb_dir, "half-written.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert plan_maintenance({"idx": idx})[0]["decision"] in ("noop", "compact")

    # garbage under an in-progress dir: tolerated
    tmp_part = os.path.join(idx, "bucket=0", "_temporary")
    os.makedirs(tmp_part, exist_ok=True)
    with open(os.path.join(tmp_part, "inflight.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert plan_maintenance({"idx": idx})[0]["decision"] in ("noop", "compact")

    # garbage LIVE data file: the policy input is poisoned — fail loud
    part = next(
        d for d in os.listdir(idx)
        if d.startswith("bucket=") and os.path.isdir(os.path.join(idx, d))
    )
    with open(os.path.join(idx, part, "corrupt.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    with pytest.raises(Exception):
        plan_maintenance({"idx": idx})


def test_corrupt_live_file_fails_loud_in_flat_layout(spark, tmp_path):
    """r13 ADVICE (the '.' relpath hole): in a FLAT layout (pq codes —
    all live data files directly under the index root) a corrupt live
    parquet file must propagate exactly like a partition-dir file; the
    root is not an in-progress dot-dir. Tombstone-side garbage stays
    tolerated."""
    import os

    import pytest

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        TOMBSTONE_DIR,
        delete_from_index,
    )
    from map_reduce_framework_using_python_spark.operators.pq import (
        build_pq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    idx = str(tmp_path / "pq")
    build_pq_index(emb, idx, m=4, k=4, seed=42)
    delete_from_index([1], idx, spark=spark)

    # the flat PQ lane's live root is codes/ (tombstones ride inside it
    # — ann_index._tombstone_base)
    live_root = os.path.join(idx, "codes")

    # tombstone-side garbage: still tolerated in the flat layout
    tomb_dir = os.path.join(live_root, TOMBSTONE_DIR)
    with open(os.path.join(tomb_dir, "half-written.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert plan_maintenance({"pq": idx})[0]["decision"] in ("noop", "compact")

    # corrupt ROOT-LEVEL live file: must fail loud, not read as
    # an in-progress dir ('.' is not a dot-tmp name)
    with open(os.path.join(live_root, "corrupt.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    with pytest.raises(Exception):
        plan_maintenance({"pq": idx})


def test_rebuild_preserves_lloyd_quantizer_flavor(spark, tmp_path):
    """r13 ADVICE (medium): an index built with the deterministic
    Lloyd builders must be REBUILT by them — meta keeps the lloyd tag
    and its knobs, and the rebuilt index equals a fresh lloyd build on
    the survivors byte-for-byte at the probe level. A spark.ml-only
    knob (seed) refuses loudly instead of silently swapping flavor."""
    import pytest

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        _read_meta,
        build_ivf_index_lloyd,
        delete_from_index,
        ivf_probe_index_batch,
        rebuild_ivf_index,
    )
    from map_reduce_framework_using_python_spark.operators.ivfpq import (
        build_ivfpq_index_lloyd,
        ivfpq_probe_index_batch,
        rebuild_ivfpq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    survivors = emb.filter(F.col("vec_id") % 2 != 0)
    q = emb.filter(F.col("vec_id") < 6)

    # --- IVF ---
    idx = str(tmp_path / "ivf")
    build_ivf_index_lloyd(emb, idx, k=4, n_iter=2)
    delete_from_index(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), idx
    )
    with pytest.raises(ValueError, match="lloyd"):
        rebuild_ivf_index(survivors, idx, spark=spark,
                          ids_already_filtered=True, seed=7)
    # k and n_centroids are aliases — supplying both must refuse, not
    # silently discard one (r13 ADVICE: the nested-pop form consumed
    # n_centroids eagerly)
    with pytest.raises(ValueError, match="not both"):
        rebuild_ivf_index(survivors, idx, spark=spark,
                          ids_already_filtered=True, k=4, n_centroids=8)
    rebuild_ivf_index(survivors, idx, spark=spark, ids_already_filtered=True)
    meta = _read_meta(idx)
    assert meta["quantizer"] == "lloyd4x2"
    ref = str(tmp_path / "ivf_ref")
    build_ivf_index_lloyd(survivors, ref, k=4, n_iter=2)
    got = sorted(map(tuple, ivf_probe_index_batch(
        spark, q, idx, k=5, n_probe=2).collect()))
    want = sorted(map(tuple, ivf_probe_index_batch(
        spark, q, ref, k=5, n_probe=2).collect()))
    assert got == want and got

    # --- IVF-PQ ---
    pidx = str(tmp_path / "ivfpq")
    build_ivfpq_index_lloyd(emb, pidx, n_centroids=4, m=4, k=4,
                            n_iter=2, n_iter_sub=1)
    delete_from_index(
        emb.filter(F.col("vec_id") % 2 == 0).select("vec_id"), pidx
    )
    with pytest.raises(ValueError, match="lloyd"):
        rebuild_ivfpq_index(survivors, pidx, spark=spark,
                            ids_already_filtered=True, by_residual=True)
    rebuild_ivfpq_index(survivors, pidx, spark=spark,
                        ids_already_filtered=True)
    pmeta = _read_meta(pidx)
    assert pmeta["quantizer"] == "lloyd4x2+4x4x1"
    pref = str(tmp_path / "ivfpq_ref")
    build_ivfpq_index_lloyd(survivors, pref, n_centroids=4, m=4, k=4,
                            n_iter=2, n_iter_sub=1)
    pgot = sorted(map(tuple, ivfpq_probe_index_batch(
        spark, q, pidx, survivors, k=5, n_probe=2).collect()))
    pwant = sorted(map(tuple, ivfpq_probe_index_batch(
        spark, q, pref, survivors, k=5, n_probe=2).collect()))
    assert pgot == pwant and pgot


def test_append_growth_triggers_rebuild_for_datafit_quantizers(
    spark, tmp_path
):
    """The r13 growth signal: appends with a frozen quantizer shift the
    stored distribution even with ZERO deletes — an IVF index that has
    doubled since fit (footer counts vs the meta's fit_rows stamp,
    still listing-only) plans REBUILD with the growth rationale, the
    rebuild restamps the baseline and clears it, and the same growth on
    an LSH layout stays quiet (planes are data-independent)."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        append_to_ivf_index,
        build_ivf_index_lloyd,
        rebuild_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 != 0)

    idx = str(tmp_path / "ivf")
    build_ivf_index_lloyd(half, idx, k=4, n_iter=2)
    d = plan_maintenance({"idx": idx})[0]
    assert d["decision"] == "noop" and d["growth_frac"] == 0.0
    append_to_ivf_index(rest, idx)
    d = plan_maintenance({"idx": idx})[0]
    assert d["decision"] == "rebuild" and "growth_frac" in d["reason"]
    # the signal class is STRUCTURED (r13 ADVICE): consumers key the
    # growth-rebuild deferral on row['trigger'], never on reason prose
    assert d["trigger"] == "growth"
    assert d["growth_frac"] >= 1.0 and d["fit_rows"] > 0
    # threshold is a knob
    assert plan_maintenance(
        {"idx": idx}, rebuild_growth_frac=10.0
    )[0]["decision"] == "noop"
    # the rebuild restamps fit_rows → signal clears
    rebuild_ivf_index(emb, idx, spark=spark)
    d = plan_maintenance({"idx": idx})[0]
    assert d["decision"] == "noop" and d["growth_frac"] == 0.0

    # LSH twin: same doubling, no data-fit quantizer → no rebuild
    lsh = str(tmp_path / "lsh")
    build_lsh_index(half, lsh, n_planes=4, seed=42)
    append_to_lsh_index(rest, lsh)
    d = plan_maintenance({"lsh": lsh})[0]
    assert d["decision"] != "rebuild"


def test_growth_rebuild_without_vectors_defers_not_compacts(
    spark, tmp_path
):
    """A growth-triggered rebuild decision with no vectors must NOT
    degrade to compact (compaction has no purge half to land against
    growth — a maintain_every ingest loop past the threshold would
    re-pay an O(corpus) rewrite every tick forever, r13): the action
    records a deferral, the layout is untouched, and the decision
    honestly stays 'rebuild' until the caller supplies vectors — at
    which point the rebuild restamps the baseline and clears it."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        append_to_ivf_index,
        auto_maintain,
        build_ivf_index_lloyd,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    idx = str(tmp_path / "ivf")
    build_ivf_index_lloyd(half, idx, k=4, n_iter=2)
    append_to_ivf_index(emb.filter(F.col("vec_id") % 2 != 0), idx)
    assert plan_maintenance({"idx": idx})[0]["decision"] == "rebuild"

    import os

    files_before = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(idx) for f in fs
    )
    (row,) = auto_maintain(spark, {"idx": idx})
    assert row["decision"] == "rebuild" and row["trigger"] == "growth"
    assert row["action"].startswith("noop (deferred")
    assert row["decision_after"] == "rebuild"  # honestly still pending
    files_after = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(idx) for f in fs
    )
    assert files_before == files_after  # layout untouched

    # with vectors the rebuild executes and clears the signal
    (row2,) = auto_maintain(spark, {"idx": idx}, vectors={"idx": emb})
    assert row2["action"] == "rebuild" and row2["decision_after"] == "noop"


def test_ingest_loop_maintenance_ledger(spark, tmp_path):
    """The self-maintaining ingest loop's ledger (r13 — the
    curate_stream observability contract shared via
    write_maintenance_ledger): probe_stream(maintain_every=1,
    maintain_ledger_dir=) appends one decision/action/decision_after
    row per tick; answers are unchanged by ledgering; every acted
    decision clears (append fan-out compacts in-loop)."""
    import os
    import shutil

    from map_reduce_framework_using_python_spark.operators.ann_index import (
        MAINTENANCE_LEDGER_SCHEMA,
    )
    from map_reduce_framework_using_python_spark.streaming.ann_ingest import (
        probe_stream,
        read_embeddings_stream,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    fresh = str(tmp_path / "fresh")
    build_lsh_index(emb, fresh, n_planes=4, seed=42)
    with_ledger = str(tmp_path / "with")
    shutil.copytree(fresh, with_ledger)
    without = str(tmp_path / "without")
    shutil.copytree(fresh, without)
    ledger = str(tmp_path / "ledger")

    def stream():
        return read_embeddings_stream(spark, SF_SMOKE).filter(
            F.col("vec_id") % 13 == 5
        )

    got = probe_stream(
        stream(), with_ledger,
        out_dir=str(tmp_path / "n1"), checkpoint_dir=str(tmp_path / "c1"),
        k=5, probe_hamming=2, extend_index=True,
        maintain_every=1, maintain_ledger_dir=ledger,
    )
    want = probe_stream(
        stream(), without,
        out_dir=str(tmp_path / "n2"), checkpoint_dir=str(tmp_path / "c2"),
        k=5, probe_hamming=2, extend_index=True,
        maintain_every=1,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert os.path.isdir(ledger)
    rows = spark.read.schema(MAINTENANCE_LEDGER_SCHEMA).parquet(ledger).collect()
    assert rows and all(r["index"] == "ingest" for r in rows)
    acted = [r for r in rows if r["action"] != "noop"]
    assert all(
        r["decision_after"] == "noop" or "deferred" in r["action"]
        for r in acted
    )
