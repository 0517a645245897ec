"""Pins for the tombstone DELETE verb across the index lanes
(operators/ann_index.delete_from_index) and for attribute-filtered
IVF-PQ probes (code_filter):

* a deleted id disappears from every probe form (LSH / IVF / IVF-PQ
  single + batched, flat PQ) without any data file being rewritten;
* deletes are idempotent under at-least-once replay;
* a tombstone beats copies of the id appended AFTER the delete —
  un-deleting requires compact (purge) then re-append;
* compaction physically purges tombstoned rows AND retires the delete
  log in the same swap: post-compact rows == pristine rows minus the
  deleted ids', tombstone dir gone;
* a delete landing mid-compaction aborts the swap (the snapshot guard
  covers tombstone files), never silently resurrects rows;
* code_filter returns EXACTLY the brute-force filtered top-k at full
  probe, and every returned row satisfies the predicate.

The full-oracle forms are ns_ann_delete_probe / ns_ivfpq_filtered_lloyd
(plans/ann_queries.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ann_index import (
    TOMBSTONE_DIR,
    build_ivf_index,
    build_lsh_index,
    delete_from_index,
    ivf_probe_index_batch,
    ivf_topk_indexed,
    lsh_probe_index_batch,
    lsh_topk_indexed,
)
from map_reduce_framework_using_python_spark.operators.ivfpq import (
    append_to_ivfpq_index,
    build_ivfpq_index,
    compact_ivfpq_index,
    ivfpq_probe_index_batch,
    ivfpq_topk_indexed,
)
from map_reduce_framework_using_python_spark.operators.similarity import (
    _query_vector,
    cosine_topk_bruteforce,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from tests.conftest import SF_SMOKE

#: Full-probe knobs for the 8-centroid fixture index: every cell
#: probed, shortlist ≥ corpus, so the ADC shortlist cannot lose a
#: candidate and the exact rerank makes the answer EQUAL to brute
#: force — the right regime to pin delete/filter semantics in.
FULL = dict(n_probe=8, shortlist=600)


@pytest.fixture(scope="module")
def pristine(spark, tmp_path_factory):
    """One spark.ml IVF-PQ build; mutation tests copytree it (cheap)
    instead of re-fitting quantizers per test."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path_factory.mktemp("annd") / "idx")
    build_ivfpq_index(emb, path, n_centroids=8, m=8, k=8, seed=42)
    return path


@pytest.fixture()
def idx(pristine, tmp_path):
    work = str(tmp_path / "idx")
    shutil.copytree(pristine, work)
    return work


def _rows(spark, path):
    return sorted(
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in spark.read.parquet(path)
        .select("vec_id", "centroid_id", "codes")
        .collect()
    )


def _ids(df):
    return {r["vec_id"] for r in df.select("vec_id").collect()}


def test_delete_excludes_ivfpq_and_equals_bruteforce_on_survivors(spark, idx):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    before = ivfpq_topk_indexed(emb, idx, 0, topk=5, **FULL).collect()
    victims = [before[0]["vec_id"], before[2]["vec_id"]]
    files_before = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(idx)
        for f in fs
        if f.endswith(".parquet") and TOMBSTONE_DIR not in r
    }
    delete_from_index(victims, idx, spark=spark)
    # O(|deleted|) contract: no data file was rewritten by the delete.
    files_after = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(idx)
        for f in fs
        if f.endswith(".parquet") and TOMBSTONE_DIR not in r
    }
    assert files_before == files_after
    got = ivfpq_topk_indexed(emb, idx, 0, topk=5, **FULL).collect()
    assert not (set(victims) & _ids_rows(got))
    # Full probe ⇒ exactly brute force over the surviving corpus.
    exact = cosine_topk_bruteforce(
        emb.filter(~F.col("vec_id").isin(victims)), 0, k=5
    ).collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in got] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in exact
    ]
    # Batched probe excludes identically.
    batch = ivfpq_probe_index_batch(
        spark, emb.filter(F.col("vec_id") == 0), idx, emb, k=5, **FULL
    ).collect()
    assert not (set(victims) & {r["vec_id"] for r in batch})


def _ids_rows(rows):
    return {r["vec_id"] for r in rows}


def test_delete_idempotent_under_replay(spark, idx):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    delete_from_index([3, 17], idx, spark=spark)
    once = ivfpq_topk_indexed(emb, idx, 0, topk=10, **FULL).collect()
    delete_from_index([3, 17], idx, spark=spark)  # replayed delete
    twice = ivfpq_topk_indexed(emb, idx, 0, topk=10, **FULL).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_delete_excludes_lsh_and_ivf_lanes(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    q = _query_vector(emb, "embedding", "vec_id", 0)
    lsh = str(tmp_path / "lsh")
    build_lsh_index(emb, lsh, n_planes=4, seed=42)
    victim = lsh_topk_indexed(
        spark, lsh, q, k=3, probe_hamming=2, exclude_id=0
    ).collect()[0]["vec_id"]
    delete_from_index([victim], lsh, spark=spark)
    assert victim not in _ids(
        lsh_topk_indexed(spark, lsh, q, k=10, probe_hamming=2, exclude_id=0)
    )
    assert victim not in {
        r["vec_id"]
        for r in lsh_probe_index_batch(
            spark, emb.filter(F.col("vec_id") == 0), lsh, k=10,
            probe_hamming=2,
        ).collect()
    }
    ivf = str(tmp_path / "ivf")
    build_ivf_index(emb, ivf, n_centroids=4, seed=42)
    victim = ivf_topk_indexed(
        spark, ivf, q, k=3, n_probe=4, exclude_id=0
    ).collect()[0]["vec_id"]
    delete_from_index([victim], ivf, spark=spark)
    assert victim not in _ids(
        ivf_topk_indexed(spark, ivf, q, k=10, n_probe=4, exclude_id=0)
    )
    assert victim not in {
        r["vec_id"]
        for r in ivf_probe_index_batch(
            spark, emb.filter(F.col("vec_id") == 0), ivf, k=10, n_probe=4
        ).collect()
    }


def test_delete_excludes_flat_pq_lane(spark, tmp_path):
    from map_reduce_framework_using_python_spark.operators.pq import (
        build_pq_index,
        compact_pq_index,
        pq_topk_indexed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    path = str(tmp_path / "pq")
    build_pq_index(emb, path, m=8, k=8, seed=42)
    victim = pq_topk_indexed(emb, path, 0, topk=3, shortlist=400).collect()[0][
        "vec_id"
    ]
    delete_from_index([victim], path, spark=spark)
    assert victim not in _ids(pq_topk_indexed(emb, path, 0, topk=10, shortlist=400))
    # Flat-lane purge: compaction drops the row and retires the log.
    compact_pq_index(spark, path)
    codes_dir = os.path.join(path, "codes")
    assert not os.path.isdir(os.path.join(codes_dir, TOMBSTONE_DIR))
    assert victim not in _ids(spark.read.parquet(codes_dir))
    assert victim not in _ids(pq_topk_indexed(emb, path, 0, topk=10, shortlist=400))


def test_compact_purges_rows_and_retires_tombstones(spark, pristine, idx):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    deleted = [r["vec_id"] for r in emb.filter(F.col("vec_id") % 11 == 2)
               .select("vec_id").collect()]
    delete_from_index(deleted, idx, spark=spark)
    compact_ivfpq_index(spark, idx)
    assert not os.path.isdir(os.path.join(idx, TOMBSTONE_DIR))
    want = [r for r in _rows(spark, pristine) if r[0] not in set(deleted)]
    assert _rows(spark, idx) == want
    assert not (set(deleted) & _ids(
        ivfpq_topk_indexed(emb, idx, 0, topk=10, **FULL)
    ))


def test_tombstone_beats_later_append_until_compaction(spark, idx):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    victim = ivfpq_topk_indexed(emb, idx, 0, topk=1, **FULL).collect()[0][
        "vec_id"
    ]
    delete_from_index([victim], idx, spark=spark)
    # Append a batch CONTAINING the deleted id: the tombstone wins.
    append_to_ivfpq_index(emb.filter(F.col("vec_id") == victim), idx)
    assert victim not in _ids(ivfpq_topk_indexed(emb, idx, 0, topk=10, **FULL))
    # Un-delete: compact (purges rows + retires tombstones), re-append.
    compact_ivfpq_index(spark, idx)
    append_to_ivfpq_index(emb.filter(F.col("vec_id") == victim), idx)
    got = ivfpq_topk_indexed(emb, idx, 0, topk=1, **FULL).collect()
    assert got[0]["vec_id"] == victim


def test_delete_during_compaction_aborts_swap(spark, idx):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    delete_from_index([3], idx, spark=spark)
    rows_before = _rows(spark, idx)

    def racer():
        delete_from_index([17], idx, spark=spark)

    with pytest.raises(RuntimeError, match="landed during the swap|changed during"):
        compact_ivfpq_index(spark, idx, _test_hook_pre_swap=racer)
    # Rolled back: all data rows live, BOTH tombstones still in force.
    assert _rows(spark, idx) == rows_before
    top = _ids(ivfpq_topk_indexed(emb, idx, 0, topk=600, **FULL))
    assert 3 not in top and 17 not in top
    # Quiesced retry succeeds and applies both deletes physically.
    compact_ivfpq_index(spark, idx)
    surviving = _ids(spark.read.parquet(idx))
    assert 3 not in surviving and 17 not in surviving


def test_code_filter_exact_at_full_probe(spark, pristine):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    # qid=4 has an even label, so the filtered corpus retains the query
    # row and brute force can extract its vector.
    got = ivfpq_probe_index_batch(
        spark, emb.filter(F.col("vec_id") == 4), pristine, emb, k=5,
        code_filter=F.col("label") % 2 == 0, **FULL,
    ).collect()
    labels = {r["label"] for r in got}
    assert all(lab % 2 == 0 for lab in labels), labels
    exact = cosine_topk_bruteforce(
        emb.filter(F.col("label") % 2 == 0), 4, k=5
    ).collect()
    assert [(r["vec_id"], round(r["cosine"], 6)) for r in got] == [
        (r["vec_id"], round(r["cosine"], 6)) for r in exact
    ]


def test_delete_input_forms_and_bad_path(spark, idx, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    # DataFrame input (any column name) ≡ list input.
    delete_from_index(
        emb.filter(F.col("vec_id") == 3).select(F.col("vec_id").alias("x")),
        idx,
    )
    assert 3 not in _ids(ivfpq_topk_indexed(emb, idx, 0, topk=600, **FULL))
    with pytest.raises(ValueError, match="needs spark"):
        delete_from_index([1], idx)
    with pytest.raises(ValueError, match="not an ANN index"):
        delete_from_index([1], str(tmp_path / "nope"), spark=spark)


def test_rebuild_refits_swaps_and_clears_tombstones(spark, idx):
    """The lifecycle pentad's fifth verb: rebuild refits BOTH quantizers
    from the current authoritative vectors, swaps atomically, starts
    with an empty tombstone set (prior deletes expressed by absence
    from the input), and answers exactly brute force at full probe."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        _read_meta,
    )
    from map_reduce_framework_using_python_spark.operators.ivfpq import (
        rebuild_ivfpq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    delete_from_index([3], idx, spark=spark)
    survivors = emb.filter(F.col("vec_id") != 3)
    # live tombstones → rebuild refuses without the attestation flag
    # (deletes are index-side only; an unfiltered input would
    # resurrect them — r11 review)
    with pytest.raises(ValueError, match="resurrect"):
        rebuild_ivfpq_index(survivors, idx, n_centroids=4, m=8, k=8, seed=7)
    rebuild_ivfpq_index(
        survivors, idx, n_centroids=4, m=8, k=8, seed=7,
        ids_already_filtered=True,
    )
    meta = _read_meta(idx)
    assert meta["n_centroids"] == 4 and meta["seed"] == 7
    assert not os.path.isdir(os.path.join(idx, TOMBSTONE_DIR))
    got = ivfpq_topk_indexed(emb, idx, 0, topk=5, n_probe=4, shortlist=600).collect()
    assert 3 not in {r["vec_id"] for r in got}
    exact = cosine_topk_bruteforce(survivors, 0, k=5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in exact
    ]


def test_rebuild_aborts_on_concurrent_mutation(spark, idx):
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        _read_meta,
    )
    from map_reduce_framework_using_python_spark.operators.ivfpq import (
        rebuild_ivfpq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    before_meta = _read_meta(idx)
    before_rows = _rows(spark, idx)

    def racer():
        append_to_ivfpq_index(emb.filter(F.col("vec_id") == 0), idx)

    with pytest.raises(RuntimeError, match="landed during the swap|changed during"):
        rebuild_ivfpq_index(
            emb, idx, n_centroids=4, m=8, k=8, seed=7,
            _test_hook_pre_swap=racer,
        )
    # Rolled back: old quantizers still live, racer's append preserved.
    assert _read_meta(idx)["seed"] == before_meta["seed"] == 42
    now = _rows(spark, idx)
    assert set(before_rows) <= set(now) and len(now) > len(before_rows)


def test_failed_rebuild_leaves_live_untouched(spark, idx):
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        _read_meta,
    )
    from map_reduce_framework_using_python_spark.operators.ivfpq import (
        rebuild_ivfpq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    before = _rows(spark, idx)
    with pytest.raises(ValueError, match="not divisible"):
        rebuild_ivfpq_index(emb, idx, n_centroids=4, m=7)  # 64 % 7 != 0
    assert _rows(spark, idx) == before
    assert _read_meta(idx)["m"] == 8


def test_index_filter_on_lsh_and_ivf_batch_probes(spark, tmp_path):
    """Filter symmetry across the lanes (r11): LSH/IVF batch probes
    take index_filter= with the IVF-PQ code_filter semantics. Pin: with
    k covering every candidate, the filtered probe returns exactly the
    eligible rows of the unfiltered ranking, re-ranked."""
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    pred = F.col("label") % 2 == 0
    qdf = emb.filter(F.col("vec_id") == 0)

    def check(probe, path, **kw):
        unfiltered = probe(spark, qdf, path, k=500, **kw).collect()
        want = [
            (r["vec_id"], r["cosine"])
            for r in sorted(
                (r for r in unfiltered if r["label"] % 2 == 0),
                key=lambda r: (-r["cosine"], r["vec_id"]),
            )
        ]
        got = probe(
            spark, qdf, path, k=500, index_filter=pred, **kw
        ).collect()
        assert all(r["label"] % 2 == 0 for r in got)
        assert [(r["vec_id"], r["cosine"]) for r in got] == want

    lsh = str(tmp_path / "lsh")
    build_lsh_index(emb, lsh, n_planes=4, seed=42)
    check(lsh_probe_index_batch, lsh, probe_hamming=2)
    ivf = str(tmp_path / "ivf")
    build_ivf_index(emb, ivf, n_centroids=4, seed=42)
    check(ivf_probe_index_batch, ivf, n_probe=4)


def test_index_stats_tracks_lifecycle(spark, idx, tmp_path):
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        index_stats,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    s0 = index_stats(idx)
    assert s0["kind"] == "ivfpq" and s0["n_data_files"] > 0
    assert s0["n_tombstone_files"] == 0 and s0["n_partition_dirs"] == 8
    assert "books" not in s0["meta"] and "centroids" not in s0["meta"]
    assert s0["meta"]["m"] == 8
    delete_from_index([3, 17], idx, spark=spark)
    append_to_ivfpq_index(emb.filter(F.col("vec_id") < 5), idx)
    s1 = index_stats(idx)
    assert s1["n_tombstone_files"] > 0 and s1["tombstone_bytes"] > 0
    assert s1["n_data_files"] > s0["n_data_files"]
    compact_ivfpq_index(spark, idx)
    s2 = index_stats(idx)
    assert s2["n_tombstone_files"] == 0
    assert s2["n_data_files"] <= s1["n_data_files"]
    # Dedup-lane and flat-PQ layouts introspect through the same verb.
    from map_reduce_framework_using_python_spark.operators.dedup_index import (
        build_paragraph_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    ppath = build_paragraph_index(docs, str(tmp_path / "para"))
    sp = index_stats(ppath)
    assert sp["kind"] == "paragraph" and sp["n_data_files"] > 0
    with pytest.raises(ValueError, match="not a recognized"):
        index_stats(str(tmp_path / "nope"))


def test_rebuild_inherits_live_meta_knobs(spark, idx):
    """A no-knob rebuild keeps the live index's non-default parameters
    (n_centroids/m/k/seed from _ann_meta.json) instead of silently
    reverting to builder defaults; explicit knobs stay overrides
    (r11 review)."""
    from map_reduce_framework_using_python_spark.operators.ann_index import (
        _read_meta,
    )
    from map_reduce_framework_using_python_spark.operators.ivfpq import (
        rebuild_ivfpq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    before = _read_meta(idx)
    assert (before["n_centroids"], before["m"], before["k"]) == (8, 8, 8)
    rebuild_ivfpq_index(emb, idx)  # no knobs: everything from meta
    after = _read_meta(idx)
    for knob in ("n_centroids", "m", "k", "seed", "by_residual",
                 "vec_col", "id_col", "label_col"):
        assert after[knob] == before[knob], knob
    # explicit knob overrides; the rest still inherited
    rebuild_ivfpq_index(emb, idx, n_centroids=4)
    final = _read_meta(idx)
    assert final["n_centroids"] == 4
    assert (final["m"], final["k"], final["seed"]) == (
        before["m"], before["k"], before["seed"]
    )
