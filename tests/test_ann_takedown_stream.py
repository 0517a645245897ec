"""Pins for the ANN takedown queue (streaming/ann_ingest.delete_stream)
— the retraction verb interleaved with the similarity-on-ingest loop:

* drained == one-shot: the union of per-micro-batch tombstone appends
  equals one bulk delete_from_index — probe results identical;
* at-least-once replay: re-draining the same requests (fresh
  checkpoint, simulating redelivery) changes nothing;
* the registered interleaved query (st_ann_takedown) returns slice-B
  neighbor lists containing no tombstoned id and equal to the one-shot
  probe against a bulk-deleted index.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ann_index import (
    build_lsh_index,
    delete_from_index,
    lsh_probe_index_batch,
)
from map_reduce_framework_using_python_spark.sources.io import load_table
from map_reduce_framework_using_python_spark.streaming.ann_ingest import (
    delete_stream,
)
from tests.conftest import SF_SMOKE


def _probe(spark, emb, path):
    return sorted(
        map(
            tuple,
            lsh_probe_index_batch(
                spark, emb.filter(F.col("vec_id") < 8), path, k=5,
                probe_hamming=2,
            ).collect(),
        )
    )


def _ids_stream(spark, land):
    return (
        spark.readStream.schema("vec_id bigint")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(land)
    )


def test_delete_stream_drained_equals_one_shot_and_replays(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(300)
    src = str(tmp_path / "lsh")
    build_lsh_index(emb, src, n_planes=4, seed=42)

    # victims: a content-derived slice big enough to flip neighbor
    # lists (_probe rows are (q_id, vec_id, label, cosine, rn) tuples)
    victims = [r[1] for r in _probe(spark, emb, src)][::3]
    victims = sorted(set(victims))[:6]
    assert victims

    # one-shot reference: bulk delete on a copy
    bulk = str(tmp_path / "bulk")
    shutil.copytree(src, bulk)
    delete_from_index(victims, bulk, spark=spark)
    want = _probe(spark, emb, bulk)
    assert want != _probe(spark, emb, src)  # non-vacuous takedown

    # streamed: the same ids across 3 micro-batches (3 files)
    land = str(tmp_path / "land")
    os.makedirs(land)
    for i in range(3):
        spark.createDataFrame(
            [(int(v),) for v in victims[i::3]], "vec_id bigint"
        ).coalesce(1).write.parquet(os.path.join(land, f"req{i}.parquet"))
    streamed = str(tmp_path / "streamed")
    shutil.copytree(src, streamed)
    delete_stream(_ids_stream(spark, land), streamed, str(tmp_path / "ck1"))
    assert _probe(spark, emb, streamed) == want

    # replay: redelivered requests (fresh checkpoint) change nothing
    delete_stream(_ids_stream(spark, land), streamed, str(tmp_path / "ck2"))
    assert _probe(spark, emb, streamed) == want


def test_st_ann_takedown_registry_query(spark):
    """The interleaved registered query: slice B's neighbors contain no
    takedown victim and equal the one-shot probe against a bulk-deleted
    index (drained == one-shot at the query level)."""
    from map_reduce_framework_using_python_spark.plans import REGISTRY
    from map_reduce_framework_using_python_spark.plans.ann_queries import (
        _ensure_lsh,
    )

    got = REGISTRY["st_ann_takedown"].fn(spark, SF_SMOKE)
    rows = sorted(map(tuple, got.collect()))
    assert rows

    emb = load_table(spark, SF_SMOKE, "embeddings")
    pristine = _ensure_lsh(spark, SF_SMOKE)
    slice_a = lsh_probe_index_batch(
        spark, emb.filter(F.col("vec_id") % 13 == 5), pristine, k=5,
        probe_hamming=2,
    )
    victims = {
        r["vec_id"]
        for r in slice_a.filter(F.col("vec_id") % 2 == 0)
        .select("vec_id")
        .distinct()
        .collect()
    }
    assert victims  # non-vacuous
    assert not ({r[1] for r in rows} & victims)

    import tempfile

    bulk = os.path.join(tempfile.mkdtemp(prefix="takedown_ref_"), "idx")
    shutil.copytree(pristine, bulk)
    delete_from_index(sorted(victims), bulk, spark=spark)
    want = sorted(
        map(
            tuple,
            lsh_probe_index_batch(
                spark, emb.filter(F.col("vec_id") % 13 == 6), bulk, k=5,
                probe_hamming=2,
            ).collect(),
        )
    )
    assert rows == want
    shutil.rmtree(os.path.dirname(bulk), ignore_errors=True)
