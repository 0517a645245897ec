"""Training-data pipeline operator properties: reproducibility of
hash-based sampling/splits/shuffle and the mixture arithmetic. The
cross-engine value equality is covered by the DuckDB oracles
(plans/pipeline_queries.py); these pin the semantic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.core import REGISTRY
from tests.conftest import SF_SMOKE


def test_splits_partition_the_corpus(spark):
    out = {r["split"]: r["n_docs"] for r in REGISTRY["ns_train_val_test"].fn(spark, SF_SMOKE).collect()}
    total = sum(out.values())
    assert total == 500
    # 12/2/2 hex classes → expected proportions within generous bounds.
    assert out["train"] > out["val"] and out["train"] > out["test"]
    assert 0.55 < out["train"] / total < 0.9


def test_hash_sample_is_stable_and_disjoint_with_complement(spark):
    s1 = {r["doc_id"] for r in REGISTRY["ns_hash_sample"].fn(spark, SF_SMOKE).collect()}
    s2 = {r["doc_id"] for r in REGISTRY["ns_hash_sample"].fn(spark, SF_SMOKE).collect()}
    assert s1 == s2 and 0 < len(s1) < 500  # reproducible, nontrivial


def test_seeded_shuffle_is_a_permutation_and_seed_sensitive(spark):
    from map_reduce_framework_using_python_spark.plans.core import t

    ranks = REGISTRY["ns_seeded_shuffle"].fn(spark, SF_SMOKE).collect()
    assert sorted(r["shuffle_rank"] for r in ranks) == list(range(1, 501))
    # A different seed yields a different order (astronomically certain).
    d = t(spark, SF_SMOKE, "documents")
    from pyspark.sql import Window

    other = d.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.md5(F.concat(F.lit("seed43"), F.col("doc_id").cast("string"))), "doc_id"))
        .alias("shuffle_rank"),
    ).collect()
    assert {(r["doc_id"], r["shuffle_rank"]) for r in ranks} != {
        (r["doc_id"], r["shuffle_rank"]) for r in other
    }


def test_mixture_upsample_multiplicities(spark):
    rows = {r["lang"]: (r["n_rows"], r["n_docs"]) for r in REGISTRY["ns_mixture_upsample"].fn(spark, SF_SMOKE).collect()}
    for lang, (n_rows, n_docs) in rows.items():
        w = 1 if lang == "en" else 3 if lang == "zh" else 2
        assert n_rows == w * n_docs, (lang, n_rows, n_docs)


def test_normalize_output_is_clean(spark):
    out = REGISTRY["ns_text_normalize"].fn(spark, SF_SMOKE)
    bad = out.filter(
        F.col("norm_text").rlike("[^a-z0-9 ]") | F.col("norm_text").contains("  ")
    ).count()
    assert bad == 0


def test_seeded_shuffle_scales_via_range_partitioning(spark):
    """The 100 TB form of the seeded shuffle: range-partition on the
    hash key and sort within partitions — global epoch order across
    output files WITHOUT the single-partition window that the oracle-
    checkable row_number form needs. Plan shows parallel range
    partitioning; partition-major concatenation equals the exact
    md5-sorted order."""
    from map_reduce_framework_using_python_spark.plans.core import t

    d = t(spark, SF_SMOKE, "documents")
    key = F.md5(F.concat(F.lit("seed42"), F.col("doc_id").cast("string")))
    shuffled = (
        d.select("doc_id", key.alias("_k"))
        .repartitionByRange(8, "_k")
        .sortWithinPartitions("_k")
    )
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan
    # Partition-major order == true global order by the key.
    rows = shuffled.select("doc_id", "_k", F.spark_partition_id().alias("p")).collect()
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["p"], r["_k"]))]
    want = [r["doc_id"] for r in sorted(rows, key=lambda r: r["_k"])]
    assert got == want


def test_semantic_decontaminate_flag_and_slices(spark):
    """ns_semantic_decontaminate: covers exactly the non-benchmark
    vectors, the flag is the thresholded max_cosine (grid arithmetic,
    no drift between the column and the verdict), both classes are
    non-empty at the chosen tau, and the plan keeps the benchmark on
    the broadcast side (no cartesian, no bench-sized shuffle)."""
    from map_reduce_framework_using_python_spark.plans.pipeline6 import (
        _SEMDECON_TAU6,
    )

    df = REGISTRY["ns_semantic_decontaminate"].fn(spark, SF_SMOKE)
    rows = df.collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corp_ids = {r["vec_id"] for r in emb.filter(F.col("vec_id") % 16 != 7).collect()}
    assert {r["vec_id"] for r in rows} == corp_ids
    for r in rows:
        assert r["contaminated"] == (
            round(r["max_cosine"] * 1e6) >= _SEMDECON_TAU6
        ), r
    flags = {r["contaminated"] for r in rows}
    assert flags == {True, False}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # r14 Arrow kernel: the crossJoin(broadcast)+max-agg plan became
    # scan → MapInArrow → project (the bench suite rides a SparkContext
    # broadcast, not a plan-side BroadcastExchange). This pin was the
    # one pre-r14 shape assertion the targeted r14 test runs missed —
    # caught by the r15 round-start suite run.
    assert "MapInArrow" in plan
    assert "Join" not in plan and "Exchange" not in plan
