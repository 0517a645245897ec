"""Degenerate-input robustness: operators must handle empty frames,
all-null columns, single rows, and short documents without crashing or
mis-counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    word_shingles,
)
from map_reduce_framework_using_python_spark.operators.merge import merge_upsert
from map_reduce_framework_using_python_spark.operators.skew import salted_agg


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_empty_frame(spark):
    empty = _docs(spark, [])
    assert exact_dedup(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0


def test_dedup_short_documents(spark):
    """Docs with fewer tokens than the shingle width produce empty
    shingle sets (guarded sequence), not errors or bogus pairs."""
    df = _docs(spark, [(1, "one two"), (2, "one two"), (3, "a b c d")])
    sh = df.select(word_shingles("text", 3).alias("s")).collect()
    assert [len(r["s"]) for r in sh] == [0, 0, 2]
    # Identical short docs share no shingles → no jaccard pair (their
    # dedup path is exact_dedup, which does catch them).
    assert ngram_jaccard_pairs(df).count() == 0
    assert exact_dedup(df).filter("n_copies = 2").count() == 1


def test_single_row_everything(spark):
    df = _docs(spark, [(1, "alpha beta gamma delta")])
    assert exact_dedup(df).count() == 1
    assert ngram_jaccard_pairs(df).count() == 0  # no self-pairs


def test_merge_empty_source(spark):
    target = spark.createDataFrame([(1, "a")], ["id", "v"])
    empty = spark.createDataFrame([], "id long, v string")
    assert {r["id"] for r in merge_upsert(target, empty, "id").collect()} == {1}
    assert merge_upsert(empty, target, "id").count() == 1


def test_salted_agg_empty_and_single(spark):
    empty = spark.createDataFrame([], "k string, v double")
    assert salted_agg(empty, "k", {"s": F.sum("v")}).count() == 0
    one = spark.createDataFrame([("k", 1.5)], ["k", "v"])
    out = salted_agg(one, "k", {"s": F.sum("v"), "n": F.count("*")}).collect()
    assert (out[0]["s"], out[0]["n"]) == (1.5, 1)


def test_all_null_text_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    # split(NULL) → NULL array; shingles guard yields no rows, no crash.
    assert df.select(F.explode(word_shingles("text", 3))).count() == 0
    # exact dedup groups the NULL fingerprint deterministically.
    out = exact_dedup(df).collect()
    assert len(out) == 1 and out[0]["n_copies"] == 2

def test_canon_value_integral_decimal_exact():
    """Integral Decimals above 2^53 must not round-trip through float
    (ADVICE r1): a DECIMAL/HUGEINT oracle sum compares exactly."""
    from decimal import Decimal

    from map_reduce_framework_using_python_spark.oracle import canon_value

    big = Decimal(2**63 + 1)
    assert canon_value(big) == str(2**63 + 1)
    assert canon_value(Decimal("5.00")) == canon_value(5.0) == "5"
    assert canon_value(Decimal("2.5")) == canon_value(2.5)


def test_catalog_registers_only_after_write(tmp_path):
    """A failed WRITE must not leave a dangling catalog entry."""
    import pytest

    from map_reduce_framework_using_python_spark.catalog import FileCatalog
    from map_reduce_framework_using_python_spark.cli import cmd_write

    root = str(tmp_path / "dfs")
    with pytest.raises(FileNotFoundError):
        cmd_write(str(tmp_path / "missing.txt"), root=root)
    assert FileCatalog(root).names() == []


def test_hll_sketch_merge_equals_direct(spark):
    """Merging per-source HLL sketches must equal sketching the whole
    corpus directly up to sketch-mode effects; both estimates must land
    within HLL's error envelope of the exact distinct count."""
    from pyspark.sql import functions as F

    from map_reduce_framework_using_python_spark.plans import REGISTRY
    from map_reduce_framework_using_python_spark.plans.core import t
    from tests.conftest import SF_SMOKE

    merged = REGISTRY["q_hll_sketch_merge"].fn(spark, SF_SMOKE).first()
    d = t(spark, SF_SMOKE, "documents")
    direct = d.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.md5("text"))).alias("est")
    ).first()["est"]
    exact = d.select(F.md5("text")).distinct().count()

    # union-merging may transition sketch modes (sparse->dense), so the
    # merged estimate is not bit-identical to the direct one — both must
    # simply land within HLL's error envelope of the exact count
    assert abs(merged["merged_distinct_texts"] - exact) / exact < 0.03
    assert abs(direct - exact) / exact < 0.03
    assert merged["n_docs"] == d.count()
