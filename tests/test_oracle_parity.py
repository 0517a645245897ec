"""Oracle-differential gate (SURVEY.md §5.2): every SQL-expressible
query must match its DuckDB oracle at sf0.001 — row count, column
names, and canonicalized values. This is the local twin of the driver's
t2 correctness check."""

from __future__ import annotations

import pytest

from map_reduce_framework_using_python_spark.oracle import canon_rows, type_mismatches
from map_reduce_framework_using_python_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE

ORACLE_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is not None]
ROWS_ONLY_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMOKE)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(q.oracle)
    dcols = [c.lower() for c in rel.columns]
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    # Type-family parity (lesson #5): the driver hashes raw values, so a
    # DuckDB HUGEINT/DECIMAL widening next to a Spark BIGINT fails the
    # driver even when the stringified values below agree.
    assert type_mismatches(sdf.dtypes, rel.columns, rel.types) == []
    assert len(srows) == len(drows)
    assert canon_rows(scols, srows) == canon_rows(dcols, drows)


def test_type_class_families():
    """The lesson-#5 guard: DuckDB integer widenings and list spellings
    map onto Spark's families; HUGEINT never passes."""
    assert type_mismatches([("n", "bigint")], ["n"], ["BIGINT"]) == []
    assert type_mismatches([("n", "int")], ["n"], ["BIGINT"]) == []
    assert type_mismatches([("q", "array<int>")], ["q"], ["INTEGER[]"]) == []
    assert type_mismatches([("v", "array<double>")], ["v"], ["DOUBLE[]"]) == []
    assert type_mismatches([("d", "decimal(18,2)")], ["d"], ["DECIMAL(18,2)"]) == []
    # HUGEINT is rejected against any Spark integer type
    errs = type_mismatches([("n", "bigint")], ["n"], ["HUGEINT"])
    assert errs and "HUGEINT" in errs[0]
    # family divergence is reported
    assert type_mismatches([("x", "double")], ["x"], ["BIGINT"])
    assert type_mismatches([("q", "array<int>")], ["q"], ["DOUBLE[]"])
    # column matching is case-insensitive; unmatched names are not typed here
    assert type_mismatches([("A", "bigint")], ["a"], ["BIGINT"]) == []
    assert type_mismatches([("a", "bigint")], ["b"], ["HUGEINT"]) == []


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    assert df.columns  # stable schema
    df.collect()  # executes without error
