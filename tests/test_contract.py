"""Driver-contract tests: __spark_entry__ exposes entry/queries/oracle_sql
with consistent keys and runnable plans."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs_and_has_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    missing = [k for k in osql if k not in qs]
    assert not missing, f"oracle keys without queries: {missing}"


def test_registry_names_unique_and_tagged():
    from map_reduce_framework_using_python_spark.plans import REGISTRY

    assert len(REGISTRY) == len(set(REGISTRY))
    untagged = [n for n, q in REGISTRY.items() if not q.tags]
    assert not untagged, f"untagged queries: {untagged}"
