"""Shared fixtures: one SparkSession per test session (startup ~15 s),
DuckDB connection with testdata views, sf-dir constants."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from map_reduce_framework_using_python_spark.session import get_spark
from map_reduce_framework_using_python_spark.sources.io import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pytest")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{name}.parquet')"
        )
    yield con


# --------------------------------------------------------------------------
# Smoke subset (r15, per the r14 verdict item 3): the full suite runs
# ~40+ minutes, which overflows bounded verify windows (the driver's r14
# pytest capture cut off at ~44% with zero failures — status UNVERIFIED,
# not failed). `pytest -m smoke` runs a curated <5-minute cross-surface
# subset: the driver contract, plan-shape pins, the lanes this round
# touched, and one fast file per major operator family. It is a
# confidence check for bounded windows, NOT a substitute for the full
# suite (the close discipline still runs everything).
# --------------------------------------------------------------------------

_SMOKE_FILES = {
    "test_contract.py",      # driver contract (entry/queries/oracle_sql)
    "test_inventory.py",     # registry/docs coverage invariants
    "test_plan_shapes.py",   # physical-plan pins (scans/joins/exchanges)
    "test_persist_lanes.py", # lane-scoped persist bookkeeping
    "test_similarity.py",    # decon kernels incl. the r15 Arrow routing
    "test_analytics.py",     # stats lane (r15 histogram restructure)
    "test_pipeline7.py",     # ccnet/dsir lanes (r14 persists)
    "test_pipeline8.py",     # capstone scan-count pins
    "test_clustering.py",    # Lloyd kernel determinism
    "test_edge_cases.py",    # cross-operator guards
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in _SMOKE_FILES:
            item.add_marker(pytest.mark.smoke)
