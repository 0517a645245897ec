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
