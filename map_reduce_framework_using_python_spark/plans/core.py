"""Query registry.

A :class:`Query` pairs a Spark plan builder with its DuckDB oracle SQL
(the correctness contract: identical column names, row sets, and — after
deterministic rounding — values). Queries whose semantics are not
ANSI-SQL-expressible (hash-seeded sketches, pipe UDFs, streaming state)
carry ``oracle=None`` and are covered by pytest equivalence tests
instead (SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from map_reduce_framework_using_python_spark.sources.io import load_table

SparkQueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name → Query, in registration order.
REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQueryFn) -> SparkQueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or "")
        return fn

    return deco


def get_query(name: str) -> Query:
    return REGISTRY[name]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table scan used by every query builder."""
    return load_table(spark, sf_dir, name)
