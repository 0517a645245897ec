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


# --------------------------------------------------------------------------
# Deterministic money arithmetic (oracle-parity critical)
#
# Revenue expressions like price·(1−discount) live on a 10⁻⁴ decimal grid
# (prices/discounts/taxes are exact 2-dp quantities), so their sums land
# EXACTLY on .xx5 rounding boundaries ~1% of the time. Two engines
# summing doubles in different orders then rounding half-up resolve such
# ties unpredictably. Fix, applied on BOTH sides of every affected query:
#
# 1. sum in DECIMAL (exact — both engines produce the identical value),
# 2. cast to double (identical bits),
# 3. round via the explicit floor(x·10^s + 0.5)/10^s formula — pure IEEE
#    ops on identical inputs, unlike round(), whose tie handling differs
#    across engines (BigDecimal-of-shortest-repr vs scale-multiply).
# --------------------------------------------------------------------------

from pyspark.sql import Column, functions as F  # noqa: E402


def dec(col: Column | str, scale: int = 2) -> Column:
    """Recover the exact decimal value of a 2-dp-grid double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def half_up(col: Column, scale: int = 2) -> Column:
    """Half-up rounding as explicit double arithmetic: deterministic
    across engines for identical inputs (mirror in SQL as
    ``floor(CAST(x AS DOUBLE) * 10^s + 0.5) / 10^s``)."""
    m = float(10**scale)
    return F.floor(col.cast("double") * m + F.lit(0.5)) / m
