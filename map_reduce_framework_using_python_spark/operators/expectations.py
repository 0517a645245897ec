"""Declarative data-quality expectations, evaluated in ONE pass.

The contract-checking layer a pipeline runs before publishing a table
(dbt tests / Delta constraints / Deequ, re-expressed as plain Spark):
each expectation compiles to a conditional aggregate, all of them run
inside a single hash-aggregate job — at 100 TB the whole suite costs
one scan, not one scan per rule.

Supported rules (each returns violation count):

* ``not_null(col)``
* ``unique(*cols)`` — duplicate-row count over the key
* ``in_range(col, lo, hi)`` — NULLs pass (add ``not_null`` to forbid)
* ``in_set(col, values)`` — NULLs pass
* ``matches(col, regex)`` — NULLs pass

Value rules skip NULLs, matching dbt tests / Deequ / SQL CHECK
semantics: a constraint only fails on a definitively-false value, and
nullability is ``not_null``'s job alone — a nullable column with a
range rule but no ``not_null`` is a deliberate contract.

``check()`` returns {rule_name: violations}; ``enforce()`` raises
``ExpectationError`` listing every failed rule (all rules are still
evaluated — one pass — before raising).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(AssertionError):
    def __init__(self, failures: dict[str, int]):
        self.failures = failures
        super().__init__(f"expectations failed: {failures}")


def _viol(cond: Column) -> Column:
    """Count of rows violating ``cond`` (NULL condition counts as a
    violation — used by ``not_null``, where NULL IS the violation)."""
    return F.sum(F.when(cond, 0).otherwise(1))


def _viol_skip_nulls(cond: Column, col: str) -> Column:
    """Count of rows where ``cond`` is definitively false: NULL values
    pass value rules (SQL CHECK semantics — nullability is a separate
    ``not_null`` contract)."""
    return _viol(cond | F.col(col).isNull())


class Expectations:
    def __init__(self, df: DataFrame):
        self._df = df
        self._aggs: list[Column] = []
        self._agg_names: set[str] = set()
        self._uniques: list[tuple[str, list[str]]] = []

    def _add(self, name: str, agg: Column) -> "Expectations":
        # Duplicate rule names fail FAST: two rules of one type on one
        # column would alias identically, and Row.asDict() keeps only
        # the last — the earlier rule's count silently vanishes and
        # enforce() can pass a violated contract (r7 review).
        if name in self._agg_names:
            raise ValueError(
                f"duplicate expectation {name!r} — two rules of the same "
                "type on one column would shadow each other's counts"
            )
        self._agg_names.add(name)
        self._aggs.append(agg.alias(name))
        return self

    def not_null(self, col: str) -> "Expectations":
        return self._add(f"not_null_{col}", _viol(F.col(col).isNotNull()))

    def in_range(self, col: str, lo, hi) -> "Expectations":
        return self._add(
            f"in_range_{col}", _viol_skip_nulls(F.col(col).between(lo, hi), col)
        )

    def in_set(self, col: str, values) -> "Expectations":
        return self._add(
            f"in_set_{col}", _viol_skip_nulls(F.col(col).isin(list(values)), col)
        )

    def matches(self, col: str, regex: str) -> "Expectations":
        return self._add(
            f"matches_{col}", _viol_skip_nulls(F.col(col).rlike(regex), col)
        )

    def unique(self, *cols: str) -> "Expectations":
        self._uniques.append((f"unique_{'_'.join(cols)}", list(cols)))
        return self

    def check(self) -> dict[str, int]:
        out: dict[str, int] = {}
        if self._aggs:
            row = self._df.agg(*self._aggs).first()  # ONE job for all scalar rules
            out.update({k: int(v or 0) for k, v in row.asDict().items()})
        for name, cols in self._uniques:
            # uniqueness needs a shuffle on the key — count rows beyond
            # the first per key (0 ⇔ key is unique)
            dups = (
                self._df.groupBy(*cols)
                .count()
                .agg(F.sum(F.col("count") - 1).alias("v"))
                .first()["v"]
            )
            out[name] = int(dups or 0)
        return out

    def enforce(self) -> dict[str, int]:
        results = self.check()
        failures = {k: v for k, v in results.items() if v}
        if failures:
            raise ExpectationError(failures)
        return results


def expect(df: DataFrame) -> Expectations:
    return Expectations(df)
