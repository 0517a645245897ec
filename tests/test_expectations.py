"""Data-quality expectations (operators/expectations.py): single-pass
scalar rules, keyed uniqueness, enforce() raising with ALL failures."""

from __future__ import annotations

import pytest

from map_reduce_framework_using_python_spark.operators.expectations import (
    ExpectationError,
    expect,
)
from map_reduce_framework_using_python_spark.plans.core import t
from tests.conftest import SF_SMOKE


def test_clean_table_passes(spark):
    res = (
        expect(t(spark, SF_SMOKE, "events"))
        .not_null("event_id")
        .not_null("ts")
        .in_range("value", 0.0, 1000.0)
        .in_set("event_type", ["view", "click", "purchase", "signup", "error"])
        .unique("event_id")
        .enforce()
    )
    assert set(res.values()) == {0}


def test_violations_counted_and_raised(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (2, "c", -3.0), (3, "d", 7.0)],
        "id long, name string, v double",
    )
    with pytest.raises(ExpectationError) as ei:
        expect(df).not_null("name").in_range("v", 0.0, 10.0).unique("id").enforce()
    assert ei.value.failures == {
        "not_null_name": 1,
        "in_range_v": 2,  # 50.0 and -3.0 both outside [0, 10]
        "unique_id": 1,
    }


def test_matches_rule(spark):
    df = spark.createDataFrame(
        [("a@b.com",), ("nope",), (None,)], "email string"
    )
    res = expect(df).matches("email", r"^[^@]+@[^@]+\.[^@]+$").check()
    assert res == {"matches_email": 1}  # 'nope' only — NULL passes value rules


def test_value_rules_skip_nulls_not_null_catches_them(spark):
    """dbt/Deequ/SQL-CHECK semantics: NULL passes in_range/in_set/matches;
    nullability is not_null's job alone."""
    df = spark.createDataFrame(
        [(1.0, "a"), (None, None), (99.0, "zz")], "v double, s string"
    )
    res = (
        expect(df)
        .in_range("v", 0.0, 10.0)
        .in_set("s", ["a", "b"])
        .matches("s", r"^[a-y]$")
        .not_null("v")
        .check()
    )
    assert res == {
        "in_range_v": 1,   # 99.0 only; NULL passes
        "in_set_s": 1,     # 'zz' only; NULL passes
        "matches_s": 1,    # 'zz' only; NULL passes
        "not_null_v": 1,   # NULL caught where it belongs
    }


def test_duplicate_rule_fails_fast(spark):
    """r7 operators-2 review: two rules of one type on one column
    aliased identically and Row.asDict kept only the last — the gate
    could fail open. Duplicates now raise at build time."""
    import pytest

    from map_reduce_framework_using_python_spark.operators.expectations import expect
    from map_reduce_framework_using_python_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    l = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(ValueError, match="duplicate expectation"):
        expect(l).matches("l_returnflag", "A").matches("l_returnflag", "B")
