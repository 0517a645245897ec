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
    assert res == {"matches_email": 2}  # 'nope' + NULL both violate
