"""Z-order clustering (operators/zorder.py): Morton-key correctness and
deterministic row-group-pruning evidence from parquet footer stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.zorder import (
    rowgroups_surviving,
    write_zordered,
    zorder_key,
)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    n = 1 << 4
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x",
        "y",
        zorder_key([(F.col("x"), 0, n - 1), (F.col("y"), 0, n - 1)], bits=4).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"], 4), (r["x"], r["y"])


def test_zorder_key_width_guard():
    with pytest.raises(ValueError):
        zorder_key([(F.col("a"), 0, 1)] * 8, bits=8)  # 64 bits > 63


def test_bucket_clamps_out_of_bounds(spark):
    df = spark.createDataFrame([(-50.0,), (0.0,), (999.0,)], "x double")
    z = df.select(zorder_key([(F.col("x"), 0.0, 100.0)], bits=4).alias("z")).collect()
    assert [r["z"] for r in z] == [0, 0, 15]  # clamped, never negative/overflow


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """The data-skipping claim itself: on a 2-D conjunctive range
    predicate, the Z-ordered layout's row-group min/max stats prune
    groups a single-column sort keeps. Footer-stats decision only —
    deterministic, no timing."""
    n = 200_000
    # Two independent uniform dims — worst case for single-column sort.
    df = (
        spark.range(n)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double").alias("a"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("double").alias("b"),
        )
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sort_a")
    # Small row groups ⇒ enough pruning granularity to see the effect.
    opts = {"parquet.block.size": 64 * 1024}
    write_zordered(
        df, zpath, [("a", 0.0, 999.0), ("b", 0.0, 999.0)], n_files=8,
        writer_options=opts,
    )
    w = (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
    )
    for k, v in opts.items():
        w = w.option(k, v)
    w.parquet(spath)

    # A moderately-selective a (30%) × selective b (6%) box — the shape
    # where single-column clustering is weakest: the a-sort must keep
    # every group overlapping 30% of its sort key no matter how tight b
    # is, while the Z-layout prunes on the conjunction.
    pred = {"a": (100.0, 400.0), "b": (500.0, 560.0)}
    z_keep, z_total = rowgroups_surviving(zpath, pred)
    s_keep, s_total = rowgroups_surviving(spath, pred)
    assert z_total > 16 and s_total > 16
    assert z_keep / z_total < s_keep / s_total, (z_keep, z_total, s_keep, s_total)
    assert s_keep / s_total >= 0.25  # the 1-D layout really is stuck at ~30%
    assert z_keep / z_total <= 0.25

    # And the layout loses no rows.
    assert spark.read.parquet(zpath).count() == n


def test_zorder_skipping_query_on_real_events(spark):
    """The registered query's claim on real data: the Z layout keeps a
    strictly smaller row-group fraction than the 1-D value sort."""
    from map_reduce_framework_using_python_spark.plans.core import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = {
        r["layout"]: (r["rowgroups_kept"], r["rowgroups_total"])
        for r in REGISTRY["ns_zorder_skipping"].fn(spark, SF_SMOKE).collect()
    }
    zk, zt = rows["zorder"]
    sk, st = rows["sort_value"]
    assert zk / zt < sk / st, rows
