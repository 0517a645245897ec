"""plans/analytics.py units: grouped bucketed rank equivalence, triangle
counting against a hand-checked graph and a naive Spark twin, EWMA
kernel math, and attribution tolerance semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.operators.ranks import (
    bucketed_rank_grouped,
)


@pytest.fixture(scope="module")
def gdf(spark):
    # 3 groups of very different sizes, duplicate values, unique id.
    rows = [
        (i, "abc"[i % 3 if i < 600 else 0], (i * 13) % 40) for i in range(800)
    ]
    return spark.createDataFrame(rows, "id long, g string, v long")


def test_grouped_rank_matches_partitioned_window(spark, gdf):
    want = gdf.select(
        "id",
        F.row_number()
        .over(Window.partitionBy("g").orderBy("v", "id"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n"),
    )
    got = bucketed_rank_grouped(
        gdf,
        ["g"],
        F.floor(F.col("v") / 8),
        [F.col("v"), F.col("id")],
        rank_col="rn",
        total_col="n",
    ).select("id", F.col("rn").cast("int").alias("rn"), "n")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_grouped_rank_single_row_groups(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 3), (3, "c", 9)], "id long, g string, v long"
    )
    got = bucketed_rank_grouped(
        df, ["g"], F.floor(F.col("v") / 2), [F.col("v"), F.col("id")]
    )
    rows = {r["g"]: (r["rn"], r["n_total"]) for r in got.collect()}
    assert rows == {"a": (1, 1), "b": (1, 1), "c": (1, 1)}


def _count_triangles_naive(spark, edge_rows):
    """Reference implementation: u<v<w three-way join."""
    e = spark.createDataFrame(edge_rows, "u long, v long")
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return (
        e1.join(e2, "b").join(e3, ["a", "c"]).count()
    )


def _count_triangles_oriented(spark, edge_rows):
    """The degree-ordered composition from q_triangle_count, applied to
    an explicit edge list (u < v canonical input, like the query's)."""
    edges = spark.createDataFrame(edge_rows, "u long, v long")
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t"), F.col("dv").alias("dt")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"), F.col("du").alias("dt"))
            )
            .alias("e")
        )
        .select("e.s", "e.t", "e.dt")
    )
    a = oriented.select(F.col("s").alias("c"), F.col("t").alias("x"), F.col("dt").alias("dx"))
    b = oriented.select(F.col("s").alias("c"), F.col("t").alias("y"), F.col("dt").alias("dy"))
    wedges = a.join(b, "c").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("s").alias("x"), F.col("t").alias("y"))
    return wedges.join(closing, ["x", "y"]).count()


def test_triangles_k4(spark):
    # K4: C(4,3) = 4 triangles.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert _count_triangles_oriented(spark, k4) == 4
    assert _count_triangles_naive(spark, k4) == 4


def test_triangles_star_plus_rim(spark):
    # Hub 0 connected to 1..5, rim edges (1,2) and (3,4): 2 triangles;
    # hub degree 5 exercises the orientation's skew handling.
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (3, 4)]
    assert _count_triangles_oriented(spark, edges) == 2


def test_triangles_random_matches_naive(spark):
    import random

    rng = random.Random(7)
    edges = sorted({tuple(sorted(rng.sample(range(30), 2))) for _ in range(120)})
    assert _count_triangles_oriented(spark, edges) == _count_triangles_naive(
        spark, edges
    )


def test_ewma_kernel_hand_checked(spark, tmp_path):
    # One user, 3 events with cents 100, 200, 400:
    #   t1: 100
    #   t2: (200*128 + 100*64) / (128 + 64)         = 166.666.. cents
    #   t3: (400*128 + 200*64 + 100*32) / 224       = 300 cents
    from map_reduce_framework_using_python_spark.plans.analytics import q_rolling_ewma
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [base, base + dt.timedelta(hours=1), base + dt.timedelta(hours=2)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0, 2.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: r["ewma"]
        for r in q_rolling_ewma(spark, str(tmp_path)).collect()
    }
    assert got[1] == 1.0
    assert got[2] == round((200 * 128 + 100 * 64) / (192 * 100), 6)
    assert got[3] == 3.0


def test_pps_sample_hand_checked(spark, tmp_path):
    # 4 docs, weights 10/20/30/40 (total=100, k=25 → stride=4):
    # every doc's weight interval spans ≥1 stride boundary, so all are
    # selected; shrink one weight below the stride to see it CAN miss.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_framework_using_python_spark.plans.stats2 import ns_pps_sample

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = ns_pps_sample(spark, str(tmp_path)).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3, 4}
    # cum must be a permutation-consistent running sum of the weights.
    assert sorted(r["cum"] for r in rows)[-1] == 100


def _spearman_numpy(x, y):
    import numpy as np

    def avg_ranks(v):
        v = np.asarray(v)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=float)
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of positions i+1..j
            i = j
        return ranks

    rx, ry = avg_ranks(x), avg_ranks(y)
    rx = rx - rx.mean()
    ry = ry - ry.mean()
    return float((rx * ry).sum() / ((rx**2).sum() ** 0.5 * (ry**2).sum() ** 0.5))


def test_spearman_matches_numpy(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_framework_using_python_spark.plans.stats2 import q_spearman

    # One group, deliberate ties in both columns.
    x = [10, 10, 20, 30, 30, 30, 40, 50]
    y = [1.0, 2.0, 2.0, 3.0, 5.0, 4.0, 4.0, 8.0]
    n = len(x)
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int64()),
            "l_quantity": pa.array([float(v) for v in x], pa.float64()),
            "l_extendedprice": pa.array(y, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["A"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array([None] * n, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    got = q_spearman(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0]["n_rows"] == n
    assert got[0]["spearman_rho"] == round(_spearman_numpy(x, y), 6)
