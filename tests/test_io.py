"""Source/sink tests (reference ops 1-2): text WRITE/READ round-trips
with explicit partition counts and padding, CSV/JSON/Parquet formats,
and catalog view registration."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.sources.io import (
    load_table,
    read_text,
    register_views,
    write_parquet,
    write_text,
)
from tests.conftest import SF_SMOKE


def test_text_write_read_roundtrip(spark, tmp_path):
    """WRITE then READ preserves content (the reference's -w / -r pair,
    ``client_v1.py:75-176``)."""
    lines = [f"line-{i}" for i in range(100)]
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    out = str(tmp_path / "t1")
    write_text(df, out, n_partitions=7)
    back = read_text(spark, out)
    assert sorted(r["value"] for r in back.collect()) == sorted(lines)
    # Explicit partition count → exactly 7 part files (reference:
    # partitions == workers, masterhandler.py:24).
    assert len(glob.glob(os.path.join(out, "part-*"))) == 7


def test_text_write_padding_invariant(spark, tmp_path):
    """Fewer rows than partitions still produces N part files — empty
    ones included (client_v1.py:102-109)."""
    df = spark.createDataFrame([("only",), ("two",)], ["value"])
    out = str(tmp_path / "t2")
    write_text(df, out, n_partitions=5)
    assert len(glob.glob(os.path.join(out, "part-*"))) == 5
    assert sorted(r["value"] for r in read_text(spark, out).collect()) == ["only", "two"]


def test_single_file_gather(spark, tmp_path):
    """READ's merge-to-one-file semantics (client_v1.py:172-176)."""
    df = spark.createDataFrame([(f"r{i}",) for i in range(10)], ["value"])
    out = str(tmp_path / "t3")
    write_text(df, out, single_file=True)
    assert len(glob.glob(os.path.join(out, "part-*"))) == 1


def test_csv_json_parquet_roundtrip(spark, tmp_path):
    """Format extensions beyond the reference's text-only surface."""
    src = load_table(spark, SF_SMOKE, "nation")
    for fmt in ("csv", "json", "parquet"):
        out = str(tmp_path / f"fmt_{fmt}")
        if fmt == "csv":
            src.write.mode("overwrite").option("header", True).csv(out)
            back = spark.read.option("header", True).schema(src.schema).csv(out)
        elif fmt == "json":
            src.write.mode("overwrite").json(out)
            back = spark.read.schema(src.schema).json(out)
        else:
            write_parquet(src, out)
            back = spark.read.parquet(out)
        assert sorted(map(str, back.collect())) == sorted(map(str, src.collect()))


def test_partitioned_parquet_prunes(spark, tmp_path):
    """partitionBy + a partition predicate → partition pruning (the scan
    must list only the matching directory)."""
    src = load_table(spark, SF_SMOKE, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    out = str(tmp_path / "part_orders")
    write_parquet(src, out, partition_by=["status"])
    pruned = spark.read.parquet(out).filter(F.col("status") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == src.filter("o_orderstatus = 'F'").count()
    assert "PartitionFilters: [isnotnull(status" in plan or "status=F" in plan


def test_register_views_sql(spark):
    register_views(spark, SF_SMOKE)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n == 6000


def test_generic_format_roundtrip_including_orc(spark, tmp_path):
    """write_table_path/read_table_path roundtrip every built-in
    columnar/row format, ORC included (same Tungsten scan machinery as
    parquet — vectorized reader, pushdown)."""
    from map_reduce_framework_using_python_spark.sources.io import (
        FORMATS,
        read_table_path,
        write_table_path,
    )

    src = load_table(spark, SF_SMOKE, "nation")
    want = {tuple(r) for r in src.collect()}
    for fmt in FORMATS:
        out = str(tmp_path / f"t_{fmt}")
        write_table_path(src, out, fmt=fmt)
        back = read_table_path(spark, out, fmt=fmt, schema=src.schema)
        assert {tuple(r) for r in back.collect()} == want, fmt


def test_orc_partitioned_write_prunes(spark, tmp_path):
    from map_reduce_framework_using_python_spark.sources.io import (
        read_table_path,
        write_table_path,
    )

    src = load_table(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "orc_part")
    write_table_path(src, out, fmt="orc", partition_by=["n_regionkey"])
    df = read_table_path(spark, out, fmt="orc").filter("n_regionkey = 2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert df.count() == src.filter("n_regionkey = 2").count()


def test_permissive_json_corrupt_records_quarantined(spark, tmp_path):
    """Malformed rows at 100 TB are routine: PERMISSIVE mode parses what
    it can and quarantines the rest in _corrupt_record instead of
    failing the job (FAILFAST is opt-in for strict loads)."""
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "v": 10}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20}\n'
        '{"id": 3, "v": }\n'
    )
    df = spark.read.schema("id long, v long, _corrupt_record string").json(str(p))
    rows = df.collect()
    good = {r["id"]: r["v"] for r in rows if r["_corrupt_record"] is None}
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    assert good == {1: 10, 2: 20}
    assert len(bad) == 2 and "NOT JSON" in bad[0]

    import pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401

    with pytest.raises(Exception):
        spark.read.schema("id long, v long").option("mode", "FAILFAST").json(str(p)).collect()


def test_aqe_coalesces_shuffle_partitions_at_runtime(spark):
    """AQE evidence: a tiny aggregate planned with 32 shuffle partitions
    executes with far fewer after runtime coalescing — the mechanism
    that makes one static shuffle-partition setting survive 100 TB in
    one stage and 100 KB in the next."""
    from pyspark.sql import functions as F

    df = load_table(spark, SF_SMOKE, "nation").groupBy("n_regionkey").agg(
        F.count("*").alias("n")
    )
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan


def test_events_ts_unit_detection(spark, tmp_path):
    # The loader must normalize events.ts to µs from WHATEVER physical
    # unit the parquet footer declares — testdata generations have
    # shipped both ns and µs (the driver refresh mid-round-3 flipped
    # it; lesson #11 in NOTES.md).
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_framework_using_python_spark.sources.io import load_table

    want = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)
    for unit in ("ns", "us", "ms"):
        d = tmp_path / unit
        d.mkdir()
        val = want if unit != "ms" else want.replace(microsecond=123000)
        tbl = pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([val], pa.timestamp(unit)),
                "user_id": pa.array([1], pa.int64()),
                "event_type": pa.array(["view"]),
                "value": pa.array([1.0], pa.float64()),
                "props": pa.array(["{}"]),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        got = load_table(spark, str(d), "events").first()["ts"]
        assert got == val, (unit, got, val)
