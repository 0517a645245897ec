"""`mrtext` Python DataSource (sources/mrfs.py): the reference's DFS
layout as a first-class Spark format — placement-shaped reads (one
input partition per part file, manifest order) and padded writes
(exactly N part files even when rows < N, `client_v1.py:102-109`)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.sources import mrfs


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    mrfs.register(spark)


def _write_parts(path: str, parts: list[list[str]]) -> None:
    os.makedirs(path)
    for i, lines in enumerate(parts):
        with open(os.path.join(path, f"part_{i}"), "w") as fh:
            fh.writelines(f"{x}\n" for x in lines)


def test_read_one_partition_per_part_file(spark, tmp_path):
    src = str(tmp_path / "dfs")
    _write_parts(src, [["a", "b"], ["c"], ["d", "e", "f"]])
    df = spark.read.format("mrtext").load(src)
    assert df.rdd.getNumPartitions() == 3  # placement: task i ⇔ part i
    rows = {(r["part"], r["value"]) for r in df.collect()}
    assert rows == {(0, "a"), (0, "b"), (1, "c"), (2, "d"), (2, "e"), (2, "f")}
    # part index comes from manifest order, not arrival order
    assert [r["value"] for r in df.filter("part = 2").orderBy("value").collect()] == [
        "d",
        "e",
        "f",
    ]


def test_read_empty_parts_and_numeric_order(spark, tmp_path):
    src = str(tmp_path / "dfs")
    _write_parts(src, [["x"], [], ["y"], [], [], [], [], [], [], [], ["tail10"]])
    df = spark.read.format("mrtext").load(src)
    assert df.rdd.getNumPartitions() == 11
    # part_10 must sort after part_2 (numeric, not lexicographic)
    assert df.filter("part = 10").collect()[0]["value"] == "tail10"
    assert df.count() == 3


def test_write_padding_invariant(spark, tmp_path):
    dst = str(tmp_path / "out")
    df = spark.createDataFrame([(v,) for v in "abc"], "value string").repartition(7)
    df.select(F.lit(0).alias("part"), "value").write.format("mrtext").mode(
        "append"
    ).save(dst)
    files = sorted(os.listdir(dst))
    assert files == [f"part_{i}" for i in range(7)]  # 3 rows, 7 files — padded
    total = sum(
        1 for f in files for _ in open(os.path.join(dst, f), encoding="utf-8")
    )
    assert total == 3


def test_roundtrip(spark, tmp_path):
    dst = str(tmp_path / "rt")
    data = [f"line{i}" for i in range(100)]
    df = spark.createDataFrame([(0, v) for v in data], "part int, value string")
    df.repartition(4).write.format("mrtext").mode("append").save(dst)
    back = spark.read.format("mrtext").load(dst)
    assert back.rdd.getNumPartitions() == 4
    assert sorted(r["value"] for r in back.collect()) == sorted(data)


def test_append_keeps_existing_parts(spark, tmp_path):
    """mode('append') must extend the part sequence, not silently
    overwrite (ADVICE r2): numbering continues after the existing max."""
    dst = str(tmp_path / "app")
    first = spark.createDataFrame([(0, f"a{i}") for i in range(6)], "part int, value string")
    first.repartition(3).write.format("mrtext").mode("append").save(dst)
    assert sorted(os.listdir(dst)) == ["part_0", "part_1", "part_2"]

    second = spark.createDataFrame([(0, f"b{i}") for i in range(4)], "part int, value string")
    second.repartition(2).write.format("mrtext").mode("append").save(dst)
    assert sorted(os.listdir(dst)) == [f"part_{i}" for i in range(5)]

    back = spark.read.format("mrtext").load(dst)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        [f"a{i}" for i in range(6)] + [f"b{i}" for i in range(4)]
    )


def test_overwrite_replaces_existing_parts(spark, tmp_path):
    dst = str(tmp_path / "ovw")
    first = spark.createDataFrame([(0, f"a{i}") for i in range(6)], "part int, value string")
    first.repartition(3).write.format("mrtext").mode("append").save(dst)
    second = spark.createDataFrame([(0, "fresh")], "part int, value string")
    second.repartition(1).write.format("mrtext").mode("overwrite").save(dst)
    assert sorted(os.listdir(dst)) == ["part_0"]
    back = spark.read.format("mrtext").load(dst)
    assert [r["value"] for r in back.collect()] == ["fresh"]


def test_stream_one_microbatch_per_part(spark, tmp_path):
    """readStream on the DFS layout: AvailableNow drains every part,
    one micro-batch per part file, content identical to the batch
    read (the streaming reader is an ACCESS-PATH change only)."""
    src = str(tmp_path / "dfs")
    _write_parts(src, [["a", "b"], ["c"], ["d", "e", "f"]])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("mrtext")
        .load(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["part"], r["value"]) for r in spark.read.parquet(out).collect()}
    want = {
        (r["part"], r["value"])
        for r in spark.read.format("mrtext").load(src).collect()
    }
    assert got == want


def test_stream_resumes_at_first_unconsumed_part(spark, tmp_path):
    """Checkpointed offsets give exactly-once per part: after a drain,
    a newly landed part is the ONLY thing the next drain emits."""
    src = str(tmp_path / "dfs")
    _write_parts(src, [["a"], ["b"]])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("mrtext")
            .load(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    with open(os.path.join(src, "part_2"), "w") as fh:
        fh.write("late\n")
    drain()
    rows = sorted(
        (r["part"], r["value"]) for r in spark.read.parquet(out).collect()
    )
    # every line exactly once — part_0/part_1 not re-emitted by drain 2
    assert rows == [(0, "a"), (1, "b"), (2, "late")]


def test_resolution_survives_stale_active_session(spark, tmp_path):
    """NOTES lesson 12 / round-11 driver red row, pinned: the JVM
    resolves `mrtext` through the ACTIVE session of the serving Py4J
    thread, and a stale session (a clone left by an earlier streaming
    query in a foreign session, here simulated by a newSession() with
    no registration) makes the lookup throw DATA_SOURCE_NOT_FOUND even
    though the writer's own session registered the source.
    `mrfs.with_resolution_retry` re-registers + re-pins the active
    session and must succeed on the same thread state."""
    foreign = spark.newSession()  # mrtext deliberately NOT registered

    def _poison():
        spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
            foreign._jsparkSession
        )

    df = spark.range(3).select(
        F.lit(0).alias("part"), F.col("id").cast("string").alias("value")
    )
    # 1) the poisoned thread-local reproduces the driver failure
    _poison()
    with pytest.raises(Exception, match="DATA_SOURCE_NOT_FOUND|mrtext"):
        df.write.format("mrtext").mode("append").save(str(tmp_path / "d0"))
    # 2) the hardened path survives the same poisoned state
    _poison()
    dst = str(tmp_path / "d1")
    mrfs.with_resolution_retry(
        spark,
        lambda: df.repartition(1)
        .write.format("mrtext")
        .mode("append")
        .save(dst),
    )
    _poison()
    back = mrfs.with_resolution_retry(
        spark, lambda: spark.read.format("mrtext").load(dst)
    )
    assert back.count() == 3
    # restore sanity for subsequent tests sharing this thread
    mrfs.ensure_resolvable(spark)


def test_uncommitted_batch_restart_replays_identically(spark, tmp_path):
    """The real Trigger.AvailableNow contract (r13: full
    DataSourceStreamReader + Spark's AvailableNow wrapper): a batch
    whose offset was logged but never committed (sink crash) is
    replayed byte-identically from the same part files on restart
    (``partitions(start, end)`` is file-aligned over immutable parts),
    a part landed between crash and restart is NOT folded into the
    replayed batch — it settles as its OWN batch in the same restart
    drain (the wrapper pins the end offset once at query start, so the
    drain consumes exactly the parts landed before it) — and a further
    drain with nothing new is empty."""
    src = str(tmp_path / "dfs")
    _write_parts(src, [["a"], ["b"]])
    ckpt = str(tmp_path / "ckpt")
    batches: list[tuple[int, list]] = []
    armed = {"crash": True}

    def sink(df, epoch):
        rows = sorted((r["part"], r["value"]) for r in df.collect())
        batches.append((epoch, rows))
        if armed["crash"]:
            armed["crash"] = False
            raise RuntimeError("crash after offset log, before commit")

    def drain():
        q = (
            spark.readStream.format("mrtext")
            .load(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="crash after offset log"):
        drain()
    assert batches[0][1] == [(0, "a"), (1, "b")]
    # a new part lands while batch 0 sits committed-but-unwritten
    with open(os.path.join(src, "part_2"), "w") as fh:
        fh.write("late\n")
    drain()
    replays = [rows for _, rows in batches[1:]]
    # batch 0 replay: identical content, no late part folded in
    assert replays[0] == [(0, "a"), (1, "b")]
    # real-AvailableNow semantics: the restart drain then advances to
    # the offset pinned at ITS start — the late part arrives exactly
    # once, alone, as the next batch of the same run
    assert replays[1:] == [[(2, "late")]]
    # nothing new → a further drain settles no batches
    drain()
    assert [rows for _, rows in batches[3:]] == []


def _drain_to_sink(spark, land, dst, ckpt):
    q = (
        spark.readStream.schema("part int, value string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(land)
        .writeStream.format("mrtext")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_sink_lands_parts_batch_major_and_replay_safe(spark, tmp_path):
    """The streaming mrtext SINK (r12): one part set per micro-batch,
    batch-major under the digit sort (read order == commit order), and
    a redelivered drain (fresh checkpoint, same data) REPLACES its own
    parts instead of duplicating — exactly-once on disk over
    at-least-once replay."""
    import os

    land = str(tmp_path / "land")
    os.makedirs(land)
    for i, vals in enumerate((["a", "b"], ["c"])):
        spark.createDataFrame(
            [(0, v) for v in vals], "part int, value string"
        ).coalesce(1).write.parquet(os.path.join(land, f"b{i}.parquet"))
        # deterministic arrival order for maxFilesPerTrigger
        os.utime(
            os.path.join(land, f"b{i}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )

    dst = str(tmp_path / "dfs")
    _drain_to_sink(spark, land, dst, str(tmp_path / "ck1"))
    names = sorted(os.listdir(dst))
    assert all(n.startswith("part_") for n in names)
    batches = {n.split("_")[1] for n in names}
    assert len(batches) == 2  # one part set per micro-batch
    back = spark.read.format("mrtext").load(dst)
    got = sorted(r["value"] for r in back.collect())
    assert got == ["a", "b", "c"]

    # redelivery: fresh checkpoint reprocesses everything; batch ids
    # restart at 0 and each batch replaces its own parts
    _drain_to_sink(spark, land, dst, str(tmp_path / "ck2"))
    assert sorted(os.listdir(dst)) == names
    assert sorted(
        r["value"] for r in spark.read.format("mrtext").load(dst).collect()
    ) == ["a", "b", "c"]


def test_stream_sink_registry_query_roundtrip(spark):
    """st_mrtext_sink end-to-end: landed parts reproduce the filtered
    text column exactly."""
    from map_reduce_framework_using_python_spark.plans import REGISTRY
    from map_reduce_framework_using_python_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    got = sorted(
        r["text"]
        for r in REGISTRY["st_mrtext_sink"].fn(spark, SF_SMOKE).collect()
    )
    want = sorted(
        r["text"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter("lang = 'de'")
        .collect()
    )
    assert got == want and got
