"""`mrtext` — a Spark 4 Python DataSource for the reference's DFS layout.

The reference's "filesystem" is a directory of line-text part files
(`Client/client_v1.py:96-115` splits; `Worker/worker_v1.py:81-98`
stores; `Worker/worker_v1.py:193` names reduce output `part-00000_{i}`),
and its scheduler reads each part on the worker that stores it. This
module re-expresses that contract through Spark's DataSource V2 Python
API (pyspark.sql.datasource, Spark 4.0+):

* **read**: one Spark input partition PER PART FILE, in manifest
  (index) order — the moral equivalent of the reference's
  placement-local map tasks — with the part index surfaced as a
  column (the manifest the reference keeps in `references.json`);
* **write**: honors the empty-partition padding invariant
  (`client_v1.py:102-109`): writing with an explicit partition count
  N produces exactly N part files even when rows < N (Spark's native
  text sink skips empty partitions).

This is the *extensibility* path — a custom source participates in
Catalyst like any table (schema, partitions → tasks). The production
lane stays Parquet (`sources/io.py`); mrtext exists for MR-compat and
as the template for wrapping any bespoke storage layout.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("part", IntegerType(), nullable=False),
        StructField("value", StringType(), nullable=True),
    ]
)


class _PartFile(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


def _part_files(path: str) -> list[str]:
    # reference naming: part_0.. / part-00000_{i} / Spark part-*; sort
    # lexicographic-with-numeric-suffix so index order == manifest order
    files = [
        f
        for f in glob.glob(os.path.join(path, "*"))
        if os.path.isfile(f) and not os.path.basename(f).startswith((".", "_"))
    ]

    def keyf(f: str):
        base = os.path.basename(f)
        digits = "".join(c for c in base if c.isdigit())
        return (int(digits) if digits else 0, base)

    return sorted(files, key=keyf)


class MRTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrtext: path required (use .load(<dir>))")

    def partitions(self):
        return [_PartFile(i, f) for i, f in enumerate(_part_files(self.path))]

    def read(self, partition: _PartFile):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                yield (partition.index, line.rstrip("\n"))


class _Committed(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class MRTextWriter(DataSourceWriter):
    """Each Spark task writes its partition to ``_tmp_part_<id>``; the
    driver-side commit renames the full set into ``part_<i>`` — the
    all-or-nothing contract the reference enforces by aborting WRITE
    when any worker POST fails (`client_v1.py:127-133`)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrtext: path required (use .save(<dir>))")
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self.path, exist_ok=True)
        # Attempt id in the tmp name (r7 review): speculative/zombie
        # attempts of one task must not interleave writes into a shared
        # file — each attempt owns its own tmp; only the attempt whose
        # commit message the driver receives is renamed in, and commit
        # sweeps the losers (plus any orphans from attempts that died
        # before messaging).
        tmp = os.path.join(
            self.path, f"_tmp_part_{pid}_a{ctx.attemptNumber()}"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                # rows arrive with the writer schema; last field is the line
                fh.write(f"{row[-1]}\n")
        return _Committed(tmp)

    def commit(self, messages):
        existing = glob.glob(os.path.join(self.path, "part_*"))
        if self.overwrite:
            for old in existing:
                os.remove(old)
            start = 0
        else:
            # append: keep existing parts, continue numbering after the
            # current max index (mode('append') must not lose data)
            def _idx(f: str) -> int:
                suffix = os.path.basename(f).rsplit("_", 1)[-1]
                return int(suffix) if suffix.isdigit() else -1

            start = max((_idx(f) for f in existing), default=-1) + 1

        # padding invariant: every task committed a file, even empty ones;
        # numeric sort on the task id (lexicographic would put 10 < 2)
        def _pid(m):
            # _tmp_part_<pid>_a<attempt> → pid
            return int(os.path.basename(m.path).split("_a")[0].rsplit("_", 1)[-1])

        for i, m in enumerate(sorted(messages, key=_pid)):
            os.replace(m.path, os.path.join(self.path, f"part_{start + i}"))
        # Sweep losing/zombie attempts and orphans from attempts that
        # died before returning a commit message — they are invisible
        # to abort() and used to accumulate in the data dir forever.
        for stale in glob.glob(os.path.join(self.path, "_tmp_part_*")):
            os.remove(stale)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class MRTextStreamWriter(DataSourceStreamWriter):
    """Streaming SINK for the DFS layout — the landing-zone half of the
    reference's contract (batch jobs write parts; here a STREAM lands
    them continuously, and the streaming reader on another directory
    picks them up — the relay topology a real ingest pipeline wires).

    Exactly-once per micro-batch on top of Spark's at-least-once
    foreachBatch-style replay: final part names embed the batch id
    (``part_{batchId:06d}_{i:04d}`` — batch-major under
    ``_part_files``'s digit sort, so read order == commit order), and
    ``commit`` REPLACES the batch's own parts before renaming the new
    set in — a crash-replayed batch overwrites itself, never
    duplicates. Task-side mechanics mirror the batch writer: each
    attempt owns ``_tmp_stream_<pid>_a<attempt>``; only the attempt
    whose commit message the driver receives is renamed in, and commit
    sweeps losers/orphans (micro-batches are serial per stream, so the
    sweep can't eat a concurrent batch's tmps). One stream owns a sink
    directory — mixing it with batch ``mode("append")`` writes is
    outside the contract (their unnumbered ``part_<i>`` names would
    interleave into the digit sort)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrtext: path required (use .option('path', dir))")

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path,
            f"_tmp_stream_{ctx.partitionId()}_a{ctx.attemptNumber()}",
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row[-1]}\n")
        return _Committed(tmp)

    def commit(self, messages, batchId: int) -> None:
        prefix = os.path.join(self.path, f"part_{batchId:06d}_")
        # idempotent replay: the batch replaces its OWN parts
        for stale in glob.glob(prefix + "*"):
            os.remove(stale)

        def _pid(m):
            return int(os.path.basename(m.path).split("_a")[0].rsplit("_", 1)[-1])

        for i, m in enumerate(sorted(messages, key=_pid)):
            os.replace(m.path, f"{prefix}{i:04d}")
        for orphan in glob.glob(os.path.join(self.path, "_tmp_stream_*")):
            os.remove(orphan)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class MRTextStreamReader(DataSourceStreamReader):
    """Stream the DFS layout: parts consumed in manifest order — the
    landing-directory contract. The reference's client polls the master
    for new parts and maps each as it lands (`client_v1.py:96-115`
    registers parts in index order); here the offset IS the manifest
    position (``{"next_part": i}``), so Spark's checkpoint gives
    exactly-once per part: a restart resumes at the first unconsumed
    part, and ``partitions(start, end)`` replays a
    committed-but-unwritten batch deterministically from the same files
    (part files are immutable once landed — the writer's
    rename-on-commit guarantees no half-written part is ever visible).

    This is the FULL DataSourceStreamReader (r13; it replaced the r10
    SimpleDataSourceStreamReader): ``latestOffset`` is one directory
    listing on the driver, and each part file becomes its own input
    partition whose rows are read EXECUTOR-SIDE — the simple reader
    materialized every row in a driver-side list, which caps at the
    driver's memory; this form scales to a 100 TB landing directory
    exactly like the batch reader (one task per part, placement-local).
    It also honors the real ``Trigger.AvailableNow`` contract through
    Spark's AvailableNow wrapper
    (``spark.sql.streaming.triggerAvailableNowWrapper.enabled``, set in
    session.py and ensure_resolvable): the end offset is pinned ONCE at
    query start and the run drains exactly the parts landed before it —
    no single-batch-fallback warning, and parts landing mid-run wait
    for the next drain. The wrapper is incompatible with the simple
    reader's driver-side prefetch cache (its ``latestOffset``-twice
    pattern trips the cache assert in pyspark's datasource_internal) —
    a second reason the full reader is the right shape."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrtext: path required (use .load(<dir>))")

    def initialOffset(self) -> dict:
        return {"next_part": 0}

    def latestOffset(self) -> dict:
        return {"next_part": len(_part_files(self.path))}

    def partitions(self, start: dict, end: dict):
        parts = _part_files(self.path)
        return [
            _PartFile(i, parts[i])
            for i in range(start["next_part"], min(end["next_part"], len(parts)))
        ]

    def read(self, partition: _PartFile):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                yield (partition.index, line.rstrip("\n"))

    def commit(self, end: dict) -> None:
        # nothing to clean up: offsets are manifest positions over
        # immutable part files; Spark's checkpoint owns progress
        pass


class MRTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mrtext"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return MRTextReader(self.options)

    def writer(self, schema, overwrite: bool):
        return MRTextWriter(self.options, overwrite)

    def streamReader(self, schema):
        return MRTextStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return MRTextStreamWriter(self.options)


def register(spark) -> None:
    """Idempotently register the mrtext format on a session."""
    spark.dataSource.register(MRTextDataSource)


def ensure_resolvable(spark) -> None:
    """Register mrtext AND pin the JVM active session for this thread.

    The JVM resolves a Python data source through the ACTIVE session of
    whichever Py4J thread serves the call (``DataSource.lookupDataSource``
    falls back to the active session's DataSourceManager). Under pinned-
    thread mode (PySpark's default) each Python thread maps to one JVM
    thread whose active-session thread-local can be a STALE CLONE left
    by an earlier streaming query on a foreign session (the driver's, a
    notebook's) — registration on the real session is then invisible and
    the lookup throws ``ClassNotFoundException: mrtext.DefaultSource``
    (NOTES lesson 12; observed in the round-11 driver run). Re-pinning
    the active session to the session we registered on makes resolution
    deterministic for calls issued from this Python thread.
    """
    register(spark)
    # The stream reader's real-AvailableNow contract rides Spark's
    # wrapper (see MRTextStreamReader) — a foreign session (the
    # driver's) may not have it on, and it is runtime-settable.
    try:
        spark.conf.set(
            "spark.sql.streaming.triggerAvailableNowWrapper.enabled", "true"
        )
    except Exception:
        pass
    try:
        spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
            spark._jsparkSession
        )
    except Exception:
        # Non-classic (Connect) sessions have no JVM handle; plain
        # registration is all we can (and need to) do there.
        pass


def _is_resolution_error(exc: BaseException) -> bool:
    s = str(exc)
    return "mrtext" in s and (
        "ClassNotFoundException" in s
        or "DATA_SOURCE_NOT_FOUND" in s
        or "Failed to find" in s
    )


def with_resolution_retry(spark, fn, attempts: int = 3, delay: float = 0.5):
    """Run ``fn()`` with re-register + active-session re-pin + retry on
    the mrtext resolution race.

    Belt and braces over :func:`ensure_resolvable`: if a foreign
    session's thread-locals shift between our pin and the resolving
    call (another stream starting concurrently), the failed attempt is
    retried after re-pinning. Only resolution failures are retried —
    anything else propagates immediately.
    """
    import time

    last: BaseException | None = None
    for i in range(attempts):
        ensure_resolvable(spark)
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered below
            if not _is_resolution_error(e):
                raise
            last = e
            if i + 1 < attempts:
                time.sleep(delay)
    raise last
