"""MRJob: Hadoop-streaming-style mapper/reducer jobs on Spark RDDs.

Capability port of the reference's MAP-REDUCE lifecycle (SURVEY.md §3.3,
``Master/masterhandler.py:59-191``) with bit-compatible Lane-A semantics:

- mapper/reducer are *source strings* shipped to workers — the reference
  POSTs the source and pipes partition bytes through a subprocess
  (``Worker/worker_v1.py:100-122,177-218``); we write them to a job dir,
  register via ``SparkContext.addFile``, and use ``RDD.pipe``.
- shuffle key = substring before the first comma
  (``Worker/worker_v1.py:133``); same key ⇒ same partition. We hash with
  PySpark's ``portable_hash`` — the reference's ``myHash``
  (``Worker/shuffler.py:6-10``) skews badly (SURVEY.md §4) and only its
  *semantics* (same key → same bucket) are part of the contract.
- pre-reduce sort is lexicographic on the RAW LINE
  (``Worker/worker_v1.py:186-187``): ``"10" < "9"``. We sort the line
  string itself, not a typed key.
- partition count is explicit (the reference pins it to worker count,
  ``Master/masterhandler.py:24``; here it's just a parameter) and empty
  partitions are preserved (the WRITE padding invariant,
  ``Client/client_v1.py:102-109``).
- a failing mapper/reducer fails the job (the reference's HTTP-500
  abort contract, ``Worker/worker_v1.py:201-207``) via ``checkCode``.

At 100 TB this lane still scales — Spark's sort-based shuffle spills,
unlike the reference's in-memory string buffers
(``Worker/worker_v1.py:126-137``) — but the subprocess-per-partition
model is inherently the slow path; Lane B (plans/) is the performance
surface.
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

from pyspark.rdd import RDD, portable_hash
from pyspark.sql import DataFrame, SparkSession


def mr_keyby(line: str) -> str:
    """The reference's shuffle key: text before the first comma
    (``Worker/worker_v1.py:133``). Lines with no comma key as themselves."""
    return line.split(",", 1)[0]


class MRJob:
    """Run ``mapper.py`` / ``reducer.py`` sources over a line dataset.

    Equivalent CLI in the reference:
    ``python client_v1.py -mr mapper.py reducer.py file`` (``Client/
    client_v1.py:184-202``).
    """

    def __init__(
        self,
        spark: SparkSession,
        mapper_src: str,
        reducer_src: str,
        n_partitions: int = 10,
    ) -> None:
        self.spark = spark
        self.n_partitions = n_partitions
        self._job_dir = tempfile.mkdtemp(prefix="mrjob_")
        # The dir must outlive lazy job execution (local mode pipes the
        # absolute path), so it is reclaimed at interpreter exit rather
        # than per-job — a long-lived driver running many jobs no
        # longer leaks one dir per job forever (r7 review).
        import atexit
        import shutil

        atexit.register(shutil.rmtree, self._job_dir, ignore_errors=True)
        # Unique basenames per job: SparkContext.addFile dedups/conflicts
        # on basename, and one session runs many jobs (the reference
        # reuses ``mapper.py`` per job dir, ``worker_v1.py:105-108``, but
        # its workers are wiped between jobs by op 9 `clear`).
        self._uid = uuid.uuid4().hex[:8]
        self._mapper_path = self._ship(mapper_src, f"mapper_{self._uid}.py")
        self._reducer_path = self._ship(reducer_src, f"reducer_{self._uid}.py")

    def _ship(self, src: str, name: str) -> str:
        """Persist UDF source and register it with every executor — the
        analog of the master POSTing source code to workers
        (``Master/masterhandler.py:83-92,139-143``)."""
        path = os.path.join(self._job_dir, name)
        with open(path, "w") as fh:
            fh.write(src)
        self.spark.sparkContext.addFile(path)
        return path

    def _cmd(self, name: str) -> str:
        # local[N]: executors share the driver filesystem → absolute job
        # dir path. Cluster deploys pipe the bare addFile name, which
        # resolves from the task working dir on YARN/Kubernetes (both
        # localize spark.files into the container CWD). Spark
        # STANDALONE does not localize into the CWD — there, ship the
        # sources via --files or resolve through SparkFiles in a
        # bootstrap; documented limitation, not silently wrong (the
        # pipe fails loudly with checkCode=True).
        if self.spark.sparkContext.master.startswith("local"):
            return f"{sys.executable} {os.path.join(self._job_dir, name)}"
        return f"python3 {name}"

    def run(self, lines: RDD | DataFrame) -> RDD:
        """Full pipeline: map → shuffle(first comma field) →
        sort(raw line, lexicographic) → reduce. Returns an RDD of output
        lines."""
        rdd = lines.rdd.map(lambda row: row[0]) if isinstance(lines, DataFrame) else lines
        if rdd.getNumPartitions() != self.n_partitions:
            # WRITE semantics: exactly n partitions, padded when short
            # (client_v1.py:102-115).
            rdd = rdd.repartition(self.n_partitions)
        mapped = rdd.pipe(self._cmd(f"mapper_{self._uid}.py"), checkCode=True)
        shuffled = (
            mapped.map(lambda line: (line, None))
            .repartitionAndSortWithinPartitions(
                numPartitions=self.n_partitions,
                partitionFunc=lambda line: portable_hash(mr_keyby(line)),
                ascending=True,
                keyfunc=lambda line: line,
            )
            .keys()
        )
        return shuffled.pipe(self._cmd(f"reducer_{self._uid}.py"), checkCode=True)

    def run_to_kv_df(self, lines: RDD | DataFrame, key_name: str = "key", value_name: str = "value") -> DataFrame:
        """Run and split output on the first comma into a typed 2-column
        DataFrame (the reference's untyped ``(key, value)`` contract:
        the FIRST comma field is the key, so keys must not contain
        commas — values may)."""
        out = self.run(lines).map(
            lambda line: tuple(line.split(",", 1)) if "," in line else (line, None)
        )
        # Explicit schema: inference would fail if every value is None
        # (reducer output with no comma on any line).
        return out.toDF(f"{key_name} string, {value_name} string")

    def save(self, lines: RDD | DataFrame, path: str) -> None:
        """Write results as ``part-*`` text files — the reference's
        ``{name}-part-00000_{i}`` convention (``Worker/worker_v1.py:193``)
        is Spark's native output naming."""
        self.run(lines).saveAsTextFile(path)


#: Canonical word-count job — the reference's smoke test
#: (``Worker/worker_v1.py:109``), Hadoop-streaming protocol with
#: comma-separated kv lines.
#: Tokenization is single-space split + drop-empties, matching the
#: DuckDB oracle's string_split(lower(text), ' ') ... WHERE word <> ''
#: exactly — whitespace-class split() silently diverged on tab-bearing
#: text (r7 review; latent on the tabless fixtures). Comma-bearing
#: tokens are EXCLUDED on both sides: the reference kv format reserves
#: ',' as the key delimiter, so such a token would corrupt the
#: reducer's count parse ('int("bar,1")' job abort) — the oracle
#: carries the matching word NOT LIKE '%,%' filter.
WORDCOUNT_MAPPER = """\
import sys
for line in sys.stdin:
    for w in line.rstrip("\\n").lower().split(" "):
        if w and "," not in w:
            print(f"{w},1")
"""

WORDCOUNT_REDUCER = """\
import sys
cur, cnt = None, 0
for line in sys.stdin:
    line = line.rstrip("\\n")
    if not line:
        continue
    k, v = line.split(",", 1)
    if k != cur:
        if cur is not None:
            print(f"{cur},{cnt}")
        cur, cnt = k, 0
    cnt += int(v)
if cur is not None:
    print(f"{cur},{cnt}")
"""
