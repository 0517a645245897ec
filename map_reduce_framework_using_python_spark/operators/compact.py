"""Small-file compaction — the table-maintenance pass every long-lived
100 TB dataset needs.

Streaming sinks, incremental appends, and over-parallel writers leave
thousands of KB-scale files; scans then pay per-file open/footer cost
and lose row-group-level pruning. Compaction rewrites a directory to
~``target_rows`` rows per file (the knob stands in for target bytes,
which at real scale you derive from row width) and swaps it in
atomically: write to a side directory, then rename over the original —
readers see the old or the new layout, never a mix. The reference has
the same all-or-nothing contract on WRITE (`client_v1.py:127-133`).

``repartition(n)`` (round-robin) balances output file sizes; passing
``by`` instead hash-partitions on those columns so compaction can
simultaneously restore bucketing-friendly locality.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows: int,
    by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` to ceil(n/target_rows) parquet files; returns
    {files_before, files_after, rows}. Atomic swap via rename."""
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    # Recover from a prior crashed run before touching anything:
    # - crash between the two renames leaves the live data at `old`
    #   with `path` missing → restore it;
    # - leftover `tmp`/`old` from any other crash point would make the
    #   renames below fail with EEXIST → clear them.
    if not os.path.exists(path) and os.path.isdir(old):
        os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    df = spark.read.parquet(path)
    n = df.count()
    files_before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(n / target_rows))
    repartitioned = (
        df.repartition(n_files, *by) if by else df.repartition(n_files)
    )
    repartitioned.write.mode("overwrite").parquet(tmp)
    # NOT a single atomic op: between these two renames `path` briefly
    # does not exist (POSIX rename can't swap directories). A crash in
    # the window is healed by the recovery block above on the next run;
    # concurrent READERS during the window must retry. True atomicity
    # needs a pointer-file scheme (see streaming/cdc.py).
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": files_before,
        "files_after": sum(1 for f in os.listdir(path) if f.endswith(".parquet")),
        "rows": n,
    }
