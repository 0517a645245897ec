"""Streaming CDC apply: a ``foreachBatch`` MERGE sink over plain parquet.

Structured Streaming's file sink is append-only; applying a CDC stream
(upserts) needs MERGE semantics per micro-batch. Without Delta/Iceberg
jars in this image, the sink emulates a lakehouse commit protocol:

- each micro-batch runs the anti-join + union MERGE
  (:func:`..operators.merge.merge_upsert`) of the batch into the
  current table version,
- writes the merged result as a NEW versioned directory
  (``v<batch_id>``), never touching the live one,
- then atomically repoints ``_CURRENT`` (write-tmp + ``os.replace``).

Readers always see a complete version; a crash mid-batch leaves the
pointer on the previous version, and checkpointed ``foreachBatch``
replays the batch — same batch_id, same version directory, so the
commit is idempotent (exactly-once table state). This is precisely the
copy-on-write + atomic-pointer scheme Delta's transaction log scales
up, expressed with one pointer file.

At 100 TB you'd partition the target and rewrite only touched
partitions; the per-batch MERGE is one shuffle on the key either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from map_reduce_framework_using_python_spark.operators.merge import merge_upsert


def _pointer(root: str) -> str:
    return os.path.join(root, "_CURRENT")


def _recover_dangling(root: str) -> None:
    """Restore any version directory stranded mid-swap: a ``v<N>__old``
    with no ``v<N>`` means the two-rename publish crashed between its
    renames — the ``__old`` copy is the complete committed version the
    pointer may still name. Called by every entry point that reads the
    table, so a crash is healed by the NEXT reader or writer, not only
    by a replay of the same batch id (a fresh checkpoint renumbers
    batches and would otherwise never revisit the stranded name).
    Single-writer discipline applies, as with the index compactors —
    recovery must not run concurrently with a live swap."""
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return
    for d in names:
        if d.endswith("__old") and os.path.isdir(os.path.join(root, d)):
            base = d[: -len("__old")]
            if not os.path.exists(os.path.join(root, base)):
                os.rename(os.path.join(root, d), os.path.join(root, base))


def current_version(root: str) -> str | None:
    """Directory of the live table version, or None before first commit."""
    try:
        with open(_pointer(root)) as fh:
            rel = fh.read().strip()
    except FileNotFoundError:
        return None
    return os.path.join(root, rel)


def _commit(root: str, rel: str) -> None:
    tmp = _pointer(root) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(rel)
    os.replace(tmp, _pointer(root))


def init_table(df: DataFrame, root: str) -> str:
    """Seed the versioned table with an initial snapshot (``vinit``)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "vinit")
    df.write.mode("overwrite").parquet(path)
    _commit(root, "vinit")
    return path


def read_table(spark: SparkSession, root: str) -> DataFrame:
    _recover_dangling(root)
    cur = current_version(root)
    if cur is None:
        raise FileNotFoundError(f"no committed version under {root}")
    return spark.read.parquet(cur)


def list_versions(root: str) -> list[str]:
    """Committed version directories, oldest first (``vinit`` before
    numbered batches). Swap-transient names (``v5__old``/``v5__tmp``)
    are excluded — they used to crash the int parse exactly when the
    table needed post-crash inspection (r7 streaming review)."""
    import re

    _recover_dangling(root)
    vs = [
        d
        for d in os.listdir(root)
        if (d == "vinit" or re.fullmatch(r"v\d+", d))
        and os.path.isdir(os.path.join(root, d))
    ]
    return sorted(vs, key=lambda v: (-1 if v == "vinit" else int(v[1:])))


def read_version(spark: SparkSession, root: str, version: str) -> DataFrame:
    """Time travel: read any retained historical version (copy-on-write
    keeps every committed snapshot until a retention job prunes it —
    the same mechanics as Delta's VERSION AS OF)."""
    path = os.path.join(root, version)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {version!r} not found under {root}")
    return spark.read.parquet(path)


def vacuum(root: str, keep_last: int = 1) -> list[str]:
    """Retention: delete historical snapshots, keeping the live version
    plus the ``keep_last`` most recent others. Returns the versions
    removed. The live pointer is re-read AFTER computing the candidate
    set, so a concurrent commit can at worst leave an extra survivor,
    never delete the live version — same safety stance as Delta's
    VACUUM. Copy-on-write means reclaimed space is proportional to
    (table size × versions pruned): at 100 TB retention is a cost
    policy, not housekeeping."""
    import shutil

    cur = current_version(root)
    cur_name = os.path.basename(cur) if cur else None
    history = [v for v in list_versions(root) if v != cur_name]
    doomed = history[: max(0, len(history) - keep_last)]
    for v in doomed:
        if v != os.path.basename(current_version(root) or ""):
            shutil.rmtree(os.path.join(root, v), ignore_errors=True)
    return doomed


def apply_cdc_stream(
    updates: DataFrame,
    root: str,
    key: str,
    checkpoint_dir: str,
    order_col: str | None = None,
):
    """Run an AvailableNow ``foreachBatch`` MERGE of a CDC update stream
    into the versioned table at ``root``; blocks until drained.

    Each batch: MERGE(current, batch) → write ``v<batch_id>`` → repoint.
    Re-delivered batches (checkpoint replay) rewrite the same version
    directory and repoint to it — idempotent.

    ``order_col``: when a batch may carry several updates for one key,
    name a column that orders them; only the per-key row with the
    greatest value survives (``max_by`` — the usual CDC
    latest-change-wins reduction). Without it, duplicate keys in a
    batch would all insert.
    """
    from pyspark.sql import functions as F

    spark = updates.sparkSession

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        rel = f"v{batch_id}"
        src = batch_df
        if order_col is not None:
            src = batch_df.groupBy(key).agg(
                *[
                    F.max_by(c, order_col).alias(c)
                    for c in batch_df.columns
                    if c != key
                ]
            )
        # Write to a side directory, then swap. The live version may BE
        # root/v<batch_id> (checkpoint replay after a crash between
        # _commit() and the streaming checkpoint commit, or a fresh
        # checkpoint re-numbering from batch 0 onto an old table) —
        # writing it in place would overwrite the path being read.
        # Batch ids are only unique per checkpoint, so the batch must
        # actually re-run (its content may be new); only the publish
        # step needs to dodge the read path.
        import shutil

        dst = os.path.join(root, rel)
        tmp = dst + "__tmp"
        old = dst + "__old"
        # Recover ANY swap that crashed between its two renames (dst
        # missing, previous copy stranded at __old — possibly the LIVE
        # version the pointer still names) BEFORE reading the table or
        # clearing side dirs. Not just THIS rel's dirs: under a fresh
        # checkpoint the batch ids renumber, so the stranded name may
        # never be revisited by its own batch id again.
        _recover_dangling(root)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

        target = read_table(spark, root)
        merged = merge_upsert(target, src, key)
        merged.write.mode("overwrite").parquet(tmp)  # reads cur, writes tmp
        if os.path.exists(dst):
            os.rename(dst, old)
        os.rename(tmp, dst)
        shutil.rmtree(old, ignore_errors=True)
        _commit(root, rel)

    q = (
        updates.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
