"""MERGE / CDC / SCD2 emulation on plain parquet-backed DataFrames.

Without a transactional table format (Delta/Iceberg jars aren't in this
image), MERGE INTO is emulated with the classic anti-join + union
rewrite, and SCD2 history with window-closed validity intervals. At
scale both are one shuffle on the merge key; the rewrite pattern is the
same one a lakehouse engine executes under the hood (copy-on-write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE: update matched rows, insert unmatched ones.

    ``source`` wins on key collision (WHEN MATCHED THEN UPDATE SET *);
    target rows with no source match survive; source rows with no target
    match insert. Schemas must align by name.
    """
    kept = target.join(source.select(key), key, "left_anti")
    return kept.unionByName(source.select(*target.columns))


def merge_delete(target: DataFrame, deletes: DataFrame, key: str) -> DataFrame:
    """MERGE ... WHEN MATCHED THEN DELETE."""
    return target.join(deletes.select(key), key, "left_anti")


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out the current row of
    each updated key (``valid_to`` = the update's ``valid_from``,
    ``is_current`` = false) and append the update as the new current row.

    ``dim`` columns: key, attributes…, valid_from, valid_to (null when
    open), is_current. ``updates`` columns: key, attributes…,
    valid_from.

    Multiple updates for one key in a single batch CHAIN correctly
    (r7 review — the old left join fanned every dim row out once per
    update): the current dim row closes at the EARLIEST update's
    valid_from, each update closes at the next update's valid_from
    (window lead per key), and only the latest stays current. Two
    updates with the SAME (key, valid_from) have no defined history
    order — the chain window breaks the tie deterministically over the
    remaining columns (lexicographic), so output is stable run-to-run;
    semantically simultaneous updates should be deduplicated upstream.
    The new rows' ``end_col`` takes the DIM's existing end-column type
    (a hard-coded timestamp cast coerced date-typed dimensions and
    drifted their schema on every apply — r7 review).
    """
    from pyspark.sql import Window

    upd_keys = updates.groupBy(key).agg(
        F.min(effective_col).alias("_new_from")
    )
    closed = (
        dim.join(F.broadcast(upd_keys), key, "left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_col) & F.col("_new_from").isNotNull(), F.col("_new_from")
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_col,
            F.when(F.col("_new_from").isNotNull(), F.lit(False)).otherwise(
                F.col(current_col)
            ),
        )
        .drop("_new_from")
    )
    tiebreak = [c for c in updates.columns if c not in (key, effective_col)]
    w = Window.partitionBy(key).orderBy(F.col(effective_col), *tiebreak)
    end_type = dict(dim.dtypes)[end_col]
    fresh = updates.withColumn(
        end_col, F.lead(effective_col).over(w).cast(end_type)
    ).withColumn(current_col, F.col(end_col).isNull())
    return closed.unionByName(fresh.select(*closed.columns))


def changes_between(before: DataFrame, after: DataFrame, key: str) -> DataFrame:
    """CDC diff of two snapshots: one row per changed key with
    change_type ∈ {insert, delete, update}.

    Side presence is tested via explicit marker columns, never the key
    VALUE being NULL — a NULL-key row in one snapshot would otherwise
    classify backwards (a before-only NULL-key row looked like an
    insert; r7 review). NULL keys never equi-match (SQL semantics), so
    a NULL-key row in both snapshots reports one insert and one delete.
    """
    b = before.withColumn("_b_present", F.lit(True)).alias("b")
    a = after.withColumn("_a_present", F.lit(True)).alias("a")
    joined = b.join(a, F.col(f"b.{key}") == F.col(f"a.{key}"), "full")
    non_key = [c for c in before.columns if c != key]
    differs: Column = F.lit(False)
    for c in non_key:
        differs = differs | ~(
            F.col(f"b.{c}").eqNullSafe(F.col(f"a.{c}"))
        )
    return joined.select(
        F.coalesce(F.col(f"b.{key}"), F.col(f"a.{key}")).alias(key),
        F.when(F.col("_b_present").isNull(), "insert")
        .when(F.col("_a_present").isNull(), "delete")
        .when(differs, "update")
        .alias("change_type"),
    ).filter(F.col("change_type").isNotNull())
