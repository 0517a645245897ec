"""Z-order (Morton-curve) data clustering — multi-column data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group min/max statistics let a scan skip row groups whose
range can't match the predicate, but the stats only help if the layout
CLUSTERS each filter column. Sorting by one column gives perfect
pruning on it and none on any other; interleaving the bits of several
columns' rank-buckets (the Morton / Z-curve, what Delta's OPTIMIZE
ZORDER BY and Iceberg's sort orders implement) gives every interleaved
column locality at once.

Pipeline (all JVM expressions + one range exchange):

1. per column, map the value onto a ``2^bits``-bucket rank grid
   (fixed min/max bounds — order-consistent, no sampling pass);
2. interleave the bucket bits into one Morton key
   (``shiftleft``/``bitwise or`` expression tree — no UDF);
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the key, so
   every output file / row group covers a small Z-curve segment and
   carries tight min/max on EVERY clustered column.

``rowgroups_surviving`` reads the parquet footer stats (pyarrow) and
counts the row groups a min/max-pruning scan would keep for a
conjunctive range predicate — deterministic evidence of the layout's
skipping power, no timing flakiness (see tests/test_zorder.py: the
Z-ordered layout prunes on both columns where a single-column sort
prunes on one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Rank of ``col`` on a 2^bits grid over [lo, hi], clamped — a pure
    monotone expression (fixed bounds beat a sampling pass: determinism
    and one less job; refresh bounds from table stats offline)."""
    n = (1 << bits) - 1
    scaled = F.floor((col.cast("double") - lo) / (hi - lo) * n)
    return F.least(F.lit(n), F.greatest(F.lit(0), scaled)).cast("bigint")


def zorder_key(
    cols: list[tuple[Column, float, float]], bits: int = 8
) -> Column:
    """Morton key interleaving ``bits`` bucket-bits per column.

    ``cols``: (column, lo, hi) per clustered column. Total key width is
    ``bits × len(cols)`` ≤ 63. Bit i of column j lands at position
    ``i·n_cols + j`` — the classic Z-curve interleave, built as a
    shiftleft/|-fold of AND-masked bits (whole-stage-codegen'd; no UDF).
    """
    n_cols = len(cols)
    if bits * n_cols > 63:
        raise ValueError(f"zorder key too wide: {bits} bits × {n_cols} cols > 63")
    key = F.lit(0).cast("bigint")
    for j, (col, lo, hi) in enumerate(cols):
        b = _bucket(col, lo, hi, bits)
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n_cols + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[tuple[str, float, float]],
    n_files: int = 8,
    bits: int = 8,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``
    ((name, lo, hi) each): range-partition on the Morton key (one
    exchange — the same shuffle a plain sort pays) and sort within
    partitions, so row-group min/max stats are tight on every clustered
    column. ``writer_options``: parquet writer knobs (e.g. a smaller
    ``parquet.block.size`` trades footer overhead for finer skipping
    granularity)."""
    key = zorder_key([(F.col(c), lo, hi) for c, lo, hi in cols], bits=bits)
    w = (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        w = w.option(k, v)
    w.parquet(path)


def rowgroups_surviving(path: str, ranges: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(surviving, total) parquet row groups for a conjunctive range
    predicate ``{col: (lo, hi)}``, judged purely on footer min/max
    statistics — exactly the pruning decision a stats-based reader
    makes. Driver-side metadata only; no data read."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    survive = total = 0
    for f in sorted(_glob.glob(_os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            keep = True
            for col, (lo, hi) in ranges.items():
                stats = md.row_group(rg).column(names[col]).statistics
                if stats is None or not stats.has_min_max:
                    continue  # no stats ⇒ cannot prune on this column
                if stats.min > hi or stats.max < lo:
                    keep = False
                    break
            survive += int(keep)
    return survive, total
