"""Big×big range join without an equi key — bucket-and-filter.

``q_join_range`` covers the broadcast case (fact × tiny band table).
When BOTH sides are large and the only predicate is a range/proximity
condition (|t_left − t_right| ≤ tolerance), a broadcast is impossible
and a naive cross join is quadratic. The scale pattern — what a
range-join optimization implements under the hood — is:

1. quantize both sides onto a bucket grid of width ≥ tolerance
   (``floor(key / width)``);
2. a candidate pair can only differ by at most one bucket, so explode
   the probe side to its 3 neighbor buckets and JOIN ON BUCKET — a
   plain equi shuffle join whose fan-out is bounded by bucket
   occupancy, never |L|×|R|;
3. apply the exact range predicate to the candidates.

Each true pair is produced exactly once (the probe row's 3-bucket
explode contains the build row's bucket exactly once), so no dedup
step is needed. Shuffles: one per side, on the bucket key — the same
cost as any equi join. Bucket width tunes fan-out vs parallelism; at
100 TB pick width ≈ tolerance so candidates ≈ true pairs + one-bucket
slack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_candidates(
    left: DataFrame,
    right: DataFrame,
    left_key: Column,
    right_key: Column,
    tolerance: float,
) -> DataFrame:
    """Inner-join rows with |left_key − right_key| ≤ tolerance via
    neighbor-bucket equi join + exact filter. Keys are numeric (cast
    timestamps to epoch first). Each qualifying pair appears exactly
    once. For outer semantics, aggregate this result per left key and
    join back (see q_join_range_bigbig). Null keys produce null buckets
    and drop out of the inner join — filter upstream if they need
    different treatment.

    Returns all columns of both inputs; callers aggregate or project.
    """
    width = float(tolerance)
    lb = F.floor(left_key / width).cast("long")
    rb = F.floor(right_key / width).cast("long")
    l_tag = left.withColumn("_rj_lkey", left_key).withColumn(
        "_rj_b", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r_tag = right.withColumn("_rj_rkey", right_key).withColumn("_rj_b", rb)
    exact = F.abs(F.col("_rj_lkey") - F.col("_rj_rkey")) <= tolerance
    return (
        l_tag.join(r_tag, ["_rj_b"])
        .filter(exact)
        .drop("_rj_b", "_rj_lkey", "_rj_rkey")
    )
