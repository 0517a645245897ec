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

    Bucket math (r7 review): for INTEGRAL keys with an integral
    tolerance the bucket is exact long floor-division — the double
    ``floor(key/width)`` form loses integer precision above 2^53
    (epoch NANOSECONDS sit at ~1.7e18 with a 256 ns ulp), where a
    key rounding across a bucket edge silently drops true pairs from
    the ±1-bucket candidate set. Fractional keys/tolerances keep the
    double form, which is exact for the sub-2^53 magnitudes they
    imply.
    """
    from pyspark.sql import types as T

    def _integral(df: DataFrame, key: Column) -> bool:
        dt = df.select(key.alias("_k")).schema[0].dataType
        return isinstance(
            dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        )

    width = float(tolerance)
    use_int = (
        float(tolerance) == int(tolerance)
        and int(tolerance) > 0
        and _integral(left, left_key)
        and _integral(right, right_key)
    )
    l_tag = left.withColumn("_rj_lkey", left_key)
    r_tag = right.withColumn("_rj_rkey", right_key)
    if use_int:
        w = int(tolerance)
        # (k - pmod(k, w)) is exactly divisible, so truncating DIV is
        # floor division — exact over the whole long range.
        lb = F.expr(f"(_rj_lkey - pmod(_rj_lkey, {w})) DIV {w}")
        rb = F.expr(f"(_rj_rkey - pmod(_rj_rkey, {w})) DIV {w}")
    else:
        lb = F.floor(F.col("_rj_lkey") / width).cast("long")
        rb = F.floor(F.col("_rj_rkey") / width).cast("long")
    l_tag = l_tag.withColumn("_rj_b", F.explode(F.array(lb - 1, lb, lb + 1)))
    r_tag = r_tag.withColumn("_rj_b", rb)
    exact = F.abs(F.col("_rj_lkey") - F.col("_rj_rkey")) <= tolerance
    return (
        l_tag.join(r_tag, ["_rj_b"])
        .filter(exact)
        .drop("_rj_b", "_rj_lkey", "_rj_rkey")
    )
