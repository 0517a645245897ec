"""Skew-mitigation helpers (SURVEY.md §7 P7, the ``myHash`` lesson).

The reference's hand-rolled hash partitioner skews badly on short keys
(``Worker/shuffler.py:6-10``: 4 common words → 1 bucket of 4, SURVEY.md
§4) and it has no recourse — one overloaded worker serializes the job.
At 100 TB the same failure mode appears as a straggler task on a hot
key. Two remedies, composable:

1. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
   on by default in session.py) — handles skew detected at runtime.
2. Explicit salting (this module) — for *known* hot keys or
   aggregations AQE can't split (single-key groupBy).

Which one, when (measured, bench ``scale10x_skew``; full analysis in
NOTES.md round-5 entry): AQE's split fires only when the skewed
post-shuffle partition exceeds ``spark.sql.adaptive.skewJoin.
skewedPartitionThresholdInBytes`` (256 MB default) — a hot key can
dominate a stage while staying under that, in which case AQE measures
as plain-join + re-planning overhead (2.26 s vs 2.26 s plain vs 1.22 s
salted on the probe). Salting has no threshold: it spreads the key at
shuffle-write time, so SALT known hot keys and keep AQE as the safety
net for skew you didn't predict — the two compose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Append a salt in [0, n_salts): spreads one hot key over
    ``n_salts`` shuffle partitions. Row-content hash mixed with the
    row's position (``monotonically_increasing_id``) so even exact
    duplicate rows — the worst hot-key case — spread; position is stable
    given a stable input partitioning, so task retries re-salt
    identically. Mixed with XOR, not ``+``: the hash spans the full
    int64 range, so addition overflows under ANSI mode on large inputs
    (caught by the 50× scale probe)."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*df.columns).bitwiseXOR(F.monotonically_increasing_id()),
            F.lit(n_salts),
        ).cast("int"),
    )


def salted_agg(
    df: DataFrame, key: str, aggs: dict[str, Column], n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation for a skewed group key: partial-agg on
    (key, salt) — spreading the hot key across n_salts reducers — then
    final-agg on key.

    ``aggs`` maps output name → aggregate over the *input* columns;
    ONLY re-aggregable shapes are accepted — sum, count, min, max.
    Anything else (avg, stddev, percentile, …) does not decompose as
    partial-then-final over the same function and raises ValueError:
    express it in re-aggregable parts instead (avg = sum/count).
    Example::

        salted_agg(li, "l_returnflag", {"sum_qty": F.sum("l_quantity"),
                                        "n": F.count("*")})
    """
    partial = (
        salted(df, n_salts)
        .groupBy(key, "_salt")
        .agg(*[a.alias(f"_p_{name}") for name, a in aggs.items()])
    )
    finals = []
    for name, a in aggs.items():
        expr_str = a._jc.toString()
        # EXACT function-name match, not prefix (r7 review):
        # count(DISTINCT v) would slip a startswith('count') guard and
        # double-count values appearing under multiple salts; min_by /
        # max_by would slip startswith('min') and return the carried
        # value at the per-salt extremum, not the global one. DISTINCT
        # anywhere is non-decomposable over salts by construction.
        fn = expr_str.split("(")[0].lower().lstrip('"')
        col = F.col(f"_p_{name}")
        # DISTINCT detection must be STRUCTURAL: Spark 4 renders
        # count_distinct(v) as plain 'count(v)' (no DISTINCT in
        # toString at all), so any string check misses it — read the
        # ColumnNode's isDistinct flag; the keyword-token regex remains
        # as the fallback for F.expr('count(DISTINCT x)') columns. A
        # column merely NAMED 'distinct_ratio' passes both (r7 review).
        import re as _re

        is_distinct = False
        probe_ok = False
        try:
            node = a._jc.node()
            if node.getClass().getSimpleName() == "UnresolvedFunction":
                is_distinct = bool(node.isDistinct())
                probe_ok = True
        except Exception:  # noqa: BLE001 — structural probe only
            pass
        if not probe_ok:
            # Classic (non-Connect) Column: the JVM expression tree
            # carries the same flag on UnresolvedFunction.
            try:
                jexpr = a._jc.expr()
                if jexpr.getClass().getSimpleName() == "UnresolvedFunction":
                    is_distinct = bool(jexpr.isDistinct())
                    probe_ok = True
            except Exception:  # noqa: BLE001 — structural probe only
                pass
        regex_hit = bool(_re.search(r"\(\s*distinct\b", expr_str, _re.IGNORECASE))
        if not probe_ok and not regex_hit and fn in ("count", "sum"):
            # The regex fallback alone can't be trusted here: on builds
            # whose toString omits the DISTINCT keyword (the Spark 4
            # rendering above), count_distinct(v) reads as plain
            # count(v) and would silently DOUBLE-COUNT values appearing
            # under multiple salts. An indeterminate probe on a
            # DISTINCT-sensitive aggregate is therefore an error, not a
            # fallback (r8 advice). min/max are DISTINCT-insensitive
            # (min(DISTINCT x) == min(x)) and stay on the regex path.
            raise ValueError(
                f"salted_agg: cannot structurally verify that the "
                f"aggregate for {name!r} ({fn!r}) is non-DISTINCT on "
                "this Spark build (no ColumnNode.node()/expr() probe); "
                "a DISTINCT aggregate would silently double-count "
                "across salts — pass the aggregate via F.expr(...) with "
                "an explicit function text, or de-salt first"
            )
        if is_distinct or regex_hit:
            raise ValueError(
                f"salted_agg: aggregate for {name!r} uses DISTINCT, "
                "which does not decompose over salts (the same value "
                "can appear under several salts) — de-salt first or "
                "use approx_count_distinct partials"
            )
        if fn in ("count", "sum"):
            # partial counts re-aggregate by SUM; partial sums likewise
            finals.append(F.sum(col).alias(name))
        elif fn == "min":
            finals.append(F.min(col).alias(name))
        elif fn == "max":
            finals.append(F.max(col).alias(name))
        else:
            raise ValueError(
                f"salted_agg: aggregate for {name!r} ({fn!r}) is not "
                "decomposable as partial+final; use sum/count/min/max "
                "(avg = sum/count)"
            )
    return partial.groupBy(key).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big (skewed) side, replicate the
    small side once per salt value, join on (key, salt). The hot key's
    rows land on ``n_salts`` different reducers instead of one.

    Prefer ``broadcast(small)`` when the small side fits (no salting
    needed at all); this is for mid-sized dimension tables that don't.

    Big-side-preserving joins only — ``inner``, ``left``, and the
    semi/anti family (all correct under salting because none of them
    PRESERVES the replicated small side): the small side is replicated
    once per salt, so right/full-outer forms would emit every unmatched
    small row ``n_salts`` times (r7 review) — raise rather than return
    duplicated rows; use an unsalted anti-join union for those.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "semi",
                   "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            "small-side rows n_salts times (the small side is "
            "replicated per salt); only big-side-preserving joins are "
            "supported"
        )
    big_s = salted(big, n_salts)
    salt_values = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_r = small.crossJoin(salt_values)
    joined = big_s.join(small_r, on=[key, "_salt"], how=how)
    return joined.drop("_salt")
