"""The UDF ladder, demonstrated on the lineitem pricing expression.

Each rung computes something the reference could only express inside an
opaque mapper/reducer; tests pin rung-for-rung equivalence so the fast
path (built-in) is provably interchangeable with the Python paths.

The pandas UDFs are built lazily (``pandas_udf`` needs an active
SparkSession to resolve return types, so decorating at import time
breaks sessionless imports).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _schema_plus(df: DataFrame, extra: str) -> str:
    """Input schema as DDL plus one appended column — the shared output
    contract of the mapInArrow/applyInPandas rungs."""
    return ", ".join(f"{n} {t}" for n, t in df.dtypes) + f", {extra}"


def discounted_price_builtin(price: Column, discount: Column) -> Column:
    """Rung 1 — pure expression: stays in whole-stage codegen, zero
    serialization. This is the hot-path form every operator in plans/
    uses."""
    return price * (1 - discount)


def _discounted_price_pandas():
    # Built per call, not @cache'd: a cached UserDefinedFunction pins its
    # JVM handle to the first SparkSession and breaks after a session
    # stop/recreate (notebooks, multi-session test runs). Construction is
    # driver-side wrapping only — the JVM registration happens lazily at
    # first use either way.
    @pandas_udf("double")
    def discounted(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    return discounted


def discounted_price_pandas(price, discount) -> Column:
    """Rung 2 — Arrow-vectorized scalar pandas UDF (~10-100× faster than
    row-at-a-time ``F.udf``; still pays one Arrow round-trip, so only
    for logic built-in expressions can't express)."""
    return _discounted_price_pandas()(price, discount)


def _discounted_price_rowudf():
    @F.udf("double")
    def discounted(price, discount):
        return price * (1 - discount)

    return discounted


def discounted_price_rowudf(price, discount) -> Column:
    """Rung 0 — row-at-a-time Python UDF. ANTI-PATTERN: pickles and
    dispatches per row (~10-100× slower than the pandas rung). Exists
    only so the equivalence test can demonstrate that every rung —
    including the one you shouldn't use — computes the same answer."""
    return _discounted_price_rowudf()(price, discount)


def _weighted_avg_price():
    @pandas_udf("double")
    def weighted(price: pd.Series, qty: pd.Series) -> float:
        # Exact-cents integer arithmetic: prices are 2-dp quantities, so
        # summing int64 cents is exact and the final division produces
        # the same double as a DECIMAL-exact SQL oracle — float64 sums
        # would drift by summation order and flip .xx5 rounding ties.
        cents = (price * 100).round().astype("int64")
        qty_i = qty.round().astype("int64")
        total_qty = int(qty_i.sum())
        if not total_qty:
            return float("nan")
        return float(int((cents * qty_i).sum()) / (100.0 * total_qty))

    return weighted


def weighted_avg_price(price, qty) -> Column:
    """Rung 2b — grouped-aggregate pandas UDAF (the reference's sorted
    streaming reducer, op 6, vectorized per group)."""
    return _weighted_avg_price()(price, qty)


def discounted_price_arrow(df: DataFrame) -> DataFrame:
    """Rung 2c — ``mapInArrow``: the zero-copy batch path. The function
    sees raw ``pyarrow.RecordBatch``es (no pandas materialization at
    all), the right rung when the kernel is itself Arrow-native
    (compute kernels, Arrow-backed ML featurizers, the multimodal
    decoders in operators/multimodal.py). Emits the input columns plus
    ``disc_price``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for b in it:
            disc = pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [*b.columns, disc], names=[*b.schema.names, "disc_price"]
            )

    return df.mapInArrow(batches, schema=_schema_plus(df, "disc_price double"))


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Rung 3 — ``applyInPandas`` grouped map (1→many UDTF shape): whole
    group in, whole group out, used when per-group logic needs the full
    frame (rank transforms, per-group model scoring …)."""

    def add_z(pdf: pd.DataFrame) -> pd.DataFrame:
        mean, std = pdf[value_col].mean(), pdf[value_col].std(ddof=0)
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if std == 0 else (pdf[value_col] - mean) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(
        add_z, schema=_schema_plus(df, "zscore double")
    )
