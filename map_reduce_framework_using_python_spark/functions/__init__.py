"""UDF surface (SURVEY.md §2.B UDF/UDAF/UDTF rows; reference ops 3 & 6).

The reference's only extension point is arbitrary Python over subprocess
pipes (``Worker/worker_v1.py:113-116,196-199``) — reproduced literally
in :mod:`..mr`. This package is the *idiomatic* UDF ladder, fastest
first:

1. built-in expressions (not a UDF at all — always prefer);
2. ``pandas_udf`` scalar / grouped-agg (Arrow-vectorized);
3. ``applyInPandas`` / ``mapInPandas`` (grouped map / partition map);
4. ``rdd.pipe`` (the MR-compat escape hatch).
"""

from map_reduce_framework_using_python_spark.functions.udfs import (
    discounted_price_builtin,
    discounted_price_pandas,
    discounted_price_rowudf,
    weighted_avg_price,
    zscore_per_group,
)

__all__ = [
    "discounted_price_builtin",
    "discounted_price_pandas",
    "discounted_price_rowudf",
    "weighted_avg_price",
    "zscore_per_group",
]
