"""Oracle-comparison canonicalization shared by tools/check_oracle.py
and the pytest parity suite.

Mirrors the driver's t2 gate: column names sorted, rows stringified and
sorted, floats canonicalized (integer-valued floats print as ints so Spark's
DOUBLE and DuckDB's DECIMAL/HUGEINT widenings agree).
"""

from __future__ import annotations

import math
from decimal import Decimal


def canon_value(val) -> str:
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return repr(val)
    if isinstance(val, Decimal):
        # Integral decimals compare exactly as ints (float() would lose
        # precision above 2^53, e.g. a DuckDB DECIMAL/HUGEINT sum).
        if val == val.to_integral_value():
            return canon_value(int(val))
        return canon_value(float(val))
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    """Order-insensitive canonical form: sort columns by name, stringify
    each row, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


# ---------------------------------------------------------------------------
# Column-type parity (NOTES.md lesson #5, mechanically enforced)
# ---------------------------------------------------------------------------
# The driver's hasher sees raw values, so a DuckDB HUGEINT (sum(INTEGER)
# widens) next to a Spark BIGINT hash-mismatches even when every value is
# equal and the stringifying canon above cannot tell.  Classify both
# engines' types into coarse families and reject any divergence; HUGEINT
# is rejected outright because Spark has no 128-bit integer to match it.

_INT_TYPES = {
    "tinyint", "smallint", "int", "integer", "bigint",
    "utinyint", "usmallint", "uinteger", "ubigint",
}
_FLOAT_TYPES = {"float", "double", "real"}
_TS_TYPES = {"timestamp", "timestamp_ntz", "timestamp with time zone"}


def type_class(t: str) -> str:
    """Coarse type family for oracle-vs-Spark schema parity."""
    t = t.strip().lower()
    if t == "hugeint":
        return "hugeint"  # never OK — Spark cannot emit it
    if t.endswith("[]"):  # DuckDB list type, e.g. BIGINT[]
        return f"array<{type_class(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):  # Spark array type
        return f"array<{type_class(t[6:-1])}>"
    if t.startswith("decimal") or t.startswith("numeric"):
        return "decimal"
    if t in _INT_TYPES:
        return "int"
    if t in _FLOAT_TYPES:
        return "float"
    if t in {"boolean", "bool"}:
        return "bool"
    if t in _TS_TYPES:
        return "timestamp"
    if t == "date":
        return "date"
    if t in {"string", "varchar", "text"}:
        return "string"
    return t  # arrays/maps/structs compare by raw string


def type_mismatches(
    spark_dtypes: list[tuple[str, str]],
    duck_cols: list[str],
    duck_types: list,
) -> list[str]:
    """Messages for every column whose DuckDB type family diverges from
    Spark's (matched case-insensitively by name).  Empty list == parity."""
    spark_by_col = {c.lower(): type_class(t) for c, t in spark_dtypes}
    errs = []
    for col, dt in zip(duck_cols, duck_types):
        d_cls = type_class(str(dt))
        s_cls = spark_by_col.get(col.lower())
        if s_cls is None:
            continue  # name mismatch is reported separately
        if d_cls == "hugeint":
            errs.append(
                f"{col}: oracle emits HUGEINT (uncast DuckDB integer sum?) "
                f"vs spark {s_cls} — CAST(... AS BIGINT) in the oracle"
            )
        elif d_cls != s_cls:
            errs.append(f"{col}: oracle {d_cls} ({dt}) vs spark {s_cls}")
    return errs
