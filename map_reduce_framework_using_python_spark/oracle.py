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
