"""Generate INVENTORY.md: the full query registry as one table —
name, tags, gate kind (DuckDB oracle vs rows-only+pytest), and the
first docstring line. Machine-derived from plans/REGISTRY so it can
never drift from the code.

Usage: python tools/gen_inventory.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from map_reduce_framework_using_python_spark.plans import REGISTRY  # noqa: E402


def first_line(doc: str) -> str:
    line = " ".join(doc.strip().split("\n")[0].split()) if doc else ""
    return line[:110]


def main() -> None:
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    rows = [
        "# Query inventory (generated — `python tools/gen_inventory.py`)",
        "",
        f"{len(REGISTRY)} registered queries: {n_oracle} DuckDB-oracle-gated "
        f"(driver hash-compares rows+schema+values at sf0.01), "
        f"{len(REGISTRY) - n_oracle} rows-only (sketch/state/index ops pinned "
        "by pytest against exact ground truth — see COVERAGE.md).",
        "",
        "| # | Query | Gate | Tags | What it is |",
        "|---|---|---|---|---|",
    ]
    for i, (name, q) in enumerate(REGISTRY.items(), 1):
        gate = "oracle" if q.oracle else "rows-only"
        rows.append(
            f"| {i} | `{name}` | {gate} | {', '.join(q.tags)} | {first_line(q.doc)} |"
        )
    out = "\n".join(rows) + "\n"
    with open("/root/repo/INVENTORY.md", "w") as fh:
        fh.write(out)
    print(f"wrote INVENTORY.md ({len(REGISTRY)} queries, {n_oracle} oracle)")


if __name__ == "__main__":
    main()
