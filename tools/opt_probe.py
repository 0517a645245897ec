"""Optimization-round measurement probe (guide §1): time registered
queries in isolation with the noop sink and capture their formatted
plans.

The bench (bench.py) stays the driver's record — same methodology as
every prior round. This probe exists for the measure-first loop: the
noop sink computes every column of every row (so column-pruning can't
make a timing dishonest, the ns_paragraph_trim lesson), each query is
labelled in the (disabled-UI) scheduler via setJobDescription, and the
explain("formatted") text can be written straight to plans/r14/.

Usage:
    python tools/opt_probe.py [--sf DIR] [--reps N] [--explain-dir D]
                              [--suffix _before] [--count] query [query ...]

`--count` times `.count()` instead of the noop sink (the bench's timed
action) for apples-to-apples comparison against BENCH floors.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from map_reduce_framework_using_python_spark.plans import REGISTRY  # noqa: E402
from map_reduce_framework_using_python_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        print(f"ERROR: unknown queries {unknown}")
        return 2
    spark = get_spark(app_name="opt_probe")
    warm_dir = "/root/testdata/sf0.001"
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = REGISTRY[name].fn
        if not args.no_warm and os.path.isdir(warm_dir):
            try:
                fn(spark, warm_dir).count()  # codegen/worker warm-up
            except Exception:  # noqa: BLE001
                pass
        rec: dict = {}
        spark.sparkContext.setJobDescription(f"opt_probe: {name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            rec["plan_build"] = round(time.perf_counter() - t0, 3)
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(txt)
            times = []
            for i in range(args.reps):
                # Rebuild the frame each rep (the bench's methodology:
                # every rep calls fn() fresh, so a lazily-persisted
                # intermediate is re-materialized per rep — reusing one
                # DataFrame would let rep 2+ ride rep 1's cache and
                # overstate any persist-based optimization).
                t0 = time.perf_counter()
                rdf = fn(spark, args.sf) if i else df
                if args.count:
                    rec["rows"] = rdf.count()
                else:
                    rdf.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            rec["times"] = times
            if times:
                rec["best"] = min(times)
        except Exception as exc:  # noqa: BLE001
            rec["error"] = str(exc)[:300]
        finally:
            spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
