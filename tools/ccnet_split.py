"""Split-measure the scale10x ccnet rows (r9: VERDICT item 7).

r6→r7 showed scale10x ns_ccnet_buckets (the exact-NTILE parity fixture)
1.36→1.64 s with no changelog entry touching the path; r8 waved it off
as box noise while the look-alike semdedup uptick turned out to be real
(MLlib first-fit warm-up). The root-cause rule says: no noise claims
without a build/exec split. Neither ccnet form touches spark.ml, so if
the drift is real it lives in plan BUILD (driver-side analysis of the
deep bigram-LM + window + join tree) or in EXEC (the shuffles).

Measures, on the same 10× corpus bench.py uses, for both forms:

  build — REGISTRY[...].fn(spark, DST) call → DataFrame (plan
          construction + analysis; no jobs)
  exec  — .count() (optimization + execution)

Usage: python tools/ccnet_split.py [replicas=10] [reps=3]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from map_reduce_framework_using_python_spark.plans import REGISTRY
from map_reduce_framework_using_python_spark.session import get_spark


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ccnet_split")
    from scale_probe import DST, build

    build(spark, replicas)
    # Warm codegen/scan paths once so rep 1 doesn't carry session
    # first-touch cost (the semdedup lesson: warm-up outside the timed
    # region, then the reps measure the OPERATOR).
    for name in ("ns_ccnet_buckets", "ns_ccnet_buckets_scaled"):
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").count()
    print(f"{'query':28s} rep  build(s)  exec(s)  total(s)")
    for name in ("ns_ccnet_buckets", "ns_ccnet_buckets_scaled"):
        for rep in range(reps):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, DST)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.count()
            t_exec = time.perf_counter() - t0
            print(
                f"{name:28s} {rep + 1:3d}  {t_build:7.3f}  {t_exec:7.3f}"
                f"  {t_build + t_exec:7.3f}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
