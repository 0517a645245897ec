"""BPE round-trip curve at production merge counts (r8: VERDICT item 5).

The batched trainer is proven exact-equivalent at 16 merges / batch 4;
the 50k-merge production story extrapolated from that. This probe runs
256 merges on the 10× corpus at several batch sizes and charts
wall-clock, distributed rounds, and conflict-skip counts, so the
default batch_size is chosen from data rather than extrapolation.

Usage: python tools/bpe_curve.py [replicas=10] [rounds=256] [batch_sizes...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.plans.pipeline7 import (
    bpe_train_batched,
)
from map_reduce_framework_using_python_spark.session import get_spark
from map_reduce_framework_using_python_spark.sources.io import load_table


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    sizes = [int(x) for x in sys.argv[3:]] or [4, 8, 16, 32]
    spark = get_spark(app_name="bpe_curve")
    from scale_probe import DST, build

    build(spark, replicas)
    d = load_table(spark, DST, "documents")
    words = (
        d.select(F.explode(F.split(F.trim("text"), " +")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    words = words.persist()
    print(f"vocab={words.count()} words ({replicas}x corpus)")
    baseline = None
    for bs in sizes:
        t0 = time.perf_counter()
        merges = bpe_train_batched(words, rounds=rounds, batch_size=bs)
        dt = time.perf_counter() - t0
        tag = ""
        if baseline is None:
            baseline = {m[1:3] for m in merges}
        else:
            got = {m[1:3] for m in merges}
            tag = (
                f" set-overlap with batch={sizes[0]}: "
                f"{len(baseline & got)}/{len(got)}"
            )
        print(f"batch={bs:3d} merges={len(merges)} wall={dt:7.2f}s{tag}")
    words.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
