"""BPE round-trip curve at production merge counts (r8: VERDICT item 5).

The batched trainer is proven exact-equivalent at 16 merges / batch 4;
the 50k-merge production story extrapolated from that. This probe runs
256 merges on the 10× corpus at several batch sizes and charts
wall-clock, distributed rounds, and conflict-skip counts, so the
default batch_size is chosen from data rather than extrapolation.

Usage: python tools/bpe_curve.py [replicas=10] [rounds=256] [batch_sizes...]
       python tools/bpe_curve.py --synthetic[=vocab] [rounds] [batch_sizes...]

r9: the 10× corpus SATURATES at ~88 merges (3.3k short words — every
word fully merged), so the r8 curve answered the 256-merge ask with an
88-merge corpus. ``--synthetic`` builds a deterministic long-word
corpus that does not saturate: ``vocab`` distinct 16-to-32-char words
over a 16-letter alphabet (md5-hex of the word id, translated to
letters — pure JVM, no RNG), Zipf-ish counts ``1e6/(id+1)+1``. 256+
merge curves chart the production merge-count story on it.
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


def synthetic_words(spark, vocab: int):
    """Deterministic non-saturating word table: md5 hex of the word id
    mapped onto a 16-letter alphabet (so merge depth is bounded by
    16–32 symbols per word, not the corpus's ~6), truncated to a
    16 + id%17 char word; Zipf-ish counts. Pure JVM expressions —
    reproducible across runs and engines."""
    return spark.range(vocab).select(
        F.substring(
            F.translate(
                F.md5(F.col("id").cast("string")),
                "0123456789abcdef",
                "abcdefghijklmnop",
            ),
            1,
            (16 + F.col("id") % 17).cast("int"),
        ).alias("w"),
        (F.floor(F.lit(1_000_000) / (F.col("id") + 1)) + 1).alias("cnt"),
    )


def main() -> int:
    args = sys.argv[1:]
    synthetic = 0
    if args and args[0].startswith("--synthetic"):
        synthetic = int(args[0].split("=")[1]) if "=" in args[0] else 30_000
        args = args[1:]
        rounds = int(args[0]) if args else 256
        sizes = [int(x) for x in args[1:]] or [1, 4, 8, 16]
    else:
        replicas = int(args[0]) if args else 10
        rounds = int(args[1]) if len(args) > 1 else 256
        sizes = [int(x) for x in args[2:]] or [4, 8, 16, 32]
    spark = get_spark(app_name="bpe_curve")
    if synthetic:
        words = synthetic_words(spark, synthetic)
        label = f"synthetic vocab={synthetic}"
    else:
        from scale_probe import DST, build

        build(spark, replicas)
        d = load_table(spark, DST, "documents")
        words = (
            d.select(F.explode(F.split(F.trim("text"), " +")).alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("cnt"))
        )
        label = f"{replicas}x corpus"
    words = words.persist()
    print(f"vocab={words.count()} words ({label})")
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
