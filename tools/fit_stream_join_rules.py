"""Re-fit the watermark-gated null-emission rules of the stream-stream
OUTER interval joins — the procedure behind the fitted predicates in
streaming/windows.interval_join_clicks_purchases and the
st_stream_join_left/full oracles (plans/streaming_queries.py).

Spark's structured-streaming outer joins null-extend an unmatched row
only once the global watermark closes that row's match window, and the
exact closing predicate is under-documented engine behavior. The r9
fit (this script) drains both outer forms over the bounded events
source and scores every candidate predicate by the symmetric
difference between the rows the ENGINE actually null-extended and the
rows the candidate PREDICTS — the rule with symdiff 0 at an SF where
candidates diverge is the one the oracle encodes. Fitted on Spark
4.1.2 (streaming/windows.FITTED_NULL_EMISSION_SPARK; the pinning test
is tests/test_streaming.py::test_stream_join_rules_spark_version_pin):

    clicks    (left & full): click_ts + horizon < W
    purchases (full only):   purchase_ts < W
    where W = least(max click_ts, max purchase_ts) - watermark_delay

Run after any Spark version bump:

    python tools/fit_stream_join_rules.py [sf_dir]   # default sf0.01

and if the winning rule moved, update the two oracles plus the
interval_join_clicks_purchases docstring, then bump
FITTED_NULL_EMISSION_SPARK. Exits 1 if the currently-encoded rules no
longer hit symdiff 0 (i.e. the oracles are stale for this build).
"""

from __future__ import annotations

import os
import sys
import uuid
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_framework_using_python_spark.session import get_spark
from map_reduce_framework_using_python_spark.sources.io import load_table
from map_reduce_framework_using_python_spark.streaming.windows import (
    interval_join_clicks_purchases,
    read_events_stream,
    run_available_now,
)

HORIZON = timedelta(minutes=30)
DELAY = timedelta(hours=1)


def _drain(spark, sf_dir: str, how: str):
    return run_available_now(
        interval_join_clicks_purchases(
            read_events_stream(spark, sf_dir),
            read_events_stream(spark, sf_dir),
            how=how,
        ),
        f"fit_{how}_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    print(f"# Spark {spark.version}, events from {sf_dir}", file=sys.stderr)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    clicks = {
        r["event_id"]: (r["user_id"], r["ts"])
        for r in ev.filter(F.col("event_type") == "click").collect()
    }
    purchases = {
        r["event_id"]: (r["user_id"], r["ts"])
        for r in ev.filter(F.col("event_type") == "purchase").collect()
    }
    w = min(max(ts for _, ts in clicks.values()),
            max(ts for _, ts in purchases.values())) - DELAY

    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    m = c.join(
        p,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).persist()
    matched_c = {r["click_id"] for r in m.select("click_id").distinct().collect()}
    matched_p = {r["purchase_id"] for r in m.select("purchase_id").distinct().collect()}
    m.unpersist()

    left = _drain(spark, sf_dir, "left_outer")
    full = _drain(spark, sf_dir, "full_outer")
    emitted = {
        ("left", "clicks"): {
            r["click_id"] for r in left.filter(F.col("purchase_id").isNull()).collect()
        },
        ("full", "clicks"): {
            r["click_id"]
            for r in full.filter(
                F.col("purchase_id").isNull() & F.col("click_id").isNotNull()
            ).collect()
        },
        ("full", "purchases"): {
            r["purchase_id"]
            for r in full.filter(F.col("click_id").isNull()).collect()
        },
    }

    candidates = {
        "clicks": {
            "ts + horizon < W (ENCODED)": lambda ts: ts + HORIZON < w,
            "ts < W": lambda ts: ts < w,
            "ts - horizon < W": lambda ts: ts - HORIZON < w,
        },
        "purchases": {
            "ts < W (ENCODED)": lambda ts: ts < w,
            "ts + horizon < W": lambda ts: ts + HORIZON < w,
            "ts - horizon < W": lambda ts: ts - HORIZON < w,
        },
    }
    unmatched = {
        "clicks": {cid: ts for cid, (_, ts) in clicks.items() if cid not in matched_c},
        "purchases": {
            pid: ts for pid, (_, ts) in purchases.items() if pid not in matched_p
        },
    }

    stale = False
    for (form, side), got in sorted(emitted.items()):
        print(f"\n{form} outer, null-extended {side}: engine emitted {len(got)}")
        for name, pred in candidates[side].items():
            predicted = {i for i, ts in unmatched[side].items() if pred(ts)}
            sd = len(got ^ predicted)
            print(f"  {name:28s} predicts {len(predicted):5d}  symdiff {sd}")
            if "ENCODED" in name and sd != 0:
                stale = True
    if stale:
        print(
            "\nSTALE: the encoded rule no longer matches this Spark build — "
            "update the st_stream_join_left/full oracles and "
            "FITTED_NULL_EMISSION_SPARK.",
            file=sys.stderr,
        )
        return 1
    print("\nOK: encoded rules reproduce the engine's emission exactly.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
