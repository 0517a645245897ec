"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.B "Streaming: stateful ops").

This is the escape hatch for operators the built-in windowed aggs can't
express — per-key running state with arbitrary Python update logic,
Arrow-batched per group. State is partitioned by key across executors,
so it scales horizontally; the watermark/timeout bounds its lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals (event count + value sum) maintained as
    explicit group state — the streaming analog of
    ``groupBy(user_id).agg(count, sum)`` but with user-defined update
    logic (e.g. could decay, cap, or snapshot the state arbitrarily)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
