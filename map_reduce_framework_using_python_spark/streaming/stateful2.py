"""Arbitrary stateful processing via ``transformWithStateInPandas``
(Spark 4.0+) — the successor API to ``applyInPandasWithState``
(streaming/stateful.py, kept as the compatibility twin).

What the new API adds over the old one, and why it matters at scale:
typed, NAMED state variables (value/list/map) instead of one opaque
state tuple, explicit timers, TTL support, and schema evolution of
state — i.e. the operator's state becomes managed storage rather than
a pickled blob. It requires the RocksDB state store provider (disk-
backed, the 100 TB configuration); the helper below flips the session
conf for the duration of the run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        """Per-user running (count, sum) as a named value state."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            prev = self._totals.get()
            n, total = (prev[0], prev[1]) if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return UserTotals()


def stateful_user_totals_v2(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of
    ``stateful.stateful_user_totals`` — same semantics, new engine."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_processor(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


class rocksdb_state_store:
    """Context manager: run a streaming query on the RocksDB provider
    (required by transformWithState), restoring the previous provider
    afterwards."""

    def __init__(self, spark):
        self.spark = spark
        self._old = None

    def __enter__(self):
        self._old = self.spark.conf.get(_PROVIDER_KEY, None)
        self.spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
        return self

    def __exit__(self, *exc):
        if self._old:
            self.spark.conf.set(_PROVIDER_KEY, self._old)
        else:
            self.spark.conf.unset(_PROVIDER_KEY)
        return False
