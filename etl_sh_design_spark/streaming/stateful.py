"""Custom stateful streaming operator via applyInPandasWithState
(extension layer — the reference has no streaming, SURVEY.md §2.9).

`running_user_totals` keeps per-user running (count, value-sum) state
across micro-batches — the canonical shape for stateful enrichment
(sessionization, dedup-by-key, rate counters) at stream scale: state
is partitioned by the group key, so it shards horizontally across
executors, and NoTimeout keeps the example deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n bigint, sum_value double"
STATE_SCHEMA = "n bigint, v double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "sum_value": [round(v, 4)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user running totals to a STREAMING
    events DataFrame (grouped state, update semantics)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4's successor API): same
# per-user running totals, but state lives in named ValueState handles
# managed by the state store (TTL-capable, schema-evolvable) instead of
# a single tuple blob. The two implementations are golden-tested equal.
try:
    # the TWS Python worker speaks protobuf to the JVM; a broken
    # protobuf install crashes the stream driver at runtime, so treat
    # it as part of the API availability check
    from google.protobuf import descriptor  # noqa: F401

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-key (count, value-sum) with a ValueState handle."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, v = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._state.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "sum_value": [round(v, 4)]}
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """transformWithStateInPandas version of running_user_totals —
        identical semantics, modern state API (requires the RocksDB
        state store provider, set by the caller's session or test)."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

    HAVE_TWS = True
except ImportError:  # pragma: no cover - pyspark < 4 or broken protobuf
    # In THIS container google.protobuf is not importable, so the twin
    # is defined-but-skipped (test skips on HAVE_TWS); on a standard
    # Spark 4 cluster it is live. applyInPandasWithState above is the
    # always-available path with identical semantics.
    HAVE_TWS = False
