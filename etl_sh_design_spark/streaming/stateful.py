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
