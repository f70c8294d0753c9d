"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.11 X1/X2: the arbitrary-state surface beyond built-in
windows).

Template op: running per-user totals — the state (event count, value sum)
lives in the executor state store keyed by user_id, is updated once per
micro-batch with whole-group pandas batches, and emits the refreshed totals
each trigger.

Scale notes: state is partitioned by the group key across executors and
checkpointed incrementally; memory is O(active keys), so keys must be
bounded or aged out via the timeout conf (set a ProcessingTimeTimeout and
call state.remove() for idle users on a 100 TB/day stream).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user. Each trigger emits one updated
    row per user seen in that batch (output mode: update)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
