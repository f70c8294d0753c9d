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


# --- transformWithStateInPandas (Spark 4) ------------------------------------
#
# The successor API to applyInPandasWithState: a StatefulProcessor object
# with named, typed state variables (value/list/map state), timers, and TTL
# — instead of one opaque state tuple. Requires the RocksDB state store
# provider (incremental checkpointing, state larger than executor memory —
# the 100 TB-stream configuration anyway); the helper below sets it for
# local sessions where the default HDFS-backed provider would reject the
# operator.
#
# Environment note: the operator's state-server protocol needs the
# `protobuf` package at RUNTIME (pyspark imports
# streaming/proto/StateMessage_pb2 lazily). This container does not ship
# protobuf, so the twin's end-to-end test is skipif-gated on that import;
# the applyInPandasWithState op above carries the executable correctness
# signal here, and this twin runs wherever protobuf exists.


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of running_user_totals — identical
    semantics (same output schema, update mode), state held in a named
    ValueState. Kept equivalent by test_streaming_stateful's batch oracle."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    class UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def use_rocksdb_state_store(spark) -> None:
    """Point the session's streaming state store at RocksDB —
    transformWithState requires it, and at scale it is the right provider
    regardless (incremental snapshots, off-heap state)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
