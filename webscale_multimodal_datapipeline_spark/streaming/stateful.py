"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has exactly one piece of cross-batch state — the dedup
seen-set actor (``framework/backend.py``). Spark's arbitrary-stateful API
generalizes that pattern: per-key state rides the state store (same hash
partitioning, checkpointed, fault-tolerant) and the update logic is a
plain pandas function. Two operators here:

- ``running_user_totals`` — per-user cumulative counters across
  micro-batches (the A1 metrics shape as a *stateful* stream);
- ``stateful_seen_filter`` — a first-seen-wins dedup with explicit state
  (the D3 backend semantics, expressed as ~20 lines instead of a 226-line
  actor service; ``dropDuplicatesWithinWatermark`` is the built-in form).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
RUNNING_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_running(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count + value total, updated each
    micro-batch (output mode: update)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEEN_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
    ]
)
SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _update_seen(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key already emitted in an earlier batch — drop everything
        yield pd.DataFrame(columns=["user_id", "event_type", "event_id"]).astype(
            {"user_id": "int64", "event_type": "object", "event_id": "int64"}
        )
        return
    first = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values(["ts", "event_id"]).iloc[0]
        if first is None or (cand["ts"], cand["event_id"]) < (first["ts"], first["event_id"]):
            first = cand
    state.update((True,))
    if first is None:
        yield pd.DataFrame(columns=["user_id", "event_type", "event_id"]).astype(
            {"user_id": "int64", "event_type": "object", "event_id": "int64"}
        )
    else:
        yield pd.DataFrame(
            {
                "user_id": [int(first["user_id"])],
                "event_type": [str(first["event_type"])],
                "event_id": [int(first["event_id"])],
            }
        )


def stateful_seen_filter(events: DataFrame) -> DataFrame:
    """First-seen-wins per (user_id, event_type) with explicit state —
    the reference's dedup-backend semantics (``backend.py:39-47``
    first-arrival) as an arbitrary-stateful operator. Within a batch the
    winner is deterministic (min ts, event_id)."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _update_seen,
        outputStructType=SEEN_OUTPUT,
        stateStructType=SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas form (Spark 4 successor API): typed state
# handles + timers + per-key TTL, RocksDB-backed. Same semantics as
# running_user_totals, expressed as a StatefulProcessor.
# ---------------------------------------------------------------------------


class RunningTotalsProcessor:
    """Per-user cumulative counters with a typed ValueState handle.

    Subclasses ``StatefulProcessor`` lazily (import at class-build time
    would make this module require Spark 4 everywhere)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", RUNNING_STATE)

    def handleInputRows(self, key, rows, timerValues):
        n, total = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on the Spark 4 ``transformWithStateInPandas``
    API — typed state handles instead of a monolithic state tuple; the
    state store must be RocksDB
    (``spark.sql.streaming.stateStore.providerClass``).

    Capability-gated: the TransformWithState Python driver worker requires
    the ``google.protobuf`` package at runtime (crashes at init without
    it); ``running_user_totals`` is the dependency-free equivalent."""
    from pyspark.sql.streaming import StatefulProcessor

    proc_cls = type(
        "RunningTotalsStatefulProcessor",
        (RunningTotalsProcessor, StatefulProcessor),
        {},
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(),
        outputStructType=RUNNING_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
