"""Custom stateful operator: per-user running totals.

The reference has no streaming (SURVEY §2.3); this is the
beyond-reference scope's ``applyInPandasWithState`` surface — an
arbitrary-state operator Spark's built-in windowed aggregations can't
express (state = a running (count, sum) carried across micro-batches
per user, emitted per event).

Three twins over the same semantics:

- ``running_totals_batch``: ``applyInPandas`` grouped-map — sorts each
  user's events by (ts, event_id) and emits cumulative count/sum per
  event. Batch-mode, so it is DuckDB-oracle-checkable against a SQL
  running-window sum.
- ``running_totals_stream``: ``applyInPandasWithState`` — identical
  arithmetic, with the (count, sum) accumulator held in ``GroupState``
  between micro-batches. Tested against the batch twin under an
  availableNow file stream.
- ``running_totals_tws``: the same operator on Spark 4's
  ``transformWithStateInPandas`` (named ValueState, timer/TTL-capable).

Scale shape: both are a single shuffle on ``user_id``; state per group
is two scalars, so executor state stores stay O(#users), not O(#events).
Within-batch arithmetic is pandas-vectorized over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from covid_custom_sql_engine_spark.streaming.windows import (
    with_event_time_watermark,
)
from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id long, event_id long, seq long, running_total double"
STATE_SCHEMA = "n long, total double"


def _cumulate(pdf: pd.DataFrame, n0: int = 0, total0: float = 0.0) -> pd.DataFrame:
    """Vectorized cumulative (count, sum) in (ts, event_id) order,
    seeded with carried-in state."""
    pdf = pdf.sort_values(["ts", "event_id"])
    vals = pdf["value"].fillna(0.0)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "seq": range(n0 + 1, n0 + 1 + len(pdf)),
            "running_total": total0 + vals.cumsum(),
        }
    )


def running_totals_batch(events: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Batch twin: grouped-map cumulative totals per user.

    ``num_partitions``: AQE coalesces the grouped-map's shuffle by byte
    size, which underestimates Python-UDF stages (few MB of input can
    be seconds of per-group Python) — measured 3× slower at sf0.1 when
    the stage coalesced to 2 tasks. An explicit ``repartition(n, key)``
    is exempt from AQE coalescing and already satisfies the grouped-
    map's clustering requirement, so no second exchange is added."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _cumulate(pdf)

    src = events.select("user_id", "event_id", "ts", "value")
    if num_partitions:
        src = src.repartition(num_partitions, "user_id")
    return src.groupBy("user_id").applyInPandas(fn, OUT_SCHEMA)


def running_totals_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming form: GroupState carries (n, total) across batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n0, total0 = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            out = _cumulate(pdf, n0, total0)
            if len(out):
                n0 = int(out["seq"].iloc[-1])
                total0 = float(out["running_total"].iloc[-1])
            yield out
        state.update((n0, total0))

    return (
        with_event_time_watermark(events, "ts", watermark)
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


def running_totals_tws(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Same semantics on ``transformWithStateInPandas`` (Spark 4's
    successor state API — RocksDB-backed named state, timers, TTL).

    The accumulator lives in a named ``ValueState``; unlike
    ``GroupState`` it composes (an operator can hold several value/list/
    map states) and supports per-state TTL — at 100 TB that is what
    bounds the state store for keys that go quiet. Here one ValueState
    of two scalars keeps parity with the twins above, so all three
    implementations are cross-checked against each other in tests.

    Runtime dependency: the TWS driver worker speaks protobuf to the
    JVM state server, so ``google.protobuf`` must be installed
    (standard on a real cluster; absent in minimal test containers —
    the parity test skips itself when it is missing).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n0, total0 = self._acc.get() if self._acc.exists() else (0, 0.0)
            for pdf in rows:
                out = _cumulate(pdf, n0, total0)
                if len(out):
                    n0 = int(out["seq"].iloc[-1])
                    total0 = float(out["running_total"].iloc[-1])
                yield out
            self._acc.update((n0, total0))

        def close(self) -> None:
            pass

    return (
        with_event_time_watermark(events, "ts", watermark)
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(), OUT_SCHEMA, outputMode="append", timeMode="none"
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id long, n_events long, total double, session_end string"
)
_SESSION_STATE_SCHEMA = "n long, total double, last_ms long"


def session_summaries_tws(
    events: DataFrame, gap_ms: int = 30 * 60 * 1000, watermark: str = "30 minutes"
) -> DataFrame:
    """Idle-gap session summaries with EVENT-TIME TIMERS on
    ``transformWithStateInPandas`` — the state-API capability none of
    the window builders cover: output is produced when a key goes
    QUIET, not when a row arrives. Each input row folds into a named
    ValueState (count, sum, last event ms) and re-arms a timer at
    ``last_ms + gap_ms``; when the watermark passes that instant Spark
    calls ``handleExpiredTimer``, which emits ONE summary row for the
    session and clears the state — so executor state holds only the
    ACTIVE keys, and a key that stops arriving costs nothing after its
    timer fires (the 100 TB eviction story, enforced by the engine
    rather than by convention).

    Same runtime dependency as :func:`running_totals_tws`
    (``google.protobuf`` for the TWS driver worker; the test skips
    where it is absent).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionSummaries(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._acc = handle.getValueState("session", _SESSION_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n0, total0, last0 = (
                self._acc.get() if self._acc.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                if len(pdf):
                    n0 += len(pdf)
                    total0 += float(pdf["value"].sum())
                    last0 = max(
                        last0, int(pdf["ts"].max().value // 1_000_000)
                    )
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last0 + gap_ms)
            self._acc.update((n0, total0, last0))
            yield from ()

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._acc.exists():
                n0, total0, last0 = self._acc.get()
                end = pd.Timestamp(expiredTimerInfo.getExpiryTimeInMs(), unit="ms")
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n0],
                        "total": [total0],
                        "session_end": [end.strftime("%Y-%m-%d %H:%M:%S")],
                    }
                )
                self._acc.clear()

        def close(self) -> None:
            pass

    return (
        with_event_time_watermark(events, "ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionSummaries(),
            SESSION_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
