"""Custom stateful streaming operators via applyInPandasWithState —
the engine's answer for semantics Spark's built-in stateful ops can't
express (SURVEY.md §2.3 extension; the reference has no event-time or
state at all).

Example operator: per-user running counters — each micro-batch updates
a GroupState holding (event_count, value_sum) per user.

Inactivity expiry (``expire_after_s``) uses processing-time timeouts.
NB: a query with registered processing-time timers never terminates
under Trigger.AvailableNow (the timers keep it ACTIVE waiting for
wall-clock); use expiry only with long-running processingTime-trigger
queries, never in drain-to-completion jobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from batchprocessor_spark.functions.exactmath import pd_to_units

OUTPUT_SCHEMA = "user_id BIGINT, event_count BIGINT, value_sum DOUBLE, closed BOOLEAN"
# State accumulates VALUE IN EXACT INTEGER CENTS, not a double: double
# accumulation order differs between micro-batch splits (and from any
# batch oracle), while the cents lane (functions/exactmath.py) is
# associative, restart-safe, and descales to an identical double on
# every engine. events.value carries 2 decimals (asserted in
# tests/test_oracle_parity.py).
STATE_SCHEMA = "event_count BIGINT, value_cents BIGINT"


def _make_update_fn(expire_after_s: float | None):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if expire_after_s is not None and state.hasTimedOut:
            count, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "event_count": [count],
                    "value_sum": [cents / 100.0],
                    "closed": [True],
                }
            )
            return
        count, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            count += len(pdf)
            cents += int(pd_to_units(pdf["value"], 100).sum())
        state.update((count, cents))
        if expire_after_s is not None:
            state.setTimeoutDuration(int(expire_after_s * 1000))
        # cents < 2^53 ⇒ exact as double; one correctly-rounded divide
        # gives the identical IEEE double as the oracle's
        # sum(cents)/100.0.
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_count": [count],
                "value_sum": [cents / 100.0],
                "closed": [False],
            }
        )

    return update


def running_user_counters(
    events_stream: DataFrame, expire_after_s: float | None = None
) -> DataFrame:
    """Stateful per-user counters over a stream of (user_id, value)
    rows. Arrow-batched per group; state lives in the state store
    (checkpointed, survives restarts)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_after_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(expire_after_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def has_transform_with_state() -> bool:
    """Spark 4's transformWithStateInPandas drives its state-server
    protocol through google.protobuf, which is not part of pyspark's
    own dependencies — probe for it (same feature-gate discipline as
    the PIL probe in functions/multimodal.py)."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def make_counters_processor():
    """Build the transformWithState StatefulProcessor for the per-user
    (count, cents) counters. Module-level factory (not an inline
    class) so the processor's state-handling logic is drivable
    IN-PROCESS with a stub handle when the runtime lacks the state
    server's protobuf dependency — tests/test_stateful.py asserts the
    same counters either way, so the path is exercised on every
    environment rather than skipped. StatefulProcessor itself imports
    clean without protobuf; only the server wire protocol needs it."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Counters(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("counters", "c BIGINT, s BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            c, s = (self._st.get() or (0, 0)) if self._st.exists() else (0, 0)
            for pdf in rows:
                c += len(pdf)
                # exact cents lane, same as _make_update_fn
                s += int(pd_to_units(pdf["value"], 100).sum())
            self._st.update((c, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_count": [c],
                    "value_sum": [s / 100.0],
                    "closed": [False],
                }
            )

        def close(self) -> None:
            pass

    return _Counters()


def running_user_counters_tws(events_stream: DataFrame) -> DataFrame:
    """The same per-user (count, cents) counters on Spark 4's
    transformWithStateInPandas — the arbitrary-state successor to
    applyInPandasWithState: named state variables on an explicit
    handle, timers, TTL, and a RocksDB-only state backend. Kept
    behind has_transform_with_state(); the applyInPandasWithState
    twin (running_user_counters) is the portable default, and
    equivalence is asserted in tests/test_stateful.py whenever the
    runtime can load this path."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_counters_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="None",
    )
