"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8 extension: the arbitrary-state API the engine exposes for
operators the built-in streaming aggregates can't express).

The example operator keeps a running per-user event count and running
value sum across micro-batches — per-key state lives in the state
store, is updated with Arrow-batched pandas, and is emitted on every
batch (update mode). Swap the body for sessionization-with-custom-
expiry, pattern detection, or online aggregates; the plumbing (state
schema, timeout handling, batch iteration) is the part shown here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
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
    """Running (count, value-sum) per user, maintained across
    micro-batches in keyed state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---- streaming sessionization (event-time timeout) --------------------------

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
#: (session_start_us, last_ts_us, n_events) of the currently-open session.
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"

_US = 1_000_000


def _make_session_updater(gap_minutes: float):
    gap_us = int(gap_minutes * 60 * _US)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def _row(start_us: int, last_us: int, n: int) -> dict:
            return {
                "user_id": key[0],
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": n,
            }

        closed: list[dict] = []
        if state.hasTimedOut:
            # Watermark passed last_ts + gap: the open session is over.
            start_us, last_us, n = state.get
            state.remove()
            closed.append(_row(start_us, last_us, n))
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(t) for t in pdf["ts"].astype("datetime64[us]").astype("int64")
                )
            ts_us.sort()
            cur = state.get if state.exists else None
            for t in ts_us:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_us:
                    closed.append(_row(*cur))
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # Fire when the event-time watermark passes the gap edge;
                # if the watermark already has (state older than gap when
                # this batch ran), fire at the next watermark tick.
                edge_ms = (cur[1] + gap_us) // 1000
                state.setTimeoutTimestamp(
                    max(edge_ms, state.getCurrentWatermarkMs() + 1)
                )
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    return _update


def sessionize_stream(
    events: DataFrame, gap_minutes: float = 30.0, watermark: str = "1 second"
) -> DataFrame:
    """Streaming gap-sessionization — the stateful twin of the batch
    ``timeseries.sessionize``: per-user open-session state lives in the
    state store; a session closes either when a later event arrives
    past the gap (emitted immediately) or when the event-time watermark
    passes ``last_ts + gap`` (emitted via EventTimeTimeout, which is
    also what bounds state on an unbounded stream).

    Output: one row per CLOSED session (append mode) —
    (user_id, session_start, session_end, n_events). At 100 TB the
    keyed state shuffles once by user and stays O(open sessions);
    late events beyond the watermark are dropped by definition.
    """
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_updater(gap_minutes),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
