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
