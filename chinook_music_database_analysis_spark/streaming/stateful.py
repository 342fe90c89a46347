"""Custom stateful streaming operator via applyInPandasWithState.

Built-in windows/dedup cover most event semantics; when they don't
(bespoke per-key accumulators, custom eviction), the Spark-native
escape hatch is ``applyInPandasWithState``: Arrow-batched per-key
state with explicit timeout control.  This module demonstrates the
pattern with a per-user running aggregate.

State is keyed by user_id and bounded by key cardinality (at 100 TB
one would add a ProcessingTimeTimeout to expire idle keys).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, v double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: "Iterator[pd.DataFrame]",
    state: GroupState,
) -> "Iterator[pd.DataFrame]":
    import pandas as pd

    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
    )


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) maintained as custom group
    state; emits the updated totals for keys seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EVICTING_OUTPUT_SCHEMA = OUTPUT_SCHEMA + ", final boolean"

#: idle eviction horizon for the bounded-state variant.
DEFAULT_IDLE_TIMEOUT_MS = 30 * 60 * 1000


def make_evicting_update(idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS):
    """Build the update function for the state-evicting variant.

    Separated from the stream wiring so the eviction protocol —
    hasTimedOut -> emit final row -> state.remove() — is directly
    unit-testable without a streaming query.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: "Iterator[pd.DataFrame]",
        state: GroupState,
    ) -> "Iterator[pd.DataFrame]":
        import pandas as pd

        if state.hasTimedOut:
            n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(v, 2)],
                    "final": [True],
                }
            )
            return
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(v, 2)],
                "final": [False],
            }
        )

    return update


def user_running_totals_evicting_stream(
    events: DataFrame, idle_timeout_ms: int = DEFAULT_IDLE_TIMEOUT_MS
) -> DataFrame:
    """Bounded-state running totals: every key re-arms a
    processing-time timeout; keys idle past the horizon emit one
    ``final=True`` row and their state is removed.  This is the piece
    that keeps the state store O(active keys) instead of O(all keys
    ever seen) on an unbounded 100 TB stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_evicting_update(idle_timeout_ms),
        outputStructType=EVICTING_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
