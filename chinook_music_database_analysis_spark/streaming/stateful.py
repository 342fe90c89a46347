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
