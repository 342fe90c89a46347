"""Custom stateful streaming via transformWithStateInPandas — the
Spark 4 arbitrary-state API (successor to applyInPandasWithState).

Same per-user running totals as streaming/stateful.py, expressed
against the new API so both stateful surfaces are exercised; the
equivalence test pins their drained outputs to each other and to the
batch aggregate.  What the new API adds over the old one (and why a
100 TB deployment migrates):

- **Typed state handles** (ValueState/ListState/MapState) instead of
  one tuple row — composite state without hand-rolled encoding.
- **Schema evolution** of state between restarts.
- **Timers** (processing/event time) registered per key, replacing
  the single GroupStateTimeout knob.
- **Initial state** bootstrap from a batch DataFrame.

State remains keyed by user_id, bounded by key cardinality; an idle
timer (see streaming/stateful.py's evicting variant for the old-API
form) is the production eviction path.

Runtime dependency: the new API's state server speaks protobuf to a
dedicated Python driver worker, so executing a query through this
operator needs the ``protobuf`` package (absent in this container —
the streaming equivalence test skips there and the processor logic is
unit-tested against a fake handle instead).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v", DoubleType())]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key (count, value-sum) accumulator on a ValueState handle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: "Iterator[pd.DataFrame]", timerValues
    ) -> "Iterator[pd.DataFrame]":
        import pandas as pd

        n, v = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            v += float(pdf["value"].sum())
        self._totals.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
        )

    def close(self) -> None:
        pass


def user_running_totals_stream_v2(events: DataFrame) -> DataFrame:
    """The transformWithStateInPandas form of
    streaming/stateful.user_running_totals_stream — identical emitted
    rows, new-API state management."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
