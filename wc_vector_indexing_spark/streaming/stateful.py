"""Custom stateful streaming operator (applyInPandasWithState):
per-product debounce with keyed state and processing-time timeout.

The windowed debounce in streaming/incremental.py collapses bursts per
tumbling window; this is the *true* reference semantics
(class-lifecycle.php:111-114): an edit (re)arms a 30 s timer, and the
product syncs only when the timer fires with no further edits — i.e.
trailing-edge debounce. That is inexpressible as a window aggregate; it
needs per-key state + timeouts, which Structured Streaming exposes as
``applyInPandasWithState``.

State per product: (latest change_type, latest event time, pending
count). On new events → update state, arm timeout, emit nothing. On
timeout → emit one row for the product, clear state.

Scale: state lives in the streaming state store partitioned by key
(RocksDB-backed on a real cluster); memory is O(products-in-flight),
bounded by the debounce horizon.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType(), False),
        T.StructField("change_type", T.StringType(), False),
        T.StructField("n_events", T.IntegerType(), False),
    ]
)

DEBOUNCE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("change_type", T.StringType(), True),
        T.StructField("last_seen_ms", T.LongType(), True),
        T.StructField("n_events", T.IntegerType(), True),
    ]
)


def _debounce_fn(debounce_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (product_id,) = key
        if state.hasTimedOut:
            change_type, _, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"product_id": [product_id], "change_type": [change_type], "n_events": [n]}
            )
            return

        latest_type, latest_ms, n = None, 0, 0
        if state.exists:
            latest_type, latest_ms, n = state.get
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("event_ts")
            latest_type = str(pdf["change_type"].iloc[-1])
            latest_ms = int(pdf["event_ts"].iloc[-1].value // 1_000_000)
            n += len(pdf)
        state.update((latest_type, latest_ms, n))
        # trailing edge: every new event re-arms the timer
        state.setTimeoutDuration(debounce_ms)
        return
        yield  # pragma: no cover — makes fn a generator on the no-emit path

    return fn


def debounced_stream(
    change_events: DataFrame,
    debounce_ms: int = 30_000,
) -> DataFrame:
    """Trailing-edge per-product debounce over a change-event stream
    (product_id, change_type, event_ts). Emits one (product_id,
    change_type, n_events) row per quiet period."""
    return (
        change_events.groupBy("product_id")
        .applyInPandasWithState(
            _debounce_fn(debounce_ms),
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
