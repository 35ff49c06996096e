"""Trailing-edge debounce via applyInPandasWithState: bursts buffer in
keyed state, emit fires after the quiet period (processing-time timeout)."""

from __future__ import annotations

import time
from datetime import datetime

from pyspark.sql import Row

from wc_vector_indexing_spark.streaming.incremental import CHANGE_EVENT_SCHEMA
from wc_vector_indexing_spark.streaming.stateful import debounced_stream

T0 = datetime(2025, 6, 1, 12, 0, 0)


def test_stateful_debounce_emits_after_quiet_period(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    spark.createDataFrame(
        [
            Row(product_id=1, change_type="save", event_ts=T0),
            Row(product_id=1, change_type="save", event_ts=T0.replace(second=5)),
            Row(product_id=1, change_type="trash", event_ts=T0.replace(second=9)),
            Row(product_id=2, change_type="save", event_ts=T0.replace(second=2)),
        ],
        CHANGE_EVENT_SCHEMA,
    ).write.parquet(src_dir)

    stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(src_dir)
    out = debounced_stream(stream, debounce_ms=2000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("debounced")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # batch 1 ingests all events (state armed, nothing emitted);
        # subsequent empty batches advance processing time past the
        # timeout and fire the trailing edge
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM debounced").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()

    by_id = {r.product_id: r for r in rows}
    assert set(by_id) == {1, 2}
    assert by_id[1].change_type == "trash"  # latest change wins
    assert by_id[1].n_events == 3  # burst collapsed to one emission
    assert by_id[2].change_type == "save" and by_id[2].n_events == 1
