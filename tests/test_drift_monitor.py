"""Stream-time drift monitoring: offline-fitted unigram reference
(lm_score.fit_unigram_ref / ref_nll_cols) + the windowed cross-entropy
monitor (streaming.incremental.drift_monitor_stream), stream == batch."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from wc_vector_indexing_spark.operators.lm_score import (
    UnigramRef,
    fit_unigram_ref,
    ref_nll_cols,
)
from wc_vector_indexing_spark.streaming.incremental import drift_monitor_stream

T0 = datetime(2026, 1, 1, 12, 0, 0)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)


def test_fit_unigram_ref_probs_and_floor(spark):
    ref_docs = spark.createDataFrame(
        [Row(doc_id=1, text="aa aa aa bb")], "doc_id long, text string"
    )
    ref = fit_unigram_ref(ref_docs, top_v=10, floor_scale=0.1)
    assert ref.log_p["aa"] == pytest.approx(math.log(3 / 4))
    assert ref.log_p["bb"] == pytest.approx(math.log(1 / 4))
    # floor = 0.1 × rarest kept prob
    assert ref.floor == pytest.approx(math.log(0.1 * 0.25))
    with pytest.raises(ValueError):
        fit_unigram_ref(ref_docs.filter("doc_id < 0"))


def test_ref_nll_cols_golden(spark):
    import pyspark.sql.functions as F

    ref = UnigramRef(log_p={"aa": math.log(0.5), "bb": math.log(0.25)}, floor=math.log(0.01))
    df = spark.createDataFrame([Row(text="aa bb zz")], "text string")
    s, n = ref_nll_cols(ref, "text")
    row = df.select(s.alias("s"), n.alias("n")).head()
    assert row.n == 3
    assert row.s == pytest.approx(-(math.log(0.5) + math.log(0.25) + math.log(0.01)))


def test_drift_monitor_flags_the_drifted_slice_and_stream_equals_batch(
    spark, tmp_path
):
    # reference corpus: plain english-ish tokens
    ref_docs = spark.createDataFrame(
        [Row(doc_id=i, text="the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    ref = fit_unigram_ref(ref_docs)

    rows = [
        # in-distribution slice
        Row(doc_id=1, source="ok", text="the quick brown fox", event_ts=T0),
        Row(doc_id=2, source="ok", text="the lazy dog jumps", event_ts=T0 + timedelta(minutes=1)),
        # drifted slice: all OOV
        Row(doc_id=3, source="drift", text="zzz qqq xxx www", event_ts=T0 + timedelta(minutes=2)),
    ]
    batch = drift_monitor_stream(
        spark.createDataFrame(rows, SCHEMA), ref, window="1 hour"
    )
    got = {r.source: r for r in batch.collect()}
    assert got["drift"].cross_entropy_nats > got["ok"].cross_entropy_nats
    assert got["ok"].n_docs == 2 and got["drift"].n_tokens == 4
    # every drifted token hit the OOV floor exactly
    assert got["drift"].cross_entropy_nats == pytest.approx(round(-ref.floor, 4))

    # streaming twin over the same rows in two micro-batches
    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(rows[:2], SCHEMA).write.parquet(docs_dir + "/f1")
    spark.createDataFrame(rows[2:], SCHEMA).write.parquet(docs_dir + "/f2")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    q = (
        drift_monitor_stream(stream, ref, window="1 hour")
        .writeStream.format("memory")
        .queryName("drift_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = {
        (r.source,): (r.n_docs, r.n_tokens, r.cross_entropy_nats)
        for r in spark.sql("SELECT * FROM drift_out").collect()
    }
    wanted = {
        (r.source,): (r.n_docs, r.n_tokens, r.cross_entropy_nats)
        for r in batch.collect()
    }
    assert streamed == wanted
