"""Per-group percentile quality gate (CCNet-style dynamic threshold).

The exact ranked form is oracle-verified via the `percentile_quality`
registry entry; here we pin the operator-level properties plus the
threshold (scale) variant the oracle can't see:

- exact form keeps ceil(keep_frac * n_g) rows per group, the top ones;
- threshold form keeps a superset-at-the-boundary of the exact form
  (every doc strictly above the group's cut survives both);
- every kept row's score >= its group's broadcast threshold.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.textstats import (
    percentile_quality_filter,
    threshold_quality_filter,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_form_keeps_ceil_frac_per_group(spark, docs):
    kept = percentile_quality_filter(docs, keep_frac=0.4)
    per_group = {
        r["lang"]: (r["n_kept"], r["grp_total"])
        for r in kept.groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.first("grp_total").alias("grp_total"))
        .collect()
    }
    totals = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_group) == set(totals)
    for lang, (n_kept, grp_total) in per_group.items():
        assert grp_total == totals[lang]
        assert n_kept == math.ceil(0.4 * totals[lang])


def test_exact_form_keeps_the_top_scores(spark, docs):
    kept = percentile_quality_filter(docs, keep_frac=0.4)
    # min kept score per group >= max dropped score per group (ties broken
    # by doc_id, so compare strictly: no dropped score may EXCEED a kept one)
    kept_min = {
        r["lang"]: r["m"]
        for r in kept.groupBy("lang").agg(F.min("quality_score").alias("m")).collect()
    }
    kept_ids = [r["doc_id"] for r in kept.select("doc_id").collect()]
    from wc_vector_indexing_spark.operators.textstats import quality_score_col

    dropped_max = {
        r["lang"]: r["m"]
        for r in docs.filter(~F.col("doc_id").isin(kept_ids))
        .select("lang", F.round(quality_score_col("text"), 4).alias("q"))
        .groupBy("lang")
        .agg(F.max("q").alias("m"))
        .collect()
    }
    for lang, dmax in dropped_max.items():
        assert dmax <= kept_min[lang]


def test_threshold_form_agrees_off_the_boundary(spark, docs):
    exact = percentile_quality_filter(docs, keep_frac=0.4)
    approx = threshold_quality_filter(docs, keep_frac=0.4)
    thresholds = {
        r["lang"]: r["t"]
        for r in approx.groupBy("lang").agg(F.min("q_threshold").alias("t")).collect()
    }
    # every kept row respects its group's broadcast threshold
    bad = approx.filter(F.col("quality_score") < F.col("q_threshold")).count()
    assert bad == 0
    # docs strictly above the group threshold survive BOTH forms
    strict = exact.filter(
        F.col("quality_score")
        > F.lit(max(thresholds.values()))  # above every cut -> trivially kept
    )
    approx_ids = {r["doc_id"] for r in approx.select("doc_id").collect()}
    for r in strict.select("doc_id").collect():
        assert r["doc_id"] in approx_ids
    # kept fraction is in the right neighbourhood (sketch boundary error)
    n, n_kept = docs.count(), approx.count()
    assert 0.25 <= n_kept / n <= 0.75


def test_fitted_gate_stream_equals_batch(spark, docs, tmp_path):
    from pyspark.sql import types as T

    from wc_vector_indexing_spark.operators.textstats import (
        fit_quality_thresholds,
        quality_gate_col,
    )

    thresholds = fit_quality_thresholds(docs, keep_frac=0.4)
    assert set(thresholds) == {r["lang"] for r in docs.select("lang").distinct().collect()}

    keep = quality_gate_col(thresholds)
    batch_ids = {
        r["doc_id"] for r in docs.filter(keep).select("doc_id").collect()
    }
    assert 0 < len(batch_ids) < docs.count()

    # unseen group fails closed: strictest fitted threshold applies
    probe = spark.createDataFrame(
        [("zz", "a b")], "lang string, text string"
    ).select(quality_gate_col(thresholds).alias("keep"))
    assert probe.head()["keep"] in (True, False)  # evaluates, no null

    # stream twin: same gate column on a file stream, two micro-batches
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    rows = docs.select("doc_id", "lang", "text").collect()
    half = len(rows) // 2
    d = str(tmp_path / "docs")
    spark.createDataFrame(rows[:half], schema).write.parquet(d + "/f1")
    spark.createDataFrame(rows[half:], schema).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        stream.filter(quality_gate_col(thresholds))
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("gate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = {r["doc_id"] for r in spark.sql("SELECT * FROM gate_out").collect()}
    assert streamed == batch_ids


def test_prep_stream_fitted_gate(spark, docs, tmp_path):
    """prep_document_stream with offline-fitted thresholds: the
    percentile gate composes with the other prep stages and behaves
    identically on a stream (pure in-row predicate, no new state)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from wc_vector_indexing_spark.operators.textstats import (
        fit_quality_thresholds,
        predicted_lang_col,
    )
    from wc_vector_indexing_spark.streaming.incremental import prep_document_stream

    staged = docs.limit(60).select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.col("doc_id")).alias("event_ts"),
    )
    thresholds = fit_quality_thresholds(
        staged.withColumn("_plang", predicted_lang_col("text")),
        keep_frac=0.5,
        group_col="_plang",
    )
    batch = prep_document_stream(
        staged, languages=None, quality_thresholds=thresholds
    )
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    loose = prep_document_stream(staged, languages=None)
    loose_ids = {r["doc_id"] for r in loose.select("doc_id").collect()}
    assert batch_ids < loose_ids  # strictly tighter, never additive

    # streaming twin over the same rows
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("event_ts", T.TimestampType(), False),
        ]
    )
    d = str(tmp_path / "prep_docs")
    spark.createDataFrame(staged.collect(), schema).write.parquet(d + "/f1")
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        prep_document_stream(stream, languages=None, quality_thresholds=thresholds)
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("prep_gate_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "prep_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    streamed = {r["doc_id"] for r in spark.sql("SELECT * FROM prep_gate_out").collect()}
    assert streamed == batch_ids
