"""DSIR importance weighting — planted-domain behavior checks."""

import pytest
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.importance import importance_weights


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # target domain: astronomy-flavored
        (1, "star galaxy nebula orbit star telescope", "target"),
        (2, "orbit nebula star cluster galaxy photon", "target"),
        (3, "telescope star orbit galaxy nebula", "target"),
        # raw-only domain: cooking-flavored
        (4, "flour butter sugar oven dough whisk", "web"),
        (5, "dough oven butter flour recipe sugar", "web"),
        # looks like the target but is NOT labeled target
        (6, "star orbit galaxy telescope nebula cluster", "web"),
        # mixed
        (7, "star recipe oven galaxy", "web"),
        # no alphabetic tokens -> absent from output
        (8, "12345 67890", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_target_lookalike_scores_above_offdomain(docs):
    out = {
        r.doc_id: r
        for r in importance_weights(
            docs, F.col("source") == "target", n_buckets=512
        ).collect()
    }
    # doc 6 is token-for-token target-like; docs 4/5 are off-domain
    assert out[6].log_weight > out[4].log_weight
    assert out[6].log_weight > out[5].log_weight
    # mixed doc lands between the lookalike and the off-domain docs
    assert out[4].log_weight < out[7].log_weight < out[6].log_weight


def test_token_counts_and_empty_docs(docs):
    out = {
        r.doc_id: r
        for r in importance_weights(docs, F.col("source") == "target").collect()
    }
    assert out[1].n_tokens == 6
    assert out[6].n_tokens == 6
    assert 8 not in out  # no [a-z] tokens -> no evidence, no row


def test_weights_shift_with_target_choice(docs):
    """Swapping the target domain flips the ordering — the weight is a
    property of the chosen slice, not of the corpus."""
    cook = {
        r.doc_id: r.log_weight
        for r in importance_weights(docs, F.col("doc_id").isin(4, 5)).collect()
    }
    assert cook[4] > cook[6]
    assert cook[5] > cook[6]


def test_script_mix_dominant(spark):
    from wc_vector_indexing_spark.operators.textstats import script_mix

    rows = [
        (1, "hello plain ascii words"),
        (2, "привет мир как дела сегодня"),
        (3, "世界你好今天怎么样"),
        (4, "مرحبا بالعالم اليوم"),
        (5, "12345 !!! ???"),
        (6, "hello привет"),  # cyrillic wins 6 chars to 5
        (7, "abcd жзий"),  # exact tie: latin wins by SCRIPTS precedence
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in script_mix(df).collect()}
    assert out[1].dominant_script == "latin" and out[1].latin_ratio > 0.8
    assert out[2].dominant_script == "cyrillic"
    assert out[3].dominant_script == "han" and out[3].han_ratio == 1.0
    assert out[4].dominant_script == "arabic"
    assert out[5].dominant_script == "other"
    assert out[5].latin_ratio == 0.0
    assert out[6].dominant_script == "cyrillic"
    assert out[7].dominant_script == "latin"


def test_stream_scorer_matches_batch_weights(docs, spark):
    """The in-row scorer (stream path) reproduces the batch join path's
    log_weight on the fit corpus itself."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.importance import (
        fit_importance_model,
        importance_weights,
    )
    from wc_vector_indexing_spark.streaming.incremental import scored_document_stream

    target = F.col("source") == "target"
    batch = {
        r.doc_id: r.log_weight
        for r in importance_weights(docs, target, n_buckets=512).collect()
    }
    model = fit_importance_model(docs, target, n_buckets=512)
    scored = {
        r.doc_id: r.log_weight
        for r in scored_document_stream(docs, model).collect()
    }
    for doc_id, w in batch.items():
        assert abs(scored[doc_id] - w) < 1e-3, doc_id
    # empty-token doc: absent from batch output, scores 0.0 in-row
    assert scored[8] == 0.0


def test_stream_scorer_on_real_stream(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from wc_vector_indexing_spark.operators.importance import fit_importance_model
    from wc_vector_indexing_spark.streaming.incremental import scored_document_stream

    fit = spark.createDataFrame(
        [(1, "star galaxy nebula", "t"), (2, "flour butter dough", "w")],
        "doc_id long, text string, source string",
    )
    model = fit_importance_model(fit, F.col("source") == "t", n_buckets=128)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
        ]
    )
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(10, "star nebula galaxy star"), (11, "butter dough flour")], schema
    ).write.parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        scored_document_stream(stream, model)
        .writeStream.format("memory")
        .queryName("dsir_scored")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    out = {r.doc_id: r.log_weight for r in spark.sql("SELECT * FROM dsir_scored").collect()}
    assert out[10] > 0 > out[11]  # target-like scores high, off-domain low
