"""Vocabulary / heavy hitters (operators/vocab.py): exact counts,
deterministic cut, count-min sketch estimate quality."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.vocab import (
    token_counts,
    token_sketch,
    vocab_topk,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple cherry apple"),
            Row(doc_id=2, text="banana cherry banana date"),
        ]
    )


def test_exact_counts(spark):
    counts = {r.token: r.n for r in token_counts(_docs(spark)).collect()}
    assert counts == {"apple": 3, "banana": 3, "cherry": 2, "date": 1}


def test_topk_deterministic_tiebreak(spark):
    top = [(r.token, r.n) for r in vocab_topk(_docs(spark), k=3).collect()]
    # apple and banana tie at 3 -> token asc breaks it
    assert top == [("apple", 3), ("banana", 3), ("cherry", 2)]


def test_sketch_tracks_exact(spark):
    sketch_row = token_sketch(_docs(spark), eps=0.001, confidence=0.99).head()
    assert sketch_row.sketch is not None and len(sketch_row.sketch) > 0
    # point-query the sketch through Spark's own CountMinSketch reader
    from py4j.java_gateway import java_import

    spark_jvm = spark.sparkContext._jvm
    java_import(spark_jvm, "org.apache.spark.util.sketch.CountMinSketch")
    jsketch = spark_jvm.CountMinSketch.readFrom(
        spark._jvm.java.io.ByteArrayInputStream(bytes(sketch_row.sketch))
    )
    for token, exact in [("apple", 3), ("banana", 3), ("date", 1)]:
        est = jsketch.estimateCount(token)
        assert est >= exact  # CMS never underestimates
        assert est <= exact + 2  # eps * stream-length slack (tiny here)


def test_encode_tokens_roundtrip_and_oov(spark):
    from wc_vector_indexing_spark.operators.vocab import encode_tokens, vocab_with_ids

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog zzz ran"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    vocab = vocab_with_ids(docs, k=7)  # "zzz" sorts last among n=1 ties
    v = {r.token: r.token_id for r in vocab.collect()}
    assert v["the"] == 0  # most frequent token takes id 0
    out = {r.doc_id: r for r in encode_tokens(docs, vocab).collect()}
    inv = {i: t for t, i in v.items()}
    # order-preserving round trip through the vocabulary
    assert [inv[i] for i in out[1].token_ids] == "the cat sat on the mat".split()
    assert out[1].n_tokens == 6
    assert -1 in out[2].token_ids  # OOV marked, position preserved
    assert out[2].token_ids[0] == v["the"]
    assert 3 not in out  # whitespace-only doc absent (explode semantics)


def test_encode_tokens_col_matches_batch(spark):
    """The in-row (stream-safe) encoder reproduces the join-based
    encoder's sequences on the fit corpus."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.vocab import (
        encode_tokens,
        encode_tokens_col,
        vocab_with_ids,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog zzz ran"), (3, "   ")],
        "doc_id long, text string",
    )
    vocab = vocab_with_ids(docs, k=7)
    batch = {r.doc_id: list(r.token_ids) for r in encode_tokens(docs, vocab).collect()}
    ids = {r.token: r.token_id for r in vocab.collect()}
    inrow = {
        r.doc_id: list(r.ids)
        for r in docs.select("doc_id", encode_tokens_col(ids).alias("ids")).collect()
    }
    for d, seq in batch.items():
        assert inrow[d] == seq
    assert inrow[3] == []  # whitespace doc: empty sequence, not absent


def test_decode_roundtrip(spark):
    from wc_vector_indexing_spark.operators.vocab import (
        decode_tokens_col,
        encode_tokens_col,
        vocab_with_ids,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog zzz ran")],
        "doc_id long, text string",
    )
    ids = {r.token: r.token_id for r in vocab_with_ids(docs, k=7).collect()}
    out = {
        r.doc_id: r.decoded
        for r in docs.select(
            "doc_id",
            decode_tokens_col(ids, encode_tokens_col(ids)).alias("decoded"),
        ).collect()
    }
    assert out[1] == "the cat sat on the mat"
    assert out[2] == "the dog <unk> ran"  # OOV round-trips as unk marker
