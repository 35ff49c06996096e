"""Sequence packing (operators/packing.py): bin assignment math, group
parallelism, fill-rate audit."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.packing import packing_stats, sequence_packing


def _docs(spark):
    # token counts: 6, 6, 6, 4 in source a; 10 in source b
    rows = [
        Row(doc_id=1, source="a", text="one two three four five six"),
        Row(doc_id=2, source="a", text="a b c d e f"),
        Row(doc_id=3, source="a", text="g h i j k l"),
        Row(doc_id=4, source="a", text="m n o p"),
        Row(doc_id=5, source="b", text="q r s t u v w x y z"),
    ]
    return spark.createDataFrame(rows)


def test_bin_assignment(spark):
    packed = {r.doc_id: r for r in sequence_packing(_docs(spark), budget=10).collect()}
    # source a offsets: 0, 6, 12, 18 -> bins 0, 0, 1, 1
    assert [packed[i].bin_id for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    # source b packs independently from offset 0
    assert packed[5].bin_id == 0
    assert packed[5].n_tokens == 10


def test_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = sorted((r.doc_id, r.bin_id) for r in sequence_packing(docs, budget=10).collect())
    b = sorted(
        (r.doc_id, r.bin_id)
        for r in sequence_packing(docs.repartition(5), budget=10).collect()
    )
    assert a == b


def test_packing_stats(spark):
    packed = sequence_packing(_docs(spark), budget=10)
    stats = {r.source: r for r in packing_stats(packed, budget=10).collect()}
    assert stats["a"].n_bins == 2
    # bin 0 holds 12 tokens (capped at 10), bin 1 holds 10 -> avg fill 1.0
    assert stats["a"].avg_fill == 1.0
    assert stats["b"].n_bins == 1 and stats["b"].avg_fill == 1.0


def test_pack_encoded_order_and_budget(spark):
    from wc_vector_indexing_spark.operators.packing import pack_encoded
    from wc_vector_indexing_spark.operators.vocab import encode_tokens, vocab_with_ids

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),   # 3 tokens
            (2, "d e", "s1"),     # crosses into bin 0 (cum start 3)
            (3, "f g h i", "s1"), # starts at cum 5 -> bin 1
            (4, "a a", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    vocab = vocab_with_ids(docs, k=20)
    enc = encode_tokens(docs, vocab)
    packed = {
        (r.source, r.bin_id): r
        for r in pack_encoded(enc, docs, budget=4).collect()
    }
    v = {r.token: r.token_id for r in vocab.collect()}
    # docs 1+2 start inside bin 0 (first-token rule); doc 3 starts at 5 -> bin 1
    assert packed[("s1", 0)].n_docs == 2
    assert packed[("s1", 0)].seq == [v[t] for t in ["a", "b", "c", "d", "e"]]
    assert packed[("s1", 1)].seq == [v[t] for t in ["f", "g", "h", "i"]]
    assert packed[("s2", 0)].bin_tokens == 2
