"""MinHash+LSH / SimHash near-dup operators: candidate recall against
the exact ngram path, and the short-doc fallback universe (candidates
from the band UDF's unigram fallback must be verifiable, not silently
dropped)."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)


def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base.replace("today", "tonight")),  # near-dup of 1
        Row(doc_id=3, text=base),                               # exact dup of 1
        Row(doc_id=4, text="completely different words about spark catalyst plans"),
    ]
    return spark.createDataFrame(rows)


def test_minhash_finds_near_dups_and_matches_exact_jaccard(spark):
    docs = corpus(spark)
    lsh = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_pairs(docs, threshold=0.2).collect()}
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    # identical docs always collide in every band → must be found
    assert lsh[(1, 3)] == 1.0
    # verification is exact: any pair LSH emits carries the exact score
    for pair, j in lsh.items():
        assert exact[pair] == j
    assert (1, 4) not in lsh and (2, 4) not in lsh


def test_minhash_short_doc_pairs_are_verified(spark):
    # both docs are under k=4 tokens: the band UDF's unigram fallback
    # buckets them together, and verification must use the SAME fallback
    # universe (identical unigrams → jaccard 1.0) instead of dropping
    # the pair because the k-gram shingle set is empty
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="too short"), Row(doc_id=2, text="too short")]
    )
    out = minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert len(out) == 1
    assert (out[0].doc_a, out[0].doc_b, out[0].jaccard) == (1, 2, 1.0)


def test_minhash_short_vs_long_no_false_pair(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="too short"),
            Row(doc_id=2, text="a much longer document with enough tokens for shingles"),
        ]
    )
    assert minhash_lsh_pairs(docs, threshold=0.1).count() == 0


def test_simhash_near_pairs_blocked(spark):
    docs = corpus(spark)
    out = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(docs, max_hamming=8).collect()}
    assert out.get((1, 3)) == 0  # identical text → identical fingerprint
    assert (1, 4) not in out
