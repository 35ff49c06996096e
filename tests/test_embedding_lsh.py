"""lsh_cosine_pairs: the no-natural-key blocking path. Precision must be
exact (every emitted pair is a true pair with its true cosine — LSH only
gates candidate generation); recall is bounded below against the
brute-force truth at the catalog parameters."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.functions.vectors import cosine
from wc_vector_indexing_spark.operators.dedup import (
    embedding_cosine_pairs,
    lsh_cosine_pairs,
)
from wc_vector_indexing_spark.sources.readers import load

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, "embeddings", SF).cache()


@pytest.fixture(scope="module")
def truth(spark, emb):
    """Brute-force all-pairs ≥ 0.4 (500 vecs → 125k pairs, test-only)."""
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    rows = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cosine") >= 0.4)
        .collect()
    )
    return {(r.id_a, r.id_b): r.cosine for r in rows}


def test_precision_exact_and_recall_bound(spark, emb, truth):
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in lsh_cosine_pairs(emb, threshold=0.4, bits=3, tables=12).collect()
    }
    assert truth, "fixture degenerate: no true pairs at 0.4"
    for pair, c in got.items():
        assert pair in truth and truth[pair] == c  # no false positives, exact scores
    recall = len(got) / len(truth)
    assert recall >= 0.8, f"recall {recall:.2f} below bound ({len(got)}/{len(truth)})"


def test_block_none_dispatches_to_lsh(spark, emb):
    via_dispatch = embedding_cosine_pairs(
        emb, threshold=0.4, block_col=None, lsh_bits=3, lsh_tables=12
    )
    direct = lsh_cosine_pairs(emb, threshold=0.4, bits=3, tables=12)
    assert {tuple(r) for r in via_dispatch.collect()} == {tuple(r) for r in direct.collect()}


def test_identical_vectors_always_pair(spark):
    # duplicates collide in every table regardless of bucket layout
    v = [float(i % 7 - 3) for i in range(16)]
    w = [float((i * 3) % 5 - 2) for i in range(16)]
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=v), Row(vec_id=2, embedding=v), Row(vec_id=3, embedding=w)]
    )
    out = {(r.id_a, r.id_b): r.cosine for r in lsh_cosine_pairs(df, threshold=0.99).collect()}
    assert (1, 2) in out and out[(1, 2)] == 1.0


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert lsh_cosine_pairs(df).count() == 0
