"""Incremental dedup against the persisted signature store
(operators/incremental_dedup.py): batch-vs-store matching, append
discipline, hash-family pinning, and estimate quality."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from wc_vector_indexing_spark.operators.dedup import minhash_lsh_pairs
from wc_vector_indexing_spark.operators.incremental_dedup import SignatureStore

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
OTHER = "completely unrelated content about spark shuffles and parquet files"


@pytest.fixture()
def store(spark, tmp_path):
    s = SignatureStore(spark, str(tmp_path / "sigstore"), num_hashes=64, bands=16, k=4)
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=OTHER)]
    )
    s.append(corpus)
    return s


def test_match_finds_near_dup_of_stored(spark, store):
    batch = spark.createDataFrame(
        [Row(doc_id=100, text=NEAR), Row(doc_id=101, text="nothing like anything stored")]
    )
    pairs = store.match_new(batch, threshold=0.3).collect()
    assert [(p.new_id, p.store_id) for p in pairs] == [(100, 1)]
    assert pairs[0].est_jaccard >= 0.3


def test_estimate_tracks_exact_jaccard(spark, store):
    # exact Jaccard for (BASE, NEAR) from the in-batch path
    both = spark.createDataFrame([Row(doc_id=1, text=BASE), Row(doc_id=2, text=NEAR)])
    exact = minhash_lsh_pairs(both, threshold=0.0).collect()[0].jaccard
    batch = spark.createDataFrame([Row(doc_id=100, text=NEAR)])
    est = store.match_new(batch, threshold=0.0).collect()[0].est_jaccard
    # standard error ~ 1/sqrt(64) = 0.125; allow 2.5 sigma
    assert abs(est - exact) <= 0.32, (est, exact)


def test_ingest_appends_only_accepted(spark, store):
    batch = spark.createDataFrame(
        [Row(doc_id=100, text=NEAR), Row(doc_id=101, text="fresh novel document text here")]
    )
    accepted, dups = store.ingest(batch, threshold=0.3)
    assert {r.doc_id for r in accepted.collect()} == {101}
    assert [(d.new_id, d.store_id) for d in dups.collect()] == [(100, 1)]
    # the accepted doc is now part of the corpus: re-ingesting it dedups
    again = spark.createDataFrame([Row(doc_id=200, text="fresh novel document text here")])
    _, dups2 = store.ingest(again, threshold=0.3)
    assert [(d.new_id, d.store_id) for d in dups2.collect()] == [(200, 101)]
    # store never duplicates ids
    ids = [r.doc_id for r in store.read().select("doc_id").collect()]
    assert sorted(ids) == [1, 2, 101]


def test_meta_pins_hash_family(spark, store):
    # reopening with different parameters must keep the stored family
    reopened = SignatureStore(spark, store.root, num_hashes=32, bands=8, k=2)
    assert (reopened.num_hashes, reopened.bands, reopened.k) == (64, 16, 4)


def test_signature_udf_runs_on_batch_only(spark, store):
    batch = spark.createDataFrame([Row(doc_id=100, text=NEAR)])
    plan = store.match_new(batch)._jdf.queryExecution().executedPlan().toString()
    # exactly one Arrow eval (the batch); the store side is a parquet
    # scan of precomputed signatures, never a recompute
    assert plan.count("ArrowEvalPython") <= 1
