"""Metamorphic property: after ANY sequence of edits/deletes applied
incrementally, the vector index equals a from-scratch build of the final
corpus. This is the delta-sync correctness contract in one line —
the incremental path may skip/diff/retry however it likes, but the fixed
point must be indistinguishable from a full rebuild."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig
from wc_vector_indexing_spark.operators.delta_sync import delete_products, sync_products
from wc_vector_indexing_spark.operators.embed import DeterministicEmbedder
from wc_vector_indexing_spark.operators.indexer import build_chunks
from wc_vector_indexing_spark.state.store import sync_state_store, vector_index_store

SENTENCES = [
    "Alpha sentence about the product.",
    "Beta line with more words inside it.",
    "Gamma detail text for chunk boundaries.",
    "Delta words to push the budget over.",
    "Epsilon closing remark of the document.",
]


def make_text(rng: random.Random) -> str:
    n = rng.randint(3, 14)
    return " ".join(rng.choice(SENTENCES) for _ in range(n))


def run_script(spark, tmp_path, seed: int, steps: int) -> None:
    rng = random.Random(seed)
    config = EngineConfig(
        model="fake-deterministic-64", chunking=ChunkingConfig(size=25, overlap=4)
    )
    state = sync_state_store(spark, str(tmp_path / f"state{seed}"))
    index = vector_index_store(spark, str(tmp_path / f"index{seed}"))
    backend = DeterministicEmbedder()

    corpus: dict[int, str] = {pid: make_text(rng) for pid in range(1, 5)}

    def sync_all() -> None:
        df = spark.createDataFrame(
            [Row(product_id=p, text=t) for p, t in sorted(corpus.items())]
        )
        sync_products(df, state, index, config, backend, text_col="text")

    sync_all()
    for _ in range(steps):
        op = rng.choice(["edit", "edit", "append", "delete", "add", "noop"])
        if op == "edit" and corpus:
            pid = rng.choice(list(corpus))
            corpus[pid] = make_text(rng)
        elif op == "append" and corpus:
            pid = rng.choice(list(corpus))
            corpus[pid] += " " + rng.choice(SENTENCES)
        elif op == "delete" and len(corpus) > 1:
            pid = rng.choice(list(corpus))
            del corpus[pid]
            delete_products([pid], state, index)
        elif op == "add":
            pid = max(corpus, default=0) + 1
            corpus[pid] = make_text(rng)
        sync_all()

    # fixed point == full rebuild
    final = spark.createDataFrame(
        [Row(product_id=p, text=t) for p, t in sorted(corpus.items())]
    )
    expected = build_chunks(final, config, text_col="text").select(
        "product_id", "chunk_index", "chunk_sha"
    )
    actual = index.read().select("product_id", "chunk_index", "chunk_sha")
    exp = {(r.product_id, r.chunk_index, r.chunk_sha) for r in expected.collect()}
    act = {(r.product_id, r.chunk_index, r.chunk_sha) for r in actual.collect()}
    assert act == exp, f"seed={seed}: incremental != rebuild; diff={act ^ exp}"

    # ledger mirrors the index exactly and is fully synced
    st = {(r.product_id, r.chunk_index) for r in state.read().collect()}
    assert st == {(p, c) for p, c, _ in exp}
    assert state.read().filter(F.col("status") != "synced").count() == 0


def test_incremental_equals_rebuild_seed1(spark, tmp_path):
    run_script(spark, tmp_path, seed=101, steps=6)


def test_incremental_equals_rebuild_seed2(spark, tmp_path):
    run_script(spark, tmp_path, seed=202, steps=6)


# --------------------------------------------------------------------------
# Query-level equivalence for the TRAINING-DATA pipeline: the full prep
# composition (curate → DSIR score → vocab encode) plus near-dup dedup run
# once over the whole corpus must keep exactly the same doc_ids as the
# same pipeline run as successive incremental batches against a
# SignatureStore — the daily-batch-vs-100 TB-corpus operating shape.
# --------------------------------------------------------------------------

_WORDS = (
    "the quick brown fox jumps over the lazy dog while the old miller "
    "watches from the hill and the river runs slowly past the village"
).split()


def _sentence(seed: int, n: int = 40) -> str:
    rng = random.Random(seed)
    return " ".join(rng.choice(_WORDS) for _ in range(n)) + "."


def _prep_corpus(spark):
    """Docs crossing every gate: exact-dup group (101-103), a near-dup
    clique split across the batch boundary (110 vs 210), junk that the
    quality gate drops, and unique keepers in both halves."""
    rows = []
    for i, doc_id in enumerate([100, 120, 130, 220, 230, 240]):
        rows.append((doc_id, _sentence(doc_id), "src1"))
    exact = _sentence(7)
    rows += [(101, exact, "src1"), (102, exact, "src2"), (103, exact, "src1")]
    near = _sentence(9, n=60)
    rows += [(110, near, "src1"), (210, near + " appended tail word.", "src2")]
    rows += [(115, "9 9 9 9", "src1")]  # digits + too short: quality-gated
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _run_prep_batches(spark, tmp_path, name, model, vocab_ids, batches):
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.components import (
        cluster_representatives,
        connected_components,
    )
    from wc_vector_indexing_spark.operators.dedup import minhash_lsh_pairs
    from wc_vector_indexing_spark.operators.incremental_dedup import SignatureStore
    from wc_vector_indexing_spark.streaming.incremental import prep_document_stream

    store = SignatureStore(spark, str(tmp_path / name))
    kept: list[int] = []
    encoded: dict[int, list[int]] = {}
    for batch in batches:
        staged = batch.withColumn("event_ts", F.timestamp_seconds(F.col("doc_id")))
        prepped = prep_document_stream(
            staged, model=model, vocab_ids=vocab_ids
        ).localCheckpoint(eager=True)
        pairs = minhash_lsh_pairs(prepped, threshold=0.5)
        drop = cluster_representatives(connected_components(pairs)).withColumnRenamed(
            "doc", "doc_id"
        )
        in_batch = prepped.join(drop, "doc_id", "left_anti")
        accepted, _dups = store.ingest(in_batch, threshold=0.5)
        for r in accepted.select("doc_id", "token_ids", "log_weight").collect():
            kept.append(r.doc_id)
            encoded[r.doc_id] = (list(r.token_ids), round(r.log_weight, 6))
    return sorted(kept), encoded


def test_full_prep_pipeline_incremental_equals_whole(spark, tmp_path):
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.operators.importance import fit_importance_model
    from wc_vector_indexing_spark.operators.vocab import vocab_with_ids

    docs = _prep_corpus(spark)
    # offline-fitted artifacts, shared by both runs (fitting is a
    # separate batch concern; equivalence is about the APPLY path)
    model = fit_importance_model(docs, F.col("source") == "src1", n_buckets=256)
    vocab_ids = {r.token: r.token_id for r in vocab_with_ids(docs, k=50).collect()}

    whole, enc_whole = _run_prep_batches(
        spark, tmp_path, "store_whole", model, vocab_ids, [docs]
    )
    batch1 = docs.filter("doc_id < 200")
    batch2 = docs.filter("doc_id >= 200")
    incr, enc_incr = _run_prep_batches(
        spark, tmp_path, "store_incr", model, vocab_ids, [batch1, batch2]
    )

    assert whole == incr, f"whole={whole} incr={incr}"
    assert enc_whole == enc_incr  # token ids + DSIR scores identical too
    # the interesting cases actually happened:
    assert 101 in whole and 102 not in whole and 103 not in whole  # exact dups
    assert 110 in whole and 210 not in whole  # near-dup caught ACROSS batches
    assert 115 not in whole  # quality gate
    assert {100, 120, 130, 220, 230, 240} <= set(whole)
