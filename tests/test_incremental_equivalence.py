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
