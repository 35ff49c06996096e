"""Error isolation + dead-letter retry (W3/W8/T7/T8): a failing embed
batch marks only its chunks as error, other products sync, and the next
run with a healthy backend retries exactly the failed chunks."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig
from wc_vector_indexing_spark.operators.delta_sync import sync_products
from wc_vector_indexing_spark.operators.embed import (
    DeterministicEmbedder,
    DimensionMismatchError,
    embed_texts,
)
from wc_vector_indexing_spark.state.store import sync_state_store, vector_index_store


class FlakyBackend(DeterministicEmbedder):
    """Fails any batch containing the POISON marker (stands in for a
    transient 429/5xx on a real API)."""

    POISON = "POISON"

    def embed_batch(self, texts):
        if any(self.POISON in t for t in texts):
            raise RuntimeError("upstream 503")
        return super().embed_batch(texts)


def mk_products(spark):
    return spark.createDataFrame(
        [
            Row(product_id=1, text="healthy product one text."),
            Row(product_id=2, text="POISON pill in this product."),
            Row(product_id=3, text="healthy product three text."),
        ]
    )


@pytest.fixture()
def env(spark, tmp_path):
    config = EngineConfig(
        model="fake-deterministic-64",
        chunking=ChunkingConfig(size=25, overlap=4),
        embed_batch=1,  # isolate per-chunk so only the poison chunk fails
    )
    return (
        config,
        sync_state_store(spark, str(tmp_path / "state")),
        vector_index_store(spark, str(tmp_path / "index")),
    )


def test_embed_on_error_mark(spark):
    df = spark.createDataFrame([Row(chunk_text="ok"), Row(chunk_text="POISON")])
    out = embed_texts(df, backend=FlakyBackend(), batch_size=1, on_error="mark").collect()
    by_text = {r.chunk_text: r for r in out}
    assert by_text["ok"].embedding is not None and by_text["ok"].embed_error is None
    assert by_text["POISON"].embedding is None
    assert "upstream 503" in by_text["POISON"].embed_error


def test_embed_on_error_raise_default(spark):
    df = spark.createDataFrame([Row(chunk_text="POISON")])
    with pytest.raises(Exception):
        embed_texts(df, backend=FlakyBackend(), batch_size=1).collect()


def test_dimension_validation(spark):
    class WrongDim(DeterministicEmbedder):
        def embed_batch(self, texts):
            return [[0.0] * 3 for _ in texts]  # != configured 64

    df = spark.createDataFrame([Row(chunk_text="x")])
    out = embed_texts(df, backend=WrongDim(), on_error="mark").collect()
    assert "DimensionMismatchError" in out[0].embed_error


def test_error_isolation_and_retry(spark, env):
    config, state, index = env
    s1 = sync_products(
        mk_products(spark), state, index, config, FlakyBackend(), text_col="text"
    )["local"]
    assert s1.errored >= 1
    assert s1.upserted >= 2  # healthy products made it

    st = state.read()
    errs = st.filter(F.col("status") == "error").collect()
    assert errs and all(r.product_id == 2 for r in errs)
    assert all(r.chunk_sha is None and r.error_code == "embed_failed" for r in errs)
    assert index.read().filter("product_id = 2").count() == 0  # nothing half-written

    # retry with a healthy backend: ONLY the failed chunks re-embed
    s2 = sync_products(
        mk_products(spark), state, index, config, DeterministicEmbedder(), text_col="text"
    )["local"]
    assert s2.errored == 0
    assert s2.upserted == len(errs)  # exactly the dead-lettered chunks
    assert s2.skipped_products == 2  # healthy products short-circuit
    assert state.read().filter("status = 'error'").count() == 0
    assert index.read().filter("product_id = 2").count() > 0
