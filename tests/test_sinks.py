"""Adapter-contract tests (dev-plan :1242-1269): batches carry
id/values/metadata; dimension mismatch blocks writes; transient failures
retry with backoff; delete-by-product uses the metadata filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig
from wc_vector_indexing_spark.operators.embed import DeterministicEmbedder
from wc_vector_indexing_spark.operators.indexer import build_index
from wc_vector_indexing_spark.sinks import (
    FileVectorSink,
    SinkError,
    delete_product_vectors,
    push_payloads,
)


@pytest.fixture()
def payloads(spark):
    from pyspark.sql import Row

    config = EngineConfig(
        model="fake-deterministic-64", chunking=ChunkingConfig(size=25, overlap=4)
    )
    products = spark.createDataFrame(
        [Row(product_id=i, text=f"Sink product {i}. " * 10) for i in range(1, 6)]
    )
    return build_index(products, config, DeterministicEmbedder(), text_col="text").cache()


def test_push_payloads_batches_and_shape(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    push_payloads(payloads, lambda: FileVectorSink(root, dimension=64), batch_size=10)
    rows = FileVectorSink(root).read_upserted()
    assert len(rows) == payloads.count()
    sample = rows[0]
    assert set(sample) == {"id", "values", "metadata"}  # adapter payload contract
    assert len(sample["values"]) == 64
    assert sample["metadata"]["site_id"] == 1 and "fingerprint" in sample["metadata"]
    assert sample["id"].startswith("site-1:product-")


def test_dimension_mismatch_blocks_writes(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    with pytest.raises(Exception) as ei:
        push_payloads(payloads, lambda: FileVectorSink(root, dimension=32), batch_size=10)
    assert "dimension mismatch" in str(ei.value)
    assert FileVectorSink(root).read_upserted() == []  # nothing half-written


def test_transient_failure_retries_then_succeeds(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    one = payloads.limit(3).coalesce(1)
    push_payloads(one, lambda: FileVectorSink(root, dimension=64, fail_first_n=2), batch_size=100)
    assert len(FileVectorSink(root).read_upserted()) == 3  # succeeded on attempt 3


def test_permanent_failure_raises(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    one = payloads.limit(1).coalesce(1)
    with pytest.raises(Exception):
        push_payloads(
            one, lambda: FileVectorSink(root, dimension=64, fail_first_n=99), batch_size=100
        )


def test_metadata_filter_deletes(tmp_path):
    sink = FileVectorSink(str(tmp_path / "sink"), dimension=64)
    delete_product_vectors(sink, site_id=1, product_id=42)
    dels = sink.read_deletes()
    assert dels == [{"filter": {"site_id": 1, "product_id": 42}}]


def test_sink_error_classification():
    assert SinkError("x", code=429).transient
    assert SinkError("x", code=503).transient
    assert not SinkError("x", code=400).transient
