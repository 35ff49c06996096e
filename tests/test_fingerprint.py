"""Fingerprint canonicalization (dev-plan acceptance :867-870): same
inputs ⇒ same SHA; reordered selection ⇒ same SHA; changed chunking or
model ⇒ different SHA."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig, Selection, vector_id
from wc_vector_indexing_spark.functions.hashing import sha_chunk, sha_product


def cfg(**kw):
    return EngineConfig(model="fake-deterministic-64", **kw)


def test_selection_order_insensitive():
    a = Selection(core=["title", "sku", "description"], tax=["b", "a"], meta={"k2": "json", "k1": "text"})
    b = Selection(core=["description", "title", "sku"], tax=["a", "b"], meta={"k1": "text", "k2": "json"})
    assert a.canonical() == b.canonical()
    assert cfg(selection=a).fingerprint_payload_json() == cfg(selection=b).fingerprint_payload_json()


def test_selection_dedupe_case_insensitive():
    a = Selection(core=["Title", "title", "SKU"])
    assert a.canonical()["core"] == ["SKU", "Title"]


def test_chunking_change_changes_payload():
    p1 = cfg(chunking=ChunkingConfig(800, 100)).fingerprint_payload_json()
    p2 = cfg(chunking=ChunkingConfig(400, 100)).fingerprint_payload_json()
    assert p1 != p2


def test_model_change_changes_payload():
    p1 = EngineConfig(model="fake-deterministic-64").fingerprint_payload_json()
    p2 = EngineConfig(model="fake-deterministic-256").fingerprint_payload_json()
    assert p1 != p2


def test_sha_product_stable_and_sensitive(spark):
    df = spark.createDataFrame([Row(text="hello world"), Row(text="other text")])
    c1, c2 = cfg(), cfg()
    out1 = df.select(sha_product("text", c1).alias("s")).collect()
    out2 = df.select(sha_product("text", c2).alias("s")).collect()
    assert out1 == out2
    assert out1[0].s != out1[1].s
    assert len(out1[0].s) == 64 and all(ch in "0123456789abcdef" for ch in out1[0].s)


def test_sha_chunk_chain(spark):
    df = spark.createDataFrame([Row(psha="a" * 64, idx=0, text="chunk text")])
    one = df.select(sha_chunk("psha", "idx", "text").alias("s")).head().s
    import hashlib

    expected = hashlib.sha256(("a" * 64 + "\n0\nchunk text").encode()).hexdigest()
    assert one == expected


def test_vector_id_scheme():
    assert vector_id(1, 42, 3) == "site-1:product-42:chunk-3"
