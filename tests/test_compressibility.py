"""Compression-ratio quality signal (operators/compressibility.py):
golden equality vs driver-side zlib, gate behavior, signal direction,
plan shape (map-only)."""

from __future__ import annotations

import zlib

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.compressibility import (
    ZLIB_LEVEL,
    compressibility_gate,
    compression_ratio,
)

BOILER = "spam spam spam spam " * 50
NATURAL = (
    "distributed joins shuffle rows between executors according to the "
    "partitioning of the join keys, and broadcast joins avoid that cost "
    "entirely when one side fits in memory on every node"
)


def test_golden_against_driver_zlib(spark):
    rows = [Row(doc_id=1, text=BOILER), Row(doc_id=2, text=NATURAL), Row(doc_id=3, text="x")]
    got = {
        r.doc_id: (r.n_bytes, r.n_deflate)
        for r in compression_ratio(spark.createDataFrame(rows)).collect()
    }
    for r in rows:
        raw = r.text.encode("utf-8")
        assert got[r.doc_id] == (len(raw), len(zlib.compress(raw, ZLIB_LEVEL)))


def test_boilerplate_compresses_harder_than_natural_text(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=BOILER), Row(doc_id=2, text=NATURAL)])
    got = {r.doc_id: r.ratio for r in compression_ratio(df).collect()}
    assert got[1] < 0.15 < got[2]


def test_gate_drops_both_tails(spark):
    import random

    rng = random.Random(7)
    # random codepoints are near-incompressible (~0.81 deflate ratio)
    noise = "".join(chr(rng.randint(0x21, 0x10FF)) for _ in range(400))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=BOILER), Row(doc_id=2, text=NATURAL * 3), Row(doc_id=3, text=noise)]
    )
    kept = [r.doc_id for r in compressibility_gate(df, min_ratio=0.25, max_ratio=0.75).collect()]
    assert kept == [2]


def test_map_only_plan(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=NATURAL)])
    plan = compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the zlib UDF is Arrow-batched


def test_empty_text_ratio_defined(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="")])
    r = compression_ratio(df).collect()[0]
    assert r.n_bytes == 0 and r.ratio is not None
