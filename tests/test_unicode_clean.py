"""Unicode hygiene (operators/unicode_clean.py): NFC composition,
zero-width/control stripping, and the conservative mojibake repair the
oracle can't express."""

from __future__ import annotations

import unicodedata

from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.unicode_clean import (
    fix_mojibake_col,
    nfc_normalize_col,
    strip_invisible_col,
    unicode_clean,
)


def _one(spark, text, col):
    df = spark.createDataFrame([Row(text=text)])
    return df.select(col.alias("out")).head().out


def test_nfc_composes_combining_sequences(spark):
    decomposed = "café"  # e + combining acute
    out = _one(spark, decomposed, nfc_normalize_col("text"))
    assert out == "caf\u00e9" and len(out) == 4
    assert unicodedata.is_normalized("NFC", out)


def test_strip_invisible_and_controls_keeps_tab_newline(spark):
    dirty = "a\u200bb\u200c\u200d\ufeffc\x00\x07d\te\nf"
    assert _one(spark, dirty, strip_invisible_col("text")) == "abcd\te\nf"


def test_mojibake_repair_and_conservatism(spark):
    # "é" UTF-8 bytes read as Latin-1 → "Ã©"
    assert _one(spark, "caf\u00c3\u00a9", fix_mojibake_col("text")) == "caf\u00e9"
    # text with Ã that does NOT round-trip as UTF-8 survives unchanged
    weird = "\u00c3 nothing else"
    assert _one(spark, weird, fix_mojibake_col("text")) == weird
    # plain ASCII short-circuits untouched
    assert _one(spark, "plain", fix_mojibake_col("text")) == "plain"


def test_unicode_clean_flag_and_idempotence(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="café​ tail"),
            Row(doc_id=2, text="caf\u00c3\u00a9 corner"),
            Row(doc_id=3, text="already clean"),
        ]
    )
    out = {r.doc_id: r for r in unicode_clean(docs).collect()}
    assert out[1].text == "caf\u00e9 tail" and out[1].was_dirty
    assert out[2].text == "caf\u00e9 corner" and out[2].was_dirty
    assert out[3].text == "already clean" and not out[3].was_dirty
    # idempotent: cleaning the cleaned frame changes nothing
    again = unicode_clean(
        spark.createDataFrame([Row(doc_id=k, text=v.text) for k, v in out.items()])
    )
    assert not any(r.was_dirty for r in again.collect())


def test_strip_invisible_is_pure_codegen(spark):
    df = spark.createDataFrame([Row(text="x")]).select(
        strip_invisible_col("text").alias("out")
    )
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # no python evaluation operator — the local-relation scan's
    # "applySchemaToPythonRDD" provenance string doesn't count
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "regexp_replace" in plan
