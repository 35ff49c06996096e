"""Corpus-wide line dedup (operators/linededup.py): first occurrence
survives, short lines exempt, reassembly order, all-removed edge."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.linededup import corpus_line_dedup

BOILER = "This cookie banner text is identical across every single page."
SHORT = "- item"


def test_first_occurrence_survives(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{BOILER}\nunique first body line with plenty of characters"),
            Row(doc_id=2, text=f"{BOILER}\nanother unique body line with plenty of characters"),
        ]
    )
    out = {r.doc_id: r for r in corpus_line_dedup(docs).collect()}
    assert out[1].text_clean.splitlines()[0] == BOILER  # first occurrence kept
    assert BOILER not in out[2].text_clean
    assert out[1].n_removed == 0 and out[2].n_removed == 1


def test_short_lines_exempt_and_order_preserved(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{SHORT}\naaaa bbbb cccc dddd eeee ffff gggg hhhh"),
            Row(doc_id=2, text=f"{SHORT}\nzzzz yyyy xxxx wwww vvvv uuuu tttt ssss\n{SHORT}"),
        ]
    )
    out = {r.doc_id: r for r in corpus_line_dedup(docs).collect()}
    # '- item' repeats in both docs (and twice in doc 2) but is short -> kept
    assert out[2].text_clean.splitlines() == [
        SHORT,
        "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss",
        SHORT,
    ]
    assert out[1].n_removed == 0 and out[2].n_removed == 0


def test_fully_boilerplate_doc_empties(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=BOILER), Row(doc_id=2, text=BOILER)]
    )
    out = {r.doc_id: r for r in corpus_line_dedup(docs).collect()}
    assert out[1].text_clean == BOILER
    assert out[2].text_clean == "" and out[2].n_removed == 1
