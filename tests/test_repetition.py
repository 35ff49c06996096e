"""Gopher-style repetition signals (operators/repetition.py): metrics
verified against hand-computed values, zero-fill edge cases, and the
threshold filter."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from wc_vector_indexing_spark.operators.repetition import (
    repetition_filter,
    repetition_signals,
)

REPEATY = "a b a b c\na b a b c\nx"  # 2 dup lines; "a b a b c" 5-gram twice
CLEAN = "unique words only here"
EMPTY = ""


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text=REPEATY), Row(doc_id=2, text=CLEAN), Row(doc_id=3, text=EMPTY)]
    )


def test_signals_hand_computed(spark, docs):
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}

    r1 = rows[1]
    # lines: ['a b a b c', 'a b a b c', 'x'] -> 3 total, 2 distinct
    assert r1.n_lines == 3
    assert r1.dup_line_frac == round((3 - 2) / 3, 4)
    # dup line chars: (2-1)*9 over 2*9 + 1*1 = 19
    assert r1.dup_line_char_frac == round(9 / 19, 4)
    # 21 chars; best 2-gram is 'a b' x4, 3 chars -> 12/21
    assert r1.top_2gram_char_frac == round(12 / 21, 4)
    # 5-gram 'a b a b c' twice -> (2-1)*9 / 21
    assert r1.dup_5gram_char_frac == round(9 / 21, 4)

    r2 = rows[2]
    assert r2.n_lines == 1
    assert r2.dup_line_frac == 0.0 and r2.dup_line_char_frac == 0.0
    # no repetition but the max-coverage 2-gram is 'unique words' (12/22)
    assert r2.top_2gram_char_frac == round(12 / 22, 4)
    assert r2.dup_5gram_char_frac == 0.0

    r3 = rows[3]  # empty text: one empty line, all ratios zero-filled
    assert r3.n_lines == 1
    assert (
        r3.dup_line_frac,
        r3.dup_line_char_frac,
        r3.top_2gram_char_frac,
        r3.dup_5gram_char_frac,
    ) == (0.0, 0.0, 0.0, 0.0)


def test_filter_drops_repetitive(spark, docs):
    # REPEATY exceeds every default threshold; CLEAN fails top_2gram on a
    # tiny doc (the metric is noisy under ~20 tokens, like the paper's),
    # so gate only on the line/dup-gram signals here
    kept = repetition_filter(
        docs,
        thresholds={"top_2gram_char_frac": 1.0},
    )
    assert {r.doc_id for r in kept.collect()} == {2, 3}


def test_no_python_in_plan(spark, docs):
    plan = repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
