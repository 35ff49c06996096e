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


def test_window_duplication_fractions(spark):
    from wc_vector_indexing_spark.operators.linededup import window_duplication

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " unique1 tail1 end1"),
            Row(doc_id=2, text="prefix2 " + shared + " other2"),
            Row(doc_id=3, text="totally different words here nothing shared at all nine"),
            Row(doc_id=4, text="too short"),  # < 8 tokens: no windows
        ]
    )
    out = {r.doc_id: r for r in window_duplication(docs, window_tokens=8).collect()}
    # doc1: 11 tokens -> 4 windows; window[0] == shared 8-gram (also in doc2)
    assert out[1].n_windows == 4 and out[1].n_dup == 1
    assert out[1].dup_frac == round(1 / 4, 4)
    # doc2: 10 tokens -> 3 windows; window starting at token 2 is shared
    assert out[2].n_windows == 3 and out[2].n_dup == 1
    # doc3: nothing shared
    assert out[3].n_dup == 0 and out[3].dup_frac == 0.0
    # doc4 emits no windows at all
    assert 4 not in out


def test_window_duplication_within_doc_repeat_not_cross_doc(spark):
    """A window repeated INSIDE one doc only (min_docs=2 distinct docs)
    doesn't count as duplicated."""
    from wc_vector_indexing_spark.operators.linededup import window_duplication

    eight = "a b c d e f g h"
    docs = spark.createDataFrame([Row(doc_id=1, text=eight + " " + eight)])
    out = window_duplication(docs, window_tokens=8).head()
    assert out.n_dup == 0


def test_remove_duplicated_spans_first_occurrence_survives(spark):
    from wc_vector_indexing_spark.operators.linededup import remove_duplicated_spans

    span = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"{span} tail1 tail2"),
            (2, f"head1 head2 {span}"),  # duplicated span, later occurrence
            (3, "totally unrelated text with fewer than eight shared tokens"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, 8).collect()}
    assert out[1]["text_clean"] == f"{span} tail1 tail2"  # canonical copy intact
    assert out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "head1 head2"  # span excised
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0


def test_remove_duplicated_spans_overlap_merge(spark):
    from wc_vector_indexing_spark.operators.linededup import remove_duplicated_spans

    # doc 2 repeats a 10-token run of doc 1: three overlapping dup
    # windows merge into ONE 10-token removal, not 3x8 tokens
    run = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, f"{run} x y"), (2, f"p q {run} r s")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, 8).collect()}
    assert out[2]["text_clean"] == "p q r s"
    assert out[2]["n_removed"] == 10
    assert out[2]["n_dup_windows"] == 3  # starts 2,3,4 — covers [2, 12)


def test_remove_duplicated_spans_short_and_empty_docs(spark):
    from wc_vector_indexing_spark.operators.linededup import remove_duplicated_spans

    docs = spark.createDataFrame(
        [(1, "short doc"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, 8).collect()}
    assert out[1]["text_clean"] == "short doc" and out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "" and out[2]["n_tokens"] == 0
    assert out[3]["text_clean"] == "" and out[3]["n_tokens"] == 0


def test_remove_duplicated_spans_within_doc_repeat(spark):
    from wc_vector_indexing_spark.operators.linededup import remove_duplicated_spans

    # the same 8-token phrase twice INSIDE one doc: second copy removed
    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [(1, f"{span} mid {span}")], "doc_id long, text string"
    )
    r = remove_duplicated_spans(docs, 8).head()
    assert r["text_clean"] == f"{span} mid"
    assert r["n_removed"] == 8
