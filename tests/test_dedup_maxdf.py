"""ngram_jaccard_pairs: grouped pair generation and the hot-shingle
document-frequency cap (SCALE.md skew mitigation)."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.dedup import ngram_jaccard_pairs

BOILER = "standard legal footer applies to every document here"


def mk(spark):
    # docs 1/2 near-identical; 3 unrelated; ALL share the boilerplate tail
    rows = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta " + BOILER),
        Row(doc_id=2, text="alpha beta gamma delta epsilon eta " + BOILER),
        Row(doc_id=3, text="one two three four five six seven eight " + BOILER),
    ]
    return spark.createDataFrame(rows)


def test_pairs_without_cap(spark):
    out = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(mk(spark), threshold=0.1).collect()}
    assert (1, 2) in out
    # boilerplate alone links 3 to the others above jaccard 0.1? compute:
    # shared shingles are only the footer k-grams — low but present
    for pair, j in out.items():
        assert 0 < j <= 1


def test_max_df_drops_boilerplate_links(spark):
    """With df cap 2, shingles present in all 3 docs are dropped: doc 3
    shares nothing else, so only the true near-dup pair remains."""
    out = ngram_jaccard_pairs(mk(spark), threshold=0.01, max_df=2).collect()
    assert {(r.doc_a, r.doc_b) for r in out} == {(1, 2)}


def test_two_doc_posting_list(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text="w x y z w x y z"),
            Row(doc_id=20, text="w x y z w x y z"),
        ]
    )
    out = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert len(out) == 1 and out[0].jaccard == 1.0


def test_short_docs_produce_no_shingles(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="too short"), Row(doc_id=2, text="too short")]
    )
    assert ngram_jaccard_pairs(docs, k=4).count() == 0


def test_containment_catches_snippet_reuse(spark):
    from wc_vector_indexing_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    snippet = "the quick brown fox jumps over the lazy dog"
    long_doc = (
        "totally unrelated preamble text goes here for a while now . "
        + snippet
        + " and then much more unrelated trailing content follows "
        + "with plenty of additional filler words to dilute the union"
    )
    df = spark.createDataFrame(
        [(1, snippet), (2, long_doc)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(df, k=4, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0
    # jaccard misses the same pair at any moderate threshold: the union
    # is dominated by the long doc
    jac = ngram_jaccard_pairs(df, k=4, threshold=0.5).collect()
    assert jac == []


def test_containment_dominates_jaccard(spark):
    """Invariant: for every pair, containment >= jaccard (min(na,nb) <=
    na+nb-shared always). Seeded random corpus, threshold 0 on both."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 40))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from wc_vector_indexing_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, k=3, threshold=0.0).collect()
    }
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(df, k=3, threshold=0.0).collect()
    }
    assert set(jac) == set(cont) and jac  # same candidate pairs, non-empty
    for pair, j in jac.items():
        assert cont[pair] >= j - 1e-9, pair
        assert 0.0 <= cont[pair] <= 1.0
