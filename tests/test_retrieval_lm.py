"""BM25 retrieval (operators/retrieval.py) and interpolated bigram LM
scoring (operators/lm_score.bigram_*): hand-computed goldens, ranking
properties, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from wc_vector_indexing_spark.operators.lm_score import (
    bigram_model,
    bigram_score,
    unigram_score,
)
from wc_vector_indexing_spark.operators.retrieval import bm25_index, bm25_search

DOCS = [
    Row(doc_id=1, text="spark shuffle join spark spark"),
    Row(doc_id=2, text="spark join"),
    Row(doc_id=3, text="window sort limit window"),
    Row(doc_id=4, text="join join join join join join"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS)


def _bm25_ref(query_terms, k1=1.2, b=0.75):
    """Driver-side reference implementation over DOCS."""
    toks = {r.doc_id: r.text.split() for r in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in query_terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                dl = len(t)
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl / avgdl)
                )
    return {d: round(s, 4) for d, s in scores.items()}


def test_bm25_golden_scores(spark):
    got = {r.doc_id: r.score for r in bm25_search(_docs(spark), "spark join", k=10).collect()}
    assert got == _bm25_ref(["spark", "join"])


def test_bm25_ranking_order_is_total(spark):
    rows = bm25_search(_docs(spark), "spark join", k=10).collect()
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_bm25_term_saturation(spark):
    # doc 4 has 6x 'join' but BM25 saturates tf: it must NOT score 6x
    # doc 2's single 'join'
    got = {r.doc_id: r.score for r in bm25_search(_docs(spark), "join", k=10).collect()}
    assert got[4] < 3 * got[2]
    assert got[4] > got[2]  # but more is still more


def test_bm25_prebuilt_index_matches_inline(spark):
    docs = _docs(spark)
    idx = bm25_index(docs)
    a = {(r.doc_id, r.score) for r in bm25_search(docs, "spark join", k=10).collect()}
    b = {
        (r.doc_id, r.score)
        for r in bm25_search(docs, "spark join", k=10, index=idx).collect()
    }
    assert a == b


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_search(_docs(spark), "!!! 123", k=5)


def test_bm25_unseen_terms_ignored(spark):
    got = {r.doc_id for r in bm25_search(_docs(spark), "spark zzz", k=10).collect()}
    assert got == {1, 2}


def test_bm25_topk_plan_is_take_ordered(spark):
    plan = (
        bm25_search(_docs(spark), "spark", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bigram_model_golden(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b a b a c")])
    m = {(r.prev, r.tok): r.logp_cond for r in bigram_model(docs).collect()}
    # counts: (a,b)=2 (a,c)=1 (b,a)=2 ; c(a)=3, c(b)=2
    assert m[("a", "b")] == pytest.approx(math.log(2 / 3))
    assert m[("a", "c")] == pytest.approx(math.log(1 / 3))
    assert m[("b", "a")] == pytest.approx(math.log(2 / 2))
    assert set(m) == {("a", "b"), ("a", "c"), ("b", "a")}


def test_bigram_score_golden(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b a b")])
    lam = 0.7
    # tokens: a b a b -> bigrams (a,b),(b,a),(a,b)
    # c2: (a,b)=2, (b,a)=1; c1: a=2 b=2; N=4
    def p(c2, c1prev, c1tok):
        return lam * c2 / c1prev + (1 - lam) * c1tok / 4
    exp = -(2 * math.log(p(2, 2, 2)) + math.log(p(1, 2, 2))) / 3
    row = bigram_score(docs, lam=lam).collect()[0]
    assert row.n_scored == 3
    assert row.avg_neg_logp == pytest.approx(round(exp, 4))


def test_bigram_catches_scrambled_text(spark):
    # same unigram distribution, destroyed word order: unigram scoring
    # ties, bigram scoring must separate
    natural = "the cat sat on the mat and the dog sat on the rug"
    toks = natural.split()
    scrambled = " ".join(toks[::2] + toks[1::2])
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=natural), Row(doc_id=2, text=natural),
         Row(doc_id=3, text=scrambled)]
    )
    uni = {r.doc_id: r.avg_neg_logp for r in unigram_score(docs).collect()}
    assert uni[1] == uni[3]  # unigram is blind to order
    bi = {r.doc_id: r.avg_neg_logp for r in bigram_score(docs).collect()}
    assert bi[3] > bi[1]  # bigram is not


def test_bigram_single_token_doc_drops_out(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="solo"), Row(doc_id=2, text="two words here")]
    )
    got = {r.doc_id for r in bigram_score(docs).collect()}
    assert got == {2}


def test_collocations_golden(spark):
    from wc_vector_indexing_spark.operators.lm_score import collocations

    # "new york" always adjacent; "the" everywhere -> high PMI for the
    # phrase, low for function-word pairs
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="the mayor of new york spoke to the press in new york today")
            for i in range(5)
        ]
    )
    rows = collocations(docs, min_count=5, k=20).collect()
    got = {(r.prev, r.tok): (r.c2, r.pmi) for r in rows}
    # 13 tokens/doc x 5 docs: N=65. "new york": c2=10, c(new)=c(york)=10
    # -> pmi = ln(65*10/100) = ln(6.5). Once-per-doc pairs of unique
    # words (c2=5, c1=c1=5) score ln(13) — rarer pairs legitimately
    # outrank the frequent phrase under plain PMI.
    assert got[("new", "york")] == (10, round(math.log(6.5), 4))
    assert rows[0].pmi == round(math.log(13.0), 4)
    # function-word pair scores strictly lower than the phrase:
    # ("in", "new"): c2=5, c(in)=5, c(new)=10 -> ln(6.5); equal — but
    # ("the", "press") with c(the)=10: ln(65*5/50) = ln(6.5) too; the
    # discriminating case is any pair with both words frequent:
    # none here, so just pin the ordering is total
    keys = [(-r.pmi, r.prev, r.tok) for r in rows]
    assert keys == sorted(keys)


def test_collocations_min_count_floor(spark):
    from wc_vector_indexing_spark.operators.lm_score import collocations

    docs = spark.createDataFrame([Row(doc_id=1, text="rare pair rare pair")])
    assert collocations(docs, min_count=5, k=10).count() == 0
    assert collocations(docs, min_count=2, k=10).count() > 0


def test_bm25_anchor_boost_changes_ranking(spark):
    """A body-weak doc with query-matching incoming anchors must
    overtake a body-only match; docs missing a zone still score."""
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.retrieval import (
        bm25_anchor_search,
        bm25_search,
    )

    docs = spark.createDataFrame([
        Row(doc_id=1, text="vector search engine with vector index"),
        Row(doc_id=2, text="a page about gardening and soil"),
        Row(doc_id=3, text="cooking with cast iron pans"),
    ])
    anchors = spark.createDataFrame([
        Row(doc_id=2, anchor="vector database guide"),
        Row(doc_id=2, anchor="the best vector index"),
        Row(doc_id=3, anchor="banana bread recipe"),
    ])
    plain = [r.doc_id for r in bm25_search(docs, "vector", k=3).collect()]
    assert plain == [1]  # only doc 1's body matches
    boosted = bm25_anchor_search(
        docs, anchors, "vector", k=3, w_anchor=5.0)
    rows = {r.doc_id: r.score for r in boosted.collect()}
    assert set(rows) == {1, 2}  # doc 2 enters via the anchor zone
    assert rows[2] > rows[1]    # heavy anchor weight overtakes body
    # body-favouring weights keep doc 1 first
    mild = [r.doc_id for r in bm25_anchor_search(
        docs, anchors, "vector", k=3, w_anchor=0.1).collect()]
    assert mild[0] == 1


def test_retrieval_metrics_trec_definitions(spark):
    import math

    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.retrieval import (
        retrieval_metrics,
    )

    results = spark.createDataFrame([
        # q1: relevant docs at ranks 2 and 4; one relevant missed
        Row(query_id=1, doc_id=10, rank=1),
        Row(query_id=1, doc_id=11, rank=2),
        Row(query_id=1, doc_id=12, rank=3),
        Row(query_id=1, doc_id=13, rank=4),
        # q2: nothing relevant retrieved
        Row(query_id=2, doc_id=20, rank=1),
    ])
    qrels = spark.createDataFrame([
        Row(query_id=1, doc_id=11, rel=2),
        Row(query_id=1, doc_id=13, rel=1),
        Row(query_id=1, doc_id=99, rel=3),  # never retrieved
        Row(query_id=2, doc_id=21, rel=1),
        Row(query_id=3, doc_id=30, rel=1),  # query with no results
    ])
    got = {r.query_id: r for r in retrieval_metrics(
        results, qrels, k=10).collect()}
    q1 = got[1]
    assert q1.recall_at_k == round(2 / 3, 4)
    assert q1.mrr == 0.5  # first relevant at rank 2
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(5)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert q1.ndcg == round(dcg / idcg, 4)
    assert got[2].recall_at_k == 0.0 and got[2].mrr == 0.0 \
        and got[2].ndcg == 0.0
    # q3 has qrels but no results: present with zero metrics
    assert got[3].n_retrieved == 0 and got[3].recall_at_k == 0.0


def test_bm25_anchor_zero_token_anchor_does_not_shift_stats(spark):
    """An anchor that tokenizes to nothing (digits/punctuation-only —
    _tokens keeps [a-z] runs) has no rows in bm25_index, so it must not
    count toward the anchor zone's n_docs/avgdl: adding one must leave
    every score byte-identical (r13 ADVICE — a_stats lacked the
    _dl > 0 filter body_stats has)."""
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.retrieval import bm25_anchor_search

    docs = spark.createDataFrame([
        Row(doc_id=1, text="vector search engine with vector index"),
        Row(doc_id=2, text="a page about gardening and soil"),
        Row(doc_id=3, text="cooking with cast iron pans"),
    ])
    anchors = spark.createDataFrame([
        Row(doc_id=2, anchor="vector database guide"),
        Row(doc_id=3, anchor="banana bread recipe"),
    ])
    polluted = anchors.unionByName(spark.createDataFrame(
        [Row(doc_id=1, anchor="123 456 !!!")]
    ))
    clean = {(r.doc_id, r.score) for r in
             bm25_anchor_search(docs, anchors, "vector", k=3).collect()}
    with_zero = {(r.doc_id, r.score) for r in
                 bm25_anchor_search(docs, polluted, "vector", k=3).collect()}
    assert clean == with_zero
