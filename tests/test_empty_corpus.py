"""Degenerate-input robustness: every pipeline operator must return an
empty (not crashing, not null-row) result on an empty corpus — the
first micro-batch of a new ingest IS an empty corpus."""

import pytest
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators import dedup, textstats
from wc_vector_indexing_spark.operators.curation import (
    CurationConfig,
    curate,
    curation_report,
)


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_dedup_family_empty(empty):
    assert dedup.minhash_lsh_pairs(empty).count() == 0
    assert dedup.ngram_jaccard_pairs(empty, k=4, threshold=0.2).count() == 0
    assert dedup.ngram_containment_pairs(empty, k=4).count() == 0
    assert dedup.simhash64(empty).count() == 0
    assert dedup.exact_duplicates(empty).count() == 0


def test_textstats_empty(empty):
    assert textstats.text_quality(empty).count() == 0
    assert textstats.lang_id(empty).count() == 0
    assert textstats.script_mix(empty).count() == 0


def test_curation_empty(empty):
    res = curate(empty, CurationConfig())
    rep = curation_report(empty, res.audit)
    res.unpersist()
    rows = {r.reject_reason: r.n for r in rep.collect()}
    assert rows == {"kept": 0}


def test_importance_empty(empty, spark):
    from wc_vector_indexing_spark.operators.importance import (
        fit_importance_model,
        importance_score_col,
        importance_weights,
    )

    assert importance_weights(empty, F.col("source") == "x").count() == 0
    model = fit_importance_model(empty, F.col("source") == "x")
    assert model.default == 0.0 and model.log_ratio == {}
    scored = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    assert scored.select(importance_score_col(model).alias("w")).head().w == 0.0


def test_single_megadoc_skew_bound(spark):
    """SCALE.md claims per-doc operators bound skew by the largest
    single document — prove one 200k-token doc flows through the
    doc-local operators without corpus-shaped blowups."""
    from wc_vector_indexing_spark.operators.chunker import chunk_documents
    from wc_vector_indexing_spark.operators.repetition import repetition_signals

    big = ("lorem ipsum dolor sit amet " * 40_000).strip()  # 200k tokens
    docs = spark.createDataFrame(
        [(1, big), (2, "tiny doc here")], "doc_id long, text string"
    )
    sig = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert sig[1].dup_5gram_char_frac > 0.9  # a loop IS repetition
    assert sig[2].dup_5gram_char_frac == 0.0
    fp = dedup.simhash64(docs).collect()
    assert len(fp) == 2 and len({r.simhash for r in fp}) == 2
    chunks = chunk_documents(docs, size=800, overlap=100)
    n = chunks.filter(chunks.doc_id == 1).count()
    assert n > 200  # ~250 chunks of ~3200 chars from ~1.04M chars


def test_round5_operators_empty(empty, spark):
    from wc_vector_indexing_spark.operators.graph import pagerank, transition_edges
    from wc_vector_indexing_spark.operators.outliers import embedding_outliers
    from wc_vector_indexing_spark.operators.profile import corpus_drift
    from wc_vector_indexing_spark.operators.similarity import hard_negatives
    from wc_vector_indexing_spark.operators.textstats import token_fertility
    from wc_vector_indexing_spark.operators.unicode_clean import unicode_clean

    empty_events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    edges = transition_edges(empty_events)
    assert edges.count() == 0
    assert pagerank(edges).count() == 0  # empty graph, no div-by-zero
    assert token_fertility(empty).count() == 0
    assert corpus_drift(empty).count() == 0
    assert unicode_clean(empty).count() == 0
    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert embedding_outliers(empty_emb).count() == 0
    assert hard_negatives(empty_emb, empty_emb, k=3).count() == 0
