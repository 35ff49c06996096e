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
