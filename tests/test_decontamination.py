"""Eval-set decontamination (operators/decontamination.py): hit counts,
the drop filter, broadcast-side plan property, short-doc edges."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.decontamination import (
    bloom_contaminated,
    bloom_decontaminate,
    contamination_pairs,
    decontaminate,
)

EVAL = "the capital of france is paris and the capital of spain is madrid"
LEAK = "trivia dump: the capital of france is paris obviously, everyone knows"
CLEAN = "a completely unrelated training document about distributed joins"
SHORT = "two words"


def _dfs(spark):
    train = spark.createDataFrame(
        [Row(doc_id=10, text=LEAK), Row(doc_id=11, text=CLEAN), Row(doc_id=12, text=SHORT)]
    )
    evals = spark.createDataFrame([Row(doc_id=1, text=EVAL)])
    return train, evals


def test_pairs_and_hit_counts(spark):
    train, evals = _dfs(spark)
    pairs = contamination_pairs(train, evals, n=5).collect()
    assert [(p.train_id, p.eval_id) for p in pairs] == [(10, 1)]
    # shared distinct 5-grams between LEAK and EVAL:
    # 'the capital of france is', 'capital of france is paris'
    assert pairs[0].n_hits == 2


def test_decontaminate_drops_only_contaminated(spark):
    train, evals = _dfs(spark)
    kept = decontaminate(train, evals, n=5)
    assert sorted(r.doc_id for r in kept.collect()) == [11, 12]


def test_min_hits_threshold(spark):
    train, evals = _dfs(spark)
    assert contamination_pairs(train, evals, n=5, min_hits=3).count() == 0


def test_bloom_no_false_negatives(spark):
    # every exactly-contaminated doc must be bloom-positive (FNs are
    # structurally impossible: a true eval gram sets its own bits)
    train, evals = _dfs(spark)
    flagged = {r.train_id for r in bloom_contaminated(train, evals, n=5).collect()}
    assert 10 in flagged
    hits = {r.train_id: r.n_hits for r in bloom_contaminated(train, evals, n=5).collect()}
    # n_hits counts bloom-positive grams: >= the 2 exact shared grams
    assert hits[10] >= 2


def test_bloom_drop_is_superset_of_exact(spark):
    train, evals = _dfs(spark)
    exact_kept = {r.doc_id for r in decontaminate(train, evals, n=5).collect()}
    bloom_kept = {r.doc_id for r in bloom_decontaminate(train, evals, n=5).collect()}
    assert bloom_kept <= exact_kept


def test_bloom_clean_docs_survive_at_default_m(spark):
    # at m=2^20 bits and a handful of grams, FP probability is ~0 —
    # clean docs must pass
    train, evals = _dfs(spark)
    kept = sorted(r.doc_id for r in bloom_decontaminate(train, evals, n=5).collect())
    assert kept == [11, 12]


def test_bloom_tiny_filter_false_positives_never_miss(spark):
    # adversarially small filter (64 bits): everything may flag, but
    # the true contaminated doc still must
    train, evals = _dfs(spark)
    flagged = {
        r.train_id
        for r in bloom_contaminated(train, evals, n=5, m_bits=64).collect()
    }
    assert 10 in flagged


def test_eval_side_broadcasts(spark):
    train, evals = _dfs(spark)
    plan = (
        contamination_pairs(train, evals, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
