"""Eval-set decontamination (operators/decontamination.py): hit counts,
the drop filter, broadcast-side plan property, short-doc edges."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.decontamination import (
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


def test_eval_side_broadcasts(spark):
    train, evals = _dfs(spark)
    plan = (
        contamination_pairs(train, evals, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
