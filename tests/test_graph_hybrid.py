"""Round-5 operators: transition-graph PageRank (operators/graph.py),
RRF fusion + MMR rerank (operators/retrieval.py), and embedding-space
decontamination (operators/decontamination.semantic_contamination).
Hand-computed goldens + a numpy reference fixpoint."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.decontamination import semantic_contamination
from wc_vector_indexing_spark.operators.graph import pagerank, transition_edges
from wc_vector_indexing_spark.operators.retrieval import mmr_rerank, rrf_fuse


# ----------------------------------------------------------------- graph

def _pr_ref(edges, iters=5, d=0.85):
    """Driver-side reference: same simplified formulation (dangling
    nodes drop their mass) as operators/graph.pagerank."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        for s, t, w in edges:
            nxt[idx[t]] += d * r[idx[s]] * w / outw[s]
        r = nxt
    return {v: round(float(r[idx[v]]), 6) for v in nodes}


def test_pagerank_cycle_is_uniform(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, weight double",
    )
    got = {r.node: r.rank for r in pagerank(e, iterations=5).collect()}
    assert got == {"a": pytest.approx(1 / 3), "b": pytest.approx(1 / 3), "c": pytest.approx(1 / 3)}


def test_pagerank_matches_reference_with_weights_and_dangling(spark):
    # c is dangling (no out-edges): its mass drops, per the documented
    # simplified formulation
    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0), ("d", "a", 1.0)]
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r.node: r.rank for r in pagerank(e, iterations=5).collect()}
    assert got == _pr_ref(edges)


def test_transition_edges_golden(spark):
    rows = [
        Row(user_id=1, ts=1, event_id=1, event_type="view"),
        Row(user_id=1, ts=2, event_id=2, event_type="click"),
        Row(user_id=1, ts=3, event_id=3, event_type="click"),
        Row(user_id=2, ts=1, event_id=4, event_type="view"),
        Row(user_id=2, ts=2, event_id=5, event_type="click"),
    ]
    got = {
        (r.src, r.dst): r.weight
        for r in transition_edges(spark.createDataFrame(rows)).collect()
    }
    assert got == {("view", "click"): 2.0, ("click", "click"): 1.0}


# ------------------------------------------------------------------- rrf

def test_rrf_fuse_golden(spark):
    bm = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    vec = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double"
    )
    rows = {r.doc_id: r for r in rrf_fuse([bm, vec], k=10).collect()}
    # doc 2: rank 2 lexically + rank 1 vectorially
    assert rows[2].rrf == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert rows[2].rank_0 == 2 and rows[2].rank_1 == 1
    # doc 4 appears only in the vector list: null lexical rank, no
    # phantom contribution
    assert rows[4].rank_0 is None
    assert rows[4].rrf == pytest.approx(round(1 / 62, 6))
    order = [r.doc_id for r in rrf_fuse([bm, vec], k=10).collect()]
    assert order[0] == 2  # present in both lists wins


def test_rrf_score_tie_breaks_by_id(spark):
    a = spark.createDataFrame([(5, 1.0), (3, 0.5)], "doc_id long, score double")
    b = spark.createDataFrame([(3, 1.0), (5, 0.5)], "doc_id long, score double")
    order = [r.doc_id for r in rrf_fuse([a, b], k=10).collect()]
    assert order == [3, 5]  # identical rrf; lower id first


# ------------------------------------------------------------------- mmr

def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_mmr_first_pick_is_most_relevant_and_lambda1_is_topk(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8))
    idx = _emb(spark, vecs)
    q = vecs[0].tolist()
    mmr = mmr_rerank(idx, q, k=5, fetch=20, lam=1.0).collect()
    # λ=1 removes the redundancy term: selection order == cosine top-k
    from wc_vector_indexing_spark.functions.vectors import cosine

    top = (
        idx.withColumn("c", cosine(F.lit(q), "embedding"))
        .orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert [r.vec_id for r in mmr] == [r.vec_id for r in top]
    assert mmr[0].position == 1 and mmr[0].relevance == max(r.relevance for r in mmr)


def test_mmr_penalizes_a_duplicate(spark):
    q = [1.0, 0.0, 0.0, 0.0]
    vecs = [
        [0.99, 0.1, 0.0, 0.0],   # 0: best match
        [0.99, 0.1, 0.0, 0.0],   # 1: exact duplicate of 0
        [0.6, 0.0, 0.8, 0.0],    # 2: decent match, different direction
    ]
    got = [r.vec_id for r in mmr_rerank(_emb(spark, vecs), q, k=2, fetch=3, lam=0.5).collect()]
    # pure top-k would pick the duplicate (ids 0, 1); MMR must not
    assert got == [0, 2]


def test_mmr_rejects_bad_lambda(spark):
    with pytest.raises(ValueError):
        mmr_rerank(_emb(spark, [[1.0, 0.0]]), [1.0, 0.0], lam=1.5)


# ---------------------------------------------------- semantic decontam

def test_semantic_contamination_golden_and_tiebreak(spark):
    evals = _emb(spark, [[1.0, 0.0], [0.0, 1.0]])           # ids 0, 1
    train = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),    # cos 1.0 with eval 0 AND... only 0
            (11, [0.7, 0.7]),    # cos ≈0.7071 with both → tie → eval 0
            (12, [-1.0, 0.0]),   # max cos 0.0 → below threshold
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.train_id: r for r in semantic_contamination(train, evals, 0.5).collect()}
    assert set(rows) == {10, 11}
    assert rows[10].eval_id == 0 and rows[10].max_cos == pytest.approx(1.0)
    assert rows[11].eval_id == 0  # exact tie resolves to the lowest eval id
    assert rows[11].max_cos == pytest.approx(0.7071)


def test_semantic_contamination_empty_eval_raises(spark):
    train = _emb(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError):
        semantic_contamination(train, train.filter("vec_id < 0"), 0.5)


def test_semantic_contamination_eval_bound(spark):
    train = _emb(spark, [[1.0, 0.0]] * 3)
    with pytest.raises(ValueError, match="max_eval_rows"):
        semantic_contamination(train, train, 0.5, max_eval_rows=2)


def test_pagerank_conserves_mass_without_dangling_nodes(spark):
    """With every node having out-edges, total rank is exactly the
    stationary total: Σ rank = 1 at every iteration count."""
    import itertools

    # strongly-connected random-ish weighted digraph, no dangling nodes
    nodes = list("abcdef")
    edges = [
        (a, b, float(1 + (i * 7 + j * 3) % 5))
        for i, a in enumerate(nodes)
        for j, b in enumerate(nodes)
        if a != b and (i + j) % 2 == 0
    ]
    assert {a for a, _, _ in edges} == set(nodes)
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    for iters in (1, 3, 7):
        total = sum(r.rank for r in pagerank(e, iterations=iters).collect())
        assert total == pytest.approx(1.0, abs=1e-4)


def test_semantic_contamination_zero_norm_guard(spark):
    """Regression (r5 advice): one all-zero eval embedding produced NaN
    similarities, argmax returned the NaN column, and NaN >= threshold
    filtered EVERYTHING out — a fail-open safety filter. Zero-norm
    vectors must score cos=0 and real contamination must still surface."""
    from pyspark.sql import Row

    train = spark.createDataFrame([
        Row(vec_id=1, embedding=[1.0, 0.0]),    # matches eval 10 exactly
        Row(vec_id=2, embedding=[0.0, 1.0]),    # orthogonal
        Row(vec_id=3, embedding=[0.0, 0.0]),    # zero-norm train row
    ])
    evals = spark.createDataFrame([
        Row(vec_id=10, embedding=[1.0, 0.0]),
        Row(vec_id=11, embedding=[0.0, 0.0]),   # zero-norm eval row
    ])
    got = {r.train_id: r for r in
           semantic_contamination(train, evals, threshold=0.9).collect()}
    assert set(got) == {1}
    assert got[1].eval_id == 10 and got[1].max_cos == pytest.approx(1.0)


def test_trustrank_seed_personalization(spark):
    """Trust concentrates on the seed and decays with distance; nodes
    unreachable from the seed converge to ~0 (vs uniform PageRank
    where every node keeps (1-d)/N of teleport mass)."""
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.graph import pagerank

    edges = spark.createDataFrame([
        Row(src="seed", dst="near", weight=1.0),
        Row(src="near", dst="far", weight=1.0),
        Row(src="island", dst="island2", weight=1.0),
    ])
    tr = {r.node: r.rank for r in pagerank(
        edges, iterations=8, seeds=["seed"]).collect()}
    assert tr["seed"] > tr["near"] > tr["far"] > 0
    assert tr["island"] == 0.0 and tr["island2"] == 0.0
    pr = {r.node: r.rank for r in pagerank(edges, iterations=8).collect()}
    assert pr["island2"] > 0  # uniform teleport keeps islands alive


def test_pagerank_distributed_path_matches_single_task(spark):
    # r14: the distributed iteration must stay rank-identical to the
    # single-task numpy fixpoint (the components-style forced-path
    # parity check — test_components.py does the same with
    # small_graph_edges=0). Covers the uniform and the seeded teleport,
    # and a NULL endpoint, which both paths now drop up front.
    edges = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0), ("d", "a", 1.0),
        ("c", "d", 1.0), ("e", "a", 2.0), (None, "a", 9.0), ("b", None, 9.0),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    for seeds in (None, ["a", "d"]):
        single = {
            r.node: r.rank
            for r in pagerank(e, iterations=6, seeds=seeds).collect()
        }
        dist = {
            r.node: r.rank
            for r in pagerank(
                e, iterations=6, seeds=seeds, small_graph_edges=0
            ).collect()
        }
        assert dist == single, seeds


def test_pagerank_distributed_single_edge_checkpoint(spark):
    # the big-graph path materializes the edge table ONCE: the
    # normalized-edge subtree must scan the checkpointed frame, not a
    # second checkpoint of its own (r13 verdict item 3) — with rounds
    # uncheckpointed, the per-round plan shows the outw aggregate and
    # the normalization join over ExistingRDD scans
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], "src string, dst string, weight double"
    )
    out = pagerank(e, iterations=2, small_graph_edges=0, checkpoint_rounds=False)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "HashAggregate" in plan and "Scan ExistingRDD" in plan
    assert "FlatMapGroupsInPandas" not in plan  # really the distributed path
