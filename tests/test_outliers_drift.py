"""Round-5 batch 2: hard-negative mining (similarity.hard_negatives),
token fertility (textstats.token_fertility), corpus drift
(profile.corpus_drift), and centroid outliers (operators/outliers.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row

from wc_vector_indexing_spark.operators.outliers import (
    embedding_outliers,
    label_centroids,
)
from wc_vector_indexing_spark.operators.profile import corpus_drift
from wc_vector_indexing_spark.operators.similarity import hard_negatives
from wc_vector_indexing_spark.operators.textstats import token_fertility


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(l)) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )


# -------------------------------------------------------- hard negatives

def test_hard_negatives_excludes_own_label_and_ranks(spark):
    idx = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.14], 0),   # same label as query: must be masked
            (2, [0.9, 0.44], 1),    # best allowed negative
            (3, [0.0, 1.0], 1),
            (4, [-1.0, 0.0], 2),
        ],
    )
    q = idx.filter("vec_id = 0")
    got = hard_negatives(q, idx, k=2).collect()
    assert [(r.neighbor_id, r.rank) for r in got] == [(2, 1), (3, 2)]
    assert all(r.query_id == 0 for r in got)


def test_hard_negatives_probe_bound(spark):
    idx = _emb(spark, [(i, [1.0, 0.0], 0) for i in range(5)])
    with pytest.raises(ValueError, match="max_probe_rows"):
        hard_negatives(idx, idx, k=1, max_probe_rows=2)


def test_hard_negatives_merge_exact_across_partitions(spark):
    # 40 index rows spread over many partitions: the windowed merge of
    # per-partition top-k must equal a driver-side brute force
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 6))
    labels = [i % 3 for i in range(40)]
    idx = _emb(spark, [(i, vecs[i], labels[i]) for i in range(40)]).repartition(8)
    q = _emb(spark, [(100, vecs[0], 0)])
    got = [(r.neighbor_id, r.rank) for r in hard_negatives(q, idx, k=4).collect()]
    qn = vecs[0] / np.linalg.norm(vecs[0])
    sims = [
        (i, float((vecs[i] / np.linalg.norm(vecs[i])) @ qn))
        for i in range(40)
        if labels[i] != 0
    ]
    sims.sort(key=lambda t: (-t[1], t[0]))
    assert got == [(i, r + 1) for r, (i, _) in enumerate(sims[:4])]


# ------------------------------------------------------------- fertility

def test_token_fertility_golden(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="aa bb"),        # 2 toks, 5 chars
            Row(doc_id=2, lang="en", text="cccc"),         # 1 tok, 4 chars
            Row(doc_id=3, lang="de", text="dd ee ff"),     # 3 toks, 8 chars
        ]
    )
    got = {r.lang: r for r in token_fertility(docs).collect()}
    assert got["en"].n_docs == 2 and got["en"].n_tokens == 3 and got["en"].n_chars == 9
    assert got["en"].chars_per_token == 3.0
    assert got["de"].chars_per_token == round(8 / 3, 4)


# ----------------------------------------------------------------- drift

def test_corpus_drift_zero_for_identical_slices_and_positive_else(spark):
    same = spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i%2}", text="alpha beta gamma") for i in range(6)]
    )
    got = {r.source: r.kl_nats for r in corpus_drift(same).collect()}
    assert got == {"s0": 0.0, "s1": 0.0}  # identical distributions → KL 0

    skewed = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="x x x y"),
            Row(doc_id=2, source="b", text="y y y z"),
        ]
    )
    drift = {r.source: r.kl_nats for r in corpus_drift(skewed).collect()}
    assert drift["a"] > 0 and drift["b"] > 0
    # hand-check source a: p_a = {x:3/4, y:1/4}; p = {x:3/8, y:4/8, z:1/8}
    want_a = 0.75 * math.log(0.75 / 0.375) + 0.25 * math.log(0.25 / 0.5)
    assert drift["a"] == pytest.approx(round(want_a, 4))


# -------------------------------------------------------------- outliers

def test_label_centroids_golden(spark):
    emb = _emb(spark, [(0, [1.0, 3.0], 0), (1, [3.0, 5.0], 0), (2, [0.0, 2.0], 1)])
    got = {r.label: r.centroid for r in label_centroids(emb).collect()}
    assert got[0] == [2.0, 4.0] and got[1] == [0.0, 2.0]


def test_embedding_outliers_flags_the_planted_point(spark):
    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(0, 0.1, 4) + [1, 0, 0, 0], 0) for i in range(30)]
    rows += [(i, rng.normal(0, 0.1, 4) + [0, 1, 0, 0], 1) for i in range(30, 60)]
    rows.append((99, [5.0, 5.0, 5.0, 5.0], 0))  # planted outlier in label 0
    out = embedding_outliers(_emb(spark, rows), k=3).collect()
    assert out[0].vec_id == 99 and out[0].label == 0
    assert out[0].z > out[1].z  # strictly the most extreme
    # ordering is (z desc, id asc) and z matches dist z-scored per label
    zs = [r.z for r in out]
    assert zs == sorted(zs, reverse=True)


# ------------------------------------------------- topics / readability

def test_topic_tagging_dominant_and_ties(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.textstats import topic_tagging

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="price order data"),        # commerce 2, tech 1
            Row(doc_id=2, text="data system game team game"),  # tech 2, sports 3
            Row(doc_id=3, text="nothing matching here"),
            Row(doc_id=4, text="price data"),              # tie 1-1 → first in seed order
        ]
    )
    got = {r.doc_id: r for r in topic_tagging(docs).collect()}
    assert got[1].topic == "commerce" and got[1].n_commerce == 2
    assert got[2].topic == "sports"
    assert got[3].topic == "other"
    assert got[4].topic == "commerce"  # tie breaks to seed-dict order


def test_readability_golden(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.textstats import readability

    # 4 words, 2 sentences, syllable groups: the(1) cat(1) sat(1) down(1)
    r = readability(
        spark.createDataFrame([Row(doc_id=1, text="The cat sat. Down!")])
    ).head()
    assert (r.n_words, r.n_sentences, r.n_syllables) == (4, 2, 4)
    assert r.flesch == round(206.835 - 1.015 * (4 / 2) - 84.6 * (4 / 4), 4)
