"""Generalized as-of join / sessionization + IVF ANN recall."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.ivf import IVFIndex
from wc_vector_indexing_spark.operators.relational import asof_join, session_stats, sessionize
from wc_vector_indexing_spark.operators.similarity import knn_exact
from wc_vector_indexing_spark.sources.readers import load

T0 = datetime(2025, 6, 1, 12, 0, 0)


def test_asof_join_backward(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", ts=T0, px=10.0),
            Row(sym="A", ts=T0 + timedelta(seconds=30), px=11.0),
            Row(sym="B", ts=T0 + timedelta(seconds=10), px=5.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts=T0 + timedelta(seconds=5), qty=100),
            Row(sym="A", ts=T0 + timedelta(seconds=30), qty=200),  # tie → inclusive
            Row(sym="B", ts=T0 + timedelta(seconds=5), qty=300),  # before any quote
        ]
    )
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts").collect()
    by_qty = {r.qty: r.px_right for r in out}
    assert by_qty[100] == 10.0  # latest quote at or before t+5
    assert by_qty[200] == 11.0  # tie is inclusive
    assert by_qty[300] is None  # no earlier quote → NULL (left join)


def test_asof_join_forward(spark):
    left = spark.createDataFrame([Row(k="x", ts=T0, v=1)])
    right = spark.createDataFrame(
        [Row(k="x", ts=T0 - timedelta(seconds=5), w=1), Row(k="x", ts=T0 + timedelta(seconds=7), w=2)]
    )
    out = asof_join(left, right, on="k", direction="forward").collect()
    assert out[0].w_right == 2  # least ts >= T0


def test_sessionize_gap(spark):
    rows = [
        Row(user_id=1, ts=T0, event_id=1),
        Row(user_id=1, ts=T0 + timedelta(minutes=10), event_id=2),
        Row(user_id=1, ts=T0 + timedelta(minutes=50), event_id=3),  # >30min gap
        Row(user_id=2, ts=T0, event_id=4),
    ]
    df = spark.createDataFrame(rows)
    s = {r.event_id: r.session_id for r in sessionize(df, order_tiebreak="event_id").collect()}
    assert s[1] == 0 and s[2] == 0 and s[3] == 1 and s[4] == 0
    stats = {r.user_id: r.n_sessions for r in session_stats(df, order_tiebreak="event_id").collect()}
    assert stats == {1: 2, 2: 1}


def test_sessionize_subsecond_gap(spark):
    """Gaps are compared at microsecond resolution (unix_micros), not
    whole-second truncation: a 1800.5s gap MUST split at gap=1800 while
    1799.5s must not — matching DuckDB epoch_us() oracle semantics on
    the nanosecond-timestamped events table."""
    rows = [
        Row(user_id=1, ts=T0, event_id=1),
        Row(user_id=1, ts=T0 + timedelta(seconds=1800, milliseconds=500), event_id=2),
        Row(user_id=2, ts=T0, event_id=3),
        Row(user_id=2, ts=T0 + timedelta(seconds=1799, milliseconds=500), event_id=4),
    ]
    df = spark.createDataFrame(rows)
    s = {r.event_id: r.session_id for r in sessionize(df, order_tiebreak="event_id").collect()}
    assert s[1] == 0 and s[2] == 1, "1800.5s gap must start a new session"
    assert s[3] == 0 and s[4] == 0, "1799.5s gap must stay in-session"
    # exactly-at-gap is inclusive (not a new session): > not >=
    df_edge = spark.createDataFrame(
        [Row(user_id=3, ts=T0, event_id=5),
         Row(user_id=3, ts=T0 + timedelta(seconds=1800), event_id=6)]
    )
    s_edge = {r.event_id: r.session_id
              for r in sessionize(df_edge, order_tiebreak="event_id").collect()}
    assert s_edge[6] == 0


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, "embeddings", "/root/testdata/sf0.001").cache()


def test_ivf_deterministic_and_recall(spark, emb):
    ivf1 = IVFIndex.train(emb, nlist=8)
    ivf2 = IVFIndex.train(emb, nlist=8)
    assert ivf1.centroids == ivf2.centroids  # fixed seed → same quantizer

    indexed = ivf1.assign(emb).cache()
    sizes = indexed.groupBy("list_id").count().collect()
    assert len(sizes) == 8 and sum(r["count"] for r in sizes) == emb.count()

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).head().embedding]
    exact = [r.vec_id for r in knn_exact(emb, qv, k=10).collect()]
    # full probe == exact scan
    full = [r.vec_id for r in ivf1.search(indexed, qv, k=10, nprobe=8).collect()]
    assert full == exact
    # partial probe: top-1 must survive (query's own list), recall@10 decent
    part = [r.vec_id for r in ivf1.search(indexed, qv, k=10, nprobe=4).collect()]
    assert part[0] == exact[0]
    assert len(set(part) & set(exact)) >= 5


def test_ivf_save_load_roundtrip(spark, emb, tmp_path):
    path = str(tmp_path / "centroids.json")
    trained = IVFIndex.train_or_load(emb, path, nlist=8)  # trains + persists
    loaded = IVFIndex.train_or_load(emb, path, nlist=8)   # pure load
    assert loaded.centroids == trained.centroids
    assert loaded.seed == trained.seed

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).head().embedding]
    indexed = loaded.assign(emb)
    via_trained = [r.vec_id for r in trained.search(indexed, qv, k=10, nprobe=4).collect()]
    via_loaded = [r.vec_id for r in loaded.search(indexed, qv, k=10, nprobe=4).collect()]
    assert via_loaded == via_trained


def test_salted_join_matches_plain(spark):
    from wc_vector_indexing_spark.operators.relational import salted_join

    left = spark.createDataFrame([Row(k=i % 3, v=i) for i in range(100)])
    right = spark.createDataFrame([Row(k=0, w="a"), Row(k=1, w="b"), Row(k=2, w="c")])
    plain = {(r.k, r.v, r.w) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.w) for r in salted_join(left, right, on="k", salt=8).collect()}
    assert salted == plain


def test_ivf_search_batch_matches_per_query(spark):
    """Batched IVF == the per-query search for every query and nprobe,
    and degenerates to exact kNN at full probe."""
    import numpy as np

    from wc_vector_indexing_spark.operators.ivf import IVFIndex, search_batch
    from wc_vector_indexing_spark.operators.similarity import knn_similarity_join

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    ivf = IVFIndex.train(emb, nlist=4)
    indexed = ivf.assign(emb)
    queries = [(i, [float(x) for x in vecs[i]]) for i in range(5)]

    for nprobe in (1, 2, 4):
        batched = {}
        for r in search_batch(ivf, indexed, queries, k=5, nprobe=nprobe).collect():
            batched.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
        for qid, qv in queries:
            single = [
                (i + 1, r.vec_id)
                for i, r in enumerate(
                    ivf.search(indexed, qv, k=5, nprobe=nprobe).collect()
                )
            ]
            assert sorted(batched[qid]) == single, (nprobe, qid)

    # full probe == exact kNN join
    full = {
        (r.query_id, r.rank): r.neighbor_id
        for r in search_batch(ivf, indexed, queries, k=5, nprobe=4).collect()
    }
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in knn_similarity_join(
            emb.filter("vec_id < 5"), emb, k=5
        ).collect()
    }
    assert full == exact


def test_quantizer_drift_flags_the_shifted_batch(spark):
    """Index-staleness monitor: a batch drawn from the build-time
    distribution reports ratios ~1; a batch collapsed onto one cluster
    lights up that list's share_ratio and starves the others."""
    from wc_vector_indexing_spark.operators.ivf import list_stats, quantizer_drift

    # two tight clusters around (1,0,...) and (0,1,...)
    def vec(axis, i, dim=8):
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 2) % dim] = (i % 7) / 100.0  # tiny spread
        return v

    build = spark.createDataFrame(
        [Row(vec_id=i, embedding=vec(i % 2, i)) for i in range(200)]
    )
    idx = IVFIndex.train(build, nlist=2, seed=7)
    baseline = list_stats(build, idx)
    b = {r.list_id: r for r in baseline.collect()}
    assert set(b) == {0, 1}
    assert all(abs(r.share - 0.5) < 0.05 for r in b.values())

    # in-distribution batch: both ratios stay near 1
    same = quantizer_drift(build, idx, baseline)
    for r in same.collect():
        assert r.share_ratio == pytest.approx(1.0, abs=0.05)
        assert r.dist_ratio == pytest.approx(1.0, abs=0.05)

    # drifted batch: everything lands on axis-0's cluster
    drifted = spark.createDataFrame(
        [Row(vec_id=i, embedding=vec(0, i)) for i in range(100)]
    )
    rep = {r.list_id: r for r in quantizer_drift(drifted, idx, baseline).collect()}
    hot = max(rep.values(), key=lambda r: r.share)
    cold = min(rep.values(), key=lambda r: r.share)
    assert hot.share == pytest.approx(1.0)
    assert hot.share_ratio > 1.8        # ~2x its baseline half-share
    assert cold.n == 0 and cold.share == 0.0  # starved list still reported
