"""Quality classifier (operators/classifier.py) and WET source
(sources/wet.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.classifier import (
    QualityClassifier,
    quality_filter,
    score_documents,
)
from wc_vector_indexing_spark.sources.wet import read_wet, to_wet_bytes


def _labeled_corpus(spark, n=200):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            text = f"a well written informative article about topic {i} and ideas"
            label = 1
        else:
            text = f"buy cheap buy cheap click here {i} click here buy"
            label = 0
        rows.append((i, text, label))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_separates_and_is_deterministic(spark):
    docs = _labeled_corpus(spark)
    m1 = QualityClassifier.fit(docs, "label", n_buckets=256, iters=150)
    m2 = QualityClassifier.fit(docs, "label", n_buckets=256, iters=150)
    assert (m1.weights == m2.weights).all() and m1.bias == m2.bias
    # near-perfect on the (separable) training distribution
    scored = score_documents(docs, m1).select("doc_id", "label", "quality_prob")
    rows = scored.collect()
    acc = sum(1 for r in rows if (r["quality_prob"] >= 0.5) == (r["label"] == 1))
    assert acc / len(rows) >= 0.98


def test_planted_fit_is_refittable_and_separates():
    """The catalog's quality_classifier oracle refits the model outside
    Spark and embeds the weights in SQL — valid only if the planted
    sample and the trainer are bitwise-deterministic, and only useful
    if the fitted model actually separates the planted classes."""
    from wc_vector_indexing_spark.operators.classifier import planted_training_rows

    t1, y1 = planted_training_rows()
    t2, y2 = planted_training_rows()
    assert t1 == t2 and y1 == y2
    assert len(t1) == 400 and sum(y1) == 200.0  # exact class balance
    m1 = QualityClassifier.fit_rows(t1, y1, n_buckets=256, iters=100)
    m2 = QualityClassifier.fit_rows(t2, y2, n_buckets=256, iters=100)
    assert (m1.weights == m2.weights).all() and m1.bias == m2.bias
    acc = sum(
        1 for t, y in zip(t1, y1) if (m1.score_py(t) >= 0.5) == (y == 1.0)
    ) / len(t1)
    assert acc >= 0.95


def test_distributed_scores_match_driver_reference(spark):
    docs = _labeled_corpus(spark, n=60)
    m = QualityClassifier.fit(docs, "label", n_buckets=128, iters=60)
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in score_documents(docs, m).collect()
    }
    for r in docs.collect():
        assert got[r["doc_id"]] == pytest.approx(m.score_py(r["text"]), abs=1e-12)


def test_classifier_save_load_roundtrip(spark, tmp_path):
    docs = _labeled_corpus(spark, n=40)
    m = QualityClassifier.fit(docs, "label", n_buckets=64, iters=40)
    p = str(tmp_path / "clf.json")
    m.save(p)
    m2 = QualityClassifier.load(p)
    assert (m.weights == m2.weights).all() and m.bias == m2.bias


def test_quality_filter_gate(spark):
    docs = _labeled_corpus(spark)
    m = QualityClassifier.fit(docs, "label", n_buckets=256, iters=150)
    kept = quality_filter(docs, m, threshold=0.5)
    labels = [r["label"] for r in kept.collect()]
    assert labels and all(l == 1 for l in labels)


def test_classifier_empty_text_scores(spark):
    docs = spark.createDataFrame(
        [(1, "", 0), (2, "   ", 1)], "doc_id long, text string, label int"
    )
    m = QualityClassifier(n_buckets=16, weights=__import__("numpy").zeros(16), bias=0.0)
    rows = score_documents(docs, m).collect()
    assert all(r["quality_prob"] == 0.5 for r in rows)  # empty features → bias only


# ------------------------------------------------------------------ WET

RECORDS = [
    {
        "url": "https://example.com/a",
        "warc_date": "2024-03-01T00:00:00Z",
        "record_id": "<urn:uuid:1>",
        "text": "First page text.\nSecond line.",
    },
    {
        "url": "https://example.org/b?x=1",
        "warc_date": "2024-03-02T12:30:00Z",
        "record_id": "<urn:uuid:2>",
        "text": "Unicode café — naïve ☃ payload",
    },
    {
        "url": "https://example.net/c",
        "warc_date": "2024-03-03T23:59:59Z",
        "record_id": "<urn:uuid:3>",
        "text": "WARC/1.0 appears inside text but only at line starts splits",
    },
]


def test_wet_roundtrip(spark, tmp_path):
    p = tmp_path / "shard.warc.wet"
    p.write_bytes(to_wet_bytes(RECORDS))
    df = read_wet(spark, str(p)).orderBy("url")
    rows = df.collect()
    assert len(rows) == 3  # warcinfo prologue skipped
    by_url = {r["url"]: r for r in rows}
    for rec in RECORDS:
        got = by_url[rec["url"]]
        assert got["text"] == rec["text"]
        assert got["warc_date"] == rec["warc_date"]
        assert got["record_id"] == rec["record_id"]
        assert got["content_length"] == len(rec["text"].encode("utf-8"))
        assert got["wet_path"].endswith("shard.warc.wet")


def test_wet_multifile_glob(spark, tmp_path):
    (tmp_path / "a.wet").write_bytes(to_wet_bytes(RECORDS[:1]))
    (tmp_path / "b.wet").write_bytes(to_wet_bytes(RECORDS[1:]))
    df = read_wet(spark, str(tmp_path / "*.wet"))
    assert df.count() == 3
    assert df.select("wet_path").distinct().count() == 2


def test_wet_feeds_url_pipeline(spark, tmp_path):
    from wc_vector_indexing_spark.operators.urls import url_features

    p = tmp_path / "s.wet"
    p.write_bytes(to_wet_bytes(RECORDS))
    wet = read_wet(spark, str(p)).withColumn(
        "doc_id", F.xxhash64("url")
    )
    feats = url_features(wet)
    hosts = sorted(r["host"] for r in feats.collect())
    assert hosts == ["example.com", "example.net", "example.org"]
