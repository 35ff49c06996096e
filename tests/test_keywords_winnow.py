"""TF-IDF keywords (operators/keywords.py) and winnowing fingerprints
(operators/textstats.winnow_fingerprint)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.keywords import tf_idf, top_keywords
from wc_vector_indexing_spark.operators.textstats import winnow_fingerprint


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple banana common common"),
            Row(doc_id=2, text="cherry banana common common common"),
            Row(doc_id=3, text="common common common common common"),
        ]
    )


def test_tfidf_values(spark):
    rows = {(r.doc_id, r.tok): r for r in tf_idf(_docs(spark)).collect()}
    # 'common' appears in all 3 docs -> idf = ln(3/3) = 0
    assert rows[(1, "common")].tfidf == 0.0
    # 'apple' only in doc 1, tf=2 -> 2 * ln(3/1)
    assert rows[(1, "apple")].tfidf == round(2 * math.log(3.0), 4)
    # 'banana' in 2 of 3 docs, tf=1 -> ln(3/2)
    assert rows[(2, "banana")].tfidf == round(math.log(1.5), 4)


def test_top_keywords_order_and_tiebreak(spark):
    top = top_keywords(_docs(spark), k=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.tok))
    assert by_doc[1] == [(1, "apple"), (2, "banana")]
    # doc 3 has only the zero-idf token; still ranked (deterministically)
    assert by_doc[3] == [(1, "common")]


def test_winnow_shared_run_guarantee(spark):
    # two docs sharing a run of w + k - 1 = 6 tokens must share >= 1 fp
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"one two {shared} three four"),
            Row(doc_id=2, text=f"{shared} nine ten eleven twelve"),
            Row(doc_id=3, text="totally different words everywhere here now"),
        ]
    )
    fps = {}
    for r in winnow_fingerprint(docs, k=3, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_short_doc_still_fingerprints(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="just three words"),        # exactly k tokens, 1 gram
            Row(doc_id=2, text="a b c d"),                  # 2 grams < w
            Row(doc_id=3, text="ab"),                       # < k tokens: no grams
        ]
    )
    out = {}
    for r in winnow_fingerprint(docs, k=3, w=4).collect():
        out.setdefault(r.doc_id, set()).add(r.fp)
    assert len(out[1]) == 1 and len(out[2]) == 1
    assert 3 not in out


def test_winnow_density(spark):
    # selection density ~ 2/(w+1); on a long random-ish doc the selected
    # set must be much smaller than the gram count but non-trivial
    words = " ".join(f"w{i * 7919 % 997}" for i in range(400))
    docs = spark.createDataFrame([Row(doc_id=1, text=words)])
    n_sel = winnow_fingerprint(docs, k=3, w=4).count()
    n_grams = 400 - 2
    assert n_grams * 0.2 <= n_sel <= n_grams * 0.6
