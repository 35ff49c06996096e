"""PII scrubbing (operators/pii.py) and unigram-LM scoring
(operators/lm_score.py)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.lm_score import unigram_model, unigram_score
from wc_vector_indexing_spark.operators.pii import pii_scrub


def _pii_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="mail me at bob.smith+x@corp.example.org today"),
            Row(doc_id=2, text="server 192.168.1.250 and 10.0.0.1 are up"),
            Row(doc_id=3, text="card 4111-1111-1111-1234 exp 09/27"),
            Row(doc_id=4, text="ssn 123-45-6789 phone +44 555 0123"),
            Row(doc_id=5, text="nothing sensitive here at all"),
        ]
    )


def test_pii_counts_and_redaction(spark):
    out = {r.doc_id: r for r in pii_scrub(_pii_docs(spark)).collect()}
    assert out[1].n_email == 1 and out[1].scrubbed == "mail me at [EMAIL] today"
    assert out[2].n_ipv4 == 2 and out[2].scrubbed == "server [IPV4] and [IPV4] are up"
    assert out[3].n_cc16 == 1 and "[CC16]" in out[3].scrubbed
    assert out[4].n_ssn == 1 and out[4].n_phone == 1
    assert out[4].scrubbed == "ssn [SSN] phone [PHONE]"
    assert out[5].n_pii == 0 and out[5].scrubbed == "nothing sensitive here at all"
    assert all(r.n_pii == r.n_email + r.n_ipv4 + r.n_cc16 + r.n_ssn + r.n_phone
               for r in out.values())


def test_pii_no_double_count_across_families(spark):
    # a credit card's digit quads must not also be counted by later
    # families (counts run on progressively scrubbed text)
    docs = spark.createDataFrame([Row(doc_id=1, text="pay 4111-1111-1111-1234 now")])
    r = pii_scrub(docs).collect()[0]
    assert r.n_cc16 == 1 and r.n_ssn == 0 and r.n_phone == 0


def _lm_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat"),
            Row(doc_id=2, text="the the dog"),
        ]
    )


def test_unigram_model_probs(spark):
    # corpus tokens: the x3, cat, sat, dog  (N=6)
    m = {r.tok: r.logp for r in unigram_model(_lm_docs(spark)).collect()}
    assert math.isclose(m["the"], math.log(3 / 6), rel_tol=1e-12)
    assert math.isclose(m["cat"], math.log(1 / 6), rel_tol=1e-12)


def test_unigram_score_self_trained(spark):
    out = {r.doc_id: r for r in unigram_score(_lm_docs(spark)).collect()}
    # doc1: -(ln(1/2) + ln(1/6) + ln(1/6)) / 3
    want1 = round(-(math.log(0.5) + 2 * math.log(1 / 6)) / 3, 4)
    assert out[1].n_scored == 3 and out[1].avg_neg_logp == want1
    # doc2 is more in-distribution ("the the") → lower surprise
    assert out[2].avg_neg_logp < out[1].avg_neg_logp


def test_unigram_foreign_model_unseen_smoothing(spark):
    model = unigram_model(_lm_docs(spark))
    new = spark.createDataFrame([Row(doc_id=9, text="the zebra")])
    out = unigram_score(new, model=model, unseen_logp=math.log(1e-6)).collect()[0]
    want = round(-(math.log(0.5) + math.log(1e-6)) / 2, 4)
    assert out.n_scored == 2 and out.avg_neg_logp == want


def test_scrub_is_plan_only(spark):
    # the whole pii pass must stay in codegen: no exchanges, no python
    plan = pii_scrub(_pii_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scrub_idempotent_and_count_exact(spark):
    """Property on a generated corpus: scrubbing twice equals scrubbing
    once (tags never re-match), and n_pii equals the number of PII
    fragments injected."""
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = []
    for i in range(50):
        parts, n_injected = [], 0
        for _ in range(rng.randint(1, 8)):
            parts.append(rng.choice(words))
            roll = rng.random()
            if roll < 0.2:
                parts.append(f"user{i}@test.org")
                n_injected += 1
            elif roll < 0.3:
                parts.append(f"10.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}")
                n_injected += 1
            elif roll < 0.4:
                parts.append(f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}")
                n_injected += 1
        rows.append(Row(doc_id=i, text=" ".join(parts), expected=n_injected))
    docs = spark.createDataFrame(rows)
    once = pii_scrub(docs.select("doc_id", "text"))
    for r in once.join(docs.select("doc_id", "expected"), "doc_id").collect():
        assert r.n_pii == r.expected, f"doc {r.doc_id}: {r.n_pii} != {r.expected}"
    twice = pii_scrub(once.select("doc_id", F.col("scrubbed").alias("text")))
    joined = once.select("doc_id", "scrubbed").join(
        twice.select("doc_id", F.col("scrubbed").alias("scrubbed2"), "n_pii"), "doc_id"
    )
    for r in joined.collect():
        assert r.scrubbed == r.scrubbed2
        assert r.n_pii == 0


def test_ccnet_buckets_terciles(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.lm_score import ccnet_buckets

    # 6 docs, one language: common-word docs score low NLL (head),
    # rare-word docs high (tail)
    rows = [
        Row(doc_id=1, lang="en", text="the the the the"),
        Row(doc_id=2, lang="en", text="the the the of"),
        Row(doc_id=3, lang="en", text="the of of and"),
        Row(doc_id=4, lang="en", text="of and and zz"),
        Row(doc_id=5, lang="en", text="and zz qq ww"),
        Row(doc_id=6, lang="en", text="zz qq ww yy"),
    ]
    out = {(r.lang, r.bucket): r for r in ccnet_buckets(spark.createDataFrame(rows)).collect()}
    assert set(out) == {("en", "head"), ("en", "middle"), ("en", "tail")}
    assert sum(r.n_docs for r in out.values()) == 6
    # tercile ordering: head strictly cheapest, tail strictly dearest
    assert out[("en", "head")].mean_nll < out[("en", "middle")].mean_nll
    assert out[("en", "middle")].mean_nll < out[("en", "tail")].mean_nll
