"""Source-mixture reweighting (operators/mixing.py): achieved mixture
tracks the target, determinism, unlisted-source drop, audit report."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from wc_vector_indexing_spark.operators.mixing import mix_report, source_mix


@pytest.fixture()
def docs(spark):
    rows = (
        [Row(doc_id=i, source="web", text=f"w{i}") for i in range(600)]
        + [Row(doc_id=1000 + i, source="books", text=f"b{i}") for i in range(200)]
        + [Row(doc_id=2000 + i, source="junk", text=f"j{i}") for i in range(100)]
    )
    return spark.createDataFrame(rows)


def test_mixture_tracks_target(spark, docs):
    # books is the binding source: N* = 200/0.5 = 400 -> web keeps 200/600
    mixed = source_mix(docs, {"web": 0.5, "books": 0.5})
    rep = {r.source: r for r in mix_report(docs, mixed).collect()}
    assert "junk" not in {r.source for r in mixed.select("source").distinct().collect()}
    assert rep["books"].n_after >= 195  # f=1.0 (minus <=0.01% floor slack)
    # web downsampled to ~200 of 600; hash sampling is binomial around
    # the threshold — allow 3 sigma (~sqrt(200*2/3) ~ 12)
    assert abs(rep["web"].n_after - 200) <= 40
    assert abs(rep["web"].achieved_weight - 0.5) <= 0.06


def test_deterministic_and_content_addressed(spark, docs):
    a = sorted(r.doc_id for r in source_mix(docs, {"web": 0.6, "books": 0.4}).collect())
    b = sorted(r.doc_id for r in source_mix(docs, {"web": 0.6, "books": 0.4}).collect())
    assert a == b
    # repartitioning cannot change membership (content-addressed)
    c = sorted(
        r.doc_id
        for r in source_mix(docs.repartition(7), {"web": 0.6, "books": 0.4}).collect()
    )
    assert a == c


def test_weights_must_sum_to_one(spark, docs):
    with pytest.raises(ValueError):
        source_mix(docs, {"web": 0.5, "books": 0.4})


def test_report_accounts_everything(spark, docs):
    mixed = source_mix(docs, {"web": 0.5, "books": 0.5})
    rep = mix_report(docs, mixed).collect()
    assert {r.source for r in rep} == {"web", "books", "junk"}
    junk = next(r for r in rep if r.source == "junk")
    assert junk.n_after == 0 and junk.n_before == 100
    total_after = sum(r.n_after for r in rep)
    assert total_after == mixed.count()


def test_mixing_recipe_fraction_xor_repeat(spark):
    """Exactly one of (fraction, repeat_factor) differs from 1 per
    source: a budget below the source subsamples, above it upsamples."""
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.mixing import mixing_recipe

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="big" if i < 90 else "small", text="w " * 100)
         for i in range(100)]
    )
    # big: 9000 tokens available; small: 1000. budget 4000 at 50/50 ->
    # big subsampled (2000/9000), small upsampled (2000/1000 = 2 epochs)
    out = {r.source: r for r in mixing_recipe(
        docs, {"big": 0.5, "small": 0.5}, budget_tokens=4000
    ).collect()}
    big, small = out["big"], out["small"]
    assert big.n_tokens == 9000 and small.n_tokens == 1000
    assert big.fraction == pytest.approx(2000 / 9000, abs=1e-6)
    assert big.repeat_factor == 1.0
    assert small.fraction == 1.0
    assert small.repeat_factor == pytest.approx(2.0)
    import pytest as _pt
    with _pt.raises(ValueError):
        mixing_recipe(docs, {"big": 0.5}, budget_tokens=10)


def test_mixing_recipe_missing_source_visible(spark):
    """Regression (r5 advice): a weighted source with zero corpus docs
    must surface as an n_docs=0 row with NULL fraction/repeat — not
    silently vanish and leave budget unallocated."""
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.mixing import mixing_recipe

    docs = spark.createDataFrame(
        [Row(doc_id=i, source="web", text="w " * 10) for i in range(10)]
    )
    out = {r.source: r for r in mixing_recipe(
        docs, {"web": 0.6, "books": 0.4}, budget_tokens=1000
    ).collect()}
    assert set(out) == {"web", "books"}
    b = out["books"]
    assert b.n_docs == 0 and b.n_tokens == 0
    assert b.target_tokens == pytest.approx(400.0)
    assert b.fraction is None and b.repeat_factor is None
    w = out["web"]
    assert w.n_docs == 10 and w.fraction is not None
