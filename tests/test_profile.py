"""profile_table: one-pass per-column stats (operators/profile.py)."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.0),
            (2, "beta", None),
            (3, None, 30.0),
            (4, "alpha", 20.0),
        ],
        "id long, name string, score double",
    )


def test_profile_values(docs):
    rows = {r.col_name: r for r in profile_table(docs, exact=True).collect()}
    assert set(rows) == {"id", "name", "score"}
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["name"].n_null == 1 and rows["name"].n_distinct == 2
    assert rows["score"].n_null == 1 and rows["score"].n_distinct == 3
    assert rows["id"].min_str == "1" and rows["id"].max_str == "4"
    # numeric min/max are numeric-ordered, not lexicographic
    assert rows["score"].min_str == "10.0" and rows["score"].max_str == "30.0"
    assert rows["score"].mean_val == 20.0 and rows["score"].p50 == 20.0
    # non-numeric columns carry NULL moments
    assert rows["name"].mean_val is None and rows["name"].p50 is None


def test_profile_column_subset_and_unknown(docs):
    out = profile_table(docs, columns=["id"], exact=True).collect()
    assert [r.col_name for r in out] == ["id"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(docs, columns=["nope"])


def test_profile_single_scan(docs):
    """The whole profile is ONE aggregate over the source — the plan
    must contain exactly one scan of the input."""
    explained = profile_table(docs, exact=False)._jdf.queryExecution().simpleString()
    assert explained.count("ExistingRDD") + explained.count("LocalTableScan") <= 1


def test_profile_approx_mode(docs):
    """HLL path: cardinalities are approximate but exact here at n=4."""
    rows = {r.col_name: r for r in profile_table(docs, exact=False).collect()}
    assert rows["name"].n_distinct == 2


def test_profile_sketch_accuracy_vs_exact(spark):
    """The sketch profile's estimates stay within published error bounds
    of the exact answers (HLL++ rsd default 5%; percentile_approx with
    accuracy 1000 is exact-ish at test cardinalities)."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.plans.queries import sketch_profile_op

    sf = "/root/testdata/sf0.001"
    got = {r.source: r for r in sketch_profile_op(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    exact = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("text").alias("nd"),
            F.percentile(F.length("text"), F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for src, e in exact.items():
        g = got[src]
        assert g.n_docs == e.n_docs
        assert abs(g.approx_distinct_texts - e.nd) <= max(2, 0.1 * e.nd)
        # percentile_approx returns a real data value near the median
        assert abs(g.len_p50 - e.p50) <= 0.1 * e.p50 + 5


def test_value_histogram_golden(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.profile import value_histogram

    df = spark.createDataFrame([Row(v=float(x)) for x in range(11)])  # 0..10
    got = {r.bin: (r.lo, r.hi, r.cnt) for r in value_histogram(df, "v", bins=5).collect()}
    # width 2: [0,2) [2,4) [4,6) [6,8) [8,10]; v=10 clamps into bin 5
    assert got == {
        1: (0.0, 2.0, 2),
        2: (2.0, 4.0, 2),
        3: (4.0, 6.0, 2),
        4: (6.0, 8.0, 2),
        5: (8.0, 10.0, 3),
    }


def test_value_histogram_explicit_bounds_clamp(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.profile import value_histogram

    df = spark.createDataFrame([Row(v=-5.0), Row(v=0.5), Row(v=99.0)])
    got = {r.bin: r.cnt for r in value_histogram(df, "v", bins=2, lo=0.0, hi=1.0).collect()}
    # bins are [0,0.5) and [0.5,1]: -5 clamps into bin 1, 0.5 lands in
    # bin 2, 99 clamps into bin 2
    assert got == {1: 1, 2: 2}


def test_value_histogram_single_agg_plan(spark):
    from wc_vector_indexing_spark.operators.profile import value_histogram
    from wc_vector_indexing_spark.sources.readers import load

    ev = load(spark, "events", "/root/testdata/sf0.001")
    plan = (
        value_histogram(ev, "value", bins=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan  # bounds broadcast back
    assert "EvalPython" not in plan


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """Two-pass Misra-Gries must return EXACTLY the brute-force answer
    (counts and ppm included) even with tiny sketches, adversarial
    partitioning, and a long distinct-token tail — the superset
    guarantee is what pass B's exact count leans on."""
    from collections import Counter

    from wc_vector_indexing_spark.operators.profile import heavy_hitters

    rows = []
    # hot tokens with known counts + a 600-token distinct tail
    text_hot = ("alpha " * 7 + "beta " * 5 + "gamma " * 3).strip()
    for i in range(40):
        rows.append((i, text_hot + " " + f"tail{i}a tail{i}b tail{i}c"))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    got = {(r.token, r.cnt, r.ppm)
           for r in heavy_hitters(df, "text", min_share=0.05, slots=8).collect()}
    toks = Counter(
        t for _, text in rows for t in text.lower().split() if t)
    n = sum(toks.values())
    import math
    thresh = math.ceil(n * 0.05)
    want = {(t, c, c * 1_000_000 // n)
            for t, c in toks.items() if c >= thresh}
    assert got == want and {t for t, _, _ in got} == {"alpha", "beta", "gamma"}


def test_heavy_hitters_empty_and_threshold_edge(spark):
    from wc_vector_indexing_spark.operators.profile import heavy_hitters

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(empty, "text").count() == 0
    # exact-boundary count: token at precisely ceil(N*share) qualifies
    df = spark.createDataFrame(
        [(0, "x x x x y")], "doc_id long, text string")
    got = {r.token: r.cnt for r in
           heavy_hitters(df, "text", min_share=0.8, slots=4).collect()}
    assert got == {"x": 4}  # ceil(5*0.8)=4 -> x qualifies, y doesn't


def test_code_detect_separates_code_from_prose(spark):
    """The conservative flag must fire on real code shapes (Python,
    C-family) and stay quiet on prose — including prose with stray
    parentheses and a semicolon."""
    from wc_vector_indexing_spark.operators.textstats import code_detect

    py = (
        "import os\n"
        "def main(argv):\n"
        "    x = load(argv[0])\n"
        "    return [f(v) for v in x]\n"
        "class App:\n"
        "    def run(self):\n"
        "        return main([])\n"
    )
    c = (
        "int main(void) {\n"
        "    int x = 0;\n"
        "    x = x + 1;\n"
        "    printf(\"%d\", x);\n"
        "    return x;\n"
        "}\n"
    )
    prose = (
        "The committee met on Tuesday (as planned); attendance was "
        "strong.\nSeveral topics were discussed at length.\nThe next "
        "meeting is in March.\nMinutes will follow by email.\n"
    )
    df = spark.createDataFrame(
        [(1, py), (2, c), (3, prose)], "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in code_detect(df).collect()}
    assert got[1]["is_code"] and got[2]["is_code"]
    assert not got[3]["is_code"]
    assert got[1]["kw_hits"] >= 4 and got[2]["semi_lines"] == 4
