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
