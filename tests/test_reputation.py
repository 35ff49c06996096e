"""Host reputation aggregates (operators/reputation.py): the dup-rate
signal must come from text-bearing pages only — extraction failures
(null text) are crawl volume, not duplicate evidence."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.reputation import host_reputation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


GOOD = (
    "a perfectly ordinary paragraph of prose, long enough to score "
    "some quality and containing words. " * 3
)


def test_null_text_pages_are_not_duplicate_evidence(spark):
    # 4 distinct real pages + 6 extraction failures: dup_rate must be
    # 0 (4 unique / 4 text pages), not 0.6 from the nulls
    rows = [Row(source="h", text=GOOD + str(i)) for i in range(4)]
    rows += [Row(source="h", text=None) for _ in range(6)]
    got = host_reputation(_docs(spark, rows)).collect()[0]
    assert got.n_pages == 10 and got.n_unique == 4
    assert got.dup_rate == 0.0
    assert not got.blocked


def test_all_null_host_has_no_dup_signal(spark):
    rows = [Row(source="h", text=None) for _ in range(5)]
    got = host_reputation(_docs(spark, rows)).collect()[0]
    assert got.n_pages == 5 and got.n_unique == 0
    assert got.dup_rate is None and got.avg_quality is None
    assert got.blocked is False  # null-safe decision, not NULL


def test_real_duplicates_still_block(spark):
    rows = [Row(source="h", text=GOOD)] * 8
    rows += [Row(source="h", text=GOOD + "unique tail " + str(i))
             for i in range(2)]
    got = host_reputation(_docs(spark, rows)).collect()[0]
    assert got.n_unique == 3
    assert got.dup_rate == 0.7
    assert got.blocked
