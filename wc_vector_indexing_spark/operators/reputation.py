"""Host/domain reputation — the aggregate-signal stage a crawl
curation pipeline derives its domain blocklists from (the C4/CCNet/
RefinedWeb-family pattern: per-host page counts, boilerplate-duplicate
rate, and mean document quality decide whether a HOST is worth
crawling/keeping, before any per-document gate runs; public-knowledge
technique, no reference equivalent — north-star surface).

Scale shape: ONE groupBy on the host key. The duplicate-rate input is
``count(distinct md5(text))`` — the distinct carries 32-hex-char
digests through the shuffle, never document bodies, and Spark's
two-level partial aggregation bounds per-task state by the host's
distinct-digest count (≤ its page count). Quality is the same pure
codegen column expression the per-document gates use, averaged
map-side. At 100 TB hosts are Zipf-skewed; a mega-host's rows still
partial-aggregate map-side per partition before the single exchange,
so the skew lands on one reducer only for the final merge of
already-tiny partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators import textstats


def host_reputation(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    max_dup_rate: float = 0.15,
    min_avg_quality: float = 0.45,
) -> DataFrame:
    """Per-host aggregates + block decision:

      host, n_pages, n_unique (distinct text digests), dup_rate
      (1 - unique/text-bearing pages: the boilerplate-farm signal;
      null-text pages are excluded from the denominator and a host
      with no text at all gets a NULL dup_rate), avg_quality (mean of
      the per-document quality score), blocked (null-safe
      dup_rate > max_dup_rate OR avg_quality < min_avg_quality).

    ``blocked`` hosts are what a frontier scheduler de-prioritizes and
    a curation pipeline drops wholesale — cheaper than per-document
    gating when the whole host is template chaff."""
    q = textstats.quality_score_col(F.col(text_col))
    return (
        docs.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            # null-text pages (extraction failures) stay in n_pages —
            # crawl volume — but are NOT duplicate evidence: the digest
            # distinct skips them, so the dup-rate denominator must be
            # the pages that HAVE text or a host of failures reads as
            # 100% duplicated and gets wrongly blocklisted
            F.count(text_col).alias("n_text_pages"),
            F.countDistinct(F.md5(text_col)).alias("n_unique"),
            F.round(F.avg(F.round(q, 4)), 3).alias("avg_quality"),
        )
        .withColumn(
            "dup_rate",
            # try_divide: an all-null host has a 0 denominator, which
            # under ANSI mode is a stage-killing error, not a NULL
            F.round(
                1 - F.try_divide(F.col("n_unique"),
                                 F.col("n_text_pages")), 4),
        )
        .withColumn(
            "blocked",
            # null-safe: a host with no parseable text has neither a
            # dup nor a quality signal — not blocked by THIS stage
            F.coalesce(F.col("dup_rate") > max_dup_rate, F.lit(False))
            | F.coalesce(
                F.col("avg_quality") < min_avg_quality, F.lit(False)),
        )
        .select(
            "host", "n_pages", "n_unique", "dup_rate", "avg_quality",
            "blocked",
        )
    )
