"""DSIR-style importance weighting — data selection by hashed-unigram
likelihood ratio (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023).

Given a TARGET slice of the corpus (the domain you want more of) and the
raw corpus, fit two hashed bag-of-words unigram distributions and score
every document by

    log w(d) = Σ_tokens  log p_target(bucket(tok)) − log p_raw(bucket(tok))

High-weight documents look like the target domain; selection is then a
threshold / top-quantile gate (compose with quality_quantile_filter) or
Gumbel-top-k resampling on ``log_weight``.

Spark-first shape, all JVM expressions (no UDF anywhere):

  1. token explode (fanned out — the explode emits ~tokens× the scan),
  2. ONE aggregation builds BOTH distributions: groupBy(bucket) with a
     filtered count for the target slice — the raw corpus is scanned
     once, not twice,
  3. bucket stats are vocabulary-hash-sized (n_buckets rows), so the
     per-token stats lookup is a broadcast join, and the per-doc score
     is one more hash aggregation.

Two shuffles total (bucket agg, doc agg) + one broadcast — at 100 TB the
shuffled volume is n_buckets + |docs| rows, never corpus text.

The feature hash is the md5-prefix trick shared with simhash's oracle
(15 hex digits < 2^63, engine-portable), so the DuckDB oracle reproduces
bucket ids bit-for-bit. Hash collisions are part of the METHOD (DSIR §2:
hashed n-grams), not an approximation to apologize for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.functions.partitioning import fan_out


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: md5 15-hex-digit prefix mod B."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % n_buckets


def importance_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``target``: boolean Column over ``docs`` rows selecting the target
    domain (e.g. ``F.col("source") == "src1"``). Both distributions are
    Laplace-smoothed with ``alpha`` so buckets unseen in the target
    still score finitely.

    Returns (id_col, n_tokens, log_weight) — log_weight rounded to 4
    decimals; docs whose token set is empty are absent (no evidence,
    no score), matching the unigram-LM scorer's contract.
    """
    toks = (
        fan_out(docs)
        .withColumn("_is_target", target.cast("boolean"))
        .select(
            F.col(id_col),
            F.col("_is_target"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
                )
            ).alias("tok"),
        )
        .withColumn("bucket", _bucket(F.col("tok"), n_buckets))
    )
    stats = toks.groupBy("bucket").agg(
        F.count("*").alias("c_all"),
        F.count_if(F.col("_is_target")).alias("c_t"),
    )
    # corpus-wide totals: the stats frame is n_buckets rows, so a global
    # aggregate over it is cheap; broadcast both back
    totals = stats.agg(
        F.sum("c_all").alias("t_all"), F.sum("c_t").alias("t_t")
    )
    scored_buckets = stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_t") + F.lit(alpha)) / (F.col("t_t") + alpha * n_buckets))
            - F.log((F.col("c_all") + F.lit(alpha)) / (F.col("t_all") + alpha * n_buckets))
        ).alias("log_ratio"),
    )
    return (
        toks.join(F.broadcast(scored_buckets), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("log_ratio"), 4).alias("log_weight"),
        )
    )
