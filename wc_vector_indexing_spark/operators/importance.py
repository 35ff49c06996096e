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


class ImportanceModel:
    """Fitted DSIR model: the train-once artifact (cf. IVFIndex). Holds
    the per-bucket log likelihood-ratios plus the smoothed default for
    buckets unseen at fit time — vocabulary-hash-sized (n_buckets), so
    collecting it to the driver is bounded by construction and the
    scorer can fold it into a literal map expression (stream-safe, no
    join, no state)."""

    def __init__(
        self, log_ratio: dict[int, float], default: float, n_buckets: int
    ):
        self.log_ratio = log_ratio
        self.default = default
        self.n_buckets = n_buckets


def fit_importance_model(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ImportanceModel:
    """Fit the hashed-unigram likelihood-ratio model on a static corpus.
    One pass (the same dual-count aggregation as importance_weights);
    the result is the broadcastable scoring artifact."""
    toks = (
        fan_out(docs)
        .withColumn("_is_target", target.cast("boolean"))
        .select(
            F.col("_is_target"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
                )
            ).alias("tok"),
        )
        .withColumn("bucket", _bucket(F.col("tok"), n_buckets))
    )
    stats = (
        toks.groupBy("bucket")
        .agg(
            F.count("*").alias("c_all"),
            F.count_if(F.col("_is_target")).alias("c_t"),
        )
        .collect()
    )
    t_all = sum(r.c_all for r in stats)
    t_t = sum(r.c_t for r in stats)
    import math

    def lr(c_t: int, c_all: int) -> float:
        return math.log((c_t + alpha) / (t_t + alpha * n_buckets)) - math.log(
            (c_all + alpha) / (t_all + alpha * n_buckets)
        )

    return ImportanceModel(
        {r.bucket: lr(r.c_t, r.c_all) for r in stats}, lr(0, 0), n_buckets
    )


def importance_score_col(model: ImportanceModel, text_col: str | Column = "text") -> Column:
    """In-row DSIR score: Σ log-ratio over the document's tokens, as a
    pure column expression (map-literal lookup per token — stream-safe,
    identical on a static backfill frame; same contract as
    textstats.quality_score_col). Empty-token docs score 0.0."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(F.lower(c), "[^a-z]+"), lambda x: x != "")
    if model.log_ratio:
        items = sorted(model.log_ratio.items())
        lut = F.map_from_arrays(
            F.array(*[F.lit(int(k)) for k, _ in items]),
            F.array(*[F.lit(float(v)) for _, v in items]),
        )
        per_tok = lambda t: F.coalesce(  # noqa: E731
            F.element_at(lut, _bucket(t, model.n_buckets).cast("int")),
            F.lit(model.default),
        )
    else:
        per_tok = lambda t: F.lit(model.default)  # noqa: E731
    scores = F.transform(toks, per_tok)
    return F.round(
        F.aggregate(scores, F.lit(0.0), lambda acc, x: acc + x), 4
    )
