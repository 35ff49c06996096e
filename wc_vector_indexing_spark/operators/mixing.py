"""Source-mixture reweighting — the "data mixing" step of training-data
assembly: given a target mixture over sources (web/books/code/...),
deterministically downsample each source so the kept corpus matches the
target proportions as closely as the available data allows.

Math: for source s with n_s rows and target weight w_s, the largest
achievable corpus size is N* = min_s(n_s / w_s) (no upsampling); each
source keeps fraction f_s = w_s * N* / n_s, implemented as the
content-addressed filter ``hash_bucket(key) < floor(f_s * 10000)``
(operators/sampling.hash_bucket: sha256-derived — the SAME row is kept
on every run, cluster, and engine, so mixtures are reproducible and the
DuckDB oracle verifies row-identical output).

Shuffle shape: one tiny groupBy(source) count, its 1-row global min as
a broadcast cross join, one broadcast threshold join against the corpus
— the corpus itself is scanned once and never shuffled. Skew-free: the
filter is a pure per-row predicate.

Argmin caveat: for the binding source f_s computes to ~1.0 in floating
point and may floor to 9999/10000 — up to 0.01% of that source is
dropped at the boundary. Identical in every engine (IEEE binary64 with
matching expression structure), hence still oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.sampling import N_BUCKETS, hash_bucket


def source_mix(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Rows of ``docs`` surviving the mixture filter (sources not in
    ``weights`` are dropped entirely). Weights must sum to 1 (±ε)."""
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights.values())}")

    w_expr = None
    for s, w in weights.items():
        cond = F.col(source_col) == s
        w_expr = F.when(cond, F.lit(float(w))) if w_expr is None else w_expr.when(
            cond, F.lit(float(w))
        )

    counts = (
        docs.groupBy(source_col)
        .agg(F.count("*").cast("double").alias("n_s"))
        .withColumn("w_s", w_expr)
        .filter(F.col("w_s").isNotNull())
    )
    n_star = counts.agg(F.min(F.col("n_s") / F.col("w_s")).alias("n_star"))
    # expression structure mirrors the oracle SQL exactly:
    # floor(((w_s * n_star) / n_s) * 10000) — IEEE-identical cross-engine
    thresholds = (
        counts.crossJoin(F.broadcast(n_star))
        .withColumn(
            "thr",
            F.floor(((F.col("w_s") * F.col("n_star")) / F.col("n_s")) * N_BUCKETS).cast(
                "int"
            ),
        )
        .select(source_col, "thr")
    )
    return docs.join(F.broadcast(thresholds), source_col).filter(
        hash_bucket(key_col, salt) < F.col("thr")
    ).select(*docs.columns)


def mix_report(
    docs: DataFrame, mixed: DataFrame, source_col: str = "source"
) -> DataFrame:
    """(source, n_before, n_after, achieved_weight) — the audit view of
    what the mixture filter kept."""
    before = docs.groupBy(source_col).agg(F.count("*").alias("n_before"))
    after = mixed.groupBy(source_col).agg(F.count("*").alias("n_after"))
    joined = before.join(after, source_col, "left").fillna(0, ["n_after"])
    total = joined.agg(F.sum("n_after").alias("total"))
    return (
        joined.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_before",
            "n_after",
            F.round(F.col("n_after") / F.col("total"), 4).alias("achieved_weight"),
        )
        .orderBy(source_col)
    )


def mixing_recipe(
    docs: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The PLANNING step `source_mix` executes: given target mixture
    ``weights`` and a total token ``budget_tokens``, solve each source's
    sampling fraction — or repeat factor where the budget EXCEEDS the
    source (the multi-epoch upsampling every published mixture applies
    to small high-quality sources while Common-Crawl-scale sources are
    subsampled).

    Per source: available docs/tokens, target_tokens = budget · w,
    fraction = min(1, target/available), repeat_factor =
    max(1, target/available) — exactly one of the two is ≠ 1. One
    corpus scan + a |sources|-row aggregate; whitespace token counts
    (the same cheap estimator the packer budgets with).
    """
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights.values())}")
    from wc_vector_indexing_spark.operators.textstats import token_count

    # left join FROM the weight table so a weighted source absent from
    # the corpus still yields a row (n_docs=0, fraction/repeat NULL) —
    # silently dropping it would leave part of the token budget
    # unallocated with no signal to the caller
    keys = docs.sparkSession.createDataFrame(
        [(str(s), float(w)) for s, w in weights.items()],
        f"{source_col} string, w_s double",
    )
    counts = keys.join(
        # join of two |sources|-row frames — the corpus work is all in
        # the partial-agg groupBy upstream, the join itself is free
        docs.groupBy(source_col).agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(text_col)).alias("n_tokens"),
        ),
        source_col,
        "left",
    ).fillna(0, ["n_docs", "n_tokens"])
    target = F.col("w_s") * F.lit(float(budget_tokens))
    has = F.col("n_tokens") > 0
    ratio = target / F.col("n_tokens").cast("double")
    return counts.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(target, 2).alias("target_tokens"),
        F.when(has, F.round(F.least(F.lit(1.0), ratio), 6)).alias("fraction"),
        F.when(has, F.round(F.greatest(F.lit(1.0), ratio), 6)).alias("repeat_factor"),
    ).orderBy(source_col)
