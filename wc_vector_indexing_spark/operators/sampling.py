"""Dataset sampling & splitting for training pipelines.

Content-addressed splitting: a row's split is a pure function of its key
(sha256-derived bucket), not of partitioning, session, or engine — so
splits are reproducible across runs, clusters, AND engines (the DuckDB
oracle computes the identical assignment). This is the property random
splits lose the moment data moves.

group_aware variant assigns by a *group* key (dedup cluster, domain,
author) so correlated rows never straddle the train/eval boundary —
the standard leakage guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000): first 8 hex chars of
    sha256(salt + key) as an integer, mod 10000. Engine-portable (the
    same arithmetic is expressible in ANSI SQL)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.sha2(F.concat(F.lit(salt), c.cast("string")), 256)
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_BUCKETS).cast("int")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket thresholds.
    weights default {'train': .8, 'val': .1, 'test': .1} and must sum
    to 1 (±ε). Same key + salt ⇒ same split, forever."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights.values())}")
    bucket = hash_bucket(key_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < int(round(acc * N_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def group_aware_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """hash_split keyed on the GROUP, so every row of a group lands in
    the same split (no near-dup / same-source leakage across splits)."""
    return hash_split(df, group_col, weights, salt, out_col)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (sampleBy): balance skewed strata
    (languages, sources, labels) with per-key fractions. Seeded, but
    NOT partition-stable like hash_split — use for exploration, not for
    reproducible splits."""
    return df.sampleBy(strata_col, fractions, seed)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    content-addressed ``hash_bucket(key, salt)`` falls under the
    stratum's fraction threshold. Unlike ``stratified_sample``
    (sampleBy), the kept set is a pure function of (key, salt) —
    partition-stable, reproducible across engines and backfills, and
    expressible in ANSI SQL for oracle verification. The plan is a
    zero-shuffle scan + filter."""
    bucket = hash_bucket(key_col, salt)
    thr = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        val = F.lit(int(round(frac * N_BUCKETS)))
        thr = F.when(cond, val) if thr is None else thr.when(cond, val)
    thr = (
        F.lit(int(round(default_fraction * N_BUCKETS)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * N_BUCKETS)))
    )
    return df.filter(bucket < thr)


def gumbel_top_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    temperature: float = 1.0,
    seed: str = "42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement as a top-K: the Gumbel-max
    trick (sampling ∝ exp(weight/T) ≡ argmax of weight/T + Gumbel
    noise), which is how DSIR importance RESAMPLING composes with the
    importance weights — selection pressure rises as T falls, T→∞
    approaches uniform.

    Content-addressed noise: u = (md5(id:seed) as 60-bit int + 0.5)/2^60,
    g = -ln(-ln(u)) — deterministic per (id, seed), engine-portable
    (same md5-prefix trick as hash_split), partition-stable, and
    reproducible across runs/backfills, unlike rand(). The plan is a
    projection + TakeOrderedAndProject: no shuffle beyond the top-K
    reduction, safe at any corpus size.

    Returns the selected rows of ``df`` with ``sample_score`` appended
    (rounded to 6 — far above ln() cross-engine ulp noise).
    """
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col(id_col), F.lit(seed))), 1, 15),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 60))
    score = F.col(weight_col) / temperature + (-F.log(-F.log(u)))
    return (
        df.withColumn("sample_score", F.round(score, 6))
        .orderBy(F.desc("sample_score"), F.col(id_col))
        .limit(k)
    )


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    total_target: int,
) -> DataFrame:
    """Per-stratum keep fractions for temperature-based rebalancing
    (the multilingual-LM sampling rule: p_s ∝ n_s^α, α∈[0,1] — α=1
    keeps natural proportions, α=0 is uniform across strata; used to
    up-weight low-resource languages/sources, mBERT/XLM-R style).

    Returns a TINY frame (one row per stratum): n rows, the natural
    share, the tempered target share, and the realized keep fraction
    frac = min(1, target_share·T / n) — capped because sampling is
    without replacement.

    One map-side-combined count agg over the corpus; everything after
    operates on the stratum table (|strata| rows).
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total_n"),
        F.sum(F.pow(F.col("n").cast("double"), F.lit(alpha))).alias("pow_sum"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col(strata_col),
            F.col("n"),
            F.round(F.col("n") / F.col("total_n"), 6).alias("natural_share"),
            F.round(
                F.pow(F.col("n").cast("double"), F.lit(alpha)) / F.col("pow_sum"), 6
            ).alias("tempered_share"),
            F.least(
                F.lit(1.0),
                F.pow(F.col("n").cast("double"), F.lit(alpha))
                / F.col("pow_sum")
                * F.lit(float(total_target))
                / F.col("n"),
            ).alias("keep_frac"),
        )
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    total_target: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-rebalanced downsampling: keep each row iff its
    content-addressed ``hash_bucket(key, salt)`` clears its stratum's
    tempered keep fraction (see ``temperature_fractions``).

    Deterministic and engine-portable like ``stratified_hash_sample``;
    the plan is scan → broadcast join against the |strata|-row fraction
    table → filter, so the corpus itself is never shuffled (the count
    agg reduces map-side). Fraction thresholds quantize to the
    N_BUCKETS grid, matching the oracle exactly.
    """
    fr = temperature_fractions(df, strata_col, alpha, total_target).select(
        strata_col,
        # floor(x+0.5), not round(): engines disagree on half-rounding
        F.floor(F.col("keep_frac") * N_BUCKETS + F.lit(0.5)).cast("int").alias("_thr"),
    )
    bucket = hash_bucket(key_col, salt)
    return (
        df.join(F.broadcast(fr), strata_col)
        .filter(bucket < F.col("_thr"))
        .drop("_thr")
    )


def epoch_order(
    docs: DataFrame,
    seed: str = "epoch-0",
    n_shards: int = 8,
    key_col: str = "doc_id",
    layout: bool = True,
) -> DataFrame:
    """Deterministic training order: shard assignment + within-shard
    order as a pure function of (key, seed) — the reproducible global
    shuffle a training run needs (same seed ⇒ byte-identical batch
    order across runs, clusters, and engines; new seed per epoch ⇒ a
    fresh permutation with zero RNG state to checkpoint).

    shard = sha256-bucket(seed + key) % n_shards (the same
    engine-portable arithmetic as hash_split), order_key = md5(seed +
    key). At scale: write partitioned by shard, sorted within — one
    hash-partitioned sort whose reducers are balanced by construction
    (the key is a cryptographic hash), then readers stream shards
    sequentially. No global ORDER BY ever runs.

    ``layout=False`` returns just the (key, shard, order_key)
    assignment — a pure projection, zero shuffle — for callers that
    join it back and lay out the full rows themselves (the export CLI).
    """
    c = F.col(key_col).cast("string")
    shard = (hash_bucket(key_col, salt=seed) % n_shards).cast("int")
    assigned = docs.select(
        F.col(key_col),
        shard.alias("shard"),
        F.md5(F.concat(F.lit(seed), c)).alias("order_key"),
    )
    if not layout:
        return assigned
    return assigned.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "order_key"
    )
