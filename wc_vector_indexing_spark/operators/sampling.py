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
