"""Fuzzy (edit-distance) self-join — entity-resolution blocking for
string keys, complete up to a distance bound.

The classic record-linkage primitive: find every pair of rows whose
string key is within Levenshtein distance ``d``, without the N² cross
join. Blocking is the symmetric-delete scheme (SymSpell, Garbe —
public; same pigeonhole family as PassJoin, Li et al. VLDB'11): two
strings with ed(s,t) ≤ d share at least one member of their
≤d-deletion neighborhoods, so candidates are exactly the pairs that
collide on a deletion variant. No false negatives — the verify step
(`F.levenshtein`, JVM codegen) only REMOVES pairs, so the output
equals the naive cross-join's and the DuckDB oracle can run the naive
form.

Scale design (N rows, key length L):
  * variant generation is pure Catalyst (nested transform/sequence —
    no UDF): ~L^d variants per row, exploded into an inverted index.
    One shuffle keyed by variant hash.
  * candidate pairs are generated INSIDE each variant posting list
    (`_pairs_in_group` pattern — no self-join, the generation work is
    never duplicated) and deduped by (id_a, id_b).
  * ``max_bucket`` caps a hot variant (e.g. a near-empty string whose
    neighborhood collides with everything): a posting list longer than
    the cap is dropped — the same df-cap skew bound the shingle index
    uses (SCALE.md §Skew).
  * d ≤ 2 and bounded key length are the intended envelope (names,
    SKUs, codes — L ≲ 64). The L² variant blow-up at d=2 is the known
    SymSpell trade; for long free text use the n-gram/MinHash family
    (operators/dedup.py) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIG = 1 << 20  # "rest of string" length for substring()


def _delete_one(s: Column, i: Column) -> Column:
    """``s`` with the 1-based position ``i`` removed."""
    return F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.lit(_BIG)))


def deletion_variants(col: str | Column, d: int = 1) -> Column:
    """Array of all strings obtainable from ``col`` by deleting up to
    ``d`` characters (the string itself included), distinct. Pure
    Catalyst — generated in codegen over the scan."""
    if d not in (1, 2):
        raise ValueError("deletion_variants supports d in {1, 2}")
    s = F.col(col) if isinstance(col, str) else col
    n = F.length(s)
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    one = F.transform(idx, lambda i: _delete_one(s, i))
    out = F.concat(F.array(s), one)
    if d == 2:
        # delete position i, then position j of the REMAINING string
        # with j >= i (covers every unordered position pair once)
        def del2(i):
            s1 = _delete_one(s, i)
            n1 = F.length(s1)
            inner = F.when(n1 >= i, F.sequence(i, n1)).otherwise(
                F.array().cast("array<int>")
            )
            return F.transform(inner, lambda j: _delete_one(s1, j))

        out = F.concat(out, F.flatten(F.transform(idx, del2)))
    return F.array_distinct(out)


def fuzzy_self_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_distance: int = 1,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """(id_a, id_b, key_a, key_b, dist): every pair with
    Levenshtein(key_a, key_b) ≤ ``max_distance`` and id_a < id_b.
    Complete (see module docstring) unless a ``max_bucket`` cap drops a
    pathological posting list."""
    from wc_vector_indexing_spark.functions.partitioning import fan_out

    rows = fan_out(df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key")))
    inv = rows.select(
        F.struct("id", "key").alias("rec"),
        F.explode(deletion_variants("key", max_distance)).alias("variant"),
    )
    grouped = inv.groupBy(F.xxhash64("variant").alias("vh")).agg(
        F.sort_array(F.collect_set("rec")).alias("rs")
    )
    if max_bucket is not None:
        grouped = grouped.filter(F.size("rs") <= max_bucket)
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(rs, (x, i) -> "
                "transform(slice(rs, i + 2, size(rs) - i - 1), "
                "y -> struct(x.id AS id_a, x.key AS key_a, "
                "y.id AS id_b, y.key AS key_b))))"
            )
        ).alias("p")
    ).select("p.*").distinct()
    return pairs.withColumn(
        "dist", F.levenshtein("key_a", "key_b")
    ).filter(F.col("dist") <= max_distance)
