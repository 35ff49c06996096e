"""Vector math as Catalyst expressions over ``array<float>`` columns.

All JVM-side (``zip_with`` + ``aggregate`` fold inside codegen) — no Python
in the hot path. Elements are cast to double before multiplying so results
are stable and match a double-precision oracle.

These power the similarity-search operators (operators/similarity.py): the
reference delegates ANN to Pinecone's data plane; here the vector index is
a local columnar table and kNN is a scan + top-K.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: Column | str) -> Column:
    """array<float> -> array<double> for stable arithmetic."""
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (left-fold, deterministic order)."""
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))


def normalized(a: Column | str) -> Column:
    """Unit-normalize; pre-normalizing the index once turns cosine kNN
    into a pure dot-product scan (the 100 TB-friendly layout)."""
    n = l2_norm(a)
    return F.when(n == 0.0, _d(a)).otherwise(F.transform(_d(a), lambda x: x / n))
