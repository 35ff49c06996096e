"""One-pass table profiling: per-column null counts, cardinality,
min/max, and numeric moments — the first query anyone runs against a
new 100 TB corpus, and the health check the reference exposes as its
status/diagnostics surface (class-admin-page-status.php renders row
counts and sync-state tallies; `cli.py status` is our equivalent).

Scale design:
  * ONE aggregate pass over the table — every statistic for every
    profiled column is an expression in a single ``agg()``, so the scan
    happens once with map-side partials. The per-column reshape happens
    on the resulting single row (a ``stack`` over literals — no second
    scan, no driver loop).
  * exact vs approximate cardinality: ``exact=False`` (the 100 TB
    default) uses HyperLogLog++ (``approx_count_distinct``, one pass,
    fixed memory); ``exact=True`` uses ``count(DISTINCT)`` — Spark
    plans the multi-distinct via a single Expand, still one scan, but
    with shuffle volume proportional to distinct keys. The registry
    query runs exact so the DuckDB oracle hash-matches.
  * quantiles: exact interpolated ``percentile`` (matches DuckDB's
    ``quantile_cont``); at cluster scale callers can flip
    ``approx=True`` quantile to ``percentile_approx`` (t-digest-style
    sketch, bounded memory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregate
    pass. Returns one row per column:

    ``col_name | n_rows | n_null | n_distinct | min_str | max_str |
    mean_val | p50``

    min/max are rendered as strings so heterogeneous column types share
    one output schema; mean/p50 are NULL for non-numeric columns.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns {missing}; have {list(fields)}")

    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        numeric = isinstance(fields[c], NumericType)
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            (
                F.round(F.avg(F.col(c)), 4)
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"__mean_{c}"),
            (
                F.round(F.percentile(F.col(c), F.lit(0.5)), 4)
                if numeric
                else F.lit(None).cast("double")
            ).alias(f"__p50_{c}"),
        ]
    one = df.agg(*aggs)

    # reshape the single aggregate row to one row per column: stack() is
    # evaluated on that one row — no extra scan of the source
    n = len(cols)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}, __mean_{c}, __p50_{c}"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({n}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_str, max_str, mean_val, p50)"
        ),
        F.col("__n_rows").alias("n_rows"),
    ).select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str",
        "mean_val", "p50",
    )
