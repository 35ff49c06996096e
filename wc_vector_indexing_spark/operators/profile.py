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


def value_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, cnt) for
    ``bins`` buckets over [lo, hi] (corpus min/max when not given —
    fetched in the same job via a 1-row broadcast, no driver collect).
    Bucket rule: bin = floor((v − lo) / (hi − lo) · bins) + 1, clamped
    to [1, bins] — width_bucket semantics with at-upper-bound values in
    the last bucket. The formula is spelled out (rather than calling
    `width_bucket`) so the DuckDB oracle can run the IDENTICAL double
    arithmetic — same ops, same order, bit-equal bucket boundaries.

    Scale: one scan → bucket expression in codegen → one bins-sized
    count aggregate with map-side combine. Empty buckets are absent
    (the caller densifies if it wants zeros). This is the EXACT
    histogram; for streaming/sketched percentiles see
    `sketch_profile`."""
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(c).cast("double").alias("_lo"), F.max(c).cast("double").alias("_hi")
        )
        src = df.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("_lo"), F.col("_hi")
    else:
        src = df
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    b = F.floor((c - lo_c) / (hi_c - lo_c) * F.lit(float(bins))) + 1
    b = F.least(F.greatest(b, F.lit(1)), F.lit(bins))
    counts = (
        src.select(
            b.alias("bin"),
            lo_c.alias("_lo"),
            ((hi_c - lo_c) / bins).alias("_w"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("cnt"),
            F.first("_lo").alias("_lo"),
            F.first("_w").alias("_w"),
        )
        .select(
            "bin",
            F.round(F.col("_lo") + (F.col("bin") - 1) * F.col("_w"), 6).alias("lo"),
            F.round(F.col("_lo") + F.col("bin") * F.col("_w"), 6).alias("hi"),
            "cnt",
        )
    )
    return counts.orderBy("bin")


def heavy_hitters(
    df,
    col: str = "text",
    min_share: float = 0.002,
    slots: int | None = None,
):
    """Exact heavy hitters over a token column without shuffling the
    vocabulary: the classic two-pass Misra-Gries shape.

    Pass A runs a k-slot Misra-Gries summary PER PARTITION (an Arrow
    pass holding k counters, state carried across the partition's
    batches) and ships only the surviving ``(token, residual)`` rows
    plus ONE NULL-token row carrying the partition's row count — so
    the exact threshold N comes out of the same scan instead of a
    separate ``count()`` (the token stream is read exactly twice:
    summary pass, exact recount). Shuffle volume is ``slots x
    partitions`` regardless of vocabulary size, which is the whole
    point at 100 TB (a plain groupBy ships every distinct token).
    Mergeability gives the standard guarantee: any token with global
    count > N/(slots+1) survives with positive merged residual, so
    with ``slots >= 2/min_share`` the candidate set is a superset of
    every qualifying token. The merged summary is collected
    driver-side — bounded by slots x partitions rows, the same data
    the broadcast join of pass B has to hold anyway. Pass B
    broadcast-semi-joins the candidates back over the token stream
    and counts EXACTLY, so the output is precise, not approximate:
    every token with count >= ceil(N * min_share), with its exact
    count and integer parts-per-million share (integer arithmetic so
    an engine-portable oracle can replay it bit-for-bit).

    Returns (token, cnt, ppm) ordered by cnt desc, token."""
    from pyspark.sql import functions as F

    tokens = (
        df.select(
            F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("token"))
        .filter(F.length("token") > 0)
    )
    k = slots or max(16, int(2.0 / min_share))

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        nrows = 0
        for pdf in batches:
            nrows += len(pdf)
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    # decrement-all step, dropping zeroed slots
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        # NULL-token sentinel: this partition's exact row count, folded
        # into the same shuffle as the counters (no separate count scan)
        yield pd.DataFrame(
            {"token": list(counters) + [None],
             "w": list(counters.values()) + [nrows]})

    summary = (
        tokens.mapInPandas(mg, schema="token string, w long")
        .groupBy("token").agg(F.sum("w").alias("w"))
        .collect()  # bounded: <= slots x partitions survivors + 1 row
    )
    total = sum(r["w"] for r in summary if r["token"] is None)
    if total == 0:
        return tokens.select(
            "token", F.lit(0).cast("long").alias("cnt"),
            F.lit(0).cast("long").alias("ppm")).limit(0)
    threshold = -(-total * min_share // 1)  # ceil
    cand = [(r["token"],) for r in summary
            if r["token"] is not None and r["w"] > 0]
    candidates = df.sparkSession.createDataFrame(cand, "token string")
    exact = (
        tokens.join(F.broadcast(candidates), "token")
        .groupBy("token").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(threshold)))
        # integer div, not double division: the oracle replays this
        # bit-for-bit and a float quotient could round across the floor
        .withColumn("ppm", F.expr(f"(cnt * 1000000) div {total}"))
    )
    return exact.orderBy(F.desc("cnt"), "token")


def corpus_drift(
    docs: DataFrame,
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Per-``by``-slice distribution drift: KL(p_slice ‖ p_corpus) over
    unigram token distributions, in nats. The monitoring primitive for
    a continuously-ingested corpus — a crawl snapshot or source whose
    KL jumps got topically/generatively different from the corpus body
    (cf. distribution-shift detection via token-level divergence,
    public).

    Derivation chain keeps ONE corpus tokenize: slice counts c_st are
    the only explode-aggregate; slice totals n_s AND corpus counts c_t
    both derive from c_st (second-level aggregates over the small
    (slice, token) table, not the token stream). Zero-count terms
    contribute nothing (p_s = 0 limit), so the sum runs over the c_st
    table. The slice-totals join broadcasts (|slices| rows); the
    corpus-count join is token-keyed on an already-token-partitioned
    frame."""
    from wc_vector_indexing_spark.functions.partitioning import fan_out
    from wc_vector_indexing_spark.operators.lm_score import _tokens

    toks = fan_out(docs).select(
        F.col(by), F.explode(_tokens(text_col)).alias("tok")
    )
    # materialize the (slice, token) counts ONCE: three downstream
    # aggregates derive from this table, and without the checkpoint
    # each re-plans the full corpus tokenize (4 scans + 4 explodes in
    # the physical plan — the 100 TB killer this operator exists to
    # avoid)
    cst = (
        toks.groupBy(by, "tok")
        .agg(F.count("*").alias("c_st"))
        .localCheckpoint(eager=True)
    )
    ns = cst.groupBy(by).agg(F.sum("c_st").alias("n_s"))
    ct = cst.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    n = ns.agg(F.sum("n_s").alias("n"))
    ps = F.col("c_st") / F.col("n_s")
    p = F.col("c_t") / F.col("n")
    return (
        cst.join(F.broadcast(ns), by)
        .join(ct, "tok")
        .crossJoin(F.broadcast(n))
        .groupBy(by)
        .agg(
            F.first("n_s").alias("n_tokens"),
            F.round(F.sum(ps * F.log(ps / p)), 4).alias("kl_nats"),
        )
    )
