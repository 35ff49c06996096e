"""Generalized relational operators Spark lacks natively: as-of join and
gap sessionization (training-pipeline / event-analytics surface).

Both use the single-window pattern — one shuffle on the key, one
per-partition sort — which scales linearly and avoids per-group pandas
or range-explosion joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, the single right row with the greatest
    right_ts <= left_ts (direction='backward'; 'forward' = least
    right_ts >= left_ts) within the same ``on`` key. Left rows with no
    match keep NULLs — i.e. an ASOF LEFT JOIN.

    Implementation: tag and union both sides, sort per key by time with
    right rows first on ties (inclusive semantics), carry right values
    forward with last(ignorenulls) — one shuffle + one sort regardless
    of key skew between sides.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in rcols],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(c + suffix) for c in rcols],
    )
    unioned = l.unionByName(r)

    if direction == "backward":
        # right rows sort before left at equal _t → <= is inclusive
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("_t"), F.asc("_is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.desc("_t"), F.asc("_is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = unioned
    for c in rcols:
        carried = carried.withColumn(
            c + suffix, F.last(F.col(c + suffix), ignorenulls=True).over(w)
        )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left", "_t")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side with
    a random-free deterministic salt derived from a unique-ish column
    set, replicate the right side `salt` ways, join on (key, salt).

    Use when one key dominates (AQE's skew split handles moderate skew;
    salting handles the one-key-is-half-the-table case). Deterministic:
    the salt is a hash of the whole left row, not a random draw.
    """
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(salt))
    )
    r = right.join(
        right.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt")), how="cross"
    )
    return l.join(r, [on, "_salt"], how).drop("_salt")


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a 0-based ``session_id`` per key: a new session starts
    when the gap since the previous event exceeds ``gap_seconds``
    (lag + running sum; batch twin of streaming session_window)."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # Compare gaps at microsecond resolution: cast("long") truncates to
    # whole seconds, so a 1800.4s gap would (wrongly) not split at
    # gap_seconds=1800 while an epoch()-based oracle keeps fractions.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    new_session = F.when(
        ts_us - prev > F.lit(int(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(new_session).over(w))


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key session summary: session count, event count, mean session
    length in events."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(key_col).agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 600,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Bin-bucketed time-range join: for each left row, count right rows
    with the same key whose timestamp falls in
    ``(left_ts - lookback, left_ts]``.

    A naive theta-join (``l.key = r.key AND r.ts BETWEEN l.ts - d AND
    l.ts``) plans as an equi-join on key with the range as a residual
    filter — fine until one key is hot, and catastrophic if the key is
    dropped (cross product). The scale-safe shape used here buckets BOTH
    sides into ``lookback``-sized time bins and equi-joins on
    ``(key, bin)``, with the left side exploded to its two candidate
    bins (a range of width d spans at most 2 bins of width d). The join
    is then a pure equi-join — shuffle keyed by (key, bin), broadcast-
    or sort-merge-planned like any other — and the exact range predicate
    runs as a cheap residual on the ~2x candidate rows.

    Returns ``left`` with ``count_alias`` appended (0 when no right rows
    in range).
    """
    us = int(lookback_seconds) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    # integer `div` (not double /) so bin ids stay exact at epoch-µs scale
    l_bin = F.expr(f"unix_micros({left_ts}) div {us}")
    # left explodes to the two bins a width-d window can touch
    lb = left.withColumn("_bin", F.explode(F.array(l_bin, l_bin - 1))).withColumn(
        "_l_us", l_us
    )
    rb = right.select(
        F.col(on), F.expr(f"unix_micros({right_ts}) div {us}").alias("_bin"),
        r_us.alias("_r_us"),
    )
    joined = lb.join(rb, [on, "_bin"], "left")
    # the range check lives in the aggregate, not a filter: filtering
    # would drop a left row whose candidate-bin matches are ALL out of
    # range (no NULL row survives to represent it)
    in_range = (F.col("_r_us") > F.col("_l_us") - us) & (
        F.col("_r_us") <= F.col("_l_us")
    )
    group_cols = [c for c in left.columns]
    counted = joined.groupBy(*group_cols).agg(
        F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias(count_alias)
    )
    return counted


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "start_ts",
    l_end: str = "end_ts",
    r_start: str = "start_ts",
    r_end: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval overlap join — every (left, right) pair whose
    time spans intersect, with the overlap length appended
    (``overlap_us``). The third member of the temporal-join family next
    to `asof_join` (point→latest-point) and `range_join_count`
    (point→window): both sides here are genuine intervals.

    Scale shape: the naive theta-join (s_a < e_b AND s_b < e_a) plans
    as a cross product. Instead BOTH sides explode to the
    ``bucket_seconds``-wide time bins they cover and equi-join on the
    bin — shuffle keyed by bin, planned like any equi-join — with the
    exact overlap predicate as a residual. A pair sharing several bins
    would duplicate, so each pair is emitted ONLY in the later of the
    two start bins (the first bin where both intervals are present) —
    in-row dedup, no distinct shuffle. Pick ``bucket_seconds`` near the
    median interval length: row blow-up per interval is
    ceil(len/bucket)+1, and a mega-interval's explosion is the skew to
    cap (split such outliers or raise the bucket).

    Output: all left columns (_l-suffixed on collision), all right
    columns (_r-suffixed), plus ``overlap_us > 0``.
    """
    us = int(bucket_seconds) * 1_000_000

    def binned(df: DataFrame, s: str, e: str, suffix: str) -> DataFrame:
        s_us = F.unix_micros(F.col(s))
        e_us = F.unix_micros(F.col(e))
        out = df.select(
            *[F.col(c).alias(c + suffix) for c in df.columns],
            s_us.alias(f"_s{suffix}"),
            e_us.alias(f"_e{suffix}"),
        )
        return out.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.col(f"_s{suffix}") - (F.col(f"_s{suffix}") % us),
                    F.col(f"_e{suffix}") - (F.col(f"_e{suffix}") % us),
                    F.lit(us),
                )
            ),
        )
    lb = binned(left, l_start, l_end, "_l")
    rb = binned(right, r_start, r_end, "_r")
    overlap = (F.col("_s_l") < F.col("_e_r")) & (F.col("_s_r") < F.col("_e_l"))
    # emit only in the later start's bin — the first bin both cover
    first_shared = F.col("_bin") == F.greatest(
        F.col("_s_l") - (F.col("_s_l") % us), F.col("_s_r") - (F.col("_s_r") % us)
    )
    keep = [c for c in lb.columns if not c.startswith("_")] + [
        c for c in rb.columns if not c.startswith("_")
    ]
    return (
        lb.join(rb, "_bin")
        .filter(overlap & first_shared)
        .select(
            *keep,
            (F.least(F.col("_e_l"), F.col("_e_r"))
             - F.greatest(F.col("_s_l"), F.col("_s_r"))).alias("overlap_us"),
        )
    )


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Session funnel analysis — per gap-session, the deepest ``steps``
    prefix completed IN ORDER (ordered-subsequence match: a 'click'
    counts only after a 'view', etc.), then sessions counted per stage.
    Output (stage, step — the step name reached, '(none)' for stage 0,
    n_sessions).

    The MATCH_RECOGNIZE-ish pattern without a row-pattern engine: one
    session window (shared with `sessionize`), one per-session
    collect_list sorted in-row, then the subsequence scan is pure
    Catalyst array arithmetic (array_position + slice per step — zero
    Python, zero extra shuffle). Per-session lists are session-sized —
    bounded by the gap, not the corpus."""
    s = sessionize(events, key_col, ts_col, gap_seconds, order_tiebreak)
    order_struct = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    ) + [F.col(type_col)]
    per = s.groupBy(key_col, "session_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(*order_struct))),
            lambda x: x[type_col],
        ).alias("_types")
    )
    # fold the ordered-subsequence scan: track the remaining list slice
    # and the stage counter as columns
    rest = F.col("_types")
    stage = F.lit(0)
    for i, step in enumerate(steps):  # enumerate: repeated step names each advance
        pos = F.array_position(rest, step)
        advance = (pos > 0) & (stage == F.lit(i))
        stage = F.when(advance, stage + 1).otherwise(stage)
        rest = F.when(
            advance, F.slice(rest, pos + 1, F.greatest(F.size(rest) - pos, F.lit(0)))
        ).otherwise(rest)
    labeled = per.select(stage.alias("stage"))
    names = ["(none)"] + list(steps)
    name_col = F.element_at(F.array(*[F.lit(n) for n in names]), F.col("stage") + 1)
    return (
        labeled.groupBy("stage")
        .agg(F.count("*").alias("n_sessions"))
        .select("stage", name_col.alias("step"), "n_sessions")
        .orderBy("stage")
    )
