"""Corpus-wide line deduplication — the C4 cleaning step (Raffel et al.
2020, "Exploring the Limits of Transfer Learning..." §2.2 — public):
boilerplate lines (nav menus, cookie banners, license headers) repeat
across millions of pages; C4 keeps ONE occurrence of every three-
sentence span corpus-wide. This operator does the line-granular form:
a line occurring in several documents survives only at its first
occurrence (min (doc_id, position)), everywhere else it is removed,
and documents are reassembled in original line order.

Guard: lines shorter than ``min_chars`` are NEVER deduplicated — short
lines ("", "-", "1.") are legitimately frequent, carry no boilerplate
signal, and are exactly the corpus-wide hot keys that would skew the
shuffle. The guard is therefore both the precision knob AND the skew
mitigation: the deduped branch shuffles only long (rare-ish) lines.

Shape: posexplode → window row_number over line (the one corpus-wide
shuffle, keyed by line content) → reassemble with a doc-keyed
aggregation. Deterministic: first occurrence = smallest (doc_id, pos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 30,
) -> DataFrame:
    """(doc_id, text_clean, n_removed) for every input document; a doc
    whose every line was removed keeps an empty ``text_clean``."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    long_lines = lines.filter(F.length("line") >= min_chars)
    short_lines = lines.filter(F.length("line") < min_chars)

    w = Window.partitionBy("line").orderBy(id_col, "pos")
    survivors = (
        long_lines.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .unionByName(short_lines)
    )
    reassembled = survivors.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            "\n",
        ).alias("text_clean"),
        F.count("*").alias("_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("_total"))
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (F.col("_total") - F.coalesce("_kept", F.lit(0))).alias("n_removed"),
        )
    )


def window_duplication(
    docs: DataFrame,
    window_tokens: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication screen (the window-granular form of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better": suffix-array ExactSubstr re-expressed as rolling token
    windows): per doc, the fraction of its ``window_tokens``-token
    windows that also appear in >= ``min_docs`` distinct documents.

    Plan: window explode (in-row transform over the token array, md5
    window keys) -> df count per window (hash agg, map-side combine) ->
    join back on the window hash -> per-doc agg. Three shuffles, all
    keyed by hash/doc — no corpus self-join. At 100 TB the window table
    is ~tokens-sized: run it per-shard behind a Bloom/top-K prefilter of
    hot windows, or on a sampled corpus — the screen's precision degrades
    gracefully under sampling because memorization-grade duplication is
    frequent by definition.

    Output: (doc_id, n_windows, n_dup, dup_frac) for docs with >= 1
    window; dup windows are those whose text occurs in >= min_docs docs.
    """
    from wc_vector_indexing_spark.functions.partitioning import fan_out

    ws = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != ""
    )
    n_win = F.size(ws) - window_tokens + 1
    idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    # fan_out: the window explode is the CPU stage and a small parquet
    # input arrives single-partition; lazy checkpoint: `wins` feeds both
    # the df-count branch and the join-back branch — without it the
    # explode (md5 over every window) evaluates twice
    wins = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.md5(F.array_join(F.slice(ws, i, window_tokens), " ")),
                )
            ).alias("h"),
        )
        .localCheckpoint(eager=False)
    )
    df_counts = wins.groupBy("h").agg(
        F.count_distinct("doc_id").alias("_ndocs")
    )
    return (
        wins.join(df_counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count_if(F.col("_ndocs") >= min_docs).alias("n_dup"),
            F.round(
                F.count_if(F.col("_ndocs") >= min_docs).cast("double") / F.count("*"), 4
            ).alias("dup_frac"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    window_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring REMOVAL — the rewrite half of Lee et al. 2022's
    ExactSubstr dedup (``window_duplication`` is the screen half): every
    ``window_tokens``-token window that occurs more than once in the
    corpus is removed from all occurrences EXCEPT the globally-first one
    (min (doc_id, pos)), overlapping removals merge, and documents are
    reassembled from their surviving tokens.

    Token-level semantics: case-sensitive whitespace tokens; output
    joins surviving tokens with single spaces (original inter-token
    whitespace is not preserved — the training-corpus form). Removal can
    create new token adjacencies; like the suffix-array original, those
    are not re-deduplicated in the same pass (run a second pass if the
    corpus demands it).

    Plan: in-row window hashing (same md5 rolling windows as
    window_duplication) → ONE corpus-wide shuffle keyed by window hash
    (row_number picks the canonical first occurrence) → doc-keyed
    aggregation of removal starts → broadcast-free join back to the doc
    row → in-row interval-cover rebuild. Skew: a corpus-wide hot window
    is one hash key whose partition holds its occurrence list — bounded
    by occurrence count, and AQE splits stragglers; the rebuild is
    O(tokens × removal-spans) per row, doc-local.
    """
    from wc_vector_indexing_spark.functions.partitioning import fan_out

    k = window_tokens
    toks_expr = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    base = fan_out(docs).select(F.col(id_col).alias("doc_id"), toks_expr.alias("toks"))
    n = F.size("toks")
    n_win = n - k + 1
    idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    wins = base.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    (i - 1).alias("pos"),
                    F.md5(F.array_join(F.slice(F.col("toks"), i, k), " ")).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))

    w_first = Window.partitionBy("h").orderBy("doc_id", "pos")
    removals = (
        wins.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") > 1)  # duplicated occurrence, not the canonical first
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("starts"))
    )

    joined = base.join(removals, "doc_id", "left").withColumn(
        "starts", F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    )
    covered = lambda i: F.exists(  # noqa: E731
        F.col("starts"), lambda r: (i >= r) & (i < r + k)
    )
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 1),
            lambda i: F.when(~covered(i), F.element_at(F.col("toks"), i + 1)),
        ),
        lambda x: x.isNotNull(),
    )
    kept = F.when(F.size("toks") > 0, kept).otherwise(F.array().cast("array<string>"))
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("text_clean"),
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
        F.size("starts").alias("n_dup_windows"),
    )
