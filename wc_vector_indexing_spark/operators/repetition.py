"""Repetition-based quality signals — the Gopher repetition filters
(Rae et al. 2021, "Scaling Language Models: ... Gopher", Appendix A1.1,
public), the standard second quality pass a large-scale training-data
pipeline runs after the cheap length/punctuation heuristics
(textstats.text_quality): documents that are mostly repeated lines or
repeated n-grams are boilerplate/spam, not prose.

Per-document signals:

  n_lines             total lines (split on \\n)
  dup_line_frac       fraction of line slots occupied by repeats
                      (1 - distinct/total)
  dup_line_char_frac  fraction of line characters in occurrences beyond
                      each line's first
  top_2gram_char_frac max over word-2-grams of count*len(gram), over
                      total chars — a deterministic variant of Gopher's
                      "fraction of characters in the most common n-gram"
                      (pure numeric max: no tie-break divergence between
                      engines, unlike argmax-then-measure)
  dup_5gram_char_frac sum over repeated word-5-grams of (count-1)*len,
                      over total chars (overlaps between occurrences are
                      not de-duplicated — documented approximation; the
                      signal is monotone in repetition either way)

Scale shape: two explode → groupBy(doc_id, unit) → groupBy(doc_id)
aggregations joined on doc_id. Every shuffle key includes doc_id, so
skew is bounded by the largest single document, not by corpus-wide hot
keys; partial aggregation (map-side combine) applies at every level.
The n-gram branch is pure Catalyst (transform/slice/array_join) — no
Python in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.textstats import tokens_col


def _word_ngrams(toks, n: int):
    """Array of space-joined word n-grams; empty when fewer than n
    tokens (guarded — F.sequence would count DOWN for a negative span)."""
    count = F.size(toks) - (n - 1)
    idx = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram_n: int = 2,
    dup_ngram_n: int = 5,
) -> DataFrame:
    """Per-doc repetition metrics (rounded to 4 decimals, ratios in
    [0,1]); docs with no qualifying units get 0.0, not NULL, so the
    downstream gate can use plain ``<`` comparisons."""
    from wc_vector_indexing_spark.functions.partitioning import fan_out

    docs = fan_out(docs)  # three explode branches re-scan the text; parallelize them
    c = F.col(text_col)

    # -- line branch -------------------------------------------------------
    lines = docs.select(
        F.col(id_col), F.explode(F.split(c, r"\n")).alias("line")
    )
    line_counts = lines.groupBy(id_col, "line").agg(F.count("*").alias("c"))
    line_stats = line_counts.groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        F.round(
            (F.sum("c") - F.count("*")) / F.sum("c"), 4
        ).alias("dup_line_frac"),
        F.coalesce(
            F.round(
                F.sum((F.col("c") - 1) * F.length("line"))
                / F.nullif(F.sum(F.col("c") * F.length("line")), F.lit(0)),
                4,
            ),
            F.lit(0.0),
        ).alias("dup_line_char_frac"),
    )

    # -- n-gram branch -----------------------------------------------------
    toks = docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        tokens_col(c).alias("t"),
    )
    grams = toks.select(
        id_col,
        "n_chars",
        F.explode(_word_ngrams(F.col("t"), top_ngram_n)).alias("g2"),
    )
    g2_counts = grams.groupBy(id_col, "n_chars", "g2").agg(F.count("*").alias("c"))
    g2_stats = g2_counts.groupBy(id_col, "n_chars").agg(
        F.round(
            F.max(F.col("c") * F.length("g2")) / F.nullif(F.col("n_chars"), F.lit(0)),
            4,
        ).alias("top_2gram_char_frac")
    ).drop("n_chars")

    g5 = toks.select(
        id_col,
        "n_chars",
        F.explode(_word_ngrams(F.col("t"), dup_ngram_n)).alias("g5"),
    )
    g5_counts = g5.groupBy(id_col, "n_chars", "g5").agg(F.count("*").alias("c"))
    g5_stats = g5_counts.groupBy(id_col, "n_chars").agg(
        F.round(
            F.sum(
                F.when(F.col("c") > 1, (F.col("c") - 1) * F.length("g5")).otherwise(
                    F.lit(0)
                )
            )
            / F.nullif(F.col("n_chars"), F.lit(0)),
            4,
        ).alias("dup_5gram_char_frac")
    ).drop("n_chars")

    return (
        docs.select(id_col)
        .join(line_stats, id_col, "left")
        .join(g2_stats, id_col, "left")
        .join(g5_stats, id_col, "left")
        .select(
            id_col,
            F.col("n_lines").cast("long").alias("n_lines"),
            "dup_line_frac",
            "dup_line_char_frac",
            F.coalesce("top_2gram_char_frac", F.lit(0.0)).alias("top_2gram_char_frac"),
            F.coalesce("dup_5gram_char_frac", F.lit(0.0)).alias("dup_5gram_char_frac"),
        )
    )


# Gopher Table A1 thresholds (the paper filters docs exceeding these)
DEFAULT_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "dup_5gram_char_frac": 0.15,
}


def repetition_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Rows of ``docs`` whose repetition signals are all under the
    (Gopher-default) thresholds — the filter form of the signals, for
    use as a curation stage."""
    th = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    sig = repetition_signals(docs, text_col=text_col, id_col=id_col)
    keep = sig
    for col, bound in th.items():
        keep = keep.filter(F.col(col) <= bound)
    return docs.join(keep.select(id_col), id_col, "left_semi")
