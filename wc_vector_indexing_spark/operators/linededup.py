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
