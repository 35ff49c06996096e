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

Scale shape: ZERO shuffles — every signal is per-document local, so the
whole computation is one Arrow-batched map over the scan (unit splitting
stays in Catalyst so boundaries match the SQL oracle bit-for-bit; the
counting is per-row python over that doc's own units). Skew is bounded
by the largest single document.
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
    downstream gate can use plain ``<`` comparisons.

    Every metric is PER-DOCUMENT LOCAL, so the right plan is a pure
    map, not the explode -> groupBy(doc, unit) -> groupBy(doc) -> join
    cascade (6 shuffles whose keys all contain doc_id — shuffling data
    to regroup rows that were never apart). One Arrow pass computes all
    five signals; splitting stays in Catalyst (F.split / tokens_col) so
    unit boundaries are bit-identical to the SQL oracle's, and rounding
    replicates Spark's Round(double) exactly (shortest-decimal repr,
    HALF_UP — ``_r4``). Zero shuffles at any scale; skew bound is the
    largest single document."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from wc_vector_indexing_spark.functions.partitioning import fan_out

    c = F.col(text_col)
    prepped = fan_out(docs).select(
        F.col(id_col).alias("_id"),
        F.length(c).alias("_n_chars"),
        F.split(c, r"\n").alias("_lines"),
        tokens_col(c).alias("_toks"),
    )

    q4 = Decimal("0.0001")

    def _r4(x: float) -> float:
        # Spark Round(double) = BigDecimal.valueOf(d).setScale(4, HALF_UP):
        # shortest-roundtrip decimal repr, then half-up — repr() is the
        # same shortest-roundtrip algorithm on the python side
        return float(Decimal(repr(x)).quantize(q4, rounding=ROUND_HALF_UP))

    def _ngram_stats(toks, n_chars, n, want_top):
        from collections import Counter

        counts = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        if not counts or not n_chars:
            return None
        if want_top:
            return _r4(max(cnt * len(g) for g, cnt in counts.items()) / n_chars)
        return _r4(
            sum((cnt - 1) * len(g) for g, cnt in counts.items() if cnt > 1) / n_chars
        )

    def compute(batches):
        from collections import Counter

        for pdf in batches:
            out = []
            for _id, n_chars, lines, toks in zip(
                pdf["_id"], pdf["_n_chars"], pdf["_lines"], pdf["_toks"]
            ):
                if lines is None:  # null text: mirror the left-join NULLs
                    out.append((_id, None, None, None, 0.0, 0.0))
                    continue
                lines = list(lines)
                lc = Counter(lines)
                n_lines = len(lines)
                dup_line_frac = _r4((n_lines - len(lc)) / n_lines)
                char_total = sum(cnt * len(ln) for ln, cnt in lc.items())
                dup_chars = sum((cnt - 1) * len(ln) for ln, cnt in lc.items())
                dup_line_char_frac = (
                    _r4(dup_chars / char_total) if char_total else 0.0
                )
                toks = list(toks) if toks is not None else []
                top_g = _ngram_stats(toks, n_chars, top_ngram_n, want_top=True)
                dup_g = _ngram_stats(toks, n_chars, dup_ngram_n, want_top=False)
                out.append(
                    (
                        _id,
                        n_lines,
                        dup_line_frac,
                        dup_line_char_frac,
                        top_g if top_g is not None else 0.0,
                        dup_g if dup_g is not None else 0.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col,
                    "n_lines",
                    "dup_line_frac",
                    "dup_line_char_frac",
                    "top_2gram_char_frac",
                    "dup_5gram_char_frac",
                ],
            )

    return prepped.mapInPandas(
        compute,
        schema=(
            f"{id_col} long, n_lines long, dup_line_frac double, "
            "dup_line_char_frac double, top_2gram_char_frac double, "
            "dup_5gram_char_frac double"
        ),
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
