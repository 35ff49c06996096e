"""Published heuristic cleaning filters for web-scale training corpora:
C4-style line cleaning (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning", §2.2) and Gopher-style document rules (Rae et al.
2021, "Scaling Language Models", §A1.1). The reference system has no
corpus-cleaning surface — this is north-star training-data-pipeline
capability alongside operators/textstats.py.

Everything is pure Catalyst higher-order-function expressions (no UDFs):
split → filter → rejoin runs inside whole-stage codegen directly over
the parquet scan. At 100 TB this is the ideal shape — a zero-shuffle
map pass whose cost is one text-column scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.textstats import tokens_col

# C4 line rules (public defaults): a line survives iff it ends in
# terminal punctuation, has >= 5 words, and carries no web boilerplate
# marker. Doc survives iff >= 3 lines survive (stand-in for the paper's
# >= 3 sentences on the line-structured corpora this engine processes).
C4_MIN_WORDS = 5
C4_MIN_LINES = 1
C4_BLOCKLIST = ("javascript", "cookie", "privacy policy", "{")


def _line_words(line: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(line), r"\s+"), lambda w: w != ""))


def c4_keep_line(line: Column, min_words: int = C4_MIN_WORDS) -> Column:
    """The C4 line predicate as a boolean column over one line."""
    terminal = line.rlike(r'[.!?"]\s*$')
    enough = _line_words(line) >= min_words
    lowered = F.lower(line)
    blocked = None
    for term in C4_BLOCKLIST:
        hit = lowered.contains(term)
        blocked = hit if blocked is None else (blocked | hit)
    return terminal & enough & ~blocked


def c4_keep_col(
    text_col: str | Column = "text",
    min_words: int = C4_MIN_WORDS,
    min_lines: int = C4_MIN_LINES,
) -> Column:
    """Document-level C4 keep predicate as a standalone column — usable
    directly in a streaming filter (pure per-row expression, no state)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    kept = F.filter(F.split(c, "\n"), lambda ln: c4_keep_line(ln, min_words))
    return F.size(kept) >= min_lines


def c4_line_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = C4_MIN_WORDS,
    min_lines: int = C4_MIN_LINES,
) -> DataFrame:
    """Per-document C4 cleaning: (doc_id, n_lines, n_kept, clean_text,
    c4_keep). ``clean_text`` is the surviving lines rejoined; ``c4_keep``
    marks docs with >= ``min_lines`` surviving lines."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda ln: c4_keep_line(ln, min_words))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        (F.size(kept) >= min_lines).alias("c4_keep"),
    )


# Gopher document-level rules (public defaults, adapted to this corpus's
# short synthetic docs only via the word-count floor parameter).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MIN_ALPHA_RATIO = 0.8


def _gopher_signals(text_col: str | Column) -> dict[str, Column]:
    """The five Gopher signal columns (rounded) as pure expressions."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(tokens_col(c), lambda w: w != "")
    n_words = F.size(words)
    denom = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.round(
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / denom,
        4,
    )
    n_symbols = F.size(F.split(c, "#")) - 1 + F.size(F.split(c, r"\.\.\.")) - 1
    lines = F.split(c, "\n")
    bullet_lines = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "symbol_ratio": F.round(n_symbols.cast("double") / denom, 4),
        "bullet_ratio": F.round(
            bullet_lines.cast("double")
            / F.greatest(F.size(lines), F.lit(1)).cast("double"),
            4,
        ),
        "alpha_ratio": F.round(alpha_words.cast("double") / denom, 4),
    }


def _gopher_pass(s: dict[str, Column], min_words: int, max_words: int) -> Column:
    return (
        s["n_words"].between(min_words, max_words)
        & s["mean_word_len"].between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (s["symbol_ratio"] <= GOPHER_MAX_SYMBOL_RATIO)
        & (s["bullet_ratio"] <= GOPHER_MAX_BULLET_RATIO)
        & (s["alpha_ratio"] >= GOPHER_MIN_ALPHA_RATIO)
    )


def gopher_pass_col(
    text_col: str | Column = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
) -> Column:
    """The conjunctive Gopher pass flag as a standalone column — the
    stream-safe twin of ``gopher_rules`` (same contract as
    textstats.quality_score_col: pure per-row expression, no state)."""
    return _gopher_pass(_gopher_signals(text_col), min_words, max_words)


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
) -> DataFrame:
    """Per-document Gopher quality signals + the conjunctive pass flag:
    word count bounds, mean word length in [3, 10], hash/ellipsis symbol
    ratio <= 0.1, bullet-led line ratio <= 0.9, and >= 80% of words
    containing an alphabetic character."""
    sig = _gopher_signals(text_col)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        *[col.alias(name) for name, col in sig.items()],
    )
    # recompute the predicate over the OUTPUT columns so the reported
    # (rounded) signals and the flag can never disagree
    named = {name: F.col(name) for name in sig}
    return out.withColumn("gopher_pass", _gopher_pass(named, min_words, max_words))


def blocklist_hits(text_col: str | Column, blocklist: tuple[str, ...]) -> Column:
    """Token-level blocklist hit count as a standalone column (stream-
    safe, zero shuffle): size(filter(tokens ∈ blocklist))."""
    toks = tokens_col(text_col)
    return F.size(F.filter(toks, lambda t: t.isin(*blocklist)))


def blocklist_gate(
    docs: DataFrame,
    blocklist: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
) -> DataFrame:
    """C4's page-level blocklist rule (Raffel et al. 2020 §2.2: drop
    any page containing a word from a public blocklist — production
    swaps in the LDNOOBW word list; the default here is caller-supplied
    so the engine ships no embedded lexicon). Emits every document with
    its hit count and keep flag rather than filtering, so the same pass
    serves both the gate (``filter(keep)``) and the removal audit the
    paper reports.

    Token-level exact matching (lowercased whitespace tokens) — the
    published rule's word-boundary form; substring matching would
    false-positive on 'scunthorpe'. Pure higher-order-function codegen:
    one text-column scan, zero shuffle, stream-safe.
    """
    hits = blocklist_hits(text_col, blocklist)
    return docs.select(
        F.col(id_col),
        hits.alias("n_blocked"),
        (hits <= max_hits).alias("keep"),
    )
