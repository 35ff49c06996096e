"""PII detection and scrubbing for training-data curation.

The standard pre-training privacy pass (BigScience/ROOTS-style): detect
emails, IPv4 addresses, phone numbers, SSN-shaped ids and credit-card
numbers with anchored regexes, report per-document counts, and redact
matches with typed placeholder tags.

Reference parity: the reference masks secrets before indexing
(class-indexer.php wc_vi_mask_secrets — API keys / bearer tokens); this
module generalizes that single masking pass (functions/text.py
mask_secrets, P14) to the PII families a public-web corpus needs.

Scale: pure Catalyst ``regexp_count`` / ``regexp_replace`` expressions —
whole-stage codegen over the scan, zero shuffle, zero Python. At 100 TB
this is exactly a map-only pass; the per-type counts aggregate
map-side-partially if rolled up.

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): no backreferences, no lookbehind, ASCII classes
only, so both engines find the identical leftmost non-overlapping match
set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: scrubbing applies these top-to-bottom, and order matters where
# families overlap (a credit-card number contains phone-shaped digit
# runs; SSNs are masked before generic phone matching can eat them).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("cc16", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\+\d{1,3}[- ]\d{3}[- ]\d{4}\b"),
]


def _c(text_col: str | Column) -> Column:
    return F.col(text_col) if isinstance(text_col, str) else text_col


def pii_count_cols(text_col: str | Column) -> dict[str, Column]:
    """Per-family match-count column expressions (stream-safe, no join).

    Counts are taken on the *progressively scrubbed* text, mirroring the
    scrub order, so overlapping families don't double-count: e.g. the
    digit quads inside an already-matched credit card are never also
    counted as a phone.
    """
    out: dict[str, Column] = {}
    cur = _c(text_col)
    for name, pat in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, f"[{name.upper()}]")
    return out


def scrub_col(text_col: str | Column) -> Column:
    """The fully scrubbed text as one column expression: each family's
    matches replaced by its ``[TYPE]`` tag, applied in PII_PATTERNS
    order."""
    cur = _c(text_col)
    for name, pat in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, f"[{name.upper()}]")
    return cur


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII report + redacted text.

    Output: id, one ``n_<family>`` count per family, ``n_pii`` total,
    and ``scrubbed`` (the redacted text). Filter ``n_pii > 0`` for the
    audit view; write ``scrubbed`` as the training text.
    """
    counts = pii_count_cols(text_col)
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return docs.select(
        F.col(id_col),
        *[col.alias(f"n_{name}") for name, col in counts.items()],
        total.alias("n_pii"),
        scrub_col(text_col).alias("scrubbed"),
    )
