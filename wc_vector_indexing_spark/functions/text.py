"""Text-normalization column functions — all JVM-side built-ins, no UDFs.

These mirror the reference's scalar transforms (SURVEY §2.2) as Catalyst
expressions so they stay inside whole-stage codegen:

  * plain()           — class-field-normalizer.php:450-455 (P2)
  * normalize_text()  — class-chunker.php:109-123 (C2)
  * document assembly — class-field-normalizer.php:69-78 (P10)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def plain(col: Column | str) -> Column:
    """HTML → plain text: strip tags, collapse whitespace runs to one
    space, trim (class-field-normalizer.php:450-455)."""
    c = F.col(col) if isinstance(col, str) else col
    no_tags = F.regexp_replace(c, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def normalize_text(col: Column | str) -> Column:
    """Chunker pre-normalization (class-chunker.php:109-123):
    CRLF/CR → LF, tabs → space, trim each line's edges, collapse 3+
    newlines → 2, trim the ends.

    Must byte-match the Python-side ``operators.chunker.normalize_text``
    (the chunker UDF re-normalizes defensively; fingerprints depend on it).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\r\n?", "\n")
    c = F.regexp_replace(c, r"\t", " ")
    c = F.regexp_replace(c, r"[ \t]*\n[ \t]*", "\n")  # trim around newlines
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.trim(c)


def label_line(label: str, col: Column | str) -> Column:
    """One '"Label: value"' document line; empty when the value is empty
    (class-field-normalizer.php:69-78)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = plain(c.cast("string"))
    return F.when(
        cleaned.isNull() | (cleaned == ""), F.lit("")
    ).otherwise(F.concat(F.lit(label + ": "), cleaned))


def assemble_document(*line_cols: Column) -> Column:
    """Join non-empty section lines with newlines (P10):
    concat_ws('\\n', filter(array(...), x -> x != ''))."""
    arr = F.array(*line_cols)
    non_empty = F.filter(arr, lambda x: x.isNotNull() & (x != ""))
    return F.array_join(non_empty, "\n")


def mask_secret(col: Column | str, keep: int = 4) -> Column:
    """Key masking 'sk-****abcd' (class-options.php:115-119, P14)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (F.length(c) <= keep), F.lit("****")).otherwise(
        F.concat(F.lit("****"), F.substring(c, -keep, keep))
    )


def error_snippet(col: Column | str, max_len: int = 200) -> Column:
    """Tag-strip + truncate error text (class-embeddings.php:152-162, P14)."""
    return F.substring(plain(col), 1, max_len)


def natural_sort_key(col: Column | str, case_insensitive: bool = False) -> Column:
    """Sort key reproducing PHP SORT_NATURAL (K6,
    class-variation-rollup.php:98,112 / class-fingerprint.php:77,88):
    split into digit / non-digit runs (regexp_extract_all — pure
    Catalyst), left-pad digit runs to 12 so numeric runs order
    numerically under plain lexicographic comparison ("item2" <
    "item10"). SORT_FLAG_CASE = lowercase first. Approximation notes:
    digit runs of 12+ digits compare lexicographically (beyond any
    realistic attribute/SKU numeral); strnatcmp's whitespace skipping
    and leading-zero tie rules are not reproduced — ties break on the
    original string instead."""
    c = F.col(col) if isinstance(col, str) else col
    if case_insensitive:
        c = F.lower(c)
    runs = F.regexp_extract_all(c, F.lit("[0-9]+|[^0-9]+"), 0)
    padded = F.transform(
        runs,
        lambda x: F.when(
            x.rlike("^[0-9]+$") & (F.length(x) < 12), F.lpad(x, 12, "0")
        ).otherwise(x),
    )
    return F.array_join(padded, "")


def natural_array_sort(arr: Column, case_insensitive: bool = False) -> Column:
    """array_sort under the natural-sort key (K6): decorate with the
    key, sort structs (key first, original value as tiebreak), strip."""
    keyed = F.transform(
        arr,
        lambda x: F.struct(
            natural_sort_key(x, case_insensitive).alias("k"), x.alias("v")
        ),
    )
    return F.transform(F.array_sort(keyed), lambda s: s["v"])
