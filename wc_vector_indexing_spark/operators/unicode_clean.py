"""Unicode hygiene for web-scale text ingest — NFC normalization,
zero-width/control stripping, mojibake repair.

Raw crawl text arrives with combining-character sequences ("e" +
U+0301 vs "é"), zero-width joiners/BOMs pasted mid-word, C0 controls,
and UTF-8-read-as-Latin-1 mojibake ("Ã©" for "é"). All of these break
hashing-based dedup (two visually identical docs hash differently),
tokenization and fingerprinting, so every serious pipeline normalizes
FIRST (cf. ftfy and the normalization steps in C4/CCNet pipelines —
public). The reference normalizes HTML entities via WordPress helpers
(class-field-normalizer.php plain()); codepoint-level normalization is
north-star surface.

Scale shape: everything here is a per-row map —
  * `strip_invisible_col` is pure-codegen regexp_replace (zero Python);
  * NFC and mojibake repair are Arrow-batched pandas UDFs (stdlib
    `unicodedata` has no Catalyst equivalent) — no shuffle, stream-safe,
    and the Python hop is amortized over the Arrow batch.
NFC is idempotent and engine-portable: DuckDB's `nfc_normalize`
(utf8proc) and Python's `unicodedata` both implement canonical
composition, so the oracle matches byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# zero-width space / non-joiner / joiner / BOM — invisible codepoints
# that split tokens and poison content hashes
_INVISIBLE = "[\u200b\u200c\u200d\ufeff]"
# C0 controls except \t and \n, plus DEL
_CONTROLS = "[\x00-\x08\x0b-\x1f\x7f]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_invisible_col(col: Column | str) -> Column:
    """Remove zero-width characters and C0 controls (keeping tab and
    newline). Pure codegen — no Python."""
    return F.regexp_replace(
        F.regexp_replace(_c(col), _INVISIBLE, ""), _CONTROLS, ""
    )


def nfc_normalize_col(col: Column | str) -> Column:
    """Canonical NFC composition via an Arrow-batched pandas UDF
    (stdlib unicodedata)."""
    from pyspark.sql.functions import pandas_udf

    # no hints: `from __future__ import annotations` stringizes them,
    # which pandas_udf's signature inference rejects
    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _nfc(_c(col))


def fix_mojibake_col(col: Column | str) -> Column:
    """Repair the classic UTF-8-decoded-as-Latin-1 double encoding
    ("Ã©" → "é"): when the text contains the telltale Ã/Â lead bytes
    AND relatin-1-encoding then utf-8-decoding round-trips cleanly,
    take the repaired form; otherwise pass through unchanged. The
    heuristic is conservative — text that isn't mojibake fails one of
    the two gates and survives byte-identical."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fix(s):
        def one(t):
            if t is None or ("Ã" not in t and "Â" not in t):
                return t
            try:
                repaired = t.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return t
            return repaired

        return s.map(one)

    return _fix(_c(col))


def unicode_clean(
    docs: DataFrame,
    text_col: str = "text",
    repair_mojibake: bool = True,
) -> DataFrame:
    """``text_col`` replaced by its cleaned form (mojibake repair →
    NFC → invisible/control strip), plus a ``was_dirty`` flag so the
    hygiene rate is one cheap aggregate away. Map-only, stream-safe."""
    c = _c(text_col)
    cleaned = fix_mojibake_col(c) if repair_mojibake else c
    cleaned = strip_invisible_col(nfc_normalize_col(cleaned))
    return docs.withColumn("was_dirty", cleaned != c).withColumn(text_col, cleaned)
