"""Compression-ratio quality signal — zlib deflate ratio per document.

Highly compressible text (boilerplate, templates, repeated n-grams,
machine-generated spam) is a classic drop signal in large-corpus
curation (used alongside the Gopher repetition rules — see
`operators/repetition.py` for the pure-Catalyst char-fraction twins).
The deflate ratio is the cheap information-density proxy: one pass,
no model, no corpus statistics.

Scale design (100 TB corpus):
  * Pure map pass — zero shuffle, zero corpus state. The only
    non-Catalyst piece is the zlib call itself, which runs as an
    Arrow-batched pandas UDF (one Python round-trip per batch, never
    per row); everything around it (byte length, ratio, gate predicate)
    stays in whole-stage codegen.
  * Stream-safe: scalar pandas UDFs evaluate per micro-batch with no
    state, so the same column expressions drop into
    `streaming/incremental.py` pipelines unchanged.
  * Determinism: zlib level is pinned (6) and deflate output for a
    fixed (input, level, strategy) is stable for a given zlib build —
    the container pins one. No SQL oracle exists (DuckDB has no
    compress()), so the registry entry is rows-only and correctness is
    pinned by golden equality against driver-side `zlib.compress` in
    `tests/test_compressibility.py`.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

ZLIB_LEVEL = 6
_deflate_udf = None


def _deflate_size():
    # built lazily: the pandas_udf decorator needs an active session
    global _deflate_udf
    if _deflate_udf is None:

        def f(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: len(zlib.compress(t.encode("utf-8"), ZLIB_LEVEL))
                if t is not None
                else None
            )

        _deflate_udf = pandas_udf(f, T.LongType())
    return _deflate_udf


def deflate_size_col(text_col: str | Column) -> Column:
    """Compressed byte size of the UTF-8 text — Arrow-batched."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _deflate_size()(c)


def compression_ratio(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bytes, n_deflate, ratio): deflate_bytes / raw_bytes,
    rounded to 4dp. Low ratio = repetitive/templated text; ~1.0+ =
    high-entropy (random or already-compressed) text — both tails are
    suspect in a training corpus."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.octet_length(c).alias("n_bytes"),
        deflate_size_col(c).alias("n_deflate"),
    ).withColumn(
        "ratio",
        F.round(F.col("n_deflate") / F.greatest(F.col("n_bytes"), F.lit(1)), 4),
    )


def compressibility_gate(
    docs: DataFrame,
    min_ratio: float = 0.25,
    max_ratio: float = 1.1,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose deflate ratio falls in the plausible-text
    band. The thresholds follow the common curation practice of cutting
    both extreme-boilerplate (ratio → 0) and binary-garbage
    (ratio ≥ ~1) tails."""
    r = deflate_size_col(text_col) / F.greatest(
        F.octet_length(F.col(text_col)), F.lit(1)
    )
    return docs.filter(r.between(min_ratio, max_ratio))
