"""Corpus vocabulary / heavy hitters — the token-frequency pass that
feeds tokenizer training (BPE/unigram vocab induction starts from
corpus word counts) and corpus diagnostics (stopword drift, boilerplate
tokens).

Exact path: explode tokens → one hash aggregation (map-side combine
does most of the work — token frequency follows Zipf, so partial
aggregation collapses the head before the shuffle) → top-K via
TakeOrderedAndProject. Deterministic tie-break (count desc, token asc)
so the K boundary is engine-stable and the DuckDB oracle hash-matches.

Sketch path: Spark's count_min_sketch aggregate — one merged sketch
(eps, confidence) instead of the full token->count map; point-query it
for candidate tokens. At 100 TB the exact aggregation is still fine
(the distinct-token universe is tens of millions, far smaller than the
corpus); the sketch is for the streaming/bounded-memory variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.textstats import tokens_col


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) for every non-empty token, exact."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-K tokens by frequency; (n desc, token asc) makes the cut
    deterministic."""
    return token_counts(docs, text_col).orderBy(F.desc("n"), F.asc("token")).limit(k)


def token_sketch(docs: DataFrame, text_col: str = "text", eps: float = 0.001, confidence: float = 0.99):
    """One merged count-min sketch over the token stream (bounded
    memory: width ~ e/eps, depth ~ ln(1/confidence) — independent of
    the vocabulary size). Returns the raw sketch bytes; point-query
    with pyspark.util or compare estimates in tests."""
    toks = docs.select(F.explode(tokens_col(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    return toks.agg(
        F.count_min_sketch(F.col("token"), F.lit(eps), F.lit(confidence), F.lit(42)).alias(
            "sketch"
        )
    )
