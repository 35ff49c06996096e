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


def vocab_with_ids(docs: DataFrame, k: int = 1000, text_col: str = "text") -> DataFrame:
    """(token, n, token_id): the top-K vocabulary with dense ids
    assigned by (frequency desc, token asc) rank — deterministic, so a
    vocabulary rebuilt from the same corpus maps identically. The
    window runs over the already-LIMITed K rows, not the corpus."""
    from pyspark.sql import Window

    return vocab_topk(docs, k, text_col).withColumn(
        "token_id",
        F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("token"))
        ) - 1,
    )


def encode_tokens(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """Text → token-id sequences against a fitted vocabulary: the step
    that turns a curated corpus into model input. Out-of-vocabulary
    tokens map to ``unk_id``; token order is preserved.

    Plan: posexplode → broadcast vocab join (the vocabulary is K rows
    by construction) → one groupBy(doc) reassembly via array_sort on
    (pos, id) structs. One shuffle keyed by doc id — skew bounded by
    the longest single document. Docs with no tokens are absent
    (explode semantics), matching the chunker's skip-empty contract.

    Returns (id_col, n_tokens, token_ids array<int>).
    """
    from wc_vector_indexing_spark.functions.partitioning import fan_out

    toks = fan_out(docs).select(
        F.col(id_col),
        F.posexplode(
            F.filter(tokens_col(text_col), lambda x: x != "")
        ).alias("pos", "token"),
    )
    mapped = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).withColumn("token_id", F.coalesce(F.col("token_id"), F.lit(unk_id)).cast("int"))
    return mapped.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
            lambda x: x["token_id"],
        ).alias("token_ids"),
    )


def encode_tokens_col(
    vocab_ids: dict[str, int], text_col: str = "text", unk_id: int = -1
):
    """In-row vocabulary encoding as a pure column expression: the
    stream-safe twin of :func:`encode_tokens` (same contract as the
    DSIR in-row scorer — no join, no state, identical on a static
    backfill frame). ``vocab_ids`` is the collected K-bounded
    vocabulary ({token: id}, e.g. from ``vocab_with_ids``); it folds
    into a literal map, so K must be vocabulary-sized (10⁴ish), which
    it is by construction."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(tokens_col(c), lambda x: x != "")
    if not vocab_ids:
        return F.transform(toks, lambda t: F.lit(unk_id))
    items = sorted(vocab_ids.items())
    lut = F.map_from_arrays(
        F.array(*[F.lit(k) for k, _ in items]),
        F.array(*[F.lit(int(v)) for _, v in items]),
    )
    return F.transform(
        toks, lambda t: F.coalesce(F.element_at(lut, t), F.lit(unk_id)).cast("int")
    )


def decode_tokens_col(
    vocab_ids: dict[str, int], ids_col: str = "token_ids", unk_token: str = "<unk>"
):
    """Inverse of the encoders, for debugging/inspection: token-id
    arrays back to text. In-row literal-map lookup (id → token), OOV
    ids render as ``unk_token``. Round-trips with encode for in-vocab
    tokens; whitespace normalization is lossy by design (the tokenizer
    lowercased and collapsed whitespace)."""
    c = F.col(ids_col) if isinstance(ids_col, str) else ids_col
    if not vocab_ids:
        return F.array_join(F.transform(c, lambda _: F.lit(unk_token)), " ")
    items = sorted(vocab_ids.items(), key=lambda kv: kv[1])
    lut = F.map_from_arrays(
        F.array(*[F.lit(int(v)) for _, v in items]),
        F.array(*[F.lit(k) for k, _ in items]),
    )
    return F.array_join(
        F.transform(c, lambda i: F.coalesce(F.element_at(lut, i.cast("int")), F.lit(unk_token))),
        " ",
    )
