"""Unigram language-model scoring — the CCNet/perplexity-filter shape.

Train a unigram model over a (reference) corpus, then score each
document by its mean negative log-probability: low = looks like the
reference distribution, high = noise/outlier. The classic perplexity
quality filter uses a KenLM 5-gram; the unigram form keeps the identical
pipeline shape (model table → broadcast join → per-doc aggregate) with a
model any SQL engine can reproduce, so the whole path is oracle-checkable.

Scale design (100 TB corpus):
  * model: one map-side-partial count aggregate over exploded tokens —
    a single shuffle keyed by token; the result is vocab-sized (small).
  * scoring: explode tokens → **broadcast** join against the model (the
    model is tiny relative to the corpus; never shuffle the corpus side
    for it) → re-aggregate per doc_id (second shuffle). Both shuffles
    are unavoidable lower bounds for corpus-wide normalization; nothing
    leaves the JVM.
  * unseen tokens (model trained on a different corpus) score with
    additive-smoothing mass ln(1 / (N + |V|)) via the left-join default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z]+"


def _tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda x: x != "")


def token_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, tok) — one row per token occurrence."""
    return docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, logp): ln(count(tok) / N) over the corpus. One shuffle,
    vocab-sized output — persist/broadcast this at scale."""
    toks = docs.select(F.explode(_tokens(text_col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n")).select(F.col("n").cast("double"))
    # scalar total via a 1-row broadcast cross join (no driver collect)
    return counts.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("cnt") / F.col("n")).alias("logp")
    )


def unigram_score(
    docs: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    unseen_logp: float | None = None,
) -> DataFrame:
    """Per-document (id, n_scored, avg_neg_logp) — mean negative log
    probability of the doc's tokens under the unigram model (lower =
    more in-distribution). ``model`` defaults to one trained on ``docs``
    itself (then every token is seen). ``unseen_logp`` is the smoothing
    log-prob for out-of-vocab tokens when scoring against a foreign
    model."""
    if model is None:
        model = unigram_model(docs, text_col)
    toks = token_table(docs, text_col, id_col)
    joined = toks.join(F.broadcast(model), "tok", "left")
    logp = F.col("logp")
    if unseen_logp is not None:
        logp = F.coalesce(logp, F.lit(float(unseen_logp)))
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_scored"),
            F.round(F.avg(-logp), 4).alias("avg_neg_logp"),
        )
    )
