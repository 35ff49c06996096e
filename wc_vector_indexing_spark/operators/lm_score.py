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


def bigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(prev, tok, logp_cond): ln(c(prev, tok) / c(prev)) — the
    maximum-likelihood conditional bigram table. c(prev) is the plain
    unigram count (the standard approximation; exact context counts
    would subtract one per doc-final token — both engines use the same
    definition so the oracle stays bit-exact).

    Scale: one posexplode + per-doc lag (shuffle keyed by doc id — the
    same exchange the per-doc score aggregate needs anyway, so Catalyst
    reuses it), then a (prev, tok)-keyed count. Output is
    bigram-vocabulary-sized: Zipf-bounded in practice, and the natural
    candidate for a `min_count` floor at 100 TB."""
    from pyspark.sql import Window

    # _rid must be assigned BEFORE the explode: inside a generator
    # projection each exploded row would get its own id and every
    # bigram group would be a singleton
    rows = docs.select(F.monotonically_increasing_id().alias("_rid"), F.col(text_col))
    toks = rows.select("_rid", F.posexplode(_tokens(text_col)).alias("pos", "tok"))
    w = Window.partitionBy("_rid").orderBy("pos")
    big = toks.withColumn("prev", F.lag("tok").over(w)).filter(
        F.col("prev").isNotNull()
    )
    c2 = big.groupBy("prev", "tok").agg(F.count("*").alias("c2"))
    c1 = docs.select(F.explode(_tokens(text_col)).alias("tok")).groupBy("tok").agg(
        F.count("*").alias("c1")
    )
    return c2.join(
        F.broadcast(c1.withColumnRenamed("tok", "prev")), "prev"
    ).select("prev", "tok", F.log(F.col("c2") / F.col("c1")).alias("logp_cond"))


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations (prev, tok, c2, pmi): pointwise mutual
    information over adjacent word pairs,

        pmi = ln( N · c(prev, tok) / (c(prev) · c(tok)) )

    — the word2vec-phrases / NLTK collocation shape for mining
    multi-word terms ("new york", "machine learning") from a corpus.
    ``min_count`` drops noise pairs (PMI is unstable at tiny counts);
    ordering is total ((rounded pmi) desc, prev, tok) so any engine
    reproduces the exact top-k.

    Scale: the same one-pass bigram/unigram aggregates as
    `bigram_model` (corpus shuffles once, keyed by doc for the lag
    window, once for the pair count); unigram counts broadcast back;
    top-k is TakeOrderedAndProject."""
    from pyspark.sql import Window

    rows = docs.select(F.monotonically_increasing_id().alias("_rid"), F.col(text_col))
    toks = rows.select("_rid", F.posexplode(_tokens(text_col)).alias("pos", "tok"))
    w = Window.partitionBy("_rid").orderBy("pos")
    big = toks.withColumn("prev", F.lag("tok").over(w)).filter(
        F.col("prev").isNotNull()
    )
    c2 = big.groupBy("prev", "tok").agg(F.count("*").alias("c2")).filter(
        F.col("c2") >= min_count
    )
    c1 = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    n = toks.agg(F.count("*").cast("double").alias("n_toks"))
    scored = (
        c2.join(F.broadcast(c1.withColumnRenamed("tok", "prev").withColumnRenamed("c1", "c_prev")), "prev")
        .join(F.broadcast(c1), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "prev",
            "tok",
            "c2",
            F.round(
                F.log(F.col("n_toks") * F.col("c2") / (F.col("c_prev") * F.col("c1"))), 4
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("prev"), F.asc("tok")).limit(k)


def bigram_score(
    docs: DataFrame,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document (id, n_scored, avg_neg_logp) under a Jelinek-Mercer
    interpolated bigram model trained on ``docs`` itself:

        p(tok | prev) = lam · c(prev,tok)/c(prev) + (1−lam) · c(tok)/N

    scored over positions 1..n−1 (the first token has no context).
    Lower = more in-distribution; the bigram term catches scrambled /
    template text that a unigram model scores as perfectly normal —
    the standard step from CCNet's unigram proxy toward KenLM.

    Scale: the corpus bigram stream joins the MODEL on (prev, tok) —
    at catalog scale the model broadcasts; at 100 TB swap to a plain
    shuffle-hash join (both sides keyed identically) plus a `min_count`
    floor on the model table. The unigram leg broadcasts always
    (vocab-sized)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    big = toks.withColumn("prev", F.lag("tok").over(w)).filter(
        F.col("prev").isNotNull()
    )
    c2 = big.groupBy("prev", "tok").agg(F.count("*").alias("c2"))
    c1 = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    n = toks.agg(F.count("*").cast("double").alias("n_toks"))
    cond = c2.join(F.broadcast(c1.withColumnRenamed("tok", "prev")), "prev").select(
        "prev", "tok", (F.col("c2") / F.col("c1")).alias("p_cond")
    )
    scored = (
        big.join(F.broadcast(cond), ["prev", "tok"], "left")
        .join(F.broadcast(c1), "tok", "left")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "p",
            F.lit(lam) * F.coalesce(F.col("p_cond"), F.lit(0.0))
            + F.lit(1.0 - lam) * F.coalesce(F.col("c1"), F.lit(0)) / F.col("n_toks"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_scored"),
        F.round(F.avg(-F.log("p")), 4).alias("avg_neg_logp"),
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


# ---------------------------------------------------------------- drift ref

import math as _math
from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class UnigramRef:
    """Fitted reference unigram distribution for stream-time drift
    monitoring: top-V token log-probs plus an OOV floor. Bounded,
    picklable, broadcastable — same artifact lifecycle as
    `importance.ImportanceModel` / the IVF quantizer."""

    log_p: dict[str, float]
    floor: float


def fit_unigram_ref(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int = 2048,
    floor_scale: float = 0.1,
) -> UnigramRef:
    """Fit the reference distribution on a static corpus: one token
    count aggregate, top-``top_v`` via TakeOrderedAndProject, collected
    as the bounded artifact. The OOV floor is ``floor_scale`` × the
    rarest kept token's probability, so unseen tokens are penalized
    but finite."""
    counts = (
        docs.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    total = counts.agg(F.sum("c")).head()[0]
    if not total:
        raise ValueError("empty reference corpus")
    top = counts.orderBy(F.desc("c"), F.asc("tok")).limit(top_v).collect()
    log_p = {r["tok"]: _math.log(r["c"] / total) for r in top}
    min_p = min(r["c"] for r in top) / total
    return UnigramRef(log_p=log_p, floor=_math.log(floor_scale * min_p))


def ref_nll_cols(ref: UnigramRef, text_col: str | Column = "text") -> tuple[Column, Column]:
    """(sum_nll, n_tokens) as pure in-row column expressions: the
    document's total negative log-likelihood under the reference, and
    its token count. Stream-safe (map-literal lookup per token, no join,
    no state); aggregate sum(sum_nll)/sum(n_tokens) downstream to get
    token-weighted cross-entropy per window/slice."""
    toks = _tokens(text_col)
    items = sorted(ref.log_p.items())
    lut = F.map_from_arrays(
        F.array(*[F.lit(k) for k, _ in items]),
        F.array(*[F.lit(float(v)) for _, v in items]),
    )
    per_tok = lambda t: -F.coalesce(F.element_at(lut, t), F.lit(ref.floor))  # noqa: E731
    sum_nll = F.aggregate(F.transform(toks, per_tok), F.lit(0.0), lambda a, x: a + x)
    return sum_nll, F.size(toks)


def ccnet_buckets(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public):
    per-language head/middle/tail terciles of the unigram-LM negative
    log-likelihood — head (lowest NLL) is the standard "keep" slice,
    tail the discard candidate. Output (lang, bucket, n_docs, mean_nll).

    Shape: the scoring join is `unigram_score`'s (model broadcasts
    back, corpus never shuffles for it); the tercile thresholds are a
    |langs|-row aggregate broadcast back over the scored frame; the
    final count is map-side combinable on a 2-value key. Thresholds use
    EXACT interpolated percentile so the DuckDB oracle (quantile_cont,
    same (n-1)·p interpolation over identical 4dp-rounded scores)
    reproduces bucket boundaries bit-for-bit; at 100 TB swap in
    approx_percentile (t-digest) as documented for the other quantile
    gates."""
    scores = unigram_score(docs, text_col=text_col, id_col=id_col)
    s = docs.select(id_col, lang_col).join(scores, id_col)
    thr = s.groupBy(lang_col).agg(
        F.expr("percentile(avg_neg_logp, 1.0D/3)").alias("t1"),
        F.expr("percentile(avg_neg_logp, 2.0D/3)").alias("t2"),
    )
    nll = F.col("avg_neg_logp")
    bucket = (
        F.when(nll <= F.col("t1"), F.lit("head"))
        .when(nll <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        s.join(F.broadcast(thr), lang_col)
        .groupBy(lang_col, bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(nll), 4).alias("mean_nll"),
        )
    )
