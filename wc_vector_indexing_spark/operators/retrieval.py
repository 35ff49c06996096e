"""BM25 lexical retrieval — scored full-text search over a corpus.

The Okapi BM25 ranking function, the standard lexical-retrieval
baseline every training-data / RAG pipeline needs next to the vector
paths (`operators/similarity.py`, `operators/ivf.py`). Reference
parity note: the reference delegates retrieval entirely to its remote
vector store (class-pinecone-adapter.php query plane); a lexical
scorer is north-star surface the brief asks for, not a port.

Scale design (100 TB corpus):
  * One corpus tokenize → tf aggregate keyed by (doc, tok) — the single
    unavoidable corpus shuffle. Everything else DERIVES from that table:
    doc length dl = per-doc sum of tf, df = per-tok row count over the
    query-term slice, so the token stream is never re-shuffled.
  * Query terms filter the tf table BEFORE the df aggregate and the
    score join — at real scale the scored slice is ~|terms| posting
    lists, not the corpus. df computed on the filtered slice is exact
    (a doc contains the term iff it has a tf row for it).
  * N and avgdl flow in as 1-row broadcast cross joins — no driver
    collect, no second corpus pass (avgdl derives from dl which derives
    from tf).
  * Final top-k is (score desc, id asc) + limit → TakeOrderedAndProject,
    no global sort.
  * For repeated queries against a static corpus, persist `bm25_index`
    once (bucketed by tok — posting-list locality) and pass it in; the
    corpus tokenize then happens exactly once per corpus version.

Determinism: scores are rounded to 4dp and the ordering is total
((rounded score) desc, doc_id asc), so any engine — including the
DuckDB oracle — reproduces the exact top-k set and order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.lm_score import _tokens


def bm25_index(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, tok, tf, dl): one row per distinct (doc, token) with the
    in-doc term frequency and the doc's total token length. This is the
    persistable artifact — write it bucketed by ``tok`` and every query
    becomes posting-list lookups with zero corpus work."""
    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    # dl derives from tf (sum of per-term counts == token count) — no
    # second pass over the raw token stream
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return tf.join(dl, id_col)


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for ``query`` under Okapi BM25:

        idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(d)  = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    ``index`` takes a precomputed `bm25_index` frame (the static-corpus
    fast path); otherwise it is built from ``docs``. N and avgdl are
    always corpus-wide (from the full index), df is computed on the
    query-term slice (exact — see module docstring)."""
    terms = sorted({t for t in _py_tokens(query)})
    if not terms:
        raise ValueError("query has no indexable terms")
    idx = index if index is not None else bm25_index(docs, text_col, id_col)
    stats = idx.groupBy(id_col).agg(F.first("dl").alias("_dl")).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("_dl").alias("avgdl"),
    )
    hits = idx.filter(F.col("tok").isin(terms))
    df_tbl = hits.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    part = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        hits.join(F.broadcast(df_tbl), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(part), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def _py_tokens(text: str) -> list[str]:
    """Driver-side twin of lm_score._tokens for query strings."""
    import re

    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]
