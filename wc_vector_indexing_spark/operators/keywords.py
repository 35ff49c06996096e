"""TF-IDF keyword extraction — per-document top-K salient terms.

The classic corpus-relative salience measure: tfidf(t, d) = tf(t, d) ·
ln(N / df(t)). Used in training-data pipelines for topic tagging,
near-dup triage and retrieval-ish filtering without a model.

Scale design (100 TB corpus):
  * df table: explode distinct (doc, tok) pairs → count per tok — one
    shuffle, vocab-sized result; broadcast it back (never shuffle the
    corpus against the vocab).
  * tf: count per (doc, tok) — map-side-partial into one shuffle keyed
    by (doc, tok); stays co-partitioned for the subsequent per-doc
    window (Catalyst reuses the hash partitioning when the window key
    is a prefix of the agg key... it is not here, so the top-K window
    costs one more doc_id-keyed exchange — the floor for per-doc
    ranking).
  * N (corpus size) via a 1-row broadcast cross join, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.lm_score import _tokens


def tf_idf(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, tok, tf, df, tfidf) for every distinct (doc, token) pair.
    tf = raw in-doc count; idf = ln(N / df) with df = #docs containing
    tok (≥1, so idf ≥ 0 and corpus-wide terms score 0)."""
    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    # df derives from tf (already one row per distinct (doc, tok)) — no
    # second distinct+shuffle over the full token stream, and Catalyst
    # reuses tf's exchange for both branches
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "tok",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )


def top_keywords(
    docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-K terms by tfidf. Ordering is total — (rounded
    tfidf desc, tok asc) — so the selected set is deterministic and any
    engine reproduces it exactly (the round absorbs sub-ulp ln()
    differences across libm implementations)."""
    scored = tf_idf(docs, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "tok", "tf", "df", "tfidf")
    )
