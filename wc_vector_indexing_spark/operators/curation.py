"""Corpus curation pipeline — the end-to-end training-data-preparation
composition (north-star surface): quality gate → language filter →
exact dedup → near-dup removal → curated corpus + audit trail.

One lazy plan start to finish; each stage tags rejected rows with a
reason instead of dropping them silently, so the pipeline emits BOTH the
curated corpus and a per-reason audit (at 100 TB you need to know what
the filters ate — silent truncation is how corpora go bad).

Stage order is the cheap-first rule: pure-projection filters (quality,
language) run before anything that shuffles (dedup), so the shuffled
volume is already reduced.

Dedup policy: exact dups collapse to the min-id canonical row; near-dup
pairs (MinHash+LSH verified by exact Jaccard) drop the HIGHER id of each
pair — deterministic, order-free, and transitive enough for corpus work
(a full union-find pass is the documented upgrade if clusters matter).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators import dedup, textstats


@dataclass
class CurationConfig:
    min_quality: float = 0.5
    languages: tuple[str, ...] | None = ("en",)  # None = keep all
    near_dup_threshold: float = 0.5
    minhash_hashes: int = 64
    minhash_bands: int = 16
    shingle_k: int = 4


def curate(
    docs: DataFrame,
    config: CurationConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated, audit):

      curated — the surviving rows of ``docs`` (all original columns)
      audit   — (doc_id, reject_reason) for every dropped row, reason ∈
                {low_quality, wrong_language, exact_duplicate, near_duplicate}
    """
    config = config or CurationConfig()

    scored = textstats.text_quality(docs, text_col=text_col, id_col=id_col).select(
        id_col, "quality_score"
    )
    lang = textstats.lang_id(docs, text_col=text_col, id_col=id_col).select(
        id_col, "predicted_lang"
    )
    # base feeds four audit branches + the survivor chain — persist it
    # once instead of re-scoring the corpus per branch
    base = docs.join(scored, id_col).join(lang, id_col).persist()

    low_q = base.filter(F.col("quality_score") < config.min_quality)
    kept = base.filter(F.col("quality_score") >= config.min_quality)

    if config.languages is not None:
        wrong_lang = kept.filter(~F.col("predicted_lang").isin(*config.languages))
        kept = kept.filter(F.col("predicted_lang").isin(*config.languages))
    else:
        wrong_lang = kept.limit(0)

    kept = kept.persist()
    # exact dedup: keep the canonical (min-id) row per distinct text
    groups = dedup.exact_duplicates(kept, text_col=text_col, id_col=id_col)
    canon = groups.select(F.col("canonical_id").alias(id_col))
    exact_dropped = kept.join(canon, id_col, "left_anti").select(id_col)
    kept = kept.join(canon, id_col, "left_semi")

    # near-dup removal on the survivors only
    pairs = dedup.minhash_lsh_pairs(
        kept,
        num_hashes=config.minhash_hashes,
        bands=config.minhash_bands,
        k=config.shingle_k,
        threshold=config.near_dup_threshold,
        text_col=text_col,
        id_col=id_col,
    )
    near_dropped = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    kept = kept.join(near_dropped, id_col, "left_anti")

    audit = (
        low_q.select(id_col).withColumn("reject_reason", F.lit("low_quality"))
        .unionByName(wrong_lang.select(id_col).withColumn("reject_reason", F.lit("wrong_language")))
        .unionByName(exact_dropped.withColumn("reject_reason", F.lit("exact_duplicate")))
        .unionByName(near_dropped.withColumn("reject_reason", F.lit("near_duplicate")))
    )
    return kept.select(*docs.columns), audit


def curation_report(docs: DataFrame, audit: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-reason counts + survivor count — the audit summary."""
    total = docs.select(id_col)
    reasons = audit.groupBy("reject_reason").agg(F.count("*").alias("n"))
    survivors = total.join(audit.select(id_col), id_col, "left_anti").count()
    spark = docs.sparkSession
    return reasons.unionByName(
        spark.createDataFrame([("kept", survivors)], "reject_reason string, n long")
    ).orderBy("reject_reason")
