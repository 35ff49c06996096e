"""Embedding-space outlier detection — centroid-distance z-scores.

Data-curation primitive: rows far from their group's embedding centroid
are mislabeled / noisy / off-distribution samples, pruned before
training (cf. centroid-distance filtering in dataset-pruning work,
public). Complements `operators/semdedup.py`, which prunes rows too
CLOSE to their cluster peers — this flags rows too FAR from their
group.

Scale shape (N vectors × dim, label-grouped):
  * Pass 1 — centroids: posexplode → (label, pos) avg. The exploded
    stream is N×dim rows but aggregates map-side into a
    |labels|×dim result, which is tiny and broadcasts everywhere after.
  * Pass 2 — distances: the corpus joins the BROADCAST centroid-array
    table on label and evaluates one codegen l2_distance fold per row —
    no explode, no shuffle on the corpus side.
  * Pass 3 — per-label moments (avg, stddev of distance): another
    map-side-combined scalar aggregate, broadcast back for the z-score.
  * Final top-k by z is TakeOrderedAndProject.
  At 100 TB, persist the pass-2 distance column (one narrow double) so
  passes 2/3 share a scan; here the lineage recompute is two parquet
  scans and stays lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.functions.vectors import l2_distance


def label_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, centroid array<double>): per-label mean vector via
    posexplode → (label, pos) avg → sorted re-assembly."""
    pos = emb.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    cent = pos.groupBy(label_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("c")
    )
    return cent.groupBy(label_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def embedding_outliers(
    emb: DataFrame,
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Top-``k`` outliers by z-scored distance-to-own-centroid:

        z(x) = (‖x − c_label‖ − μ_label) / σ_label   (σ = sample stddev)

    Output (id, label, dist 4dp, z 4dp) ordered (z desc, id asc)."""
    cents = label_centroids(emb, vec_col, label_col)
    d = emb.join(F.broadcast(cents), label_col).select(
        F.col(id_col),
        F.col(label_col),
        l2_distance(vec_col, "centroid").alias("dist"),
    )
    stats = d.groupBy(label_col).agg(
        F.avg("dist").alias("mu"), F.stddev("dist").alias("sd")
    )
    z = F.col("dist") - F.col("mu")
    z = z / F.col("sd")
    return (
        d.join(F.broadcast(stats), label_col)
        .select(
            id_col,
            label_col,
            F.round("dist", 4).alias("dist"),
            F.round(z, 4).alias("z"),
            z.alias("_z"),
        )
        .orderBy(F.desc("_z"), F.asc(id_col))
        .limit(k)
        .drop("_z")
    )
