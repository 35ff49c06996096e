"""SemDeDup — cluster-then-prune semantic deduplication (Abbas et al.,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023).

The scale trick: never compare across the whole corpus. Cluster
embeddings with the (train-once) IVF coarse quantizer, then compute
pairwise cosine only WITHIN each cluster — comparisons drop from N² to
sum(n_c²), and each cluster's work is an independent partition-local
block.

Keep rule (deterministic): within each cluster, examples are ranked by
distance from the centroid (farthest first — the paper's "keep low
centroid-similarity examples" choice, which retains the hard/diverse
representative), tiebreak on id. For every pair with cosine >=
threshold, the later-ranked example is dropped. A chain A~B, B~C with
cos(A,C) < threshold therefore keeps only A — pairwise-transitive
dropping, the same semantics the curation pipeline applies to MinHash
clusters (operators/curation.py); the paper's greedy scan would keep C.
Documented rather than hidden: stricter is the safe direction for
dedup.

Plan shape: assign() is codegen-only (nlist dot products per row);
pairs are a block-keyed self-join (one shuffle on list_id); ranking is
one window per cluster. No corpus-wide window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.functions.vectors import cosine
from wc_vector_indexing_spark.operators.dedup import embedding_cosine_pairs
from wc_vector_indexing_spark.operators.ivf import IVFIndex


def _centroid_sim(index: IVFIndex, vec_col: str) -> F.Column:
    """cosine(vec, centroid[list_id]) as a pure column expression — the
    centroid matrix folds into the plan as a nested array literal."""
    cents = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in index.centroids]
    )
    return cosine(F.col(vec_col), F.element_at(cents, F.col("list_id") + 1))


def semdedup(
    vectors: DataFrame,
    index: IVFIndex | None = None,
    threshold: float = 0.95,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Survivors after semantic dedup: every input row minus the
    later-ranked member of each intra-cluster pair with cosine >=
    threshold. Returns the survivor frame (id, list_id, centroid_sim).

    ``index``: a trained coarse quantizer (IVFIndex.train_or_load); when
    None one is trained on ``vectors`` directly (test path — at scale
    always pass the persisted artifact).
    """
    if index is None:
        index = IVFIndex.train(vectors, nlist=nlist, vec_col=vec_col)
    assigned = index.assign(vectors, vec_col=vec_col)
    ranked = assigned.withColumn(
        "centroid_sim", F.round(_centroid_sim(index, vec_col), 6)
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("list_id").orderBy(
                F.asc("centroid_sim"), F.asc(id_col)
            )
        ),
    )
    pairs = embedding_cosine_pairs(
        assigned, threshold=threshold, block_col="list_id",
        vec_col=vec_col, id_col=id_col,
    )
    r = ranked.select(F.col(id_col), F.col("rank"))
    with_ranks = (
        pairs.join(r.withColumnRenamed(id_col, "id_a").withColumnRenamed("rank", "rank_a"), "id_a")
        .join(r.withColumnRenamed(id_col, "id_b").withColumnRenamed("rank", "rank_b"), "id_b")
    )
    drops = with_ranks.select(
        F.when(F.col("rank_a") > F.col("rank_b"), F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias(id_col)
    ).distinct()
    return (
        ranked.join(drops, id_col, "left_anti")
        .select(id_col, "list_id", "centroid_sim")
    )


def semdedup_report(
    vectors: DataFrame, survivors: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(n_input, n_kept, n_dropped) — one-row audit."""
    n_in = vectors.count()
    n_kept = survivors.count()
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(n_in, n_kept, n_in - n_kept)], ["n_input", "n_kept", "n_dropped"]
    )
