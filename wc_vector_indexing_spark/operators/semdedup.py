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

Plan shape (two Arrow-batched Python stages, ONE shuffle):

1. ``mapInPandas`` — assignment + centroid similarity as a single gemm
   per batch against the (nlist × dim) centroid matrix. The expression
   form (IVFIndex.assign) evaluates nlist interpreted aggregate-folds
   per row; one numpy matmul per Arrow batch is ~100× cheaper and is
   exactly what a cluster run wants.
2. ``groupBy(list_id).applyInPandas`` — per-cluster prune. Members are
   sorted into rank order, the cosine matrix is computed in 1024-row
   blocked matmuls (memory is block × cluster, never cluster²), and a
   member is dropped iff ANY earlier-ranked member scores >= threshold
   against it. Pairs never materialize; the boolean OR folds into the
   blocked sweep.

No corpus-wide window, no driver loop, no pair explosion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.ivf import IVFIndex


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

    cents = np.array(index.centroids, dtype="float64")  # (nlist, dim)
    cnorm2 = (cents * cents).sum(axis=1)  # ||c||²
    cnorm = np.sqrt(cnorm2)
    cnorm_safe = np.where(cnorm == 0.0, 1.0, cnorm)

    def assign_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["_v"].to_numpy()).astype("float64")
            dots = V @ cents.T  # (n, nlist) — one gemm per Arrow batch
            # argmin ||v-c||² == argmin (||c||² - 2 v·c); ties → lowest i
            # (np.argmin returns the first minimum, matching the
            # strict-less/keep-earlier fold in IVFIndex.assign)
            scores = cnorm2[None, :] - 2.0 * dots
            list_id = scores.argmin(axis=1)
            vnorm = np.linalg.norm(V, axis=1)
            vnorm_safe = np.where(vnorm == 0.0, 1.0, vnorm)
            sim = dots[np.arange(len(V)), list_id] / (
                vnorm_safe * cnorm_safe[list_id]
            )
            sim[(vnorm == 0.0) | (cnorm[list_id] == 0.0)] = 0.0
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"].to_numpy(),
                    "_v": pdf["_v"].to_numpy(),
                    "list_id": list_id.astype("int32"),
                    "centroid_sim": np.round(sim, 6),
                }
            )

    from wc_vector_indexing_spark.functions.partitioning import fan_out

    assigned = fan_out(vectors).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(
        assign_batches,
        schema="_id long, _v array<float>, list_id int, centroid_sim double",
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["centroid_sim", "_id"]).reset_index(drop=True)
        V = np.stack(pdf["_v"].to_numpy()).astype("float64")
        norms = np.linalg.norm(V, axis=1)
        zero = norms == 0.0
        norms[zero] = 1.0  # zero vectors cosine 0 vs everything
        Vn = V / norms[:, None]
        n = len(pdf)
        dropped = np.zeros(n, dtype=bool)
        for lo in range(0, n, 1024):
            hi = min(lo + 1024, n)
            C = Vn[lo:hi] @ Vn.T  # (block × cluster)
            for r in range(hi - lo):
                i = lo + r
                dropped[i + 1 :] |= C[r, i + 1 :] >= threshold
        keep = pdf.loc[~dropped, ["_id", "list_id", "centroid_sim"]]
        return keep.rename(columns={"_id": id_col})

    return assigned.groupBy("list_id").applyInPandas(
        prune, schema=f"{id_col} long, list_id int, centroid_sim double"
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
