"""IVF (inverted-file) approximate nearest neighbor — the cluster-scale
similarity-search path.

Structure, mirroring the classic IVF design (coarse quantizer + inverted
lists), built entirely from Spark parts:

  train     KMeans (pyspark.ml, fixed seed) over a sample → nlist
            centroids (the coarse quantizer)
  index     assign every vector to its nearest centroid (one broadcast
            of the centroid matrix + a JVM-side argmin) → at scale the
            table is PARTITIONED BY list_id, so a probe reads only the
            probed partitions (file skipping, no full scan)
  search    score the query against centroids driver-side, take the
            nprobe nearest lists, exact-rank only those lists

Recall/latency knob: (nlist, nprobe). nprobe = nlist degenerates to the
exact scan. Compared to sign-LSH (similarity.knn_lsh), IVF adapts to the
data distribution — clustered corpora get balanced lists where LSH
buckets skew.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.functions.vectors import dot, l2_norm


class IVFIndex:
    def __init__(self, centroids: list[list[float]], seed: int = 42):
        self.centroids = centroids
        self.nlist = len(centroids)
        self.seed = seed

    # -- persistence -------------------------------------------------------
    #
    # The coarse quantizer is a train-once artifact: at 100 TB you fit
    # KMeans on a sample during index build and every subsequent search
    # loads the (tiny — nlist × dim floats) centroid matrix. Query-time
    # training would bill minutes of ML fit to every lookup.

    def save(self, path: str) -> None:
        """Persist the centroid matrix (atomic rename so a concurrent
        reader never sees a torn file)."""
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"seed": self.seed, "centroids": self.centroids}, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with open(path) as f:
            d = json.load(f)
        return cls(d["centroids"], seed=d.get("seed", 42))

    @classmethod
    def train_or_load(
        cls,
        vectors: DataFrame,
        path: str,
        nlist: int = 16,
        vec_col: str = "embedding",
        seed: int = 42,
        sample_fraction: float | None = None,
    ) -> "IVFIndex":
        """Load the persisted quantizer if ``path`` exists, else train and
        persist it — the search path never pays the KMeans fit twice."""
        if os.path.exists(path):
            return cls.load(path)
        idx = cls.train(
            vectors, nlist=nlist, vec_col=vec_col, seed=seed,
            sample_fraction=sample_fraction,
        )
        idx.save(path)
        return idx

    @staticmethod
    def train(
        vectors: DataFrame,
        nlist: int = 16,
        vec_col: str = "embedding",
        seed: int = 42,
        sample_fraction: float | None = None,
    ) -> "IVFIndex":
        """Fit the coarse quantizer. Deterministic: fixed seed, fixed
        init. At 100 TB train on a sample (sample_fraction) — KMeans
        quality needs ~1000×nlist points, not the corpus."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        df = vectors
        if sample_fraction:
            df = df.sample(fraction=sample_fraction, seed=seed)
        feat = df.select(array_to_vector(F.col(vec_col)).alias("features"))
        km = KMeans(k=nlist, seed=seed, maxIter=20, initMode="k-means||")
        model = km.fit(feat)
        return IVFIndex([c.tolist() for c in model.clusterCenters()], seed=seed)

    # -- assignment --------------------------------------------------------

    def assign(self, vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append ``list_id`` = argmin centroid distance. Pure column
        expressions: the centroid matrix folds into the plan; per row it
        is nlist dot-products inside codegen — no python."""
        # ||v - c||² = ||v||² - 2 v·c + ||c||²; rank by (||c||² - 2 v·c).
        # One (score, i) struct per centroid gathered into a single array
        # and reduced with array_min: each dot-product fold appears ONCE
        # in the expression tree (linear in nlist). The previous nested
        # when/least chain re-inlined every prior score into each step —
        # an O(nlist²) tree that cost more in analysis + interpreted
        # evaluation than the data itself. array_min on struct compares
        # lexicographically: min score first, then min i on ties — the
        # same strict-less/keep-earlier semantics as the fold it replaces.
        scored = F.array(
            *[
                F.struct(
                    (
                        F.lit(float(np.dot(c, c)))
                        - 2.0 * dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
                    ).alias("s"),
                    F.lit(i).alias("i"),
                )
                for i, c in enumerate(self.centroids)
            ]
        )
        return vectors.withColumn("list_id", F.array_min(scored)["i"])

    # -- search ------------------------------------------------------------

    def probe_lists(self, query_vector: list[float], nprobe: int) -> list[int]:
        q = np.array(query_vector, dtype="float64")
        cents = np.array(self.centroids, dtype="float64")
        d2 = (cents * cents).sum(axis=1) - 2.0 * (cents @ q)
        return [int(i) for i in np.argsort(d2)[:nprobe]]

    def search(
        self,
        indexed: DataFrame,
        query_vector: list[float],
        k: int = 10,
        nprobe: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """Exact cosine top-k within the nprobe nearest lists.
        ``indexed`` must carry list_id (from assign); when the table is
        written partitioned by list_id the isin filter becomes partition
        pruning."""
        import math

        lists = self.probe_lists(query_vector, nprobe)
        pruned = indexed.filter(F.col("list_id").isin(lists))
        q = F.array(*[F.lit(float(x)) for x in query_vector])
        qnorm = math.sqrt(sum(x * x for x in query_vector)) or 1.0
        denom = l2_norm(F.col(vec_col)) * F.lit(qnorm)
        score = F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(F.col(vec_col), q) / denom)
        return (
            pruned.withColumn("score", score)
            .select(id_col, "score")
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )
