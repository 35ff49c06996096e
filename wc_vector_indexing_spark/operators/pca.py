"""PCA dimensionality reduction for embedding columns.

The standard pre-step before ANN indexing / clustering at scale: cut a
768-dim embedding to its top-k principal components (often 64-128)
before building IVF/PQ structures — less shuffle, smaller codebooks,
and for OPQ-style pipelines the rotation itself. Public method:
covariance eigendecomposition (Pearson 1901; Halko et al. 2011 for the
randomized large-d variant, not needed at these dims).

Spark mapping — EXACT full-corpus fit in ONE distributed pass:
  * sufficient statistics: per Arrow batch, accumulate (n, Σx, ΣxᵀX)
    — count, sum vector, gram matrix — in numpy inside `mapInPandas`;
    emit ONE flattened row per partition. The driver sums the ~P
    partition rows (P × d² doubles — at d=768 and 10k partitions,
    ~47 GB? no: one row per PARTITION, so P rows of d²; collect cost
    is P·d²·8 bytes; for d=768, P=10k that is 47 GB — so at large d
    the partial rows are first tree-reduced by a `groupBy(spill_key)`
    round; at the catalog's d≤64 the direct collect is ~100 KB).
  * eigendecomposition of the d×d covariance happens driver-side
    (`numpy.linalg.eigh` — d is small by definition of an embedding).
  * projection is an Arrow-batched gemm: X @ components.T, a pure map
    pass, zero shuffle, stream-safe.

Unlike PQ/IVF (sample-trained by design), the PCA fit is exact over
the full corpus — the one-pass moment form never materializes the
centered matrix. Sign convention: each component's
largest-magnitude coordinate is made positive, so the artifact is
unique and runs reproduce bit-identically.

Artifact persistence mirrors `operators/ivf.IVFIndex` (json,
fit_or_load): fit once per corpus version, score forever.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class PCAModel:
    def __init__(
        self,
        mean: np.ndarray,
        components: np.ndarray,
        explained_variance: np.ndarray,
        total_variance: float,
    ):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.components = np.asarray(components, dtype=np.float64)  # (k, d)
        self.explained_variance = np.asarray(explained_variance, dtype=np.float64)
        self.total_variance = float(total_variance)

    @property
    def k(self) -> int:
        return self.components.shape[0]

    def explained_ratio(self) -> float:
        if self.total_variance <= 0:
            return 1.0
        return float(self.explained_variance.sum() / self.total_variance)

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "mean": self.mean.tolist(),
                    "components": self.components.tolist(),
                    "explained_variance": self.explained_variance.tolist(),
                    "total_variance": self.total_variance,
                },
                f,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "PCAModel":
        with open(path) as f:
            d = json.load(f)
        return cls(
            np.array(d["mean"]),
            np.array(d["components"]),
            np.array(d["explained_variance"]),
            d["total_variance"],
        )

    @classmethod
    def fit(cls, df: DataFrame, k: int, vec_col: str = "embedding") -> "PCAModel":
        """Exact PCA from one distributed moment pass (see module
        docstring)."""
        n, s, gram = _moments(df, vec_col)
        if n < 2:
            raise ValueError(f"PCA needs >= 2 vectors, got {n}")
        mean = s / n
        # covariance = E[xxT] - mean meanT, unbiased n/(n-1) factor
        cov = (gram / n - np.outer(mean, mean)) * (n / (n - 1.0))
        evals, evecs = np.linalg.eigh(cov)  # ascending
        order = np.argsort(evals)[::-1]
        evals, evecs = evals[order], evecs[:, order]
        comps = evecs[:, :k].T.copy()  # (k, d)
        # deterministic sign: largest-|coord| of each component positive
        for i in range(comps.shape[0]):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        return cls(mean, comps, np.maximum(evals[:k], 0.0), float(evals.sum()))

    @classmethod
    def fit_or_load(
        cls, path: str, df: DataFrame, k: int, vec_col: str = "embedding"
    ) -> "PCAModel":
        if os.path.exists(path):
            m = cls.load(path)
            if m.k == k:
                return m
        m = cls.fit(df, k, vec_col)
        m.save(path)
        return m


def _moments(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, Σx, ΣxᵀX) via per-partition numpy accumulation — one row out
    per partition, summed driver-side."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for b in batches:
            if len(b) == 0:
                continue
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = df.select(vec_col).mapInPandas(part, schema).collect()
    if not rows:
        raise ValueError("empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.array(r["g"]).reshape(d, d) for r in rows], axis=0)
    return n, s, g


def project_pca(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim projection (x − mean) @ componentsᵀ as
    ``array<float>``. Pure Arrow-batched gemm map pass — zero shuffle,
    works on streams."""
    mean = model.mean.astype(np.float32)
    comps = model.components.astype(np.float32).T  # (d, k)
    out_fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.FloatType()))
    ]
    schema = T.StructType(out_fields)

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            x = np.stack(b[vec_col].to_numpy()).astype(np.float32)
            proj = (x - mean) @ comps
            b = b.copy()
            b[out_col] = list(proj)
            yield b

    return df.mapInPandas(gemm, schema)
