"""Model-based quality filtering: a fasttext-style linear classifier
over hashed token features (the GPT-3/LLaMA "quality classifier" stage
— train a cheap linear model on a labeled sample, score the whole
corpus, keep high-probability docs).

Production shape, mirrored here:

- **fit on a bounded sample, not the corpus** — the classifier trains
  on O(10⁴-10⁶) labeled docs collected to the driver (fasttext itself
  is a single-node trainer); the 100 TB corpus is only ever SCORED.
- **score as a map pass** — the fitted weight vector (n_buckets
  doubles) broadcasts to every executor; scoring is an Arrow-batched
  in-row dot product + sigmoid, zero shuffle, stream-safe.

Features: hashed unigrams + bigrams (md5-prefix bucketing — the same
engine-portable trick as sampling.hash_bucket), L1-normalized by token
count so document length doesn't dominate the logit (fasttext's mean-
of-embeddings analogue).

Determinism: the training sample is content-addressed (hash-ordered,
not partition-ordered), init is zeros, and full-batch gradient descent
has no stochastic step — same corpus + labels + hyperparams ⇒ bitwise
identical weights on every run and cluster size.
"""

from __future__ import annotations

import hashlib
import json
import math
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _feature_buckets(text: str, n_buckets: int) -> dict[int, float]:
    """Hashed unigram+bigram counts, L1-normalized. md5-prefix
    bucketing keeps the feature map engine-portable and stable across
    python versions (builtin hash() is salted per process)."""
    toks = _tokens(text)
    grams = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    if not grams:
        return {}
    out: dict[int, float] = {}
    w = 1.0 / len(grams)
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
        out[b] = out.get(b, 0.0) + w
    return out


@dataclass
class QualityClassifier:
    """Fitted linear model: P(keep | doc) = sigmoid(w·x + b)."""

    n_buckets: int
    weights: np.ndarray  # float64 (n_buckets,)
    bias: float

    # ---------------------------------------------------------------- fit
    @classmethod
    def fit(
        cls,
        docs: DataFrame,
        label_col: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_buckets: int = 1024,
        max_sample: int = 10_000,
        iters: int = 300,
        lr: float = 2.0,
        l2: float = 1e-4,
    ) -> "QualityClassifier":
        """Train on a content-addressed sample of ``docs`` (hash-ordered
        limit — deterministic regardless of partitioning). ``label_col``
        is 0/1 (e.g. a curated "gold" slice vs random crawl — the GPT-3
        recipe uses WebText-vs-CommonCrawl as the label).

        Full-batch gradient descent on logistic loss + L2. The sample
        matrix is (max_sample × n_buckets) dense on the driver —
        10k × 1k doubles ≈ 80 MB, sized for a driver, like fasttext.
        """
        rows = (
            docs.select(
                F.col(id_col).cast("string").alias("_k"),
                F.col(text_col).alias("_text"),
                F.col(label_col).cast("double").alias("_y"),
            )
            .orderBy(F.md5(F.col("_k")))
            .limit(max_sample)
            .collect()
        )
        X = np.zeros((len(rows), n_buckets))
        y = np.array([r["_y"] for r in rows])
        for i, r in enumerate(rows):
            for b, v in _feature_buckets(r["_text"], n_buckets).items():
                X[i, b] += v
        w = np.zeros(n_buckets)
        b = 0.0
        n = max(len(rows), 1)
        for _ in range(iters):
            z = X @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y
            w -= lr * (X.T @ g / n + l2 * w)
            b -= lr * float(g.mean())
        return cls(n_buckets=n_buckets, weights=w, bias=b)

    # ------------------------------------------------------- persistence
    def save(self, path: str) -> None:
        Path(path).write_text(
            json.dumps(
                {
                    "n_buckets": self.n_buckets,
                    "bias": self.bias,
                    "weights": self.weights.tolist(),
                }
            )
        )

    @classmethod
    def load(cls, path: str) -> "QualityClassifier":
        d = json.loads(Path(path).read_text())
        return cls(
            n_buckets=d["n_buckets"],
            weights=np.asarray(d["weights"], dtype=float),
            bias=float(d["bias"]),
        )

    # ------------------------------------------------------------- score
    def score_py(self, text: str) -> float:
        """Driver-side reference scorer (tests pin the distributed path
        to this exactly)."""
        z = self.bias
        for b, v in _feature_buckets(text, self.n_buckets).items():
            z += self.weights[b] * v
        z = max(-500.0, min(500.0, z))  # exp() overflow guard
        return 1.0 / (1.0 + math.exp(-z))


def score_documents(
    docs: DataFrame,
    model: QualityClassifier,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Corpus-side scoring: Arrow-batched map pass, weights broadcast
    in the task closure (n_buckets doubles — KBs). Zero shuffle; the
    plan is scan → mapInPandas → project, stream-safe, and per-doc
    arithmetic order is fixed ⇒ deterministic scores independent of
    partitioning."""
    from wc_vector_indexing_spark.functions.partitioning import fan_out

    docs = fan_out(docs)
    weights = model.weights
    bias = model.bias
    n_buckets = model.n_buckets
    schema = T.StructType(
        docs.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probs = np.empty(len(pdf))
            for i, text in enumerate(pdf[text_col].astype(str)):
                z = bias
                for bkt, v in _feature_buckets(text, n_buckets).items():
                    z += weights[bkt] * v
                z = max(-500.0, min(500.0, z))  # exp() overflow guard
                probs[i] = 1.0 / (1.0 + math.exp(-z))
            pdf = pdf.copy()
            pdf[out_col] = probs
            yield pdf

    return docs.mapInPandas(run, schema=schema)


def quality_filter(
    docs: DataFrame,
    model: QualityClassifier,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep docs the classifier scores above ``threshold`` — the
    standard hard gate. (The LLaMA recipe's soft alternative — keep
    with probability ∝ score — composes as
    ``temperature_sample``-style hash thresholds on the score column.)"""
    scored = score_documents(docs, model, text_col=text_col)
    return scored.filter(F.col("quality_prob") >= threshold)
