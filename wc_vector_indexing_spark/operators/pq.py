"""Product quantization (PQ) — the embedding-compression half of the
100 TB ANN story (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — public).

At 100 TB an fp32 embedding column is the dominant storage and shuffle
cost: 768-dim fp32 = 3 KB/row. PQ splits each vector into ``m``
subvectors, quantizes each against its own ``ksub``-centroid codebook,
and stores one byte per subvector (ksub=256): 768-dim fp32 → 96 bytes,
a 32x reduction — and search never decompresses, it ranks with
asymmetric distance (ADC): per query, an m x ksub lookup table of
partial distances is computed ONCE driver-side (tiny), then each code
byte indexes the table.

Spark mapping:

  train    numpy Lloyd's k-means per subspace over a BOUNDED sample
           (driver-side by design: PQ codebooks train on ~100k sampled
           vectors regardless of corpus size — the sample cap, not the
           corpus, bounds driver memory; the artifact is m*ksub*dsub
           floats, persisted like the IVF quantizer)
  encode   one Arrow-batched pandas UDF: per batch, m gemms against the
           codebooks → argmin → m uint8 codes packed into BINARY
  search   ADC lookup via pandas UDF: codes → numpy uint8 matrix, score
           = lut[subspace, code].sum(axis=1); top-k via TakeOrdered

Cosine note: vectors are L2-normalized before encoding, so squared L2
on the codes ranks identically to cosine (d2 = 2 - 2*cos); reported
score is the approximate cosine 1 - d2/2.

Composes with IVF (operators/ivf.py): assign list_id with the coarse
quantizer, PQ-encode residuals-free (flat PQ) per list, probe lists and
ADC-rank within them — the IVF-PQ layout.
"""

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _kmeans(x: np.ndarray, k: int, seed: int, iters: int = 25) -> np.ndarray:
    """Seeded Lloyd's with kmeans++ init; deterministic for a fixed
    sample. Empty clusters re-seeded from the farthest points."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    k = min(k, n)
    # kmeans++ seeding
    cents = [x[rng.integers(n)]]
    d2 = ((x - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents.append(x[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, ((x - cents[-1]) ** 2).sum(axis=1))
    c = np.stack(cents)
    for _ in range(iters):
        # assign: ||x||^2 - 2xC^T + ||C||^2 (drop ||x||^2, same argmin)
        dist = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
        assign = dist.argmin(axis=1)
        new_c = c.copy()
        for j in range(k):
            members = x[assign == j]
            if len(members):
                new_c[j] = members.mean(axis=0)
            else:  # re-seed dead centroid at the current farthest point
                new_c[j] = x[dist.min(axis=1).argmax()]
        if np.allclose(new_c, c):
            break
        c = new_c
    return c


class PQCodebook:
    def __init__(self, codebooks: np.ndarray, seed: int = 42):
        # codebooks: (m, ksub, dsub)
        self.codebooks = np.asarray(codebooks, dtype=np.float32)
        self.m, self.ksub, self.dsub = self.codebooks.shape
        self.seed = seed

    # -- persistence (train-once artifact, like IVFIndex) ------------------

    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"seed": self.seed, "codebooks": self.codebooks.tolist()}, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "PQCodebook":
        with open(path) as f:
            d = json.load(f)
        return cls(np.asarray(d["codebooks"], dtype=np.float32), seed=d.get("seed", 42))

    @classmethod
    def train_or_load(cls, vectors: DataFrame, path: str, **kw) -> "PQCodebook":
        if os.path.exists(path):
            return cls.load(path)
        cb = cls.train(vectors, **kw)
        cb.save(path)
        return cb

    @classmethod
    def train(
        cls,
        vectors: DataFrame,
        m: int = 8,
        ksub: int = 256,
        vec_col: str = "embedding",
        seed: int = 42,
        sample_cap: int = 100_000,
    ) -> "PQCodebook":
        """Train m sub-codebooks on a bounded, deterministic sample.
        The ``limit(sample_cap)`` bounds the driver transfer no matter
        the corpus size — PQ training quality saturates around
        ~1000*ksub samples (Jégou et al. §V)."""
        sample = np.array(
            [r[0] for r in vectors.select(vec_col).limit(sample_cap).collect()],
            dtype=np.float32,
        )
        sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        dim = sample.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub = dim // m
        books = np.stack(
            [
                _kmeans(sample[:, s * dsub : (s + 1) * dsub], ksub, seed + s)
                for s in range(m)
            ]
        )
        return cls(books, seed=seed)

    # -- encode ------------------------------------------------------------

    def encode(
        self, vectors: DataFrame, vec_col: str = "embedding", out_col: str = "pq_code"
    ) -> DataFrame:
        """Append ``out_col`` BINARY(m): one codebook index per
        subspace. One pandas UDF; per Arrow batch the work is m gemms."""
        books = self.codebooks  # captured; shipped once per executor
        m, ksub, dsub = self.m, self.ksub, self.dsub
        cnorm2 = (books * books).sum(axis=2)  # (m, ksub)

        @F.pandas_udf(T.BinaryType())
        def enc(col: pd.Series) -> pd.Series:
            if len(col) == 0:  # empty Arrow batch (empty partition)
                return pd.Series([], dtype=object)
            x = np.array(col.tolist(), dtype=np.float32)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            codes = np.empty((x.shape[0], m), dtype=np.uint8)
            for s in range(m):
                xs = x[:, s * dsub : (s + 1) * dsub]
                dist = cnorm2[s][None, :] - 2.0 * (xs @ books[s].T)
                codes[:, s] = dist.argmin(axis=1).astype(np.uint8)
            return pd.Series([c.tobytes() for c in codes])

        return vectors.withColumn(out_col, enc(F.col(vec_col)))

    # -- search (ADC) ------------------------------------------------------

    def lookup_table(self, query_vector: list[float]) -> np.ndarray:
        """(m, ksub) table of per-subspace squared distances to the
        normalized query — computed once per query, driver-side."""
        q = np.asarray(query_vector, dtype=np.float32)
        q /= max(float(np.linalg.norm(q)), 1e-12)
        lut = np.empty((self.m, self.ksub), dtype=np.float32)
        for s in range(self.m):
            qs = q[s * self.dsub : (s + 1) * self.dsub]
            diff = self.codebooks[s] - qs[None, :]
            lut[s] = (diff * diff).sum(axis=1)
        return lut

    def search(
        self,
        encoded: DataFrame,
        query_vector: list[float],
        k: int = 10,
        code_col: str = "pq_code",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """ADC top-k over the compressed column only — the fp32
        embeddings are never read. Plan shape: scan(code_col) → pandas
        UDF scoring → TakeOrderedAndProject; zero shuffles."""
        lut = self.lookup_table(query_vector)
        m = self.m

        @F.pandas_udf(T.FloatType())
        def adc(col: pd.Series) -> pd.Series:
            codes = np.frombuffer(b"".join(col), dtype=np.uint8).reshape(-1, m)
            d2 = lut[np.arange(m)[None, :], codes].sum(axis=1)
            return pd.Series(1.0 - d2 / 2.0)  # approximate cosine

        return (
            encoded.select(id_col, code_col)
            .withColumn("score", F.round(adc(F.col(code_col)).cast("double"), 4))
            .select(id_col, "score")
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )


class SQ8Codebook:
    """Scalar (per-dimension) 8-bit quantization — the FAISS SQ8 shape
    (public): code_i = round((x_i − min_i) / step_i), one byte per
    dimension. 4× compression vs fp32 with near-exact recall — the
    middle rung between raw vectors and PQ's 32× (use SQ8 when recall
    matters more than storage, PQ when the reverse).

    Train is EXACT and one pass: per-partition min/max vectors via
    mapInPandas (d floats each), combined driver-side — no sampling
    needed because the statistic is min/max, not k-means. Vectors are
    L2-normalized before fitting/encoding so inner product == cosine.

    Search never decodes: with q normalized,
        q · x̂ = Σ q_i (min_i + c_i·step_i) = q·min + (q∘step) · c
    i.e. a constant plus one uint8 gemv per Arrow batch — same
    bytes-touched story as PQ's ADC (fp32 column never read)."""

    def __init__(self, vmin: np.ndarray, vstep: np.ndarray):
        self.vmin = np.asarray(vmin, dtype=np.float32)
        self.vstep = np.asarray(vstep, dtype=np.float32)
        self.dim = self.vmin.shape[0]

    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"vmin": self.vmin.tolist(), "vstep": self.vstep.tolist()}, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "SQ8Codebook":
        with open(path) as f:
            d = json.load(f)
        return cls(np.asarray(d["vmin"]), np.asarray(d["vstep"]))

    @classmethod
    def train_or_load(cls, vectors: DataFrame, path: str, **kw) -> "SQ8Codebook":
        if os.path.exists(path):
            return cls.load(path)
        cb = cls.train(vectors, **kw)
        cb.save(path)
        return cb

    @classmethod
    def train(cls, vectors: DataFrame, vec_col: str = "embedding") -> "SQ8Codebook":
        def part(batches):
            lo, hi = None, None
            for b in batches:
                if len(b) == 0:
                    continue
                x = np.array(b[vec_col].tolist(), dtype=np.float32)
                x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                blo, bhi = x.min(axis=0), x.max(axis=0)
                lo = blo if lo is None else np.minimum(lo, blo)
                hi = bhi if hi is None else np.maximum(hi, bhi)
            if lo is not None:
                yield pd.DataFrame({"lo": [lo.tolist()], "hi": [hi.tolist()]})

        schema = T.StructType(
            [
                T.StructField("lo", T.ArrayType(T.DoubleType())),
                T.StructField("hi", T.ArrayType(T.DoubleType())),
            ]
        )
        rows = vectors.select(vec_col).mapInPandas(part, schema).collect()
        if not rows:
            raise ValueError("empty input")
        lo = np.min([np.array(r["lo"]) for r in rows], axis=0)
        hi = np.max([np.array(r["hi"]) for r in rows], axis=0)
        step = np.maximum((hi - lo) / 255.0, 1e-12)
        return cls(lo, step)

    def encode(
        self, vectors: DataFrame, vec_col: str = "embedding", out_col: str = "sq_code"
    ) -> DataFrame:
        vmin, vstep, dim = self.vmin, self.vstep, self.dim

        @F.pandas_udf(T.BinaryType())
        def enc(col: pd.Series) -> pd.Series:
            if len(col) == 0:
                return pd.Series([], dtype=object)
            x = np.array(col.tolist(), dtype=np.float32)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            codes = np.clip(
                np.rint((x - vmin[None, :]) / vstep[None, :]), 0, 255
            ).astype(np.uint8)
            return pd.Series([c.tobytes() for c in codes])

        return vectors.withColumn(out_col, enc(F.col(vec_col)))

    def search(
        self,
        encoded: DataFrame,
        query_vector: list[float],
        k: int = 10,
        code_col: str = "sq_code",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """Approximate-cosine top-k over the 1-byte/dim codes: scan →
        gemv pandas UDF → TakeOrderedAndProject, zero shuffle."""
        q = np.asarray(query_vector, dtype=np.float32)
        q /= max(float(np.linalg.norm(q)), 1e-12)
        const = float(q @ self.vmin)
        w = (q * self.vstep).astype(np.float32)
        dim = self.dim

        @F.pandas_udf(T.FloatType())
        def dot(col: pd.Series) -> pd.Series:
            codes = np.frombuffer(b"".join(col), dtype=np.uint8).reshape(-1, dim)
            return pd.Series(const + codes.astype(np.float32) @ w)

        return (
            encoded.select(id_col, code_col)
            .withColumn("score", F.round(dot(F.col(code_col)).cast("double"), 4))
            .select(id_col, "score")
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )


def ivf_pq_search(
    indexed_encoded: DataFrame,
    ivf,
    book: PQCodebook,
    query_vector: list[float],
    k: int = 10,
    nprobe: int = 4,
    code_col: str = "pq_code",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ: the composed 100 TB ANN layout (Jégou et al. §VI) over a
    table carrying BOTH build-time columns (list_id partition + pq_code).
    A search (1) ranks centroids driver-side, (2) prunes to the nprobe
    lists — partition pruning when the table is partitioned by list_id —
    and (3) ADC-ranks the probed lists' codes. Bytes touched per query:
    ~(nprobe/nlist) * corpus * (16-byte codes), vs the full fp32 column
    for the exact scan — a ~1000x I/O reduction at 768-dim/nlist=1024.

    ``ivf`` is an operators.ivf.IVFIndex (duck-typed to avoid a hard
    import cycle); flat PQ codes (no residual encoding) keep encode
    independent of list assignment, so the two artifacts compose freely.
    """
    lists = ivf.probe_lists(query_vector, nprobe)
    pruned = indexed_encoded.filter(F.col("list_id").isin(lists))
    return book.search(pruned, query_vector, k=k, code_col=code_col, id_col=id_col)
