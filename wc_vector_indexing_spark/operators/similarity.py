"""Similarity search over an ``array<float>`` embedding column.

The reference delegates ANN entirely to its remote stores (Pinecone
query plane); the engine makes the vector index a local columnar table,
so kNN becomes a Spark plan:

  * knn_exact          — brute-force cosine top-k: one scan, no shuffle
                         beyond the final TakeOrderedAndProject. The
                         100 TB baseline (scan is embarrassingly
                         parallel; top-k is a per-partition heap + driver
                         merge of k rows per partition).
  * knn_similarity_join — all-pairs k-nearest between two tables
                         (windowed top-k per query).
  * LSH bucketed ANN   — random-hyperplane (sign) LSH: probe only the
                         bucket(s) matching the query signature. At scale
                         the index table is *partitioned by bucket*, so a
                         probe prunes to ~1/2^bits of the data before any
                         scan (the IVF-style scale path).

All vector math is JVM-side (functions/vectors.py) — zip_with/aggregate
inside codegen, no Python in the scan loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.functions.vectors import cosine, dot, l2_norm, normalized

DEFAULT_LSH_BITS = 8


def knn_exact(
    index: DataFrame,
    query_vector: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows by cosine similarity to a constant query vector.

    Deterministic tiebreak on id so results are stable across runs.
    Plan shape: Scan → Project(score) → TakeOrderedAndProject(k).
    The query norm is folded to a Python float so each row evaluates one
    dot fold + one row-norm fold (not a third fold over the literal).
    """
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vector])
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vector))
    if qnorm == 0.0:
        scored = index.withColumn("score", F.lit(0.0))
    else:
        denom = l2_norm(F.col(vec_col)) * F.lit(qnorm)
        scored = index.withColumn(
            "score",
            F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(F.col(vec_col), q) / denom),
        )
    return (
        scored.select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def knn_similarity_join(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    q_vec: str = "embedding",
    q_id: str = "vec_id",
    i_vec: str = "embedding",
    i_id: str = "vec_id",
    max_probe_rows: int = 4096,
) -> DataFrame:
    """For each query row, its k nearest index rows (cosine). EXACT.

    Scale shape — no cross join ever materializes: the query side is
    the PROBE BATCH (bounded and ENFORCED: more than ``max_probe_rows``
    query rows raises instead of silently OOMing the driver), collected
    once and shipped into an Arrow stage where each index partition
    scores its rows against the whole query matrix with one gemm and
    emits only its LOCAL top-k per query. The global reduction is a
    per-query window over partitions × |queries| × k candidate rows —
    index scan stays fully parallel, shuffle volume is independent of
    index size. Local and global top-k use the same total order
    (score desc, id asc), so the merge is exact.

    Id columns keep their input types (long, string, …) — the output
    schema is derived from the input schemas, not hardcoded.

    For probe sets beyond ``max_probe_rows`` use the distributed paths:
    ``lsh_cosine_pairs``/``dedup.embedding_cosine_pairs`` for all-pairs
    shapes, or the IVF index (operators/ivf.py) for repeated lookups.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from wc_vector_indexing_spark.functions.partitioning import fan_out

    cand_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[q_id].dataType, True),
            T.StructField("neighbor_id", index.schema[i_id].dataType, True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    out_schema = T.StructType(
        cand_schema.fields + [T.StructField("rank", T.IntegerType(), True)]
    )
    # limit(max+1): the driver fetch itself is bounded even when the
    # caller hands us an unboundedly large query frame
    qrows = queries.select(F.col(q_id), F.col(q_vec)).limit(max_probe_rows + 1).collect()
    spark = queries.sparkSession
    if len(qrows) > max_probe_rows:
        raise ValueError(
            f"knn_similarity_join probe batch exceeds max_probe_rows="
            f"{max_probe_rows}: the query side is collected to the driver "
            "by design (gemm probe batch). For large probe sets use the "
            "distributed paths instead: similarity.lsh_signature bucketed "
            "join / dedup.lsh_cosine_pairs for all-pairs, or the IVF index "
            "(operators/ivf.py) for repeated lookups; or raise "
            "max_probe_rows explicitly if the driver can hold the batch."
        )
    if not qrows:
        return spark.createDataFrame([], out_schema)
    qids = [r[0] for r in qrows]
    Q = np.stack([np.asarray(r[1], dtype="float64") for r in qrows])
    qn = np.linalg.norm(Q, axis=1)
    qzero = qn == 0.0
    qn[qzero] = 1.0
    Qn = Q / qn[:, None]  # zero-norm queries score 0 vs everything

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            V = np.stack(pdf["_v"].to_numpy()).astype("float64")
            # pre-sort rows by id so a stable sort on -score breaks ties
            # id-ascending — works for any orderable id type (long, str)
            base = np.argsort(ids, kind="stable")
            ids = ids[base]
            V = V[base]
            n = np.linalg.norm(V, axis=1)
            n[n == 0.0] = 1.0
            S = (V / n[:, None]) @ Qn.T  # (rows × queries)
            out = []
            kk = min(k, len(ids))
            for qi in range(len(qids)):
                col = S[:, qi]
                # total order (score desc, id asc) — same as the global
                # merge, so tie-breaking at the local k boundary is exact
                sel = np.argsort(-col, kind="stable")[:kk]
                for r in sel:
                    out.append((qids[qi], ids[r], float(col[r])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "score"])

    cand = (
        fan_out(index)
        .select(F.col(i_id).alias("_id"), F.col(i_vec).alias("_v"))
        .mapInPandas(local_topk, schema=cand_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def matryoshka_topk(
    queries: DataFrame,
    index: DataFrame,
    dims: list[int],
    k: int = 10,
    q_vec: str = "embedding",
    q_id: str = "vec_id",
    i_vec: str = "embedding",
    i_id: str = "vec_id",
    max_probe_rows: int = 4096,
) -> DataFrame:
    """Per-dimension-prefix exact top-k: for each query row and each
    ``d`` in ``dims``, the k nearest index rows by cosine over the
    FIRST d vector components (Matryoshka truncation eval, Kusupati et
    al. 2022). Same scale shape as `knn_similarity_join` — the probe
    batch is collected once (bounded), each index partition runs one
    gemm PER DIM against the prefix-sliced, prefix-normalized query
    matrix and emits only its local top-k per (dim, query); the global
    merge is a per-(dim, query) window over partitions × |dims| ×
    |queries| × k candidate rows. Shuffle volume independent of index
    size; no cross join ever materializes (replaces the expression-fold
    crossJoin form the r6 verdict flagged as the costliest catalog
    query). Ties broken (score desc, id asc) in BOTH the local and
    global order, so the merge is exact."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from wc_vector_indexing_spark.functions.partitioning import fan_out

    cand_schema = T.StructType(
        [
            T.StructField("dim", T.IntegerType(), True),
            T.StructField("query_id", queries.schema[q_id].dataType, True),
            T.StructField("neighbor_id", index.schema[i_id].dataType, True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    qrows = queries.select(F.col(q_id), F.col(q_vec)).limit(max_probe_rows + 1).collect()
    spark = queries.sparkSession
    if len(qrows) > max_probe_rows:
        raise ValueError(
            f"matryoshka_topk probe batch exceeds max_probe_rows={max_probe_rows}"
        )
    if not qrows:
        return spark.createDataFrame([], cand_schema)
    qids = [r[0] for r in qrows]
    Q = np.stack([np.asarray(r[1], dtype="float64") for r in qrows])
    dims = sorted(int(d) for d in dims)
    Qn: dict[int, np.ndarray] = {}
    for d in dims:
        Qd = Q[:, :d]
        n = np.linalg.norm(Qd, axis=1)
        n[n == 0.0] = 1.0  # zero-norm query prefixes score 0 everywhere
        Qn[d] = Qd / n[:, None]

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            V = np.stack(pdf["_v"].to_numpy()).astype("float64")
            base = np.argsort(ids, kind="stable")
            ids = ids[base]
            V = V[base]
            out = []
            kk = min(k, len(ids))
            for d in dims:
                Vd = V[:, :d]
                n = np.linalg.norm(Vd, axis=1)
                n[n == 0.0] = 1.0
                S = (Vd / n[:, None]) @ Qn[d].T  # (rows × queries)
                for qi in range(len(qids)):
                    col = S[:, qi]
                    sel = np.argsort(-col, kind="stable")[:kk]
                    for r in sel:
                        out.append((d, qids[qi], ids[r], float(col[r])))
            yield pd.DataFrame(
                out, columns=["dim", "query_id", "neighbor_id", "score"]
            )

    cand = (
        fan_out(index)
        .select(F.col(i_id).alias("_id"), F.col(i_vec).alias("_v"))
        .mapInPandas(local_topk, schema=cand_schema)
    )
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dim", "query_id", "neighbor_id", "score", "rank")
    )


def hard_negatives(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    max_probe_rows: int = 4096,
) -> DataFrame:
    """Per query: the ``k`` most-similar index rows with a DIFFERENT
    label — hard-negative mining for contrastive/embedding training
    (the negatives that sit closest to the anchor are the informative
    ones; see e.g. SimCLR / DPR training setups, public). EXACT.

    Same scale shape as `knn_similarity_join` (probe batch → one gemm
    per index partition → local top-k → per-query window merge), plus a
    per-query LABEL MASK applied inside the Arrow stage: index rows
    sharing the query's label are excluded BEFORE the local top-k, so
    the merge stays exact (a post-hoc filter on a plain kNN would lose
    candidates). Shuffle volume is partitions × |queries| × k,
    independent of index size.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    from wc_vector_indexing_spark.functions.partitioning import fan_out

    cand_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[id_col].dataType, True),
            T.StructField("neighbor_id", index.schema[id_col].dataType, True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    out_schema = T.StructType(
        cand_schema.fields + [T.StructField("rank", T.IntegerType(), True)]
    )
    qrows = (
        queries.select(F.col(id_col), F.col(vec_col), F.col(label_col))
        .limit(max_probe_rows + 1)
        .collect()
    )
    spark = queries.sparkSession
    if len(qrows) > max_probe_rows:
        raise ValueError(
            f"hard_negatives probe batch exceeds max_probe_rows={max_probe_rows}; "
            "mine negatives in bounded probe batches (the anchor set of one "
            "training step), not corpus-at-once — or use "
            "hard_negatives_batched, which streams anchors in bounded "
            "batches itself."
        )
    if not qrows:
        return spark.createDataFrame([], out_schema)
    return _hard_negatives_from_rows(
        spark, qrows, index, k, vec_col, id_col, label_col,
        cand_schema, out_schema,
    )


def hard_negatives_batched(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    batch_rows: int = 4096,
) -> DataFrame:
    """Scale form of :func:`hard_negatives` for a DATA-DEPENDENT anchor
    set (found by the r8 full-catalog sf1 rehearsal: training_triplets'
    anchors grew past the 4096 probe guard at 10x data). Anchors stream
    to the driver via ``toLocalIterator`` — one partition in memory at
    a time, never the whole set — in ``batch_rows``-size probe batches;
    each batch runs the identical broadcast-gemm → local-top-k →
    window-merge shape, and results union. Every query lands in exactly
    one batch, so the union equals the unbatched answer exactly; driver
    memory stays bounded no matter how many anchors upstream produces."""
    import itertools

    from pyspark.sql import types as T

    cand_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[id_col].dataType, True),
            T.StructField("neighbor_id", index.schema[id_col].dataType, True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    out_schema = T.StructType(
        cand_schema.fields + [T.StructField("rank", T.IntegerType(), True)]
    )
    spark = queries.sparkSession
    it = queries.select(
        F.col(id_col), F.col(vec_col), F.col(label_col)
    ).toLocalIterator()
    out: DataFrame | None = None
    while True:
        batch = list(itertools.islice(it, batch_rows))
        if not batch:
            break
        part = _hard_negatives_from_rows(
            spark, batch, index, k, vec_col, id_col, label_col,
            cand_schema, out_schema,
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        return spark.createDataFrame([], out_schema)
    return out


def _hard_negatives_from_rows(
    spark,
    qrows,
    index: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    label_col: str,
    cand_schema,
    out_schema,
) -> DataFrame:
    """One probe batch of collected (id, vec, label) rows → the exact
    masked-top-k result for those queries (shared by hard_negatives and
    hard_negatives_batched)."""
    import numpy as np
    import pandas as pd

    from wc_vector_indexing_spark.functions.partitioning import fan_out

    qids = [r[0] for r in qrows]
    qlabels = np.array([r[2] for r in qrows])
    Q = np.stack([np.asarray(r[1], dtype="float64") for r in qrows])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = 1.0
    Qn = Q / qn[:, None]

    def local_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy()
            labels = pdf["_l"].to_numpy()
            V = np.stack(pdf["_v"].to_numpy()).astype("float64")
            base = np.argsort(ids, kind="stable")
            ids, labels, V = ids[base], labels[base], V[base]
            n = np.linalg.norm(V, axis=1)
            n[n == 0.0] = 1.0
            S = (V / n[:, None]) @ Qn.T
            out = []
            for qi in range(len(qids)):
                col = S[:, qi].copy()
                col[labels == qlabels[qi]] = -np.inf  # the label mask
                sel = np.argsort(-col, kind="stable")[: min(k, len(ids))]
                for r in sel:
                    if col[r] != -np.inf:
                        out.append((qids[qi], ids[r], float(col[r])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "score"])

    cand = (
        fan_out(index)
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.col(label_col).alias("_l"),
        )
        .mapInPandas(local_topk, schema=cand_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed seed → same
    signature function on every run/executor)."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((bits, dim)).astype("float64").tolist()


def lsh_signature(
    df: DataFrame, vec_col: str, dim: int, bits: int = DEFAULT_LSH_BITS, seed: int = 42
) -> DataFrame:
    """Append an integer sign-LSH ``bucket`` column: bit b = sign(v·h_b).

    Pure column expressions — the hyperplanes fold into the plan as array
    literals. Partitioning/bucketing the index table by this column makes
    a probe prune to one bucket before any vector math.
    """
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        h = F.array(*[F.lit(x) for x in plane])
        bit = (dot(F.col(vec_col), h) > 0).cast("long")
        sig = sig + F.shiftleft(bit, b)
    return df.withColumn("bucket", sig)


def knn_lsh(
    index: DataFrame,
    query_vector: list[float],
    dim: int,
    k: int = 10,
    bits: int = DEFAULT_LSH_BITS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe_bits: int = 0,
    seed: int = 42,
) -> DataFrame:
    """ANN: restrict the exact scan to the query's LSH bucket (plus
    optional multi-probe: buckets at Hamming distance 1 on the lowest
    ``n_probe_bits`` bits).

    Recall/latency tradeoff is (bits, n_probe_bits); the exact scorer is
    reused on the pruned set, so results are exact *within* the probed
    buckets. At scale the bucket column is a partition key → partition
    pruning replaces the filter with file skipping.
    """
    import numpy as np

    planes = np.array(_hyperplanes(dim, bits, seed))
    qv = np.array(query_vector, dtype="float64")
    sig = 0
    for b in range(bits):
        if float(planes[b] @ qv) > 0:
            sig |= 1 << b
    probes = {sig} | {sig ^ (1 << b) for b in range(min(n_probe_bits, bits))}

    bucketed = lsh_signature(index, vec_col, dim, bits, seed)
    pruned = bucketed.filter(F.col("bucket").isin([int(p) for p in probes]))
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    return (
        pruned.withColumn("score", cosine(F.col(vec_col), q))
        .select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def normalize_index(index: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize vectors so cosine == dot at query time (one-time
    cost at write, saves two norms per row per query at read)."""
    return index.withColumn(vec_col, normalized(F.col(vec_col)))
