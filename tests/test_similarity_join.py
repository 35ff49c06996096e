"""knn_similarity_join: exactness vs brute force, the probe-batch
guard, and schema derivation for non-long id types."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.similarity import knn_similarity_join


def _emb(spark, n, dim=6, seed=3, id_fn=None):
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = [
        Row(
            vec_id=id_fn(i) if id_fn else i,
            embedding=[float(x) for x in rng.standard_normal(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_knn_join_matches_bruteforce(spark):
    queries = _emb(spark, 7, seed=1)
    index = _emb(spark, 60, seed=2)
    got = knn_similarity_join(queries, index, k=4).collect()
    qv = {r.vec_id: np.array(r.embedding) for r in queries.collect()}
    iv = {r.vec_id: np.array(r.embedding) for r in index.collect()}
    for qid, q in qv.items():
        scores = sorted(
            (
                (-float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), i)
                for i, v in iv.items()
            )
        )[:4]
        want = [i for _, i in scores]
        have = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert have == want, qid


def test_probe_batch_guard_raises(spark):
    queries = _emb(spark, 12, seed=1)
    index = _emb(spark, 20, seed=2)
    with pytest.raises(ValueError, match="max_probe_rows"):
        knn_similarity_join(queries, index, k=2, max_probe_rows=10)
    # the error message routes to the distributed alternatives
    with pytest.raises(ValueError, match="lsh_cosine_pairs|ivf"):
        knn_similarity_join(queries, index, k=2, max_probe_rows=10)
    # raising the cap restores the path
    assert knn_similarity_join(queries, index, k=2, max_probe_rows=12).count() == 24


def test_hard_negatives_batched_equals_unbatched(spark):
    """hard_negatives_batched (r8: the scale form for data-dependent
    anchor sets, found by the sf1 rehearsal) must select exactly the
    same (query, neighbor, rank) triples as the single-batch form —
    scores may differ by BLAS 1-ulp noise across batch shapes, so
    compare ids exactly and scores to 1e-9."""
    from wc_vector_indexing_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_batched,
    )

    emb = _emb(spark, 40, seed=5).withColumn(
        "label", (F.col("vec_id") % 3).cast("int")
    )
    a = hard_negatives(emb, emb, k=3).orderBy("query_id", "rank").collect()
    b = (
        hard_negatives_batched(emb, emb, k=3, batch_rows=7)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.query_id, r.neighbor_id, r.rank) for r in a] == [
        (r.query_id, r.neighbor_id, r.rank) for r in b
    ]
    assert max(abs(x.score - y.score) for x, y in zip(a, b)) < 1e-9
    # over-cap anchor sets are exactly what the batched form is for
    with pytest.raises(ValueError, match="hard_negatives_batched"):
        hard_negatives(emb, emb, k=1, max_probe_rows=10)
    assert (
        hard_negatives_batched(emb, emb, k=1, batch_rows=10)
        .select("query_id").distinct().count()
        == 40
    )


def test_string_ids_schema_derived(spark):
    queries = _emb(spark, 3, seed=1, id_fn=lambda i: f"q{i:02d}")
    index = _emb(spark, 15, seed=2, id_fn=lambda i: f"doc{i:03d}")
    out = knn_similarity_join(queries, index, k=3, max_probe_rows=100)
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema["query_id"] == "string" and schema["neighbor_id"] == "string"
    rows = out.collect()
    assert len(rows) == 9
    assert all(r.neighbor_id.startswith("doc") for r in rows)
    # id-ascending tiebreak holds for string ids too: duplicate vectors
    dup = spark.createDataFrame(
        [Row(vec_id=name, embedding=[1.0, 0.0]) for name in ["b", "a", "c"]]
    )
    q = spark.createDataFrame([Row(vec_id="q", embedding=[1.0, 0.0])])
    top = knn_similarity_join(q, dup, k=2, max_probe_rows=10).collect()
    assert [r.neighbor_id for r in sorted(top, key=lambda r: r.rank)] == ["a", "b"]


def test_empty_query_frame_keeps_schema(spark):
    queries = _emb(spark, 5, seed=1).filter("vec_id < 0")
    index = _emb(spark, 10, seed=2)
    out = knn_similarity_join(queries, index, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]


def test_matryoshka_topk_matches_bruteforce(spark):
    """Per-dim prefix top-k equals brute force (score desc, id asc) for
    every dim — incl. a zero-norm prefix case (vector whose first 3
    components are zero scores 0 at dim=3, nonzero at dim=6)."""
    from wc_vector_indexing_spark.operators.similarity import matryoshka_topk

    queries = _emb(spark, 4, dim=6, seed=11)
    index = _emb(spark, 40, dim=6, seed=12)
    zero_prefix = spark.createDataFrame(
        [Row(vec_id=1000, embedding=[0.0, 0.0, 0.0, 0.5, -0.2, 0.9])]
    )
    index = index.unionByName(zero_prefix)
    dims = [3, 6]
    got = matryoshka_topk(queries, index, dims=dims, k=5).collect()
    qv = {r.vec_id: np.array(r.embedding) for r in queries.collect()}
    iv = {r.vec_id: np.array(r.embedding) for r in index.collect()}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return 0.0 if na == 0.0 or nb == 0.0 else float(a @ b / (na * nb))

    for d in dims:
        for qid, q in qv.items():
            want = [
                i
                for _, i in sorted(
                    ((-cos(q[:d], v[:d]), i) for i, v in iv.items())
                )[:5]
            ]
            have = [
                r.neighbor_id
                for r in sorted(got, key=lambda r: r.rank)
                if r.query_id == qid and r.dim == d
            ]
            assert have == want, (d, qid)
