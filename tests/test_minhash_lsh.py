"""MinHash+LSH / SimHash near-dup operators: candidate recall against
the exact ngram path, and the short-doc fallback universe (candidates
from the band UDF's unigram fallback must be verifiable, not silently
dropped)."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)


def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base.replace("today", "tonight")),  # near-dup of 1
        Row(doc_id=3, text=base),                               # exact dup of 1
        Row(doc_id=4, text="completely different words about spark catalyst plans"),
    ]
    return spark.createDataFrame(rows)


def test_minhash_finds_near_dups_and_matches_exact_jaccard(spark):
    docs = corpus(spark)
    lsh = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_pairs(docs, threshold=0.2).collect()}
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    # identical docs always collide in every band → must be found
    assert lsh[(1, 3)] == 1.0
    # verification is exact: any pair LSH emits carries the exact score
    for pair, j in lsh.items():
        assert exact[pair] == j
    assert (1, 4) not in lsh and (2, 4) not in lsh


def test_minhash_short_doc_pairs_are_verified(spark):
    # both docs are under k=4 tokens: the band UDF's unigram fallback
    # buckets them together, and verification must use the SAME fallback
    # universe (identical unigrams → jaccard 1.0) instead of dropping
    # the pair because the k-gram shingle set is empty
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="too short"), Row(doc_id=2, text="too short")]
    )
    out = minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert len(out) == 1
    assert (out[0].doc_a, out[0].doc_b, out[0].jaccard) == (1, 2, 1.0)


def test_minhash_short_vs_long_no_false_pair(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="too short"),
            Row(doc_id=2, text="a much longer document with enough tokens for shingles"),
        ]
    )
    assert minhash_lsh_pairs(docs, threshold=0.1).count() == 0


def test_simhash_near_pairs_blocked(spark):
    docs = corpus(spark)
    out = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(docs, max_hamming=8).collect()}
    assert out.get((1, 3)) == 0  # identical text → identical fingerprint
    assert (1, 4) not in out


def _varied_corpus(spark, n=60):
    # deterministic mix: clusters of near-dups, exact dups, short docs,
    # empty docs, and singletons — every branch of the band/verify chain
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(n):
        if i % 10 == 9:
            text = ""  # empty doc → {""} fallback universe
        elif i % 10 == 8:
            text = "tiny doc"  # short-doc unigram fallback
        else:
            base = [words[rng.randrange(len(words))] for _ in range(30)]
            if i % 3 == 1:
                base[rng.randrange(30)] = "mutated"  # near-dup of i-1's shape
            text = " ".join(base)
        rows.append(Row(doc_id=i, text=text))
    # a few exact-duplicate clusters (saturate every band bucket)
    rows += [Row(doc_id=1000 + j, text=rows[0].text) for j in range(3)]
    return spark.createDataFrame(rows)


def test_single_task_twin_matches_distributed(spark):
    # the r14 single-task path must be byte-identical to the distributed
    # band/verify plan — same pairs, same 4-dp jaccard — in both shingle
    # hash families and under the bucket cap
    docs = _varied_corpus(spark)
    for token_hash in ("crc32", "md5"):
        for max_bucket in (256, 2):
            dist = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in minhash_lsh_pairs(
                    docs, threshold=0.2, token_hash=token_hash,
                    max_bucket=max_bucket, small_docs=0,  # force distributed
                ).collect()
            }
            single = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in minhash_lsh_pairs(
                    docs, threshold=0.2, token_hash=token_hash,
                    max_bucket=max_bucket,  # dispatches to the twin
                ).collect()
            }
            assert single == dist, (token_hash, max_bucket)
        # the cap-less mode too (max_bucket=None branch)
        dist = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(
                docs, threshold=0.2, token_hash=token_hash,
                max_bucket=None, small_docs=0,
            ).collect()
        }
        single = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(
                docs, threshold=0.2, token_hash=token_hash, max_bucket=None,
            ).collect()
        }
        assert single == dist, token_hash


def test_fused_drop_list_matches_unfused_composition(spark):
    # minhash_near_dup_drops' fused single-task path must equal the
    # pairs → connected_components → cluster_representatives chain run
    # over the forced-distributed pair set
    from wc_vector_indexing_spark.operators.components import (
        cluster_representatives,
        connected_components,
    )
    from wc_vector_indexing_spark.operators.dedup import minhash_near_dup_drops

    docs = _varied_corpus(spark)
    for token_hash in ("crc32", "md5"):
        pairs = minhash_lsh_pairs(
            docs, threshold=0.2, token_hash=token_hash, small_docs=0
        )
        expected = sorted(
            r.doc for r in cluster_representatives(
                connected_components(pairs, id_a="doc_a", id_b="doc_b")
            ).collect()
        )
        fused = sorted(
            r.doc_id for r in minhash_near_dup_drops(
                docs, threshold=0.2, token_hash=token_hash
            ).collect()
        )
        unfused_big = sorted(
            r.doc_id for r in minhash_near_dup_drops(
                docs, threshold=0.2, token_hash=token_hash, small_docs=0
            ).collect()
        )
        assert fused == expected == unfused_big, token_hash
