"""Fuzzy edit-distance self-join (operators/fuzzy.py): completeness vs
a naive N² reference, deletion-neighborhood correctness, hot-bucket
cap, property-based completeness on random strings."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.fuzzy import deletion_variants, fuzzy_self_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _naive_pairs(names, d):
    out = set()
    for (ia, a), (ib, b) in itertools.combinations(sorted(names.items()), 2):
        if _lev(a, b) <= d:
            out.add((ia, ib))
    return out


def _run(spark, names, d, **kw):
    df = spark.createDataFrame([Row(rid=i, name=n) for i, n in names.items()])
    got = fuzzy_self_join(df, "name", "rid", max_distance=d, **kw)
    return {(r.id_a, r.id_b) for r in got.collect()}


def test_deletion_variants_d1(spark):
    df = spark.createDataFrame([Row(s="abc")])
    got = set(df.select(deletion_variants("s", 1).alias("v")).collect()[0].v)
    assert got == {"abc", "bc", "ac", "ab"}


def test_deletion_variants_d2_counts(spark):
    df = spark.createDataFrame([Row(s="abcd")])
    got = set(df.select(deletion_variants("s", 2).alias("v")).collect()[0].v)
    # itself + 4 single deletes + C(4,2)=6 double deletes, all distinct
    assert got == {
        "abcd", "bcd", "acd", "abd", "abc",
        "cd", "bd", "bc", "ad", "ac", "ab",
    }


def test_matches_naive_reference_d1(spark):
    names = {1: "kitten", 2: "sitten", 3: "mitten", 4: "kitty", 5: "kitten"}
    assert _run(spark, names, 1) == _naive_pairs(names, 1)
    # and the expected pairs are the substitution family + exact dup
    assert (1, 2) in _run(spark, names, 1) and (1, 5) in _run(spark, names, 1)


def test_matches_naive_reference_d2(spark):
    names = {1: "flange", 2: "flanges", 3: "flanged", 4: "orange", 5: "fla"}
    assert _run(spark, names, 2) == _naive_pairs(names, 2)


def test_insert_delete_substitute_all_found(spark):
    names = {1: "spark", 2: "spark", 3: "spar", 4: "sparks", 5: "snark", 6: "shard"}
    got = _run(spark, names, 1)
    assert {(1, 2), (1, 3), (1, 4), (1, 5)} <= got
    assert (1, 6) not in got  # ed 2


def test_random_completeness_property(spark):
    rng = random.Random(11)
    alphabet = "abc"
    names = {
        i: "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 7)))
        for i in range(40)
    }
    for d in (1, 2):
        assert _run(spark, names, d) == _naive_pairs(names, d)


def test_max_bucket_caps_hot_variant(spark):
    # 30 single-char keys: every pair is within ed 1 and they all meet
    # in the empty-string variant bucket; a cap below 30 kills that
    # bucket but single-char pairs still meet in the char variants
    names = {i: chr(97 + i % 3) for i in range(30)}
    uncapped = _run(spark, names, 1, max_bucket=None)
    assert len(uncapped) == 30 * 29 // 2  # all pairs: ed <= 1 for 1-char keys
    capped = _run(spark, names, 1, max_bucket=10)
    assert len(capped) < len(uncapped)


def test_ids_are_ordered_and_unique(spark):
    names = {1: "aaa", 2: "aab", 3: "aba"}
    df = spark.createDataFrame([Row(rid=i, name=n) for i, n in names.items()])
    rows = fuzzy_self_join(df, "name", "rid", max_distance=1).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert all(a < b for a, b in pairs)
    assert len(pairs) == len(set(pairs))
