"""connected_components: transitive clustering of near-dup pairs and the
keep-min-representative policy (the pairwise-drop rule this replaced was
not transitively consistent)."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.components import (
    cluster_representatives,
    connected_components,
)


def pairs_df(spark, pairs):
    return spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in pairs], "doc_a long, doc_b long"
    )


def cc(spark, pairs):
    return {
        r.doc: r.cluster_id for r in connected_components(pairs_df(spark, pairs)).collect()
    }


def test_transitive_chain(spark):
    # A~B, B~C but A≁C directly: one cluster, min id wins
    assert cc(spark, [(1, 2), (2, 3)]) == {1: 1, 2: 1, 3: 1}


def test_star_into_shared_node(spark):
    # (1,3) and (2,3): pair-local drop of doc_b would leave 2 behind;
    # components must merge all three
    assert cc(spark, [(1, 3), (2, 3)]) == {1: 1, 2: 1, 3: 1}


def test_disjoint_clusters_and_long_path(spark):
    # a 6-node path (diameter 5 — forces several propagation rounds)
    # plus a separate 2-cluster
    path = [(i, i + 1) for i in range(1, 6)]
    got = cc(spark, path + [(10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}


def test_representatives_drop_all_but_min(spark):
    comp = connected_components(pairs_df(spark, [(1, 2), (2, 3), (7, 9)]))
    dropped = {r.doc for r in cluster_representatives(comp).collect()}
    assert dropped == {2, 3, 9}


def test_curate_drops_whole_cluster(spark):
    """End-to-end: near-identical docs 1/2/3 (every pair verified) keep
    only the min id after curation."""
    from wc_vector_indexing_spark.operators.curation import CurationConfig, curate

    base = (
        "the quick brown fox jumps over the lazy dog while the river "
        "keeps flowing past the old stone mill near the quiet village"
    )
    rows = [
        Row(doc_id=1, text=base + " one"),
        Row(doc_id=2, text=base + " two"),
        Row(doc_id=3, text=base + " three"),
        Row(doc_id=4, text="entirely different text about spark catalyst optimizer plans and shuffles today"),
    ]
    docs = spark.createDataFrame(rows)
    result = curate(docs, CurationConfig(min_quality=0.0, languages=None, near_dup_threshold=0.5))
    kept = {r.doc_id for r in result.curated.collect()}
    audit = {(r.doc_id, r.reject_reason) for r in result.audit.collect()}
    result.unpersist()
    assert kept == {1, 4}
    assert (2, "near_duplicate") in audit and (3, "near_duplicate") in audit


def test_small_and_iterative_paths_agree(spark):
    """The union-find fast path and the distributed propagation produce
    identical labels — chains (worst case for iteration) included."""
    from wc_vector_indexing_spark.operators.components import connected_components

    rows = []
    for c in range(10):
        base = c * 100
        for i in range(7):
            rows.append((base + i, base + i + 1))
    rows += [(5000, 6000), (6000, 7000), (5000, 7000)]  # triangle
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    small = connected_components(pairs)
    big = connected_components(pairs, small_graph_edges=0)
    assert small.exceptAll(big).count() == 0
    assert big.exceptAll(small).count() == 0
    labels = {r.doc: r.cluster_id for r in small.collect()}
    assert labels[6000] == labels[7000] == 5000
    assert labels[107] == 100


def test_star_components_matches_propagation(spark):
    """large-star/small-star labels == min-label propagation labels on a
    mixed graph (chains + triangle + singleton edges)."""
    from wc_vector_indexing_spark.operators.components import star_components

    rows = [(c * 100 + i, c * 100 + i + 1) for c in range(6) for i in range(5)]
    rows += [(900, 901), (901, 902), (900, 902), (950, 999)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    star = {r.doc: r.cluster_id for r in star_components(pairs).collect()}
    prop = {
        r.doc: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert star == prop


def test_adversarial_path_graph_converges_via_star_fallback(spark):
    """A 10k-node path graph has diameter 10k — propagation with a small
    round budget must hand off to the O(log² n) star fallback and still
    produce exact labels."""
    n = 10_000
    pairs = spark.range(0, n - 1).selectExpr("id as doc_a", "id + 1 as doc_b")
    out = connected_components(pairs, max_iter=5, small_graph_edges=0)
    assert out.count() == n
    assert out.filter("cluster_id != 0").count() == 0


def test_star_components_empty_input(spark):
    from wc_vector_indexing_spark.operators.components import star_components

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert star_components(empty).count() == 0
