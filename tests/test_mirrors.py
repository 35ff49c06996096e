"""Mirror-host detection: digest-set Jaccard over host pairs,
boilerplate cap, component clustering."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.mirrors import mirror_host_clusters


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, source=h, text=t) for i, (h, t) in enumerate(rows)])


def test_perfect_mirror_pair_clusters(spark):
    rows = []
    for h in ("h1", "h2"):
        rows += [(h, f"page {p}") for p in range(5)]
    rows += [("h3", f"other {p}") for p in range(5)]
    got = {r.host: r.cluster_host
           for r in mirror_host_clusters(_docs(spark, rows)).collect()}
    assert got == {"h1": "h1", "h2": "h1"}  # h3 untouched


def test_partial_overlap_below_threshold_not_mirrors(spark):
    rows = [("h1", f"page {p}") for p in range(10)]
    rows += [("h2", f"page {p}") for p in range(3)]   # J = 3/10
    rows += [("h2", f"own {p}") for p in range(3, 10)]
    assert mirror_host_clusters(_docs(spark, rows)).count() == 0


def test_boilerplate_cap_excludes_shared_footer(spark):
    # five hosts share ONE footer digest; without the cap h4/h5 (one
    # real page each + footer) would pair with everyone via it
    rows = []
    for h in ("h1", "h2", "h3", "h4", "h5"):
        rows.append((h, "shared footer"))
        rows.append((h, f"unique {h}"))
    got = mirror_host_clusters(
        _docs(spark, rows), max_hosts_per_digest=3).collect()
    assert got == []
    # with the cap lifted the footer digest alone is J = 1/3 < 0.6:
    # still no clusters, but the pair set is exercised
    assert mirror_host_clusters(
        _docs(spark, rows), max_hosts_per_digest=64,
        min_jaccard=0.3).count() == 5


def test_transitive_cluster_keeps_min_host(spark):
    # h1~h2 and h2~h3 (each J=1): one 3-cluster labeled h1
    rows = []
    for h in ("h1", "h2", "h3"):
        rows += [(h, f"page {p}") for p in range(4)]
    got = {r.host: r.cluster_host
           for r in mirror_host_clusters(_docs(spark, rows)).collect()}
    assert got == {"h1": "h1", "h2": "h1", "h3": "h1"}
