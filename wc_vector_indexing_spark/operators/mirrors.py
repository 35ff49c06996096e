"""Mirror-site detection — cross-HOST content-set similarity. A crawl
corpus routinely contains whole mirrored hosts (docs sites, package
indexes, wiki mirrors); per-document dedup removes the pages one by
one, but the frontier-level win is recognizing the HOST pair and
de-prioritizing the mirror wholesale (Mercator/IRLbot-era design,
public literature). Host pairs are scored by Jaccard over their
content-digest sets and clustered with connected components.

Scale shape (the reason this is cheap at 100 TB):
  * Pages → (host, digest) pairs: one projection + distinct (shuffle
    on the pair key).
  * Candidate pairs come from a SELF-JOIN ON DIGEST — group sizes are
    hosts-per-digest, never all-hosts-pairs. The
    ``max_hosts_per_digest`` cap removes boilerplate digests (a footer
    shared by 10k hosts would otherwise fan out 50M pairs) the same
    way the MinHash bucket cap bounds LSH; capped digests still count
    toward set SIZES (they are content), just not toward pair
    evidence.
  * Host vocabulary is bounded, so per-host sizes broadcast and the
    integer-id mapping for components is a window over a dims-sized
    frame.

Reference analogue: none (the reference dedups documents only);
north-star crawl-pipeline surface, public-knowledge technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.components import (
    connected_components,
)


def mirror_host_clusters(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    min_jaccard: float = 0.6,
    max_hosts_per_digest: int = 64,
) -> DataFrame:
    """(host, cluster_host): every host that belongs to a mirror
    cluster, labeled with the cluster's lexicographically-smallest
    member (the canonical host a frontier keeps; the others are the
    de-prioritized mirrors).

    Jaccard = |shared digests| / |A ∪ B| over per-host DISTINCT
    content digests; shared counts only digests on ≤
    ``max_hosts_per_digest`` hosts (boilerplate is not mirror
    evidence), while set sizes count everything.
    """
    digests = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(host_col).alias("host"),
                F.md5(F.col(text_col)).alias("d"))
        .distinct()
    )
    sizes = digests.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    usable = (
        digests.groupBy("d").agg(F.count(F.lit(1)).alias("nh"))
        .filter((F.col("nh") >= 2)
                & (F.col("nh") <= max_hosts_per_digest))
        .select("d")
    )
    dd = digests.join(usable, "d")
    da = dd.select("d", F.col("host").alias("host_a"))
    db = dd.select("d", F.col("host").alias("host_b"))
    pairs = (
        da.join(db, "d")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("host").alias("host_a"),
                      F.col("n").alias("n_a"))
    nb = sizes.select(F.col("host").alias("host_b"),
                      F.col("n").alias("n_b"))
    edges = (
        pairs.join(F.broadcast(na), "host_a")
        .join(F.broadcast(nb), "host_b")
        .withColumn(
            "jaccard",
            F.col("shared")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("host_a", "host_b")
    )
    # components wants integer node ids; the host vocabulary is
    # bounded, so a window over the dims-sized host frame assigns them
    # without any driver collect
    idx = sizes.select("host").withColumn(
        "hid", F.row_number().over(Window.orderBy("host")) - 1)
    e2 = (
        edges
        .join(idx.select(F.col("host").alias("host_a"),
                         F.col("hid").alias("hid_a")), "host_a")
        .join(idx.select(F.col("host").alias("host_b"),
                         F.col("hid").alias("hid_b")), "host_b")
        .select("hid_a", "hid_b")
    )
    comp = connected_components(
        e2, id_a="hid_a", id_b="hid_b", out_id="hid",
        out_cluster="cid")
    return (
        comp
        .join(idx.select(F.col("hid"), F.col("host")), "hid")
        .join(idx.select(F.col("hid").alias("cid"),
                         F.col("host").alias("cluster_host")), "cid")
        .select("host", "cluster_host")
    )
