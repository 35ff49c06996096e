"""Connected components over a near-dup pair set — the cluster step the
pairwise dedup output needs to become transitively consistent (the
reference has no equivalent; this is north-star surface: pairs (1,3) and
(2,3) pairwise-drop only 3, but the CLUSTER {1,2,3} should keep exactly
its min-id representative).

Algorithm: iterative min-label propagation over the undirected edge set.
label(v) starts as v; every round each node takes the min of its own
label and its neighbors' labels; converged when no label changes. Rounds
needed = graph diameter — and near-dup components are dense (every member
pair was independently verified), so diameters are 2-3 even on huge
corpora; this is NOT an arbitrary-graph BFS.

Scale notes:
  * each round is one join + one groupBy on the edge list — shuffle
    volume is O(|edges|), and the near-dup edge set is a tiny fraction
    of the corpus (the pair stage already bounded it).
  * ``localCheckpoint`` truncates lineage each round; without it the
    plan doubles per iteration and Catalyst analysis time explodes. On
    a real cluster with reliable storage prefer ``checkpoint()`` so an
    executor loss doesn't force a full restart.
  * each round runs ONE action: a count_if aggregate that materializes
    the round's persisted labels AND answers the convergence probe.
  * small graphs (the common near-dup case: the verified-pair list is a
    bounded, tiny fraction of the corpus) skip iteration entirely —
    exact union-find in a single grouped-map task.

Adversarial (high-diameter) graphs — long chains, lattices — would need
diameter rounds of propagation; when ``max_iter`` exhausts without
convergence the operator switches to the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14), which contracts any graph to per-component stars in
O(log² n) rounds regardless of diameter (``star_components``). Near-dup
graphs never hit this (diameter 2-3 by construction); the fallback makes
the operator safe as a general-purpose graph primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    out_id: str = "doc",
    out_cluster: str = "cluster_id",
    max_iter: int = 50,
    small_graph_edges: int = 2_000_000,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``, where
    cluster_id is the minimum node id of the node's connected component.

    The result is eagerly materialized (localCheckpoint) — iteration
    already forced the work, so callers get a stable, cheap-to-reuse
    DataFrame rather than a 50-join lineage.

    Adaptive strategy: the near-dup edge list is a verified-pair set —
    a tiny, pair-stage-BOUNDED fraction of the corpus — so when it fits
    comfortably in one task (``small_graph_edges``; the checkpointed
    count is already paid) the whole labeling runs as union-find with
    path compression inside ONE grouped-map task: exact, one job, no
    iteration. Graphs above the bound take the distributed min-label
    propagation below. Both paths produce identical labels.
    """
    # materialize the pair set ONCE before mirroring it: the union's two
    # branches would otherwise each re-run the (expensive) upstream
    # pair-generation chain
    half = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).localCheckpoint(
        eager=True
    )
    if half.count() <= small_graph_edges:
        return _single_task_components(half, out_id, out_cluster)
    edges = (
        half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # initialize label(v) = min(v, neighbors(v)) — the mirrored edge set
    # already lists every node as src, so this single aggregation both
    # enumerates the nodes AND performs what would otherwise be the
    # first propagation round (one join + checkpoint + probe saved)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(F.col("src").alias("node"), F.least("src", "nbr_min").alias("label"))
        .localCheckpoint(eager=True)
    )
    cached: list = []
    converged = False
    for it in range(max_iter):
        nbr_min = (
            edges.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = labels.join(
            nbr_min.select(F.col("src").alias("node"), "nbr_label"), "node", "left"
        ).select(
            "node",
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
            (F.col("nbr_label") < F.col("label")).alias("_changed"),
        )
        # ONE action per round: the count_if aggregate both materializes
        # the persisted round result (it scans every partition — no
        # limit short-circuit) and answers the convergence probe.
        # Periodic localCheckpoint bounds lineage growth — even with the
        # cache, Catalyst re-ANALYZES the accumulated join nest each
        # round, which dominates past ~3 levels; near-dup graphs
        # converge in 2-3 rounds, inside a single persist window.
        if (it + 1) % 3 == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
            cached.append(new_labels)
        changed = new_labels.agg(F.count_if(F.col("_changed")).alias("c")).head()[0]
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        # diameter exceeds the propagation budget (adversarial chain/
        # lattice shape): restart on the star-contraction algorithm,
        # whose round count is O(log² n) independent of diameter
        out = star_components(
            half.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")),
            out_id=out_id,
            out_cluster=out_cluster,
        )
        edges.unpersist()
        for df in cached:
            df.unpersist()
        return out
    edges.unpersist()
    # hand back an eagerly-materialized frame with no live persist
    # handles: callers iterate over it from several branches
    out = labels.select(
        F.col("node").alias(out_id), F.col("label").alias(out_cluster)
    ).localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood. Output edges
    are canonical (src > dst)."""
    nbr = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        nbr.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("src", "_mn").alias("_m"))
    )
    return (
        nbr.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round over canonical (src > dst) edges: each node
    links its smaller-or-equal neighborhood (itself included) to that
    neighborhood's minimum. Keeps edges canonical."""
    m = edges.groupBy("src").agg(F.min("dst").alias("_m"))
    relink = (
        edges.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    self_link = m.select("src", F.col("_m").alias("dst"))
    return (
        relink.unionByName(self_link)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def star_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    out_id: str = "doc",
    out_cluster: str = "cluster_id",
    max_rounds: int = 64,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., SoCC'14): converges in O(log² n)
    rounds for ANY graph shape — the diameter-proof path that
    ``connected_components`` falls back to when min-label propagation
    exhausts its round budget.

    Each round is two grouped minima + joins over the current edge set;
    the edge set only shrinks toward per-component stars whose center is
    the component minimum, so shuffle volume is bounded by the input
    edge count. Labels match min-label propagation exactly.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = pairs.sparkSession
    if edges.isEmpty():
        return spark.createDataFrame([], f"{out_id} long, {out_cluster} long")
    prev_sig = None
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # convergence = edge set fixpoint; one aggregate materializes the
        # checkpoint and fingerprints the set (order-insensitive)
        sig = edges.agg(
            F.count("*").alias("n"),
            # bit_xor: order-insensitive, overflow-free under ANSI mode
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).head()
        if (sig.n, sig.h) == prev_sig:
            break
        prev_sig = (sig.n, sig.h)
    # fixpoint edges are stars (member, center): members label to the
    # center, centers label to themselves
    members = edges.select(F.col("src").alias(out_id), F.col("dst").alias(out_cluster))
    centers = edges.select(
        F.col("dst").alias(out_id), F.col("dst").alias(out_cluster)
    ).distinct()
    return members.unionByName(centers).localCheckpoint(eager=True)


def cluster_representatives(
    components: DataFrame, out_id: str = "doc", out_cluster: str = "cluster_id"
) -> DataFrame:
    """Rows of ``components`` to DROP under keep-min-representative
    policy: every member whose id differs from its cluster id."""
    return components.filter(F.col(out_id) != F.col(out_cluster)).select(out_id)


def _single_task_components(half: DataFrame, out_id: str, out_cluster: str) -> DataFrame:
    """Union-find over the whole (small) edge list in one grouped-map
    task. Deterministic: cluster id = min node id per component. The
    input is already checkpointed, so the single task reads materialized
    partitions, not the pair-generation lineage."""
    import pandas as pd

    def label(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["src"], pdf["dst"]):
            a, b = int(a), int(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = set(map(int, pdf["src"])) | set(map(int, pdf["dst"]))
        return pd.DataFrame(
            {"node": sorted(nodes), "label": [find(n) for n in sorted(nodes)]}
        )

    out = (
        half.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(label, schema="node long, label long")
        .localCheckpoint(eager=True)
    )
    return out.select(F.col("node").alias(out_id), F.col("label").alias(out_cluster))
