"""Synthesize a larger scale factor from an existing testdata dir by
deterministic K-fold replication with key remapping — the input for the
scaling-curvature benchmark (tools/bench_sf1.py), NOT for correctness
oracles (those always run on the driver-provided testdata).

Replication preserves workload shape instead of distorting it:

- every foreign key shifts by ``replica * (max_key + 1)`` consistently
  across tables, so join selectivities and group sizes are EXACTLY the
  per-replica originals
- document text passes through a per-replica consonant/vowel rotation
  (``translate``), so replicas are NOT near-duplicates of each other —
  otherwise every dedup query would see planted 10-cliques and the
  measured growth would be an artifact of the synthesis, not the
  algorithm; within-replica duplicate structure is preserved exactly
- embeddings get a per-replica, per-dimension deterministic
  perturbation, breaking exact colinearity between replicas
- nation/region (fixed TPC-H dims) copy unchanged

Usage: python tools/make_sfN.py [SRC] [DST] [K]
defaults: /root/testdata/sf0.1 /tmp/wcvi_sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from wc_vector_indexing_spark.session import get_spark  # noqa: E402
from wc_vector_indexing_spark.sources.readers import load  # noqa: E402

ROT_ALPHABET = "aeiousnrtl"


def _rotations(k: int) -> tuple[str, str]:
    r = k % len(ROT_ALPHABET)
    return ROT_ALPHABET, ROT_ALPHABET[r:] + ROT_ALPHABET[:r]


def make(src: str, dst: str, k_factor: int = 10) -> None:
    spark = get_spark("make-sfN")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)

    def shift_of(df, col):
        return int(df.agg(F.max(col)).first()[0]) + 1

    src_tables = {t: load(spark, t, src) for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    )}
    shifts = {
        "o": shift_of(src_tables["orders"], "o_orderkey"),
        "c": shift_of(src_tables["customer"], "c_custkey"),
        "s": shift_of(src_tables["supplier"], "s_suppkey"),
        "p": shift_of(src_tables["part"], "p_partkey"),
        "d": shift_of(src_tables["documents"], "doc_id"),
        "v": shift_of(src_tables["embeddings"], "vec_id"),
        "e": shift_of(src_tables["events"], "event_id"),
        "u": shift_of(src_tables["events"], "user_id"),
    }

    def replicate(name, fn):
        parts = [fn(src_tables[name], k) for k in range(k_factor)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
        print(f"{name}: {k_factor}x written")

    for t in ("region", "nation"):
        src_tables[t].write.mode("overwrite").parquet(str(out / f"{t}.parquet"))

    # c_name feeds the edit-distance self-join: a verbatim copy would
    # plant K-cliques of distance-0 names (pair output grows ~K^2 by
    # construction, not by algorithm). A 2-char replica suffix keeps
    # every WITHIN-replica distance identical and pushes cross-replica
    # distance to >= 2 (> the query's max_distance=1).
    replicate("customer", lambda df, k: df
              .withColumn("c_custkey", F.col("c_custkey") + k * shifts["c"])
              .withColumn("c_name", F.concat(
                  "c_name", F.lit("" if k == 0 else chr(64 + k) * 2))))
    replicate("supplier", lambda df, k: df.withColumn(
        "s_suppkey", F.col("s_suppkey") + k * shifts["s"]))
    replicate("part", lambda df, k: df.withColumn(
        "p_partkey", F.col("p_partkey") + k * shifts["p"]))
    replicate("orders", lambda df, k: df
              .withColumn("o_orderkey", F.col("o_orderkey") + k * shifts["o"])
              .withColumn("o_custkey", F.col("o_custkey") + k * shifts["c"]))
    replicate("lineitem", lambda df, k: df
              .withColumn("l_orderkey", F.col("l_orderkey") + k * shifts["o"])
              .withColumn("l_partkey", F.col("l_partkey") + k * shifts["p"])
              .withColumn("l_suppkey", F.col("l_suppkey") + k * shifts["s"]))
    replicate("events", lambda df, k: df
              .withColumn("event_id", F.col("event_id") + k * shifts["e"])
              .withColumn("user_id", F.col("user_id") + k * shifts["u"]))

    def mutate_docs(df, k):
        a, b = _rotations(k)
        return (
            df.withColumn("doc_id", F.col("doc_id") + k * shifts["d"])
            .withColumn("text", F.translate("text", a, b))
        )

    replicate("documents", mutate_docs)

    def mutate_emb(df, k):
        return (
            df.withColumn("vec_id", F.col("vec_id") + k * shifts["v"])
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (x + 0.01 * F.cos((i + 1) * F.lit(float(k)))).cast("float"),
                ),
            )
        )

    replicate("embeddings", mutate_emb)
    print(f"done: {dst} at {k_factor}x {src}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wcvi_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(src, dst, k)
