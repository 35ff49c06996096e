"""Incremental near-dup detection against a persisted signature store —
the operational dedup pattern at 100 TB: a daily ingest batch must be
checked against the whole corpus WITHOUT recomputing anything over the
corpus. The store keeps one MinHash signature (num_hashes longs) and the
banded LSH bucket keys per document; a new batch computes signatures for
ITS rows only, joins band buckets against the store for candidates, and
verifies candidates by signature agreement.

Cost model per batch: signature UDF over the batch (not the corpus),
one bucket join whose shuffle moves the batch's bands plus the matching
store bands, and a verify join on the candidate ids only. Nothing scans
the corpus text ever again — the store doesn't even contain it.

Verification here is the MinHash ESTIMATE of Jaccard (fraction of equal
signature components, computed JVM-side with zip_with — standard error
~1/sqrt(num_hashes) ≈ 0.125 at 64 hashes), not the exact shingle
Jaccard used by the in-batch path (dedup.minhash_lsh_pairs): exact
verification would need the corpus text back. Callers who need
exactness re-check the (tiny) returned pair set against the source
table.

Store layout:  <root>/_meta.json          (hash-family parameters)
               <root>/signatures/*.parquet (doc_id, sig, buckets)
At cluster scale, write the signatures bucketed by a band-bucket prefix
(sources/layout.py pattern) so the per-batch candidate join co-locates
without reshuffling the store; the parquet-append form here keeps the
same logical plan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.dedup import sig_and_buckets_udf


class SignatureStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        num_hashes: int = 64,
        bands: int = 16,
        k: int = 4,
        token_hash: str = "crc32",
    ):
        self.spark = spark
        self.root = root
        meta_path = os.path.join(root, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            # the store's hash family wins — mixing families silently
            # produces zero matches, so this is load-bearing, not cosmetic
            self.num_hashes = meta["num_hashes"]
            self.bands = meta["bands"]
            self.k = meta["k"]
            self.token_hash = meta.get("token_hash", "crc32")
        else:
            os.makedirs(root, exist_ok=True)
            self.num_hashes, self.bands, self.k = num_hashes, bands, k
            self.token_hash = token_hash
            with open(meta_path, "w") as f:
                json.dump(
                    {"num_hashes": num_hashes, "bands": bands, "k": k,
                     "token_hash": token_hash},
                    f,
                )

    def _sig_path(self) -> str:
        return os.path.join(self.root, "signatures")

    def signatures_of(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """(doc_id, sig, buckets) for ``docs`` — one Arrow pass."""
        udf = sig_and_buckets_udf(
            self.num_hashes, self.bands, self.k, self.token_hash
        )
        return docs.select(
            F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("sb")
        ).select("doc_id", "sb.sig", "sb.buckets")

    def read(self) -> DataFrame:
        path = self._sig_path()
        if not os.path.isdir(path):
            return self.spark.createDataFrame(
                [], "doc_id long, sig array<bigint>, buckets array<bigint>"
            )
        return self.spark.read.parquet(path)

    def append(self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> None:
        """Add signatures for docs whose ids aren't stored yet."""
        sigs = self.signatures_of(docs, text_col, id_col)
        fresh = sigs.join(self.read().select("doc_id"), "doc_id", "left_anti")
        fresh.write.mode("append").parquet(self._sig_path())

    # -- the incremental query ---------------------------------------------

    def match_new(
        self,
        new_docs: DataFrame,
        threshold: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
        max_bucket: int = 256,
    ) -> DataFrame:
        """(new_id, store_id, est_jaccard) for every new doc whose
        estimated Jaccard against a stored doc clears ``threshold``.
        The signature UDF runs over the NEW batch only.

        ``max_bucket`` drops band buckets whose corpus-side width exceeds
        the cap (boilerplate bands: each contributes O(width × batch)
        candidates on its own) — same skew reasoning as
        ``minhash_lsh_pairs``; None disables."""
        new_sigs = self.signatures_of(new_docs, text_col, id_col).localCheckpoint(eager=True)
        store = self.read()

        new_bands = new_sigs.select(
            F.col("doc_id").alias("new_id"), F.explode("buckets").alias("bucket")
        )
        store_bands = store.select(
            F.col("doc_id").alias("store_id"), F.explode("buckets").alias("bucket")
        )
        if max_bucket is not None:
            hot = (
                store_bands.groupBy("bucket")
                .count()
                .filter(F.col("count") > max_bucket)
                .select("bucket")
            )
            store_bands = store_bands.join(hot, "bucket", "left_anti")
        candidates = (
            new_bands.join(store_bands, "bucket")
            .select("new_id", "store_id")
            .distinct()
        )
        n = self.num_hashes
        est = F.round(
            F.size(
                F.filter(
                    F.zip_with("sig_new", "sig_store", lambda x, y: x == y),
                    lambda m: m,
                )
            )
            / F.lit(float(n)),
            4,
        )
        return (
            candidates.join(
                new_sigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sig_new")),
                "new_id",
            )
            .join(
                store.select(
                    F.col("doc_id").alias("store_id"), F.col("sig").alias("sig_store")
                ),
                "store_id",
            )
            .withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select("new_id", "store_id", "est_jaccard")
        )

    def ingest(
        self,
        new_docs: DataFrame,
        threshold: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> tuple[DataFrame, DataFrame]:
        """The full batch step: returns (accepted, dup_pairs) and appends
        the accepted docs' signatures to the store. A new doc matching
        any stored doc is rejected; ties within the batch are NOT
        resolved here (run the in-batch dedup first — separation of
        concerns keeps both passes single-purpose)."""
        dups = self.match_new(new_docs, threshold, text_col, id_col).localCheckpoint(
            eager=True
        )
        accepted = new_docs.join(
            dups.select(F.col("new_id").alias(id_col)).distinct(), id_col, "left_anti"
        )
        self.append(accepted, text_col, id_col)
        return accepted, dups
