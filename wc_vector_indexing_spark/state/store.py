"""Parquet-backed MERGE store — the engine's transactional table layer.

The reference keeps its sync ledger in a MySQL table with
``INSERT ... ON DUPLICATE KEY UPDATE`` upserts (W1,
class-storage.php:59-119) and keyed deletes (W2, :126-171). Spark has no
in-place mutation, so the store implements MERGE as snapshot
replacement:

    root/
      v00000001/part-*.parquet     immutable snapshot versions
      v00000002/part-*.parquet
      _LATEST                      text file naming the live version

A writer computes the next snapshot as a DataFrame plan over the current
one (anti-join + union = MERGE; filter = DELETE), writes it to a new
version directory, then atomically points ``_LATEST`` at it (write temp +
rename). Readers resolve ``_LATEST`` once per read — so reads are
snapshot-isolated and a crashed writer leaves no torn state, only an
orphan directory.

This is deliberately the same shape as Delta/Iceberg's
snapshot+manifest design, minus manifests: on a real cluster you'd swap
this class for a Delta table and ``MERGE INTO`` — every call site keeps
its semantics. At 100 TB the snapshots are partitioned (``partition_by``,
e.g. bucket(product_id, 1024)) so a merge only rewrites partitions the
updates touch (dynamic partition overwrite), not the whole table.

The SYNC_STATE schema mirrors the reference DDL (class-plugin.php:107-131,
FIXTURES.md §8); unique keys (target, product_id, chunk_index) /
(target, vector_id) become the MERGE join keys.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SYNC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("site_id", T.LongType(), False),
        T.StructField("product_id", T.LongType(), False),
        T.StructField("target", T.StringType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("vector_id", T.StringType(), False),
        T.StructField("product_sha", T.StringType(), True),
        T.StructField("chunk_sha", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("dimension", T.IntegerType(), True),
        T.StructField("remote_id", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("error_code", T.StringType(), True),
        T.StructField("error_msg", T.StringType(), True),
        T.StructField("last_synced_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

STATE_KEYS = ["target", "product_id", "chunk_index"]

VECTOR_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("target", T.StringType(), False),
        T.StructField("vector_id", T.StringType(), False),
        T.StructField("product_id", T.LongType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("chunk_text", T.StringType(), True),
        T.StructField("values", T.ArrayType(T.FloatType()), True),
        T.StructField("product_sha", T.StringType(), True),
        T.StructField("chunk_sha", T.StringType(), True),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("site_id", T.LongType(), True),
                    T.StructField("product_id", T.LongType(), True),
                    T.StructField("sku", T.StringType(), True),
                    T.StructField("url", T.StringType(), True),
                    T.StructField("updated_at", T.StringType(), True),
                    T.StructField("fingerprint", T.StringType(), True),
                    T.StructField("fields", T.ArrayType(T.StringType()), True),
                ]
            ),
            True,
        ),
    ]
)

INDEX_KEYS = ["target", "vector_id"]


class ParquetMergeStore:
    """A versioned parquet table supporting MERGE / DELETE / overwrite."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        keys: list[str],
        partition_by: list[str] | None = None,
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.keys = keys
        self.partition_by = partition_by or []
        # Versions handed out by read() and possibly still referenced by
        # live lazy plans. A sync cycle publishes several snapshots while
        # its DeltaPlan DataFrames lazily re-read the version seen at
        # diff time; without the lease, _vacuum(keep=3) deletes that dir
        # after the 3rd publish and any recompute (executor loss, cache
        # eviction) of the 4th write fails. Process-local by design —
        # there is one driver; cross-driver retention is a Delta/Iceberg
        # concern, not this store's.
        self._leased: set[int] = set()
        os.makedirs(root, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------

    def _latest_path(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def current_version(self) -> int:
        try:
            with open(self._latest_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.root, f"v{v:08d}")

    def _publish(self, df: DataFrame) -> int:
        """Write ``df`` as the next snapshot and atomically flip _LATEST."""
        v = self.current_version() + 1
        out = self._version_dir(v)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(out)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_LATEST.")
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._latest_path())  # atomic on POSIX
        self._vacuum(keep=3)
        return v

    def _vacuum(self, keep: int) -> None:
        """Drop snapshot dirs older than the newest ``keep`` (≙ Delta
        VACUUM; readers of dropped snapshots would fail, so keep a few).
        Versions leased out by read() are never dropped — a lazy plan may
        still recompute against them (release_leases() when the plans
        are dead)."""
        live = self.current_version()
        for name in os.listdir(self.root):
            if not (name.startswith("v") and name[1:].isdigit()):
                continue
            v = int(name[1:])
            if v <= live - keep and v not in self._leased:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def release_leases(self) -> None:
        """Declare all previously read() snapshots dead (no live plan
        references them) and vacuum whatever the leases were pinning."""
        self._leased.clear()
        self._vacuum(keep=3)

    # -- reads -------------------------------------------------------------

    def read(self) -> DataFrame:
        v = self.current_version()
        if v == 0:
            return self.spark.createDataFrame([], self.schema)
        self._leased.add(v)
        return self.spark.read.schema(self.schema).parquet(self._version_dir(v))

    def is_empty(self) -> bool:
        return self.current_version() == 0 or self.read().isEmpty()

    # -- writes ------------------------------------------------------------

    def overwrite(self, df: DataFrame) -> int:
        return self._publish(self._conform(df))

    def merge(self, updates: DataFrame, immutable_cols: tuple[str, ...] = ("created_at",)) -> int:
        """MERGE: WHEN MATCHED UPDATE all columns (except immutables,
        which keep the target's value), WHEN NOT MATCHED INSERT.

        ``updates`` must be unique on ``self.keys`` — enforced here with
        a hard error rather than silently keeping one row (SURVEY §7.4
        risk 4: nondeterministic dedupe would poison fingerprint state).
        """
        updates = self._conform(updates).cache()
        dup = updates.groupBy(*self.keys).count().filter(F.col("count") > 1)
        if dup.limit(1).count() > 0:
            sample = [r.asDict() for r in dup.limit(3).collect()]
            raise ValueError(f"merge updates not unique on {self.keys}: {sample}")

        current = self.read()
        immutable_cols = tuple(c for c in immutable_cols if c in current.columns)
        if immutable_cols:
            preserved = current.select(
                *self.keys, *[F.col(c).alias(f"__old_{c}") for c in immutable_cols]
            )
            updates = updates.join(preserved, self.keys, "left")
            for c in immutable_cols:
                updates = updates.withColumn(c, F.coalesce(F.col(f"__old_{c}"), F.col(c))).drop(
                    f"__old_{c}"
                )
        untouched = current.join(updates.select(*self.keys), self.keys, "left_anti")
        return self._publish(untouched.unionByName(self._conform(updates)))

    def delete_where(self, condition) -> int:
        """DELETE FROM t WHERE condition (anti-filter rewrite, W2)."""
        return self._publish(self.read().filter(~condition))

    def delete_keys(self, keys_df: DataFrame, key_cols: list[str] | None = None) -> int:
        """DELETE rows whose key tuple appears in ``keys_df`` (anti-join
        rewrite of `WHERE (k1,k2) IN (...)`, W2). Distributed — no
        driver-side key collection."""
        key_cols = key_cols or self.keys
        return self._publish(
            self.read().join(keys_df.select(*key_cols).distinct(), key_cols, "left_anti")
        )

    def update_where(self, condition, assignments: dict[str, F.Column]) -> int:
        """UPDATE t SET ... WHERE condition (W3/W4 error-marking and
        timestamp-touch writes)."""
        current = self.read()
        updated = current
        for col, expr in assignments.items():
            updated = updated.withColumn(col, F.when(condition, expr).otherwise(F.col(col)))
        return self._publish(updated)

    def update_keys(
        self, keys_df: DataFrame, assignments: dict[str, F.Column], key_cols: list[str]
    ) -> int:
        """UPDATE rows whose key tuple appears in ``keys_df`` — the
        distributed form of `UPDATE ... WHERE key IN (...)`: a left-semi
        marker join instead of a driver-side id list, so a corpus-wide
        timestamp touch never collects keys."""
        marker = keys_df.select(*key_cols).distinct().withColumn("__hit", F.lit(True))
        updated = self.read().join(marker, key_cols, "left")
        cond = F.col("__hit").isNotNull()
        for col, expr in assignments.items():
            updated = updated.withColumn(col, F.when(cond, expr).otherwise(F.col(col)))
        return self._publish(updated.drop("__hit"))

    # -- helpers -----------------------------------------------------------

    def _conform(self, df: DataFrame) -> DataFrame:
        """Project/cast to the store schema (missing nullable cols → NULL)."""
        cols = []
        for field in self.schema.fields:
            if field.name in df.columns:
                cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
            elif field.nullable:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            else:
                raise ValueError(f"missing non-nullable column {field.name!r}")
        return df.select(*cols)


def sync_state_store(spark: SparkSession, root: str | None = None) -> ParquetMergeStore:
    root = root or os.path.join(tempfile.gettempdir(), f"wcvec-state-{uuid.uuid4().hex[:8]}")
    return ParquetMergeStore(spark, root, SYNC_STATE_SCHEMA, STATE_KEYS)


def vector_index_store(spark: SparkSession, root: str | None = None) -> ParquetMergeStore:
    root = root or os.path.join(tempfile.gettempdir(), f"wcvec-index-{uuid.uuid4().hex[:8]}")
    return ParquetMergeStore(spark, root, VECTOR_INDEX_SCHEMA, INDEX_KEYS)
