"""Incremental candidate discovery — the engine's scheduler restated as
one DataFrame query (SURVEY §3.2, class-scheduler.php:109-175).

One incremental batch =
    errors(priority 1) ∪ modified-since(priority 2) ∪ never-synced(priority 3)
    → variation→parent expansion → first-seen dedupe → limit(min(batch, quota))

all as a single lazy plan (the reference runs three MySQL queries and
merges in PHP). The watermark (T3) is a persisted high-water timestamp;
first run looks back 48 h (class-scheduler.php:134-137).

At 100 TB: the modified-since scan is the hot path — the products table
is partitioned/sorted by modified_at so the watermark predicate prunes
files; the anti-join for never-synced broadcasts the distinct synced-id
set when small, else AQE picks a shuffled join.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import FIRST_SCAN_LOOKBACK_HOURS, EngineConfig

PRIORITY_ERROR, PRIORITY_MODIFIED, PRIORITY_INITIAL = 1, 2, 3


class Watermark:
    """Persisted scan watermark (≙ last_scan_gmt option,
    class-scheduler.php:134-137 + class-options.php:496-504)."""

    def __init__(self, path: str):
        self.path = path

    def get(self, now: datetime | None = None) -> datetime:
        try:
            with open(self.path) as f:
                return datetime.fromisoformat(json.load(f)["last_scan"])
        except (FileNotFoundError, KeyError, ValueError):
            now = now or datetime.now(timezone.utc)
            return now - timedelta(hours=FIRST_SCAN_LOOKBACK_HOURS)

    def advance(self, to: datetime) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_scan": to.isoformat()}, f)
        os.replace(tmp, self.path)


def never_synced(products: DataFrame, state: DataFrame, limit: int) -> DataFrame:
    """S3/J1: published products with no state rows, newest first
    (class-storage.php:223-243)."""
    return (
        products.filter(F.col("status") == "publish")
        .join(state.select("product_id").distinct(), "product_id", "left_anti")
        .orderBy(F.desc("modified_at"), F.desc("product_id"))
        .limit(limit)
        .select("product_id", "product_type", "parent_id")
    )


def modified_since(
    products: DataFrame, state: DataFrame, since: datetime, limit: int
) -> DataFrame:
    """S4/J2/A2: products modified after the watermark whose last sync
    predates the modification (class-storage.php:254-281)."""
    last_sync = state.groupBy("product_id").agg(
        F.max(F.greatest("updated_at", "last_synced_at")).alias("last_sync")
    )
    return (
        products.filter(F.col("status") == "publish")
        .filter(F.col("modified_at") >= F.lit(since))
        .join(last_sync, "product_id", "left")
        .filter(F.col("last_sync").isNull() | (F.col("last_sync") < F.col("modified_at")))
        .orderBy(F.desc("modified_at"), F.desc("product_id"))
        .limit(limit)
        .select("product_id", "product_type", "parent_id")
    )


def error_rows(products: DataFrame, state: DataFrame, limit: int) -> DataFrame:
    """S5: products with error-status chunks, id-desc (class-storage.php:300-308)."""
    errs = (
        state.filter(F.col("status") == "error")
        .select("product_id")
        .distinct()
        .orderBy(F.desc("product_id"))
        .limit(limit)
    )
    return errs.join(
        products.select("product_id", "product_type", "parent_id"), "product_id", "left"
    ).select("product_id", "product_type", "parent_id")


def expand_parents(candidates: DataFrame) -> DataFrame:
    """J8: for variation rows also emit the parent id, dedupe
    (class-storage.php:317-340). Parents re-roll their collapse text
    whenever a child changes."""
    return (
        candidates.select(
            F.explode(
                F.array(
                    F.col("product_id"),
                    F.when(
                        (F.col("product_type") == "variation") & (F.col("parent_id") > 0),
                        F.col("parent_id"),
                    ),
                )
            ).alias("product_id"),
            "product_type",
        )
        .filter(F.col("product_id").isNotNull())
        .select("product_id")
        .dropDuplicates(["product_id"])
    )


def scan_candidates(
    products: DataFrame,
    state: DataFrame,
    config: EngineConfig,
    since: datetime,
    quota: int | None = None,
) -> DataFrame:
    """The full J7 priority union: errors → modified → initial, first-seen
    wins, capped at min(scan_batch_limit, quota) (K5,
    class-scheduler.php:139-158). Returns product_id + priority."""
    limit = config.scan_batch_limit
    errs = error_rows(products, state, limit).withColumn("priority", F.lit(PRIORITY_ERROR))
    mods = modified_since(products, state, since, limit).withColumn(
        "priority", F.lit(PRIORITY_MODIFIED)
    )
    init = never_synced(products, state, limit).withColumn("priority", F.lit(PRIORITY_INITIAL))
    unioned = errs.unionByName(mods).unionByName(init)
    expanded = (
        unioned.select(
            F.explode(
                F.array(
                    F.col("product_id"),
                    F.when(
                        (F.col("product_type") == "variation") & (F.col("parent_id") > 0),
                        F.col("parent_id"),
                    ),
                )
            ).alias("product_id"),
            "priority",
        )
    ).filter(F.col("product_id").isNotNull())
    w = Window.partitionBy("product_id").orderBy("priority")
    take = min(limit, quota) if quota is not None else limit
    return (
        expanded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("product_id", "priority")
        .orderBy("priority", "product_id")
        .limit(take)
    )


def run_incremental_batch(
    products: DataFrame,
    state_store,
    index_store,
    config: EngineConfig,
    backend,
    watermark: Watermark,
    now: datetime | None = None,
    text_col: str | None = None,
):
    """One scheduler tick (T2/T3): discover candidates since the
    watermark, sync them, advance the watermark. Batch-incremental; the
    streaming wrapper (streaming/incremental.py) drives the same body
    from a change-event stream."""
    from wc_vector_indexing_spark.operators.delta_sync import sync_products

    now = now or datetime.now(timezone.utc)
    since = watermark.get(now)
    state = state_store.read()
    cands = scan_candidates(products, state, config, since)
    batch = products.join(cands.select("product_id"), "product_id", "left_semi")
    summaries = sync_products(
        batch, state_store, index_store, config, backend, text_col=text_col
    )
    watermark.advance(now)
    return summaries
