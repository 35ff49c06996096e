"""Delta sync — the heart of the engine (SURVEY §2.7 J3-J6, §3.1 step 4).

Given a fresh chunk build (indexer.build_chunks — shas computed, NOTHING
embedded yet) and the sync-state ledger, classify work per product:

  J6 rebuild       any existing state row carries a different model or
                   dimension → every chunk of that product re-embeds
                   (class-indexer.php:320-327)
  J5 unchanged     existing product_sha == new product_sha AND the stored
                   chunk-index set equals the new chunk-index set AND no
                   error rows → ZERO embedding/upsert work; only
                   timestamps are touched (class-indexer.php:329-360 —
                   the 'SHA skip', the reference's #1 cost optimization)
  J4 to_upsert     chunk is new, or its chunk_sha differs, or the product
                   is in rebuild/force → embed + upsert
                   (class-indexer.php:373-388)
  J3 to_delete     stored chunk_index absent from the new build → delete
                   from index + state (class-indexer.php:363-371)

The reference runs this per product in a PHP loop; here it is four joins
over the whole corpus at once — at 100 TB both sides are partitioned by
product_id so every join/groupBy reuses one hash partitioning, and the
embed stage (the only expensive part) runs over exactly the changed rows.

Apply order mirrors the reference (class-indexer.php:391-476): deletes
first (remote then state), then batched upserts, then state MERGE, then
timestamp touch for unchanged products — all expressed as MERGE/DELETE
against the ParquetMergeStore (Delta MERGE INTO on a real cluster).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import EngineConfig, VALID_TARGETS
from wc_vector_indexing_spark.operators.embed import EmbeddingBackend, embed_texts
from wc_vector_indexing_spark.operators.indexer import attach_payload
from wc_vector_indexing_spark.state.store import ParquetMergeStore


@dataclass
class DeltaPlan:
    """Lazy classification of sync work. All DataFrames; nothing runs
    until apply_sync (or a caller) forces them."""

    to_upsert: DataFrame  # chunk rows needing embed + upsert
    to_delete: DataFrame  # state keys (product_id, chunk_index) gone stale
    unchanged: DataFrame  # product_ids to touch only
    rebuild: DataFrame  # product_ids forced by model/dim change (⊆ to_upsert's products)


def diff(
    new_chunks: DataFrame,
    existing_state: DataFrame,
    config: EngineConfig,
    force: bool = False,
) -> DeltaPlan:
    """Classify chunk-level work. ``new_chunks`` must carry product_id,
    chunk_index, chunk_sha, product_sha (+ text cols for the embed
    stage); ``existing_state`` is the ledger filtered to one target."""
    existing = existing_state.select(
        "product_id",
        "chunk_index",
        F.col("chunk_sha").alias("old_chunk_sha"),
        F.col("product_sha").alias("old_product_sha"),
        F.col("model").alias("old_model"),
        F.col("dimension").alias("old_dimension"),
        "status",
    )

    # J6: any state row with a different model/dimension → rebuild product
    rebuild = (
        existing.filter(
            (F.col("old_model") != config.model)
            | (F.col("old_dimension") != F.lit(config.dimension))
        )
        .select("product_id")
        .distinct()
    )

    # J5: per-product signature comparison — product_sha stable AND chunk
    # index sets identical AND nothing in error. Sorted index-array
    # equality == set equality here because both sides are unique per
    # (product, chunk_index).
    new_sig = new_chunks.groupBy("product_id").agg(
        F.first("product_sha").alias("new_sha"),
        F.sort_array(F.collect_list("chunk_index")).alias("new_idx"),
    )
    old_sig = existing.groupBy("product_id").agg(
        F.max("old_product_sha").alias("old_sha"),
        F.sort_array(F.collect_list("chunk_index")).alias("old_idx"),
        F.max(F.when(F.col("status") == "error", 1).otherwise(0)).alias("has_error"),
    )
    unchanged = (
        new_sig.join(old_sig, "product_id")
        .filter(
            (F.col("new_sha") == F.col("old_sha"))
            & (F.col("new_idx") == F.col("old_idx"))
            & (F.col("has_error") == 0)
        )
        .join(rebuild, "product_id", "left_anti")
        .select("product_id")
    )
    if force:
        unchanged = unchanged.limit(0)

    # J4: upsert = (new ⟕ existing on key) where missing / sha differs /
    # rebuild / force — minus unchanged products (belt and braces; an
    # unchanged product has no differing shas by construction).
    joined = new_chunks.join(
        existing.select("product_id", "chunk_index", "old_chunk_sha"),
        ["product_id", "chunk_index"],
        "left",
    )
    changed = joined.filter(
        F.lit(force)
        | F.col("old_chunk_sha").isNull()
        | (F.col("old_chunk_sha") != F.col("chunk_sha"))
    )
    rebuild_chunks = joined.join(rebuild, "product_id", "left_semi")
    to_upsert = (
        changed.unionByName(rebuild_chunks)
        .dropDuplicates(["product_id", "chunk_index"])
        .join(unchanged, "product_id", "left_anti")
        .drop("old_chunk_sha")
    )

    # J3: stale = existing keys absent from the new build (per product in
    # the new build — products absent entirely are deletes, handled by
    # the delete flow, not the sync diff)
    new_products = new_chunks.select("product_id").distinct()
    to_delete = (
        existing.select("product_id", "chunk_index")
        .join(new_products, "product_id", "left_semi")
        .join(new_chunks.select("product_id", "chunk_index"), ["product_id", "chunk_index"], "left_anti")
    )

    return DeltaPlan(to_upsert=to_upsert, to_delete=to_delete, unchanged=unchanged, rebuild=rebuild)


@dataclass
class SyncSummary:
    target: str
    upserted: int
    deleted: int
    skipped_products: int
    errored: int = 0


def apply_sync(
    plan: DeltaPlan,
    state: ParquetMergeStore,
    index: ParquetMergeStore,
    config: EngineConfig,
    backend: EmbeddingBackend,
    target: str = "local",
    product_cols: list[str] | None = None,
) -> SyncSummary:
    """Execute a DeltaPlan against the state ledger + vector index
    (apply order: class-indexer.php:391-476)."""
    if target not in VALID_TARGETS:
        raise ValueError(f"invalid target {target!r}")
    now = F.current_timestamp()

    # 1) deletes: stale chunks leave index and state (W2/W6) — key-set
    # anti-join deletes, fully distributed
    del_keys = plan.to_delete.select("product_id", "chunk_index", F.lit(target).alias("target"))
    del_keys = del_keys.cache()
    n_delete = del_keys.count()
    if n_delete:
        index.delete_keys(del_keys, ["target", "product_id", "chunk_index"])
        state.delete_keys(del_keys, ["target", "product_id", "chunk_index"])

    # 2) embed ONLY the changed chunks with per-batch failure isolation
    # (W8), then upsert the successful payloads (W5)
    embedded = embed_texts(
        plan.to_upsert,
        text_col="chunk_text",
        out_col="values",
        backend=backend,
        batch_size=config.embed_batch,
        on_error="mark",
    )
    all_payloads = attach_payload(embedded, config, product_cols or []).withColumn(
        "target", F.lit(target)
    )
    all_payloads = all_payloads.cache()
    failed = all_payloads.filter(F.col("embed_error").isNotNull())
    n_failed = failed.count()
    payloads = all_payloads.filter(F.col("embed_error").isNull())
    n_upsert = payloads.count()

    # W3: failed chunks land in the ledger as status='error' with the
    # snippet; they re-queue at priority 1 on the next scan (T8)
    if n_failed:
        state.merge(
            failed.select(
                F.lit(config.site_id).cast("long").alias("site_id"),
                "product_id",
                "target",
                "chunk_index",
                "vector_id",
                "product_sha",
                # chunk_sha stays NULL so the next diff re-selects the
                # chunk for embedding (a recorded sha would read as
                # 'already synced' and the error would never retry)
                F.lit(None).cast("string").alias("chunk_sha"),
                F.lit(config.model).alias("model"),
                F.lit(config.dimension).alias("dimension"),
                F.lit(None).cast("string").alias("remote_id"),
                F.lit("error").alias("status"),
                F.lit("embed_failed").alias("error_code"),
                F.col("embed_error").alias("error_msg"),
                F.lit(None).cast("timestamp").alias("last_synced_at"),
                now.alias("created_at"),
                now.alias("updated_at"),
            )
        )
    if n_upsert:
        index.merge(
            payloads.select(
                "target", "vector_id", "product_id", "chunk_index",
                "chunk_text", "values", "product_sha", "chunk_sha", "metadata",
            )
        )
        # 3) record per-chunk sync state (W1 MERGE; created_at immutable)
        state.merge(
            payloads.select(
                F.lit(config.site_id).cast("long").alias("site_id"),
                "product_id",
                "target",
                "chunk_index",
                "vector_id",
                "product_sha",
                "chunk_sha",
                F.lit(config.model).alias("model"),
                F.lit(config.dimension).alias("dimension"),
                F.lit(None).cast("string").alias("remote_id"),
                F.lit("synced").alias("status"),
                F.lit(None).cast("string").alias("error_code"),
                F.lit(None).cast("string").alias("error_msg"),
                now.alias("last_synced_at"),
                now.alias("created_at"),
                now.alias("updated_at"),
            )
        )

    # 4) unchanged products: touch timestamps only (W4, zero remote
    # work) — keyed join update, no driver-side id collection
    unchanged_keys = plan.unchanged.select("product_id").withColumn("target", F.lit(target))
    unchanged_keys = unchanged_keys.cache()
    n_unchanged = unchanged_keys.count()
    if n_unchanged:
        state.update_keys(
            unchanged_keys,
            {"last_synced_at": now, "updated_at": now},
            key_cols=["target", "product_id"],
        )

    return SyncSummary(
        target=target,
        upserted=n_upsert,
        deleted=n_delete,
        skipped_products=n_unchanged,
        errored=n_failed,
    )


def delete_products(
    product_ids: list[int],
    state: ParquetMergeStore,
    index: ParquetMergeStore,
    targets: tuple[str, ...] = ("local",),
) -> int:
    """Product-delete flow (class-job-delete-product.php:45-90): remove
    all vectors + state rows for the products, per target — the W6
    metadata-filter delete re-expressed as a predicate delete."""
    n = 0
    for target in targets:
        cond = (F.col("target") == target) & F.col("product_id").isin(product_ids)
        n += index.read().filter(cond).count()
        index.delete_where(cond)
        state.delete_where(cond)
    return n


def purge_site(
    site_id: int,
    state: ParquetMergeStore,
    index: ParquetMergeStore,
) -> int:
    """Site-wide purge (class-job-purge-site.php:39-85): predicate delete
    on metadata.site_id across all targets + full state wipe for site."""
    cond = F.col("metadata.site_id") == site_id
    n = index.read().filter(cond).count()
    index.delete_where(cond)
    state.delete_where(F.col("site_id") == site_id)
    return n


def sync_products(
    products: DataFrame,
    state: ParquetMergeStore,
    index: ParquetMergeStore,
    config: EngineConfig,
    backend: EmbeddingBackend,
    text_col: str | None = None,
    force: bool = False,
    event_log=None,
) -> dict[str, SyncSummary]:
    """End-to-end incremental sync of a product batch to every configured
    target (SURVEY §3.1): build chunks once, then per-target diff+apply.
    Pass an ``logs.EventLog`` to record per-target telemetry rows (U5,
    class-job-index-product.php:108-128 outcome events)."""
    import time as _time

    from wc_vector_indexing_spark.operators.indexer import build_chunks

    chunks = build_chunks(products, config, text_col=text_col).cache()
    summaries: dict[str, SyncSummary] = {}
    for target in config.targets:
        t0 = _time.time()
        existing = state.read().filter(F.col("target") == target)
        plan = diff(chunks, existing, config, force=force)
        s = apply_sync(
            plan, state, index, config, backend, target=target, product_cols=products.columns
        )
        # the plan's lazy reads of the diff-time snapshot are dead now —
        # release the version leases so vacuum can reclaim the dirs
        state.release_leases()
        index.release_leases()
        summaries[target] = s
        if event_log is not None:
            event_log.append(
                [
                    {
                        "site_id": config.site_id,
                        "target": target,
                        "action": "sync_batch",
                        "outcome": "error" if s.errored else "success",
                        "message": f"upserted={s.upserted} deleted={s.deleted} "
                        f"skipped={s.skipped_products} errored={s.errored}",
                        "duration_ms": int((_time.time() - t0) * 1000),
                        "count": s.upserted,
                    }
                ]
            )
    return summaries
