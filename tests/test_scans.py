"""Scheduler-scan semantics (SURVEY §3.2, dev-plan :1792-1801):
candidates ≤ limit, priority order errors→modified→initial, first-seen
dedupe, parent expansion, watermark advance."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig
from wc_vector_indexing_spark.operators.embed import DeterministicEmbedder
from wc_vector_indexing_spark.plans.scans import (
    Watermark,
    error_rows,
    expand_parents,
    modified_since,
    never_synced,
    run_incremental_batch,
    scan_candidates,
)
from wc_vector_indexing_spark.state.store import sync_state_store, vector_index_store

T0 = datetime(2025, 6, 1, tzinfo=timezone.utc)


def mk_products(spark):
    rows = []
    for pid in range(1, 11):
        rows.append(
            Row(
                product_id=pid,
                parent_id=0 if pid < 9 else 1,
                product_type="variation" if pid >= 9 else "simple",
                status="draft" if pid == 5 else "publish",
                text=f"Product number {pid} body text.",
                modified_at=T0 + timedelta(hours=pid),
            )
        )
    return spark.createDataFrame(rows)


def mk_state(spark, store):
    # products 1-3 synced (1 stale, 2 fresh, 3 error), rest never synced
    now = T0 + timedelta(hours=1, minutes=30)
    rows = [
        Row(site_id=1, product_id=1, target="local", chunk_index=0,
            vector_id="site-1:product-1:chunk-0", product_sha="x", chunk_sha="x",
            model="fake-deterministic-64", dimension=64, remote_id=None, status="synced",
            error_code=None, error_msg=None,
            last_synced_at=now - timedelta(hours=1), created_at=now, updated_at=now - timedelta(hours=1)),
        Row(site_id=1, product_id=2, target="local", chunk_index=0,
            vector_id="site-1:product-2:chunk-0", product_sha="x", chunk_sha="x",
            model="fake-deterministic-64", dimension=64, remote_id=None, status="synced",
            error_code=None, error_msg=None,
            last_synced_at=T0 + timedelta(days=30), created_at=now, updated_at=T0 + timedelta(days=30)),
        Row(site_id=1, product_id=3, target="local", chunk_index=0,
            vector_id="site-1:product-3:chunk-0", product_sha="x", chunk_sha="x",
            model="fake-deterministic-64", dimension=64, remote_id=None, status="error",
            error_code="E42", error_msg="boom", last_synced_at=None, created_at=now, updated_at=now),
    ]
    store.overwrite(store.spark.createDataFrame(rows, store.schema))
    return store


def test_never_synced_excludes_synced_and_drafts(spark, tmp_path):
    store = mk_state(spark, sync_state_store(spark, str(tmp_path / "s")))
    got = {r.product_id for r in never_synced(mk_products(spark), store.read(), 100).collect()}
    assert got == {4, 6, 7, 8, 9, 10}  # 1-3 synced, 5 is draft


def test_modified_since_staleness(spark, tmp_path):
    store = mk_state(spark, sync_state_store(spark, str(tmp_path / "s")))
    got = {
        r.product_id
        for r in modified_since(mk_products(spark), store.read(), T0, 100).collect()
    }
    # 1 stale (sync < modified), 2 fresh (sync way later), 3 error but
    # modified > its updated_at? row3 updated now=T0+1.5h, modified T0+3h → stale
    assert 1 in got and 2 not in got and 3 in got
    assert 5 not in got  # draft


def test_error_rows(spark, tmp_path):
    store = mk_state(spark, sync_state_store(spark, str(tmp_path / "s")))
    got = [r.product_id for r in error_rows(mk_products(spark), store.read(), 10).collect()]
    assert got == [3]


def test_priority_and_limit(spark, tmp_path):
    store = mk_state(spark, sync_state_store(spark, str(tmp_path / "s")))
    config = EngineConfig(model="fake-deterministic-64")
    cands = scan_candidates(mk_products(spark), store.read(), config, T0).collect()
    by_id = {r.product_id: r.priority for r in cands}
    assert by_id[3] == 1  # error wins
    assert by_id[1] == 2  # modified (stale sync)
    assert by_id[4] == 2  # never synced BUT recently modified → S4 catches it
    # watermark after all modifications → initial scan owns the unsynced
    late = scan_candidates(
        mk_products(spark), store.read(), config, T0 + timedelta(hours=12)
    ).collect()
    late_by_id = {r.product_id: r.priority for r in late}
    assert late_by_id[4] == 3 and late_by_id[3] == 1
    # quota cap K5
    capped = scan_candidates(mk_products(spark), store.read(), config, T0, quota=2).collect()
    assert len(capped) == 2
    assert [r.priority for r in capped] == sorted(r.priority for r in capped)


def test_parent_expansion(spark, tmp_path):
    store = mk_state(spark, sync_state_store(spark, str(tmp_path / "s")))
    config = EngineConfig(model="fake-deterministic-64")
    cands = scan_candidates(mk_products(spark), store.read(), config, T0)
    ids = {r.product_id for r in cands.collect()}
    # variations 9,10 are candidates AND their parent 1 appears once
    assert {9, 10, 1} <= ids
    exp = expand_parents(
        spark.createDataFrame([Row(product_id=9, product_type="variation", parent_id=1)])
    ).collect()
    assert {r.product_id for r in exp} == {9, 1}


def test_watermark_roundtrip(tmp_path):
    wm = Watermark(str(tmp_path / "wm.json"))
    now = datetime(2025, 7, 1, 12, 0, tzinfo=timezone.utc)
    assert wm.get(now) == now - timedelta(hours=48)  # first-run lookback
    wm.advance(now)
    assert wm.get() == now


def test_run_incremental_batch_end_to_end(spark, tmp_path):
    config = EngineConfig(
        model="fake-deterministic-64", chunking=ChunkingConfig(size=25, overlap=4)
    )
    state = sync_state_store(spark, str(tmp_path / "state"))
    index = vector_index_store(spark, str(tmp_path / "index"))
    wm = Watermark(str(tmp_path / "wm.json"))
    products = mk_products(spark)
    s1 = run_incremental_batch(
        products, state, index, config, DeterministicEmbedder(), wm,
        now=T0 + timedelta(days=1), text_col="text",
    )["local"]
    assert s1.upserted > 0
    # second tick, nothing changed → zero upserts, all skipped
    s2 = run_incremental_batch(
        products, state, index, config, DeterministicEmbedder(), wm,
        now=T0 + timedelta(days=1, minutes=15), text_col="text",
    )["local"]
    assert s2.upserted == 0 and s2.deleted == 0
