"""W7/W10 reference-surface closers: state-table CSV export alongside the
events export (class-admin-page-logs.php:125-200) and the paginated
list -> client-filter -> batched-delete purge fallback + ensure_store
(class-openai-vectorstore-adapter.php:229-335)."""

from __future__ import annotations

import csv
import glob
import os
from datetime import datetime, timezone

from pyspark.sql import Row

from wc_vector_indexing_spark.logs import STATE_CSV_COLUMNS, export_state_csv
from wc_vector_indexing_spark.sinks import (
    FileVectorSink,
    ensure_store,
    purge_site_vectors,
)
from wc_vector_indexing_spark.state.store import SYNC_STATE_SCHEMA


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def _state_rows(spark, n=6):
    rows = [
        Row(
            site_id=1 + (i % 2),
            product_id=100 + i,
            target="local",
            chunk_index=0,
            vector_id=f"v-{i:03d}",
            product_sha=f"sha-{i}",
            chunk_sha=f"csha-{i}",
            model="fake-deterministic-64",
            dimension=64,
            remote_id=None,
            status="error" if i % 3 == 0 else "synced",
            error_code="E42" if i % 3 == 0 else None,
            error_msg=("x" * 400) if i % 3 == 0 else None,
            last_synced_at=None,
            created_at=_ts("2026-08-01T00:00:00"),
            updated_at=_ts(f"2026-08-0{1 + i}T00:00:00"),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SYNC_STATE_SCHEMA)


def _read_csv(out_dir: str) -> list[dict]:
    (path,) = glob.glob(os.path.join(out_dir, "part-*.csv"))
    with open(path) as f:
        return list(csv.DictReader(f))


def test_state_csv_columns_order_and_truncation(spark, tmp_path):
    out = str(tmp_path / "state_csv")
    export_state_csv(_state_rows(spark), out)
    rows = _read_csv(out)
    assert len(rows) == 6
    # header order mirrors the reference's fputcsv row (minus surrogate id)
    assert list(rows[0].keys()) == STATE_CSV_COLUMNS
    # updated_at DESC ordering
    assert [r["vector_id"] for r in rows[:2]] == ["v-005", "v-004"]
    # SUBSTRING(error_msg, 1, 300)
    err = next(r for r in rows if r["error_code"] == "E42")
    assert len(err["error_msg"]) == 300


def test_state_csv_filters_and_paging(spark, tmp_path):
    state = _state_rows(spark)
    out = str(tmp_path / "err_csv")
    export_state_csv(state, out, status="error")
    assert {r["status"] for r in _read_csv(out)} == {"error"}

    out2 = str(tmp_path / "page_csv")
    # per_page below the clamp floor of 10 -> clamped, all 6 rows on page 1
    export_state_csv(state, out2, per_page=2, page=1)
    assert len(_read_csv(out2)) == 6

    out3 = str(tmp_path / "site_csv")
    export_state_csv(state, out3, site_id=1)
    assert {r["site_id"] for r in _read_csv(out3)} == {"1"}


class _ListOnlySink(FileVectorSink):
    """Adapter without server-side filter deletes — forces the reference's
    list -> filter -> batched delete fallback path."""

    delete_by_filter = None  # not callable -> purge falls back


def _seed_two_sites(root: str, n_per_site: int = 7) -> FileVectorSink:
    sink = FileVectorSink(root, dimension=2)
    sink.upsert(
        [
            {"id": f"s{site}-{i:03d}", "values": [1.0, 2.0], "metadata": {"site_id": site}}
            for site in (1, 2)
            for i in range(n_per_site)
        ]
    )
    return sink


def test_purge_fallback_paginates_filters_and_batches(tmp_path):
    root = str(tmp_path / "remote")
    _seed_two_sites(root, n_per_site=7)
    sink = _ListOnlySink(root, dimension=2)
    # tiny pages + tiny delete batches to force multiple rounds of each
    res = purge_site_vectors(sink, site_id=1, page_limit=3, batch_delete_limit=2)
    assert res == {"deleted": 7}
    live, after = FileVectorSink(root).list_page(limit=100)
    assert after is None
    assert [v["id"] for v in live] == [f"s2-{i:03d}" for i in range(7)]
    # deletes were batched at the limit
    delete_batches = [rec["ids"] for rec in FileVectorSink(root).read_deletes()]
    assert all(len(b) <= 2 for b in delete_batches)
    assert sum(len(b) for b in delete_batches) == 7


def test_purge_prefers_server_side_filter(tmp_path):
    root = str(tmp_path / "remote")
    sink = _seed_two_sites(root, n_per_site=2)
    res = purge_site_vectors(sink, site_id=1)
    assert res == {"deleted": None}  # filter path reports no count
    (rec,) = FileVectorSink(root).read_deletes()
    assert rec["filter"] == {"site_id": {"$eq": 1}}


def test_list_page_cursor_walks_all(tmp_path):
    root = str(tmp_path / "remote")
    sink = _seed_two_sites(root, n_per_site=5)
    seen, after = [], None
    while True:
        page, after = sink.list_page(limit=4, after=after)
        seen.extend(v["id"] for v in page)
        if after is None:
            break
    assert seen == sorted(seen) and len(seen) == 10


def test_ensure_store_caches_and_recreates(tmp_path):
    root = str(tmp_path / "stores")
    first = ensure_store(root, name_hint="wcvec_site1")
    assert os.path.isdir(first)
    # cached id resolves to the same store
    assert ensure_store(root) == first
    # store vanished -> a fresh one is created and cached (reference :308)
    os.rmdir(first)
    second = ensure_store(root)
    assert second != first and os.path.isdir(second)
    assert ensure_store(root) == second
