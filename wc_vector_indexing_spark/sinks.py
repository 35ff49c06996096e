"""Remote vector-store sinks (SURVEY §2.9 W5-W7) — the adapter contract,
re-expressed for executors.

Reference behavior (class-pinecone-adapter.php / class-openai-vectorstore-
adapter.php): client-side dimension check per vector; upserts in batches
of ``upsert_batch`` (clamp 10-500); deletes by explicit ids or by
metadata filter (product_id/site_id); transient HTTP failures (0/429/5xx)
retried 3× with exponential backoff + jitter (0.25·3^k s + 50-200 ms).

Spark restatement: a sink is driven by ``foreachPartition`` — each
partition opens its own adapter (connections are per-executor, never
pickled), slices its rows into batches, and pushes with the retry
policy. The engine's own index stays the local columnar table
(state/store.py); these sinks exist for fan-out to external stores and
are exercised in tests through the injectable fake (the reference's
adapter-injection test strategy, dev-plan:1242-1269).

Retry jitter note: backoff sleep uses a deterministic per-attempt jitter
derived from the batch content hash — retries are reproducible, no RNG.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame

TRANSIENT_CODES = (0, 429, 500, 502, 503, 504)  # class-pinecone-adapter.php:357-372
MAX_ATTEMPTS = 3
BASE_BACKOFF_S = 0.25


class SinkError(RuntimeError):
    def __init__(self, message: str, code: int = 0, transient: bool | None = None):
        super().__init__(message)
        self.code = code
        self.transient = transient if transient is not None else code in TRANSIENT_CODES


class VectorSink(Protocol):
    """Adapter contract (class-adapter-interface.php:24-34)."""

    name: str
    dimension: int

    def upsert(self, vectors: list[dict]) -> None: ...
    def delete_by_ids(self, ids: list[str]) -> None: ...
    def delete_by_filter(self, metadata_filter: dict) -> None: ...


def _with_retry(fn, payload_key: str) -> None:
    """3 attempts, 0.25·3^k s + deterministic jitter on transient errors
    (class-pinecone-adapter.php:348-381)."""
    for attempt in range(MAX_ATTEMPTS):
        try:
            fn()
            return
        except SinkError as e:
            if not e.transient or attempt == MAX_ATTEMPTS - 1:
                raise
            jitter_ms = 50 + int(
                hashlib.sha256(f"{payload_key}:{attempt}".encode()).hexdigest()[:4], 16
            ) % 150
            time.sleep(BASE_BACKOFF_S * (3**attempt) + jitter_ms / 1000.0)


@dataclass
class FileVectorSink:
    """Deterministic fake remote store: one JSONL dir per target, with an
    optional scripted failure (fail first N upsert calls with a transient
    code) to exercise the retry path. Safe to construct inside
    foreachPartition — appends are per-partition files."""

    root: str
    name: str = "fake-remote"
    dimension: int = 64
    fail_first_n: int = 0
    fail_code: int = 503

    def _dir(self) -> str:
        os.makedirs(self.root, exist_ok=True)
        return self.root

    def _attempt_file(self) -> str:
        return os.path.join(self._dir(), "_attempts")

    def _bump_attempts(self) -> int:
        # per-process attempt counter (scripted failures)
        path = self._attempt_file()
        n = 0
        if os.path.exists(path):
            with open(path) as f:
                n = int(f.read().strip() or 0)
        with open(path, "w") as f:
            f.write(str(n + 1))
        return n

    def upsert(self, vectors: list[dict]) -> None:
        for v in vectors:
            if len(v["values"]) != self.dimension:
                raise SinkError(
                    f"dimension mismatch: got {len(v['values'])}, want {self.dimension}",
                    code=400,
                    transient=False,
                )
        if self._bump_attempts() < self.fail_first_n:
            raise SinkError("scripted transient failure", code=self.fail_code)
        out = os.path.join(self._dir(), f"up-{uuid.uuid4().hex}.jsonl")
        with open(out, "w") as f:
            for v in vectors:
                f.write(json.dumps(v, default=float) + "\n")

    def delete_by_ids(self, ids: list[str]) -> None:
        out = os.path.join(self._dir(), f"del-{uuid.uuid4().hex}.jsonl")
        with open(out, "w") as f:
            f.write(json.dumps({"ids": sorted(ids)}) + "\n")

    def delete_by_filter(self, metadata_filter: dict) -> None:
        out = os.path.join(self._dir(), f"del-{uuid.uuid4().hex}.jsonl")
        with open(out, "w") as f:
            f.write(json.dumps({"filter": metadata_filter}) + "\n")

    # -- remote-listing surface (S11/W7) -----------------------------------

    def list_page(self, limit: int = 1000, after: str | None = None) -> tuple[list[dict], str | None]:
        """Cursor-paginated listing of live vectors, mirroring the remote
        list call the purge fallback walks (class-openai-vectorstore-
        adapter.php:244-252: page of up to ``limit``, opaque ``after``
        cursor, empty cursor terminates). Live = upserted minus ids the
        store has recorded deleted."""
        deleted_ids: set[str] = set()
        for rec in self.read_deletes():
            deleted_ids.update(rec.get("ids") or [])
        live = sorted(
            {v["id"]: v for v in self.read_upserted() if v["id"] not in deleted_ids}.values(),
            key=lambda v: v["id"],
        )
        start = 0
        if after is not None:
            # cursor = last id of the previous page; resolve positionally so a
            # cursor whose vector was deleted mid-pagination still advances
            start = sum(1 for v in live if v["id"] <= after)
        page = live[start : start + max(1, limit)]
        next_after = page[-1]["id"] if page and start + len(page) < len(live) else None
        return page, next_after

    # -- read-back helpers for tests --------------------------------------

    def read_upserted(self) -> list[dict]:
        rows = []
        if not os.path.isdir(self.root):
            return rows
        for name in sorted(os.listdir(self.root)):
            if name.startswith("up-"):
                with open(os.path.join(self.root, name)) as f:
                    rows.extend(json.loads(line) for line in f)
        return rows

    def read_deletes(self) -> list[dict]:
        rows = []
        if not os.path.isdir(self.root):
            return rows
        for name in sorted(os.listdir(self.root)):
            if name.startswith("del-"):
                with open(os.path.join(self.root, name)) as f:
                    rows.extend(json.loads(line) for line in f)
        return rows


@dataclass
class HttpVectorSink:
    """Real HTTP transport behind the adapter contract (r7 verdict
    task 7) — stdlib ``urllib.request`` only, speaking the
    Pinecone-style JSON REST shape the reference adapters call
    (class-pinecone-adapter.php:80-134, class-openai-vectorstore-
    adapter.php:50-211): ``POST /vectors/upsert`` ``{"vectors": [...]}``,
    ``POST /vectors/delete`` ``{"ids": [...]}`` or ``{"filter": {...}}``,
    ``GET /vectors/list?limit&after`` → ``{"vectors": [...], "after"}``.

    Status mapping mirrors the reference's transient set: connection
    errors → code 0, HTTP 429/5xx → transient (``_with_retry`` backs
    off 0.25·3^k + jitter), other 4xx → permanent. Client-side
    dimension check per vector, same as every adapter. Construct per
    partition via ``push_payloads``'s ``sink_factory`` — the dataclass
    pickles, connections are opened per call and never cross the
    boundary. Tests drive it against an in-process loopback server
    (tests/test_sinks.py) — no external endpoints."""

    base_url: str
    name: str = "http-remote"
    dimension: int = 64
    api_key: str | None = None
    timeout_s: float = 10.0

    def _request(self, method: str, path: str, body: dict | None = None,
                 query: dict | None = None) -> dict:
        import urllib.error
        import urllib.parse
        import urllib.request

        url = self.base_url.rstrip("/") + path
        if query:
            url += "?" + urllib.parse.urlencode(query)
        data = json.dumps(body, default=float).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.api_key:
            req.add_header("Api-Key", self.api_key)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                payload = resp.read()
                return json.loads(payload) if payload else {}
        except urllib.error.HTTPError as e:
            raise SinkError(
                f"{method} {path} -> HTTP {e.code}", code=e.code
            ) from e
        except urllib.error.URLError as e:
            raise SinkError(
                f"{method} {path} -> connection error: {e.reason}", code=0
            ) from e

    def upsert(self, vectors: list[dict]) -> None:
        for v in vectors:
            if len(v["values"]) != self.dimension:
                raise SinkError(
                    f"dimension mismatch: got {len(v['values'])}, "
                    f"want {self.dimension}",
                    code=400,
                    transient=False,
                )
        self._request("POST", "/vectors/upsert", {"vectors": vectors})

    def delete_by_ids(self, ids: list[str]) -> None:
        self._request("POST", "/vectors/delete", {"ids": sorted(ids)})

    def delete_by_filter(self, metadata_filter: dict) -> None:
        self._request("POST", "/vectors/delete", {"filter": metadata_filter})

    def list_page(
        self, limit: int = 1000, after: str | None = None
    ) -> tuple[list[dict], str | None]:
        query: dict = {"limit": limit}
        if after is not None:
            query["after"] = after
        out = self._request("GET", "/vectors/list", query=query)
        return out.get("vectors", []), out.get("after") or None


def push_payloads(
    payloads: DataFrame,
    sink_factory,
    batch_size: int = 100,
) -> None:
    """W5/W8: stream payload rows (vector_id, values, metadata) into a
    sink, batched per partition, retries inside the partition. The sink
    is built per partition via ``sink_factory()`` — adapters hold
    connections and must never cross the pickling boundary alive."""
    batch_size = max(10, min(500, batch_size))
    cols = payloads.select("vector_id", "values", "metadata")

    def run(rows) -> None:
        sink = sink_factory()
        batch: list[dict] = []

        def flush() -> None:
            if not batch:
                return
            key = hashlib.sha256(
                ",".join(v["id"] for v in batch).encode()
            ).hexdigest()[:12]
            _with_retry(lambda: sink.upsert(list(batch)), key)
            batch.clear()

        for row in rows:
            batch.append(
                {
                    "id": row.vector_id,
                    "values": list(row.values),
                    "metadata": row.metadata.asDict() if row.metadata else None,
                }
            )
            if len(batch) >= batch_size:
                flush()
        flush()

    cols.foreachPartition(run)


def delete_product_vectors(sink: VectorSink, site_id: int, product_id: int) -> None:
    """W6 metadata-filter delete (delete_by_product)."""
    _with_retry(
        lambda: sink.delete_by_filter({"site_id": site_id, "product_id": product_id}),
        f"delprod:{site_id}:{product_id}",
    )


def purge_site_vectors(
    sink: VectorSink,
    site_id: int,
    page_limit: int = 1000,
    batch_delete_limit: int = 500,
) -> dict:
    """W6/W7 site purge. Prefer a server-side metadata-filter delete; when
    the adapter doesn't support one, fall back to the reference's
    list → client-side filter on metadata.site_id → delete-by-ids in
    batches of 500 (class-openai-vectorstore-adapter.php:229-273).
    Returns ``{"deleted": n}`` (n is None for the filter path — the remote
    doesn't report a count)."""
    if callable(getattr(sink, "delete_by_filter", None)):
        _with_retry(
            lambda: sink.delete_by_filter({"site_id": {"$eq": site_id}}),
            f"purge:{site_id}",
        )
        return {"deleted": None}

    deleted = 0
    after: str | None = None
    while True:
        page, after = sink.list_page(limit=page_limit, after=after)
        candidates = [
            str(v["id"])
            for v in page
            if int((v.get("metadata") or {}).get("site_id", -1)) == int(site_id)
        ]
        while candidates:
            chunk = candidates[:batch_delete_limit]
            del candidates[:batch_delete_limit]
            _with_retry(
                lambda c=chunk: sink.delete_by_ids(c),
                f"purge:{site_id}:{deleted}",
            )
            deleted += len(chunk)
        if not after:
            break
    return {"deleted": deleted}


def ensure_store(root: str, name_hint: str = "wcvec") -> str:
    """W7: resolve-or-create the backing store, caching its id — the
    reference caches the OpenAI vector-store id in an option, GETs it to
    verify it still exists, and creates+caches a fresh one when the id is
    missing or the store is gone (class-openai-vectorstore-adapter.php
    ensure_store, :286-335). Local analogue: ``root/_store_id`` holds the
    cached id; the store is a subdirectory of ``root``; a dangling id is
    replaced. Returns the store directory path (the "store id")."""
    os.makedirs(root, exist_ok=True)
    opt = os.path.join(root, "_store_id")
    if os.path.exists(opt):
        with open(opt) as f:
            store_id = f.read().strip()
        if store_id and os.path.isdir(os.path.join(root, store_id)):
            return os.path.join(root, store_id)
        # fall through: store gone, create a new one (reference :308-310)
    store_id = f"{name_hint}_{uuid.uuid4().hex[:12]}"
    os.makedirs(os.path.join(root, store_id), exist_ok=True)
    with open(opt, "w") as f:
        f.write(store_id)
    return os.path.join(root, store_id)
