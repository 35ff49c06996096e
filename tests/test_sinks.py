"""Adapter-contract tests (dev-plan :1242-1269): batches carry
id/values/metadata; dimension mismatch blocks writes; transient failures
retry with backoff; delete-by-product uses the metadata filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig
from wc_vector_indexing_spark.operators.embed import DeterministicEmbedder
from wc_vector_indexing_spark.operators.indexer import build_index
from wc_vector_indexing_spark.sinks import (
    FileVectorSink,
    SinkError,
    delete_product_vectors,
    push_payloads,
)


@pytest.fixture()
def payloads(spark):
    from pyspark.sql import Row

    config = EngineConfig(
        model="fake-deterministic-64", chunking=ChunkingConfig(size=25, overlap=4)
    )
    products = spark.createDataFrame(
        [Row(product_id=i, text=f"Sink product {i}. " * 10) for i in range(1, 6)]
    )
    return build_index(products, config, DeterministicEmbedder(), text_col="text").cache()


def test_push_payloads_batches_and_shape(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    push_payloads(payloads, lambda: FileVectorSink(root, dimension=64), batch_size=10)
    rows = FileVectorSink(root).read_upserted()
    assert len(rows) == payloads.count()
    sample = rows[0]
    assert set(sample) == {"id", "values", "metadata"}  # adapter payload contract
    assert len(sample["values"]) == 64
    assert sample["metadata"]["site_id"] == 1 and "fingerprint" in sample["metadata"]
    assert sample["id"].startswith("site-1:product-")


def test_dimension_mismatch_blocks_writes(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    with pytest.raises(Exception) as ei:
        push_payloads(payloads, lambda: FileVectorSink(root, dimension=32), batch_size=10)
    assert "dimension mismatch" in str(ei.value)
    assert FileVectorSink(root).read_upserted() == []  # nothing half-written


def test_transient_failure_retries_then_succeeds(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    one = payloads.limit(3).coalesce(1)
    push_payloads(one, lambda: FileVectorSink(root, dimension=64, fail_first_n=2), batch_size=100)
    assert len(FileVectorSink(root).read_upserted()) == 3  # succeeded on attempt 3


def test_permanent_failure_raises(spark, payloads, tmp_path):
    root = str(tmp_path / "sink")
    one = payloads.limit(1).coalesce(1)
    with pytest.raises(Exception):
        push_payloads(
            one, lambda: FileVectorSink(root, dimension=64, fail_first_n=99), batch_size=100
        )


def test_metadata_filter_deletes(tmp_path):
    sink = FileVectorSink(str(tmp_path / "sink"), dimension=64)
    delete_product_vectors(sink, site_id=1, product_id=42)
    dels = sink.read_deletes()
    assert dels == [{"filter": {"site_id": 1, "product_id": 42}}]


def test_sink_error_classification():
    assert SinkError("x", code=429).transient
    assert SinkError("x", code=503).transient
    assert not SinkError("x", code=400).transient


# --- loopback HTTP transport (r7 verdict task 7) -------------------------
# An in-process ThreadingHTTPServer implements the Pinecone-style JSON
# endpoints HttpVectorSink speaks; everything stays on 127.0.0.1 — no
# external endpoints, LEAKCHECK-clean.


def _make_loopback():
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # noqa: D102 — silence test noise
            pass

        def _send(self, code, obj=None):
            body = _json.dumps(obj or {}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            store = self.server.store
            n = int(self.headers.get("Content-Length", 0))
            body = _json.loads(self.rfile.read(n) or b"{}")
            store["calls"].append(self.path)
            if store["fail_next"] > 0:
                store["fail_next"] -= 1
                return self._send(store["fail_code"], {"error": "scripted"})
            if self.path == "/vectors/upsert":
                for v in body["vectors"]:
                    store["vectors"][v["id"]] = v
                return self._send(200, {"upserted": len(body["vectors"])})
            if self.path == "/vectors/delete":
                if "ids" in body:
                    for i in body["ids"]:
                        store["vectors"].pop(i, None)
                else:
                    filt = body["filter"]

                    def match(md):
                        md = md or {}
                        for k, cond in filt.items():
                            want = cond.get("$eq") if isinstance(cond, dict) else cond
                            if md.get(k) != want:
                                return False
                        return True

                    store["vectors"] = {
                        i: v for i, v in store["vectors"].items()
                        if not match(v.get("metadata"))
                    }
                return self._send(200, {})
            return self._send(404, {})

        def do_GET(self):
            store = self.server.store
            u = urlparse(self.path)
            if u.path != "/vectors/list":
                return self._send(404, {})
            q = parse_qs(u.query)
            limit = int(q.get("limit", ["1000"])[0])
            after = q.get("after", [None])[0]
            live = sorted(store["vectors"].values(), key=lambda v: v["id"])
            if after:
                live = [v for v in live if v["id"] > after]
            page = live[: max(1, limit)]
            nxt = page[-1]["id"] if page and len(live) > len(page) else None
            return self._send(200, {"vectors": page, "after": nxt})

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    srv.store = {"vectors": {}, "calls": [], "fail_next": 0, "fail_code": 503}
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


@pytest.fixture()
def loopback():
    srv = _make_loopback()
    yield srv
    srv.shutdown()


def test_http_sink_upsert_list_delete_roundtrip(spark, payloads, loopback):
    from wc_vector_indexing_spark.sinks import HttpVectorSink

    url = f"http://127.0.0.1:{loopback.server_address[1]}"
    push_payloads(
        payloads, lambda: HttpVectorSink(url, dimension=64), batch_size=10
    )
    assert len(loopback.store["vectors"]) == payloads.count()
    sink = HttpVectorSink(url, dimension=64)
    page, after = sink.list_page(limit=3)
    assert len(page) == 3 and after == page[-1]["id"]
    walked = []
    cursor = None
    while True:
        page, cursor = sink.list_page(limit=4, after=cursor)
        walked.extend(v["id"] for v in page)
        if not cursor:
            break
    assert sorted(walked) == sorted(loopback.store["vectors"])
    sink.delete_by_ids(walked[:2])
    assert len(loopback.store["vectors"]) == len(walked) - 2


def test_http_sink_retries_on_503_then_succeeds(spark, payloads, loopback):
    from wc_vector_indexing_spark.sinks import HttpVectorSink

    url = f"http://127.0.0.1:{loopback.server_address[1]}"
    loopback.store["fail_next"] = 2
    one = payloads.limit(3).coalesce(1)
    push_payloads(one, lambda: HttpVectorSink(url, dimension=64), batch_size=100)
    assert len(loopback.store["vectors"]) == 3
    assert loopback.store["calls"].count("/vectors/upsert") == 3  # 2 fails + 1 ok


def test_http_sink_permanent_4xx_no_retry(loopback):
    from wc_vector_indexing_spark.sinks import HttpVectorSink, _with_retry

    url = f"http://127.0.0.1:{loopback.server_address[1]}"
    loopback.store["fail_next"] = 1
    loopback.store["fail_code"] = 400
    sink = HttpVectorSink(url, dimension=2)
    with pytest.raises(SinkError) as ei:
        _with_retry(
            lambda: sink.upsert([{"id": "a", "values": [1.0, 2.0]}]), "k"
        )
    assert ei.value.code == 400 and not ei.value.transient
    assert loopback.store["calls"].count("/vectors/upsert") == 1  # no retry


def test_http_purge_site_filter_path(loopback):
    from wc_vector_indexing_spark.sinks import HttpVectorSink, purge_site_vectors

    url = f"http://127.0.0.1:{loopback.server_address[1]}"
    sink = HttpVectorSink(url, dimension=2)
    sink.upsert(
        [
            {"id": f"s{s}:v{i}", "values": [1.0, 2.0],
             "metadata": {"site_id": s}}
            for s in (1, 2)
            for i in range(3)
        ]
    )
    out = purge_site_vectors(sink, site_id=1)
    assert out == {"deleted": None}  # server-side filter path
    left = loopback.store["vectors"]
    assert len(left) == 3 and all(v["metadata"]["site_id"] == 2 for v in left.values())


def test_http_sink_connection_error_is_transient():
    from wc_vector_indexing_spark.sinks import HttpVectorSink

    sink = HttpVectorSink("http://127.0.0.1:9", dimension=2, timeout_s=0.3)
    with pytest.raises(SinkError) as ei:
        sink.upsert([{"id": "a", "values": [1.0, 2.0]}])
    assert ei.value.code == 0 and ei.value.transient
