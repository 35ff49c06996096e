"""WARC-format source: read raw Common Crawl capture files (the .warc
files — full HTTP responses, HTML and all) as a DataFrame. Paired with
``operators/html_extract`` this is the raw-crawl front door: WARC →
HTML → main text → every downstream text operator.

Same framing strategy as the WET reader (sources/wet.py): the IIPC
WARC / ISO 28500 record grammar is ``WARC/<version>`` + headers +
blank line + payload + blank blank; ``spark.read.text`` with the
version-AGNOSTIC record boundary ``\\r\\n\\r\\nWARC/`` as ``lineSep``
makes the JVM do the splitting (WARC/1.0 and WARC/1.1 files — modern
Common Crawl is 1.1 — both frame correctly), and header + HTTP
parsing is one zero-shuffle Arrow pass. The leftover ``1.x`` version
token line at the head of each record body carries no colon, so the
header scan skips it by construction. The difference from WET:
``WARC-Type: response`` records carry an HTTP/1.1 response (status
line, headers, body) as payload, so the parser additionally splits the
HTTP envelope and keeps only 200-status text/html bodies.

Reference note: the reference engine has no crawl-ingestion path; this
module is north-star training-pipeline surface (public spec only).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("html", T.StringType()),
        T.StructField("warc_path", T.StringType()),
    ]
)

_HEADER_KEYS = {
    "warc-target-uri": "url",
    "warc-date": "warc_date",
    "warc-record-id": "record_id",
    "content-length": "content_length",
    "warc-type": "_type",
}


def _split_once(body: str) -> tuple[str, str] | None:
    cut = None
    for sep in ("\r\n\r\n", "\n\n"):
        i = body.find(sep)
        if i != -1 and (cut is None or i < cut[0]):
            cut = (i, len(sep))
    if cut is None:
        return None
    return body[: cut[0]], body[cut[0] + cut[1]:]


def _parse_record(raw: str) -> dict | None:
    """One record body (text after a ``\\r\\n\\r\\nWARC/`` delimiter)
    → parsed response row, or None for non-response / non-HTML
    records. The body starts with the leftover version token
    (``1.0``/``1.1``) — or ``WARC/1.x`` for the file's first record —
    which the colon-less header skip ignores."""
    split = _split_once(raw.lstrip("\r\n"))
    if split is None:
        return None
    head, payload = split
    rec: dict = {"_type": None, "url": None, "warc_date": None,
                 "record_id": None, "content_length": None}
    seen = False
    for line in head.replace("\r\n", "\n").split("\n"):
        k, colon, v = line.partition(":")
        if not colon:
            continue
        key = _HEADER_KEYS.get(k.strip().lower())
        if key:
            rec[key] = v.strip()
            seen = True
    if not seen or rec["_type"] != "response":
        return None
    try:
        n = int(rec["content_length"])
    except (TypeError, ValueError):
        n = None
    if n is not None:
        payload = payload.encode("utf-8")[:n].decode("utf-8", errors="ignore")
    else:
        payload = payload.rstrip("\r\n")
    # the payload is an HTTP/1.1 response: status line + headers + body
    http = _split_once(payload)
    if http is None:
        return None
    http_head, body = http
    lines = http_head.replace("\r\n", "\n").split("\n")
    status = None
    ctype = None
    if lines and lines[0].startswith("HTTP/"):
        parts = lines[0].split(" ", 2)
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for line in lines[1:]:
        k, colon, v = line.partition(":")
        if colon and k.strip().lower() == "content-type":
            ctype = v.strip()
    if status != 200 or not (ctype or "").lower().startswith("text/html"):
        return None
    return {
        "url": rec["url"],
        "warc_date": rec["warc_date"],
        "record_id": rec["record_id"],
        "http_status": status,
        "content_type": ctype,
        "html": body,
    }


def _parse_pass(raw: DataFrame) -> DataFrame:
    """The shared Arrow parse stage over framed record bodies
    (columns: value, warc_path) — used verbatim by the batch reader
    and the streaming twin, so both paths can never diverge."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # torn-payload reassembly shared with the WET reader; carries
        # state across Arrow batches (see wet._stitch)
        from wc_vector_indexing_spark.sources.wet import _stitch

        cols = [f.name for f in WARC_SCHEMA.fields]

        def rows():
            for pdf in batches:
                yield from zip(pdf["value"], pdf["warc_path"])

        out: list[dict] = []
        for body, fpath in _stitch(rows()):
            rec = _parse_record(body)
            if rec is not None:
                rec["warc_path"] = fpath
                out.append(rec)
            if len(out) >= 1024:
                yield pd.DataFrame(out, columns=cols)
                out = []
        yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(parse, schema=WARC_SCHEMA)


_LINESEP = "\r\n\r\nWARC/"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into (url, warc_date, record_id, http_status,
    content_type, html, warc_path) — 200-status text/html response
    records only. JVM-side record framing, one Arrow parse pass, zero
    shuffle; compose with ``html_extract.extract_documents`` for the
    crawl → text pipeline."""
    raw = (
        spark.read.text(path, lineSep=_LINESEP)
        .withColumn("warc_path", F.input_file_name())
    )
    return _parse_pass(raw)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_warc`: a file-source
    ``readStream`` with the same JVM-side record framing and the same
    Arrow parse stage. New ``.warc`` files dropped into ``path`` become
    micro-batches; the file-source checkpoint (plus a downstream
    file-sink commit log) gives exactly-once over crawl archives. The
    framing/parse code is shared with the batch reader, so a streaming
    crawl and a batch backfill can never disagree on what a record is.

    At 100 TB this is the continuous-ingest front door: Common Crawl
    drops land in object storage, ``maxFilesPerTrigger`` bounds each
    micro-batch, and everything downstream of the parse is the same
    zero-shuffle Arrow pass the batch path runs."""
    raw = (
        spark.readStream.text(path, lineSep=_LINESEP)
        .withColumn("warc_path", F.input_file_name())
    )
    return _parse_pass(raw)


def to_warc_bytes(records: list[dict], version: str = "1.0") -> bytes:
    """Serialize (url, html, [status], [content_type]) dicts to a
    spec-shaped WARC byte string — the fixture/export half; tests pin
    read_warc(to_warc_bytes(x)) == x for both WARC/1.0 and WARC/1.1
    framing (``version``). Also writes one non-HTML and the warcinfo
    record shape when asked via status/content_type overrides."""
    out = [
        f"WARC/{version}\r\n".encode()
        + b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    ]
    for r in records:
        status = r.get("status", 200)
        ctype = r.get("content_type", "text/html; charset=utf-8")
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n\r\n"
        ) + r["html"]
        payload = http.encode("utf-8")
        head = (
            f"WARC/{version}\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        out.append(head + payload + b"\r\n\r\n")
    return b"".join(out)
