"""WET-format source: read Common Crawl text extracts (the .wet files)
as a DataFrame — the ingestion front door for a web-scale training
corpus.

WET is a public, trivially simple framing (IIPC WARC 1.1 spec, ISO
28500): a file is a sequence of records, each

    WARC/1.0
    WARC-Type: conversion
    WARC-Target-URI: http://example.com/page
    WARC-Date: 2024-01-12T03:44:55Z
    WARC-Record-ID: <urn:uuid:...>
    Content-Type: text/plain
    Content-Length: 1234
    <blank line>
    ...plain-text payload...
    <blank line><blank line>

plus one leading ``WARC-Type: warcinfo`` header record per file.

Spark-first split strategy: ``spark.read.text`` with
``lineSep="WARC/1.0"`` makes the JVM do the record framing — each
DataFrame row is one raw record, file splits never tear a record
mid-payload (the text source only splits on the delimiter), and the
scan parallelizes across files and within large uncompressed files.
Header parsing is then an Arrow-batched map pass (mapInPandas), zero
shuffle.

Compression note (matters at 100 TB): Common Crawl ships
``.warc.wet.gz`` as *concatenated gzip members*. Hadoop's gzip codec
reads the concatenation as one stream but cannot split it — so one
.gz file = one task, which matches Common Crawl's ~1 GB-per-file
sharding model (90k files/crawl ⇒ 90k tasks, plenty of parallelism).
Recompress to zstd/bzip2 or decompress once if individual files are
huge.

Reference note: the reference engine has no crawl-ingestion path (its
source is the WooCommerce catalog, SURVEY §1.1); this module is
north-star training-pipeline surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WET_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("wet_path", T.StringType()),
    ]
)

_HEADER_KEYS = {
    "warc-target-uri": "url",
    "warc-date": "warc_date",
    "warc-record-id": "record_id",
    "content-length": "content_length",
    "warc-type": "_type",
}


def _parse_record(raw: str) -> dict | None:
    """Parse one record body (the text after a ``WARC/1.0`` delimiter).
    Returns None for non-conversion records (warcinfo) and fragments
    with no headers (the pre-delimiter prologue)."""
    body = raw.lstrip("\r\n")
    # header/payload boundary: first blank line (CRLF per spec; accept LF)
    cut = None
    for sep in ("\r\n\r\n", "\n\n"):
        i = body.find(sep)
        if i != -1 and (cut is None or i < cut[0]):
            cut = (i, len(sep))
    if cut is None:
        return None
    head, payload = body[: cut[0]], body[cut[0] + cut[1]:]
    rec: dict = {"_type": None, "url": None, "warc_date": None,
                 "record_id": None, "content_length": None}
    seen_any = False
    for line in head.replace("\r\n", "\n").split("\n"):
        k, colon, v = line.partition(":")
        if not colon:
            continue
        key = _HEADER_KEYS.get(k.strip().lower())
        if key:
            rec[key] = v.strip()
            seen_any = True
    if not seen_any or rec["_type"] != "conversion":
        return None
    # Content-Length is authoritative: the payload may carry trailing
    # inter-record blank lines that belong to the framing, not the text
    try:
        n = int(rec["content_length"])
    except (TypeError, ValueError):
        n = None
    if n is None:
        text = payload.rstrip("\r\n")
    else:
        # Content-Length counts BYTES of the payload as written
        text = payload.encode("utf-8")[:n].decode("utf-8", errors="ignore")
    return {
        "url": rec["url"],
        "warc_date": rec["warc_date"],
        "record_id": rec["record_id"],
        "content_length": n if n is not None else len(text),
        "text": text,
    }


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET file(s) (glob/dir ok) into (url, warc_date, record_id,
    content_length, text, wet_path). Record framing happens JVM-side
    via ``lineSep``; header parsing is one Arrow map pass. Zero
    shuffle — the output feeds ``urls.url_features`` /
    ``url_dedup`` / the curation gates directly."""
    # The delimiter is the full record boundary (blank line + version
    # line), not the bare version token — "WARC/1.0" occurring inside a
    # payload must not tear the record. A payload containing the exact
    # boundary byte sequence is inherently ambiguous under WET framing
    # (only Content-Length-driven sequential parsing resolves it); the
    # split-friendly trade is the right one at corpus scale.
    raw = (
        spark.read.text(path, lineSep="\r\n\r\nWARC/1.0\r\n")
        .withColumn("wet_path", F.input_file_name())
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raw_body, fpath in zip(pdf["value"], pdf["wet_path"]):
                rec = _parse_record(raw_body)
                if rec is not None:
                    rec["wet_path"] = fpath
                    out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in WET_SCHEMA.fields]
            )

    return raw.mapInPandas(parse, schema=WET_SCHEMA)


def to_wet_bytes(records: list[dict]) -> bytes:
    """Serialize (url, warc_date, record_id, text) dicts to a spec-
    shaped WET byte string (CRLF headers, warcinfo prologue) — the
    fixture/export half of the roundtrip; tests pin
    read_wet(to_wet_bytes(x)) == x."""
    out = [
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    ]
    for r in records:
        payload = r["text"].encode("utf-8")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        out.append(head + payload + b"\r\n\r\n")
    return b"".join(out)
