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

Spark-first split strategy: ``spark.read.text`` with the
version-agnostic boundary ``lineSep="\\r\\n\\r\\nWARC/"`` makes the
JVM do the record framing (WARC/1.0 and WARC/1.1 — modern Common
Crawl — both frame correctly) — each DataFrame row is one raw record,
file splits never tear a record mid-payload (the text source only
splits on the delimiter), and the scan parallelizes across files and
within large uncompressed files. Header parsing is then an
Arrow-batched map pass (mapInPandas), zero shuffle; the leftover
``1.x`` version token at the head of each record body has no colon,
so the header scan skips it by construction.

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

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# What a true record boundary leaves at the head of the next row: the
# version token the delimiter did not consume ("1.0\r\n" / "1.1\r\n"),
# or the full "WARC/1.x" for the first record of a file (no preceding
# delimiter). Anything else after a split is a torn payload fragment.
_VERSION_TOKEN = re.compile(r"^\d+\.\d+\r?\n")


def _stitch(pairs, delim: str = "\r\n\r\nWARC/"):
    """Re-assemble records torn by the version-agnostic ``lineSep``:
    a payload that itself contains ``\\r\\n\\r\\nWARC/<not a version
    line>`` (e.g. prose quoting 'WARC/1.0 spec says...') splits into a
    fragment that does NOT start with a version token — glue it back
    onto the previous row with the exact delimiter bytes the splitter
    consumed. Rows from ``spark.read.text`` arrive in file order
    within a partition, so this is a streaming stitch; the only
    unrecoverable shapes are a payload containing a byte-exact record
    boundary (ambiguous under any split framing) and a tear landing
    exactly on a partition boundary (fragment is dropped, record
    truncated at its Content-Length guard). ``pairs`` is an iterable
    of (raw_row_text, file_path); yields stitched (body, path)."""
    cur_body: str | None = None
    cur_path = None
    for raw_body, fpath in pairs:
        is_head = raw_body.startswith("WARC/") or _VERSION_TOKEN.match(raw_body)
        if is_head or cur_path != fpath or cur_body is None:
            if cur_body is not None:
                yield cur_body, cur_path
            cur_body, cur_path = raw_body, fpath
        else:
            cur_body = cur_body + delim + raw_body
    if cur_body is not None:
        yield cur_body, cur_path

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
    """Parse one record body (the text after a ``\\r\\n\\r\\nWARC/``
    delimiter; starts with the leftover ``1.x`` version token, which
    the colon-less header skip ignores). Returns None for
    non-conversion records (warcinfo) and fragments with no headers
    (the pre-delimiter prologue)."""
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
    # The delimiter is the record boundary (blank line + version-token
    # prefix), not the bare "WARC/" token — "WARC/" occurring mid-line
    # inside a payload must not tear the record; it is version-agnostic
    # so WARC/1.1 files (modern Common Crawl) frame identically to 1.0.
    # A payload containing the exact boundary byte sequence is
    # inherently ambiguous under WET framing (only Content-Length-driven
    # sequential parsing resolves it); the split-friendly trade is the
    # right one at corpus scale.
    raw = (
        spark.read.text(path, lineSep="\r\n\r\nWARC/")
        .withColumn("wet_path", F.input_file_name())
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WET_SCHEMA.fields]

        def rows():
            for pdf in batches:
                yield from zip(pdf["value"], pdf["wet_path"])

        # stitching carries state ACROSS Arrow batches (a tear can land
        # on a batch boundary), so iterate the whole partition as one
        # stream and flush parsed rows in bounded chunks
        out: list[dict] = []
        for body, fpath in _stitch(rows()):
            rec = _parse_record(body)
            if rec is not None:
                rec["wet_path"] = fpath
                out.append(rec)
            if len(out) >= 1024:
                yield pd.DataFrame(out, columns=cols)
                out = []
        yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(parse, schema=WET_SCHEMA)


def to_wet_bytes(records: list[dict], version: str = "1.0") -> bytes:
    """Serialize (url, warc_date, record_id, text) dicts to a spec-
    shaped WET byte string (CRLF headers, warcinfo prologue) — the
    fixture/export half of the roundtrip; tests pin
    read_wet(to_wet_bytes(x)) == x for both WARC/1.0 and WARC/1.1
    framing (``version``)."""
    out = [
        f"WARC/{version}\r\n".encode()
        + b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    ]
    for r in records:
        payload = r["text"].encode("utf-8")
        head = (
            f"WARC/{version}\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        out.append(head + payload + b"\r\n\r\n")
    return b"".join(out)
