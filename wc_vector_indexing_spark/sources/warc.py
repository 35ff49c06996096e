"""WARC-format source: read raw Common Crawl capture files (the .warc
files — full HTTP responses, HTML and all) as a DataFrame. Paired with
``operators/html_extract`` this is the raw-crawl front door: WARC →
HTML → main text → every downstream text operator.

BYTE-TRUE since round 8: real crawl responses are arbitrary-charset
bytes, frequently ``Transfer-Encoding: chunked`` — the round-7 path
(``spark.read.text`` + UTF-8) mojibake'd non-UTF-8 pages and left
chunk-size lines embedded in the text. The scan is now ``binaryFile``
(whole-file units — the IIPC / ISO 28500 record grammar's
Content-Length is a byte count, only meaningful on bytes), and ONE
zero-shuffle Arrow pass does: optional gzip (including the per-record
multi-member .warc.gz framing Common Crawl ships), a sequential
Content-Length-driven record walk (spec-exact — no delimiter
heuristics, so payloads quoting ``WARC/`` need no stitching; round 7's
lineSep framing tore them), WARC header parse, HTTP envelope split,
chunked-transfer decode, and charset decode with the incremental
fallback utf-8 (strict) → header-declared charset → ``<meta charset>``
→ latin-1 (total — latin-1 never fails).

Spark shape at 100 TB: a crawl is millions of ~1 GB .warc.gz files,
so task granularity is the file (exactly the sources/pdf.py model) —
per-file parallel, zero shuffle, only parsed text rows leave the scan.
Executor memory must fit one decompressed file (~4 GB for Common
Crawl segments); ``spark.sql.files.maxPartitionBytes`` has no effect
on whole-file rows, so size executors accordingly.

Reference note: the reference engine has no crawl-ingestion path; this
module is north-star training-pipeline surface (public spec only).
"""

from __future__ import annotations

import gzip
import re
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

_CHARSET_RE = re.compile(r"charset=[\"']?([\w.:-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?([\w.:-]+)", re.I
)


def _split_once(body: bytes) -> tuple[bytes, bytes] | None:
    cut = None
    for sep in (b"\r\n\r\n", b"\n\n"):
        i = body.find(sep)
        if i != -1 and (cut is None or i < cut[0]):
            cut = (i, len(sep))
    if cut is None:
        return None
    return body[: cut[0]], body[cut[0] + cut[1]:]


def _dechunk(body: bytes) -> bytes:
    """Decode a Transfer-Encoding: chunked body (RFC 9112 §7.1):
    hex-size line, CRLF, chunk bytes, CRLF, …, 0-size terminator
    (trailers ignored). Malformed framing falls back to the raw body
    (best-effort crawl posture — a wrong-but-present page beats a
    dropped one)."""
    out = bytearray()
    i = 0
    n = len(body)
    while i < n:
        j = body.find(b"\r\n", i)
        if j == -1:
            return body
        size_tok = body[i:j].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body
        i = j + 2
        if size == 0:
            break
        out += body[i : i + size]
        i += size + 2  # past the chunk's trailing CRLF
    return bytes(out)


def _decode_html(body: bytes, ctype: str | None) -> str:
    """Charset cascade: strict utf-8 (the dominant real-web case, and
    a validating decode — mislabeled-but-actually-UTF-8 pages land
    here) → Content-Type charset parameter → <meta charset> probe in
    the first 2 KiB → latin-1 (bijective, never fails)."""
    tries = ["utf-8"]
    m = _CHARSET_RE.search(ctype or "")
    if m:
        tries.append(m.group(1))
    mm = _META_CHARSET_RE.search(body[:2048])
    if mm:
        tries.append(mm.group(1).decode("latin-1"))
    for enc in tries:
        try:
            return body.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return body.decode("latin-1")


_CL_RE = re.compile(rb"(?im)^content-length\s*:\s*(\d+)\s*$")


def _iter_records(data: bytes) -> Iterator[tuple[bytes, bytes, int, int]]:
    """Sequential record walk over whole-file bytes: ``WARC/x.y`` +
    headers + CRLFCRLF + exactly Content-Length payload bytes +
    CRLFCRLF. Yields (header bytes, payload bytes, start offset, end
    offset) — offsets are byte positions into ``data``: ``start`` is
    the first byte of the ``WARC/`` version line, ``end`` is one past
    the record's trailing CRLFCRLF, so ``data[start:end]`` slices the
    whole record back out (the CDX index relies on this). Spec-exact — a
    payload containing the bytes ``\\r\\n\\r\\nWARC/`` cannot tear a
    record (the count, not a delimiter, ends it). Records missing
    Content-Length (damaged files) fall back to the next-record
    delimiter search; unparseable stretches resync at the next
    plausible record start instead of failing the file."""
    i = 0
    n = len(data)
    while i < n:
        while i < n and data[i] in b"\r\n":
            i += 1
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            j = data.find(b"\r\n\r\nWARC/", i)
            if j == -1:
                break
            i = j + 4
            continue
        he = data.find(b"\r\n\r\n", i)
        if he == -1:
            break
        head = data[i : he]
        start = i
        m = _CL_RE.search(head)
        if m:
            cl = int(m.group(1))
            # clamp: a file truncated right after the payload has no
            # trailing CRLFCRLF — the end offset must not point past
            # EOF or a CDX range read of (offset, length) over-reads
            yield head, data[he + 4 : he + 4 + cl], start, min(
                he + 4 + cl + 4, n)
            i = he + 4 + cl
        else:
            j = data.find(b"\r\n\r\nWARC/", he)
            end = j if j != -1 else n
            yield head, data[he + 4 : end].rstrip(b"\r\n"), start, (
                j + 4 if j != -1 else n)
            i = end + 4 if j != -1 else n


def _parse_record(head: bytes, payload: bytes) -> dict | None:
    """One record's (header bytes, exact payload bytes) → parsed
    response row, or None for non-response / non-HTML records. The
    header block starts with the ``WARC/1.x`` version line, which the
    colon-less header skip ignores."""
    rec: dict = {"_type": None, "url": None, "warc_date": None,
                 "record_id": None}
    seen = False
    for line in head.replace(b"\r\n", b"\n").split(b"\n"):
        k, colon, v = line.partition(b":")
        if not colon:
            continue
        key = _HEADER_KEYS.get(k.strip().lower().decode("latin-1"))
        if key:
            rec[key] = v.strip().decode("latin-1")
            seen = True
    if not seen or rec["_type"] != "response":
        return None
    # the payload is an HTTP/1.1 response: status line + headers + body
    http = _split_once(payload)
    if http is None:
        return None
    http_head, body = http
    lines = http_head.replace(b"\r\n", b"\n").split(b"\n")
    status = None
    ctype = None
    chunked = False
    if lines and lines[0].startswith(b"HTTP/"):
        parts = lines[0].split(b" ", 2)
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for line in lines[1:]:
        k, colon, v = line.partition(b":")
        if not colon:
            continue
        key = k.strip().lower()
        if key == b"content-type":
            ctype = v.strip().decode("latin-1")
        elif key == b"transfer-encoding" and b"chunked" in v.lower():
            chunked = True
    if status != 200 or not (ctype or "").lower().startswith("text/html"):
        return None
    if chunked:
        body = _dechunk(body)
    return {
        "url": rec["url"],
        "warc_date": rec["warc_date"],
        "record_id": rec["record_id"],
        "http_status": status,
        "content_type": ctype,
        "html": _decode_html(body, ctype),
    }


def _parse_pass(raw: DataFrame, on_error: str = "raise") -> DataFrame:
    """The shared Arrow parse stage over whole-file byte rows
    (columns: warc_path, content) — used verbatim by the batch reader
    and the streaming twin, so both paths can never diverge. Handles
    gzip transparently (single-stream and Common Crawl's
    member-per-record .warc.gz; ``gzip.decompress`` walks all
    members).

    ``on_error`` is per-FILE isolation (crawl archives rot; at 100 TB
    one corrupt ``.warc.gz`` must not fail the job): 'raise' (default)
    surfaces the first bad file as contract ValueError; 'skip' drops
    the WHOLE file's records (all-or-nothing — emitting the records
    parsed before the corruption point would silently present a
    partial archive as complete)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        cols = [f.name for f in WARC_SCHEMA.fields]
        out: list[dict] = []
        for pdf in batches:
            for fpath, content in zip(pdf["warc_path"], pdf["content"]):
                file_rows: list[dict] = []
                try:
                    data = bytes(content)
                    if data[:2] == b"\x1f\x8b":
                        data = gzip.decompress(data)
                    for head, payload, _start, _end in _iter_records(data):
                        rec = _parse_record(head, payload)
                        if rec is not None:
                            rec["warc_path"] = fpath
                            file_rows.append(rec)
                except (ValueError, NotImplementedError, OSError,
                        EOFError, zlib.error) as e:
                    # OSError = gzip.BadGzipFile; EOFError/zlib.error =
                    # truncated/corrupt deflate from gzip.decompress
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt WARC file {fpath}: {e!r}") from e
                    continue
                out.extend(file_rows)
                if len(out) >= 1024:
                    yield pd.DataFrame(out, columns=cols)
                    out = []
        yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(parse, schema=WARC_SCHEMA)


def parse_warc(raw: DataFrame, on_error: str = "raise") -> DataFrame:
    """Parse already-loaded whole-file WARC byte rows (columns:
    warc_path, content binary) into the same (url, warc_date,
    record_id, http_status, content_type, html, warc_path) rows
    :func:`read_warc` produces — the entry point for compositions
    whose raw bytes come from somewhere other than a binaryFile scan
    (an in-memory render, a fetcher stage, an object-store lister).
    Same Arrow pass as the file reader, so the two can never
    disagree on what a record is. ``on_error='skip'`` drops corrupt
    files whole instead of failing the stage (see _parse_pass)."""
    return _parse_pass(raw, on_error=on_error)


def read_warc(spark: SparkSession, path: str,
              on_error: str = "raise") -> DataFrame:
    """Read WARC file(s) into (url, warc_date, record_id, http_status,
    content_type, html, warc_path) — 200-status text/html response
    records only. Whole-file binary scan, one Arrow parse pass, zero
    shuffle; compose with ``html_extract.extract_documents`` for the
    crawl → text pipeline."""
    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select(F.col("path").alias("warc_path"), "content")
    )
    return parse_warc(raw, on_error=on_error)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_warc`: a file-source
    ``readStream`` over the same binaryFile format with the same Arrow
    parse stage. New ``.warc``/``.warc.gz`` files dropped into
    ``path`` become micro-batches; the file-source checkpoint (plus a
    downstream file-sink commit log) gives exactly-once over crawl
    archives. The parse code is shared with the batch reader, so a
    streaming crawl and a batch backfill can never disagree on what a
    record is.

    At 100 TB this is the continuous-ingest front door: Common Crawl
    drops land in object storage, ``maxFilesPerTrigger`` bounds each
    micro-batch, and everything downstream of the parse is the same
    zero-shuffle Arrow pass the batch path runs."""
    from wc_vector_indexing_spark.sources.readers import binaryfile_stream

    raw = binaryfile_stream(spark, path).select(
        F.col("path").alias("warc_path"), "content")
    return _parse_pass(raw)


def _gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Walk a multi-member gzip stream (Common Crawl's member-per-record
    ``.warc.gz`` layout) yielding (compressed_offset, compressed_length,
    decompressed_bytes) per member — zlib's ``unused_data`` marks each
    member boundary, so the walk is exact without re-parsing deflate."""
    import zlib

    pos = 0
    rest = data
    while rest[:2] == b"\x1f\x8b":
        obj = zlib.decompressobj(31)
        try:
            out = obj.decompress(rest)
        except zlib.error as e:  # bit-rotted member: contract class,
            # so Spark-side callers can quarantine the FILE instead of
            # failing the stage
            raise ValueError(f"gzip: corrupt member at {pos}: {e}") from e
        if not obj.eof:
            raise ValueError("gzip: truncated member")
        consumed = len(rest) - len(obj.unused_data)
        yield pos, consumed, out
        pos += consumed
        rest = obj.unused_data


def surt_key(url: str) -> str:
    """SURT-canonicalized CDX url key (the public Internet Archive /
    pywb convention): scheme and a leading ``www.`` dropped, host
    lowercased with its dot-labels REVERSED and comma-joined, then
    ``)/`` + path, with query parameters sorted so equivalent URLs
    collide — e.g. ``https://W1.Example/p?b=2&a=1`` →
    ``example,w1)/p?a=1&b=2``."""
    rest = url.split("://", 1)[-1]
    hostport, slash, pathq = rest.partition("/")
    host = hostport.split("@")[-1].split(":")[0].lower()
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split(".")))
    path, q, query = pathq.partition("?")
    out = f"{key})/{path.lower()}"
    if q:
        out += "?" + "&".join(sorted(query.lower().split("&")))
    return out


def warc_cdx_index(raw: DataFrame, on_error: str = "raise") -> DataFrame:
    """CDX index generation — the random-access side door every real
    web archive ships next to its WARCs (the public CDX(J) convention:
    one row per response record with its SURT url key, 14-digit
    timestamp, mime, status, payload digest, and the byte
    offset/length needed to fetch the record without scanning the
    file). Input is (warc_path, content) whole-file rows; output is
    (warc_path, urlkey, ts14, url, mime, status, digest_sha1_b32,
    offset, length), one zero-shuffle Arrow pass.

    ``offset_kind`` says what the offsets index: ``plain`` = byte
    positions in the uncompressed record stream (``.warc``, and
    multi-record gzip members via cumulative decompressed position);
    ``gzip-member`` = COMPRESSED byte ranges for member-per-record
    ``.warc.gz`` (Common Crawl's layout) — the range pywb-style
    replayers hand to a gzip decoder directly. For RESPONSE records
    the digest is sha1-base32 of the decoded (de-chunked) HTTP body,
    matching the WARC-Payload-Digest convention. REVISIT records (the
    archive-side dedup convention real Common Crawl WARCs carry) are
    indexed too — a replayer needs their row to resolve the duplicate:
    ``record_type='revisit'``, mime is the CDX convention
    ``warc/revisit``, the digest comes from the record's OWN
    WARC-Payload-Digest header (the ORIGINAL payload's digest — the
    revisit has no body of its own), and ``refers_to`` carries the
    WARC-Refers-To record-id pointer (null on responses).

    ``on_error`` = per-FILE isolation, same contract as the parse
    pass: 'raise' (default) fails on the first corrupt archive with a
    contract ValueError naming the file; 'skip' drops the whole file's
    rows (never a partial index for a rotted archive)."""
    import base64
    import hashlib

    schema = (
        "warc_path string, urlkey string, ts14 string, url string, "
        "mime string, status int, digest_sha1_b32 string, offset long, "
        "length long, offset_kind string, record_type string, "
        "refers_to string"
    )

    def row_of(head: bytes, payload: bytes) -> dict | None:
        fields: dict[str, str] = {}
        for line in head.replace(b"\r\n", b"\n").split(b"\n"):
            k, colon, v = line.partition(b":")
            if colon:
                fields[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1"))
        wtype = fields.get("warc-type")
        if wtype not in ("response", "revisit"):
            return None
        url = fields.get("warc-target-uri", "")
        ts14 = "".join(
            c for c in fields.get("warc-date", "") if c.isdigit())[:14]
        http = _split_once(payload)
        status, mime, body = None, None, b""
        if http is not None:
            hh, body = http
            lines = hh.replace(b"\r\n", b"\n").split(b"\n")
            if lines and lines[0].startswith(b"HTTP/"):
                parts = lines[0].split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
            for line in lines[1:]:
                k, colon, v = line.partition(b":")
                if not colon:
                    continue
                lk = k.strip().lower()
                if lk == b"content-type":
                    mime = v.strip().decode("latin-1").split(";")[0].strip()
                elif lk == b"transfer-encoding" and b"chunked" in v.lower():
                    body = _dechunk(body)
        if wtype == "revisit":
            own = fields.get("warc-payload-digest", "")
            digest = own.split(":", 1)[-1] if own else ""
            return {"urlkey": surt_key(url), "ts14": ts14, "url": url,
                    "mime": "warc/revisit", "status": status,
                    "digest_sha1_b32": digest, "record_type": "revisit",
                    "refers_to": fields.get("warc-refers-to")}
        digest = base64.b32encode(hashlib.sha1(body).digest()).decode("ascii")
        return {"urlkey": surt_key(url), "ts14": ts14, "url": url,
                "mime": mime, "status": status,
                "digest_sha1_b32": digest, "record_type": "response",
                "refers_to": None}

    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["warc_path", "urlkey", "ts14", "url", "mime", "status",
                "digest_sha1_b32", "offset", "length", "offset_kind",
                "record_type", "refers_to"]
        for pdf in batches:
            out: list[dict] = []
            for fpath, content in zip(pdf["warc_path"], pdf["content"]):
                # per-FILE isolation, all-or-nothing (a partially
                # indexed archive would alias as a complete one)
                file_rows: list[dict] = []
                try:
                    data = bytes(content)
                    if data[:2] == b"\x1f\x8b":
                        decomp_base = 0
                        for moff, mlen, mbytes in _gzip_members(data):
                            recs = list(_iter_records(mbytes))
                            for head, payload, start, end in recs:
                                row = row_of(head, payload)
                                if row is None:
                                    continue
                                if len(recs) == 1:
                                    row.update(offset=moff, length=mlen,
                                               offset_kind="gzip-member")
                                else:
                                    row.update(offset=decomp_base + start,
                                               length=end - start,
                                               offset_kind="plain")
                                file_rows.append(
                                    {"warc_path": fpath, **row})
                            decomp_base += len(mbytes)
                    else:
                        for head, payload, start, end in _iter_records(data):
                            row = row_of(head, payload)
                            if row is not None:
                                row.update(offset=start,
                                           length=end - start,
                                           offset_kind="plain")
                                file_rows.append(
                                    {"warc_path": fpath, **row})
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt WARC file {fpath}: {e!r}") from e
                    continue
                out.extend(file_rows)
            yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(index, schema=schema)


def resolve_revisits(cdx: DataFrame,
                     max_digest_candidates: int = 1000) -> DataFrame:
    """Replayer-side revisit resolution over a CDX index: every
    ``record_type='revisit'`` row joins the response capture whose
    bytes it stands for — the latest response sharing its payload
    digest captured at or before the revisit's timestamp (the as-of
    rule pywb-style replayers apply; WARC-Refers-To record ids are a
    pointer into the ORIGIN file's records, but a CDX lookup resolves
    by digest+time, which also works across files).

    Spark shape: equi-join on the 32-char digest (group sizes are
    duplicate-cluster sizes, never all-pairs) + one as-of window per
    revisit row. ``max_digest_candidates`` bounds boilerplate digests
    (an empty page captured millions of times): only the NEWEST N
    responses per digest enter the join — as-of correctness holds
    unless a revisit predates all N kept captures of a hotter-than-N
    digest (documented edge). Returns every revisit row with
    ``resolved`` plus the original's (warc_path, offset, length,
    ts14); unresolvable revisits (no response at or before their
    time) keep nulls."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # three plan branches consume the index (revisit side, response
    # side, unresolvable re-attach); pin one exchange so ReuseExchange
    # dedupes the upstream index build instead of re-running it
    cdx = cdx.repartition("digest_sha1_b32")
    rev = cdx.filter(F.col("record_type") == "revisit").select(
        F.col("warc_path").alias("revisit_warc_path"),
        F.col("urlkey"),
        F.col("ts14").alias("revisit_ts14"),
        F.col("url"),
        F.col("digest_sha1_b32").alias("digest"),
        F.col("offset").alias("revisit_offset"),
        F.col("refers_to"),
    )
    newest_per_digest = Window.partitionBy("digest_sha1_b32").orderBy(
        F.desc("ts14"), F.desc("offset"))
    resp = (
        cdx.filter(F.col("record_type") == "response")
        .withColumn("_rn", F.row_number().over(newest_per_digest))
        .filter(F.col("_rn") <= max_digest_candidates)
        .select(
            F.col("digest_sha1_b32").alias("digest"),
            F.col("warc_path").alias("orig_warc_path"),
            F.col("ts14").alias("orig_ts14"),
            F.col("offset").alias("orig_offset"),
            F.col("length").alias("orig_length"),
        )
    )
    # ONE as-of window does both jobs: qualifying rows (captured at or
    # before the revisit) rank first by recency; if the rank-1 row
    # doesn't qualify, the revisit is unresolvable and its orig columns
    # null out — no anti-join/union branch for the negative case
    qual = F.col("orig_ts14").isNotNull() & (
        F.col("orig_ts14") <= F.col("revisit_ts14"))
    # "digest" leads the partition spec: a (warc_path, offset) revisit
    # row carries exactly one digest, so the groups are identical — but
    # hash(digest) from the join output already satisfies the clustering
    # requirement (HashPartitioning on a SUBSET of the window keys), so
    # the as-of pick runs as a sort within the digest partitions instead
    # of re-shuffling the joined rows on revisit identity (one fewer
    # Exchange, §2.4)
    asof = Window.partitionBy(
        "digest", "revisit_warc_path", "revisit_offset").orderBy(
        F.desc(qual), F.desc("orig_ts14"), F.desc("orig_offset"))
    picked = (
        rev.join(resp, "digest", "left")
        .withColumn("_q", qual)
        .withColumn("_rn", F.row_number().over(asof))
        .filter(F.col("_rn") == 1)
    )
    out = picked.withColumn("resolved", F.col("_q"))
    for c in ("orig_warc_path", "orig_ts14"):
        out = out.withColumn(c, F.when(F.col("_q"), F.col(c)))
    for c in ("orig_offset", "orig_length"):
        out = out.withColumn(c, F.when(F.col("_q"), F.col(c)))
    return out.select(
        "revisit_warc_path", "urlkey", "url", "revisit_ts14",
        "digest", "refers_to", "resolved", "orig_warc_path",
        "orig_ts14", "orig_offset", "orig_length")


def plan_archive_dedup(batch: DataFrame,
                       prior: DataFrame | None = None) -> DataFrame:
    """The WRITER half of archive-side dedup — decide, for every page
    in a crawl batch, whether it should be stored as a RESPONSE record
    or as a REVISIT pointer (the convention ``warc_cdx_index`` indexes
    and ``resolve_revisits`` resolves). ``batch`` is (url, ts14,
    digest, length) rows; ``prior`` is the earliest-known capture per
    digest from previous crawls — e.g. ``warc_cdx_index(...)`` rows
    aggregated to (digest, url, ts14) — or None for a cold start.

    Rules, matching what archive writers do: a digest already present
    in ``prior`` makes EVERY batch row carrying it a revisit of the
    prior capture (the prior record is by definition older); otherwise
    the batch's own first capture (earliest ts14, url as tiebreak)
    becomes the response and the rest revisit it. ``bytes_saved`` is
    the payload length a revisit avoids storing.

    Pure Catalyst: one per-digest window over the batch plus one
    left join against the (already digest-unique) prior side — group
    sizes are duplicate-cluster sizes, never all-pairs, and nothing
    leaves the JVM."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("digest").orderBy("ts14", "url")
    ranked = (
        batch.withColumn("_rn", F.row_number().over(w))
        .withColumn("_first_url", F.first("url").over(w))
        .withColumn("_first_ts", F.first("ts14").over(w))
    )
    if prior is not None:
        p = prior.select(
            "digest",
            F.col("url").alias("_prior_url"),
            F.col("ts14").alias("_prior_ts"),
        )
        ranked = ranked.join(p, "digest", "left")
    else:
        ranked = ranked.withColumn(
            "_prior_url", F.lit(None).cast("string")
        ).withColumn("_prior_ts", F.lit(None).cast("string"))
    is_revisit = F.col("_prior_url").isNotNull() | (F.col("_rn") > 1)
    return ranked.select(
        "url", "ts14", "digest", "length",
        F.when(is_revisit, F.lit("revisit"))
        .otherwise(F.lit("response")).alias("record_type"),
        F.when(F.col("_prior_url").isNotNull(), F.lit("prior"))
        .when(F.col("_rn") > 1, F.lit("batch")).alias("refers_source"),
        F.when(F.col("_prior_url").isNotNull(), F.col("_prior_url"))
        .when(F.col("_rn") > 1, F.col("_first_url")).alias("refers_url"),
        F.when(F.col("_prior_url").isNotNull(), F.col("_prior_ts"))
        .when(F.col("_rn") > 1, F.col("_first_ts")).alias("refers_ts14"),
        F.when(is_revisit, F.col("length"))
        .otherwise(F.lit(0)).alias("bytes_saved"),
    )


def cdx_snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Crawl-over-crawl churn from two CDX snapshots (the
    Common-Crawl-style monthly-diff question): reduce each side to its
    LATEST capture per urlkey (max (ts14, offset) — revisit rows count
    as captures of their digest), full-outer join on urlkey, and
    classify: ``new`` (this crawl only), ``gone`` (previous crawl
    only), ``changed`` (both, digest moved), ``unchanged``. Two
    aggregations + one join, all JVM-side; urlkey group sizes are
    capture counts, never all-pairs."""
    from pyspark.sql import functions as F

    def latest(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy("urlkey").agg(
            F.max_by(
                "digest_sha1_b32", F.struct("ts14", "offset")
            ).alias(f"{side}_digest"),
            F.max("ts14").alias(f"{side}_ts"),
        )

    j = latest(old, "old").join(latest(new, "new"), "urlkey", "full_outer")
    return j.select(
        "urlkey",
        F.when(F.col("old_digest").isNull(), F.lit("new"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") == F.col("new_digest"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed")).alias("status"),
        "old_digest", "new_digest", "old_ts", "new_ts",
    )


def to_warc_bytes(records: list[dict], version: str = "1.0") -> bytes:
    """Serialize (url, html, [status], [content_type], [charset],
    [chunked]) dicts to a spec-shaped WARC byte string — the
    fixture/export half; tests pin read_warc(to_warc_bytes(x)) == x
    for both WARC/1.0 and WARC/1.1 framing (``version``), non-UTF-8
    charsets (``charset`` encodes the body and should match the
    declared content_type), and chunked transfer (``chunked`` splits
    the body into hex-framed chunks with a Transfer-Encoding
    header)."""
    return b"".join(_warc_record_chunks(records, version))


def _warc_record_chunks(records: list[dict], version: str) -> list[bytes]:
    """One bytes chunk per record (warcinfo prologue first) — shared by
    the plain writer and the member-per-record gzip writer."""
    out = [
        f"WARC/{version}\r\n".encode()
        + b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    ]
    for r in records:
        status = r.get("status", 200)
        ctype = r.get("content_type", "text/html; charset=utf-8")
        if r.get("revisit"):
            # archive-side dedup convention: the record carries only the
            # HTTP headers plus a WARC-Refers-To pointer and the
            # original payload's digest (identical-payload-digest
            # profile) — replayers resolve the body via the pointer
            payload = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n\r\n"
            ).encode("latin-1")
            head = (
                f"WARC/{version}\r\n"
                "WARC-Type: revisit\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
                f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n"
                f"WARC-Refers-To: {r['refers_to']}\r\n"
                f"WARC-Payload-Digest: sha1:{r['payload_digest']}\r\n"
                "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
                "identical-payload-digest\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("utf-8")
            out.append(head + payload + b"\r\n\r\n")
            continue
        body = r["html"].encode(r.get("charset", "utf-8"))
        extra = ""
        if r.get("chunked"):
            chunks = [body[i : i + 57] for i in range(0, len(body), 57)]
            body = (
                b"".join(b"%X\r\n%s\r\n" % (len(c), c) for c in chunks)
                + b"0\r\n\r\n"
            )
            extra = "Transfer-Encoding: chunked\r\n"
        payload = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n{extra}\r\n"
        ).encode("latin-1") + body
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
    return out


def to_warc_gz_bytes(records: list[dict], version: str = "1.0",
                     member_per_record: bool = True) -> bytes:
    """``.warc.gz`` writer: ``member_per_record=True`` gzips every
    record as its OWN member (Common Crawl's layout — the one that
    makes per-record range reads possible; ``warc_cdx_index`` reports
    compressed offsets for it), else one whole-file member."""
    chunks = _warc_record_chunks(records, version)
    if not member_per_record:
        return gzip.compress(b"".join(chunks), mtime=0)
    return b"".join(gzip.compress(c, mtime=0) for c in chunks)


def fetch_warc_records(captures: DataFrame,
                       on_error: str = "raise") -> DataFrame:
    """Random-access record fetch from CDX locators — the replay leg
    of the index loop (pywb's record fetch; the reference's
    by-offset vector lookup, includes/class-vector-store.php
    get-by-id, re-expressed against archive byte ranges): input rows
    carry (warc_path, offset, length, offset_kind) from
    ``warc_cdx_index`` / ``zipnum_lookup``, and each locator fetches
    EXACTLY its byte range —

      gzip-member — seek+read ``length`` bytes, gunzip the single
        member (Common Crawl's member-per-record layout; the range
        must be one exact member or it's a contract error)
      plain       — byte positions in the uncompressed record stream:
        a direct seek+read on an uncompressed ``.warc``; on a
        multi-record-member ``.warc.gz`` the members decompress
        in order ONLY up to ``offset+length`` (documented
        sequential-prefix cost — that layout does not support true
        random access, which is why Common Crawl ships member-per-
        record)

    Output: (warc_path, offset, url, warc_date, http_status,
    content_type, html) for 200 text/html responses. A locator that
    does not decode to one such record is a contract error under
    ``on_error='raise'``; ``'skip'`` drops that LOCATOR only (the
    point of random access is that one rotted member cannot poison
    its neighbors). Rows group per file inside the Arrow pass — one
    open handle, offsets fetched in sorted order; no shuffle beyond
    the caller's partitioning, bytes read O(requested records)."""
    import zlib

    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["warc_path", "offset", "url", "warc_date", "http_status",
                "content_type", "html"]
        for pdf in batches:
            rows: list[tuple] = []
            by_path: dict[str, list[tuple[int, int, str]]] = {}
            for p, off, ln, kind in zip(
                    pdf["warc_path"], pdf["offset"], pdf["length"],
                    pdf["offset_kind"]):
                by_path.setdefault(str(p), []).append(
                    (int(off), int(ln), str(kind)))
            for path, locs in by_path.items():
                local = path[5:] if path.startswith("file:") else path
                with open(local, "rb") as f:
                    head2 = f.read(2)
                    is_gz = head2 == b"\x1f\x8b"
                    plain_cache: bytes | None = None
                    for off, ln, kind in sorted(locs):
                        try:
                            if kind == "gzip-member":
                                f.seek(off)
                                member = f.read(ln)
                                obj = zlib.decompressobj(31)
                                try:
                                    rec_bytes = obj.decompress(member)
                                except zlib.error as e:
                                    raise ValueError(
                                        f"locator {path}:{off}+{ln}: "
                                        f"corrupt gzip member: {e}"
                                    ) from e
                                if not obj.eof or obj.unused_data:
                                    raise ValueError(
                                        f"locator {path}:{off}+{ln} is "
                                        "not one exact gzip member")
                            elif kind == "plain":
                                if is_gz:
                                    # sequential-prefix decompress,
                                    # cached across this file's locators
                                    if (plain_cache is None
                                            or len(plain_cache) < off + ln):
                                        f.seek(0)
                                        plain_cache = b"".join(
                                            m for _, _, m in
                                            _gzip_members(f.read()))
                                    rec_bytes = plain_cache[off:off + ln]
                                else:
                                    f.seek(off)
                                    rec_bytes = f.read(ln)
                                if len(rec_bytes) != ln:
                                    raise ValueError(
                                        f"locator {path}:{off}+{ln} "
                                        "overruns the file")
                            else:
                                raise ValueError(
                                    f"unknown offset_kind {kind!r}")
                            recs = list(_iter_records(rec_bytes))
                            if len(recs) != 1:
                                raise ValueError(
                                    f"locator {path}:{off}+{ln} holds "
                                    f"{len(recs)} records, not 1")
                            head, payload, _, _ = recs[0]
                            parsed = _parse_record(head, payload)
                            if parsed is None:
                                raise ValueError(
                                    f"locator {path}:{off}+{ln} is not "
                                    "a 200 text/html response record")
                        except ValueError:
                            if on_error == "raise":
                                raise
                            continue
                        rows.append((path, off, parsed["url"],
                                     parsed["warc_date"],
                                     parsed["http_status"],
                                     parsed["content_type"],
                                     parsed["html"]))
            yield pd.DataFrame(rows, columns=cols)

    return captures.select(
        "warc_path", "offset", "length", "offset_kind"
    ).mapInPandas(
        fetch,
        schema="warc_path string, offset long, url string, "
               "warc_date string, http_status int, content_type string, "
               "html string")
