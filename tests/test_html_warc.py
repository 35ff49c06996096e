"""WARC source + HTML main-text extraction (the crawl front door):
record framing and HTTP envelope parsing roundtrip through
to_warc_bytes/read_warc; the jusText-style block classifier keeps
article prose and drops link-dense chrome; the composed WARC → HTML →
text pipeline recovers planted article text end to end."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.html_extract import (
    classify,
    extract_main_text,
    html_blocks,
)

ARTICLE = (
    "<html><head><title>T</title><script>var x = 'junk &amp; noise';"
    "</script><style>.a{color:red}</style></head><body>"
    "<nav><a href='/'>Home</a> <a href='/a'>About</a> "
    "<a href='/c'>Contact</a> <a href='/s'>Shop</a></nav>"
    "<h2>Section title</h2>"
    "<p>This is the first real paragraph of the article, long enough to "
    "count as body prose by any reasonable threshold.</p>"
    "<p>Short one.</p>"
    "<p>The second long paragraph continues the article with more "
    "detail, still containing no links at all.</p>"
    "<aside><a href='/x'>Related post</a> <a href='/y'>Another one</a>"
    "</aside>"
    "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a></footer>"
    "</body></html>"
)


def test_blocks_drop_script_style_and_split_on_block_tags():
    blocks = html_blocks(ARTICLE)
    texts = [b.text for b in blocks]
    assert not any("junk" in t or "color:red" in t for t in texts)
    assert any(t.startswith("This is the first real paragraph") for t in texts)
    nav = next(b for b in blocks if b.text.startswith("Home"))
    assert nav.link_chars == len("Home") + len("About") + len("Contact") + len("Shop")


def test_classifier_keeps_prose_drops_chrome():
    blocks = html_blocks(ARTICLE)
    labels = classify(blocks)
    by_text = dict(zip([b.text for b in blocks], labels))
    assert by_text[next(t for t in by_text if t.startswith("This is the first"))] == "good"
    assert by_text[next(t for t in by_text if t.startswith("Home"))] == "bad"
    assert by_text[next(t for t in by_text if t.startswith("Related post"))] == "bad"
    # the short paragraph sits between two good ones -> smoothing keeps it
    assert by_text["Short one."] == "good"
    # the heading right before a good block survives
    assert by_text["Section title"] == "good"


def test_extract_main_text_joins_good_blocks():
    text = extract_main_text(ARTICLE)
    assert text.startswith("Section title")
    assert "first real paragraph" in text and "second long paragraph" in text
    assert "Short one." in text
    assert "Home" not in text and "Privacy" not in text


def test_entities_unescaped():
    html = "<p>Fish &amp; chips cost &lt;5 euros, which is nice enough.</p>"
    assert extract_main_text(html) == "Fish & chips cost <5 euros, which is nice enough."


def test_orphan_heading_in_chrome_dropped():
    html = (
        "<h3>Menu</h3><nav><a href='/'>Home</a> <a href='/b'>Blog</a></nav>"
        "<p>The only actual prose paragraph here, long enough to be kept "
        "as real article body text.</p>"
    )
    text = extract_main_text(html)
    assert "Menu" not in text and "Home" not in text
    assert text.startswith("The only actual prose")


def test_warc_roundtrip_and_filtering(spark, tmp_path):
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    records = [
        {"url": "https://a.example/1", "html": "<p>page one body text</p>"},
        {"url": "https://a.example/2", "html": "<p>page two body text</p>"},
        # non-HTML and non-200 records must be filtered out
        {"url": "https://a.example/3", "html": "PDFDATA",
         "content_type": "application/pdf"},
        {"url": "https://a.example/4", "html": "<p>gone</p>", "status": 404},
    ]
    p = tmp_path / "crawl.warc"
    p.write_bytes(to_warc_bytes(records))
    got = read_warc(spark, str(p)).orderBy("url").collect()
    assert [r.url for r in got] == ["https://a.example/1", "https://a.example/2"]
    assert got[0].html == "<p>page one body text</p>"
    assert got[0].http_status == 200
    assert got[0].content_type.startswith("text/html")


def test_warc_to_text_pipeline(spark, tmp_path):
    """End to end: WARC bytes -> read_warc -> extract_documents -> the
    planted article text, with the chrome gone — the composed crawl
    front door."""
    from wc_vector_indexing_spark.operators.html_extract import extract_documents
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    body = (
        "<nav><a>Home</a> <a>About</a></nav>"
        "<p>Article paragraph number one is long enough to be prose.</p>"
        "<p>Article paragraph number two is also long enough to keep.</p>"
        "<footer><a>Terms</a> <a>Privacy</a></footer>"
    )
    p = tmp_path / "c.warc"
    p.write_bytes(to_warc_bytes(
        [{"url": f"https://s.example/{i}", "html": body} for i in range(3)]
    ))
    out = extract_documents(read_warc(spark, str(p))).collect()
    assert len(out) == 3
    for r in out:
        assert r.text == (
            "Article paragraph number one is long enough to be prose.\n\n"
            "Article paragraph number two is also long enough to keep."
        )
        assert r.n_good == 2 and r.n_boilerplate == 2


def test_warc_1_1_frames_all_records(spark, tmp_path):
    """Regression (r6 advice): modern Common Crawl is WARC/1.1; the
    version-pinned lineSep silently dropped every record after the
    first. The version-agnostic boundary must frame 1.1 files whole,
    and a mixed 1.0+1.1 concatenation (as produced by `cat`ing crawl
    segments) must also parse completely."""
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    recs = [
        {"url": f"https://v.example/{i}", "html": f"<p>page {i} body text</p>"}
        for i in range(5)
    ]
    p = tmp_path / "c11.warc"
    p.write_bytes(to_warc_bytes(recs, version="1.1"))
    got = read_warc(spark, str(p)).orderBy("url").collect()
    assert [r.url for r in got] == [r["url"] for r in recs]
    assert got[3].html == "<p>page 3 body text</p>"

    mixed = tmp_path / "mixed.warc"
    mixed.write_bytes(
        to_warc_bytes(recs[:2], version="1.0") + to_warc_bytes(recs[2:], version="1.1")
    )
    assert read_warc(spark, str(mixed)).count() == 5


def test_warc_payload_quoting_warc_token_is_stitched(spark, tmp_path):
    """A page whose body quotes 'WARC/...' right after a blank line is
    torn by the version-agnostic lineSep; the parse pass must stitch
    the fragments back (delimiter bytes restored verbatim)."""
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    html = "<p>spec quote:</p>\r\n\r\nWARC/ is the magic prefix\r\n\r\nWARC/1.0 also this"
    p = tmp_path / "q.warc"
    p.write_bytes(to_warc_bytes(
        [{"url": "https://q.example/", "html": html},
         {"url": "https://q.example/2", "html": "<p>plain follower</p>"}],
        version="1.1",
    ))
    got = {r.url: r.html for r in read_warc(spark, str(p)).collect()}
    assert got == {
        "https://q.example/": html,
        "https://q.example/2": "<p>plain follower</p>",
    }


def test_wet_1_1_frames_all_records(spark, tmp_path):
    from wc_vector_indexing_spark.sources.wet import read_wet, to_wet_bytes

    recs = [
        {"url": f"https://w.example/{i}", "text": f"plain text body {i}"}
        for i in range(4)
    ]
    p = tmp_path / "c11.wet"
    p.write_bytes(to_wet_bytes(recs, version="1.1"))
    got = read_wet(spark, str(p)).orderBy("url").collect()
    assert [r.url for r in got] == [r["url"] for r in recs]
    assert got[2].text == "plain text body 2"


def test_warc_declared_charset_recovers_non_utf8(spark, tmp_path):
    """r7 read the payload as UTF-8 and mojibake'd everything else; the
    byte-true path must honor the Content-Type charset parameter.
    cp1251 Cyrillic bytes are invalid UTF-8, so only the declared-
    charset fallback can recover them byte-exactly."""
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    html = "<p>Привет, мир — планированная кириллица.</p>"
    p = tmp_path / "ru.warc"
    p.write_bytes(to_warc_bytes([
        {"url": "https://ru.example/", "html": html, "charset": "cp1251",
         "content_type": "text/html; charset=windows-1251"},
        {"url": "https://ascii.example/", "html": "<p>plain ascii</p>"},
    ]))
    got = {r.url: r.html for r in read_warc(spark, str(p)).collect()}
    assert got["https://ru.example/"] == html
    assert got["https://ascii.example/"] == "<p>plain ascii</p>"


def test_warc_meta_charset_fallback(spark, tmp_path):
    """No charset in Content-Type but a <meta charset> in the body:
    the head-probe fallback must pick it up (after strict UTF-8
    fails)."""
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    html = '<html><head><meta charset="windows-1251"></head><body>Тест</body></html>'
    p = tmp_path / "meta.warc"
    p.write_bytes(to_warc_bytes([
        {"url": "https://m.example/", "html": html, "charset": "cp1251",
         "content_type": "text/html"},
    ]))
    got = read_warc(spark, str(p)).collect()
    assert got[0].html == html


def test_warc_chunked_transfer_decoded(spark, tmp_path):
    """Transfer-Encoding: chunked bodies must be de-chunked — r7 left
    hex chunk-size lines embedded in the text."""
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    html = "<p>" + "chunked body text that spans several chunks. " * 5 + "</p>"
    p = tmp_path / "ch.warc"
    p.write_bytes(to_warc_bytes(
        [{"url": "https://c.example/", "html": html, "chunked": True}]
    ))
    got = read_warc(spark, str(p)).collect()
    assert len(got) == 1
    assert got[0].html == html
    assert "\r\n" not in got[0].html  # no chunk framing leaked


def test_warc_gzip_whole_file_and_member_per_record(spark, tmp_path):
    """.warc.gz support: both a single gzip stream over the whole file
    and Common Crawl's member-per-record framing (one gzip member per
    record, concatenated) must parse identically to the plain file."""
    import gzip as _gzip

    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    recs = [
        {"url": f"https://g.example/{i}", "html": f"<p>gz page {i} body</p>"}
        for i in range(3)
    ]
    plain = to_warc_bytes(recs, version="1.1")
    (tmp_path / "whole.warc.gz").write_bytes(_gzip.compress(plain))
    # member-per-record: each record serialized and gzipped as its own
    # member, members concatenated — the Common Crawl framing
    members = b"".join(
        _gzip.compress(to_warc_bytes([r], version="1.1")) for r in recs
    )
    (tmp_path / "members.warc.gz").write_bytes(members)
    for fname in ("whole.warc.gz", "members.warc.gz"):
        got = read_warc(spark, str(tmp_path / fname)).orderBy("url").collect()
        assert [r.url for r in got] == [r["url"] for r in recs], fname
        assert got[1].html == "<p>gz page 1 body</p>", fname


def test_dechunk_malformed_falls_back_to_raw():
    from wc_vector_indexing_spark.sources.warc import _dechunk

    good = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    assert _dechunk(good) == b"hello world"
    assert _dechunk(b"not-a-chunk-size\r\nrest") == b"not-a-chunk-size\r\nrest"
    assert _dechunk(b"no crlf at all") == b"no crlf at all"
    # chunk extension tokens are tolerated
    assert _dechunk(b"5;ext=1\r\nhello\r\n0\r\n\r\n") == b"hello"


def test_multiline_payload_and_crlf_tolerance(spark, tmp_path):
    from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes

    html = "<p>line one of the body text here</p>\n<p>line two of the body text here</p>"
    p = tmp_path / "m.warc"
    p.write_bytes(to_warc_bytes([{"url": "https://m.example/", "html": html}]))
    got = read_warc(spark, str(p)).collect()
    assert len(got) == 1
    assert got[0].html == html


def test_cli_crawl_command(tmp_path, capsys):
    """wcvi crawl: WARC in, extracted parquet corpus out, JSON summary
    on stdout — the one-command raw-crawl ingest."""
    import json as _json

    from wc_vector_indexing_spark.cli import main
    from wc_vector_indexing_spark.sources.warc import to_warc_bytes

    body = (
        "<nav><a>Home</a> <a>About</a></nav>"
        "<p>The article body paragraph, long enough to clear min-chars.</p>"
        "<footer><a>Terms</a></footer>"
    )
    warc = tmp_path / "c.warc"
    warc.write_bytes(to_warc_bytes(
        [{"url": f"https://e.example/{i}", "html": body} for i in range(4)]
        + [{"url": "https://e.example/short", "html": "<p>tiny</p>"}]
    ))
    out = str(tmp_path / "corpus")
    rc = main(["crawl", "--warc", str(warc), "--out", out])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_written"] == 4           # the tiny page dropped
    assert summary["boilerplate_blocks_dropped"] == 4 * 2

    import duckdb

    rows = duckdb.sql(f"SELECT url, text FROM read_parquet('{out}/*.parquet') ORDER BY url").fetchall()
    assert len(rows) == 4
    assert all(t == "The article body paragraph, long enough to clear min-chars."
               for _, t in rows)


def test_surt_key_canonicalization():
    from wc_vector_indexing_spark.sources.warc import surt_key

    assert surt_key("https://W1.Example/p?b=2&a=1") == "example,w1)/p?a=1&b=2"
    assert surt_key("http://www.news.bbc.co.uk/sport") == \
        "uk,co,bbc,news)/sport"
    assert surt_key("https://user@host.org:8080/A/B") == "org,host)/a/b"
    assert surt_key("https://example.com/") == "com,example)/"


def test_warc_cdx_index_offsets_slice_records_back(spark, tmp_path):
    """The CDX contract: (offset, length) must let a range read fetch
    the exact record without scanning — sliced bytes re-parse to the
    same url; digest/ts/mime/status match the planted records; chunked
    bodies digest the DE-chunked payload (same bytes as the plain
    twin)."""
    import base64
    import hashlib

    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.warc import (
        _iter_records,
        to_warc_bytes,
        warc_cdx_index,
    )

    recs = [
        {"url": "https://a.example/one", "html": "<p>alpha body</p>",
         "warc_date": "2024-03-05T06:07:08Z"},
        {"url": "https://b.example/two?z=1&a=2", "html": "<p>beta</p>",
         "warc_date": "2024-03-05T06:07:09Z", "chunked": True},
        {"url": "https://b.example/two?z=1&a=2", "html": "<p>beta</p>",
         "warc_date": "2024-03-05T06:07:10Z"},
    ]
    data = to_warc_bytes(recs)
    path = tmp_path / "f.warc"
    path.write_bytes(data)
    raw = spark.read.format("binaryFile").load(str(path)).select(
        F.col("path").alias("warc_path"), "content")
    rows = sorted(warc_cdx_index(raw).collect(), key=lambda r: r.ts14)
    assert [r.ts14 for r in rows] == [
        "20240305060708", "20240305060709", "20240305060710"]
    assert rows[0].urlkey == "example,a)/one"
    assert rows[1].urlkey == "example,b)/two?a=2&z=1"
    assert all(r.mime == "text/html" and r.status == 200 for r in rows)
    # chunked and plain twins carry the SAME payload digest
    assert rows[1].digest_sha1_b32 == rows[2].digest_sha1_b32
    assert rows[0].digest_sha1_b32 == base64.b32encode(
        hashlib.sha1(b"<p>alpha body</p>").digest()).decode()
    for r in rows:
        sliced = data[r.offset:r.offset + r.length]
        assert sliced.startswith(b"WARC/1.0")
        (head, payload, s, e), = list(_iter_records(sliced))
        assert r.url.encode() in head


def test_warc_cdx_index_streaming_twin(spark, tmp_path):
    """warc_cdx_index is a stateless Arrow pass, so the same call over
    a file-source readStream (AvailableNow) must produce exactly the
    batch rows — the continuous-ingest form of archive indexing."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.warc import (
        to_warc_bytes,
        warc_cdx_index,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    for i in range(3):
        (drop / f"f{i}.warc").write_bytes(to_warc_bytes([
            {"url": f"https://s{i}.example/p", "html": f"<p>doc {i}</p>",
             "warc_date": f"2024-02-02T00:00:0{i}Z"}]))
    raw_b = spark.read.format("binaryFile").load(str(drop)).select(
        F.col("path").alias("warc_path"), "content")
    batch = {tuple(r) for r in warc_cdx_index(raw_b).collect()}
    raw_s = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .load(str(drop))
        .select(F.col("path").alias("warc_path"), "content")
    )
    out = tmp_path / "out"
    q = (warc_cdx_index(raw_s).writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    stream = {tuple(r) for r in spark.read.parquet(str(out)).collect()}
    assert stream == batch and len(batch) == 3


def test_warc_cdx_gzip_member_offsets(spark, tmp_path):
    """Common Crawl layout: member-per-record .warc.gz gets COMPRESSED
    (offset, length) — each reported range must gunzip on its own to
    exactly one record with the right url; a whole-file single-member
    .gz falls back to decompressed-stream offsets."""
    import gzip as _gzip

    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.warc import (
        _iter_records,
        to_warc_gz_bytes,
        warc_cdx_index,
    )

    recs = [
        {"url": "https://g.example/a", "html": "<p>member a</p>",
         "warc_date": "2024-04-01T00:00:01Z"},
        {"url": "https://g.example/b", "html": "<p>member b</p>",
         "warc_date": "2024-04-01T00:00:02Z"},
    ]
    data = to_warc_gz_bytes(recs)
    p1 = tmp_path / "m.warc.gz"
    p1.write_bytes(data)
    whole = to_warc_gz_bytes(recs, member_per_record=False)
    p2 = tmp_path / "w.warc.gz"
    p2.write_bytes(whole)

    def idx(path):
        raw = spark.read.format("binaryFile").load(str(path)).select(
            F.col("path").alias("warc_path"), "content")
        return sorted(warc_cdx_index(raw).collect(), key=lambda r: r.ts14)

    rows = idx(p1)
    assert [r.offset_kind for r in rows] == ["gzip-member"] * 2
    for r, want in zip(rows, recs):
        member = data[r.offset:r.offset + r.length]
        inner = _gzip.decompress(member)
        (head, payload, s, e), = list(_iter_records(inner))
        assert want["url"].encode() in head

    rows2 = idx(p2)
    assert [r.offset_kind for r in rows2] == ["plain"] * 2
    plain = _gzip.decompress(whole)
    for r, want in zip(rows2, recs):
        sliced = plain[r.offset:r.offset + r.length]
        assert sliced.startswith(b"WARC/1.0")
        assert want["url"].encode() in sliced
    # digests identical across layouts
    assert [r.digest_sha1_b32 for r in rows] == [
        r.digest_sha1_b32 for r in rows2]


def test_warc_cdx_revisit_records(spark, tmp_path):
    """Revisit rows (archive-side dedup) index with their own
    semantics: mime 'warc/revisit', digest = the ORIGINAL payload's
    digest from the record's WARC-Payload-Digest header, refers_to =
    the WARC-Refers-To pointer; responses carry record_type='response'
    and a null pointer. The (offset, length) slice of a revisit row
    re-parses to the revisit record. Same contract through the
    member-per-record gzip path."""
    import base64
    import hashlib

    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.warc import (
        _iter_records,
        to_warc_bytes,
        to_warc_gz_bytes,
        warc_cdx_index,
    )

    body = b"<p>original body</p>"
    dig = base64.b32encode(hashlib.sha1(body).digest()).decode()
    recs = [
        {"url": "https://a.example/one", "html": body.decode(),
         "warc_date": "2024-03-05T06:07:08Z",
         "record_id": "<urn:uuid:orig-1>"},
        {"url": "https://a.example/one", "revisit": True,
         "warc_date": "2024-03-06T06:07:08Z",
         "record_id": "<urn:uuid:dup-1>",
         "refers_to": "<urn:uuid:orig-1>", "payload_digest": dig},
    ]
    data = to_warc_bytes(recs)
    (tmp_path / "f.warc").write_bytes(data)
    (tmp_path / "f.warc.gz").write_bytes(to_warc_gz_bytes(recs))
    raw = spark.read.format("binaryFile").load(
        str(tmp_path / "f.warc")).select(
        F.col("path").alias("warc_path"), "content")
    rows = sorted(warc_cdx_index(raw).collect(), key=lambda r: r.ts14)
    assert [r.record_type for r in rows] == ["response", "revisit"]
    assert rows[0].refers_to is None
    assert rows[1].refers_to == "<urn:uuid:orig-1>"
    assert rows[1].mime == "warc/revisit"
    # the revisit row resolves the duplicate: same digest as the original
    assert rows[0].digest_sha1_b32 == dig
    assert rows[1].digest_sha1_b32 == dig
    sliced = data[rows[1].offset:rows[1].offset + rows[1].length]
    (head, payload, _s, _e), = list(_iter_records(sliced))
    assert b"WARC-Type: revisit" in head and payload.endswith(b"\r\n\r\n")
    # gzip-member path: same rows, compressed offsets
    raw_gz = spark.read.format("binaryFile").load(
        str(tmp_path / "f.warc.gz")).select(
        F.col("path").alias("warc_path"), "content")
    gz_rows = sorted(warc_cdx_index(raw_gz).collect(), key=lambda r: r.ts14)
    assert [(r.record_type, r.refers_to, r.digest_sha1_b32)
            for r in gz_rows] == [(r.record_type, r.refers_to,
                                   r.digest_sha1_b32) for r in rows]
    assert all(r.offset_kind == "gzip-member" for r in gz_rows)
    import gzip as _gz
    comp = (tmp_path / "f.warc.gz").read_bytes()
    member = comp[gz_rows[1].offset:gz_rows[1].offset + gz_rows[1].length]
    assert b"WARC-Type: revisit" in _gz.decompress(member)


def test_resolve_revisits_asof_and_negatives(spark, tmp_path):
    """Revisit resolution follows the CDX-lookup rule: latest response
    sharing the digest captured AT OR BEFORE the revisit — including
    across files — and a revisit older than every matching capture is
    returned unresolved with null originals."""
    import base64
    import hashlib

    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.warc import (
        resolve_revisits,
        to_warc_bytes,
        warc_cdx_index,
    )

    body = b"<p>shared body</p>"
    dig = base64.b32encode(hashlib.sha1(body).digest()).decode()
    # file A: two captures of the same body (07:00 and 07:10)
    (tmp_path / "a.warc").write_bytes(to_warc_bytes([
        {"url": "https://x.example/p", "html": body.decode(),
         "warc_date": "2024-03-05T07:00:00Z", "record_id": "<urn:uuid:a1>"},
        {"url": "https://x.example/p", "html": body.decode(),
         "warc_date": "2024-03-05T07:10:00Z", "record_id": "<urn:uuid:a2>"},
    ]))
    # file B: a revisit at 07:05 (must resolve to the 07:00 capture,
    # not the newer 07:10 one) and a revisit at 06:00 (before every
    # capture: unresolvable)
    (tmp_path / "b.warc").write_bytes(to_warc_bytes([
        {"url": "https://x.example/p", "revisit": True,
         "warc_date": "2024-03-05T07:05:00Z", "record_id": "<urn:uuid:b1>",
         "refers_to": "<urn:uuid:a1>", "payload_digest": dig},
        {"url": "https://x.example/p", "revisit": True,
         "warc_date": "2024-03-05T06:00:00Z", "record_id": "<urn:uuid:b2>",
         "refers_to": "<urn:uuid:a1>", "payload_digest": dig},
    ]))
    raw = spark.read.format("binaryFile").load(str(tmp_path / "*.warc")) \
        .select(F.col("path").alias("warc_path"), "content")
    rows = {r.revisit_ts14: r
            for r in resolve_revisits(warc_cdx_index(raw)).collect()}
    assert len(rows) == 2
    hit = rows["20240305070500"]
    assert hit.resolved and hit.orig_ts14 == "20240305070000"
    assert hit.orig_warc_path.endswith("a.warc")
    assert hit.orig_offset is not None and hit.orig_length is not None
    miss = rows["20240305060000"]
    assert not miss.resolved and miss.orig_offset is None
    assert miss.orig_warc_path is None


def test_plan_archive_dedup_decisions(spark):
    """Writer-side dedup: prior-known digests demote every carrier to
    a revisit of the prior capture; fresh digests elect the earliest
    batch capture (ts14, url tiebreak) as the response; cold start
    (prior=None) behaves as all-fresh."""
    from wc_vector_indexing_spark.sources.warc import plan_archive_dedup

    batch = spark.createDataFrame(
        [
            # digest A: known to prior -> both rows revisit prior
            ("https://s.example/a1", "20240601000010", "A", 100),
            ("https://s.example/a2", "20240601000005", "A", 100),
            # digest B: fresh; b2 is EARLIER -> b2 responds, b1 revisits
            ("https://s.example/b1", "20240601000020", "B", 200),
            ("https://s.example/b2", "20240601000015", "B", 200),
            # digest C: fresh singleton -> response
            ("https://s.example/c1", "20240601000001", "C", 300),
        ],
        "url string, ts14 string, digest string, length long",
    )
    prior = spark.createDataFrame(
        [("A", "https://old.example/orig", "20240101000000")],
        "digest string, url string, ts14 string",
    )
    rows = {r.url: r for r in plan_archive_dedup(batch, prior).collect()}
    assert rows["https://s.example/a1"].record_type == "revisit"
    assert rows["https://s.example/a2"].record_type == "revisit"
    assert rows["https://s.example/a1"].refers_source == "prior"
    assert rows["https://s.example/a1"].refers_url == "https://old.example/orig"
    assert rows["https://s.example/b2"].record_type == "response"
    assert rows["https://s.example/b2"].bytes_saved == 0
    assert rows["https://s.example/b1"].record_type == "revisit"
    assert rows["https://s.example/b1"].refers_source == "batch"
    assert rows["https://s.example/b1"].refers_url == "https://s.example/b2"
    assert rows["https://s.example/b1"].bytes_saved == 200
    assert rows["https://s.example/c1"].record_type == "response"
    # cold start: digest A's earliest batch row responds instead
    cold = {r.url: r for r in plan_archive_dedup(batch).collect()}
    assert cold["https://s.example/a2"].record_type == "response"
    assert cold["https://s.example/a1"].refers_source == "batch"


def test_resolve_revisits_cap_edge_resolves_false_not_wrong(spark, tmp_path):
    """The documented ``max_digest_candidates`` edge
    (sources/warc.py resolve_revisits): when the newest-N cap excludes
    the ONLY capture qualifying for a revisit (the revisit predates
    every kept capture of a hotter-than-N digest), the revisit must
    come back ``resolved=false`` with null originals — never silently
    matched to a newer capture the as-of rule forbids."""
    import base64
    import hashlib

    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.sources.warc import (
        resolve_revisits,
        to_warc_bytes,
        warc_cdx_index,
    )

    body = b"<p>hot boilerplate</p>"
    dig = base64.b32encode(hashlib.sha1(body).digest()).decode()
    # three captures of one digest at 07:00 / 08:00 / 09:00; a revisit
    # at 07:30 qualifies ONLY against the 07:00 capture
    (tmp_path / "hot.warc").write_bytes(to_warc_bytes([
        {"url": f"https://hot.example/p{i}", "html": body.decode(),
         "warc_date": f"2024-03-05T{7 + i:02d}:00:00Z",
         "record_id": f"<urn:uuid:h{i}>"}
        for i in range(3)
    ] + [
        {"url": "https://hot.example/p0", "revisit": True,
         "warc_date": "2024-03-05T07:30:00Z", "record_id": "<urn:uuid:r>",
         "refers_to": "<urn:uuid:h0>", "payload_digest": dig},
    ]))
    raw = spark.read.format("binaryFile").load(str(tmp_path / "hot.warc")) \
        .select(F.col("path").alias("warc_path"), "content")
    cdx = warc_cdx_index(raw)
    # uncapped: resolves to the 07:00 capture
    full = resolve_revisits(cdx).collect()
    assert len(full) == 1 and full[0].resolved
    assert full[0].orig_ts14 == "20240305070000"
    # cap=2 keeps only the 08:00/09:00 captures: the one qualifying
    # capture is excluded -> resolved=false, NOT a match to 08:00+
    capped = resolve_revisits(cdx, max_digest_candidates=2).collect()
    assert len(capped) == 1
    assert not capped[0].resolved
    assert capped[0].orig_ts14 is None and capped[0].orig_offset is None


def test_crawl_to_training_set_composition(spark):
    """The end-to-end crawl composition entry over its planted fixture
    at sf0.001: every duplicate/reject class lands in exactly the
    stage planted for it — 6 writer-demoted byte dups (archive layer),
    6 chrome-variant text dups (exact dedup), 6 German pages
    (language), 3 digit pages (quality), 3 minhash near-dups — and the
    6 surviving anchors carry 3 captures each (response + resolved
    revisit + demoted dup) with the 36-token planted article."""
    from wc_vector_indexing_spark.plans.queries import REGISTRY

    rows = REGISTRY["crawl_to_training_set"].fn(
        spark, "/root/testdata/sf0.001").collect()
    by_split = {r.split: r for r in rows}
    assert by_split["dropped_archive_dup"].n_docs == 6
    assert by_split["dropped_exact_duplicate"].n_docs == 6
    assert by_split["dropped_wrong_language"].n_docs == 6
    assert by_split["dropped_low_quality"].n_docs == 3
    assert by_split["dropped_near_duplicate"].n_docs == 3
    splits = [r for r in rows if not r.split.startswith("dropped_")]
    assert sum(r.n_docs for r in splits) == 6
    assert sum(r.n_captures for r in splits) == 18
    assert all(r.avg_tokens == 36.0 for r in splits)


def test_iter_records_truncated_tail_clamps_end():
    # a file cut off right after the last payload byte (no trailing
    # CRLFCRLF): the yielded end offset must not point past EOF, so a
    # CDX (offset, length) range read never over-reads
    from wc_vector_indexing_spark.sources.warc import (
        _iter_records,
        to_warc_bytes,
    )

    data = to_warc_bytes([
        {"url": "https://t.example/a", "html": "<p>aa</p>"},
        {"url": "https://t.example/b", "html": "<p>bb</p>"},
    ])
    truncated = data[:-4]  # drop the final record's trailing CRLFCRLF
    recs = list(_iter_records(truncated))
    assert len(recs) == 3  # warcinfo + 2 responses
    head, payload, start, end = recs[-1]
    assert end == len(truncated)
    assert payload.endswith(b"</p>")


def test_gzip_members_corrupt_member_raises_value_error():
    # bit rot inside a member's deflate stream: the walk must surface
    # the contract class, never a bare zlib.error
    import gzip as _gzip

    import pytest

    from wc_vector_indexing_spark.sources.warc import _gzip_members

    good = _gzip.compress(b"member one payload") + _gzip.compress(
        b"member two payload")
    bad = bytearray(good)
    bad[12] ^= 0xFF  # inside the first member's deflate data
    with pytest.raises((ValueError, NotImplementedError)):
        list(_gzip_members(bytes(bad)))


def test_warc_readers_per_file_isolation(spark):
    """One rotted .warc.gz in a crawl batch: on_error='skip' drops the
    WHOLE corrupt file and keeps every other file's records;
    on_error='raise' (default) surfaces a contract ValueError naming
    the file — never a bare gzip/zlib error out of the Arrow pass."""
    import gzip as _gzip

    import pytest

    from wc_vector_indexing_spark.sources.warc import (
        parse_warc,
        to_warc_bytes,
        warc_cdx_index,
    )

    good = _gzip.compress(to_warc_bytes(
        [{"url": "https://ok.example/a", "html": "<p>fine</p>"}]))
    corrupt = bytearray(_gzip.compress(to_warc_bytes(
        [{"url": "https://bad.example/b", "html": "<p>rotted</p>"}])))
    corrupt[20] ^= 0xFF  # interior deflate corruption
    raw = spark.createDataFrame(
        [("mem://good.warc.gz", bytearray(good)),
         ("mem://bad.warc.gz", bytes(corrupt))],
        "warc_path string, content binary")

    with pytest.raises(Exception, match="corrupt WARC file"):
        parse_warc(raw).collect()
    kept = parse_warc(raw, on_error="skip").collect()
    assert {r.url for r in kept} == {"https://ok.example/a"}

    with pytest.raises(Exception, match="corrupt WARC file"):
        warc_cdx_index(raw).collect()
    rows = warc_cdx_index(raw, on_error="skip").collect()
    assert {r.warc_path for r in rows} == {"mem://good.warc.gz"}


def test_fetch_warc_records_gzip_member_random_access(spark, tmp_path):
    """CDX locator → ranged fetch: member-per-record .warc.gz records
    come back exactly, and a corrupted NEIGHBOR member cannot poison a
    fetch that never touches its byte range."""
    from wc_vector_indexing_spark.sources.warc import (
        fetch_warc_records,
        parse_warc,
        to_warc_gz_bytes,
        warc_cdx_index,
    )

    recs = [
        {"url": f"https://w.example/p{j}",
         "html": f"<html><body>page {j} body</body></html>"}
        for j in range(5)
    ]
    blob = to_warc_gz_bytes(recs, member_per_record=True)
    p = tmp_path / "a.warc.gz"
    p.write_bytes(blob)
    raw = spark.read.format("binaryFile").load(str(p)).selectExpr(
        "path as warc_path", "content")
    idx = warc_cdx_index(raw)
    assert idx.count() == 5
    assert idx.select("offset_kind").distinct().collect()[0][0] \
        == "gzip-member"
    got = fetch_warc_records(idx).toPandas().sort_values("url")
    assert list(got["url"]) == [f"https://w.example/p{j}"
                                for j in range(5)]
    assert list(got["html"]) == [
        f"<html><body>page {j} body</body></html>" for j in range(5)]
    # corrupt the LAST member on disk; the index rows were materialized
    # BEFORE (the real usage: index at crawl time, fetch later), and
    # fetching the other members never touches the rotted byte range
    locs = idx.toPandas().sort_values("offset").reset_index(drop=True)
    last = locs.iloc[-1]
    data = bytearray(blob)
    # flip a DEFLATE-payload byte (not the ignored MTIME field): either
    # the huffman stream breaks or the member CRC catches it
    data[int(last["offset"]) + int(last["length"]) // 2] ^= 0xFF
    p.write_bytes(bytes(data))
    loc_cols = ["warc_path", "offset", "length", "offset_kind"]
    all_locs = spark.createDataFrame(locs[loc_cols])
    keep = spark.createDataFrame(locs[loc_cols].iloc[:-1])
    ok = fetch_warc_records(keep).toPandas()
    assert len(ok) == 4
    # the corrupt locator raises by name, and skip drops ONLY it
    import pytest as _pytest

    with _pytest.raises(Exception, match="gzip|member|corrupt"):
        fetch_warc_records(all_locs).collect()
    assert fetch_warc_records(all_locs, on_error="skip").count() == 4
    # sanity: the full-scan reader agrees with the fetched rows
    p.write_bytes(blob)
    full = parse_warc(raw).select("url").toPandas()
    assert sorted(full["url"]) == sorted(got["url"])


def test_fetch_warc_records_plain_offsets(spark, tmp_path):
    """plain offset_kind: direct seek+read on uncompressed .warc, and
    sequential-prefix decompress on a multi-record-member .warc.gz."""
    from wc_vector_indexing_spark.sources.warc import (
        fetch_warc_records,
        to_warc_bytes,
        to_warc_gz_bytes,
        warc_cdx_index,
    )

    recs = [
        {"url": f"https://w.example/p{j}",
         "html": f"<html><body>plain {j}</body></html>"}
        for j in range(3)
    ]
    for name, blob in (
            ("plain.warc", to_warc_bytes(recs)),
            ("whole.warc.gz",
             to_warc_gz_bytes(recs, member_per_record=False))):
        p = tmp_path / name
        p.write_bytes(blob)
        raw = spark.read.format("binaryFile").load(str(p)).selectExpr(
            "path as warc_path", "content")
        idx = warc_cdx_index(raw)
        assert set(idx.toPandas()["offset_kind"]) == {"plain"}
        got = fetch_warc_records(idx).toPandas().sort_values("url")
        assert list(got["html"]) == [
            f"<html><body>plain {j}</body></html>" for j in range(3)], name
    # a short length is an overrun contract error on the plain file
    short = warc_cdx_index(
        spark.read.format("binaryFile")
        .load(str(tmp_path / "plain.warc"))
        .selectExpr("path as warc_path", "content")
    ).selectExpr("warc_path", "offset", "length * 1000 as length",
                 "offset_kind")
    import pytest as _pytest

    with _pytest.raises(Exception, match="overrun"):
        fetch_warc_records(short).collect()
