"""PDF text-extraction source (sources/pdf.py): extractor as a true
inverse of the in-package writer (raw and FlateDecode streams, escapes,
hex strings, TJ arrays, page-tree order), documented seams for
encryption/filters/CID fonts, and the binaryFile-based Spark reader
with per-file quarantine."""

from __future__ import annotations

import zlib

import pytest

from wc_vector_indexing_spark.sources.pdf import (
    extract_pdf_text,
    read_pdf_corpus,
    to_pdf_bytes,
)


PAGES = [
    "First page line one.\nLine two with (parens), \\ backslash.",
    "Second page text.\n\nAfter a blank line.",
    "Third page, short.",
]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_multipage(compress):
    assert extract_pdf_text(to_pdf_bytes(PAGES, compress=compress)) == PAGES


def test_latin1_text_roundtrip():
    pages = ["Café naïve résumé."]
    assert extract_pdf_text(to_pdf_bytes(pages)) == pages


def test_page_tree_order_not_object_order():
    """Pages must come back in /Kids order even when object numbers
    are shuffled — build a file whose kids array reverses the object
    definition order by swapping the page refs."""
    data = to_pdf_bytes(["alpha page", "beta page"])
    swapped = data.replace(b"/Kids [4 0 R 6 0 R]", b"/Kids [6 0 R 4 0 R]")
    assert swapped != data
    assert extract_pdf_text(swapped) == ["beta page", "alpha page"]


def test_tj_array_and_hex_strings():
    """Hand-built content stream: TJ array with kerning (big gap ->
    space, small gap -> none) and a hex string."""
    content = b"BT 72 720 Td [(Hel) -20 (lo) -400 (world)] TJ 0 -14 Td <414243> Tj ET"
    assert extract_pdf_text(_raw_pdf(content)) == ["Hello world\nABC"]


def _raw_pdf(content: bytes) -> bytes:
    """Single-page PDF around a hand-written content stream (correct
    /Length — patching to_pdf_bytes output would desync it)."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + (b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(content), content))
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


def test_octal_escape():
    assert extract_pdf_text(
        _raw_pdf(b"BT 72 720 Td (\\101\\102) Tj ET")
    ) == ["AB"]


def test_non_octal_digit_escape_keeps_digit():
    """Spec 7.3.4.2: \\8 and \\9 are NOT octal (digits 0-7 only) — an
    unrecognized escape drops the backslash and keeps the character.
    Round-7 parser fed them to int(..., 8) and quarantined the file."""
    assert extract_pdf_text(
        _raw_pdf(b"BT 72 720 Td (a\\8b\\9c\\101) Tj ET")
    ) == ["a8b9cA"]


def test_indirect_length_stream():
    """`/Length 8 0 R` is an indirect ref — the 8 is an object number,
    not a byte count. Round-7 sliced the payload to 8 bytes. The fixed
    scanner falls through to the endstream search and then re-slices
    from the referenced integer object."""
    content = b"BT 72 720 Td (indirect length works) Tj ET"
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + (b"4 0 obj\n<< /Length 8 0 R >>\nstream\n%s\nendstream\nendobj\n"
           % content)
        + (b"8 0 obj\n%d\nendobj\n" % len(content))
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(raw) == ["indirect length works"]


def test_indirect_length_flate_stream():
    """Same, Flate-compressed — the compressed payload must be sliced
    exactly (trailing-newline rstrip on binary data would corrupt it),
    which exercises the second-pass absolute re-slice."""
    content = zlib.compress(b"BT 72 720 Td (flate indirect) Tj ET")
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + (b"4 0 obj\n<< /Length 8 0 R /Filter /FlateDecode >>\n"
           b"stream\n%s\nendstream\nendobj\n" % content)
        + (b"8 0 obj\n%d\nendobj\n" % len(content))
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(raw) == ["flate indirect"]


def test_objstm_packed_objects():
    """PDF 1.5+ files pack non-stream objects into /ObjStm streams;
    round-7's linear scan never saw them and silently emitted zero
    pages. Pack the catalog + page tree + page dict into one ObjStm."""
    packed_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    bodies = [b for _, b in packed_objs]
    offs, pos = [], 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    header = b" ".join(
        b"%d %d" % (num, off) for (num, _), off in zip(packed_objs, offs)
    ) + b"\n"
    payload = zlib.compress(header + b"\n".join(bodies) + b"\n")
    content = b"BT 72 720 Td (from objstm) Tj ET"
    raw = (
        b"%PDF-1.5\n"
        + (b"9 0 obj\n<< /Type /ObjStm /N 3 /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
           % (len(header), len(payload), payload))
        + (b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(content), content))
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(raw) == ["from objstm"]


def test_cid_identity_h_tounicode_roundtrip():
    """Identity-H + /ToUnicode CMap extracts for real now (ISO 32000
    9.10.3); the seam narrowed to Identity-H WITHOUT a ToUnicode map
    (see test_seams). Multi-page, multibyte, newline layout."""
    pages = ["CID page oné.\nSecond line…", "Pagé two — ßü."]
    data = to_pdf_bytes(pages, cid=True)
    assert b"/Identity-H" in data and b"beginbfchar" in data
    assert extract_pdf_text(data) == pages


def test_bfrange_forms():
    """Both bfrange destination forms: start-code increment and
    explicit array (parsed sequentially so array entries can't be
    misread as a start-code triple)."""
    from wc_vector_indexing_spark.sources.pdf import _parse_tounicode

    cmap = (
        b"1 beginbfrange\n<0001> <0003> <0041>\nendbfrange\n"
        b"1 beginbfrange\n<0010> <0012> [<0058> <00E9> <0020>]\nendbfrange\n"
        b"1 beginbfchar\n<0020> <2014>\nendbfchar\n"
    )
    m = _parse_tounicode(cmap)
    assert m[1] == "A" and m[2] == "B" and m[3] == "C"
    assert m[0x10] == "X" and m[0x11] == "é" and m[0x12] == " "
    assert m[0x20] == "—"


def test_contents_array_concatenation():
    """Multiple content streams for one page concatenate (spec: the
    page's content is the concatenation of its /Contents streams)."""
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length 26 >>\nstream\nBT 72 720 Td (part one) Tj\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length 24 >>\nstream\n0 -14 Td (part two) Tj ET\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(raw) == ["part one\npart two"]


def test_seams():
    with pytest.raises(ValueError):
        extract_pdf_text(b"GIF89a not a pdf")
    # encryption is implemented since r8 (sources/pdf_crypt.py;
    # roundtrips + the narrowed password-protected seam live in
    # tests/test_pdf_crypt.py) — a dangling /Encrypt ref is now plain
    # corruption, not a seam
    enc = to_pdf_bytes(["secret"]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(ValueError, match="Encrypt"):
        extract_pdf_text(enc)
    cid = to_pdf_bytes(["x"]).replace(b"/Helvetica", b"/Identity-H")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(cid)
    # LZW decodes for real since r8 — the remaining filter seam is the
    # image-codec family (DCT/JBIG2/CCITT)
    ccitt = to_pdf_bytes(["x"], compress=True).replace(
        b"/FlateDecode", b"/CCITTFaxDecode"
    )
    with pytest.raises(NotImplementedError):
        extract_pdf_text(ccitt)


def test_lzw_roundtrip_and_pdf_stream():
    """LZW codec pair: property roundtrips (random, repetitive data
    forcing width growth + table resets, empty) and a full PDF whose
    content stream is LZW-compressed."""
    import random

    from wc_vector_indexing_spark.sources.pdf import _lzw_decode, _lzw_encode

    rng = random.Random(8)
    cases = [
        b"",
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(rng.randrange(256) for _ in range(5000)),
        b"ab" * 9000,  # repetitive: grows the table through widths 10-12
        bytes(rng.randrange(4) for _ in range(30000)),  # forces table reset
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data)) == data
        assert _lzw_decode(_lzw_encode(data, 0), 0) == data  # EarlyChange=0
    content = b"BT 72 720 Td (lzw stream extracts) Tj ET"
    payload = _lzw_encode(content)
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + (b"4 0 obj\n<< /Length %d /Filter /LZWDecode >>\n"
           b"stream\n%s\nendstream\nendobj\n" % (len(payload), payload))
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(raw) == ["lzw stream extracts"]


def test_lzw_corrupt_raises_value_error():
    from wc_vector_indexing_spark.sources.pdf import _lzw_decode

    with pytest.raises(ValueError):
        _lzw_decode(b"\xff\xff\xff\xff\xff\xff")


def test_ascii_and_runlength_filters():
    """ASCIIHex / ASCII85 / RunLength decodes (7.4.2-7.4.5) + a
    cascade array filter ([/ASCII85Decode /FlateDecode])."""
    import base64

    from wc_vector_indexing_spark.sources.pdf import (
        _ascii85_decode,
        _asciihex_decode,
        _decode_stream,
    )

    assert _asciihex_decode(b"48 65 6C 6C 6F>") == b"Hello"
    assert _asciihex_decode(b"48656C6C6F2") == b"Hello "  # odd digit pads 0
    with pytest.raises(ValueError):
        _asciihex_decode(b"4G>")

    for payload in (b"", b"x", b"Man is distinguished", b"\x00\x00\x00\x00ab"):
        enc = base64.a85encode(payload)
        assert _ascii85_decode(enc + b"~>") == payload
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        _ascii85_decode(b"\x7f\x7f\x7f\x7f\x7f~>")

    # RunLength: 2 literals "ab", repeat "c" x4, EOD
    rl = bytes([1]) + b"ab" + bytes([253]) + b"c" + bytes([128])
    assert _decode_stream(b"<< /Filter /RunLengthDecode >>", rl) == b"abcccc"

    content = b"BT 72 720 Td (cascade works) Tj ET"
    casc = base64.a85encode(zlib.compress(content)) + b"~>"
    head = b"<< /Filter [/ASCII85Decode /FlateDecode] >>"
    assert _decode_stream(head, casc) == content


def test_ascii85_pdf_stream_extracts():
    import base64

    content = b"BT 72 720 Td (ascii85 stream) Tj ET"
    payload = base64.a85encode(content) + b"~>"
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + (b"4 0 obj\n<< /Length %d /Filter /ASCII85Decode >>\n"
           b"stream\n%s\nendstream\nendobj\n" % (len(payload), payload))
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(raw) == ["ascii85 stream"]


def test_corrupt_flate_raises_value_error():
    data = to_pdf_bytes(["some page text here"], compress=True)
    i = data.find(b"stream\n") + len(b"stream\n")
    bad = data[:i] + b"\xff\xff\xff\xff" + data[i + 4 :]
    with pytest.raises(ValueError):
        extract_pdf_text(bad)


def test_read_pdf_corpus_spark(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(to_pdf_bytes(PAGES[:2]))
    (tmp_path / "b.pdf").write_bytes(to_pdf_bytes([PAGES[2]], compress=True))
    rows = read_pdf_corpus(spark, str(tmp_path)).orderBy("pdf_path", "page_no").collect()
    assert [(r.page_no, r.text) for r in rows] == [
        (0, PAGES[0]),
        (1, PAGES[1]),
        (0, PAGES[2]),
    ]
    assert rows[0].n_chars == len(PAGES[0])
    assert rows[0].pdf_path.endswith("a.pdf")


def test_read_pdf_corpus_quarantine(spark, tmp_path):
    (tmp_path / "good.pdf").write_bytes(to_pdf_bytes(["good page"]))
    (tmp_path / "bad.pdf").write_bytes(b"%PDF-1.4 then total garbage")
    (tmp_path / "enc.pdf").write_bytes(
        to_pdf_bytes(["x"]).replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    )
    with pytest.raises(Exception):
        read_pdf_corpus(spark, str(tmp_path)).collect()
    got = read_pdf_corpus(spark, str(tmp_path), on_error="skip").collect()
    assert [r.text for r in got] == ["good page"]
