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
    enc = to_pdf_bytes(["secret"]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(NotImplementedError):
        extract_pdf_text(enc)
    cid = to_pdf_bytes(["x"]).replace(b"/Helvetica", b"/Identity-H")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(cid)
    lzw = to_pdf_bytes(["x"], compress=True).replace(b"/FlateDecode", b"/LZWDecode")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(lzw)


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
