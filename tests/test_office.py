"""DOCX/EPUB source tests: writer/extractor inversion, structure
handling (tabs, breaks, tables, spine order), the documented
encryption/DRM seams, per-file quarantine, and the Spark read path."""

import io
import zipfile

import pytest

from wc_vector_indexing_spark.sources.office import (
    extract_docx_text,
    extract_epub_chapters,
    read_docx_corpus,
    read_epub_corpus,
    to_docx_bytes,
    to_epub_bytes,
)


# ------------------------------------------------------------------ docx


def test_docx_roundtrip_plain():
    paras = ["First paragraph.", "Second one, with punctuation!", ""]
    text, n = extract_docx_text(to_docx_bytes(paras))
    assert text == "\n".join(paras)
    assert n == 3


def test_docx_tabs_and_breaks():
    paras = ["col1\tcol2\tcol3", "line one\nline two"]
    text, n = extract_docx_text(to_docx_bytes(paras))
    assert text == "col1\tcol2\tcol3\nline one\nline two"
    assert n == 2


def test_docx_xml_escaping_roundtrip():
    paras = ["a < b & c > d", "5 &amp; already-escaped stays literal"]
    text, _ = extract_docx_text(to_docx_bytes(paras))
    assert text == "\n".join(paras)


def test_docx_table_flattening():
    # hand-built document.xml with a 2x2 table between two paragraphs
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{w}"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl>"
        "<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr>"
        "<w:tr><w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>d</w:t></w:r></w:p></w:tc></w:tr>"
        "</w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    text, n = extract_docx_text(buf.getvalue())
    assert text == "before\na\tb\nc\td\nafter"
    assert n == 4  # 2 paragraphs + 2 table rows


def test_docx_hyperlink_runs_and_deleted_text():
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{w}"><w:body>'
        "<w:p><w:r><w:t>see </w:t></w:r>"
        '<w:hyperlink><w:r><w:t>the link</w:t></w:r></w:hyperlink></w:p>'
        "<w:p><w:r><w:delText>GONE</w:delText><w:t>kept</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    text, _ = extract_docx_text(buf.getvalue())
    assert text == "see the link\nkept"


def test_docx_encrypted_seam():
    ole = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="encrypted OOXML"):
        extract_docx_text(ole)


def test_docx_not_a_zip():
    with pytest.raises(ValueError, match="not a DOCX"):
        extract_docx_text(b"plain text, no zip magic")


# ------------------------------------------------------------------ epub


def test_epub_roundtrip_spine_order():
    chapters = [
        "Chapter one opens the book.\nIt has two paragraphs.",
        "Chapter two follows.",
        "A third chapter ends it.",
    ]
    got = extract_epub_chapters(to_epub_bytes(chapters))
    assert got == chapters


def test_epub_spine_order_overrides_zip_order():
    # build an epub whose zip stores ch1 before ch0; spine says 0 then 1
    base = to_epub_bytes(["zero", "one"])
    zf_in = zipfile.ZipFile(io.BytesIO(base))
    members = {n: zf_in.read(n) for n in zf_in.namelist()}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("mimetype"), members["mimetype"])
        zf.writestr("OEBPS/ch1.xhtml", members["OEBPS/ch1.xhtml"])
        zf.writestr("META-INF/container.xml", members["META-INF/container.xml"])
        zf.writestr("OEBPS/content.opf", members["OEBPS/content.opf"])
        zf.writestr("OEBPS/ch0.xhtml", members["OEBPS/ch0.xhtml"])
    assert extract_epub_chapters(buf.getvalue()) == ["zero", "one"]


def test_epub_drops_scripts_and_normalizes_whitespace():
    xhtml = (
        '<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">'
        "<head><style>p{}</style></head><body>"
        "<script>var x=1;</script>"
        "<p>spaced   out\n  text</p><div>block <b>bold</b> tail</div>"
        "</body></html>"
    )
    base = to_epub_bytes(["placeholder"])
    zf_in = zipfile.ZipFile(io.BytesIO(base))
    members = {n: zf_in.read(n) for n in zf_in.namelist()}
    members["OEBPS/ch0.xhtml"] = xhtml.encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, b in members.items():
            zf.writestr(n, b)
    assert extract_epub_chapters(buf.getvalue()) == [
        "spaced out text\nblock bold tail"
    ]


def test_epub_drm_seam():
    base = to_epub_bytes(["ch"])
    zf_in = zipfile.ZipFile(io.BytesIO(base))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n in zf_in.namelist():
            zf.writestr(n, zf_in.read(n))
        zf.writestr("META-INF/encryption.xml", "<encryption/>")
    with pytest.raises(NotImplementedError, match="DRM"):
        extract_epub_chapters(buf.getvalue())


def test_epub_not_an_epub():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "hi")
    with pytest.raises(ValueError, match="no META-INF/container.xml"):
        extract_epub_chapters(buf.getvalue())


# ------------------------------------------------------------------ spark


def test_read_docx_corpus_spark(spark, tmp_path):
    for i in range(4):
        (tmp_path / f"d{i}.docx").write_bytes(
            to_docx_bytes([f"Document {i} paragraph one.", f"And para two of {i}."])
        )
    # one corrupt file: skipped under on_error='skip'
    (tmp_path / "bad.docx").write_bytes(b"not a zip at all")
    df = read_docx_corpus(spark, str(tmp_path / "*.docx"), on_error="skip")
    rows = {r.doc_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {f"d{i}.docx" for i in range(4)}
    assert rows["d2.docx"].text == "Document 2 paragraph one.\nAnd para two of 2."
    assert rows["d2.docx"].n_paragraphs == 2
    assert rows["d2.docx"].n_chars == len(rows["d2.docx"].text)


def test_read_docx_corpus_raise_propagates(spark, tmp_path):
    (tmp_path / "bad.docx").write_bytes(b"junk")
    with pytest.raises(Exception, match="not a DOCX"):
        read_docx_corpus(spark, str(tmp_path / "*.docx")).collect()


def test_read_epub_corpus_spark(spark, tmp_path):
    (tmp_path / "b0.epub").write_bytes(to_epub_bytes(["alpha", "beta"]))
    (tmp_path / "b1.epub").write_bytes(to_epub_bytes(["gamma"]))
    df = read_epub_corpus(spark, str(tmp_path / "*.epub"))
    got = sorted(
        (r.epub_path.rsplit("/", 1)[-1], r.chapter_no, r.text) for r in df.collect()
    )
    assert got == [
        ("b0.epub", 0, "alpha"),
        ("b0.epub", 1, "beta"),
        ("b1.epub", 0, "gamma"),
    ]
