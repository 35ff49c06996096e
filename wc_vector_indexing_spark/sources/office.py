"""Office-document text extraction: DOCX (ECMA-376 / ISO 29500) and
EPUB (IDPF/ISO 22424) sources — after PDF, the two highest-frequency
document formats in a real LLM corpus, and both are just zip + XML, so
a no-deps container can read them honestly with ``zipfile`` +
``xml.etree`` alone.

Scope:
- DOCX: ``word/document.xml`` paragraph walk — runs (w:t), tabs (w:tab),
  line/page breaks (w:br), hyperlink-wrapped runs, and table cells
  (w:tbl/w:tr/w:tc → tab-joined cells, one line per row). Headers,
  footers, comments and tracked-change markup are out of (stated)
  scope; deleted text (w:delText) is explicitly NOT emitted.
- EPUB: META-INF/container.xml → OPF rootfile → manifest + spine →
  XHTML chapters in SPINE order (the reading order, not the zip order),
  block-level tags become line breaks, scripts/styles dropped.
- Documented NotImplementedError seams: encrypted OOXML (OLE/CFB
  container, not a zip) and DRM'd EPUB (META-INF/encryption.xml).

Spark shape: like PDFs, office files are whole-file units (the zip
central directory is at EOF), so the scan is ``binaryFile`` — one file
per row, per-file task parallelism, one zero-shuffle Arrow parse pass.
At 100 TB the corpus is millions of small documents: task granularity
IS the file, and only extracted text rows leave the scan.

Reference note: the reference engine has no document-file ingestion
path (SURVEY §1.1); this module is north-star training-pipeline
surface, public specs only (ECMA-376 part 1, EPUB 3.3 / OCF 3.3).
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from wc_vector_indexing_spark.operators.contract import quarantine

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_CONTAINER = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"

DOCX_SCHEMA = T.StructType(
    [
        T.StructField("doc_path", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_paragraphs", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
    ]
)

EPUB_SCHEMA = T.StructType(
    [
        T.StructField("epub_path", T.StringType()),
        T.StructField("chapter_no", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ]
)

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


# ------------------------------------------------------------------ DOCX


def _run_text(r: ET.Element) -> str:
    """One w:r run → its visible text (w:t content, w:tab → tab,
    w:br/w:cr → newline). w:delText (tracked deletions) is skipped —
    emitting deleted text would silently corrupt the corpus."""
    parts: list[str] = []
    for child in r:
        tag = child.tag
        if tag == f"{_W}t":
            parts.append(child.text or "")
        elif tag == f"{_W}tab":
            parts.append("\t")
        elif tag in (f"{_W}br", f"{_W}cr"):
            parts.append("\n")
    return "".join(parts)


def _para_text(p: ET.Element) -> str:
    """One w:p paragraph → its text. ``.iter`` descends through
    hyperlinks/smart-tags/field wrappers, so any nesting of w:r works;
    runs inside nested TABLES never reach here (tables are walked as
    block siblings by _block_text)."""
    return "".join(_run_text(r) for r in p.iter(f"{_W}r"))


def _block_text(body: ET.Element) -> list[str]:
    """Body (or table-cell) children in document order → one string per
    block: w:p paragraphs verbatim, w:tbl tables as one line per row
    with tab-joined cells (the lossless-enough flattening every
    plain-text corpus uses)."""
    blocks: list[str] = []
    for child in body:
        tag = child.tag
        if tag == f"{_W}p":
            blocks.append(_para_text(child))
        elif tag == f"{_W}tbl":
            for tr in child.iter(f"{_W}tr"):
                cells = [
                    "\n".join(_block_text(tc)) for tc in tr if tc.tag == f"{_W}tc"
                ]
                blocks.append("\t".join(cells))
    return blocks


@quarantine("docx")
def extract_docx_text(data: bytes) -> tuple[str, int]:
    """DOCX bytes → (text, n_paragraphs). Raises ValueError for
    non-zip/corrupt input and NotImplementedError for encrypted OOXML
    (an OLE compound file, not a zip — the payload is ciphertext)."""
    if data.startswith(_OLE_MAGIC):
        raise NotImplementedError(
            "encrypted OOXML (OLE/CFB container) — decryption not supported"
        )
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        xml = zf.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError(f"not a DOCX: {e}") from e
    root = ET.fromstring(xml)
    body = root.find(f"{_W}body")
    if body is None:
        raise ValueError("corrupt DOCX: no w:body")
    blocks = _block_text(body)
    return "\n".join(blocks), len(blocks)


def read_docx_corpus(
    spark: SparkSession, path: str, on_error: str = "raise"
) -> DataFrame:
    """Read DOCX file(s) (glob/dir ok) into (doc_path, text,
    n_paragraphs, n_chars) — one row per document. ``binaryFile`` scan
    + one zero-shuffle Arrow parse pass; ``on_error='skip'``
    quarantines unparseable files (encrypted, corrupt) instead of
    failing the task — the crawl-ingest default posture."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DOCX_SCHEMA.fields]
        for pdf in batches:
            out = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    text, n_para = extract_docx_text(bytes(content))
                except Exception:  # noqa: BLE001 — per-file isolation
                    if on_error == "raise":
                        raise
                    continue
                out.append(
                    {
                        "doc_path": fpath,
                        "text": text,
                        "n_paragraphs": n_para,
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(parse, schema=DOCX_SCHEMA)


# ------------------------------------------------------------------ EPUB

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr",
    "blockquote", "section", "article", "br",
}
_DROP_TAGS = {"script", "style", "head"}


def _xhtml_text(xml: bytes) -> str:
    """XHTML chapter → text: block tags break lines, scripts/styles/head
    dropped, inline tags concatenate. EPUB content documents are
    well-formed XML by spec, so etree (not an error-recovering HTML
    parser) is the honest tool."""
    root = ET.fromstring(xml)
    lines: list[str] = [""]

    def walk(el: ET.Element) -> None:
        tag = el.tag.rsplit("}", 1)[-1].lower()
        if tag in _DROP_TAGS:
            if el.tail:
                lines[-1] += el.tail
            return
        if tag in _BLOCK_TAGS and lines[-1]:
            lines.append("")
        if el.text:
            lines[-1] += el.text
        for child in el:
            walk(child)
        if tag in _BLOCK_TAGS and lines[-1]:
            lines.append("")
        if el.tail:
            lines[-1] += el.tail

    walk(root)
    return "\n".join(
        s for s in (re.sub(r"\s+", " ", ln).strip() for ln in lines) if s
    )


@quarantine("epub")
def extract_epub_chapters(data: bytes) -> list[str]:
    """EPUB bytes → per-chapter text in SPINE (reading) order. Raises
    ValueError for non-zip/corrupt input and NotImplementedError for
    DRM'd files (META-INF/encryption.xml present)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an EPUB: {e}") from e
    names = set(zf.namelist())
    if "META-INF/encryption.xml" in names:
        raise NotImplementedError(
            "DRM'd EPUB (META-INF/encryption.xml) — decryption not supported"
        )
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
    except KeyError as e:
        raise ValueError("not an EPUB: no META-INF/container.xml") from e
    rf = container.find(f".//{_CONTAINER}rootfile")
    if rf is None or not rf.get("full-path"):
        raise ValueError("corrupt EPUB: no rootfile in container.xml")
    opf_path = rf.get("full-path")
    opf_dir = posixpath.dirname(opf_path)
    opf = ET.fromstring(zf.read(opf_path))
    manifest = {
        item.get("id"): item.get("href")
        for item in opf.iter(f"{_OPF}item")
    }
    chapters: list[str] = []
    for ref in opf.iter(f"{_OPF}itemref"):
        href = manifest.get(ref.get("idref"))
        if not href:
            continue
        member = posixpath.normpath(posixpath.join(opf_dir, href))
        chapters.append(_xhtml_text(zf.read(member)))
    return chapters


def read_epub_corpus(
    spark: SparkSession, path: str, on_error: str = "raise"
) -> DataFrame:
    """Read EPUB file(s) into (epub_path, chapter_no, text, n_chars) —
    one row per spine chapter, in reading order. Same ``binaryFile`` +
    Arrow-pass shape as the PDF/DOCX sources; ``on_error='skip'``
    quarantines DRM'd/corrupt files."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EPUB_SCHEMA.fields]
        for pdf in batches:
            out = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    chapters = extract_epub_chapters(bytes(content))
                except Exception:  # noqa: BLE001 — per-file isolation
                    if on_error == "raise":
                        raise
                    continue
                for cno, text in enumerate(chapters):
                    out.append(
                        {
                            "epub_path": fpath,
                            "chapter_no": cno,
                            "text": text,
                            "n_chars": len(text),
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return raw.mapInPandas(parse, schema=EPUB_SCHEMA)


# ------------------------------------------------------------------ writers


def _xml_esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def to_docx_bytes(paragraphs: list[str]) -> bytes:
    """Serialize paragraphs to a minimal, spec-valid DOCX ([Content_
    Types].xml + _rels/.rels + word/document.xml) — the fixture/export
    half; tests pin extract_docx_text(to_docx_bytes(x)) == x. Embedded
    tabs survive as w:tab runs; embedded newlines as w:br."""
    paras = []
    for p in paragraphs:
        runs = []
        for i, seg_nl in enumerate(p.split("\n")):
            if i:
                runs.append("<w:br/>")
            for j, seg in enumerate(seg_nl.split("\t")):
                if j:
                    runs.append("<w:tab/>")
                if seg:
                    runs.append(
                        f'<w:t xml:space="preserve">{_xml_esc(seg)}</w:t>'
                    )
        paras.append(f"<w:p><w:r>{''.join(runs)}</w:r></w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(paras)
        + "</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
        '+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
        '" Target="word/document.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("word/document.xml", document)
    return buf.getvalue()


def to_epub_bytes(chapters: list[str], title: str = "fixture") -> bytes:
    """Serialize chapter texts to a minimal, spec-valid EPUB (stored
    mimetype first per OCF, container.xml, OPF with manifest + spine,
    one XHTML per chapter) — the fixture/export half; tests pin
    extract_epub_chapters(to_epub_bytes(x)) == x (modulo whitespace
    normalization). Chapter newlines become <p> blocks."""
    items, spine, files = [], [], []
    for i, ch in enumerate(chapters):
        body = "".join(f"<p>{_xml_esc(ln)}</p>" for ln in ch.split("\n"))
        xhtml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            f"<title>ch{i}</title></head><body>{body}</body></html>"
        )
        files.append((f"OEBPS/ch{i}.xhtml", xhtml))
        items.append(
            f'<item id="c{i}" href="ch{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{i}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid"><metadata xmlns:dc="http://purl.org/dc/'
        'elements/1.1/"><dc:identifier id="uid">urn:uuid:0</dc:identifier>'
        f"<dc:title>{_xml_esc(title)}</dc:title>"
        "<dc:language>en</dc:language></metadata>"
        f"<manifest>{''.join(items)}</manifest>"
        f"<spine>{''.join(spine)}</spine></package>"
    )
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:'
        'xmlns:container"><rootfiles><rootfile full-path="OEBPS/content.opf"'
        ' media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        # OCF: mimetype must be first and STORED (uncompressed)
        zf.writestr(
            zipfile.ZipInfo("mimetype"), "application/epub+zip",
        )
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        for name, xhtml in files:
            zf.writestr(name, xhtml)
    return buf.getvalue()
