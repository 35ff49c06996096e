"""MediaWiki XML dump source — the pages-articles-multistream layout
Wikipedia publishes and every LLM pre-training pipeline ingests.

Joins the markup/office/PDF extractor family (sources/markup.py,
sources/office.py) with the same contract: a deterministic writer half
for planted-truth fixtures, pure parse/extract functions, and Spark
glue that keeps every corpus-scale stage distributed. Reference
behavior analogue: the ``plain()`` HTML→text projection
(class-indexer.php document assembly) re-expressed for the wiki dump
family.

Why multistream, and why it is THE scale story here: the real
``pages-articles-multistream.xml.bz2`` is a single ~20 GB file — a
whole-file ``binaryFile`` scan would hand one executor a multi-hour
single-threaded decompress. The multistream layout is bz2 streams
concatenated back-to-back (stream 0 = the ``<mediawiki>`` header +
``<siteinfo>``, then one stream per ~100 ``<page>`` elements), plus a
companion index of ``offset:page_id:title`` lines mapping every page
to the byte offset of the stream holding it. :func:`read_wiki_dump`
turns the DISTINCT index offsets into (start, end) slices with one
window ``lead``, spreads the slices across partitions, and each task
seeks to its offset and decompresses only its own streams — the exact
access pattern the format was designed for, and it parallelises a
single dump file across a whole cluster. (Tasks open the dump path
directly; on a real cluster that path is a shared filesystem or a
ranged-GET fetch — the slice math is identical.)

Wikitext extraction (:func:`wikitext_to_text`) is STRUCTURE REMOVAL,
not rendering (same posture as markdown/LaTeX): templates and tables
are dropped (their expansion needs the template namespace — noise at
best in a training corpus), ``<ref>``/comments dropped, wiki links
reduced to their label with File:/Image:/Category: links dropped
entirely, external links reduced to their label, headings unwrapped,
quote-markup and list markers stripped, ``<nowiki>`` content kept
VERBATIM (its contract is "render as-is" — and it gives fixtures an
exact-replay channel, like markdown's fences).
"""

from __future__ import annotations

import bz2
import re
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# --------------------------------------------------------------- wikitext

_WT_NOWIKI = re.compile(r"<nowiki>(.*?)</nowiki>", re.DOTALL | re.IGNORECASE)
_WT_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_WT_REF = re.compile(
    r"<ref[^>/]*/>|<ref[^>]*>.*?</ref>", re.DOTALL | re.IGNORECASE)
_WT_TEMPLATE = re.compile(r"\{\{[^{}]*\}\}", re.DOTALL)
_WT_TABLE = re.compile(r"\{\|(?:(?!\{\|).)*?\|\}", re.DOTALL)
_WT_FILE_LINK = re.compile(
    r"\[\[(?:File|Image|Category)\s*:[^\[\]]*\]\]", re.IGNORECASE)
_WT_PIPED_LINK = re.compile(r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]")
_WT_PLAIN_LINK = re.compile(r"\[\[([^\[\]|]*)\]\]")
_WT_EXT_LINK = re.compile(r"\[(?:https?|ftp)://[^\s\]]*( [^\]]*)?\]")
_WT_HEADING = re.compile(r"^(={1,6})\s*(.*?)\s*\1\s*$", re.MULTILINE)
_WT_LIST = re.compile(r"^[*#:;]+\s*", re.MULTILINE)
_WT_MAGIC = re.compile(r"__[A-Z]+__")
_WT_BR = re.compile(r"<br\s*/?>", re.IGNORECASE)
_WT_TAG = re.compile(r"</?[A-Za-z][^>]*>")


def wikitext_to_text(wt: str) -> str:
    """Wikitext → training text (strip rules in the module docstring).
    ``<nowiki>`` spans are carved out first (kept verbatim by
    contract), then drop-families innermost-out, then link/label
    reduction, then line-level markup."""
    slots: list[str] = []

    def carve(m: re.Match) -> str:
        slots.append(m.group(1))
        return f"\x00{len(slots) - 1}\x00"

    wt = _WT_NOWIKI.sub(carve, wt)
    wt = _WT_COMMENT.sub("", wt)
    wt = _WT_REF.sub("", wt)
    prev = None
    while prev != wt:  # nested {{outer|{{inner}}}} and {| {| |} |}
        prev = wt
        wt = _WT_TEMPLATE.sub("", wt)
        wt = _WT_TABLE.sub("", wt)
    prev = None
    while prev != wt:  # [[File:x|caption with [[link]]]] innermost-out
        prev = wt
        wt = _WT_FILE_LINK.sub("", wt)
        wt = _WT_PIPED_LINK.sub(r"\1", wt)
        wt = _WT_PLAIN_LINK.sub(r"\1", wt)
    wt = _WT_EXT_LINK.sub(lambda m: (m.group(1) or "").lstrip(), wt)
    wt = _WT_HEADING.sub(r"\2", wt)
    wt = wt.replace("'''''", "").replace("'''", "").replace("''", "")
    wt = _WT_LIST.sub("", wt)
    wt = _WT_MAGIC.sub("", wt)
    wt = _WT_BR.sub("\n", wt)
    wt = _WT_TAG.sub("", wt)
    for i, body in enumerate(slots):
        wt = wt.replace(f"\x00{i}\x00", body)
    return re.sub(r"\n{3,}", "\n\n", re.sub(r"[ \t]+", " ", wt)).strip()


# --------------------------------------------------------------- XML parse

def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def parse_pages(xml_fragment: str) -> list[dict]:
    """Raw ``<page>`` elements (a multistream stream's content) →
    one dict per page: page_id, title, ns, redirect (target title or
    None), timestamp, wikitext. Structurally-off input is the
    contract ``ValueError``. Handles both bare fragments and
    namespace-qualified full-export wrappers."""
    frag = xml_fragment.strip()
    if not frag:
        return []
    try:
        root = ET.fromstring(f"<pages>{frag}</pages>")
    except ET.ParseError as e:
        raise ValueError(f"malformed dump XML: {e!r}") from e
    out: list[dict] = []
    for page in root.iter():
        tag = page.tag.rsplit("}", 1)[-1]  # strip xmlns if present
        if tag != "page":
            continue
        fields: dict = {"redirect": None}
        for child in page:
            ctag = child.tag.rsplit("}", 1)[-1]
            if ctag == "title":
                fields["title"] = child.text or ""
            elif ctag == "ns":
                try:
                    fields["ns"] = int(child.text or "")
                except ValueError as e:
                    raise ValueError(f"non-integer ns: {child.text!r}") from e
            elif ctag == "id":
                try:
                    fields["page_id"] = int(child.text or "")
                except ValueError as e:
                    raise ValueError(f"non-integer id: {child.text!r}") from e
            elif ctag == "redirect":
                fields["redirect"] = child.get("title", "")
            elif ctag == "revision":
                for rc in child:
                    rtag = rc.tag.rsplit("}", 1)[-1]
                    if rtag == "timestamp":
                        fields["timestamp"] = rc.text or ""
                    elif rtag == "text":
                        fields["wikitext"] = rc.text or ""
        for req in ("title", "ns", "page_id"):
            if req not in fields:
                raise ValueError(f"page missing <{req}>")
        fields.setdefault("timestamp", "")
        fields.setdefault("wikitext", "")
        out.append(fields)
    return out


# --------------------------------------------------------------- writer half

def to_wiki_multistream(
    pages: list[dict], pages_per_stream: int = 100,
) -> tuple[bytes, str]:
    """Writer half: (dump_bytes, index_text) in the published
    pages-articles-multistream layout — stream 0 carries the
    ``<mediawiki>`` header + ``<siteinfo>``, then one bz2 stream per
    ``pages_per_stream`` pages, then a closing ``</mediawiki>``
    stream; the index has one ``offset:page_id:title`` line per page
    (offset = byte offset of the stream holding it). Deterministic —
    fixtures and tests. Each page dict: title, ns, page_id, text,
    optional redirect / timestamp."""
    if pages_per_stream < 1:
        raise ValueError("pages_per_stream must be >= 1")
    header = (
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/" '
        'version="0.11" xml:lang="en">\n'
        "  <siteinfo>\n    <sitename>fixture</sitename>\n"
        "    <dbname>fixturewiki</dbname>\n  </siteinfo>\n"
    )
    chunks: list[bytes] = [bz2.compress(header.encode("utf-8"))]
    index_lines: list[str] = []
    offset = len(chunks[0])
    for i in range(0, len(pages), pages_per_stream):
        group = pages[i:i + pages_per_stream]
        parts: list[str] = []
        for p in group:
            redirect = (
                f'    <redirect title="{_xml_escape(p["redirect"])}" />\n'
                if p.get("redirect") else "")
            parts.append(
                "  <page>\n"
                f"    <title>{_xml_escape(p['title'])}</title>\n"
                f"    <ns>{int(p['ns'])}</ns>\n"
                f"    <id>{int(p['page_id'])}</id>\n"
                f"{redirect}"
                "    <revision>\n"
                f"      <id>{int(p['page_id']) * 10}</id>\n"
                f"      <timestamp>{p.get('timestamp', '2024-01-01T00:00:00Z')}"
                "</timestamp>\n"
                '      <text bytes="{n}" xml:space="preserve">{t}</text>\n'
                .format(n=len(p["text"].encode("utf-8")),
                        t=_xml_escape(p["text"]))
                + "    </revision>\n  </page>\n"
            )
            index_lines.append(f"{offset}:{int(p['page_id'])}:{p['title']}")
        blob = bz2.compress("".join(parts).encode("utf-8"))
        chunks.append(blob)
        offset += len(blob)
    chunks.append(bz2.compress(b"</mediawiki>\n"))
    return b"".join(chunks), "\n".join(index_lines) + "\n"


# --------------------------------------------------------------- reader

_PAGE_SCHEMA = ("page_id long, title string, ns int, redirect string, "
                "timestamp string, wikitext string")


def decode_slice(blob: bytes) -> list[dict]:
    """One dump slice (concatenated bz2 streams) → page dicts. The
    per-task decode body, module-level so the corruption sweeps can
    drive it directly: any malformed input is the contract
    ValueError, never a bare bz2/XML internal error."""
    try:
        texts: list[str] = []
        while blob:
            d = bz2.BZ2Decompressor()
            texts.append(d.decompress(blob).decode("utf-8"))
            if not d.eof:
                raise ValueError("truncated bz2 stream")
            blob = d.unused_data
    except (OSError, UnicodeDecodeError) as e:
        raise ValueError(f"corrupt dump slice: {e!r}") from e
    # the EOF slice swallows the closing-tag stream; inside <text> a
    # literal closer would be &lt;-escaped, so splitting on it is exact
    frag = "".join(texts).split("</mediawiki>")[0]
    return parse_pages(frag)


def read_wiki_dump(spark: SparkSession, dump_path: str, index_path: str,
                   on_error: str = "raise", slices_per_task: int = 1,
                   ) -> DataFrame:
    """(page_id, title, ns, redirect, timestamp, wikitext): every page
    of a multistream dump, decompressed and parsed IN PARALLEL by
    stream slice.

    Plan shape: index lines → distinct stream offsets → ONE window
    ``lead`` (ordered by offset; the offset table is #streams ≈
    pages/100 rows — thousandths of the corpus — so the single-window
    stage is a bounded dim-side step, never the corpus) → slice rows
    spread round-robin → Arrow ``mapInPandas`` where each task seeks
    to its slice and walks one ``BZ2Decompressor`` per stream via
    ``unused_data`` (the same member-walk idiom as the CDX
    gzip-member reader, sources/warc.py). The LAST slice's end is
    NULL = read to EOF, which also swallows the closing
    ``</mediawiki>`` stream (parse_pages yields no pages for it).

    ``on_error='skip'`` quarantines a malformed STREAM (the natural
    corruption unit of the format) rather than failing the scan."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    idx = spark.read.text(index_path)
    offsets = (
        idx.filter(F.length(F.trim("value")) > 0)
        .select(F.split("value", ":", 3).getItem(0).cast("long")
                .alias("start"))
        .filter(F.col("start").isNotNull())  # malformed line ≠ a slice
        .distinct()
    )
    w = Window.orderBy("start")
    slices = offsets.select(
        "start", F.lead("start").over(w).alias("end"),
        F.row_number().over(w).alias("slice_no"),
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["page_id", "title", "ns", "redirect", "timestamp", "wikitext"]
        for pdf in batches:
            rows: list[tuple] = []
            for start, end in zip(pdf["start"], pdf["end"]):
                start = int(start)
                with open(dump_path, "rb") as fh:
                    fh.seek(start)
                    n = -1 if pd.isna(end) else int(end) - start
                    blob = fh.read(n)
                try:
                    for p in decode_slice(blob):
                        rows.append((p["page_id"], p["title"], p["ns"],
                                     p["redirect"], p["timestamp"],
                                     p["wikitext"]))
                except ValueError as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt stream at offset {start}: {e!r}") from e
                    continue
            yield pd.DataFrame(rows, columns=cols)

    n_parts = max(1, spark.sparkContext.defaultParallelism)
    return (
        slices.repartition(n_parts, "slice_no")
        .mapInPandas(decode, schema=_PAGE_SCHEMA)
    )


_WT_LINK_SCAN = re.compile(r"\[\[([^\[\]|]+)(?:\|[^\[\]]*)?\]\]")
_EXCLUDED_NS = ("file:", "image:", "category:")


def wikitext_links(wt: str) -> list[str]:
    """Internal link TARGETS of one page, in order — the wiki link
    graph's raw edges. Comments and ``<nowiki>`` spans are carved out
    first (a link inside either does not link); File:/Image:/Category:
    targets are excluded (media/taxonomy, not the article graph);
    section fragments are dropped; titles are canonicalized the
    MediaWiki way (underscores → spaces, collapse whitespace, first
    character uppercased)."""
    wt = _WT_COMMENT.sub("", _WT_NOWIKI.sub("", wt))
    out: list[str] = []
    for m in _WT_LINK_SCAN.finditer(wt):
        target = m.group(1).split("#", 1)[0]
        target = " ".join(target.replace("_", " ").split())
        if not target or target.lower().startswith(_EXCLUDED_NS):
            continue
        out.append(target[0].upper() + target[1:])
    return out


def wiki_link_edges(pages: DataFrame) -> DataFrame:
    """(src_title, link_no, dst_title): the article link graph from a
    :func:`read_wiki_dump` DataFrame — the wiki analogue of the WAT
    ``link_edges`` (sources/wat.py). One Arrow pass over wikitext;
    pages with no links drop, by edge-list convention."""
    def scan(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for title, wt in zip(pdf["title"], pdf["wikitext"]):
                for i, dst in enumerate(wikitext_links(wt or "")):
                    rows.append((title, i, dst))
            yield pd.DataFrame(
                rows, columns=["src_title", "link_no", "dst_title"])

    return pages.select("title", "wikitext").mapInPandas(
        scan, schema="src_title string, link_no long, dst_title string")


def wiki_dump_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Dump-over-dump churn — the wiki analogue of the CDX snapshot
    diff (sources/warc.cdx_snapshot_diff): one row per page_id across
    two dump versions with status new / gone / changed / unchanged
    (changed = wikitext digest OR title moved; comparison is digests
    through the shuffle, never bodies — the same discipline as
    host_reputation). ONE full-outer join on page_id, all Catalyst;
    at real dump scale both sides are the slice-parallel readers, so
    the join is the only shuffle in the plan.

    Input: two :func:`read_wiki_dump` DataFrames (or anything with
    page_id / title / wikitext)."""
    def keyed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            "page_id",
            F.col("title").alias(f"{side}_title"),
            F.md5(F.coalesce(F.col("wikitext"), F.lit("")))
            .alias(f"{side}_digest"),
        )

    o, n = keyed(old, "old"), keyed(new, "new")
    joined = o.join(n, "page_id", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("new"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(
            (F.col("old_digest") == F.col("new_digest"))
            & (F.col("old_title") == F.col("new_title")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        "page_id",
        F.coalesce("new_title", "old_title").alias("title"),
        status.alias("status"),
    )


def read_wiki_pages(spark: SparkSession, dump_path: str, index_path: str,
                    on_error: str = "raise") -> DataFrame:
    """(page_id, title, ns, is_redirect, text): the training-corpus
    view — :func:`read_wiki_dump` plus :func:`wikitext_to_text` over
    the wikitext column in the SAME Arrow pass family (a second
    mapInPandas stage fused by Spark into the scan stage; no shuffle
    between parse and extract)."""
    pages = read_wiki_dump(spark, dump_path, index_path, on_error=on_error)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "page_id": pdf["page_id"],
                "title": pdf["title"],
                "ns": pdf["ns"],
                "is_redirect": pdf["redirect"].notna(),
                "text": [wikitext_to_text(t) for t in pdf["wikitext"]],
            })

    return pages.mapInPandas(
        extract,
        schema="page_id long, title string, ns int, is_redirect boolean, "
               "text string",
    )
