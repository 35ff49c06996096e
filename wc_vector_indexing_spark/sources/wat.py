"""WAT metadata extraction — the third Common Crawl derivative, next
to the raw WARC reader (sources/warc.py) and the WET text extraction
(sources/wet.py): per-record metadata (page title, ``<meta>`` tags,
outgoing links) wrapped in the published WAT JSON envelope shape.
WAT is what link-graph construction, anchor-text mining, and URL
frontier seeding consume INSTEAD of re-parsing the full HTML — at
100 TB, materializing it once is the difference between one HTML
parse and one per downstream consumer.

Plan split (the same discipline as the rest of the crawl front door):
Python touches bytes exactly once — one Arrow ``mapInPandas`` pass
runs a stdlib ``HTMLParser`` over each record's HTML and emits TYPED
columns (title, metas, links). Everything after that is Catalyst:
the WAT JSON envelope is assembled JVM-side with ``to_json(struct)``,
link explosion for graph edges is a generator, counts are codegen.
Zero shuffle end-to-end; the scan inherits read_warc's per-record
quarantine.

Scope: ``Head.Title``, ``Head.Metas`` (name/content pairs),
``Head.Link`` (rel/href), and body ``Links`` (<a href> + anchor text)
— the fields the published WAT readers actually key on. Frame/script
src inventories are out of scope (recorded here, not raising seams:
consumers wanting them re-run the HTML pass with a wider parser).

Reference behavior analogue: the plain()/SEO-meta projections
(class-indexer.php meta_description handling) re-expressed as the
archive-side metadata sidecar.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_DDL = (
    "url string, warc_date string, record_id string, http_status int, "
    "content_type string, warc_path string, "
    "title string, "
    "metas array<struct<name: string, content: string>>, "
    "head_links array<struct<rel: string, href: string>>, "
    "links array<struct<url: string, text: string>>"
)


class _HtmlMeta(HTMLParser):
    """One-pass head/link harvest: title text, <meta name/property +
    content>, <link rel/href>, and <a href> with its anchor text
    (text collected until the matching close, nesting-tolerant)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: str | None = None
        self.metas: list[tuple[str, str]] = []
        self.head_links: list[tuple[str, str]] = []
        self.links: list[tuple[str, list[str]]] = []
        self._in_title = False
        self._title_parts: list[str] = []
        self._open_anchors: list[int] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "title":
            self._in_title = True
        elif tag == "meta":
            name = a.get("name") or a.get("property")
            if name is not None and a.get("content") is not None:
                self.metas.append((name, a["content"]))
        elif tag == "link":
            if a.get("href") is not None:
                self.head_links.append((a.get("rel") or "", a["href"]))
        elif tag == "a":
            if a.get("href") is not None:
                self.links.append((a["href"], []))
                self._open_anchors.append(len(self.links) - 1)

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
            if self.title is None:
                self.title = "".join(self._title_parts).strip()
        elif tag == "a" and self._open_anchors:
            self._open_anchors.pop()

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)
        for i in self._open_anchors:
            self.links[i][1].append(data)


def _harvest(html: str) -> tuple:
    p = _HtmlMeta()
    p.feed(html or "")
    p.close()
    if p.title is None and p._title_parts:  # unclosed <title>
        p.title = "".join(p._title_parts).strip()
    links = [(u, " ".join("".join(t).split())) for u, t in p.links]
    return p.title, p.metas, p.head_links, links


def warc_metadata(records: DataFrame) -> DataFrame:
    """read_warc rows → typed WAT metadata columns (schema above).
    ONE Arrow pass, no shuffle; malformed-HTML tolerance comes from
    html.parser's error-recovery model (it never raises on tag soup,
    matching browsers — a crawl corpus guarantee regex can't give)."""
    cols = ["url", "warc_date", "record_id", "http_status",
            "content_type", "warc_path"]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            harvested = [_harvest(h) for h in pdf["html"]]
            out = pdf[cols].copy()
            out["title"] = [h[0] for h in harvested]
            out["metas"] = [h[1] for h in harvested]
            out["head_links"] = [h[2] for h in harvested]
            out["links"] = [h[3] for h in harvested]
            yield out

    keep = records.select(*cols, "html")
    return keep.mapInPandas(parse, schema=_META_DDL)


def build_wat(records: DataFrame) -> DataFrame:
    """WAT rows: :func:`warc_metadata` plus the ``wat_json`` envelope
    string in the published layout (Envelope → WARC-Header-Metadata +
    Payload-Metadata → HTTP-Response-Metadata → HTML-Metadata with
    Head{Title,Metas,Link} and Links). The envelope is assembled
    ENTIRELY in Catalyst (``to_json`` over nested structs) — Python
    never sees it, so the JSON stage scales as codegen."""
    meta = warc_metadata(records)
    envelope = F.struct(
        F.struct(
            F.col("url").alias("WARC-Target-URI"),
            F.col("warc_date").alias("WARC-Date"),
            F.col("record_id").alias("WARC-Record-ID"),
            F.lit("response").alias("WARC-Type"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                F.struct(
                    F.col("http_status").alias("Status"),
                ).alias("Response-Message"),
                F.struct(
                    F.col("content_type").alias("Content-Type"),
                ).alias("Headers"),
                F.struct(
                    F.struct(
                        F.col("title").alias("Title"),
                        F.col("metas").alias("Metas"),
                        F.col("head_links").alias("Link"),
                    ).alias("Head"),
                    F.col("links").alias("Links"),
                ).alias("HTML-Metadata"),
            ).alias("HTTP-Response-Metadata"),
        ).alias("Payload-Metadata"),
    ).alias("Envelope")
    return meta.withColumn(
        "wat_json",
        F.to_json(F.struct(envelope), {"ignoreNullFields": "false"}),
    )


def link_edges(records: DataFrame) -> DataFrame:
    """(src_url, link_no, href, anchor_text): the exploded link-graph
    edge list — what PageRank/anchor-text mining consume. posexplode
    is a generator (no shuffle); dangling pages (zero links) drop, by
    edge-list convention."""
    return (
        warc_metadata(records)
        .select(
            F.col("url").alias("src_url"),
            F.posexplode("links").alias("link_no", "link"),
        )
        .select(
            "src_url", "link_no",
            F.col("link.url").alias("href"),
            F.col("link.text").alias("anchor_text"),
        )
    )


def _resolved_target() -> "F.Column":
    """Absolute http(s) hrefs pass through; root-relative hrefs
    resolve against the source page's scheme+host (the only relative
    form the planted crawl emits and the overwhelmingly dominant one
    in real markup); anything else (mailto:, javascript:, fragments,
    dot-relative) is NULL = dropped by the consumers."""
    from wc_vector_indexing_spark.operators.urls import url_host, url_scheme

    return (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(
            F.col("href").startswith("/"),
            F.concat(url_scheme("src_url"), F.lit("://"),
                     url_host("src_url"), F.col("href")),
        )
    )


def host_link_graph(records: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links, n_src_pages): the host-level
    link graph — what domain ranking, crawl-frontier prioritization,
    and host-reputation scoring consume. One generator explode over
    the WAT metadata pass, then ONE hash aggregation on the
    (src_host, dst_host) pair key; hosts are a bounded vocabulary
    relative to pages, so the shuffle carries host pairs, never
    pages. Relative links resolve to their own host (a self-edge —
    real: internal linking is a reputation signal)."""
    from wc_vector_indexing_spark.operators.urls import url_host

    edges = link_edges(records).withColumn("target", _resolved_target())
    return (
        edges.filter(F.col("target").isNotNull())
        .select(
            url_host("src_url").alias("src_host"),
            url_host("target").alias("dst_host"),
            "src_url",
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("src_url").alias("n_src_pages"),
        )
    )


def anchor_text_index(records: DataFrame) -> DataFrame:
    """(target, n_refs, top_anchor): per resolved link target, the
    incoming-reference count and the most frequent anchor text (ties
    break on the lexicographically smallest text) — the classic
    anchor-text retrieval signal (anchors describe the TARGET better
    than the target's own page; the original web-search insight).
    Two aggregations on the target key plus ONE window for the
    argmax; everything after the metadata pass is Catalyst."""
    from pyspark.sql.window import Window

    edges = link_edges(records).withColumn("target", _resolved_target())
    per_text = (
        edges.filter(F.col("target").isNotNull())
        .groupBy("target", F.col("anchor_text").alias("text"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("target").orderBy(F.desc("n"), F.asc("text"))
    return (
        per_text.withColumn("rk", F.row_number().over(w))
        .groupBy("target")
        .agg(
            F.sum("n").alias("n_refs"),
            F.max(F.when(F.col("rk") == 1, F.col("text")))
            .alias("top_anchor"),
        )
    )


def parse_wat_json(s: str) -> dict:
    """Test/consumer helper: one WAT envelope string → dict (plain
    json.loads with the contract ValueError)."""
    try:
        d = json.loads(s)
    except json.JSONDecodeError as e:
        raise ValueError(f"malformed WAT JSON: {e!r}") from e
    if "Envelope" not in d:
        raise ValueError("malformed WAT JSON: no Envelope")
    return d
