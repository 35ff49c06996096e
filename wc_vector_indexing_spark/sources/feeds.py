"""RSS 2.0 / Atom feed source (public RSS 2.0 spec + RFC 4287 Atom,
parsed with stdlib ElementTree): feeds are how a crawl pipeline
discovers fresh documents, and a pipeline ingests them as one row per
entry — title, link, publication timestamp, summary text — whatever
dialect the publisher picked.

Dialect detection is structural: an ``<rss>`` root with a ``channel``
child vs an Atom ``<feed>`` root (namespace-qualified). RSS dates are
RFC 2822 (``email.utils``), Atom dates RFC 3339 (``datetime``); both
surface as epoch seconds, None when absent/unparseable. Malformed XML
raises ValueError (quarantine contract).

Spark shape: per-blob parse is an embarrassingly parallel Arrow map
exploding one row per entry; zero shuffle until the caller aggregates.

Reference note: the reference engine ingests only store rows (SURVEY
§1.1); north-star crawl-discovery surface, public spec only.
"""

from __future__ import annotations

import email.utils
import xml.etree.ElementTree as ET
from datetime import datetime

_ATOM_NS = "{http://www.w3.org/2005/Atom}"


def _rfc2822_ts(text: str | None) -> int | None:
    if not text:
        return None
    try:
        dt = email.utils.parsedate_to_datetime(text)
        return int(dt.timestamp()) if dt else None
    except (TypeError, ValueError):
        return None


def _rfc3339_ts(text: str | None) -> int | None:
    if not text:
        return None
    try:
        return int(datetime.fromisoformat(text.replace("Z", "+00:00")).timestamp())
    except ValueError:
        return None


def parse_feed(text: str) -> dict:
    """Feed XML → {dialect, feed_title, entries: [{title, link,
    published_ts, summary}]} in document order. Raises ValueError for
    non-XML or non-feed roots."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as exc:
        raise ValueError(f"feed: XML parse failed: {exc}") from exc
    if root.tag == "rss":
        channel = root.find("channel")
        if channel is None:
            raise ValueError("feed: <rss> without <channel>")
        entries = [
            {
                "title": (item.findtext("title") or "").strip() or None,
                "link": (item.findtext("link") or "").strip() or None,
                "published_ts": _rfc2822_ts(item.findtext("pubDate")),
                "summary": (item.findtext("description") or "").strip() or None,
            }
            for item in channel.findall("item")
        ]
        return {
            "dialect": "rss",
            "feed_title": (channel.findtext("title") or "").strip() or None,
            "entries": entries,
        }
    if root.tag == f"{_ATOM_NS}feed":
        entries = []
        for entry in root.findall(f"{_ATOM_NS}entry"):
            link = None
            for ln in entry.findall(f"{_ATOM_NS}link"):
                rel = ln.get("rel", "alternate")
                if rel == "alternate":
                    link = ln.get("href")
                    break
            entries.append({
                "title": (entry.findtext(f"{_ATOM_NS}title") or "").strip() or None,
                "link": link,
                "published_ts": _rfc3339_ts(
                    entry.findtext(f"{_ATOM_NS}published")
                    or entry.findtext(f"{_ATOM_NS}updated")
                ),
                "summary": (entry.findtext(f"{_ATOM_NS}summary") or "").strip() or None,
            })
        return {
            "dialect": "atom",
            "feed_title": (root.findtext(f"{_ATOM_NS}title") or "").strip() or None,
            "entries": entries,
        }
    raise ValueError(f"feed: unrecognized root element {root.tag!r}")


_SM_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap(text: str) -> dict:
    """sitemaps.org XML → {kind: 'urlset'|'index', entries: [{loc,
    lastmod_ts, changefreq, priority}]}. A <sitemapindex> lists child
    sitemaps (loc + lastmod only). Raises ValueError for non-XML or
    non-sitemap roots."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as exc:
        raise ValueError(f"sitemap: XML parse failed: {exc}") from exc
    if root.tag == f"{_SM_NS}urlset":
        kind, member = "urlset", f"{_SM_NS}url"
    elif root.tag == f"{_SM_NS}sitemapindex":
        kind, member = "index", f"{_SM_NS}sitemap"
    else:
        raise ValueError(f"sitemap: unrecognized root element {root.tag!r}")
    entries = []
    for el in root.findall(member):
        loc = (el.findtext(f"{_SM_NS}loc") or "").strip() or None
        if loc is None:
            raise ValueError("sitemap: member without <loc>")
        pr = el.findtext(f"{_SM_NS}priority")
        entries.append({
            "loc": loc,
            "lastmod_ts": _rfc3339_ts(el.findtext(f"{_SM_NS}lastmod")),
            "changefreq": (el.findtext(f"{_SM_NS}changefreq") or "").strip()
            or None,
            "priority": float(pr) if pr is not None else None,
        })
    return {"kind": kind, "entries": entries}


def to_sitemap(entries: list[dict], index: bool = False) -> str:
    """Writer half: urlset (loc/lastmod/changefreq/priority) or
    sitemapindex (loc/lastmod) XML."""

    def rfc3339(ts: int) -> str:
        return datetime.utcfromtimestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")

    root, member = ("sitemapindex", "sitemap") if index else ("urlset", "url")
    body = ""
    for e in entries:
        body += f"<{member}><loc>{e['loc']}</loc>"
        if e.get("lastmod_ts") is not None:
            body += f"<lastmod>{rfc3339(e['lastmod_ts'])}</lastmod>"
        if not index and e.get("changefreq"):
            body += f"<changefreq>{e['changefreq']}</changefreq>"
        if not index and e.get("priority") is not None:
            body += f"<priority>{e['priority']:.1f}</priority>"
        body += f"</{member}>"
    return (
        f'<?xml version="1.0"?><{root} '
        f'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{body}</{root}>'
    )


def to_rss(feed_title: str, entries: list[dict]) -> str:
    """Writer half: RSS 2.0 text (RFC 2822 pubDate from epoch)."""
    items = "".join(
        "<item>"
        f"<title>{e['title']}</title>"
        f"<link>{e['link']}</link>"
        f"<pubDate>{email.utils.formatdate(e['published_ts'], usegmt=True)}</pubDate>"
        f"<description>{e['summary']}</description>"
        "</item>"
        for e in entries
    )
    return (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        f"<title>{feed_title}</title>{items}</channel></rss>"
    )


def to_atom(feed_title: str, entries: list[dict]) -> str:
    """Writer half: Atom text (RFC 3339 published from epoch; one
    self link per entry above the alternate link, which the parser
    must prefer)."""

    def rfc3339(ts: int) -> str:
        return datetime.utcfromtimestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")

    items = "".join(
        "<entry>"
        f"<title>{e['title']}</title>"
        '<link rel="self" href="https://feed.example/self"/>'
        f'<link rel="alternate" href="{e["link"]}"/>'
        f"<published>{rfc3339(e['published_ts'])}</published>"
        f"<summary>{e['summary']}</summary>"
        "</entry>"
        for e in entries
    )
    return (
        '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        f"<title>{feed_title}</title>{items}</feed>"
    )
