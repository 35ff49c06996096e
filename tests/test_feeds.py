"""RSS/Atom feed source (sources/feeds.py): writer-inverse roundtrips
for both dialects, date-format handling (RFC 2822 vs RFC 3339), Atom
link-rel preference, empty/missing fields, and the malformed-XML
quarantine contract."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.sources.feeds import parse_feed, to_atom, to_rss

ENTRIES = [
    {"title": "First post", "link": "https://ex.com/1",
     "published_ts": 1704103200, "summary": "intro text"},
    {"title": "Second", "link": "https://ex.com/2",
     "published_ts": 1704189600, "summary": "more text"},
]


@pytest.mark.parametrize("writer,dialect", [(to_rss, "rss"), (to_atom, "atom")])
def test_feed_roundtrip(writer, dialect):
    got = parse_feed(writer("My Feed", ENTRIES))
    assert got["dialect"] == dialect
    assert got["feed_title"] == "My Feed"
    assert got["entries"] == ENTRIES


def test_atom_prefers_alternate_link():
    (entry,) = parse_feed(to_atom("f", ENTRIES[:1]))["entries"]
    assert entry["link"] == "https://ex.com/1"  # not the self link


def test_atom_updated_fallback_and_missing_fields():
    xml = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>t</title>'
        "<entry><title>only updated</title>"
        "<updated>2024-06-01T12:00:00Z</updated></entry></feed>"
    )
    (entry,) = parse_feed(xml)["entries"]
    assert entry["published_ts"] == 1717243200
    assert entry["link"] is None and entry["summary"] is None


def test_rss_unparseable_date_is_null():
    xml = (
        "<rss version='2.0'><channel><title>t</title>"
        "<item><title>x</title><pubDate>not a date</pubDate></item>"
        "</channel></rss>"
    )
    (entry,) = parse_feed(xml)["entries"]
    assert entry["published_ts"] is None


def test_quarantine():
    with pytest.raises(ValueError, match="XML parse"):
        parse_feed("<rss><channel>")
    with pytest.raises(ValueError, match="unrecognized root"):
        parse_feed("<html></html>")
    with pytest.raises(ValueError, match="channel"):
        parse_feed("<rss version='2.0'></rss>")


# ------------------------------------------------------------ sitemaps
from wc_vector_indexing_spark.sources.feeds import (  # noqa: E402
    parse_sitemap,
    to_sitemap,
)

SM_ENTRIES = [
    {"loc": "https://ex.com/a", "lastmod_ts": 1704103200,
     "changefreq": "daily", "priority": 0.8},
    {"loc": "https://ex.com/b", "lastmod_ts": None,
     "changefreq": None, "priority": None},
]


def test_sitemap_urlset_roundtrip():
    got = parse_sitemap(to_sitemap(SM_ENTRIES))
    assert got["kind"] == "urlset"
    assert got["entries"] == SM_ENTRIES


def test_sitemap_index_roundtrip():
    idx = [{"loc": "https://ex.com/sitemap1.xml", "lastmod_ts": 1704103200}]
    got = parse_sitemap(to_sitemap(idx, index=True))
    assert got["kind"] == "index"
    assert got["entries"][0]["loc"] == "https://ex.com/sitemap1.xml"
    assert got["entries"][0]["lastmod_ts"] == 1704103200
    assert got["entries"][0]["changefreq"] is None


def test_sitemap_quarantine():
    with pytest.raises(ValueError, match="unrecognized root"):
        parse_sitemap("<rss/>")
    with pytest.raises(ValueError, match="without <loc>"):
        parse_sitemap(
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><lastmod>2024-01-01T00:00:00Z</lastmod></url></urlset>"
        )
