"""MediaWiki multistream dump source: wikitext extraction goldens,
writer/reader roundtrip, slice-parallel offset math, and quarantine."""

from __future__ import annotations

import bz2

import pytest

from wc_vector_indexing_spark.sources.wikixml import (
    parse_pages,
    read_wiki_dump,
    read_wiki_pages,
    to_wiki_multistream,
    wikitext_to_text,
)


def _pages(n: int, redirect_every: int = 0) -> list[dict]:
    out = []
    for i in range(n):
        p = {
            "title": f"Doc {i}",
            "ns": 0,
            "page_id": 100 + i,
            "text": f"Body of page {i}.",
            "timestamp": "2024-05-01T00:00:00Z",
        }
        if redirect_every and i % redirect_every == 0:
            p["redirect"] = "Doc 0"
            p["text"] = "#REDIRECT [[Doc 0]]"
        out.append(p)
    return out


# ------------------------------------------------------------ wikitext

GOLDENS = [
    ("== Heading ==\nPlain para.", "Heading\nPlain para."),
    ("{{Infobox|a=1|b={{nested|x}}}}Kept.", "Kept."),
    ("{|\n|cell\n|}\nAfter table.", "After table."),
    ("A [[target|label]] and [[plain]] link.", "A label and plain link."),
    ("[[File:Pic.png|thumb|cap with [[inner]]]]Body.", "Body."),
    ("[[Category:Things]]Tail.", "Tail."),
    ("See [https://example.com the site] and [https://bare.example].",
     "See the site and ."),
    ("'''bold''' and ''italic'' and '''''both'''''.",
     "bold and italic and both."),
    ("* item one\n# item two\n: indented", "item one\nitem two\nindented"),
    ("Before<ref>cite</ref> after<ref name=x/>.", "Before after."),
    ("__TOC__\nReal<!-- hidden -->text.", "Realtext."),
    ("<nowiki>'''kept literally''' {{even this}}</nowiki>",
     "'''kept literally''' {{even this}}"),
    ("Line<br/>break and <span>tagged</span>.", "Line\nbreak and tagged."),
]


@pytest.mark.parametrize("wt,expect", GOLDENS)
def test_wikitext_goldens(wt, expect):
    assert wikitext_to_text(wt) == expect


# ------------------------------------------------------------ writer/parse

def test_parse_pages_roundtrip():
    dump, index = to_wiki_multistream(_pages(5), pages_per_stream=2)
    # manual stream walk mirrors what the reader does
    texts, blob = [], dump
    while blob:
        d = bz2.BZ2Decompressor()
        texts.append(d.decompress(blob).decode("utf-8"))
        blob = d.unused_data
    # streams: header, 2+2+1 pages, closer
    assert len(texts) == 5
    pages = parse_pages("".join(t for t in texts if "<page>" in t))
    assert [p["page_id"] for p in pages] == [100, 101, 102, 103, 104]
    assert pages[0]["title"] == "Doc 0"
    assert pages[0]["wikitext"] == "Body of page 0."
    assert all(p["redirect"] is None for p in pages)


def test_index_offsets_are_stream_starts():
    dump, index = to_wiki_multistream(_pages(6), pages_per_stream=2)
    offsets = sorted({int(line.split(":", 2)[0])
                      for line in index.strip().split("\n")})
    assert len(offsets) == 3  # 6 pages / 2 per stream
    for off in offsets:
        d = bz2.BZ2Decompressor()
        # a slice starting at the index offset decompresses cleanly
        frag = d.decompress(dump[off:]).decode("utf-8")
        assert frag.lstrip().startswith("<page>")


def test_parse_pages_malformed_raises():
    with pytest.raises(ValueError):
        parse_pages("<page><title>x</title>")  # unclosed
    with pytest.raises(ValueError):
        parse_pages("<page><title>x</title><ns>zero</ns><id>1</id></page>")
    with pytest.raises(ValueError):
        parse_pages("<page><ns>0</ns><id>1</id></page>")  # no title


def test_parse_pages_namespace_qualified():
    xml = ('<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/">'
           "<page><title>T</title><ns>0</ns><id>7</id>"
           "<revision><id>70</id><timestamp>t</timestamp>"
           "<text>body</text></revision></page></mediawiki>")
    pages = parse_pages(xml)
    assert pages == [{"redirect": None, "title": "T", "ns": 0, "page_id": 7,
                      "timestamp": "t", "wikitext": "body"}]


# ------------------------------------------------------------ Spark reader

def _write_fixture(tmp_path, pages, pages_per_stream=2):
    dump, index = to_wiki_multistream(pages, pages_per_stream)
    dp = tmp_path / "dump.xml.bz2"
    ip = tmp_path / "index.txt"
    dp.write_bytes(dump)
    ip.write_text(index)
    return str(dp), str(ip)


def test_read_wiki_dump_all_pages(spark, tmp_path):
    dp, ip = _write_fixture(tmp_path, _pages(11, redirect_every=5))
    rows = read_wiki_dump(spark, dp, ip).orderBy("page_id").collect()
    assert [r.page_id for r in rows] == list(range(100, 111))
    assert rows[0].redirect == "Doc 0"
    assert rows[1].redirect is None
    assert rows[1].wikitext == "Body of page 1."
    assert rows[0].timestamp == "2024-05-01T00:00:00Z"


def test_read_wiki_pages_text_and_flags(spark, tmp_path):
    pages = _pages(4)
    pages[2]["text"] = "== H ==\n{{tmpl}}<nowiki>RAW {{x}}</nowiki> tail"
    dp, ip = _write_fixture(tmp_path, pages)
    got = {r.page_id: r for r in read_wiki_pages(spark, dp, ip).collect()}
    assert got[102].text == "H\nRAW {{x}} tail"
    assert not got[102].is_redirect
    assert got[101].text == "Body of page 1."


def test_reader_parallel_slices_match_serial(spark, tmp_path):
    # many small streams: every slice boundary exercised
    dp, ip = _write_fixture(tmp_path, _pages(17), pages_per_stream=1)
    rows = read_wiki_dump(spark, dp, ip).collect()
    assert sorted(r.page_id for r in rows) == list(range(100, 117))


def test_reader_quarantines_corrupt_stream(spark, tmp_path):
    dump, index = to_wiki_multistream(_pages(6), pages_per_stream=2)
    offsets = sorted({int(line.split(":", 2)[0])
                      for line in index.strip().split("\n")})
    # flip bytes INSIDE the middle stream (past its header)
    bad = bytearray(dump)
    mid = offsets[1] + 6
    bad[mid:mid + 4] = b"\xff\xff\xff\xff"
    dp = tmp_path / "dump.xml.bz2"
    ip = tmp_path / "index.txt"
    dp.write_bytes(bytes(bad))
    ip.write_text(index)
    with pytest.raises(Exception):
        read_wiki_dump(spark, str(dp), str(ip), on_error="raise").collect()
    rows = read_wiki_dump(spark, str(dp), str(ip), on_error="skip").collect()
    # the corrupt middle stream's 2 pages quarantine; the rest survive
    assert sorted(r.page_id for r in rows) == [100, 101, 104, 105]


def test_wiki_dump_diff_statuses(spark, tmp_path):
    from wc_vector_indexing_spark.sources.wikixml import (
        read_wiki_dump,
        wiki_dump_diff,
    )

    v1 = _pages(4)
    v2 = [dict(p) for p in v1[1:]]          # page 100 gone
    v2[0]["text"] = "edited"                # 101 changed (body)
    v2[1]["title"] = "Doc 2 moved"          # 102 changed (title only)
    v2.append({"title": "New", "ns": 0, "page_id": 999, "text": "n"})
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    d1, i1 = _write_fixture(tmp_path / "a", v1)
    d2, i2 = _write_fixture(tmp_path / "b", v2)
    got = {r.page_id: (r.title, r.status)
           for r in wiki_dump_diff(read_wiki_dump(spark, d1, i1),
                                   read_wiki_dump(spark, d2, i2)).collect()}
    assert got == {
        100: ("Doc 0", "gone"),
        101: ("Doc 1", "changed"),
        102: ("Doc 2 moved", "changed"),  # digest equal, title moved
        103: ("Doc 3", "unchanged"),
        999: ("New", "new"),
    }


def test_wikitext_links_rules():
    from wc_vector_indexing_spark.sources.wikixml import wikitext_links

    wt = ("[[Plain Target]] [[under_scored|label]] [[Frag#Section|x]] "
          "[[Category:Tax]] [[File:Pic.png|cap]] [[lower first]] "
          "<nowiki>[[Not A Link]]</nowiki> <!-- [[Hidden]] --> [[ ]]")
    assert wikitext_links(wt) == [
        "Plain Target", "Under scored", "Frag", "Lower first"]


def test_wiki_link_edges_spark(spark, tmp_path):
    from wc_vector_indexing_spark.sources.wikixml import (
        read_wiki_dump,
        wiki_link_edges,
    )

    pages = _pages(3)
    pages[0]["text"] = "[[Doc 1]] then [[doc_2|go]]"
    pages[1]["text"] = "no links at all"
    pages[2]["text"] = "[[Doc 0#top]]"
    dp, ip = _write_fixture(tmp_path, pages)
    got = sorted(
        (r.src_title, r.link_no, r.dst_title)
        for r in wiki_link_edges(read_wiki_dump(spark, dp, ip)).collect()
    )
    assert got == [("Doc 0", 0, "Doc 1"), ("Doc 0", 1, "Doc 2"),
                   ("Doc 2", 0, "Doc 0")]
