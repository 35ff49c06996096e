"""WAT metadata sidecar: harvest correctness over tag soup, envelope
JSON shape, and link-graph edge explosion."""

from __future__ import annotations

from wc_vector_indexing_spark.sources.warc import read_warc, to_warc_bytes
from wc_vector_indexing_spark.sources.wat import (
    _harvest,
    build_wat,
    link_edges,
    parse_wat_json,
    warc_metadata,
)


# ------------------------------------------------------------ harvest

def test_harvest_title_metas_links():
    title, metas, head_links, links = _harvest(
        "<html><head><title> T </title>"
        '<meta name="description" content="d">'
        '<meta property="og:title" content="ogt">'
        '<meta charset="utf-8">'  # no content -> skipped
        '<link rel="canonical" href="https://c.example/">'
        '</head><body><a href="/a">one</a><a name="anchor">no href</a>'
        '<a href="/b">two <b>bold</b> words</a></body></html>'
    )
    assert title == "T"
    assert metas == [("description", "d"), ("og:title", "ogt")]
    assert head_links == [("canonical", "https://c.example/")]
    assert links == [("/a", "one"), ("/b", "two bold words")]


def test_harvest_tag_soup_and_unclosed_title():
    # unclosed title, stray close tags, nested anchor: never raises
    title, _, _, links = _harvest(
        "<title>Unclosed <body></div><a href='/x'>t1<a href='/y'>t2</a>"
    )
    assert title is not None and title.startswith("Unclosed")
    assert [u for u, _ in links] == ["/x", "/y"]
    # nested-anchor text accrues to both open anchors (soup tolerance)
    assert links[1][1] == "t2"


def test_harvest_empty_page():
    assert _harvest("") == (None, [], [], [])


# ------------------------------------------------------------ Spark passes

def _fixture_df(spark, tmp_path):
    recs = [
        {"url": "https://s.example/0",
         "html": ('<head><title>P0</title>'
                  '<meta name="description" content="zero"></head>'
                  '<body><a href="https://s.example/1">to one</a></body>')},
        {"url": "https://s.example/1",
         "html": "<body>no links here</body>"},
    ]
    p = tmp_path / "wat.warc"
    p.write_bytes(to_warc_bytes(recs, version="1.1"))
    return read_warc(spark, str(p))


def test_warc_metadata_columns(spark, tmp_path):
    rows = {r.url: r for r in warc_metadata(_fixture_df(spark, tmp_path)).collect()}
    r0 = rows["https://s.example/0"]
    assert r0.title == "P0"
    assert [(m.name, m.content) for m in r0.metas] == [("description", "zero")]
    assert [(l.url, l.text) for l in r0.links] == [("https://s.example/1", "to one")]
    r1 = rows["https://s.example/1"]
    assert r1.title is None and r1.links == []


def test_build_wat_envelope(spark, tmp_path):
    row = (build_wat(_fixture_df(spark, tmp_path))
           .filter("url = 'https://s.example/0'").head())
    env = parse_wat_json(row.wat_json)["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "https://s.example/0"
    assert env["WARC-Header-Metadata"]["WARC-Type"] == "response"
    hm = env["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert hm["Response-Message"]["Status"] == 200
    html_md = hm["HTML-Metadata"]
    assert html_md["Head"]["Title"] == "P0"
    assert html_md["Head"]["Metas"] == [{"name": "description", "content": "zero"}]
    assert html_md["Links"] == [{"url": "https://s.example/1", "text": "to one"}]


def test_link_edges_drop_dangling(spark, tmp_path):
    edges = link_edges(_fixture_df(spark, tmp_path)).collect()
    assert [(e.src_url, e.link_no, e.href, e.anchor_text) for e in edges] == [
        ("https://s.example/0", 0, "https://s.example/1", "to one")
    ]


def test_host_link_graph_resolution_rules(spark, tmp_path):
    recs = [
        {"url": "http://a.example/p1",
         "html": ('<a href="https://b.example/x">cross</a>'
                  '<a href="/local">self</a>'
                  '<a href="mailto:z@c.example">drop</a>'
                  '<a href="#frag">drop</a>'
                  '<a href="rel/dot">drop</a>')},
        {"url": "http://a.example/p2",
         "html": '<a href="https://b.example/y">cross</a>'},
    ]
    p = tmp_path / "g.warc"
    p.write_bytes(to_warc_bytes(recs, version="1.1"))
    from wc_vector_indexing_spark.sources.wat import host_link_graph
    got = {(r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
           for r in host_link_graph(read_warc(spark, str(p))).collect()}
    # mailto/fragment/dot-relative dropped; root-relative is a self-edge
    assert got == {("a.example", "b.example"): (2, 2),
                   ("a.example", "a.example"): (1, 1)}


def test_anchor_text_tie_break(spark, tmp_path):
    recs = [{"url": f"http://a.example/p{i}",
             "html": f'<a href="https://t.example/">{w}</a>'}
            for i, w in enumerate(["beta", "alpha", "beta", "alpha"])]
    p = tmp_path / "a.warc"
    p.write_bytes(to_warc_bytes(recs, version="1.1"))
    from wc_vector_indexing_spark.sources.wat import anchor_text_index
    row = anchor_text_index(read_warc(spark, str(p))).head()
    assert (row.target, row.n_refs, row.top_anchor) == (
        "https://t.example/", 4, "alpha")  # 2-2 tie -> lexicographic


def test_parse_wat_json_contract():
    import pytest
    with pytest.raises(ValueError):
        parse_wat_json("{not json")
    with pytest.raises(ValueError):
        parse_wat_json('{"no": "envelope"}')


def test_wat_link_edges_streaming_twin(spark, tmp_path):
    """WAT runs unchanged over the streaming crawl front door: the
    metadata harvest is a stateless Arrow pass, so read_warc_stream →
    link_edges must produce exactly the batch edges over the same
    files (shared parse + harvest code ⇒ a streaming crawl and a
    batch backfill can never disagree on the link graph)."""
    from wc_vector_indexing_spark.sources.warc import (
        read_warc_stream,
        to_warc_bytes,
    )
    from wc_vector_indexing_spark.sources.wat import link_edges

    drop = tmp_path / "crawl"
    drop.mkdir()
    recs = [
        {"url": f"https://s.example/{i}",
         "html": (f'<a href="https://s.example/{(i + 1) % 4}">next {i}</a>'
                  f'<a href="/rel/{i}">rel</a>')}
        for i in range(4)
    ]
    (drop / "d.warc").write_bytes(to_warc_bytes(recs, version="1.1"))

    out_dir = str(tmp_path / "out")
    q = (
        link_edges(read_warc_stream(spark, str(drop)))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    stream_rows = sorted(
        (r.src_url, r.link_no, r.href, r.anchor_text)
        for r in spark.read.parquet(out_dir).collect()
    )
    batch_rows = sorted(
        (r.src_url, r.link_no, r.href, r.anchor_text)
        for r in link_edges(read_warc(spark, str(drop / "d.warc"))).collect()
    )
    assert stream_rows == batch_rows and len(stream_rows) == 8
