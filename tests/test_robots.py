"""robots.txt gate (operators/robots.py): RFC 9309 semantics — group
selection, wildcard/anchor matching, longest-octet-match with
allow-wins ties — plus the distributed broadcast-LIKE gate agreeing
with the pure-Python decision on every planted case."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.robots import (
    _to_like,
    parse_robots,
    parse_rules,
    robots_decision,
    robots_gate,
    rule_matches,
)

ROBOTS = """\
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok/

User-agent: goodbot
User-agent: otherbot
Disallow: /beta/
Allow: /

User-agent: badbot
Disallow: /
"""


# ------------------------------------------------------------ parsing
def test_group_selection_star_fallback():
    assert parse_robots(ROBOTS, "unknownbot") == [
        ("/private/", False), ("/private/ok/", True),
    ]


def test_group_selection_exact_beats_star():
    assert parse_robots(ROBOTS, "GoodBot") == [("/beta/", False), ("/", True)]
    assert parse_robots(ROBOTS, "badbot") == [("/", False)]


def test_shared_agent_run_and_comments():
    # two consecutive user-agent lines share one rule block
    assert parse_robots(ROBOTS, "otherbot") == [("/beta/", False), ("/", True)]
    # comment-only and empty-value lines are no-ops
    assert parse_robots("# nothing\nUser-agent: *\nDisallow:\n") == []


def test_empty_robots_allows_everything():
    assert parse_robots("") == []
    assert robots_decision("/anything", []) == (True, None)


# ----------------------------------------------------------- matching
@pytest.mark.parametrize(
    "path,pattern,expect",
    [
        ("/docs/page", "/docs/", True),          # prefix
        ("/docs", "/docs/", False),
        ("/a/b.html", "/*.html$", True),         # wildcard + anchor
        ("/a/b.html?x=1", "/*.html$", False),
        ("/a/b.htmlx", "/*.html", True),         # unanchored wildcard
        ("/fish/salmon", "/fish*", True),
        ("/Fish", "/fish", False),               # case-sensitive paths
        ("/x/yz", "/x/yz$", True),               # anchored exact
        ("/x/yz/", "/x/yz$", False),
        ("/ab", "/a**b", True),                  # collapsed double star
        ("/a-middle-b-end-b", "/a*b$", True),    # end occurrence wins
        ("/abc", "/a*b*c$", True),
        ("/acb", "/a*b*c$", False),
    ],
)
def test_rule_matches(path, pattern, expect):
    assert rule_matches(path, pattern) is expect


def test_decision_longest_match_and_allow_tie():
    rules = [("/private/", False), ("/private/ok/", True)]
    assert robots_decision("/private/x", rules) == (False, "/private/")
    assert robots_decision("/private/ok/y", rules) == (True, "/private/ok/")
    assert robots_decision("/public", rules) == (True, None)
    # equal-length allow and disallow: allow wins (RFC 9309 §2.2.2)
    tie = [("/page", False), ("/page", True)]
    assert robots_decision("/page1", tie) == (True, "/page")


def test_to_like_conversion():
    assert _to_like("/docs/") == "/docs/%"
    assert _to_like("/*.html$") == "/%.html"
    assert _to_like("/a*b") == "/a%b%"
    assert _to_like("/50%_off") == r"/50\%\_off%"


# -------------------------------------------------------- distributed
def test_gate_agrees_with_python_decision(spark):
    robots_rows = [
        ("a.com", ROBOTS),
        ("b.com", "User-agent: *\nDisallow: /*.pdf$\n"),
        ("c.com", ""),  # no rules → everything allowed
    ]
    paths = [
        "/private/x", "/private/ok/x", "/public", "/doc.pdf",
        "/doc.pdfx", "/a/deep/doc.pdf", "/",
    ]
    pages = [
        (i * 10 + j, dom, p)
        for j, (dom, _) in enumerate(robots_rows)
        for i, p in enumerate(paths)
    ]
    pages_df = spark.createDataFrame(pages, "doc_id long, domain string, path string")
    rules_df = parse_rules(
        spark.createDataFrame(robots_rows, "domain string, robots_txt string")
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_pattern"])
        for r in robots_gate(pages_df, rules_df).collect()
    }
    by_domain = {dom: parse_robots(txt) for dom, txt in robots_rows}
    for doc_id, dom, p in pages:
        assert got[doc_id] == robots_decision(p, by_domain[dom]), (dom, p)


def test_gate_plan_broadcasts_rules(spark):
    pages_df = spark.createDataFrame(
        [(1, "a.com", "/x")], "doc_id long, domain string, path string"
    )
    rules_df = parse_rules(
        spark.createDataFrame([("a.com", ROBOTS)], "domain string, robots_txt string")
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        robots_gate(pages_df, rules_df).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # one broadcast join, one window
    assert "CartesianProduct" not in plan


def test_gate_shuffle_mode_matches_broadcast_mode(spark):
    """broadcast=False (web-scale rules) must produce identical
    decisions through the shuffle-join plan."""
    robots_rows = [("a.com", ROBOTS), ("b.com", "User-agent: *\nDisallow: /*.pdf$\n")]
    pages = [(i, dom, p) for i, (dom, p) in enumerate(
        (d, p) for d, _ in robots_rows
        for p in ["/private/x", "/private/ok/x", "/doc.pdf", "/ok"]
    )]
    pages_df = spark.createDataFrame(pages, "doc_id long, domain string, path string")
    rules_df = parse_rules(
        spark.createDataFrame(robots_rows, "domain string, robots_txt string")
    )
    a = {r["doc_id"]: (r["allowed"], r["matched_pattern"])
         for r in robots_gate(pages_df, rules_df, broadcast=True).collect()}
    b = {r["doc_id"]: (r["allowed"], r["matched_pattern"])
         for r in robots_gate(pages_df, rules_df, broadcast=False).collect()}
    assert a == b


def test_sitemap_directives_are_group_independent():
    from wc_vector_indexing_spark.operators.robots import (
        parse_robots_sitemaps,
    )

    txt = (
        "Sitemap: https://a.example/sitemap.xml\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "Sitemap: https://a.example/news.xml  # comment\n"
        "User-agent: *\n"
        "Allow: /\n"
        "sitemap: https://a.example/sitemap.xml\n"
    )
    assert parse_robots_sitemaps(txt) == [
        "https://a.example/sitemap.xml",
        "https://a.example/news.xml",
        "https://a.example/sitemap.xml",  # dedup is the frontier's job
    ]
    assert parse_robots_sitemaps("User-agent: *\nDisallow:\n") == []


def test_parse_crawl_delay_groups_and_malformed():
    from wc_vector_indexing_spark.operators.robots import parse_crawl_delay

    t = (
        "User-agent: bingbot\nCrawl-delay: 2.5\n"
        "User-agent: *\nDisallow: /x\nCrawl-delay: 1\nCrawl-delay: 9\n"
        "User-agent: greedy\nCrawl-delay: -3\n"
    )
    assert parse_crawl_delay(t) == 1.0            # first star delay wins
    assert parse_crawl_delay(t, "BingBot") == 2.5  # case-insensitive agent
    assert parse_crawl_delay(t, "greedy") == 1.0   # negative ignored -> *
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert parse_crawl_delay("User-agent: *\nDisallow: /\n") is None


def test_parse_delays_dataframe(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.operators.robots import parse_delays

    df = spark.createDataFrame([
        Row(domain="a.example",
            robots_txt="User-agent: *\nCrawl-delay: 0.5\n"),
        Row(domain="b.example", robots_txt="User-agent: *\nDisallow: /\n"),
        Row(domain="c.example", robots_txt=None),
    ])
    got = {r.host: r.crawl_delay_s for r in parse_delays(df).collect()}
    assert got == {"a.example": 0.5}
