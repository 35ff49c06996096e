"""robots.txt parsing + crawl allow/deny gate (public RFC 9309): the
curation step every crawl pipeline runs before a page may enter the
corpus — parse each domain's robots.txt into per-agent rule groups,
then decide every URL by the longest-octet-match rule (Allow wins
length ties; no match ⇒ allowed).

Spark shape: robots bodies are a per-domain DIM table (millions of
rows at crawl scale, tiny next to the page corpus), parsed once in an
Arrow map and exploded to (domain, pattern, allow) rules; the page
table broadcast-joins the rules on domain and the wildcard match runs
JVM-side as a LIKE (robots ``*`` ⇒ ``%``, trailing ``$`` ⇒ anchored
pattern, ``%``/``_``/``\\`` escaped), so the 100 TB side never leaves
codegen. Winner selection is one window over (pattern length, allow).

Reference note: the reference engine indexes an authenticated store
and never fetches foreign URLs (SURVEY §1.1); north-star crawl-
curation surface, public spec only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_RULE_KEYS = {"allow": True, "disallow": False}


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """RFC 9309 group selection: rules from every group whose
    user-agent product token equals ``agent`` case-insensitively; when
    none does, the ``*`` groups. Consecutive user-agent lines share one
    group; ``#`` starts a comment; empty-pattern rules are no-ops.
    → [(pattern, allow), ...] in file order."""
    agent = agent.lower()
    exact: list[tuple[str, bool]] = []
    star: list[tuple[str, bool]] = []
    group_agents: list[str] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_run:
                group_agents = []
                in_agent_run = True
            group_agents.append(val.lower())
            continue
        in_agent_run = False
        if key in _RULE_KEYS and val:
            rule = (val, _RULE_KEYS[key])
            if agent in group_agents:
                exact.append(rule)
            if "*" in group_agents:
                star.append(rule)
    return exact if exact else star


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body (RFC 9309 §2.3 /
    sitemaps.org discovery): group-independent per spec — every
    Sitemap line counts no matter which user-agent group surrounds it
    — comments stripped, file order preserved, duplicates kept (the
    URL-frontier dedup downstream owns uniqueness). This is the crawl
    bootstrap edge: robots.txt → sitemap URLs → feed_discovery."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, colon, val = line.partition(":")
        if colon and key.strip().lower() == "sitemap":
            url = val.strip()
            if url:
                out.append(url)
    return out


def rule_matches(path: str, pattern: str) -> bool:
    """Prefix match with ``*`` (any run, incl. empty) and a trailing
    ``$`` end anchor, per RFC 9309 §2.2.3."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    # first part anchors at the path start
    if not path.startswith(parts[0]):
        return False
    if len(parts) == 1:
        # no wildcard: plain prefix, or exact string when anchored
        return len(path) == len(parts[0]) if anchored else True
    pos = len(parts[0])
    for part in parts[1:]:
        if not part:
            continue
        found = path.find(part, pos)
        if found < 0:
            return False
        pos = found + len(part)
    if anchored and parts[-1]:
        # the final literal must sit at the path end; the end
        # occurrence is the rightmost one, so it can't undercut pos
        return path.endswith(parts[-1])
    return True


def robots_decision(
    path: str, rules: list[tuple[str, bool]]
) -> tuple[bool, str | None]:
    """Longest-octet match wins; Allow wins ties; no match ⇒ allowed."""
    best: tuple[int, bool, str] | None = None
    for pattern, allow in rules:
        if rule_matches(path, pattern):
            key = (len(pattern.encode()), allow)
            if best is None or key > (best[0], best[1]):
                best = (key[0], allow, pattern)
    if best is None:
        return True, None
    return best[1], best[2]


def _to_like(pattern: str) -> str:
    """Robots pattern → LIKE pattern (escape char ``\\``): ``*`` ⇒ %,
    trailing ``$`` anchors (no trailing %), everything else literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    body = (
        body.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    ).replace("*", "%")
    return body if anchored else body + "%"


def parse_rules(robots_df: DataFrame, agent: str = "*") -> DataFrame:
    """(domain, robots_txt) → exploded (domain, pattern, like_pattern,
    allow, plen) rule rows via one Arrow map — the dim-side parse."""

    def explode(batches):
        import pandas as pd

        cols = ["domain", "pattern", "like_pattern", "allow", "plen"]
        for pdf in batches:
            out = []
            for domain, text in zip(pdf["domain"], pdf["robots_txt"]):
                for pattern, allow in parse_robots(text or "", agent):
                    out.append({
                        "domain": domain,
                        "pattern": pattern,
                        "like_pattern": _to_like(pattern),
                        "allow": allow,
                        "plen": len(pattern.encode()),
                    })
            yield pd.DataFrame(out, columns=cols)

    return robots_df.mapInPandas(
        explode,
        schema="domain string, pattern string, like_pattern string, "
               "allow boolean, plen long",
    )


def robots_gate(
    pages: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """pages(id, domain, path) × rules → pages + allowed +
    matched_pattern. The rules side joins LEFT with the wildcard LIKE
    in the ON clause (JVM-side), so unmatched pages keep a null-rule
    row and ONE doc-keyed window picks the winner — no second shuffle
    to join winners back (nulls sort last, so the null row only
    survives when nothing matched ⇒ allowed).

    ``broadcast=True`` (default) fits curated rule sets up to the
    usual ~1 GB broadcast ceiling; at full web scale (rules for tens
    of millions of domains) pass False — the join becomes a
    domain-keyed shuffle join and the page table pays one extra
    exchange, which AQE can still skew-split on hot domains."""
    r = rules.select(
        F.col("domain").alias("_rdomain"), "pattern", "like_pattern",
        "allow", "plen",
    )
    if broadcast:
        r = F.broadcast(r)
    matched = pages.join(
        r,
        (F.col("domain") == F.col("_rdomain"))
        & F.expr(r"path LIKE like_pattern ESCAPE '\\'"),
        "left",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc_nulls_last("plen"), F.desc_nulls_last("allow"),
        F.asc_nulls_last("pattern"),
    )
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *pages.columns,
            F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
            F.col("pattern").alias("matched_pattern"),
        )
    )


def parse_crawl_delay(text: str, agent: str = "*") -> float | None:
    """Crawl-delay seconds for ``agent`` — a de-facto extension
    directive outside RFC 9309's rule table (Bing/Yandex-class
    crawlers honor it; RFC 9309 §2.2.4 says unknown records are
    allowed and ignored by rule matching). Group selection mirrors
    :func:`parse_robots`: the matching agent group wins over the ``*``
    group; the FIRST delay in file order wins within a tier;
    non-numeric or negative values are ignored (malformed extension
    records must not poison the gate). None = no directive."""
    agent = agent.lower()
    exact: float | None = None
    star: float | None = None
    group_agents: list[str] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_run:
                group_agents = []
                in_agent_run = True
            group_agents.append(val.lower())
            continue
        in_agent_run = False
        if key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            if d < 0:
                continue
            if agent in group_agents and exact is None:
                exact = d
            if "*" in group_agents and star is None:
                star = d
    return exact if exact is not None else star


def parse_delays(robots_df: DataFrame, agent: str = "*") -> DataFrame:
    """(domain, robots_txt) → (host, crawl_delay_s) rows for hosts
    that declare one — the politeness table
    operators/frontier.schedule_frontier broadcasts. Same dim-side
    Arrow pass shape as :func:`parse_rules`."""

    def explode(batches):
        import pandas as pd

        cols = ["host", "crawl_delay_s"]
        for pdf in batches:
            out = []
            for domain, text in zip(pdf["domain"], pdf["robots_txt"]):
                d = parse_crawl_delay(text or "", agent)
                if d is not None:
                    out.append({"host": domain, "crawl_delay_s": d})
            yield pd.DataFrame(out, columns=cols)

    return robots_df.mapInPandas(
        explode, schema="host string, crawl_delay_s double")
