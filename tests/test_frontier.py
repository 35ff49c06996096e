"""Frontier politeness scheduler: per-host ordering, crawl-delay
spacing, host-affine fetcher assignment."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.frontier import schedule_frontier


def _fetcher(host: str, n: int = 32) -> int:
    return int(hashlib.md5(host.encode()).hexdigest()[:8], 16) % n


def test_schedule_orders_and_spaces(spark):
    frontier = spark.createDataFrame([
        Row(url="https://a.example/1", host="a.example", priority=1.0),
        Row(url="https://a.example/2", host="a.example", priority=9.0),
        Row(url="https://a.example/3", host="a.example", priority=9.0),
        Row(url="https://b.example/1", host="b.example", priority=5.0),
    ])
    politeness = spark.createDataFrame(
        [Row(host="a.example", crawl_delay_s=2.5)])
    got = {r.url: r for r in schedule_frontier(
        frontier, politeness, n_fetchers=8).collect()}
    # priority desc, then url asc: /2 (9.0) before /3 (9.0) before /1
    assert got["https://a.example/2"].slot == 0
    assert got["https://a.example/3"].slot == 1
    assert got["https://a.example/1"].slot == 2
    assert got["https://a.example/1"].scheduled_offset_s == 5.0
    # host absent from politeness uses the default 1.0s delay
    assert got["https://b.example/1"].slot == 0
    assert got["https://b.example/1"].scheduled_offset_s == 0.0
    # host-affine md5 assignment, engine-portable
    for r in got.values():
        assert r.fetcher == _fetcher(r.host, 8)


def test_schedule_without_priority_column(spark):
    frontier = spark.createDataFrame([
        Row(url="https://a.example/z", host="a.example"),
        Row(url="https://a.example/a", host="a.example"),
    ])
    got = {r.url: r.slot for r in schedule_frontier(frontier).collect()}
    assert got == {"https://a.example/a": 0, "https://a.example/z": 1}


def test_recrawl_priority_change_regimes(spark):
    from wc_vector_indexing_spark.operators.frontier import recrawl_priority

    rows = [
        # u1: 3 captures, changes every time (span 2 days)
        Row(url="u1", ts=0.0, digest="a"),
        Row(url="u1", ts=86400.0, digest="b"),
        Row(url="u1", ts=172800.0, digest="c"),
        # u2: 2 captures, never changes
        Row(url="u2", ts=0.0, digest="x"),
        Row(url="u2", ts=86400.0, digest="x"),
        # u3: single capture — no evidence
        Row(url="u3", ts=86400.0, digest="y"),
    ]
    now = 4 * 86400.0
    got = {r.url: r for r in recrawl_priority(
        spark.createDataFrame(rows), now_ts=now).collect()}
    assert got["u1"].n_changes == 2 and got["u1"].change_rate == 1.0
    # 2 days stale x 1 change/day = 2 expected missed changes
    assert got["u1"].priority == 2.0
    assert got["u2"].n_changes == 0 and got["u2"].priority == 0.0
    assert got["u3"].change_rate is None and got["u3"].priority == 0.0
    assert got["u3"].staleness_s == 3 * 86400.0


def test_recrawl_priority_tied_ts_deterministic_and_clamped(spark):
    """Captures sharing a timestamp order by (ts, digest), so n_changes
    replays identically regardless of input row order; a now_ts earlier
    than the last capture clamps staleness (and so priority) at 0
    instead of going negative (ADVICE r12)."""
    from wc_vector_indexing_spark.operators.frontier import recrawl_priority

    rows = [
        Row(url="u1", ts=0.0, digest="b"),
        Row(url="u1", ts=0.0, digest="a"),  # tied ts: a then b by digest
        Row(url="u1", ts=86400.0, digest="b"),
    ]
    for perm in (rows, rows[::-1], [rows[2], rows[0], rows[1]]):
        got = recrawl_priority(
            spark.createDataFrame(perm).repartition(3), now_ts=86400.0
        ).collect()[0]
        # ordered a, b, b -> exactly one change, replayed for every
        # input order and partitioning
        assert got.n_changes == 1, perm
        assert got.staleness_s == 0.0 and got.priority == 0.0
    # now_ts BEFORE the last capture: clamp, don't go negative
    got = recrawl_priority(
        spark.createDataFrame(rows), now_ts=0.0).collect()[0]
    assert got.staleness_s == 0.0 and got.priority == 0.0


def test_schedule_properties(spark):
    """Slots are dense 0..n-1 per host; offsets are slot-monotone and
    exact multiples of the host delay; fetcher is host-constant."""
    import random

    rng = random.Random(7)
    rows = [
        Row(url=f"https://h{rng.randrange(5)}.example/{i}",
            host=None, priority=float(rng.randrange(100)))
        for i in range(200)
    ]
    rows = [Row(url=r.url, host=r.url.split("/")[2], priority=r.priority)
            for r in rows]
    politeness = spark.createDataFrame(
        [Row(host=f"h{i}.example", crawl_delay_s=0.5 * (i + 1))
         for i in range(3)])  # h3/h4 ride the default
    got = schedule_frontier(
        spark.createDataFrame(rows), politeness, n_fetchers=4).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    assert sum(len(v) for v in by_host.values()) == len(rows)
    for host, rs in by_host.items():
        slots = sorted(r.slot for r in rs)
        assert slots == list(range(len(rs)))  # dense
        delay = {"h0.example": 0.5, "h1.example": 1.0,
                 "h2.example": 1.5}.get(host, 1.0)
        for r in rs:
            assert r.scheduled_offset_s == round(r.slot * delay, 3)
        assert len({r.fetcher for r in rs}) == 1  # host-affine
