"""Crawl-frontier politeness scheduler — the stage between URL
discovery (sources/feeds.feed_discovery / the CDX frontier) and the
fetch fleet: order each host's URLs by priority, space them by the
host's robots crawl-delay, and pin every host to ONE fetcher so
politeness is enforceable locally (a host split across fetchers needs
distributed rate-limit coordination; host-affine assignment needs
none — the Mercator/IRLbot frontier design, public literature).

Scale shape (a billion-URL frontier):
  * ONE shuffle: the per-host window (rank within host). Hosts are the
    partition key; the politeness table (host, crawl_delay_s) is
    bounded by the host vocabulary and BROADCASTS.
  * Priority joins (e.g. host PageRank from sources/wat +
    operators/graph) are also host-keyed broadcasts.
  * Fetcher assignment is a pure hash — deterministic, no coordination,
    stable across runs for the same fleet size.
  * Zipf skew: a mega-host's URLs land in one window partition. That is
    INTENT, not accident — its schedule is serialized by crawl-delay
    anyway, so parallelizing it buys nothing; every other host rides in
    parallel.

Reference analogue: the reference's sync scheduler orders per-site
work into a priority queue (class-scheduler.php J7 candidate union);
this is that contract restated for a polite crawl frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_priority(
    captures: DataFrame,
    now_ts: float,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """(url, n_obs, n_changes, change_rate, staleness_s, priority):
    per-URL re-crawl priority from capture history — the
    change-frequency estimation a frontier uses to decide WHAT to
    re-fetch (Cho & Garcia-Molina's refresh-scheduling line of work,
    public literature; feeds :func:`schedule_frontier`'s priority).

      n_changes   — observed content changes: captures whose digest
                    differs from the PREVIOUS capture's (one window
                    lag per url, ordered by ts).
      change_rate — n_changes / observed span in days (NULL when a
                    url has a single capture: no evidence).
      staleness_s — now_ts - last capture ts.
      priority    — change_rate * staleness in days: the expected
                    number of missed changes, the natural refresh
                    ordering (NULL-evidence urls get 0.0 — new/unknown
                    urls are scheduled by discovery, not refresh).

    ``now_ts`` is an explicit epoch-seconds parameter, never wall
    clock: schedules must be deterministic and replayable. To keep
    them so, the per-url window orders by (ts, digest) — captures
    sharing a timestamp would otherwise make lag(digest) run-order
    dependent — and staleness clamps at 0 when ``now_ts`` predates the
    last capture (a replay against a newer history must not produce
    negative priorities). ONE window shuffle on url + one aggregate on
    the same key (no second exchange — the agg reuses the window's
    partitioning)."""
    obs = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn(
        "changed",
        (F.col("digest") != F.lag("digest").over(
            Window.partitionBy("url").orderBy("ts", "digest"))).cast("int"),
    )
    per_url = obs.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.coalesce(F.sum("changed"), F.lit(0)).alias("n_changes"),
        (F.max("ts") - F.min("ts")).alias("span_s"),
        F.max("ts").alias("last_ts"),
    )
    day = 86400.0
    rate = F.when(
        F.col("span_s") > 0,
        F.col("n_changes") / (F.col("span_s") / day))
    staleness = F.greatest(
        F.lit(float(now_ts)) - F.col("last_ts"), F.lit(0.0))
    return per_url.select(
        "url",
        "n_obs",
        F.col("n_changes").cast("long").alias("n_changes"),
        F.round(rate, 6).alias("change_rate"),
        F.round(staleness, 3).alias("staleness_s"),
        F.round(
            F.coalesce(rate * (staleness / day), F.lit(0.0)), 6
        ).alias("priority"),
    )


def schedule_frontier(
    frontier: DataFrame,
    politeness: DataFrame | None = None,
    n_fetchers: int = 32,
    default_delay_s: float = 1.0,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str | None = "priority",
) -> DataFrame:
    """(url, host, slot, scheduled_offset_s, fetcher): the polite fetch
    plan for ``frontier``.

      slot               — 0-based rank of the URL within its host:
                           priority DESC (when ``priority_col`` is
                           given), then url ASC for a total, stable
                           order.
      scheduled_offset_s — slot * the host's crawl delay (from
                           ``politeness``: (host, crawl_delay_s) rows;
                           hosts absent there use ``default_delay_s``).
      fetcher            — md5(host) first-8-hex % n_fetchers:
                           host-affine, so one fetcher owns a host's
                           whole schedule and the crawl-delay contract
                           needs no cross-worker coordination; md5 (not
                           a JVM-private hash) so the assignment is
                           engine-portable and replayable.
    """
    order = (
        [F.col(priority_col).desc(), F.col(url_col).asc()]
        if priority_col is not None and priority_col in frontier.columns
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy(host_col).orderBy(*order)
    out = frontier.withColumn("slot", F.row_number().over(w) - 1)
    if politeness is not None:
        pol = politeness.select(
            F.col(host_col).alias("_pol_host"),
            F.col("crawl_delay_s").cast("double").alias("_delay"),
        )
        out = out.join(
            F.broadcast(pol), out[host_col] == pol["_pol_host"], "left"
        ).drop("_pol_host")
    else:
        out = out.withColumn("_delay", F.lit(None).cast("double"))
    delay = F.coalesce(F.col("_delay"), F.lit(float(default_delay_s)))
    return (
        out.withColumn(
            "scheduled_offset_s", F.round(F.col("slot") * delay, 3))
        .withColumn(
            "fetcher",
            (F.conv(F.substring(F.md5(F.col(host_col).cast("string")),
                                1, 8), 16, 10).cast("long")
             % F.lit(int(n_fetchers))).cast("int"))
        .select(url_col, host_col, "slot", "scheduled_offset_s", "fetcher")
    )
