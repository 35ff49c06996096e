"""Skewed-corpus bench: proves SCALE.md's skew reasoning with numbers.

Generates a deliberately hostile variant of the sf0.1 corpus —

  * zipfian ``source`` distribution (one source holds ~80% of docs:
    stresses any per-source groupBy),
  * a corpus-wide boilerplate sentence appended to 60% of docs (one
    shingle/n-gram with df ≈ 0.6·N: the posting-list blowup case the
    max_df cap exists for),
  * one hot line duplicated into 70% of docs (line_dedup's worst key),
  * a mega-document ~300k chars (single-row straggler for every
    Arrow/text stage),
  * a hot embedding cluster: 10% of vectors near-identical (one LSH
    bucket / cosine block holds 10% of the index)

— then times the dedup, temporal, and lang-keyed-gate catalog queries on the uniform and the
skewed corpus and writes ``BENCH_SKEW.json`` with per-query ratios.
Acceptance bar (SCALE.md): no query >3× its uniform-data time.

Usage: python tools/skew_bench.py [--regen]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from wc_vector_indexing_spark.plans.queries import REGISTRY  # noqa: E402
from wc_vector_indexing_spark.session import get_spark  # noqa: E402

UNIFORM = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKEWED = "/tmp/wcvi_skew_sf0.1"

GATE_QUERIES = [
    # lang-keyed window/tercile ops: stressed by the 80%-one-language skew
    "percentile_quality",
    "ccnet_buckets",
    "temperature_mix",
]

TEMPORAL_QUERIES = [
    "sessionize_events",
    "session_window_events",
    "t9_windowed_events",
    "funnel_stages",
    "event_pagerank",
    "asof_click_attribution",
    "range_join_clicks",
]

DEDUP_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "semdedup_embeddings",
    "line_dedup",
    "doc_fingerprint",
    "winnow_fingerprint",
]

# Fixture-keyed entries (r9, r8-verdict item 5): these ops derive
# their planted inputs from doc_id arithmetic, so corpus skew can't
# reach them — the hostile case is planted through op kwargs instead
# (one mega-domain / mega-mailbox / mega-feed / hot fingerprint
# pattern / mega-footer). {name: (fn attr, uniform kwargs, skew kwargs)}
FIXTURE_SKEW = {
    "robots_txt_gate": ("robots_txt_gate_op", {}, {"hot_domain": True}),
    "mbox_corpus_text": ("mbox_corpus_text_op", {}, {"mega_msgs": 2000}),
    "feed_entries": ("feed_entries_op", {}, {"mega_entries": 3000}),
    "feed_discovery": ("feed_discovery_op", {}, {"mega_entries": 3000}),
    "audio_dedup_mp3": ("audio_dedup_mp3_op", {}, {"hot_pattern": True}),
    "parquet_footer_census": (
        "parquet_footer_census_op", {}, {"mega_rows": 20000}),
    # whole archive collapses onto ONE payload digest: the response
    # side rides the max_digest_candidates newest-N cap and every
    # revisit's as-of window ranks N candidates instead of ~1
    "warc_revisit_resolve": (
        "warc_revisit_resolve_op", {}, {"hot_digest": True}),
}

BOILER = (
    " This content is provided as is without any warranty of any kind"
    " either express or implied including fitness for purpose."
)
HOT_LINE = "All rights reserved by the original publisher of this work."


def generate(spark, uniform: str = UNIFORM, skewed: str = SKEWED) -> None:
    """Deterministic skewed twin of a uniform corpus (seeded hashes,
    no RNG): same row counts, hostile distributions. Parameterized so
    tools/bench_sf1.py --skew can build a skewed sf1 twin too."""
    if os.path.exists(skewed):
        shutil.rmtree(skewed)
    os.makedirs(skewed)
    # tables not skewed below: link them
    for f in os.listdir(uniform):
        if f not in ("documents.parquet", "embeddings.parquet", "events.parquet"):
            os.symlink(os.path.join(uniform, f), os.path.join(skewed, f))

    # mega-user event skew: 50% of all events re-keyed to ONE user —
    # the hostile case for every user-keyed window (sessionize, funnel,
    # as-of union, range-join buckets) and the transition-edge extract
    ev = spark.read.parquet(f"{uniform}/events.parquet")
    evh = F.abs(F.xxhash64("event_id"))
    skew_ev = ev.withColumn(
        "user_id",
        F.when(evh % 2 == 0, F.lit(424242)).otherwise(F.col("user_id")),
    )
    skew_ev.coalesce(4).write.mode("overwrite").parquet(f"{skewed}/events.parquet")

    docs = spark.read.parquet(f"{uniform}/documents.parquet")
    h = F.abs(F.xxhash64("doc_id"))
    # zipf-ish: 80% src_hot, then a tail of the original sources
    source = (
        F.when(h % 100 < 80, F.lit("src_hot"))
        .otherwise(F.concat(F.lit("src_tail_"), (h % 7).cast("string")))
    )
    # 80% one language: the hostile case for any lang-partitioned
    # window (percentile gate's exact ranked form = one reducer per
    # language; CCNet terciles likewise)
    lang = F.when(h % 100 < 80, F.lit("en")).otherwise(F.col("lang"))
    # 60% of docs share one boilerplate sentence; 70% share one hot line
    text = F.col("text")
    text = F.when(h % 10 < 6, F.concat(text, F.lit(BOILER))).otherwise(text)
    text = F.when(h % 10 < 7, F.concat(text, F.lit("\n" + HOT_LINE))).otherwise(text)
    # one mega-document: doc_id 0 repeated to ~300k chars
    mega = F.repeat(F.concat(F.col("text"), F.lit(" ")), 1000)
    text = F.when(F.col("doc_id") == 0, mega).otherwise(text)
    skew_docs = docs.select(
        "doc_id",
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).alias("n_chars"),
    )
    skew_docs.coalesce(4).write.mode("overwrite").parquet(f"{skewed}/documents.parquet")

    emb = spark.read.parquet(f"{uniform}/embeddings.parquet")
    eh = F.abs(F.xxhash64("vec_id"))
    # 10% of vectors collapse onto (almost) one point: a hot LSH bucket
    # and a hot cosine block. Tiny per-id jitter keeps them distinct.
    jitter = (eh % 997).cast("double") / 1e7
    hot_vec = F.transform(
        F.sequence(F.lit(1), F.size("embedding")),
        lambda i: (F.lit(0.1) * i.cast("double") + jitter).cast("float"),
    )
    skew_emb = emb.select(
        "vec_id",
        F.when(eh % 10 == 0, hot_vec).otherwise(F.col("embedding")).alias("embedding"),
        "label",
    )
    skew_emb.coalesce(4).write.mode("overwrite").parquet(f"{skewed}/embeddings.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    # best-of-two, same as bench.py: single-pass numbers on this shared
    # host carry >2x cold-start noise, which once produced a spurious
    # 3.7x "skew regression" that steady-state runs showed was actually
    # FASTER on the skewed corpus
    times: dict[str, float] = {}
    for name in DEDUP_QUERIES + TEMPORAL_QUERIES + GATE_QUERIES:
        best = -1.0
        for _ in range(2):
            t0 = time.time()
            try:
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                took = round(time.time() - t0, 3)
                best = took if best < 0 else min(best, took)
            except Exception as e:  # noqa: BLE001
                print(f"skew bench error in {name} @ {sf_dir}: {e}", file=sys.stderr)
                best = -1.0
                break
        times[name] = best
    return times


def main() -> None:
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    if "--regen" in sys.argv or not os.path.exists(SKEWED):
        generate(spark)
    # warm python workers so spin-up isn't billed to the first query
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    uniform = time_queries(spark, UNIFORM)
    skewed = time_queries(spark, SKEWED)

    # fixture-keyed skew: same corpus, hostile op kwargs
    import wc_vector_indexing_spark.plans.queries as Q

    fixture_report = {}
    for name, (fn_name, base_kw, skew_kw) in FIXTURE_SKEW.items():
        fn = getattr(Q, fn_name)
        times = {}
        for kw, key in ((base_kw, "uniform_sec"), (skew_kw, "skewed_sec")):
            best = -1.0
            for _ in range(2):
                t0 = time.time()
                try:
                    fn(spark, UNIFORM, **kw).write.format("noop").mode(
                        "overwrite").save()
                    took = round(time.time() - t0, 3)
                    best = took if best < 0 else min(best, took)
                except Exception as e:  # noqa: BLE001
                    print(f"fixture skew error in {name} {kw}: {e}",
                          file=sys.stderr)
                    best = -1.0
                    break
            times[key] = best
        times["ratio"] = (
            round(times["skewed_sec"] / times["uniform_sec"], 2)
            if times["uniform_sec"] > 0 and times["skewed_sec"] > 0
            else None
        )
        times["skew_kwargs"] = skew_kw
        fixture_report[name] = times

    report = {
        name: {
            "uniform_sec": uniform[name],
            "skewed_sec": skewed[name],
            "ratio": (
                round(skewed[name] / uniform[name], 2)
                if uniform[name] > 0 and skewed[name] > 0
                else None
            ),
        }
        for name in DEDUP_QUERIES + TEMPORAL_QUERIES + GATE_QUERIES
    }
    worst = max((r["ratio"] or 0) for r in report.values())
    worst_fixture = max((r["ratio"] or 0) for r in fixture_report.values())
    out = {
        "sf": 0.1,
        "skew": "zipf-source-80pct + lang-80pct-en + boilerplate-df0.6 + hotline-0.7 + megadoc-300k + hot-embedding-10pct + megauser-50pct-events",
        "queries": report,
        "worst_ratio": worst,
        "fixture_skew": fixture_report,
        "worst_fixture_ratio": worst_fixture,
        "fixture_note": (
            "fixture-keyed ops: hostile planting via op kwargs (mega "
            "domain/mailbox/feed/footer, hot fingerprint pattern); "
            "skewed runs do MORE work by construction, so ratios are "
            "adjudicated per-query in SCALE.md, not against the 3x bar"
        ),
        "bar": "no corpus-skew query > 3x uniform",
        "pass": worst <= 3.0 and all(r["skewed_sec"] > 0 for r in report.values())
        and all(r["skewed_sec"] > 0 for r in fixture_report.values()),
    }
    with open(Path(__file__).resolve().parent.parent / "BENCH_SKEW.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"worst_ratio": worst, "pass": out["pass"]}))


if __name__ == "__main__":
    main()
