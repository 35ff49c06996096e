"""Per-query profiler for the optimization rounds (guide §1: measure
first).

Usage:
    python tools/profile_queries.py [sf_dir] q1 q2 ...   # time + breakdown
    python tools/profile_queries.py [sf_dir] --explain q1 q2 ...

For each named query: runs the same warm-ups as bench.py, then times
fn-construction and the noop-sink write separately (eager-summary
entries do their work during construction), N repeats, and — with the
event log enabled — prints a per-job breakdown (description, duration)
so the expensive sub-stages of a composition are visible without the UI.

--explain writes `.explain("formatted")` for the query (its audit_fn
when one exists — the lazy program of an eager summary) to
plans/r13/<name>_<tag>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wc_vector_indexing_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    warm_build_artifacts,
)
from wc_vector_indexing_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def warm(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(1000).select(_warm("id")).count()
    warm_df = spark.range(1000).withColumn("g", F.col("id") % 32)
    warm_df.groupBy("g").applyInPandas(lambda pdf: pdf, "id long, g long").count()
    warm_df.mapInPandas(lambda it: it, "id long, g long").count()
    import pkgutil

    import wc_vector_indexing_spark.operators as _ops
    import wc_vector_indexing_spark.sources as _srcs

    mods = [
        f"{pkg.__name__}.{m.name}"
        for pkg in (_ops, _srcs)
        for m in pkgutil.iter_modules(pkg.__path__)
    ]

    def _pre(it):
        import importlib

        for name in mods:
            importlib.import_module(name)
        yield from it

    spark.range(256).repartition(64).mapInPandas(_pre, "id long").count()
    warm_build_artifacts(spark, sf_dir)


def job_breakdown(app_id: str) -> list[tuple[float, str]]:
    """(seconds, description) per job from the event log, slowest first."""
    cand = [p for p in os.listdir(EVDIR) if app_id in p]
    if not cand:
        return []
    path = os.path.join(EVDIR, cand[0])
    files = [path]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    starts: dict[int, tuple[float, str]] = {}
    jobs: list[tuple[float, str, int]] = []
    for f in files:
        _parse_events(f, starts, jobs)
    return [(d, f"job {j}: {desc}") for d, desc, j in jobs]


def _parse_events(path, starts, jobs):
    import io

    if path.endswith(".zstd"):
        try:
            import zstandard

            fh = io.TextIOWrapper(
                zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
            )
        except ImportError:
            # fall back to the engine's own pure-python decoder
            from wc_vector_indexing_spark.operators.zstd_decode import (
                zstd_decompress,
            )

            fh = io.StringIO(
                zstd_decompress(open(path, "rb").read()).decode()
            )
    else:
        fh = open(path)
    with fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                ) or ev.get("Properties", {}).get("callSite.short", "")
                starts[ev["Job ID"]] = (ev["Submission Time"], desc)
            elif ev.get("Event") == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in starts:
                    t0, desc = starts.pop(jid)
                    jobs.append(
                        ((ev["Completion Time"] - t0) / 1000.0, desc, jid)
                    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    explain = False
    tag = "before"
    if "--explain" in args:
        explain = True
        args.remove("--explain")
    for a in list(args):
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
            args.remove(a)
    repeats = int(os.environ.get("PROFILE_REPEATS", "3"))
    names = args or list(REGISTRY)

    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark, sf_dir)
    sc = spark.sparkContext

    if explain:
        outdir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
            "PROFILE_PLANS_DIR", "r14")
        outdir.mkdir(parents=True, exist_ok=True)
        for name in names:
            spec = REGISTRY[name]
            fn = spec.audit_fn or spec.fn
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            p = outdir / f"{name}_{tag}.txt"
            p.write_text(txt)
            print(f"wrote {p} ({len(txt)} chars)")
        spark.stop()
        return

    for name in names:
        spec = REGISTRY[name]
        results = []
        for i in range(repeats):
            sc.setJobDescription(f"{name}::construct[{i}]")
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            t1 = time.time()
            sc.setJobDescription(f"{name}::noop[{i}]")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            sc.setJobDescription(None)
            results.append((t1 - t0, t2 - t1))
        con = min(r[0] for r in results)
        wr = min(r[1] for r in results)
        print(
            f"{name}: construct={con:.2f}s noop={wr:.2f}s total_min={con + wr:.2f}s"
            f"  (all: {[f'{a + b:.2f}' for a, b in results]})"
        )
    app_id = sc.applicationId
    spark.stop()
    time.sleep(1)
    jobs = job_breakdown(app_id)
    if jobs:
        print("\n-- slowest jobs --")
        for d, desc in sorted(jobs, reverse=True)[:40]:
            print(f"{d:7.2f}s  {desc}")
        bydesc: dict[str, float] = {}
        for d, desc in jobs:
            key = desc.split("::")[0] if "::" in desc else desc
            bydesc[key] = bydesc.get(key, 0.0) + d
        print("\n-- job time by description prefix --")
        for k, v in sorted(bydesc.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{v:7.2f}s  {k}")


if __name__ == "__main__":
    main()
