"""Scaling-curvature benchmark (r5 verdict item 5): run the most
expensive catalog queries at sf0.1 and at a synthesized sf1
(tools/make_sfN.py, 10x data) and record the wall-time ratio. A
linear-ish operator lands at ratio ≤ ~12 for 10x data on the same
local[32] box (some superlinearity is expected from reduced cache
locality + spill pressure); anything well past that is flagged — it
means the plan's asymptotics, not the constant, moved.

Usage: python tools/bench_sf1.py [--queries n1,n2,...|--full]
Writes BENCH_SF1.json at the repo root. ``--full`` (r7 verdict task 6)
rehearses the ENTIRE catalog at sf1 — every registry query once at
each scale (sf0.1 best-of-2), media family via MEDIA_SCALE kwargs —
and records it under a ``full_catalog`` section alongside the curated
``queries`` section.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from wc_vector_indexing_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    warm_build_artifacts,
)
from wc_vector_indexing_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/wcvi_sf1"

# the heavy tail of BENCH_DETAIL (r6): the queries whose asymptotics
# matter most, spanning the pipeline/dedup/retrieval/TPC-H families
DEFAULT_QUERIES = [
    "training_data_pipeline",
    "curation_pipeline",
    "matryoshka_recall",
    "ivf_recall_curve",
    "dedup_survivors",
    "fuzzy_self_join",
    "dedup_minhash_lsh",
    "q21_waiting_suppliers",
    "exact_substring_removal",
    "tokenizer_eval_bpe",
    "q1_pricing_summary",  # the canonical scan-agg control: should be ~10x flat
    "bm25_search",
    "html_main_text",  # crawl front door: scales with the documents table
]

# The media-dedup registry queries cap their planted-truth inputs at a
# fixed blob count (the oracle must enumerate the exact pair set), so
# running them verbatim at sf1 measures nothing. Their ops take
# n/patterns kwargs instead: 10x the blobs with 10x the pattern space
# (constant dup-group size) is the honest 10x point — decode + blocked
# join volume grows 10x while the workload shape stays fixed.
# (audio: the 17-band filterbank bounds distinct tone-pair patterns at
# C(17,2)=136, so both scales use enumerate_pairs with group size 8.)
MEDIA_SCALE = {
    "image_dedup_dhash": (
        "image_dedup_op",
        {"n": 128, "patterns": 32},
        {"n": 1280, "patterns": 320},
    ),
    "audio_dedup_fp": (
        "audio_dedup_op",
        {"n": 96, "patterns": 12, "enumerate_pairs": True},
        {"n": 960, "patterns": 120, "enumerate_pairs": True},
    ),
    "video_dedup_remux": (
        "video_dedup_op",
        {"n": 48, "patterns": 12},
        {"n": 480, "patterns": 120},
    ),
    # registered after the r9 181-entry rehearsal; its 13-shuffle plan
    # is the heaviest in the catalog, so it scales through the same
    # kwargs path (10x blobs, 10x pattern space, constant group size)
    "video_dedup_requant": (
        "video_dedup_requant_op",
        {"n": 48, "patterns": 12},
        {"n": 480, "patterns": 120},
    ),
}

RATIO_BAR = 14.0  # 10x data + cache/spill slack

# r9 (r8-verdict item 6): the five worst-curvature queries from the r8
# full-catalog rehearsal, re-measured with the data both 10x AND
# hostile (tools/skew_bench.generate twin of each scale; the two
# fixture-keyed ones additionally carry their skew-suite kwargs so the
# straggler rides along while the corpus scales).
SKEW_CURVATURE_QUERIES = {
    "dedup_embedding_lsh": {},
    "training_triplets": {},
    "lexical_diversity": {},
    "parquet_footer_census": {"mega_rows": 20000},
    "mbox_corpus_text": {"mega_msgs": 2000},
}
SKEW01 = "/tmp/wcvi_skew_sf0.1"
SKEW1 = "/tmp/wcvi_skew_sf1"


def run_skew() -> None:
    """sf1 x skew rehearsal: time SKEW_CURVATURE_QUERIES on skewed
    twins of sf0.1 and sf1, append a ``skewed_curvature`` section to
    BENCH_SF1.json (preserving the existing full-catalog content)."""
    import os

    if not Path(SF1).is_dir():
        raise SystemExit(f"{SF1} missing — run tools/make_sfN.py first")
    from tools.skew_bench import generate

    import wc_vector_indexing_spark.plans.queries as Q

    spark = get_spark("bench-sf1-skew")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(SKEW01):
        generate(spark, SF01, SKEW01)
    if not os.path.exists(SKEW1):
        generate(spark, SF1, SKEW1)
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    results: dict[str, dict] = {}
    for sf_dir, key in ((SKEW01, "t_skew0.1"), (SKEW1, "t_skew1")):
        warm_build_artifacts(spark, sf_dir)
        for name, kw in SKEW_CURVATURE_QUERIES.items():
            fn = Q.REGISTRY[name].fn  # ops accept their skew kwargs directly
            best = None
            try:
                for _ in range(2 if sf_dir == SKEW01 else 1):
                    t0 = time.time()
                    fn(spark, sf_dir, **kw).write.format("noop").mode(
                        "overwrite").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as e:  # noqa: BLE001
                print(f"{name} @ {sf_dir}: ERROR {e}", file=sys.stderr)
                results.setdefault(name, {})[key] = -1.0
                continue
            results.setdefault(name, {})[key] = round(best, 3)
            print(f"{name} @ {sf_dir}: {best:.2f}s", file=sys.stderr)
    flagged, errored = [], []
    for name, r in results.items():
        if r.get("t_skew1", -1.0) < 0 or r.get("t_skew0.1", -1.0) < 0:
            r["ratio"] = None
            r["superlinear"] = True
            errored.append(name)
            flagged.append(name)
            continue
        r["ratio"] = round(r["t_skew1"] / max(r["t_skew0.1"], 1e-3), 2)
        r["superlinear"] = r["ratio"] > RATIO_BAR
        if r["superlinear"]:
            flagged.append(name)
        r["fixture_kwargs"] = SKEW_CURVATURE_QUERIES[name]
    path = ROOT / "BENCH_SF1.json"
    artifact = json.loads(path.read_text()) if path.exists() else {}
    artifact["skewed_curvature"] = {
        "queries": results,
        "flagged_superlinear": flagged,
        "errored": errored,
        "note": (
            "worst-curvature five from the r8 full-catalog rehearsal, "
            "data 10x AND hostile (skew_bench.generate twins; fixture-"
            "keyed ops carry their mega-straggler kwargs at both scales)"
        ),
    }
    path.write_text(json.dumps(artifact, indent=1))
    print(json.dumps({"skew_flagged": flagged, "errored": errored,
                      "ratios": {n: results[n]["ratio"] for n in results}}))


def run(names: list[str], full: bool = False) -> None:
    if not Path(SF1).is_dir():
        raise SystemExit(f"{SF1} missing — run tools/make_sfN.py first")
    curated = list(names)
    if full:
        names = [n for n in REGISTRY if n not in MEDIA_SCALE]
    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF01}/region.parquet").count()  # JVM warm
    results: dict[str, dict] = {}
    for sf_dir, key in ((SF01, "t_sf0.1"), (SF1, "t_sf1")):
        warm_build_artifacts(spark, sf_dir)  # amortized index builds
        for name in names:
            if name in MEDIA_SCALE:  # timed via op kwargs below instead
                continue
            spec = REGISTRY[name]
            best = None
            try:
                for _ in range(2 if sf_dir == SF01 else 1):
                    t0 = time.time()
                    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as e:  # noqa: BLE001 — a failure IS a finding
                print(f"{name} @ {sf_dir}: ERROR {e}", file=sys.stderr)
                results.setdefault(name, {})[key] = -1.0
                results[name].setdefault("errors", []).append(
                    f"{key}: {type(e).__name__}: {str(e)[:200]}"
                )
                continue
            results.setdefault(name, {})[key] = round(best, 3)
            print(f"{name} @ {sf_dir}: {best:.2f}s", file=sys.stderr)
    # media family: fixed sf dir, 10x blob count via op kwargs
    import wc_vector_indexing_spark.plans.queries as Q

    media = MEDIA_SCALE if (full or names is DEFAULT_QUERIES) else {
        n: MEDIA_SCALE[n] for n in names if n in MEDIA_SCALE
    }
    for name, (fn_name, small_kw, big_kw) in media.items():
        fn = getattr(Q, fn_name)
        for kw, key in ((small_kw, "t_sf0.1"), (big_kw, "t_sf1")):
            best = None
            for _ in range(2 if key == "t_sf0.1" else 1):
                t0 = time.time()
                fn(spark, SF01, **kw).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[key] = round(best, 3)
            print(f"{name} {kw} : {best:.2f}s", file=sys.stderr)
        results[name]["mode"] = "10x media blobs, constant dup-group size"
    flagged = []
    errored = []
    for name, r in results.items():
        # An errored side records -1.0; a ratio over a failed run is
        # meaningless, so treat any error as flagged rather than letting a
        # negative ratio read as "not superlinear" (or a tiny denominator
        # fabricate a flag).
        if r.get("t_sf1", -1.0) < 0 or r.get("t_sf0.1", -1.0) < 0:
            r["ratio"] = None
            r["superlinear"] = True
            errored.append(name)
            flagged.append(name)
            continue
        r["ratio"] = round(r["t_sf1"] / max(r["t_sf0.1"], 1e-3), 2)
        r["superlinear"] = r["ratio"] > RATIO_BAR
        if r["superlinear"]:
            flagged.append(name)
    curated_set = set(curated) | set(MEDIA_SCALE)
    # preserve sections other invocations own: skewed_curvature (the
    # --skew mode) and, on partial --queries runs, the last --full
    # run's full_catalog (a targeted re-measure of one new entry must
    # not clobber the 180+-entry rehearsal artifact)
    path = ROOT / "BENCH_SF1.json"
    artifact = json.loads(path.read_text()) if path.exists() else {}
    keep = {"skewed_curvature"} | (
        set() if full else {"full_catalog", "full_catalog_n"})
    prev_queries = {} if full else dict(artifact.get("queries", {}))
    if not full:
        # a targeted run must MERGE its flags with the standing
        # full-catalog verdicts, not clobber them: the r11 artifact
        # ended up with overlapping_sessions superlinear in
        # full_catalog but absent from flagged_superlinear exactly
        # this way
        for key in ("flagged_superlinear", "errored"):
            for n in artifact.get(key, []):
                if n not in results:
                    (flagged if key == "flagged_superlinear"
                     else errored).append(n)
        flagged[:] = sorted(set(flagged))
        errored[:] = sorted(set(errored))
    artifact = {k: v for k, v in artifact.items() if k in keep}
    artifact |= {
        "sf_small": 0.1,
        "sf_big": 1.0,
        "data_factor": 10,
        "ratio_bar": RATIO_BAR,
        "queries": prev_queries
        | {n: r for n, r in results.items() if n in curated_set},
        **(
            {"full_catalog": results, "full_catalog_n": len(results)}
            if full
            else {}
        ),
        "flagged_superlinear": flagged,
        "errored": errored,
        "note": (
            "sf1 synthesized by tools/make_sfN.py: 10x key-shifted "
            "replication, per-replica text rotation + embedding "
            "perturbation so dedup/ANN workload shape is preserved"
        ),
    }
    with open(ROOT / "BENCH_SF1.json", "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"flagged": flagged, "errored": errored,
                      "ratios": {n: results[n]["ratio"] for n in results}}))


if __name__ == "__main__":
    if "--skew" in sys.argv[1:]:
        run_skew()
    else:
        names = DEFAULT_QUERIES
        full = "--full" in sys.argv[1:]
        if len(sys.argv) > 2 and sys.argv[1] == "--queries":
            names = sys.argv[2].split(",")
        run(names, full=full)
