"""Physical-plan regression guards: the perf properties SCALE.md claims
must actually appear in the plans — pushed filters, pruned ReadSchema,
broadcast dims, top-K via TakeOrderedAndProject."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from wc_vector_indexing_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    # prefer the audit surface (same semantics as tools/plan_audit.py):
    # eager-summary ops hide the real program behind a driver-built
    # frame, and _ckpt_sorted ops explain as `Scan ExistingRDD`
    spec = REGISTRY[name]
    df = (spec.audit_fn or spec.fn)(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_q6_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in plan and "IsNotNull" in plan
    (schema,) = read_schemas(plan)
    cols = {c.split(":")[0] for c in schema.split(",")}
    # exactly the 4 referenced columns — no over-read
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q3_broadcasts_filtered_customer(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    # customer scan reads only the join+filter columns
    assert any(
        {"c_custkey", "c_mktsegment"} == {c.split(":")[0] for c in s.split(",")}
        for s in read_schemas(plan)
    )


def test_q5_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "q5_region_volume")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at minimum


def test_s3_anti_join_shape(spark):
    plan = plan_of(spark, "s3_never_synced")
    assert "LeftAnti" in plan
    assert "PushedFilters:" in plan


def test_topk_uses_take_ordered(spark):
    for name in ("knn_exact_top10", "s10_logs_page", "q10_returned_revenue"):
        assert "TakeOrderedAndProject" in plan_of(spark, name), name


def test_knn_reads_only_id_and_vector(spark):
    plan = plan_of(spark, "knn_exact_top10")
    assert any(
        {"vec_id", "embedding"} == {c.split(":")[0] for c in s.split(",")}
        for s in read_schemas(plan)
    )


def test_j7_priority_union_is_aggregate_not_window(spark):
    plan = plan_of(spark, "j7_priority_union")
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan  # min-agg replaced the row_number window


def test_q19_disjunction_derives_per_side_prefilters(spark):
    """The OR-of-ANDs must reach BOTH scans as pushed disjunctive
    prefilters (Catalyst extracts the per-side conjunct hulls)."""
    plan = plan_of(spark, "q19_disjunctive_revenue")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("l_quantity" in p and "Or(" in p for p in pushed)
    assert any("p_brand" in p and "Or(" in p for p in pushed)


def test_q16_blacklist_is_anti_join(spark):
    plan = plan_of(spark, "q16_supplier_part_counts")
    assert "LeftAnti" in plan


def test_q20_semi_join_shape(spark):
    plan = plan_of(spark, "q20_excess_suppliers")
    assert "LeftSemi" in plan
    # part-name LIKE filter is pushed to the part scan
    assert "StringStartsWith(p_name,small)" in plan


def test_q22_anti_join_and_scalar_broadcast(spark):
    plan = plan_of(spark, "q22_idle_customers")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q21_exists_collapsed_to_one_aggregate(spark):
    """EXISTS + NOT-EXISTS expressed as one per-order countDistinct
    aggregate — no self-join explosion (≤1 join with lineitem on both
    sides), and the returnflag filter reaches the scan."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    assert "EqualTo(l_returnflag,R)" in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 2


def test_mixing_corpus_path_broadcasts_thresholds(spark):
    plan = plan_of(spark, "data_mixing")
    # the corpus side joins the (tiny) per-source thresholds via
    # broadcast — the only Exchanges belong to the source-count agg
    assert "BroadcastHashJoin" in plan
    # documents scan reads only what the output + filter need
    assert any("text" in s for s in read_schemas(plan))


def test_vocab_topk_take_ordered(spark):
    plan = plan_of(spark, "vocab_topk")
    assert "TakeOrderedAndProject" in plan
    # one scan, token column only materialized post-explode
    (schema,) = read_schemas(plan)
    assert "text" in schema and "lang" not in schema


def test_packing_single_group_shuffle(spark):
    plan = plan_of(spark, "sequence_packing")
    # one window over the packing group: exactly one HASH exchange (by
    # source); the only other exchange is the catalog wrapper's
    # orderBy (range partitioning, oracle-comparison only)
    assert len(re.findall(r"hashpartitioning\(source", plan)) == 1
    assert "Window" in plan


def test_repetition_is_pure_map(spark):
    plan = plan_of(spark, "repetition_signals")
    # per-doc-local metrics must never hash-shuffle: the only exchanges
    # are the fan_out round-robin and the catalog wrapper's orderBy
    # (range partitioning, oracle-comparison only)
    assert not re.findall(r"hashpartitioning\(", plan)
    assert "MapInPandas" in plan
    # no join, no aggregate anywhere in the operator
    assert "Join" not in plan and "Aggregate" not in plan


def test_semdedup_two_python_stages_one_shuffle(spark):
    plan = plan_of(spark, "semdedup_embeddings")
    # gemm assignment (map) + per-cluster prune (grouped map): exactly
    # one hash exchange, keyed by the cluster id
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert keys and all("list_id" in k for k in keys)
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan


def test_importance_broadcasts_bucket_stats(spark):
    plan = plan_of(spark, "importance_weights")
    # the vocabulary-hash-sized stats frame joins back via broadcast —
    # the corpus token table is never the build side of a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _driver_recorded_queries() -> set[str]:
    """Union of every query the per-round driver gate has ever
    hash-validated, computed from the committed CORRECTNESS_r*.json
    artifacts — the gate-window policy's source of truth."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert files, "committed CORRECTNESS_r*.json artifacts are required in-tree"
    recorded: set[str] = set()
    for path in files:
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match"):
                    recorded.add(name)
    return recorded


def test_gate_window_contains_never_recorded():
    """MECHANICAL window-policy invariant (round-6 verdict fix): the
    correctness driver records only the FIRST 50 oracle-backed registry
    entries, so every oracle-backed entry that has NEVER been
    hash-validated by a prior round's driver record must sit inside
    that window — otherwise it can never be driver-validated at all.
    Computed from the committed CORRECTNESS_r*.json history, not a
    hand-pinned set: an insertion that demotes a never-recorded entry
    below the cutoff fails here."""
    oracle_backed = [k for k, s in REGISTRY.items() if s.sql is not None]
    window = set(oracle_backed[:50])
    recorded = _driver_recorded_queries()
    never_recorded = [k for k in oracle_backed if k not in recorded]
    stranded = [k for k in never_recorded if k not in window]
    assert not stranded, (
        "oracle-backed entries that were never driver-hash-validated sit "
        f"below the 50-entry gate cutoff and would stay unvalidated: {stranded}. "
        "Rotate them into the first-50 window (demote already-recorded "
        "entries in exchange)."
    )


def test_driver_gate_category_coverage():
    """The 50-entry gate window keeps spanning every operator category
    so a rotation can't silently drop a whole family from driver
    visibility. (The never-recorded-subset invariant is the mechanical
    test above; this one only pins family presence.)"""
    gate = [k for k, s in REGISTRY.items() if s.sql is not None][:50]
    gs = set(gate)
    assert sum(k.startswith("q") for k in gate) >= 2        # TPC-H core
    assert sum(k.startswith("dedup") for k in gate) >= 3    # dedup family
    assert "s3_never_synced" in gs                          # scan/join family
    # temporal/event family (the round-7 promotions)
    assert gs & {"session_window_events", "overlapping_sessions",
                 "moving_average_events", "t9_windowed_events"}
    # retrieval / ANN family
    assert gs & {"bm25_search", "mmr_rerank_top10", "matryoshka_recall"}
    # media / perceptual family
    assert gs & {"image_dedup_dhash", "audio_dedup_fp", "video_dedup_remux",
                 "media_format_census", "audio_dedup_mp3",
                 "video_dedup_requant", "mp3_pcm_census"}
    # curation / quality family
    assert gs & {"c4_line_filter", "gopher_quality", "importance_weights"}
    # sources family (crawl/archive front doors)
    assert gs & {"html_main_text", "archive_member_census",
                 "warc_cdx_index", "warc_revisit_resolve",
                 "warc_wat_links"}
    # rows-only entries never occupy window slots
    rows_only_in_window = [
        k for k in list(REGISTRY)[:50] if REGISTRY[k].sql is None
    ]
    assert not rows_only_in_window, rows_only_in_window


def test_gate_window_returns_only_hashable_columns(spark):
    """DRIVER-HASHER CONTRACT (r12 gate err): the driver canonicalizes
    gate results via pandas sort/factorize, which cannot hash list
    values — so no gate-window entry may return an array/map/struct
    column. (The registry's rounding/total-order rules covered value
    noise but not column hashability; this pins the class so a
    rotation can never re-introduce it — r12's
    safetensors_export_roundtrip returned a raw array<float> and
    errored the gate before comparison.)"""
    from pyspark.sql.types import ArrayType, MapType, StructType

    gate = [k for k, s in REGISTRY.items() if s.sql is not None][:50]
    offenders = []
    for name in gate:
        schema = REGISTRY[name].fn(spark, SF).schema
        complex_cols = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders.append((name, complex_cols))
    assert not offenders, (
        "gate-window entries return driver-unhashable complex columns "
        f"(fold them to scalars on both sides): {offenders}"
    )


def test_c4_and_gopher_are_zero_shuffle_map_passes(spark):
    """The heuristic filters must stay scan -> project: any Exchange
    means a regression from pure codegen."""
    for name in ("c4_line_filter", "gopher_quality"):
        plan = plan_of(spark, name)
        body = plan.split("AdaptiveSparkPlan")[0]
        assert "Exchange" not in body.replace("Sort", ""), (name, plan)
        # only the text scan columns are read
        schemas = read_schemas(plan)
        assert schemas and all("text" in s for s in schemas), (name, schemas)


def test_stratified_sample_filter_reaches_scan(spark):
    """The hash-bucket filter is a pure row predicate: the plan must be
    scan -> filter -> agg with no join."""
    plan = plan_of(spark, "stratified_sample_counts")
    assert "Join" not in plan
    # groupBy's hash exchange + the oracle-ordering range exchange only
    assert len(re.findall(r"hashpartitioning\(", plan)) == 1
    assert len(re.findall(r"rangepartitioning\(", plan)) == 1
    # the bucket predicate is a scan-adjacent row filter (no shuffle
    # upstream of it)
    assert "Filter" in plan and "sha2" in plan


def test_window_dedup_hash_keyed_no_cross_join(spark):
    """Window df-count and join-back stay hash-keyed (window hash /
    doc id) with no cartesian anywhere. (The window table is lazily
    checkpointed, so the parquet scan sits behind the RDD boundary and
    ReadSchema isn't visible here; the scan shape is pinned by the
    operator's select of (doc_id, text) only.)"""
    plan = plan_of(spark, "window_dedup")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    keys = re.findall(r"hashpartitioning\((\w+)", plan)
    assert keys and set(keys) <= {"h", "doc_id"}


def test_bm25_plan_shape(spark):
    """BM25: dims broadcast, top-k via TakeOrdered, zero Python, and
    the scan reads only (doc_id, text)."""
    plan = plan_of(spark, "bm25_search")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan  # fully JVM-side
    assert "SortMergeJoin" not in plan  # df/stats broadcast
    schemas = read_schemas(plan)
    assert schemas and all(set(s.split(",")) <= {"doc_id:bigint", "text:string"} for s in schemas)


def test_bigram_plan_model_broadcasts(spark):
    """Bigram LM: the model/count joins broadcast back — the corpus
    token stream never shuffles for a join."""
    plan = plan_of(spark, "bigram_logprob")
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_bloom_decontamination_probe_broadcasts(spark):
    """The eval position set broadcasts; train grams stream through."""
    plan = plan_of(spark, "bloom_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_fuzzy_join_no_cross_join(spark):
    """Fuzzy join: pairs are born inside posting lists — no join
    operator of any kind appears, let alone a cartesian."""
    plan = plan_of(spark, "fuzzy_self_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan
    # one exchange for the variant grouping + one for the pair distinct
    # (+ the oracle-ordering range exchange)
    assert len(re.findall(r"hashpartitioning\(", plan)) <= 2


def test_semantic_decontamination_is_one_map_pass(spark):
    """Eval matrix broadcasts inside the gemm closure; the train side
    must stream through with NO shuffle at all."""
    plan = plan_of(spark, "semantic_decontamination")
    body = plan.split("AdaptiveSparkPlan")[0]
    # sort for the orderBy output contract is allowed; no hash exchange
    assert "hashpartitioning" not in body
    assert "MapInPandas" in plan
    schemas = read_schemas(plan)
    assert schemas and all(
        set(s.split(",")[0].split(":")[:1]) <= {"vec_id"} or "embedding" in s
        for s in schemas
    )


def test_corpus_drift_single_tokenize_and_broadcast_totals(spark):
    """Slice totals (|sources| rows) must broadcast back, and the
    downstream aggregates must all read the CHECKPOINTED (slice, token)
    count table — zero Generate / parquet re-scan in the final plan
    (without the materialization the lazy derivation chain re-tokenized
    the corpus four times)."""
    plan = plan_of(spark, "corpus_drift")
    assert plan.count("Generate") == 0
    assert "Scan parquet" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_embedding_outliers_broadcasts_centroids_and_moments(spark):
    """Both the |labels|×dim centroid table and the per-label moment
    table join back via broadcast — the vector corpus is never the
    build side and never sort-merge-joined."""
    plan = plan_of(spark, "embedding_outliers")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_hard_negatives_shuffle_independent_of_index(spark):
    """Candidates are partitions × |queries| × k rows: the only hash
    exchange keys on query_id (the merge window), never on index rows."""
    plan = plan_of(spark, "hard_negatives")
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert keys and all("query_id" in k for k in keys)
    assert "MapInPandas" in plan


def test_token_fertility_is_single_agg(spark):
    plan = plan_of(spark, "token_fertility")
    assert "Join" not in plan
    assert len(re.findall(r"hashpartitioning\(", plan)) == 1
    (schema,) = read_schemas(plan)
    cols = {c.split(":")[0] for c in schema.split(",")}
    assert cols == {"lang", "text"}  # only the referenced columns read


def test_funnel_is_pure_catalyst(spark):
    """The subsequence scan must stay array codegen — no Python stage —
    and shuffle only for the session window + final tiny agg."""
    plan = plan_of(spark, "funnel_stages")
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    assert "Window" in plan


def test_matryoshka_gemm_no_cross_join(spark):
    """r6 verdict fix: scoring is the probe-broadcast Arrow gemm (one
    MapInPandas stage, local top-k per partition), never a 20×N cross
    join; the global merge is the (dim, qid) rank window."""
    plan = plan_of(spark, "matryoshka_recall")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_jsonld_extract_is_pure_catalyst(spark):
    """JSON-LD extraction must stay JVM-side codegen: no Python
    evaluation nodes, no shuffle besides the oracle-ordering range
    exchange."""
    plan = plan_of(spark, "jsonld_extract")
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert len(re.findall(r"hashpartitioning\(", plan)) == 0
    assert len(re.findall(r"rangepartitioning\(", plan)) == 1


def test_heavy_render_censuses_spread_before_python(spark):
    """mbox/parquet census renders cost ~ms of Python per row: the plan
    must carry a round-robin repartition between the scan and the
    MapInPandas so one small input partition can't serialize the whole
    render (the 29s -> 2s r8 fix)."""
    for name in ("mbox_corpus_text", "parquet_footer_census"):
        plan = plan_of(spark, name)
        assert "MapInPandas" in plan, name
        assert "RoundRobinPartitioning" in plan or "roundrobin" in plan.lower(), (
            name, plan,
        )


# ---------------------------------------------------------------------------
# PLANS.md artifact guards (r12): catalog-wide all-pairs invariants over the
# committed audit artifact — regenerated by tools/plan_audit.py after any
# planner-visible change; the row-count pin makes a stale artifact fail loudly.

from pathlib import Path as _Path

_PLANS = _Path(__file__).resolve().parent.parent / "PLANS.md"


def _plans_rows() -> list[tuple[str, list[str]]]:
    rows = []
    for line in _PLANS.read_text().splitlines():
        if not line.startswith("| ") or line.startswith("| query"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        rows.append((cells[0].rstrip("*"), cells[1:]))
    return rows


def test_plans_artifact_matches_registry():
    names = [n for n, _ in _plans_rows()]
    assert sorted(names) == sorted(REGISTRY), (
        "PLANS.md is stale — rerun tools/plan_audit.py"
    )


def test_no_plan_errors_in_artifact():
    bad = [n for n, cells in _plans_rows() if "plan error" in cells[0]]
    assert not bad, f"plan errors in PLANS.md: {bad}"


def test_no_cartesian_or_nested_loop_joins():
    # column 4 is "cart+bnljS+bnljX": cartesian products, scalar-attach
    # BNLJs (one-row build — the legitimate crossJoin(broadcast(agg))
    # idiom), and any OTHER nested-loop join. Cartesian and other-BNLJ
    # must be zero everywhere; scalar attaches are reported, not banned.
    offenders = []
    for name, cells in _plans_rows():
        m = re.fullmatch(r"(\d+)\+(\d+)\+(\d+)", cells[3])
        assert m, f"{name}: unexpected cart+bnlj cell {cells[3]!r}"
        if m.group(1) != "0" or m.group(3) != "0":
            offenders.append((name, cells[3]))
    assert not offenders, (
        f"all-pairs join shapes in the catalog: {offenders}"
    )


def test_eager_composites_expose_audit_fn():
    """The big eager-summary compositions must audit their real lazy
    program, not the driver-built report frame."""
    for name in (
        "crawl_to_training_set",
        "wiki_to_training_set",
        "training_data_pipeline",
        "curation_pipeline",
        "curation_with_host_prior",
    ):
        assert REGISTRY[name].audit_fn is not None, name


def test_audit_fn_is_lazy_and_has_real_shape(spark):
    """One live probe: the audit program compiles to a plan with actual
    work in it (the r11 PLANS row for crawl_to_training_set was
    all-zeros)."""
    df = REGISTRY["crawl_to_training_set"].audit_fn(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.MULTILINE)
    assert ops.count("Exchange") > 0 or ops.count("MapInPandas") > 0
    assert ops.count("CartesianProduct") == 0
    assert ops.count("BroadcastNestedLoopJoin") == 0


def test_ckpt_sorted_production_plan_pins_materialization(spark):
    # the audit twin shows the real python/shuffle shape (covered by the
    # other tests via plan_of); this guards the PRODUCTION path — the
    # lazy localCheckpoint between the python map and the global sort
    # must actually be there (r13 ADVICE: if the checkpoint were dropped
    # or moved above the sort, only this assertion would notice, and the
    # range-partitioner sample would silently re-run the python pass)
    import contextlib
    import io

    for name in ("warc_cdx_index", "aac_adts_census"):
        df = REGISTRY[name].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Scan ExistingRDD" in plan, name  # the pinned map output
        assert "Sort" in plan, name              # the global sort above it
