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
    df = REGISTRY[name].fn(spark, SF)
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


def test_driver_gate_category_coverage():
    """The correctness driver records only the FIRST 50 oracle-backed
    registry entries; pin that the window keeps spanning every operator
    category so an insertion can't silently demote one."""
    gate = [k for k, s in REGISTRY.items() if s.sql is not None][:50]
    gs = set(gate)
    # policy: every oracle-backed entry that has NEVER been recorded by
    # the driver gate sits inside the window; entries already validated
    # in a prior round's CORRECTNESS_r*.json rotate below the cutoff as
    # needed (they stay covered by tools/parity_check.py). TPC-H keeps a
    # 5-query core presence; q6-q22 were driver-validated in r1-r4.
    assert sum(k.startswith("q") for k in gate) >= 2       # TPC-H core
    # (q5 rotated below in r5 — driver-validated r1-r4 — to make room
    # for the never-recorded gate entries)
    # dedup family: ≥3 dedup_*-prefixed plus window_dedup and the
    # perceptual image pair entry; the cosine-pair, simhash, and exact
    # variants (r1-r4-validated) rotated below the cutoff in round 5
    assert sum(k.startswith("dedup") for k in gate) >= 3
    assert "s3_never_synced" in gs  # j7 + s4 validated r1-r4, rotated
    # below the cutoff in round 5
    # textstats_quality/lang_id/repetition all validated r1-r4 and
    # rotated below the cutoff; the family's gate presence is now the
    # fresher entries (script_mix, token_fertility, topic_tagging,
    # readability, lexical_diversity)
    # knn family: knn_exact AND knn_join validated r1-r4, both rotated
    # below; the family's gate presence is the fresher matryoshka_recall
    # + the newly-oracle-backed mmr_rerank_top10 (recursive-CTE oracle)
    assert "importance_weights" in gs  # data_profile driver-validated r4,
    # rotated below in r5; n-gram decontamination validated r1-r4,
    # rotated below; its semantic sibling stays gated via the
    # newest-entry set
    # temporal: t9/sessionize/asof/range all driver-validated r1-r4 and
    # rotated below the cutoff; gate coverage continues via the
    # never-recorded overlapping_sessions + funnel_stages entries
    # the newest oracle-backed queries must be gate-visible, not only
    # locally parity-checked (round-4 advisor finding): a latent oracle
    # mismatch in fresh operators should be caught by the driver
    # (bigram_logprob / collocations_pmi / value_histogram hash-
    # validated by the driver in r5 and rotated below the cutoff in r6
    # to make room for the never-recorded encode_tokens /
    # packed_sequences / token_length_dist plus the three entries that
    # gained oracles in r6)
    assert {
        "encode_tokens", "packed_sequences", "importance_resample",
        "corpus_health", "token_length_dist", "dedup_ngram_containment",
        "script_mix", "c4_line_filter", "gopher_quality",
        "stratified_sample_counts", "window_dedup",
        "bm25_search", "bloom_decontamination",
        "fuzzy_self_join",
        "lexical_diversity", "url_features", "domain_cap",
        "temperature_mix", "exact_substring_removal",
        # round 5
        "hybrid_search_rrf", "event_pagerank", "semantic_decontamination",
        "hard_negatives", "token_fertility", "corpus_drift",
        "embedding_outliers", "unicode_normalize", "training_triplets",
        "ccnet_buckets", "overlapping_sessions", "corpus_diff",
        "funnel_stages", "matryoshka_recall",
        "mmr_rerank_top10", "soft_dedup_weights", "mixing_recipe",
        # round 6: rows-only entries that gained real oracles, the PSL
        # eTLD+1 query, and the WARC/HTML extraction gate — never
        # hash-recorded, so gate-visible (blocklist_gate, r5-validated,
        # rotated below in exchange)
        "image_dedup_dhash", "tokenizer_eval", "psl_registrable_domain",
        "html_main_text", "audio_dedup_fp", "video_dedup_remux",
        "purchase_attribution", "media_format_census",
        # (percentile_quality, blocklist_gate, epoch_order, readability,
        # topic_tagging — all r5-hash-validated — rotated below in exchange)
    } <= gs


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


def test_matryoshka_truth_join_no_python(spark):
    plan = plan_of(spark, "matryoshka_recall")
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    # rank windows keyed by (dim, qid)
    assert "Window" in plan
