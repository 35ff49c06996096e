"""Curation pipeline: every drop is audited, survivors are clean, the
pipeline is deterministic."""

from __future__ import annotations

from pyspark.sql import Row

from wc_vector_indexing_spark.operators.curation import (
    CurationConfig,
    curate,
    curation_report,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and keeps going with many "
    "plain english words that score well on the quality gate today. "
) * 3


def mk_docs(spark):
    rows = [
        Row(doc_id=1, text=GOOD),
        Row(doc_id=2, text=GOOD),  # exact duplicate of 1
        Row(doc_id=3, text=GOOD + " A tiny extra tail sentence of filler."),  # near dup
        Row(doc_id=4, text="1234567890 " * 30),  # digits → low quality
        Row(doc_id=5, text="el la de los las que y en un una " * 12),  # spanish
        Row(doc_id=6, text="A totally different and unrelated document about the sea, "
                           "the tide, and a long walk on the shore in the morning. " * 3),
    ]
    return spark.createDataFrame(rows)


def test_curate_audit_and_survivors(spark):
    docs = mk_docs(spark)
    curated, audit = curate(docs, CurationConfig(near_dup_threshold=0.5))
    kept = {r.doc_id for r in curated.collect()}
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}

    assert kept == {1, 6}
    assert reasons[2] == "exact_duplicate"  # min-id canonical survives
    assert reasons[3] == "near_duplicate"
    assert reasons[4] == "low_quality"
    assert reasons[5] == "wrong_language"
    # audit covers exactly the dropped set, once each
    assert set(reasons) == {2, 3, 4, 5}
    assert curated.columns == docs.columns  # original shape preserved

    report = {r.reject_reason: r.n for r in curation_report(docs, audit).collect()}
    assert report["kept"] == 2 and report["exact_duplicate"] == 1


def test_curate_deterministic(spark):
    docs = mk_docs(spark)
    k1 = {r.doc_id for r in curate(docs)[0].collect()}
    k2 = {r.doc_id for r in curate(docs)[0].collect()}
    assert k1 == k2


def test_curate_keep_all_languages(spark):
    docs = mk_docs(spark)
    curated, _ = curate(docs, CurationConfig(languages=None, near_dup_threshold=0.5))
    assert {r.doc_id for r in curated.collect()} == {1, 5, 6}


def test_curate_repetition_stage(spark):
    clean = (
        "The quick brown fox jumps over the lazy dog while seventeen sailors "
        "watch from a distant pier in the calm morning light with coffee, maps, "
        "charts, and a very long list of singular unrepeated words nearby."
    )
    spam = "buy now " * 60  # every 5-gram is a duplicate
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=clean), Row(doc_id=2, text=spam)]
    )
    # languages=None isolates the repetition gate (spam has no stopwords
    # and would otherwise drop as wrong_language first)
    curated, audit = curate(
        docs, CurationConfig(languages=None, repetition_thresholds={})
    )
    assert [r.doc_id for r in curated.collect()] == [1]
    assert [(r.doc_id, r.reject_reason) for r in audit.collect()] == [(2, "repetitive")]


def test_curate_repetition_off_by_default(spark):
    docs = mk_docs(spark)
    _, audit = curate(docs, CurationConfig(near_dup_threshold=0.5))
    assert "repetitive" not in {r.reject_reason for r in audit.collect()}


def test_curate_heuristic_gates(spark):
    """The optional C4/Gopher stage drops docs with disjoint audit
    reasons, after quality/lang and before anything corpus-wide."""
    good = (
        "The steady captain watched the harbor as the evening settled in. "
        "The crew of the small vessel worked the lines with practiced care. "
        "The old pilot told a story about the northern passage and the ice. "
        "Every sailor in the tavern listened while the rain kept falling on "
        "the roof and the lamps burned low over the long wooden tables. "
        "Nobody interrupted the tale before the very end of the night."
    )
    no_punct = (
        "this long line is full of the words and the stopwords of english "
        "but it is never terminated so the c4 filter must reject the line"
    )
    bullets = "\n".join(
        ["- the bullet item with the words of a list."] * 6
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text=no_punct),
            Row(doc_id=3, text=bullets),
        ]
    )
    curated, audit = curate(
        docs,
        CurationConfig(
            languages=None, heuristics=("c4", "gopher"), near_dup_threshold=0.99
        ),
    )
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    assert [r.doc_id for r in curated.collect()] == [1]
    assert reasons[2] == "c4_boilerplate"
    # bullets pass c4 (terminal punct, >=5 words) but fail the Gopher
    # bullet-ratio rule
    assert reasons[3] == "gopher_rules"


def test_curate_heuristics_off_by_default(spark):
    docs = mk_docs(spark)
    _, audit = curate(docs, CurationConfig(near_dup_threshold=0.5))
    assert {"c4_boilerplate", "gopher_rules"}.isdisjoint(
        {r.reject_reason for r in audit.collect()}
    )


def test_curate_compress_band_stage(spark):
    """The optional compressibility gate drops the template tail with
    its own audit reason; off by default."""
    natural = (
        "The harbor master logged every arrival with a careful note about "
        "cargo, draft, and the weather over the outer banks that day. "
        "Seven vessels came in before noon and none required assistance. "
        "The afternoon brought a slow ferry and two fishing boats home."
    )
    template = "click here to subscribe now " * 60
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=natural), Row(doc_id=2, text=template)]
    )
    curated, audit = curate(
        docs,
        CurationConfig(min_quality=0.0, compress_band=(0.25, 1.1)),
    )
    assert [r.doc_id for r in curated.collect()] == [1]
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    assert reasons == {2: "compress_outlier"}
    # off by default
    _, audit2 = curate(docs, CurationConfig(min_quality=0.0))
    assert "compress_outlier" not in {r.reject_reason for r in audit2.collect()}


def test_curate_unicode_fix_stage(spark):
    """unicode_fix repairs text BEFORE hashing so a mojibake'd or
    zero-width-polluted duplicate is caught by exact dedup."""
    dirty_dup = GOOD[:-1] + "​ "  # ZWSP wedged into a duplicate
    rows = [
        Row(doc_id=1, text=GOOD),
        Row(doc_id=2, text=dirty_dup),
        Row(doc_id=6, text="A totally different and unrelated document about the sea, "
                           "the tide, and a long walk on the shore in the morning. " * 3),
    ]
    docs = spark.createDataFrame(rows)
    # without the fix the polluted duplicate hashes differently: exact
    # dedup misses it and only the (more expensive) near-dup stage nets it
    res_off = curate(docs, CurationConfig(unicode_fix=False))
    audit_off = {r.doc_id: r.reject_reason for r in res_off.audit.collect()}
    assert audit_off.get(2) == "near_duplicate"
    res_off.unpersist()
    # with the fix it is repaired to byte-equality and exact-deduped
    res_on = curate(docs, CurationConfig(unicode_fix=True))
    audit = {r.doc_id: r.reject_reason for r in res_on.audit.collect()}
    assert audit.get(2) == "exact_duplicate"
    assert "was_dirty" not in res_on.curated.columns
    res_on.unpersist()


def test_curate_blocklist_stage(spark):
    docs = mk_docs(spark).union(
        spark.createDataFrame(
            [Row(doc_id=7, text=GOOD + " gambling content appended here.")]
        )
    )
    curated, audit = curate(
        docs,
        CurationConfig(languages=None, blocklist=("gambling",), near_dup_threshold=0.5),
    )
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    assert reasons[7] == "blocklisted"
    assert 7 not in {r.doc_id for r in curated.collect()}
    # off by default: same corpus, no blocklisted rows
    _, audit2 = curate(docs, CurationConfig(languages=None, near_dup_threshold=0.5))
    assert "blocklisted" not in {r.reject_reason for r in audit2.collect()}


def test_curate_lang_percentile_stage(spark):
    # 6 english docs with stepped quality (longer = higher score), plus
    # spanish docs — per-language top-half keeps 3 en and ceil-half es
    rows = [
        Row(doc_id=i, text=f"the and of to in is that it for a tail{i} " * n)
        for i, n in [(1, 2), (2, 4), (3, 6), (4, 8), (5, 10), (6, 12)]
    ] + [
        Row(doc_id=10 + i, text=f"el la de los las que y en un una cola{i} " * n)
        for i, n in [(1, 3), (2, 9)]
    ]
    docs = spark.createDataFrame(rows)
    curated, audit = curate(
        docs,
        CurationConfig(
            min_quality=0.0,
            languages=None,
            lang_percentile=0.5,
            near_dup_threshold=0.99,
        ),
    )
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    dropped_pct = {d for d, r in reasons.items() if r == "below_lang_percentile"}
    kept_ids = {r.doc_id for r in curated.collect()}
    # the lowest-score english docs fall below their language's median;
    # the highest survive — and the spanish slice is judged on ITS OWN
    # median, not english's
    assert 1 in dropped_pct and 6 in kept_ids
    assert 12 in kept_ids  # top spanish doc survives its own percentile
    # disjoint audit invariant still holds
    assert docs.count() == curated.count() + audit.count()


def test_curate_lang_percentile_empty_survivors_is_noop(spark):
    # min_quality=2.0 drops everything before the percentile stage; the
    # fit has no distribution — stage must no-op, not raise
    docs = mk_docs(spark)
    curated, audit = curate(
        docs,
        CurationConfig(min_quality=2.0, languages=None, lang_percentile=0.5),
    )
    assert curated.count() == 0
    assert docs.count() == audit.count()
    assert {r.reject_reason for r in audit.collect()} == {"low_quality"}


def test_curate_host_prior_stage(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame([
        Row(doc_id=1, text=GOOD, source="hostA"),
        Row(doc_id=2, text="1234567890 " * 30, source="hostD"),  # low q
        # (hostD is absent from the prior: neutral 1.0x multiplier —
        # on hostA the 1.2x top-rank boost would push this past the
        # quality gate into the language gate)
        Row(doc_id=3, text=GOOD, source="hostB"),   # blocked host
        Row(doc_id=4, text=GOOD + " And a distinct closing line here.",
            source="hostC"),  # unranked host, distinct text (no dedup)
    ])
    prior = spark.createDataFrame([
        Row(host="hostA", blocked=False, host_rank=0.9),
        Row(host="hostB", blocked=True, host_rank=0.1),
    ])
    curated, audit = curate(
        docs, CurationConfig(near_dup_threshold=1.01), host_prior=prior)
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    assert reasons[3] == "blocked_host"
    assert reasons[2] == "low_quality"
    kept = {r.doc_id for r in curated.collect()}
    assert kept == {1, 4}
    assert curated.columns == ["doc_id", "text", "source"]


def test_curate_mirror_clusters_gate(spark):
    """mirror_clusters drops every doc on a NON-canonical mirror host
    wholesale (reason mirror_host) before per-row gates; the canonical
    member and unclustered hosts flow through untouched."""
    from pyspark.sql import Row

    docs = spark.createDataFrame([
        Row(doc_id=1, text=GOOD, source="hostA"),
        Row(doc_id=2, text=GOOD, source="hostB"),        # mirror of A
        Row(doc_id=3, text=GOOD + " And a distinct closing line here.",
            source="hostC"),                             # unclustered
    ])
    clusters = spark.createDataFrame([
        Row(host="hostA", cluster_host="hostA"),
        Row(host="hostB", cluster_host="hostA"),
    ])
    curated, audit = curate(
        docs, CurationConfig(near_dup_threshold=1.01),
        mirror_clusters=clusters)
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    assert reasons == {2: "mirror_host"}
    assert {r.doc_id for r in curated.collect()} == {1, 3}


def test_curate_host_prior_with_host_col_named_host(spark):
    """A corpus whose host column is literally named 'host' must keep
    that column through the rank-reweight join — the prior side's host
    column is aliased before joining so the post-join drop can't take
    the corpus's own column with it (ADVICE r12)."""
    from pyspark.sql import Row

    docs = spark.createDataFrame([
        Row(doc_id=1, text=GOOD, source="s1", host="hostA"),
        Row(doc_id=2, text=GOOD + " And a distinct closing line here.",
            source="s2", host="hostB"),
    ])
    prior = spark.createDataFrame([
        Row(host="hostA", blocked=False, host_rank=1.0),
        Row(host="hostB", blocked=True, host_rank=0.5),
    ])
    curated, audit = curate(
        docs, CurationConfig(near_dup_threshold=1.01),
        host_prior=prior, host_col="host")
    assert curated.columns == ["doc_id", "text", "source", "host"]
    assert [(r.doc_id, r.host) for r in curated.collect()] == [(1, "hostA")]
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    assert reasons == {2: "blocked_host"}


def test_curate_host_prior_reweights_quality(spark):
    from pyspark.sql import Row

    # a borderline doc (quality 0.5252 raw): a bottom-ranked host's
    # 0.8x multiplier pushes it under the 0.5 gate (0.42); a
    # top-ranked host's 1.2x keeps it comfortably above (0.63)
    borderline = "the and is to of " * 2 + "12345 " * 20
    docs = spark.createDataFrame([
        Row(doc_id=1, text=borderline, source="top"),
        Row(doc_id=2, text=borderline, source="bottom"),
    ])
    prior = spark.createDataFrame([
        Row(host="top", host_rank=1.0),
        Row(host="bottom", host_rank=0.0),
    ])
    curated, audit = curate(
        docs,
        CurationConfig(languages=None, near_dup_threshold=1.01),
        host_prior=prior,
    )
    reasons = {r.doc_id: r.reject_reason for r in audit.collect()}
    kept = {r.doc_id for r in curated.collect()}
    assert kept == {1} and reasons[2] == "low_quality"
