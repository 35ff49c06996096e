"""Char-n-gram language router (operators/langid.py): script gate
ratios, Latin marker-profile argmax, the planted 14-language fixture,
and the curation pipeline keyed on the new router."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.langid import (
    LATIN_MARKERS,
    lang_id_ngram,
)
from wc_vector_indexing_spark.plans.queries import _LANGID_PLANTS


def test_marker_profiles_are_distinct():
    # a marker shared verbatim between two languages scores both — the
    # profiles must stay pairwise distinct so argmax stays meaningful
    seen: dict[str, str] = {}
    for lang, markers in LATIN_MARKERS.items():
        assert len(markers) == len(set(markers)), lang
        for m in markers:
            assert m not in seen, (m, lang, seen.get(m))
            seen[m] = lang


def test_plants_cover_all_router_languages():
    langs = [lang for lang, _, _ in _LANGID_PLANTS]
    assert len(langs) == 14 and len(set(langs)) == 14
    assert set(LATIN_MARKERS) <= set(langs)


def test_lang_id_ngram_classifies_plants_and_edges(spark):
    rows = [(i, f"{sentence} {i}")
            for i, (_, _, sentence) in enumerate(_LANGID_PLANTS)]
    # edge rows: empty text, digits-only, Latin text with no markers
    rows += [(100, ""), (101, "123 456 789"), (102, "zzz qqq xxx www")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in lang_id_ngram(df).collect()}
    for i, (lang, script, _) in enumerate(_LANGID_PLANTS):
        assert got[i].predicted_lang == lang, (i, got[i])
        assert got[i].script == script, (i, got[i])
    assert got[100].predicted_lang == "other"
    assert got[101].predicted_lang == "other"
    # Latin script, zero marker hits: script detected, language unknown
    assert got[102].script == "latin"
    assert got[102].predicted_lang == "other"


def test_japanese_kanji_heavy_still_routes_ja(spark):
    # Japanese with mostly kanji and a single kana particle: the kana
    # presence rule (not a dominant-share rule) must still pick ja
    df = spark.createDataFrame(
        [(0, "日本経済新聞の記事を読む"), (1, "日本経済新聞記事")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in lang_id_ngram(df).collect()}
    assert got[0].predicted_lang == "ja"      # has を/む kana
    assert got[1].predicted_lang == "zh"      # pure Han: indistinguishable


def test_curate_with_ngram_router_and_percentile_gate(spark):
    """The per-language gates key on the new router: a mixed
    Latin+Cyrillic corpus curated with lang_router='ngram' keeps both
    languages (the stopword router would send ru to 'other' and drop
    it), and the per-language percentile gate fits thresholds per
    ngram-predicted language."""
    from wc_vector_indexing_spark.operators.curation import (
        CurationConfig,
        curate,
    )

    en_plant = _LANGID_PLANTS[0][2]
    ru_plant = _LANGID_PLANTS[8][2]
    # digit tails of increasing length spread quality_score within each
    # language group, so the 0.5-percentile gate has a real threshold
    rows = [(i, f"{en_plant} variant {'9' * (4 * i + 1)}") for i in range(4)]
    rows += [(10 + i, f"{ru_plant} вариант {'9' * (4 * i + 1)}")
             for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    result = curate(docs, CurationConfig(
        min_quality=0.0, languages=("en", "ru"), lang_router="ngram",
        minhash_token_hash="md5", lang_percentile=0.5))
    curated_ids = {r.doc_id for r in result.curated.collect()}
    reasons = {r.doc_id: r.reject_reason for r in result.audit.collect()}
    result.unpersist()
    # survivors from BOTH language groups (the stopword router would
    # have rejected every Cyrillic row as 'other')
    assert any(d < 10 for d in curated_ids)
    assert any(d >= 10 for d in curated_ids)
    # the 0.5-percentile gate dropped rows in BOTH language groups
    dropped = [d for d, r in reasons.items() if r == "below_lang_percentile"]
    assert any(d < 10 for d in dropped) and any(d >= 10 for d in dropped)
    # identical config under the stopword router: ru text scores 0 on
    # every Latin stopword list -> 'other' -> wrong_language
    result2 = curate(docs, CurationConfig(
        min_quality=0.0, languages=("en", "ru"), minhash_token_hash="md5"))
    reasons2 = {r.doc_id: r.reject_reason for r in result2.audit.collect()}
    result2.unpersist()
    assert all(reasons2.get(10 + i) == "wrong_language" for i in range(4))


def test_curate_rejects_unknown_router(spark):
    from wc_vector_indexing_spark.operators.curation import (
        CurationConfig,
        curate,
    )

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    with pytest.raises(ValueError, match="lang_router"):
        curate(docs, CurationConfig(lang_router="nope"))
