"""Char-n-gram language identification — the crawl router stage.

Two public-knowledge stages (the CLD/textcat family every crawl
pipeline ships; Cavnar & Trenkle 1994 "N-Gram-Based Text
Categorization"):

1. **Script gate** — Unicode-block character ratios decide the writing
   system first. Hangul → ko, kana presence → ja (Japanese text mixes
   kana with kanji, so kana is the marker — checked BEFORE the Han
   block), Han → zh, Cyrillic → ru, Arabic → ar, Devanagari → hi.
   This is how real routers handle CJK and other non-Latin scripts,
   where whitespace tokenization (the stopword router's assumption)
   fails by construction.
2. **Latin-script marker profiles** — within Latin text, per-language
   profiles of distinctive character n-grams (space-padded function
   words and affix trigrams, the top-of-profile entries a
   Cavnar-Trenkle rank profile would carry). Score(L) = total
   occurrence count of L's markers in the padded lowercased text;
   argmax with a fixed tie-break order; zero hits → 'other'.

Everything is a pure Column expression (regexp_replace / replace /
length arithmetic): the 100 TB corpus never leaves whole-stage codegen
and never shuffles for language routing. Extends the 4-language
stopword router (textstats.lang_id, reference parity:
includes/indexer/class-indexer.php text-normalization pipeline) to 14
languages across 7 scripts; the per-language percentile gates
(textstats.fit_quality_thresholds) key on either router's output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unicode block ranges (Java regex and RE2 both accept \x{...} class
# ranges, so the same character classes replay in the DuckDB oracle)
SCRIPT_RANGES: dict[str, str] = {
    "hangul": r"\x{AC00}-\x{D7AF}",
    "kana": r"\x{3040}-\x{30FF}",       # hiragana + katakana
    "han": r"\x{4E00}-\x{9FFF}",
    "cyrillic": r"\x{0400}-\x{04FF}",
    "arabic": r"\x{0600}-\x{06FF}",
    "devanagari": r"\x{0900}-\x{097F}",
    "latin": r"A-Za-z\x{00C0}-\x{024F}",
}

# marker n-grams per Latin-script language: space-padded function words
# plus one affix trigram — the most distinctive top-profile entries of
# a character-n-gram rank profile for each language. Order fixes the
# argmax tie-break.
LATIN_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is ", " that ", " with ", " for ", " this "],
    "es": [" que ", " los ", " las ", " una ", "ción", " para ", " como ", " están "],
    "de": [" der ", " die ", " und ", " ist ", " ein ", " nicht ", " auch ", " werden "],
    "fr": [" les ", " des ", " est ", " dans ", " pour ", " avec ", " une ", " qui "],
    "it": [" che ", " della ", " gli ", " sono ", " con ", "zione", " per ", " degli "],
    "pt": [" não ", " uma ", "ção", " dos ", " com ", " são ", " mais ", " pelo "],
    "nl": [" het ", " een ", " van ", " niet ", " zijn ", "ijk", " voor ", " naar "],
    "tr": [" bir ", " ve ", " için ", " bu ", " olarak ", " ile ", "ları", "ler "],
}

# script-ratio thresholds: dominant-block share for unambiguous
# scripts; kana needs only presence (ja text is mostly kanji) — the
# classic CLD-style asymmetry
_SCRIPT_MIN = 0.3
_KANA_MIN = 0.05
_LATIN_MIN = 0.5


def _range_count(c: Column, rng: str) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, f"[{rng}]", ""))


def script_col(text_col: str | Column) -> Column:
    """Dominant-script label as a pure Column expression: ratios of
    Unicode-block characters over non-whitespace characters, checked in
    the order that makes mixed scripts unambiguous (kana before Han)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    nonspace = F.regexp_replace(c, r"\s", "")
    n = F.greatest(F.length(nonspace), F.lit(1))
    r = {k: _range_count(nonspace, rng) / n for k, rng in SCRIPT_RANGES.items()}
    return (
        F.when(r["hangul"] >= _SCRIPT_MIN, "hangul")
        .when(r["kana"] >= _KANA_MIN, "kana")
        .when(r["han"] >= _SCRIPT_MIN, "han")
        .when(r["cyrillic"] >= _SCRIPT_MIN, "cyrillic")
        .when(r["arabic"] >= _SCRIPT_MIN, "arabic")
        .when(r["devanagari"] >= _SCRIPT_MIN, "devanagari")
        .when(r["latin"] >= _LATIN_MIN, "latin")
        .otherwise("other")
    )


def _marker_scores(text_col: str | Column) -> dict[str, Column]:
    """Occurrence counts of each language's markers in the padded
    lowercased text — replace/length arithmetic, no regex per marker."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    return {
        lang: sum(
            ((F.length(padded) - F.length(F.replace(padded, F.lit(m))))
             / len(m)).cast("int")
            for m in markers
        )
        for lang, markers in LATIN_MARKERS.items()
    }


def predicted_lang_ngram_col(text_col: str | Column) -> Column:
    """14-language argmax prediction as a standalone Column expression
    (stream-safe, no join, no Python) — the drop-in alternative to
    textstats.predicted_lang_col for corpora that aren't 4-language
    Latin. Script gate first; marker-profile argmax within Latin with
    the LATIN_MARKERS order as tie-break; no marker hits → 'other'.

    PERFORMANCE: prefer :func:`with_predicted_lang` for corpus-scale
    use. As a single Column, the argmax inlines ``best`` (which holds
    all 8 score subtrees) into every comparison branch — ~1150 copies
    of ``lower(concat(text))`` in the final expression, which Catalyst
    does not fully common-subexpression-eliminate; measured ~9x slower
    than the staged two-projection form at 5k docs and growing with
    text length. This form remains for expression-level composition
    where the input is small."""
    script = script_col(text_col)
    scores = _marker_scores(text_col)
    langs = list(LATIN_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    latin_pick = F.when(best <= 0, "other")
    for lang in langs:
        latin_pick = latin_pick.when(scores[lang] == best, lang)
    return _script_route(script, latin_pick)


def _script_route(script: Column, latin_pick: Column) -> Column:
    return (
        F.when(script == "hangul", "ko")
        .when(script == "kana", "ja")
        .when(script == "han", "zh")
        .when(script == "cyrillic", "ru")
        .when(script == "arabic", "ar")
        .when(script == "devanagari", "hi")
        .when(script == "latin", latin_pick)
        .otherwise("other")
    )


def with_predicted_lang(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "predicted_lang",
    script_out: str | None = None,
) -> DataFrame:
    """Append the router's prediction (and optionally the script label)
    to ``df`` — the corpus-scale form. Two projections: the first lands
    each language's marker score and the script label as REAL columns
    (each scanned expression evaluated exactly once per row); the
    second computes the argmax over cheap column references.
    CollapseProject leaves the stage boundary alone because the score
    aliases are non-trivial and multiply referenced, so the scores are
    never re-inlined into the 9 argmax branches the single-Column form
    pays for. Still zero-shuffle, zero-Python, stream-safe."""
    scores = _marker_scores(text_col)
    langs = list(LATIN_MARKERS)
    staged = df.select(
        "*",
        script_col(text_col).alias("_lid_script"),
        *[scores[lang].alias(f"_lid_{lang}") for lang in langs],
    )
    best = F.greatest(*[F.col(f"_lid_{lang}") for lang in langs])
    pick = F.when(best <= 0, "other")
    for lang in langs:
        pick = pick.when(F.col(f"_lid_{lang}") == best, lang)
    lang_expr = _script_route(F.col("_lid_script"), pick)
    keep = [*df.columns]
    if script_out is not None:
        keep.append(F.col("_lid_script").alias(script_out))
    return staged.select(*keep, lang_expr.alias(out_col))


def lang_id_ngram(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Char-n-gram language ID over a corpus: (id, script,
    predicted_lang). One zero-shuffle codegen map pass (staged form,
    see with_predicted_lang) — the router the per-language curation
    gates key on when the corpus spans more scripts than the stopword
    router covers."""
    return with_predicted_lang(
        docs.select(F.col(id_col), F.col(text_col)),
        text_col=text_col,
        script_out="script",
    ).select(id_col, "script", "predicted_lang")
