"""Subtitle extraction (operators/subtitles.py): SRT/WebVTT
writer-inverse roundtrips, VTT-specific grammar (header, NOTE blocks,
cue settings, cue identifiers, hour-less timestamps), and the
malformed-cue quarantine contract."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.operators.subtitles import (
    parse_subtitles,
    to_srt,
    to_vtt,
)

CUES = [
    (0, 1500, "Hello there."),
    (1500, 4200, "Two lines\nof text"),
    (3_600_000 + 61_000 + 7, 3_600_000 + 65_000, "past the hour mark"),
]


def test_srt_roundtrip():
    got = parse_subtitles(to_srt(CUES))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == CUES
    assert [c["cue"] for c in got] == [1, 2, 3]


def test_vtt_roundtrip_with_note_and_settings():
    got = parse_subtitles(to_vtt(CUES, with_note=True))
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == CUES


def test_vtt_cue_identifier_and_hourless_times():
    text = (
        "WEBVTT\n\nintro-cue\n01:02.500 --> 01:03.000\nshort times\n"
    )
    (cue,) = parse_subtitles(text)
    assert cue["start_ms"] == 62_500 and cue["end_ms"] == 63_000
    assert cue["text"] == "short times"


def test_crlf_and_trailing_block():
    text = "1\r\n00:00:00,000 --> 00:00:01,000\r\nx"
    (cue,) = parse_subtitles(text)
    assert cue["text"] == "x" and cue["end_ms"] == 1000


def test_malformed_quarantine_and_skip_bad():
    bad = "1\n00:00:02,000 --> 00:00:01,000\nbackwards\n"
    with pytest.raises(ValueError, match="ends before"):
        parse_subtitles(bad)
    assert parse_subtitles(bad, skip_bad=True) == []
    with pytest.raises(ValueError, match="timing"):
        parse_subtitles("1\nnot a timing line\ntext\n")
    good_and_bad = bad + "\n" + to_srt([(0, 5, "ok")])
    assert [c["text"] for c in parse_subtitles(good_and_bad, skip_bad=True)] == ["ok"]
