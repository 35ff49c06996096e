"""Subtitle-track extraction (public SubRip .srt conventions + W3C
WebVTT): video corpora carry their aligned text in subtitle sidecars,
and a training pipeline turns them into (start, end, text) rows — the
transcript table that feeds dedup/quality/alignment downstream.

SRT grammar: blank-line-separated cues of ``index\\n
HH:MM:SS,mmm --> HH:MM:SS,mmm\\ntext…``; WebVTT: a ``WEBVTT`` header
line, then cues whose timing line uses ``.`` millisecond separators
and may carry trailing cue settings (``line:…``, ``position:…``),
with optional non-numeric cue identifiers above the timing line and
NOTE comment blocks that must be skipped. Both parsed here; malformed
cues raise ValueError (quarantine contract) unless ``skip_bad``.

Spark shape: per-blob parse is an embarrassingly parallel Arrow map;
the cue table explodes one row per cue, zero shuffle until the caller
aggregates.

Reference note: the reference engine handles no media sidecars
(SURVEY §1.1); north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

import re

_TIME_RE = re.compile(
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_ARROW_RE = re.compile(
    r"^\s*((?:\d+:)?\d{1,2}:\d{2}[.,]\d{3})\s*-->\s*"
    r"((?:\d+:)?\d{1,2}:\d{2}[.,]\d{3})(?:\s+(.*))?$"
)


def _parse_ts(ts: str) -> int:
    m = _TIME_RE.fullmatch(ts.strip())
    if not m:
        raise ValueError(f"subtitle: bad timestamp {ts!r}")
    hours = int(m.group(1) or 0)
    return (
        hours * 3_600_000
        + int(m.group(2)) * 60_000
        + int(m.group(3)) * 1_000
        + int(m.group(4))
    )


def parse_subtitles(text: str, skip_bad: bool = False) -> list[dict]:
    """SRT or WebVTT → [{cue, start_ms, end_ms, text}] in file order.
    Format is auto-detected from the WEBVTT header. Raises ValueError
    on malformed cues unless skip_bad (then they're dropped)."""
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    vtt = bool(lines) and lines[0].strip().startswith("WEBVTT")
    if vtt:
        lines = lines[1:]
    cues: list[dict] = []
    block: list[str] = []

    def flush(block: list[str]) -> None:
        while block and not block[0].strip():
            block.pop(0)
        if not block:
            return
        if vtt and block[0].strip().startswith(("NOTE", "STYLE", "REGION")):
            return  # comment/metadata block
        idx = len(cues) + 1
        first = block[0].strip()
        body_start = 0
        m = _ARROW_RE.match(first)
        if m is None:
            # SRT numeric index or VTT cue identifier line
            if first.isdigit():
                idx = int(first)
            body_start = 1
            if body_start >= len(block):
                if skip_bad:
                    return
                raise ValueError("subtitle: cue without a timing line")
            m = _ARROW_RE.match(block[body_start].strip())
            if m is None:
                if skip_bad:
                    return
                raise ValueError(
                    f"subtitle: bad timing line {block[body_start]!r}"
                )
        start, end = _parse_ts(m.group(1)), _parse_ts(m.group(2))
        if end < start:
            if skip_bad:
                return
            raise ValueError("subtitle: cue ends before it starts")
        cues.append({
            "cue": idx,
            "start_ms": start,
            "end_ms": end,
            "text": "\n".join(ln.rstrip() for ln in block[body_start + 1:]).strip(),
        })

    for ln in lines:
        if ln.strip():
            block.append(ln)
        elif block:
            flush(block)
            block = []
    if block:
        flush(block)
    return cues


def to_srt(cues: list[tuple[int, int, str]]) -> str:
    """Writer half: (start_ms, end_ms, text) → SubRip text."""

    def ts(ms: int) -> str:
        return (
            f"{ms // 3_600_000:02d}:{ms // 60_000 % 60:02d}:"
            f"{ms // 1_000 % 60:02d},{ms % 1_000:03d}"
        )

    out = []
    for i, (start, end, text) in enumerate(cues, 1):
        out.append(f"{i}\n{ts(start)} --> {ts(end)}\n{text}\n")
    return "\n".join(out)


def to_vtt(cues: list[tuple[int, int, str]], with_note: bool = False) -> str:
    """Writer half: (start_ms, end_ms, text) → WebVTT text (dot
    separators, optional NOTE block the parser must skip)."""

    def ts(ms: int) -> str:
        return (
            f"{ms // 3_600_000:02d}:{ms // 60_000 % 60:02d}:"
            f"{ms // 1_000 % 60:02d}.{ms % 1_000:03d}"
        )

    out = ["WEBVTT\n"]
    if with_note:
        out.append("NOTE planted comment block\nspanning two lines\n")
    for start, end, text in cues:
        out.append(f"{ts(start)} --> {ts(end)} line:0\n{text}\n")
    return "\n".join(out)
