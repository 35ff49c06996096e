"""Markup text-extraction sources — Markdown, Jupyter notebooks, and
LaTeX: the document families code/papers pre-training corpora ship in
(GitHub READMEs and docs trees, notebook dumps, arXiv source). Joins
the office/PDF/EPUB extractor family (sources/office.py, sources/pdf.py)
with the same contract: deterministic writer halves for planted-truth
fixtures, pure text-in/text-out extraction functions, binaryFile +
one Arrow ``mapInPandas`` pass, per-file ``on_error='skip'``
isolation. Reference behavior analogue: the ``plain()`` HTML→text
projection (class-indexer.php document assembly) re-expressed for the
markup formats a training pipeline actually crawls.

Extraction is STRUCTURE REMOVAL, not rendering: the goal is the text
a language model should train on, with markup syntax stripped and
reading order preserved.

- Markdown (:func:`markdown_to_text`): ATX/Setext headings unwrapped,
  emphasis/strikethrough markers stripped, links/images reduced to
  their text/alt, inline code and fenced blocks kept VERBATIM (code
  is signal in a code corpus, fences are not), list/blockquote
  markers dropped, HTML tags stripped, reference-link definitions
  dropped.
- Jupyter (:func:`ipynb_to_cells`): nbformat 4 (and 3's
  worksheets/input layout) — markdown cells run through the markdown
  extractor, code cells kept verbatim, raw cells kept, outputs
  DROPPED (model-generated noise in most dumps); cell order is
  notebook order.
- LaTeX (:func:`latex_to_text`): comments dropped, sectioning
  commands unwrapped in order, text-style commands (\\textbf &c.)
  unwrapped, math ($…$, $$…$$, \\[…\\]) replaced by a stable
  ``<math>`` placeholder (the CCNet/RedPajama-style convention:
  formula TOKENS are near-noise, formula POSITIONS are signal),
  \\begin/\\end markers dropped with environment content kept,
  verbatim environments kept verbatim, known zero-arg commands
  (\\item, \\par, \\\\) mapped to their text effect, unknown
  one-arg commands unwrapped to their argument.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ------------------------------------------------------------- markdown

_MD_FENCE = re.compile(r"^(```|~~~)\s*\w*\s*$")
_MD_HEADING = re.compile(r"^\s{0,3}#{1,6}\s+")
_MD_SETEXT = re.compile(r"^\s{0,3}(=+|-+)\s*$")
_MD_LIST = re.compile(r"^(\s*)([-*+]|\d{1,9}[.)])\s+")
_MD_BLOCKQUOTE = re.compile(r"^\s{0,3}(>\s?)+")
_MD_REFDEF = re.compile(r"^\s{0,3}\[[^\]]+\]:\s+\S+")
_MD_IMAGE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_MD_LINK = re.compile(r"\[([^\]]+)\]\([^)]*\)")
_MD_AUTOLINK = re.compile(r"<(https?://[^>\s]+)>")
_MD_HTML_TAG = re.compile(r"</?[A-Za-z][^>]*>")
_MD_CODE_SPAN = re.compile(r"`([^`]*)`")
_MD_EMPH = re.compile(r"(\*{1,3}|_{1,3}|~~)(?=\S)(.+?)(?<=\S)\1")


def markdown_to_text(md: str) -> str:
    """Markdown → training text (see module docstring for the exact
    strip rules). Line-oriented and single-pass: fenced code toggles a
    verbatim mode; every other line has block markers stripped first,
    then inline markup reduced innermost-out."""
    out: list[str] = []
    in_fence = False
    lines = md.split("\n")
    for i, line in enumerate(lines):
        if _MD_FENCE.match(line):
            in_fence = not in_fence
            continue
        if in_fence:
            out.append(line)
            continue
        if _MD_REFDEF.match(line):
            continue
        # setext underline: the PREVIOUS line was the heading text
        if _MD_SETEXT.match(line) and i > 0 and lines[i - 1].strip():
            continue
        line = _MD_BLOCKQUOTE.sub("", line)
        line = _MD_HEADING.sub("", line)
        line = _MD_LIST.sub(r"\1", line)
        line = _MD_IMAGE.sub(r"\1", line)
        line = _MD_LINK.sub(r"\1", line)
        line = _MD_AUTOLINK.sub(r"\1", line)
        line = _MD_HTML_TAG.sub("", line)
        line = _MD_CODE_SPAN.sub(r"\1", line)
        prev = None
        while prev != line:  # nested emphasis (***x*** etc.)
            prev = line
            line = _MD_EMPH.sub(r"\2", line)
        out.append(line)
    text = "\n".join(out)
    return re.sub(r"\n{3,}", "\n\n", text).strip()


# ------------------------------------------------------------- notebooks

def ipynb_to_cells(data: bytes) -> list[tuple[str, str]]:
    """Notebook JSON → ordered (cell_type, text) pairs. nbformat 4
    top-level ``cells``; nbformat 3's ``worksheets[].cells`` with
    ``input`` accepted too. Markdown cells pass through
    :func:`markdown_to_text`; code/raw kept verbatim; outputs dropped.
    Anything structurally off is the contract ``ValueError``."""
    try:
        nb = json.loads(data.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"not a notebook: {e!r}") from e
    if not isinstance(nb, dict):
        raise ValueError("not a notebook: top level is not an object")
    if "cells" in nb:
        cells = nb["cells"]
    elif "worksheets" in nb:  # nbformat 3
        cells = [c for ws in nb["worksheets"]
                 for c in (ws.get("cells") if isinstance(ws, dict) else [])]
    else:
        raise ValueError("not a notebook: no cells/worksheets")
    if not isinstance(cells, list):
        raise ValueError("not a notebook: cells is not a list")
    out: list[tuple[str, str]] = []
    for c in cells:
        if not isinstance(c, dict):
            raise ValueError("not a notebook: cell is not an object")
        ctype = c.get("cell_type")
        if not isinstance(ctype, str):
            raise ValueError("not a notebook: cell_type missing")
        src = c.get("source", c.get("input", ""))  # v3 code cells: input
        if isinstance(src, list):
            if not all(isinstance(s, str) for s in src):
                raise ValueError("not a notebook: non-string source line")
            src = "".join(src)
        if not isinstance(src, str):
            raise ValueError("not a notebook: source is not text")
        if ctype == "markdown":
            out.append((ctype, markdown_to_text(src)))
        else:  # code / raw / heading(v3) — verbatim
            out.append((ctype, src))
    return out


# ------------------------------------------------------------- LaTeX

_TEX_COMMENT = re.compile(r"(?<!\\)%[^\n]*")
_TEX_MATH = re.compile(r"\$\$.*?\$\$|(?<!\\)\$.*?(?<!\\)\$|\\\[.*?\\\]",
                       re.DOTALL)
_TEX_VERBATIM = re.compile(
    r"\\begin\{(verbatim|lstlisting)\}(.*?)\\end\{\1\}", re.DOTALL)
_TEX_SECTION = re.compile(
    r"\\(?:part|chapter|(?:sub){0,2}section|paragraph)\*?\{([^{}]*)\}")
_TEX_ENV = re.compile(r"\\(?:begin|end)\{[A-Za-z*]+\}(?:\{[^{}]*\}|\[[^\]]*\])*")
_TEX_UNWRAP = re.compile(
    r"\\[A-Za-z]+\*?(?:\[[^\]]*\])?\{([^{}]*)\}")
_TEX_BARE = re.compile(r"\\[A-Za-z]+\*?(?:\[[^\]]*\])?")


def latex_to_text(tex: str) -> str:
    """LaTeX → training text (strip rules in the module docstring).
    Verbatim environments are carved out first (their content must
    not be de-markup'd), then comments, then math → ``<math>``, then
    command unwrapping innermost-out."""
    # full documents: the preamble is configuration, not text
    if "\\begin{document}" in tex:
        tex = tex.split("\\begin{document}", 1)[1]
        tex = tex.split("\\end{document}", 1)[0]
    slots: list[str] = []

    def carve(m: re.Match) -> str:
        slots.append(m.group(2))
        return f"\x00{len(slots) - 1}\x00"

    tex = _TEX_VERBATIM.sub(carve, tex)
    tex = _TEX_COMMENT.sub("", tex)
    tex = _TEX_MATH.sub("<math>", tex)
    tex = tex.replace("\\\\", "\n").replace("\\item", "\n")
    tex = _TEX_SECTION.sub(lambda m: "\n" + m.group(1) + "\n", tex)
    tex = _TEX_ENV.sub("", tex)
    prev = None
    while prev != tex:  # nested \textbf{\emph{x}}
        prev = tex
        tex = _TEX_UNWRAP.sub(r"\1", tex)
    tex = _TEX_BARE.sub("", tex)
    tex = tex.replace("~", " ").replace("{", "").replace("}", "")
    for i, body in enumerate(slots):
        tex = tex.replace(f"\x00{i}\x00", body)
    return re.sub(r"\n{3,}", "\n\n", re.sub(r"[ \t]+", " ", tex)).strip()


# ------------------------------------------------------------- Spark glue

def _extract_pass(raw: DataFrame, kind: str, on_error: str) -> DataFrame:
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    if kind == "ipynb":
        ddl = ("path string, cell_index int, cell_type string, text string")
    else:
        ddl = "path string, text string"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ddl.replace(" string", "").replace(" int", "").split(", ")
        rows: list[tuple] = []
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    if kind == "ipynb":
                        cells = ipynb_to_cells(bytes(content))
                        got = [(fpath, i, t, s)
                               for i, (t, s) in enumerate(cells)]
                    else:
                        body = bytes(content).decode("utf-8")
                        fn = (markdown_to_text if kind == "markdown"
                              else latex_to_text)
                        got = [(fpath, fn(body))]
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt {kind} file {fpath}: {e!r}") from e
                    continue
                except UnicodeDecodeError as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt {kind} file {fpath}: {e!r}") from e
                    continue
                rows.extend(got)
                if len(rows) >= 1024:
                    yield pd.DataFrame(rows, columns=cols)
                    rows = []
        yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(parse, schema=ddl)


def read_markdown_corpus(spark: SparkSession, path: str,
                         on_error: str = "raise") -> DataFrame:
    """(path, text): extracted text of each ``.md`` file."""
    raw = spark.read.format("binaryFile").load(path)
    return _extract_pass(raw, "markdown", on_error)


def read_latex_corpus(spark: SparkSession, path: str,
                      on_error: str = "raise") -> DataFrame:
    """(path, text): extracted text of each ``.tex`` file."""
    raw = spark.read.format("binaryFile").load(path)
    return _extract_pass(raw, "latex", on_error)


def read_ipynb_corpus(spark: SparkSession, path: str,
                      on_error: str = "raise") -> DataFrame:
    """(path, cell_index, cell_type, text): one row per notebook cell
    in notebook order — the pre-chunked form a code corpus wants
    (markdown prose and code stay separable for mixture weighting)."""
    raw = spark.read.format("binaryFile").load(path)
    return _extract_pass(raw, "ipynb", on_error)


def to_ipynb_bytes(cells: list[tuple[str, str]]) -> bytes:
    """Writer half: nbformat-4 notebook JSON from (cell_type, source)
    pairs — fixtures and tests; deterministic (sorted keys)."""
    nb = {
        "nbformat": 4,
        "nbformat_minor": 5,
        "metadata": {},
        "cells": [
            {"cell_type": t, "metadata": {}, "source": s.splitlines(True),
             **({"outputs": [], "execution_count": None}
                if t == "code" else {})}
            for t, s in cells
        ],
    }
    return json.dumps(nb, sort_keys=True).encode("utf-8")
