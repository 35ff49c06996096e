"""Markup sources (sources/markup.py): markdown/LaTeX/notebook
extraction goldens, structural-contract errors, and the Spark readers'
per-file isolation."""

from __future__ import annotations

import json

import pytest

from wc_vector_indexing_spark.sources.markup import (
    ipynb_to_cells,
    latex_to_text,
    markdown_to_text,
    read_ipynb_corpus,
    read_latex_corpus,
    read_markdown_corpus,
    to_ipynb_bytes,
)


def test_markdown_golden():
    md = (
        "# Title\n\nSome **bold** and *em* text with "
        "[a link](https://x.y) and ![img](u.png).\n\n"
        "- item one\n1. item two\n\n> quoted\n\n"
        "```python\ncode_block(1)\n```\n\n"
        "Inline `code` and <span>html</span>.\n\n"
        "Setext\n------\n\n[ref]: https://example.com\n"
    )
    assert markdown_to_text(md) == (
        "Title\n\nSome bold and em text with a link and img.\n\n"
        "item one\nitem two\n\nquoted\n\ncode_block(1)\n\n"
        "Inline code and html.\n\nSetext"
    )


def test_markdown_fence_preserves_markup_inside():
    md = "```\n# not a heading\n**not bold**\n```\n"
    assert markdown_to_text(md) == "# not a heading\n**not bold**"


def test_latex_golden():
    tex = (
        "% comment\n\\documentclass{article}\n"
        "\\usepackage{amsmath}\n\\begin{document}\n"
        "\\section{Intro}\nSome \\textbf{bold} and "
        "\\emph{\\textit{nested}} text, inline $e=mc^2$ and\n"
        "display $$\\int x$$ math.\n"
        "\\begin{itemize}\n\\item first\n\\item second\n\\end{itemize}\n"
        "\\begin{verbatim}\nraw %code$ \\here\n\\end{verbatim}\n"
        "End\\\\line.\n\\end{document}\n"
    )
    got = latex_to_text(tex)
    assert "amsmath" not in got and "article" not in got  # preamble gone
    assert got.startswith("Intro\n")
    assert "Some bold and nested text, inline <math> and\ndisplay "
    assert "<math> math." in got
    assert "first" in got and "second" in got
    assert "raw %code$ \\here" in got  # verbatim carved out untouched
    assert "End\nline." in got


def test_ipynb_both_nbformats():
    nb4 = to_ipynb_bytes([
        ("markdown", "# Hello\nsome *text*"),
        ("code", "print(1)\nprint(2)"),
        ("raw", "as-is"),
    ])
    assert ipynb_to_cells(nb4) == [
        ("markdown", "Hello\nsome text"),
        ("code", "print(1)\nprint(2)"),
        ("raw", "as-is"),
    ]
    v3 = json.dumps({"worksheets": [{"cells": [
        {"cell_type": "code", "input": ["x=1\n", "y=2"]},
        {"cell_type": "markdown", "source": ["## hd"]},
    ]}]}).encode()
    assert ipynb_to_cells(v3) == [("code", "x=1\ny=2"), ("markdown", "hd")]


def test_ipynb_contract_errors():
    for bad in (b"not json", b"[1,2]", b"{}",
                json.dumps({"cells": [{"source": "no type"}]}).encode(),
                json.dumps({"cells": [{"cell_type": "code",
                                       "source": 7}]}).encode(),
                b"\xff\xfe totally not utf8 json \x00"):
        with pytest.raises(ValueError):
            ipynb_to_cells(bad)


def test_spark_readers_and_isolation(spark, tmp_path):
    (tmp_path / "a.md").write_text("# T\n\nbody **a**\n")
    (tmp_path / "b.md").write_text("plain\n")
    md = read_markdown_corpus(spark, str(tmp_path / "*.md"))
    got = {r.path.rsplit("/", 1)[-1]: r.text for r in md.collect()}
    assert got == {"a.md": "T\n\nbody a", "b.md": "plain"}

    (tmp_path / "p.tex").write_text(
        "\\begin{document}\\section{S}hi\\end{document}")
    tex = read_latex_corpus(spark, str(tmp_path / "*.tex"))
    assert tex.collect()[0].text == "S\nhi"

    (tmp_path / "n1.ipynb").write_bytes(
        to_ipynb_bytes([("markdown", "# m"), ("code", "c=1")]))
    (tmp_path / "n2.ipynb").write_bytes(b"broken{")
    path = str(tmp_path / "*.ipynb")
    with pytest.raises(Exception, match="corrupt ipynb"):
        read_ipynb_corpus(spark, path).collect()
    cells = read_ipynb_corpus(spark, path, on_error="skip").collect()
    assert [(r.cell_index, r.cell_type, r.text)
            for r in sorted(cells, key=lambda r: r.cell_index)] == [
        (0, "markdown", "m"), (1, "code", "c=1")]


def test_ipynb_sweeps():
    """Truncation + mutation over the notebook JSON walker: contract
    exceptions or a decode, never a bare crash (markdown/LaTeX are
    total functions over text, so the sweeps only apply to the one
    structured format here)."""
    data = to_ipynb_bytes([("markdown", "# m *x*"), ("code", "c=1\n")])
    for n in range(len(data)):
        try:
            ipynb_to_cells(data[:n])
        except (ValueError, NotImplementedError):
            pass
    for pos in range(len(data)):
        for mut in (data[pos] ^ 0x01, 0x00, 0xFF):
            m = data[:pos] + bytes([mut]) + data[pos + 1:]
            try:
                ipynb_to_cells(m)
            except (ValueError, NotImplementedError):
                pass
