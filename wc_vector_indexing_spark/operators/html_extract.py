"""HTML → main-text extraction: the crawl-ingestion step BEFORE every
text operator in the pipeline (dedup, quality, LM scoring all assume
extracted text — this module produces it from raw crawled HTML).

Algorithm: block segmentation + link-density boilerplate classification,
the published jusText/Arc90-readability family of heuristics
(Pomikálek 2011 "Removing boilerplate and duplicate content from web
corpora"; both are public knowledge and ship in every crawl pipeline):

1. parse HTML with the stdlib ``html.parser`` into BLOCKS — text runs
   delimited by block-level tags — tracking per block the visible
   characters, the characters inside ``<a>`` (link chars), and the
   heading flag; ``script``/``style``/``noscript``/``template`` subtrees
   contribute nothing
2. classify each block:
     * bad   — link_density > max_link_density (menus, footers, share
               bars: text that is mostly links is navigation, not prose)
     * short — fewer than ``min_chars`` visible chars (isolated dates,
               buttons, labels)
     * good  — long enough, link-sparse prose
3. neighbor smoothing (the jusText context pass, simplified): a short
   block BETWEEN two good blocks is kept (it is a short paragraph of
   the article); everything else short is dropped
4. the document's text = kept blocks joined with blank lines

Spark shape: one Arrow-batched ``mapInPandas`` pass — parsing is
per-document independent, so the 100 TB crawl streams through with
ZERO shuffle, exactly like the other codec seams (multimodal, WET).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# tags that delimit blocks (HTML5 block-level / sectioning content)
BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "aside", "header", "footer",
    "nav", "ul", "ol", "li", "table", "tr", "td", "th", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "figure", "figcaption",
    "br", "hr", "form", "fieldset", "dl", "dt", "dd",
}
# subtrees that contribute no visible text at all
DROP_TAGS = {"script", "style", "noscript", "template", "head", "svg", "iframe"}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


@dataclass
class Block:
    text: str = ""
    link_chars: int = 0
    heading: bool = False
    parts: list = field(default_factory=list)

    def finish(self) -> "Block":
        self.text = "".join(self.parts).strip()
        return self


class _BlockParser(HTMLParser):
    """Stream HTML into visible-text blocks (algorithm step 1)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._cur = Block()
        self._drop_depth = 0
        self._link_depth = 0
        self._heading = False

    def _flush(self):
        b = self._cur.finish()
        if b.text:
            b.heading = self._heading
            self.blocks.append(b)
        self._cur = Block()

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            self._heading = tag in HEADING_TAGS

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()
            self._heading = False

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._cur.parts.append(data)
        if self._link_depth:
            self._cur.link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def html_blocks(html: str) -> list[Block]:
    p = _BlockParser()
    p.feed(html or "")
    p.close()
    return p.blocks


def classify(
    blocks: list[Block],
    max_link_density: float = 0.2,
    min_chars: int = 25,
) -> list[str]:
    """Per-block 'good' / 'short' / 'bad' labels, then the neighbor
    smoothing pass (step 3). Headings attach to the following block:
    a heading right before a good block is good (article section
    titles survive; orphan headings in nav chrome do not)."""
    labels = []
    for b in blocks:
        n = len(b.text)
        density = (b.link_chars / n) if n else 1.0
        if density > max_link_density:
            labels.append("bad")
        elif n < min_chars:
            labels.append("short")
        else:
            labels.append("good")
    out = list(labels)
    for i, lab in enumerate(labels):
        if lab != "short":
            continue
        prev_good = any(l == "good" for l in labels[:i][-2:])
        next_good = any(l == "good" for l in labels[i + 1 : i + 3])
        if blocks[i].heading:
            # a heading belongs to the block it titles: keep it only
            # when the IMMEDIATELY following block is prose (orphan
            # headings inside nav chrome never precede good blocks)
            if i + 1 < len(labels) and labels[i + 1] == "good":
                out[i] = "good"
        elif prev_good and next_good:
            out[i] = "good"
    return out


def extract_main_text(html: str, **kw) -> str:
    blocks = html_blocks(html)
    labels = classify(blocks, **kw)
    return "\n\n".join(
        b.text for b, lab in zip(blocks, labels) if lab == "good"
    )


HTML_EXTRACT_SCHEMA_SUFFIX = [
    T.StructField("text", T.StringType()),
    T.StructField("n_blocks", T.IntegerType()),
    T.StructField("n_good", T.IntegerType()),
    T.StructField("n_boilerplate", T.IntegerType()),
]


def extract_documents(
    df: DataFrame,
    html_col: str = "html",
    max_link_density: float = 0.2,
    min_chars: int = 25,
) -> DataFrame:
    """Distributed extraction: every column except ``html_col`` passes
    through; adds (text, n_blocks, n_good, n_boilerplate). One Arrow
    pass (mapInPandas) — the operator a 100 TB WARC scan feeds
    directly. Zero-shuffle when the input is already fanned out (a wide
    scan, a post-exchange frame); an under-parallel narrow input (one
    small file → one split) pays one round-robin repartition first —
    see functions/partitioning.fan_out for the exact guard."""
    import pandas as pd

    from wc_vector_indexing_spark.functions.partitioning import fan_out

    # the per-row parse/classify cost is 10-100x the scan cost and a
    # small corpus arrives as ONE scan partition — spread it across the
    # session's cores (no-op at real scale, guide §4 column-pruning
    # still applies: only html + passthrough columns cross)
    df = fan_out(df)
    keep = [f for f in df.schema.fields if f.name != html_col]
    out_schema = T.StructType(list(keep) + HTML_EXTRACT_SCHEMA_SUFFIX)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            texts, nb, ng, nbad = [], [], [], []
            for html in pdf[html_col]:
                blocks = html_blocks(html)
                labels = classify(blocks, max_link_density, min_chars)
                texts.append(
                    "\n\n".join(
                        b.text for b, lab in zip(blocks, labels) if lab == "good"
                    )
                )
                nb.append(len(blocks))
                ng.append(sum(1 for lab in labels if lab == "good"))
                nbad.append(sum(1 for lab in labels if lab == "bad"))
            out = pdf[[f.name for f in keep]].copy()
            out["text"] = texts
            out["n_blocks"] = pd.array(nb, dtype="int32")
            out["n_good"] = pd.array(ng, dtype="int32")
            out["n_boilerplate"] = pd.array(nbad, dtype="int32")
            yield out

    return df.mapInPandas(run, schema=out_schema)
