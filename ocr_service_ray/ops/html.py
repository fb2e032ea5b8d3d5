"""HTML main-content extraction — boilerplate stripping via
text-density DOM heuristics (the Readability/trafilatura-style node
scoring named by the north star; no external parser — stdlib
``html.parser``).

Model: parse the page into BLOCK candidates (one per block-level
element holding direct text), score each block by the two classic
density signals —

- ``text_len``: total character count of the block's text;
- ``link_density``: fraction of that text inside ``<a>`` descendants
  (navigation/ad blocks are link-dominated);

and keep blocks with ``text_len >= min_text_len`` and
``link_density < max_link_density``. The main content is the kept
blocks' texts joined with a blank line, in document order. This is
the standard boilerplate discriminator: navs, footers, ad units and
"related links" lists are short and/or link-heavy, article prose is
long and link-sparse.

Ray-Data-first: a stateless ``map_batches`` stage (one compiled
parser per call — HTML parsing is inherently per-document, like any
extraction engine); the batch function is the unit of parallelism
and the streaming executor pipelines it like every other map. At
100 TB the page payload never crosses the stage boundary — only the
extracted text does.

Whitespace canon: text nodes are whitespace-normalized per node
(runs → single space, trimmed) and concatenated with single spaces —
deterministic for any input formatting, which is what makes the
extraction exactly oracle-checkable on template-generated pages.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

BLOCK_TAGS = {
    "p", "div", "article", "section", "li", "td", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "nav", "footer",
    "header", "aside",
}
SKIP_TAGS = {"script", "style", "noscript", "template"}
_WS = re.compile(r"\s+")


class _BlockCollector(HTMLParser):
    """Collects (text, link_text_len) per innermost block element."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (text, link_chars)
        self._stack: list[list] = []  # open blocks: [parts, link_chars]
        self._skip_depth = 0
        self._link_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._stack.append([[], 0])

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS and self._stack:
            parts, link_chars = self._stack.pop()
            text = " ".join(p for p in parts if p)
            if text:
                self.blocks.append((text, link_chars))

    def handle_data(self, data):
        if self._skip_depth or not self._stack:
            return
        norm = _WS.sub(" ", data).strip()
        if not norm:
            return
        # text accrues to the INNERMOST open block — nested blocks
        # (div > p) score their own text, not their children's
        self._stack[-1][0].append(norm)
        if self._link_depth:
            self._stack[-1][1] += len(norm)


def extract_main_content(
    html: str, min_text_len: int = 30, max_link_density: float = 0.3
) -> str:
    """Boilerplate-stripped main text of one page (block scoring as in
    the module docstring). Deterministic pure function."""
    parser = _BlockCollector()
    parser.feed(html)
    parser.close()
    kept = []
    for text, link_chars in parser.blocks:
        if len(text) < min_text_len:
            continue
        if link_chars / len(text) >= max_link_density:
            continue
        kept.append(text)
    return "\n\n".join(kept)


def strip_boilerplate(ds, html_col: str = "html", out_col: str = "main_text",
                      min_text_len: int = 30, max_link_density: float = 0.3):
    """Dataset stage: html column → extracted main-content column
    (payload dropped — the page never crosses the stage boundary)."""

    def run(batch: pa.Table) -> pa.Table:
        texts = [
            extract_main_content(h, min_text_len, max_link_density)
            for h in batch[html_col].to_pylist()
        ]
        return batch.drop_columns([html_col]).append_column(
            out_col, pa.array(texts, pa.string())
        )

    return ds.map_batches(run, batch_format="pyarrow")


def synthesize_page(doc_id: int, text: str) -> str:
    """Deterministic boilerplate-wrapped page for a document: nav,
    a doc_id-dependent number of ad units, the article, a link-heavy
    "related" list and a footer. The template is shared with the SQL
    oracle, which asserts that :func:`extract_main_content` recovers
    EXACTLY the article text through all of it."""
    nav_items = "".join(
        f'<a href="/s{i}">Section {i}</a> ' for i in range(2 + doc_id % 4)
    )
    ads = "".join(
        f'<div class="ad">Hot deal {i}! <a href="/buy{i}">buy now</a></div>'
        for i in range(doc_id % 3)
    )
    related = "".join(
        f'<li><a href="/r{i}">Related story {i} you may like</a></li>'
        for i in range(3)
    )
    return (
        f"<html><head><title>Doc {doc_id}</title></head><body>"
        f"<nav>{nav_items}</nav>{ads}"
        f"<article><p>{text}</p></article>"
        f'<aside><ul>{related}</ul></aside>'
        f'<footer><a href="/about">About</a> <a href="/tos">Terms</a> '
        f"© 2026 Example Corp</footer></body></html>"
    )


def synthesize_pages(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """documents → {doc_id, html} via the shared template."""

    def to_pages(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        return pa.table(
            {
                "doc_id": b[id_col],
                "html": pa.array(
                    [synthesize_page(int(i), t) for i, t in zip(ids, texts)],
                    pa.string(),
                ),
            }
        )

    return docs_ds.map_batches(to_pages, batch_format="pyarrow")
