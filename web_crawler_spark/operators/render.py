"""Block/inline text rendering (U16 — reference crawler/parser.py:113-178).

The reference's ``extract_text`` walks the parsed DOM recursively and
re-linearizes it with a small, quirky rule set that this operator
replicates exactly:

- ``script`` / ``style`` / ``noscript`` subtrees are removed before the
  walk (parser.py:123-125).
- A fixed set of **block** elements (parser.py:128-133) contributes its
  rendered text followed by a newline token — but ONLY when the block is
  itself nested inside another block (``in_block`` flag, parser.py:150-155);
  top-level blocks (direct children of ``body``/``html``, which are NOT in
  the block set) get no newline. This asymmetry is part of the observable
  contract.
- A ``span`` **outside** a ``<p>`` gets a newline after its text; a span
  inside a ``<p>`` is inline (parser.py:157-163).
- Every other element is inline: its text joins the flow with single
  spaces (the per-level ``' '.join``, parser.py:171).
- Text nodes are ``str.strip``-ed and dropped when empty (parser.py:141-144).
- Final cleanup: split on newlines, strip each line, drop empty lines,
  re-join with ``\\n`` (parser.py:174-178).

Spark-first shape: the renderer is pure Python per document — there is no
column-expression form for a recursive DOM walk — so it runs as ONE
Arrow-batched pandas UDF, linear in corpus size, embarrassingly parallel
(no shuffle, no state). The HTML tree comes from stdlib ``html.parser``
(BeautifulSoup is not in the container); the independent oracle twin in
``tests/oracle/render.py`` uses a regex tokenizer + iterative walk instead,
so the parity check compares two genuinely different implementations of
the same spec.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# parser.py:128-133 — the reference's exact block-element set. html/body/
# head are deliberately absent (that is what makes top-level <p> quirky).
BLOCK_ELEMENTS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "blockquote", "pre", "ul", "ol", "li", "table", "tr", "td", "th",
    "dl", "dt", "dd", "form", "fieldset", "figure", "figcaption",
}

# parser.py:123-125 — decomposed before the walk.
DROP_ELEMENTS = {"script", "style", "noscript"}

# HTML void elements never get a closing tag; without this the stack walk
# would swallow following siblings as children.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "source", "track", "wbr",
}


class _Node:
    __slots__ = ("name", "children")

    def __init__(self, name: str | None):
        self.name = name
        self.children: list = []  # str (text) or _Node


class _TreeBuilder(HTMLParser):
    """Minimal tolerant DOM: mismatched end tags close the nearest matching
    open element (the same recovery BeautifulSoup's html.parser tree builder
    applies on the well-formed inputs this engine materializes)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node(None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag)
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(_Node(tag))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        self._stack[-1].children.append(data)


def render_text(html: str) -> str:
    """Render one HTML document to text per the reference's rules
    (parser.py:113-178). Pure function; used by the pandas UDF below and
    directly unit-testable."""
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()

    def walk(elem: _Node, in_block: bool = False, inside_p: bool = False) -> str:
        result: list[str] = []
        for child in elem.children:
            if isinstance(child, str):
                text = child.strip()
                if text:
                    result.append(text)
                continue
            if child.name in DROP_ELEMENTS:
                continue
            if child.name in BLOCK_ELEMENTS:
                child_text = walk(child, in_block=True, inside_p=(child.name == "p"))
                if child_text:
                    result.append(child_text)
                    if in_block:
                        result.append("\n")
            elif child.name == "span" and not inside_p:
                child_text = walk(child, in_block=in_block, inside_p=inside_p)
                if child_text:
                    result.append(child_text)
                    result.append("\n")
            else:
                child_text = walk(child, in_block=in_block, inside_p=inside_p)
                if child_text:
                    result.append(child_text)
        return " ".join(result) if result else ""

    text = walk(tb.root)
    lines = [line.strip() for line in text.split("\n")]
    return "\n".join(line for line in lines if line)


def render_block_inline(
    df: DataFrame, *, content_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Add ``out_col`` = block/inline-rendered text of ``content_col``.

    One Arrow-batched pandas UDF — no shuffle, no driver involvement;
    scales linearly with the corpus and partitions freely.
    """

    @F.pandas_udf("string")
    def _render(s: pd.Series) -> pd.Series:
        return s.map(lambda x: render_text(x) if x is not None else None)

    return df.withColumn(out_col, _render(F.col(content_col)))
