"""Independent oracle twin of the U16 block/inline renderer.

Same spec as ``web_crawler_spark/operators/render.py`` (reference
crawler/parser.py:113-178) but a genuinely different implementation: a
regex tokenizer driving a single streaming pass with an explicit frame
stack, instead of an ``html.parser`` tree plus recursive walk. The
engine's recursive per-level ``' '.join`` with empty-subtree pruning is
equivalent to one flat space-join of the emitted token stream (join is
associative and empty pieces are pruned at every level), which is what
this pass produces.
"""

from __future__ import annotations

import html as _html
import re

BLOCK_ELEMENTS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "blockquote", "pre", "ul", "ol", "li", "table", "tr", "td", "th",
    "dl", "dt", "dd", "form", "fieldset", "figure", "figcaption",
}
DROP_ELEMENTS = {"script", "style", "noscript"}
VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "source", "track", "wbr",
}

_TOKEN = re.compile(r"<!--.*?-->|<[^>]*>|[^<]+", re.DOTALL)
_TAG = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")


def render_text_oracle(doc: str) -> str:
    out: list[str] = []
    # frame: (tag, close_action, entry_len) where close_action is applied
    # only if the subtree emitted anything; child-context flags ride on the
    # stack as the current (in_block, inside_p) pair.
    frames: list[tuple[str, str | None, int]] = []
    ctx: list[tuple[bool, bool]] = [(False, False)]
    drop_depth = 0

    def close_top() -> None:
        tag, action, entry_len = frames.pop()
        ctx.pop()
        if action and len(out) > entry_len:
            out.append("\n")

    for m in _TOKEN.finditer(doc):
        tok = m.group(0)
        if tok.startswith("<!--"):
            continue
        if tok.startswith("</"):
            name_m = _TAG.match(tok)
            if not name_m:
                continue
            name = name_m.group(1).lower()
            if drop_depth:
                if name in DROP_ELEMENTS:
                    drop_depth -= 1
                continue
            if any(f[0] == name for f in frames):
                while frames and frames[-1][0] != name:
                    close_top()
                close_top()
            continue
        if tok.startswith("<"):
            name_m = _TAG.match(tok)
            if not name_m:
                continue
            name = name_m.group(1).lower()
            if drop_depth:
                if name in DROP_ELEMENTS:
                    drop_depth += 1
                continue
            if name in DROP_ELEMENTS:
                if not tok.rstrip(">").endswith("/"):
                    drop_depth += 1
                continue
            if name in VOID or tok.rstrip(">").endswith("/"):
                continue
            in_block, inside_p = ctx[-1]
            if name in BLOCK_ELEMENTS:
                action = "nl" if in_block else None
                ctx.append((True, name == "p"))
            elif name == "span" and not inside_p:
                action = "nl"
                ctx.append((in_block, inside_p))
            else:
                action = None
                ctx.append((in_block, inside_p))
            frames.append((name, action, len(out)))
            continue
        if drop_depth:
            continue
        text = _html.unescape(tok).strip()
        if text:
            out.append(text)

    while frames:
        close_top()

    flat = " ".join(out)
    lines = [line.strip() for line in flat.split("\n")]
    return "\n".join(line for line in lines if line)
