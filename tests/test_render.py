"""U16 block/inline render (reference crawler/parser.py:113-178)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle.render import render_text_oracle
from web_crawler_spark.operators.render import render_block_inline, render_text


# Hand-computed expectations pinning each reference quirk.
CASES = [
    # block nesting: newline only when the block is inside another block
    ("<div><p>a</p><p>b</p></div>", "a\nb"),
    # top-level blocks (children of body, which is NOT a block) — no newline
    ("<html><body><p>a</p><p>b</p></body></html>", "a b"),
    # span OUTSIDE <p> gets a newline, span INSIDE <p> is inline
    ("<div><p>x <span>in</span> y</p><span>out</span><p>z</p></div>",
     "x in y\nout\nz"),
    # script/style/noscript subtrees dropped entirely
    ("<div><style>.a{}</style><p>kept</p><script>var x=1;</script></div>",
     "kept"),
    ("<div><noscript><p>gone</p></noscript><p>kept</p></div>", "kept"),
    # inline elements space-join; text nodes stripped, empties dropped
    ("<div><p>a <b>b</b> <i>c</i></p></div>", "a b c"),
    # empty blocks contribute nothing (no stray newlines)
    ("<div><p></p><p>only</p></div>", "only"),
    # list rendering: each li is a block inside ul
    ("<div><ul><li>one</li><li>two</li></ul></div>", "one\ntwo"),
    # entity decoding
    ("<div><p>a &amp; b</p></div>", "a & b"),
    # nested blocks
    ("<div><div><p>deep</p></div><p>after</p></div>", "deep\nafter"),
]


@pytest.mark.parametrize("html,expected", CASES)
def test_render_pinned(html, expected):
    assert render_text(html) == expected


@pytest.mark.parametrize("html,expected", CASES)
def test_oracle_twin_agrees(html, expected):
    assert render_text_oracle(html) == expected


def test_tolerant_close_and_void():
    # mismatched </i> must not swallow siblings; <br> is void
    html = "<div><p>a</p></i><p>b</p><span>c<br>d</span></div>"
    out = render_text(html)
    assert out == render_text_oracle(html)
    assert out == "a\nb\nc d"


def test_spark_render_matches_twin(spark):
    htmls = [h for h, _ in CASES] + [
        "<html><head><title>T</title></head><body><div><h1>H</h1>"
        "<p>Brand <b>B</b> &amp; <span>S</span>.</p><span>badge</span>"
        "</div><p>tail</p></body></html>"
    ]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(htmls)], "id long, html string")
    got = {
        r["id"]: r["text"]
        for r in render_block_inline(df).select("id", "text").collect()
    }
    for i, h in enumerate(htmls):
        assert got[i] == render_text_oracle(h), f"case {i}: {h!r}"


def test_registry_query_matches_expected(spark, tmp_path):
    """The contract query at sf0.001 vs the independent twin."""
    from web_crawler_spark.plans.analytics import q_block_inline_render

    sf = "/root/testdata/sf0.001"
    rows = q_block_inline_render(spark, sf).collect()
    assert rows, "no rows"
    import pandas as pd

    from web_crawler_spark.plans.analytics import (
        _render_fixture_html,
    )

    p = pd.read_parquet(f"{sf}/part.parquet")
    expected = {}
    for r in p.itertuples():
        html = _render_fixture_html(
            {
                "pk": str(int(r.p_partkey)),
                "nm": r.p_name,
                "br": r.p_brand,
                "ty": r.p_type,
                "sz": str(int(r.p_size)),
            }
        )
        expected[int(r.p_partkey)] = render_text_oracle(html)
    assert len(rows) == len(expected)
    for r in rows:
        assert r["text"] == expected[r["doc_id"]]


def test_render_plan_has_no_shuffle(spark):
    """The renderer is a narrow map — any Exchange in its plan would be a
    scale bug (the operator must stay embarrassingly parallel)."""
    df = spark.createDataFrame([(1, "<div><p>a</p></div>")], "id long, html string")
    plan = render_block_inline(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
