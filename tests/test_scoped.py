"""Scoped-element extraction semantics (reference parser.py:19-112):
id-before-class precedence, first-in-document-order, multi-class
membership, full-page fallback, and the sorted-20 class-sample diagnostic
as error-as-data."""

from __future__ import annotations

from web_crawler_spark.operators.scoped import scoped_extract


def _elements(spark):
    rows = [
        # page A: elements in document order
        ("A", 1, "top", ["hero", "main"], "first"),
        ("A", 2, "mid", ["content", "main"], "second"),
        ("A", 3, "bot", ["content"], "third"),
        # page B: many classes for the diagnostic sample
        ("B", 1, "b1", [f"cls{i:02d}" for i in range(30)], "b-text"),
    ]
    return spark.createDataFrame(
        rows, "page_url string, elem_seq long, elem_id string, classes array<string>, text string"
    )


def _run(spark, scopes_rows):
    scopes = spark.createDataFrame(
        scopes_rows, "page_url string, scope_class string, scope_id string"
    )
    return {
        (r["page_url"], r["scope_class"], r["scope_id"]): r
        for r in scoped_extract(_elements(spark), scopes).collect()
    }


def test_class_match_takes_first_in_document_order(spark):
    out = _run(spark, [("A", "content", None)])
    r = out[("A", "content", None)]
    assert (r["status"], r["matched_by"], r["elem_seq"], r["text"]) == ("ok", "class", 2, "second")


def test_id_beats_class(spark):
    # 'bot' is later in the document than any 'content' class hit, but id wins
    out = _run(spark, [("A", "content", "bot")])
    r = out[("A", "content", "bot")]
    assert (r["matched_by"], r["elem_seq"], r["text"]) == ("id", 3, "third")


def test_multi_class_membership(spark):
    out = _run(spark, [("A", "main", None)])
    assert out[("A", "main", None)]["elem_seq"] == 1  # hero main → member match


def test_no_scope_returns_full_page_in_order(spark):
    out = _run(spark, [("A", None, None)])
    assert out[("A", None, None)]["text"] == "first\nsecond\nthird"
    assert out[("A", None, None)]["matched_by"] == "page"


def test_miss_carries_sorted_20_class_sample(spark):
    out = _run(spark, [("B", "nope", None), ("A", None, "ghost")])
    b = out[("B", "nope", None)]
    assert b["status"] == "scope_miss" and b["text"] is None
    sample = b["available_classes"].split(", ")
    assert sample == sorted(f"cls{i:02d}" for i in range(30))[:20]  # parser.py:104
    a = out[("A", None, "ghost")]
    assert a["status"] == "scope_miss"
    assert a["available_classes"] == "content, hero, main"


def test_one_row_per_request(spark):
    reqs = [("A", "content", None), ("A", None, None), ("B", "cls05", None)]
    out = _run(spark, reqs)
    assert len(out) == len(reqs)
