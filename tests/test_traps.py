"""Crawler-trap detection tests: shape parsing, signal arithmetic, and
the trap decision on crafted hosts."""

from __future__ import annotations

from web_crawler_spark.operators.traps import detect_url_traps, url_shape


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_url_shape_columns(spark):
    rows = {
        r.url: r
        for r in url_shape(
            _urls(
                spark,
                [
                    "https://a.example/x/y/z?q=1#frag",
                    "http://b.example/",
                    "https://c.example/a/b/a/b",
                    "https://d.example",
                ],
            )
        ).collect()
    }
    r = rows["https://a.example/x/y/z?q=1#frag"]
    assert (r.host, r.path, r.depth, r.dup_segments, r.has_params) == (
        "a.example", "/x/y/z", 3, 0, True,
    )
    r = rows["http://b.example/"]
    assert (r.host, r.path, r.depth, r.has_params) == ("b.example", "/", 0, False)
    r = rows["https://c.example/a/b/a/b"]
    assert (r.depth, r.dup_segments) == (4, 2)
    # bare host, no path at all
    r = rows["https://d.example"]
    assert (r.host, r.path, r.depth) == ("d.example", "", 0)


def test_query_variant_trap(spark):
    # 30 URLs over 2 distinct paths -> variant_bp 150000 >= 30000 -> trap
    trap = [f"https://t.example/p{i % 2}?sess={i}" for i in range(30)]
    # 30 URLs over 30 paths -> 10000 bp -> clean
    clean = [f"https://c.example/item/{i}" for i in range(30)]
    out = {r.host: r for r in detect_url_traps(_urls(spark, trap + clean)).collect()}
    t = out["t.example"]
    assert t.is_trap and t.variant_bp == 150000 and t.n_paths == 2
    assert t.n_param_urls == 30
    c = out["c.example"]
    assert not c.is_trap and c.variant_bp == 10000


def test_loop_segment_trap_and_min_urls_gate(spark):
    loopy = [f"https://l.example/a/{i}/a/{i}" for i in range(25)]
    # same shape but below min_urls: not flagged
    small = [f"https://s.example/a/{i}/a/{i}" for i in range(5)]
    out = {
        r.host: r for r in detect_url_traps(_urls(spark, loopy + small)).collect()
    }
    assert out["l.example"].is_trap and out["l.example"].max_dup_segments == 2
    assert not out["s.example"].is_trap
    assert out["s.example"].max_dup_segments == 2  # signal present, gate holds


def test_thresholds_are_parameters(spark):
    urls = [f"https://h.example/p{i % 2}?x={i}" for i in range(30)]
    strict = detect_url_traps(_urls(spark, urls), variant_ratio_bp=200000).collect()
    assert not strict[0].is_trap  # 150000 < 200000
    loose = detect_url_traps(_urls(spark, urls), min_urls=31).collect()
    assert not loose[0].is_trap  # n_urls gate
