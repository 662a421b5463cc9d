"""URL function truth tables, ported from the reference's own unit tests:

- normalize cases       reference: backend/tests/test_link_extractor.py:7-21
- internal detection    reference: backend/tests/test_link_extractor.py:24-30
- anchor strip          reference: backend/tests/test_link_extractor.py:33-41
- URL validity          reference: backend/tests/test_fetcher.py:7-20
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.functions import urls as U

BASE = "https://example.com/dir/page.html"

NORMALIZE_CASES = [
    # (href, base, expected canonical with fragment stripped)
    ("/about", "https://example.com/dir/page.html", "https://example.com/about"),
    ("sub.html", "https://example.com/dir/page.html", "https://example.com/dir/sub.html"),
    ("//cdn.example.org/x.js", "https://example.com/p", "https://cdn.example.org/x.js"),
    ("//cdn.example.org/x.js", "http://example.com/p", "http://cdn.example.org/x.js"),
    ("http://other.com/q", "https://example.com/p", "http://other.com/q"),
    ("https://example.com/a#frag", "https://example.com/", "https://example.com/a"),
    ("?q=1", "https://example.com/dir/page.html", "https://example.com/dir/page.html?q=1"),
]


def test_canonicalize_truth_table(spark):
    df = spark.createDataFrame(
        [(h, b) for h, b, _ in NORMALIZE_CASES], ["href", "base"]
    )
    got = [
        r.c
        for r in df.select(
            U.canonicalize(F.col("href"), F.col("base")).alias("c")
        ).collect()
    ]
    assert got == [e for _, _, e in NORMALIZE_CASES]


def test_py_canonicalize_matches_spark_udf(spark):
    # the oracle-side helper must agree with the Spark column function
    for h, b, e in NORMALIZE_CASES:
        assert U.py_canonicalize(h, b) == e


def test_remove_anchors(spark):
    df = spark.createDataFrame(
        [("https://e.com/a#x",), ("https://e.com/a",), ("https://e.com/#",)],
        ["u"],
    )
    got = [r.c for r in df.select(U.remove_anchors(F.col("u")).alias("c")).collect()]
    assert got == ["https://e.com/a", "https://e.com/a", "https://e.com/"]


def test_is_internal_www_not_stripped(spark):
    # reference semantics: www.example.com != example.com (link_extractor.py:44-58)
    df = spark.createDataFrame(
        [
            ("https://example.com/a", "https://example.com/b", True),
            ("https://www.example.com/a", "https://example.com/b", False),
            ("https://other.com/a", "https://example.com/b", False),
        ],
        ["u", "b", "expected"],
    )
    rows = df.select(
        U.is_internal(F.col("u"), F.col("b")).alias("got"), "expected"
    ).collect()
    for r in rows:
        assert r.got == r.expected


def test_url_validity(spark):
    cases = [
        ("https://example.com", True),
        ("http://example.com/path", True),
        ("ftp://example.com", False),
        ("not-a-url", False),
        ("", False),
        ("   ", False),
        ("javascript:void(0)", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r.v for r in df.select(U.is_valid_url(F.col("u")).alias("v")).collect()]
    assert got == [e for _, e in cases]
    # oracle-side helper agrees
    for u, e in cases:
        assert U.py_is_valid_url(u) == e


def test_skip_list(spark):
    cases = [
        ("#top", True),
        ("mailto:x@y.z", True),
        ("tel:+123", True),
        ("javascript:void(0)", True),
        ("", True),
        ("/real/path", False),
        ("https://e.com", False),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["h"])
    got = [r.v for r in df.select(U.is_skippable_href(F.col("h")).alias("v")).collect()]
    assert got == [e for _, e in cases]
    for h, e in cases:
        assert U.py_is_skippable(h) == e


def test_host_parity_python_vs_spark(spark):
    urls = [
        "https://example.com/a",
        "https://www.example.com:8080/a",
        "http://user@host.org/p",
        "https://sub.domain.co.uk/x?y=1#z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = [r.h for r in df.select(U.url_host(F.col("u")).alias("h")).collect()]
    assert got == [U.py_host(u) for u in urls]


def test_sanitize_filename(spark):
    df = spark.createDataFrame(
        [
            ("https://e.com/imgs/photo.jpg",),
            ("https://e.com/imgs/we<ird>.png",),
            ("https://e.com/",),
            ("https://e.com",),
            ("https://e.com?x=1",),
            ("https://e.com/" + "a" * 150 + ".png",),
        ],
        ["u"],
    )
    got = [r.f for r in df.select(U.sanitize_filename(F.col("u")).alias("f")).collect()]
    assert got[0] == "photo.jpg"
    assert got[1] == "we_ird_.png"
    assert got[2] == "image"
    # path-less URLs must yield the reference default, never the hostname
    assert got[3] == "image"
    assert got[4] == "image"
    assert got[5] == "a" * 100 + ".png"


def test_image_extension(spark):
    df = spark.createDataFrame(
        [
            ("https://e.com/x.PNG", None),
            ("https://e.com/x", "image/webp"),
            ("https://e.com/x.txt", None),
        ],
        ["u", "ct"],
    )
    got = [
        r.e
        for r in df.select(
            U.image_extension(F.col("u"), F.col("ct")).alias("e")
        ).collect()
    ]
    assert got == [".png", ".webp", ".jpg"]


def test_domain_and_path_slug(spark):
    df = spark.createDataFrame(
        [
            ("https://www.my-site.co.uk/blog/post-1",),
            ("https://example.com/",),
        ],
        ["u"],
    )
    got = [r.s for r in df.select(U.domain_and_path_slug(F.col("u")).alias("s")).collect()]
    assert got == ["my-site_co_uk_blog", "example_com"]


def test_remove_anchors_strips_across_newlines(spark):
    """Hostile hrefs with an embedded newline after '#': the engine must
    agree with the Python twin's split('#', 1)[0] — without DOTALL the
    regex leaves '\nb' behind and url_hash forks between engine and oracle."""
    from pyspark.sql import functions as F

    from web_crawler_spark.functions.urls import py_canonicalize, remove_anchors

    raw = "https://h.example/p#a\nb"
    [r] = (
        spark.createDataFrame([(raw,)], ["u"])
        .select(remove_anchors(F.col("u")).alias("c"))
        .collect()
    )
    assert r.c == "https://h.example/p"
    assert r.c == py_canonicalize(raw, None)
