"""Bit-exact parity of the pure-Python XXH64 with Spark's xxhash64 builtin —
the foundation of oracle/engine ordering agreement."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web_crawler_spark.functions.hashing import xxh64_str


def test_xxh64_parity_spark(spark):
    samples = [
        "",
        "a",
        "abc",
        "https://example.com/",
        "https://www.example.com/a/b?x=1#f",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "v" * 33,
        "日本語テキスト and ไทย",
        "q" * 1000,
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == xxh64_str(s), s


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200))
def test_xxh64_pure_python_is_deterministic(s):
    assert xxh64_str(s) == xxh64_str(s)
    assert -(2**63) <= xxh64_str(s) < 2**63
