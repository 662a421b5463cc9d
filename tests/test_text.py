"""Text-analysis function tests: hash parity, tokenization truth tables,
language ID, quality bounds, shingles, simhash, winnowing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from web_crawler_spark.functions import text as T


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_md5_long_matches_hashlib(spark):
    for s in ["", "abc", "hello world", "ตัวอย่าง"]:
        expected = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        got = _one(spark, T.md5_long(F.lit(s)))
        assert got == expected, s


def test_token_counts_truth_table(spark):
    cases = [
        ("", 0, 0),
        ("hello", 1, 1),
        ("a  b c ", 3, 3),
        ("a b,c", 2, 4),  # ws: 'a','b,c'; regex: a b , c
        ("x1y", 1, 3),  # regex: x 1 y
    ]
    df = spark.createDataFrame([(s,) for s, _, _ in cases], ["s"])
    rows = df.select(
        "s",
        T.ws_token_count(F.col("s")).alias("ws"),
        T.regex_token_count(F.col("s")).alias("re"),
    ).collect()
    got = {r["s"]: (r["ws"], r["re"]) for r in rows}
    for s, ws, re_ in cases:
        assert got[s] == (ws, re_), s


def test_char_shingles_edges(spark):
    # shorter than k → empty (guards Spark's descending sequence(1,0))
    assert _one(spark, T.char_shingles(F.lit("abcd"), 5)) == []
    assert _one(spark, T.char_shingles(F.lit(""), 5)) == []
    assert _one(spark, T.char_shingles(F.lit("abcde"), 5)) == ["abcde"]
    # distinct: repeated gram collapses
    assert _one(spark, T.char_shingles(F.lit("aaaaaa"), 5)) == ["aaaaa"]


def test_lang_id(spark):
    cases = [
        ("the cat sat on the mat with a hat", "en"),
        ("der hund und die katze sind nicht auf der strasse", "de"),
        ("el perro y el gato es en la casa para una persona", "es"),
        ("le chien est dans la maison pour le chat avec une souris", "fr"),
        ("zzz qqq www", "und"),
        ("這是一個中文句子的測試文字樣本", "zh"),
    ]
    df = spark.createDataFrame(cases, ["s", "expected"])
    rows = df.select("expected", T.lang_id(F.col("s")).alias("pred")).collect()
    for r in rows:
        assert r["pred"] == r["expected"], r


def test_quality_score_bounds_and_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and the cat is on the mat " * 3
    bad = "!!! ### 123 456 789 $$$ %%% 000 111 ???"
    df = spark.createDataFrame([(good,), (bad,), ("",)], ["s"])
    rows = df.select(T.quality_score(F.col("s")).alias("q")).collect()
    scores = [r["q"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]


def test_simhash_identical_and_different(spark):
    a = "the quick brown fox jumps over the lazy dog"
    b = a  # identical
    c = "entirely unrelated content made of other characters"
    df = spark.createDataFrame([(a,), (b,), (c,)], ["s"])
    rows = df.select(T.simhash(F.col("s")).alias("sh")).collect()
    assert rows[0]["sh"] == rows[1]["sh"]
    assert rows[0]["sh"] != rows[2]["sh"]
    # fits in 60 bits, non-negative
    assert 0 <= rows[0]["sh"] < (1 << 60)


def test_winnow_expression_vs_table(spark):
    """The O(n log w) array-expression form and the explode+window table form
    must produce identical fingerprint sets."""
    from web_crawler_spark.operators.textdedup import winnow_table

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "short"),  # < k chars → no fingerprints
        (3, "exactly8"),  # exactly k → 1 gram → 1 fingerprint
        (4, "abcdefghij"),  # n_h=3 < w → single min
        (5, "a" * 50),  # degenerate repeats
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    expr_rows = (
        df.select(
            "doc_id", F.explode(T.winnow_fingerprints(F.col("text"), 8, 4)).alias("f")
        )
        .collect()
    )
    table_rows = winnow_table(df, "doc_id", "text", k=8, w=4).collect()
    expr_set = {(r["doc_id"], r["f"]) for r in expr_rows}
    table_set = {(r["doc_id"], r["fingerprint"]) for r in table_rows}
    assert expr_set == table_set
    assert not any(r["doc_id"] == 2 for r in table_rows)
    assert sum(1 for r in table_rows if r["doc_id"] == 3) == 1


def test_winnow_matches_naive_python(spark):
    """Pin the winnowing semantics against a direct per-window implementation."""
    text = "the quick brown fox jumps over it"
    k, w = 8, 4
    hashes = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(text) - k + 1)
    ]
    expected = sorted({min(hashes[j : j + w]) for j in range(len(hashes) - w + 1)})
    df = spark.createDataFrame([(text,)], ["text"])
    got = sorted(
        r["f"]
        for r in df.select(
            F.explode(T.winnow_fingerprints(F.col("text"), k, w)).alias("f")
        ).collect()
    )
    assert got == expected


def test_word_bigrams_and_nonblank_lines(spark):
    from web_crawler_spark.functions.text import nonblank_lines, word_bigrams

    rows = spark.createDataFrame(
        [
            (1, "The quick brown fox"),
            (2, "one"),          # <2 words: guard against sequence(1, 0)
            (3, ""),
            (4, "a b a b a b"),  # repeated bigrams keep multiplicity
            (5, "x\n\n  \nx\ny\n"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.bg, r.ls)
        for r in rows.select(
            "doc_id",
            word_bigrams(F.col("text")).alias("bg"),
            nonblank_lines(F.col("text")).alias("ls"),
        ).collect()
    }
    assert got[1][0] == ["the quick", "quick brown", "brown fox"]
    assert got[2][0] == []
    assert got[3][0] == []
    assert got[4][0] == ["a b", "b a", "a b", "b a", "a b"]
    assert got[5][1] == ["x", "x", "y"]  # blanks and whitespace-only dropped


def test_pii_redact_counts_and_sequencing(spark):
    """Emails, IPv4s, phones redacted with typed tokens; counts are taken
    on the text each pattern actually ran against (sequential passes)."""
    from web_crawler_spark.functions.text import pii_redact

    rows = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.example.org and 10.0.0.1 then +44 20 7946 0958 ok"),
            (2, "no pii at all"),
            (3, "two mails x@y.io z@w.co one ip 192.168.1.1"),
            (4, "ip-like 999.999.999.999 still matches the regex shape"),
        ],
        "id long, text string",
    ).select("id", pii_redact(F.col("text")).alias("r"))
    got = {r.id: r.r for r in rows.collect()}
    assert got[1].clean_text == "mail <EMAIL> and <IP> then <PHONE> ok"
    assert (got[1].n_email, got[1].n_ip, got[1].n_phone) == (1, 1, 1)
    assert got[2].clean_text == "no pii at all"
    assert (got[2].n_email, got[2].n_ip, got[2].n_phone) == (0, 0, 0)
    assert got[3].n_email == 2 and got[3].n_ip == 1
    # deliberately shape-based (like most published scrubbers): octet
    # ranges are not validated
    assert got[4].n_ip == 1 and "<IP>" in got[4].clean_text


def test_nonblank_lines_and_line_split_are_crlf_safe(spark):
    """CRLF documents: a visually blank \r\n line is blank, and identical
    lines with and without the \r ending are the same line (the Gopher
    dup-line fraction and C4 line dedup both depend on this)."""
    from pyspark.sql import functions as F

    from web_crawler_spark.functions.text import nonblank_lines
    from web_crawler_spark.operators.textdedup import line_dedupe

    crlf = "alpha\r\n\r\nbeta\r\nalpha"
    [r] = (
        spark.createDataFrame([(crlf,)], ["text"])
        .select(nonblank_lines(F.col("text")).alias("ls"))
        .collect()
    )
    assert r.ls == ["alpha", "beta", "alpha"]  # no \r residue, blank dropped

    docs = spark.createDataFrame(
        [(1, "shared line\r\nown one"), (2, "shared line\nown two")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedupe(docs).collect()}
    # the CRLF and LF spellings of "shared line" are ONE boiler key
    assert out[1].clean_text == "own one" and out[2].clean_text == "own two"
    assert out[1].n_removed == 1 and out[2].n_removed == 1
