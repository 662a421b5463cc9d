"""Dedup operator tests: exact clusters, Jaccard semantics, MinHash-LSH
recall/precision on crafted near-dups, SimHash pigeonhole exactness, and
the generic skew-safe two-phase top-k."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from web_crawler_spark.operators import textdedup as TD
from web_crawler_spark.operators.politeness import two_phase_topk

BASE = "the quick brown fox jumps over the lazy dog while the band plays on"
NEAR = BASE.replace("lazy", "hazy")  # one-char shingle neighborhood change
OTHER = "completely different material speaking about unrelated things entirely"


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE), (5, "tiny")],
        ["doc_id", "text"],
    )


def test_exact_dupes(spark):
    rows = TD.exact_dupes(_docs(spark), "doc_id", "text").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rep_id"] == 1 and r["n_copies"] == 2 and r["member_ids"] == [1, 4]


def test_ngram_jaccard_pairs(spark):
    pairs = TD.ngram_jaccard_pairs(
        _docs(spark), "doc_id", "text", k=5, threshold=0.5
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in pairs}
    # exact duplicate pair has J = 1
    assert got[(1, 4)]["jaccard"] == 1.0
    assert got[(1, 4)]["n_inter"] == got[(1, 4)]["n_union"]
    # near pair passes, unrelated doc absent
    assert (1, 2) in got and (2, 4) in got
    assert not any(3 in p for p in got)


def test_minhash_candidates_confirmed_by_exact(spark):
    d = _docs(spark)
    mh = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
        for r in TD.minhash_dedupe(d, "doc_id", "text", threshold=0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
        for r in TD.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.5).collect()
    }
    # no false positives, and counts agree with the exact computation
    for pair, counts in mh.items():
        assert exact[pair] == counts
    # identical docs always collide in every band → always found
    assert (1, 4) in mh


def test_simhash_band_recall_is_exact(spark):
    """Pigeonhole: band candidates at bands=max_hamming+1 find exactly the
    brute-force hamming ≤ k pairs."""
    d = _docs(spark)
    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in TD.simhash_pairs(d, "doc_id", "text", max_hamming=8, bands=12).collect()
    }
    sh = {r["doc_id"]: r["sh"] for r in TD.simhash_table(d, "doc_id", "text").collect()}
    brute = {}
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin(sh[i] ^ sh[j]).count("1")
                if h <= 8:
                    brute[(i, j)] = h
    assert banded == brute
    assert banded[(1, 4)] == 0  # identical docs


def test_two_phase_topk_equals_naive_window(spark):
    df = spark.range(2000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.col("id").alias("tie"),
    )
    order = [F.col("v").desc(), F.col("tie").asc()]
    fast = two_phase_topk(df, ["k"], order, 5, F.xxhash64("tie"), 4)
    w = Window.partitionBy("k").orderBy(*order)
    naive = (
        df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_max_df_prunes_stop_shingles(spark):
    """A shingle present in every doc is dropped by the frequency cut and no
    longer connects otherwise-dissimilar docs."""
    common = "zzzzz"  # one shared shingle across all docs
    d = spark.createDataFrame(
        [(1, common + " abcdefgh"), (2, common + " ijklmnop"), (3, common + " qrstuvwx")],
        ["doc_id", "text"],
    )
    with_cut = TD.ngram_jaccard_pairs(
        d, "doc_id", "text", k=5, threshold=0.01, max_df=2
    ).collect()
    without = TD.ngram_jaccard_pairs(
        d, "doc_id", "text", k=5, threshold=0.01
    ).collect()
    assert len(without) == 3  # every pair shares the stop shingle
    assert len(with_cut) == 0
