"""Deterministic sampling operators (operators/sampling.py).

The properties a 100 TB curation pipeline depends on:
- membership is a pure function of the key (partitioning-invariant —
  the exact property ``df.sample`` lacks);
- stratified rates are enforced per stratum and auditable via the bucket;
- hash_split is disjoint-exhaustive and decorrelated from the sample hash;
- the column-expression mix equals a pure-Python replay bit for bit
  (the DuckDB oracle runs the same arithmetic);
- the plan is scan→project→filter with NO exchange.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from web_crawler_spark.operators.sampling import (
    DEFAULT_DENOM,
    MIX_A,
    MIX_P,
    bucket_col,
    bucket_sql,
    hash_split,
    stratified_sample,
)

RATES = {"en": 2500, "de": 5000}
SPLITS = [("train", 8000), ("val", 1000), ("test", 1000)]


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("zh")
        .alias("lang"),
    )


def _py_bucket(key: int, salt: int = 0, denom: int = DEFAULT_DENOM) -> int:
    return ((key % MIX_P + salt) % MIX_P * MIX_A) % MIX_P % denom


def test_bucket_matches_python_replay(spark):
    keys = [
        0, 1, 2, 17, -5, MIX_P - 1, MIX_P, MIX_P + 3,
        2**63 - 1, -(2**63), 2**62, -(2**62),  # full int64 range incl. xxhash64 extremes
    ]
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    got = {
        r.k: r.b
        for r in df.select("k", bucket_col(F.col("k"), salt=7919).alias("b")).collect()
    }
    for k in keys:
        assert got[k] == _py_bucket(k, salt=7919), k


def test_bucket_sql_twin_matches(spark):
    """The ANSI-SQL spelling of the mix (what the DuckDB oracle runs)
    equals the column expression on the same keys, negatives included."""
    import duckdb

    keys = [0, 1, 17, -5, MIX_P - 1, MIX_P + 3, -(2**61), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    spark_vals = {
        r.k: r.b
        for r in df.select("k", bucket_col(F.col("k"), salt=3).alias("b")).collect()
    }
    expr = bucket_sql("k", salt=3)
    values = ", ".join(f"(CAST({k} AS BIGINT))" for k in keys)
    duck = duckdb.sql(
        f"SELECT k, {expr} AS b FROM (VALUES {values}) AS t(k)"
    ).fetchall()
    for k, b in duck:
        assert spark_vals[k] == b, k


def test_stratified_rates_enforced_and_audited(spark):
    out = stratified_sample(
        _docs(spark), "lang", RATES, "doc_id", default_rate=500, bucket_out="bucket"
    ).collect()
    assert out, "sample must keep something at these rates"
    for r in out:
        rate = RATES.get(r.lang, 500)
        assert r.bucket == _py_bucket(r.doc_id)
        assert r.bucket < rate
    # exact expected membership from the Python replay
    langs = {r.doc_id: r.lang for r in _docs(spark).collect()}
    want = {
        d for d, lang in langs.items() if _py_bucket(d) < RATES.get(lang, 500)
    }
    assert {r.doc_id for r in out} == want


def test_membership_is_partitioning_invariant(spark):
    base = _docs(spark)
    a = stratified_sample(base, "lang", RATES, "doc_id")
    b = stratified_sample(base.repartition(37, "lang"), "lang", RATES, "doc_id")
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_hash_split_disjoint_exhaustive_and_decorrelated(spark):
    out = hash_split(_docs(spark), "doc_id", SPLITS, salt=7919).collect()
    assert len(out) == 2000  # exhaustive: every row assigned
    by_split: dict[str, set] = {}
    for r in out:
        assert r.split in {"train", "val", "test"}
        by_split.setdefault(r.split, set()).add(r.doc_id)
    assert sum(len(v) for v in by_split.values()) == 2000  # disjoint
    # ranges replayed in Python
    for r in out:
        b = _py_bucket(r.doc_id, salt=7919)
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert r.split == want
    # decorrelation sanity: the sampled-in set is not nested inside train
    sampled = {
        r.doc_id
        for r in stratified_sample(_docs(spark), "lang", RATES, "doc_id").collect()
    }
    assert sampled - by_split.get("train", set()), (
        "sample and split hashes must not be the same function"
    )


def test_split_weights_validated(spark):
    import pytest

    df = _docs(spark)
    with pytest.raises(ValueError, match="sum to"):
        hash_split(df, "doc_id", [("train", 9000), ("val", 500)])
    with pytest.raises(ValueError, match="duplicate"):
        hash_split(df, "doc_id", [("a", 5000), ("a", 5000)])


def test_plan_has_no_exchange(spark):
    """scan → project → filter only: sampling must add zero shuffles at any
    scale (the property that makes it free at 100 TB)."""
    plan = stratified_sample(
        _docs(spark), "lang", RATES, "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    plan2 = (
        hash_split(_docs(spark), "doc_id", SPLITS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan2


def test_mix_rates_binding_stratum_and_integer_exactness(spark):
    from web_crawler_spark.operators.sampling import mix_rates_bp

    # observed: a=600, b=300, c=100; target a 40% / b 30% / c 30%.
    # c is the scarcest vs its target (10% observed vs 30% wanted) → kept
    # whole; others down-sampled by exact cross-multiplied ratios.
    rows = (
        [(i, "a") for i in range(600)]
        + [(i + 1000, "b") for i in range(300)]
        + [(i + 2000, "c") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = mix_rates_bp(df, "lang", {"a": 4000, "b": 3000, "c": 3000})
    # rate_s = 10000·t_s·n_c / (t_c·n_s): a → 10000·4000·100/(3000·600)
    assert rates == {"a": 2222, "b": 3333, "c": 10000}

    # resulting mix approaches the target proportions
    from web_crawler_spark.operators.sampling import stratified_sample

    kept = stratified_sample(df, "lang", rates, "doc_id").groupBy("lang").count()
    got = {r.lang: r["count"] for r in kept.collect()}
    total = sum(got.values())
    assert abs(got["a"] / total - 0.4) < 0.08
    assert abs(got["c"] / total - 0.3) < 0.08


def test_mix_rates_unreachable_target_raises(spark):
    import pytest

    from web_crawler_spark.operators.sampling import mix_rates_bp

    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="unreachable"):
        mix_rates_bp(df, "lang", {"a": 5000, "zz": 5000})
    # zero-target strata need no rows and get rate 0
    assert mix_rates_bp(df, "lang", {"a": 10000, "zz": 0}) == {"a": 10000, "zz": 0}


def test_importance_scores_orders_target_like_docs_first(spark):
    """Docs made of target-side words must outscore docs of non-target
    words; scores are exact ints; wordless docs score 0 and are dropped."""
    from web_crawler_spark.operators.sampling import importance_scores

    corpus = spark.createDataFrame(
        [
            (1, "aurora aurora borealis shimmer"),   # target-like
            (2, "zyx qqw vvb nnm zyx qqw"),          # corpus-only words
            (3, "aurora zyx"),                        # mixed
            (4, "12345 !!!"),                         # no [a-z]+ words
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, " ".join(["aurora borealis shimmer"] * 4))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in importance_scores(corpus, target).collect()}
    # per-word mean: doc1 ~ target ratio >> doc2 (absent from target)
    assert out[1].score // out[1].n_words > out[2].score // out[2].n_words
    assert out[1].keep and not out[2].keep
    assert out[3].n_words == 2
    assert out[4] .score == 0 and out[4].n_words == 0 and not out[4].keep
    # integer exactness: rerun must produce identical scores
    out2 = {r.doc_id: r.score for r in importance_scores(corpus, target).collect()}
    assert out2 == {k: v.score for k, v in out.items()}


def test_importance_scores_smoothing_handles_empty_target(spark):
    from web_crawler_spark.operators.sampling import importance_scores

    corpus = spark.createDataFrame(
        [(1, "some words here")], "doc_id long, text string"
    )
    target = corpus.filter("doc_id < 0")  # empty
    row = importance_scores(corpus, target).collect()[0]
    # all-smoothing ratios: finite, positive, no keep (mean ratio < 1
    # cannot hold -- with T=0 every ratio is scale*(C+B)/(c_b+1)/B-ish)
    assert row.score > 0
