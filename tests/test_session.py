"""session.truncate_plan — the materialization point for iterative loops.

Pins the three properties the iterative operators (connected_components,
pagerank) rely on:

1. value identity — the wrapper reads the same materialized blocks the
   checkpoint produced;
2. stats reset — a plain ``localCheckpoint`` inherits the source plan's
   estimated ``sizeInBytes`` (``LogicalRDD.rewriteStatsAndConstraints``),
   and under the size-only estimator a join estimate is the uncapped
   BigInt PRODUCT of its children, so a loop that joins each round's
   checkpoint into the next round's plan grows the estimate's bit-length
   geometrically until ``java.math.BigInteger`` overflows (observed:
   ``ArithmeticException: BigInteger would overflow supported range`` in
   ``connected_components`` on a 40k-image phash graph). ``truncate_plan``
   must restart every round from a bounded default;
3. releasability — ``release_frame`` on the wrapper still unpersists the
   checkpoint's blocks (the wrapper must hold the LogicalRDD's OWN rdd,
   not a derived one).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.session import release_frame, truncate_plan


def _size_bits(df) -> int:
    # py4j converts the scala BigInt straight to a Python int
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()).bit_length()


def _loop_round(df):
    # the connected-components plan shape: the previous round's
    # materialization enters the next round's plan on BOTH sides of a join
    return (
        df.alias("a")
        .join(df.alias("b"), F.col("a.k") == F.col("b.k"))
        .select(F.col("a.k").alias("k"), F.greatest("a.v", "b.v").alias("v"))
    )


def test_truncate_plan_value_identity(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = truncate_plan(df)
    assert out.schema == df.schema
    assert sorted(r.k for r in out.collect()) == list(range(100))
    release_frame(out)


def test_truncate_plan_resets_inherited_stats(spark):
    base = spark.range(64).select(F.col("id").alias("k"), F.lit(1).alias("v"))

    plain = base.localCheckpoint(eager=True)
    bits0 = _size_bits(plain)
    for _ in range(3):
        plain = _loop_round(plain).localCheckpoint(eager=True)
    grown = _size_bits(plain)
    # the inherited product estimate compounds per round …
    assert grown > bits0 * 2, (bits0, grown)

    trunc = truncate_plan(base)
    for _ in range(3):
        trunc = truncate_plan(_loop_round(trunc))
    # … the truncated one restarts from the bounded default every round
    assert _size_bits(trunc) <= 64
    release_frame(plain)
    release_frame(trunc)


def test_truncate_plan_deep_loop_does_not_overflow(spark):
    # 40 rounds of the compounding shape: without the stats reset the
    # bit-length doubles per round (2^40 × the seed — far past BigInteger's
    # 2^31-bit ceiling had it been inherited); with it the loop is flat
    df = truncate_plan(
        spark.range(32).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    )
    for _ in range(40):
        nxt = truncate_plan(_loop_round(df).limit(32))
        release_frame(df)
        df = nxt
    assert df.count() == 32
    assert _size_bits(df) <= 64
    release_frame(df)


def test_release_frame_frees_truncated_blocks(spark):
    jsc = spark.sparkContext._jsc.sc()
    df = truncate_plan(spark.range(1000).select(F.col("id").alias("k")))
    df.count()
    n_before = jsc.getPersistentRDDs().size()
    release_frame(df)
    assert jsc.getPersistentRDDs().size() < n_before
