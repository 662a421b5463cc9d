"""Bloom + cuckoo URL-seen tiers: no false negatives ever; fp-rate sane;
cuckoo supports delete; distributed build/probe round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from web_crawler_spark.functions.hashing import xxh64_str
from web_crawler_spark.operators.bloom import PartitionedBloom
from web_crawler_spark.operators.cuckoo import CuckooFilter


@pytest.fixture(scope="module")
def hashes():
    rng = np.random.RandomState(42)
    return rng.randint(-(2**62), 2**62, size=20000, dtype=np.int64)


def test_bloom_no_false_negatives(hashes):
    bf = PartitionedBloom.sized_for(10000, n_partitions=16)
    inserted, other = hashes[:10000], hashes[10000:]
    bf.add_hashes(inserted)
    assert bf.might_contain(inserted).all(), "false negative!"
    fp = bf.might_contain(other).mean()
    assert fp < 0.01, f"fp rate {fp}"


def test_bloom_distributed_build_and_probe(spark, hashes):
    inserted = hashes[:5000]
    df = spark.createDataFrame([(int(h),) for h in inserted], ["url_hash"])
    bf = PartitionedBloom.sized_for(5000, n_partitions=8)
    bf.build_from(df)
    # distributed probe agrees with driver-side probe and has no false negatives
    probed = bf.probe(df).collect()
    assert all(r.might_contain for r in probed)
    other_df = spark.createDataFrame(
        [(int(h),) for h in hashes[10000:11000]], ["url_hash"]
    )
    fp = np.mean([r.might_contain for r in bf.probe(other_df).collect()])
    assert fp < 0.02


def test_bloom_persistence_roundtrip(hashes):
    bf = PartitionedBloom.sized_for(1000, n_partitions=4)
    bf.add_hashes(hashes[:1000])
    bf2 = PartitionedBloom.from_rows(bf.to_rows(), bf.p, bf.m, bf.k)
    assert bf2.might_contain(hashes[:1000]).all()


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(1024)
    keys = [xxh64_str(f"https://h{i}.com/p") for i in range(2000)]
    for k in keys:
        assert cf.insert(k)
    assert all(cf.contains(k) for k in keys)
    assert cf.contains_batch(np.array(keys)).all()
    # deletes actually remove
    for k in keys[:500]:
        assert cf.delete(k)
    misses = sum(cf.contains(k) for k in keys[:500])
    # deleted keys may still collide with remaining fingerprints, but the vast
    # majority must be gone (16-bit fp, ~0.5 load)
    assert misses < 10
    # untouched keys unaffected (no false negatives from deletes)
    assert all(cf.contains(k) for k in keys[500:])


def test_cuckoo_overflow_signals():
    cf = CuckooFilter(8)  # tiny: 8 buckets * 4 slots
    ok = True
    for i in range(200):
        ok = cf.insert(xxh64_str(f"k{i}"))
        if not ok:
            break
    assert not ok, "tiny filter must overflow and say so"
    assert cf.load_factor > 0.8


def test_cuckoo_overflow_never_loses_keys():
    """Overflow must never create a false negative: the displaced victim
    stays findable via the stash, and a full filter refuses new inserts
    without evicting (previously a failed insert silently dropped a key)."""
    import numpy as np

    from web_crawler_spark.operators.cuckoo import CuckooFilter

    cf = CuckooFilter(2)  # tiny: 2 buckets × 4 slots
    inserted = []
    for h in range(100):
        ok = cf.insert(h)
        inserted.append(h)
        if not ok:
            break
    # every key ever successfully handed to insert (incl. the overflow one,
    # whose displacement victim went to the stash) must still be visible
    for h in inserted:
        assert cf.contains(h), h
    assert cf.contains_batch(np.asarray(inserted, dtype=np.int64)).all()


def test_cogrouped_probe_and_merge_match_broadcast(spark, hashes):
    """The blobs-as-a-table primitives must give the exact answers of the
    broadcast implementations: probe_cogrouped == PartitionedBloom.probe on
    every row, or_merge_blobs == the driver-side OR of the same keys, and an
    empty blob table is all definite negatives."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.bloom import (
        BLOB_SCHEMA,
        or_merge_blobs,
        probe_cogrouped,
    )

    bf = PartitionedBloom.sized_for(10000, n_partitions=8)
    first, second, probe_keys = hashes[:5000], hashes[5000:8000], hashes[2500:12500]
    spark_keys = lambda arr: spark.createDataFrame(  # noqa: E731
        [(int(h),) for h in arr], "url_hash long"
    )
    cand = spark_keys(probe_keys).withColumn("x", F.col("url_hash") % 7)

    # empty table → no positives
    empty = spark.createDataFrame([], schema=BLOB_SCHEMA)
    n_pos = (
        probe_cogrouped(cand, empty, m=bf.m, k=bf.k, p=bf.p)
        .filter("might_contain")
        .count()
    )
    assert n_pos == 0

    # merge round 1 into the empty table, round 2 into the result
    bf.add_hashes(first)
    t1 = or_merge_blobs(spark_keys(first), empty, m=bf.m, k=bf.k, p=bf.p)
    t1 = spark.createDataFrame(t1.collect(), schema=BLOB_SCHEMA)  # settle
    bf.add_hashes(second)
    t2 = or_merge_blobs(spark_keys(second), t1, m=bf.m, k=bf.k, p=bf.p)
    got = {r["pkey"]: bytes(r["bits"]) for r in t2.collect()}
    want = {k: bytes(b) for k, b in bf.to_rows()}
    assert got == want

    blobs = spark.createDataFrame(
        [(k, bytes(b)) for k, b in bf.to_rows()], schema=BLOB_SCHEMA
    )
    a = bf.probe(cand).orderBy("url_hash", "x").collect()
    b = (
        probe_cogrouped(cand, blobs, m=bf.m, k=bf.k, p=bf.p)
        .orderBy("url_hash", "x")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # no false negatives through the cogrouped path
    inserted_set = set(int(h) for h in first) | set(int(h) for h in second)
    for r in b:
        if int(r["url_hash"]) in inserted_set:
            assert r["might_contain"]


def test_words_probe_jvm_matches_all_other_paths(spark, hashes):
    """The JVM column-expression probe (words layout) == the cogrouped Arrow
    probe == the driver probe, row for row — including the blobs→words
    migration path and the empty-table (all definite negatives) case. Also
    pins that the probe plan contains NO Python evaluation node."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.bloom import (
        BLOB_SCHEMA,
        WORDS_SCHEMA,
        blobs_to_words,
        or_merge_blobs,
        or_merge_words,
        probe_cogrouped,
        probe_words_joined,
    )

    bf = PartitionedBloom.sized_for(8000, n_partitions=8)
    inserted = hashes[:8000]
    cand_keys = np.concatenate([inserted[:2000], hashes[10000:16000]])
    seen = spark.createDataFrame([(int(v),) for v in inserted], "url_hash long")
    cand = spark.createDataFrame(
        [(int(v), i) for i, v in enumerate(cand_keys)], "url_hash long, pos int"
    )
    empty_w = spark.createDataFrame([], schema=WORDS_SCHEMA)
    empty_b = spark.createDataFrame([], schema=BLOB_SCHEMA)
    words = or_merge_words(seen, empty_w, m=bf.m, k=bf.k, p=bf.p).localCheckpoint()
    blobs = or_merge_blobs(seen, empty_b, m=bf.m, k=bf.k, p=bf.p).localCheckpoint()

    jvm_df = probe_words_joined(cand, words, m=bf.m, k=bf.k, p=bf.p)
    r_jvm = {r.url_hash: r.might_contain for r in jvm_df.collect()}
    r_cog = {
        r.url_hash: r.might_contain
        for r in probe_cogrouped(cand, blobs, m=bf.m, k=bf.k, p=bf.p).collect()
    }
    bf.add_hashes(inserted)
    r_drv = dict(zip(cand_keys.tolist(), bf.might_contain(cand_keys).tolist()))
    r_mig = {
        r.url_hash: r.might_contain
        for r in probe_words_joined(
            cand, blobs_to_words(blobs), m=bf.m, k=bf.k, p=bf.p
        ).collect()
    }
    assert r_jvm == r_cog == r_drv == r_mig
    assert all(r_jvm[int(v)] for v in inserted[:2000])  # no false negatives
    # candidate columns pass through untouched
    assert {f.name for f in jvm_df.schema.fields} == {"url_hash", "pos", "might_contain"}
    # the whole point: zero Python in the probe plan
    plan = jvm_df._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"python node {marker} in JVM probe plan"
    # empty words table → every candidate is a definite negative
    none = probe_words_joined(cand, empty_w, m=bf.m, k=bf.k, p=bf.p)
    assert none.filter(F.col("might_contain")).count() == 0


def test_tiers_checkpoint_family_mismatch_resets_safely(tmp_path):
    """A tiers checkpoint written under a different bloom hash family must
    not surface its bits (false negatives = exactness bug): the distributed
    tier resets to empty-filter + watermark 0 (the exact hot slice then
    covers everything); the driver tier fails loud."""
    import pickle

    from web_crawler_spark.operators.membership import (
        DistributedSeenTiers,
        SeenTiers,
    )

    dist = DistributedSeenTiers(expected_keys=1024, bloom_partitions=4)
    dist.bloom.add_hashes(np.arange(100, dtype=np.int64))
    dist.flushed_round = 7
    p1 = str(tmp_path / "dist.pkl")
    dist.dump(p1)
    with open(p1, "rb") as f:
        state = pickle.load(f)
    assert state["family"]
    state["family"] = "km0"  # simulate a pre-change checkpoint
    with open(p1, "wb") as f:
        pickle.dump(state, f)
    loaded = DistributedSeenTiers.load(p1)
    assert loaded.bloom.blobs == {}  # stale bits discarded
    assert loaded.flushed_round == 0  # hot slice covers the whole seen set
    # same-family load round-trips intact
    dist.dump(p1)
    same = DistributedSeenTiers.load(p1)
    assert same.flushed_round == 7
    assert same.bloom.might_contain(np.arange(100, dtype=np.int64)).all()

    drv = SeenTiers(expected_keys=1024)
    p2 = str(tmp_path / "drv.pkl")
    drv.dump(p2)
    with open(p2, "rb") as f:
        state = pickle.load(f)
    state["family"] = "km0"
    with open(p2, "wb") as f:
        pickle.dump(state, f)
    with pytest.raises(ValueError, match="hash family"):
        SeenTiers.load(p2)


def test_derived_partitions_cap_blob_size_at_design_point(tmp_path):
    """The 10^10-key design point must SIZE correctly by default: P derived
    from expected_keys (not a fixed 16) so each array<long> blob stays in
    the tens of MB and probe parallelism scales with the filter
    (r4 VERDICT Wrong #2). Construct-only — no 17 GB of bits allocated."""
    from web_crawler_spark.operators.membership import TableSeenTiers

    tiers = TableSeenTiers(str(tmp_path / "bloom"), expected_keys=10**10)
    bf = tiers.bloom
    assert bf.p == 1024
    blob_mb = bf.m / 8 / 2**20
    assert 10 <= blob_mb <= 32, f"blob {blob_mb:.1f} MiB"
    # derived sizing round-trips through checkpoint/resume
    tiers.init_table()
    ck = str(tmp_path / "tiers.pkl")
    tiers.dump(ck)
    loaded = TableSeenTiers.load(ck)
    assert (loaded.bloom.p, loaded.bloom.m, loaded.bloom.k) == (bf.p, bf.m, bf.k)
    # small filters keep the 16-partition floor (probe parallelism never
    # collapses), exactly the previous default
    assert PartitionedBloom.sized_for(1 << 20).p == 16


def test_explicit_partition_count_with_oversized_blobs_fails_loudly():
    """An explicit P that yields >64 MiB blobs is a config error the
    constructor must reject — not a silent 1.1 GB-per-row table."""
    with pytest.raises(ValueError, match="blob would be"):
        PartitionedBloom.sized_for(10**10, n_partitions=16)


def test_words_probe_keeps_index_projection_uncollapsed(spark):
    """The ~20x probe cliff guard (ADVICE r4 #3): the k bloom indexes are
    aliased in their own Project, referenced as bare columns by the bit
    tests above — each xorshift/rotate/pmod subtree evaluated ONCE per
    row. That now rests on CollapseProject's non-cheap-duplicate check
    (SPARK-36718) declining to merge adjacent Projects; a Spark upgrade
    that re-inlines them would silently re-ship the 20x regression. Pin
    the shape: each __bi alias survives into the optimized plan, and the
    index-defining pmod appears exactly once per probe (k for the
    indexes + 1 for the partition key)."""
    from web_crawler_spark.operators.bloom import (
        WORDS_SCHEMA,
        PartitionedBloom,
        probe_words_joined,
    )

    bf = PartitionedBloom.sized_for(1000, n_partitions=4)
    words = spark.createDataFrame([], schema=WORDS_SCHEMA)
    probe = spark.range(10).selectExpr("xxhash64(id) AS url_hash")
    out = probe_words_joined(probe, words, m=bf.m, k=bf.k, p=bf.p)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__bb#" in plan, (
        "__bb (block base) alias collapsed out of the optimized plan — "
        "the block pmod would re-evaluate once per index column"
    )
    for i in range(bf.k):
        assert f"__bi{i}#" in plan, (
            f"__bi{i} alias collapsed out of the optimized plan — "
            "CollapseProject merged the index projection into the bit "
            "tests; every index subtree now evaluates twice per row"
        )
    # blocked family: exactly ONE block pmod + one pkey pmod per row — the
    # k in-block positions are plain AND-masks referencing __bb
    n_pmod = plan.count("pmod(")
    assert n_pmod == 2, (
        f"expected 1 block pmod + 1 pkey pmod, found {n_pmod}: index "
        "subtrees are being duplicated (or folded away) in the optimized plan"
    )


def test_words_probe_filter_consumer_keeps_projection(spark):
    """The REAL consumption pattern — probed.filter(might_contain) — must
    NOT collapse the index projection into the Filter: PushDownPredicate
    would substitute the aliases and re-inline every index subtree twice
    (measured 1.7s -> 35.5s on a 10^8-row probe at k=10; k>=4 falls off
    the generated-code threshold). The probe's non-deterministic fence
    (`bloom._pushdown_fence`) blocks the substitution; pin that the
    Filter reads the materialized boolean, with the index aliases intact
    below it."""
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.bloom import (
        WORDS_SCHEMA,
        PartitionedBloom,
        probe_words_joined,
    )

    bf = PartitionedBloom.sized_for(1000, n_partitions=4)
    words = spark.createDataFrame([], schema=WORDS_SCHEMA)
    probe = spark.range(10).selectExpr("xxhash64(id) AS url_hash")
    out = (
        probe_words_joined(probe, words, m=bf.m, k=bf.k, p=bf.p)
        .filter(F.col("might_contain"))
        .select("url_hash")
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    filter_lines = [l for l in plan.splitlines() if "Filter " in l]
    assert filter_lines and all(
        "might_contain#" in l and "getbit" not in l for l in filter_lines
    ), (
        "the filter no longer reads the materialized might_contain column "
        "- the fence stopped blocking predicate pushdown and the 20x "
        f"inlined-filter cliff is back: {filter_lines}"
    )
    for i in range(bf.k):
        assert f"__bi{i}#" in plan, f"__bi{i} collapsed under the filter"
