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
