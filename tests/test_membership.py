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
