"""Cuckoo filter — the hot tier of the URL-seen set (north rule).

Complements the Bloom tier (bloom.py): the Bloom blobs are append-only and
periodically rebuilt from the exact seen table, while the *hot tier* holds
recently-settled URLs between rebuilds and — unlike Bloom — supports
**deletes** (needed when a retryable URL is re-enqueued and must stop looking
"seen", and when hot entries are evicted after they age into a rebuilt Bloom).

Standard bucketized cuckoo filter (Fan et al., CoNEXT 2014 — public design):
- 4 slots per bucket, 16-bit fingerprints → ~0.01% fp at 95% load,
- partial-key cuckoo hashing: alt_bucket = bucket XOR hash(fingerprint),
- bounded eviction kicks (500) with an explicit overflow signal; on overflow
  the caller flushes the hot tier into the next Bloom rebuild (correctness is
  unaffected either way — both tiers are prefilters over the exact table).

numpy-backed, vectorized lookups for batch probes; driver/executor-local
(one instance covers one hash-range partition; the per-partition layout is
the same as bloom.py's).
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import mix64

_EMPTY = 0  # fingerprints are forced nonzero
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, n_buckets: int, seed: int = 7):
        # power-of-two buckets so XOR stays in range
        n = 1
        while n < n_buckets:
            n <<= 1
        self.n = n
        self.seed = seed
        self.table = np.zeros((n, 4), dtype=np.uint16)
        self.count = 0
        # victim stash: the one fingerprint displaced by an exhausted kick
        # loop lives here so an overflow NEVER loses a previously-inserted
        # key (no-false-negative contract); (fingerprint, bucket) or None
        self.victim: tuple[int, int] | None = None

    # -- scalar helpers ------------------------------------------------------

    def _fp_and_bucket(self, h: int) -> tuple[int, int]:
        u = np.uint64(h & 0xFFFFFFFFFFFFFFFF)
        mixed = int(mix64(np.array([u]), self.seed)[0])
        fp = (mixed & 0xFFFF) or 1
        b1 = (mixed >> 16) % self.n
        return fp, b1

    def _alt(self, bucket: int, fp: int) -> int:
        tag_hash = int(mix64(np.array([np.uint64(fp)]), self.seed ^ 0x5BF0)[0])
        return (bucket ^ tag_hash) % self.n

    def insert(self, h: int) -> bool:
        """Insert a 64-bit key hash; False = overflow (caller must flush).

        Overflow never loses a key: if the stash is occupied no eviction is
        even attempted (the incoming key is simply not inserted — the caller
        flushes and rebuilds); if the kick loop exhausts, the final homeless
        fingerprint goes into the stash and overflow is signalled.
        """
        fp, b1 = self._fp_and_bucket(h)
        b2 = self._alt(b1, fp)
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        if self.victim is not None:
            return False  # full: refuse before displacing anything
        # evict loop
        rng = np.random.RandomState((h ^ self.seed) & 0x7FFFFFFF)
        b = b1 if rng.rand() < 0.5 else b2
        for _ in range(_MAX_KICKS):
            slot = rng.randint(0, 4)
            fp, self.table[b][slot] = int(self.table[b][slot]), fp
            b = self._alt(b, fp)
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # the displaced fingerprint's home is `b` (we were about to place it
        # there); stash it so it stays findable, and report overflow
        self.victim = (int(fp), int(b))
        self.count += 1
        return False

    def _victim_matches(self, fp: int, b1: int, b2: int) -> bool:
        return self.victim is not None and self.victim[0] == fp and self.victim[1] in (b1, b2)

    def delete(self, h: int) -> bool:
        fp, b1 = self._fp_and_bucket(h)
        b2 = self._alt(b1, fp)
        for b in (b1, b2):
            row = self.table[b]
            hit = np.nonzero(row == fp)[0]
            if len(hit):
                row[hit[0]] = _EMPTY
                self.count -= 1
                return True
        if self._victim_matches(fp, b1, b2):
            self.victim = None
            self.count -= 1
            return True
        return False

    def contains(self, h: int) -> bool:
        fp, b1 = self._fp_and_bucket(h)
        b2 = self._alt(b1, fp)
        return bool(
            (self.table[b1] == fp).any()
            or (self.table[b2] == fp).any()
            or self._victim_matches(fp, b1, b2)
        )

    # -- batch probe (vectorized) ---------------------------------------------

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        u = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        mixed = mix64(u, self.seed)
        fp = (mixed & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        b1 = ((mixed >> np.uint64(16)) % np.uint64(self.n)).astype(np.int64)
        tag_hash = mix64(fp.astype(np.uint64), self.seed ^ 0x5BF0)
        b2 = ((b1.astype(np.uint64) ^ tag_hash) % np.uint64(self.n)).astype(np.int64)
        hit1 = (self.table[b1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[b2] == fp[:, None]).any(axis=1)
        out = hit1 | hit2
        if self.victim is not None:
            vfp, vb = self.victim
            out |= (fp == vfp) & ((b1 == vb) | (b2 == vb))
        return out

    @property
    def load_factor(self) -> float:
        return self.count / (self.n * 4)
