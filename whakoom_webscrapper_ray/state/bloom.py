"""From-scratch numpy-backed Bloom filter for the URL-seen fast path.

The north rule names "bloom/cuckoo URL-seen" as the frontier's
approximate-membership layer; :mod:`.cuckoo` is the default and this
is the Bloom alternative, selectable per deployment
(``SeenCore(filter_kind="bloom")``, CLI ``--seen-filter bloom``).
Trade-off vs the cuckoo filter (Fan et al., CoNEXT'14, table 1): no
deletion and 2 B/key at a ~5.7e-4 false-positive rate at full load
((1 - e^(-k·n/m))^k with k = 8, m/n = 16), but insertion is pure
scatter stores with NO kick loops — a hot shard ingesting 10⁷ new
keys/round pays pure vectorized writes.

Keys are 20-byte SHA-1 digests; the k probe positions are derived by
double hashing (Kirsch & Mitzenmacher 2006: idx_i = h1 + i·h2) over
two independent 64-bit halves carved straight out of the digest — no
extra hashing of the key material.

Like the cuckoo path, the filter is the fast path only: every
:class:`~..state.seen.SeenCore` backs it with an exact key set, so
engine results are exact and the FP rate is a performance number,
asserted separately in tests (tests/test_cuckoo.py).
"""

from __future__ import annotations

import numpy as np

_BITS_PER_KEY = 16   # m/n = 16, k = 8 -> FP ~ 5e-4 at full load
_NUM_PROBES = 8


class BloomFilter:
    """Vectorized split-free Bloom filter over void-20 SHA-1 keys."""

    def __init__(self, capacity: int, seed: int = 42) -> None:
        need_bits = max(1 << 10, capacity * _BITS_PER_KEY)
        nb = 1
        while nb < need_bits:
            nb <<= 1
        self.num_bits = nb
        self.mask = np.uint64(nb - 1)
        self.words = np.zeros(nb >> 6, dtype=np.uint64)
        # keys INSERTED, duplicates included: insert_void cannot tell a
        # re-insert from a novel key (no read-back on the write path),
        # so load_factor over-reports under duplicate-bearing streams.
        # Exactness is unaffected — SeenCore is exact-backed and sizes
        # rebuilds from its own exact count — but treat load/FP figures
        # from a duplicate-bearing stream as upper bounds.
        self.count = 0
        self._seed = np.uint64(seed * 2 + 1)

    @property
    def key_capacity(self) -> int:
        return self.num_bits // _BITS_PER_KEY

    @property
    def load_factor(self) -> float:
        return self.count / max(1, self.key_capacity)

    def _halves(self, kv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(h1, h2) uint64 pairs from the first 16 digest bytes; h2 is
        forced odd so the probe stride never degenerates to zero."""
        b = np.ascontiguousarray(kv).view(np.uint8).reshape(-1, 20)
        h1 = np.ascontiguousarray(b[:, 0:8]).view(np.uint64).ravel()
        h2 = np.ascontiguousarray(b[:, 8:16]).view(np.uint64).ravel()
        with np.errstate(over="ignore"):
            return h1 * self._seed, h2 | np.uint64(1)

    def insert_void(self, kv: np.ndarray) -> None:
        if len(kv) == 0:
            return
        h1, h2 = self._halves(kv)
        with np.errstate(over="ignore"):
            for i in range(_NUM_PROBES):
                idx = (h1 + np.uint64(i) * h2) & self.mask
                np.bitwise_or.at(
                    self.words, (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)))
        self.count += len(kv)

    # rebuild path uses the same batch entry point as the cuckoo filter
    insert_batch = insert_void

    def contains_void(self, kv: np.ndarray) -> np.ndarray:
        if len(kv) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._halves(kv)
        out = np.ones(len(kv), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(_NUM_PROBES):
                idx = (h1 + np.uint64(i) * h2) & self.mask
                bit = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                       >> (idx & np.uint64(63))) & np.uint64(1)
                out &= bit.astype(bool)
                if not out.any():
                    break
        return out
