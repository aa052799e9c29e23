"""Sharded URL-seen set: cuckoo-filter fast path + exact backing keys.

The distributed replacement for the reference's single-process dedup
trio (pipelines.py:32-34 in-memory sets, SQLite UNIQUEs, Scrapy
dupefilter; SURVEY.md §2.3 T2/T3).  Shard routing is
``host_hash % num_shards`` so a host's URLs co-locate with its frontier
shard (one consistent partitioning key across the engine).

Actors are *long-lived named state outside Datasets* — the pipeline's
``map_batches`` stages batch-RPC into them (anti-join J3: candidates →
shards → keep only unseen), and they survive across crawl rounds and
across Dataset executions.  At the 10^10-key design point the exact
backing set is the checkpointed per-shard key table (~64 GiB of SHA-1
keys per 40 shards at 10^10 keys — object-store-spillable); at test
scale it is an in-memory sorted key array.

**Columnar exact store.**  Keys live as numpy void-20 arrays (a
consolidated sorted run + recent unsorted blocks) and URLs as Arrow
string chunks — NOT a ``dict[bytes, str]``.  Probes are C searchsorted
/ isin; inserts append blocks.  Zero per-key Python objects: at 10^7
keys/round, dict churn costs more in allocator page faults than the
probes themselves (and a bytes-object dict would be 5× the memory of
the packed key array).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .cuckoo import CuckooFilter

VOID20 = np.dtype((np.void, 20))


def as_void20(keys) -> np.ndarray:
    """list[bytes] | np.void20 array | Arrow binary(20) → np.void20."""
    if isinstance(keys, np.ndarray) and keys.dtype == VOID20:
        return keys
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(keys) == 0:
            return np.empty(0, dtype=VOID20)
        return np.frombuffer(
            keys.buffers()[1], dtype=VOID20, count=len(keys),
            offset=keys.offset * 20,
        )
    if len(keys) == 0:
        return np.empty(0, dtype=VOID20)
    return np.frombuffer(b"".join(keys), dtype=VOID20)


def void_to_binary20(keys: np.ndarray) -> pa.Array:
    """np.void20 array → Arrow fixed-size binary(20) column."""
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(20), len(keys), [None, pa.py_buffer(keys.tobytes())]
    )


class SeenCore:
    """Shard-local seen-set state: cuckoo fast path + exact backing.

    Used in two deployments: wrapped by the :class:`SeenShard` actor
    (standalone pool), or held INSIDE a frontier shard actor (true
    co-location — the schedule-time dedup probe is then a plain method
    call with zero cross-actor serialization; SURVEY.md §2.3 T2/T3).
    """

    def __init__(self, capacity: int = 1 << 18, seed: int = 42,
                 filter_kind: str = "cuckoo") -> None:
        # north rule: "bloom/cuckoo URL-seen" — both fast paths ship;
        # cuckoo is the default (supports deletion, slightly denser),
        # bloom trades that for kick-free pure-scatter inserts.
        if filter_kind not in ("cuckoo", "bloom"):
            raise ValueError(f"unknown seen filter: {filter_kind!r}")
        self._filter_kind = filter_kind
        self.filter = self._new_filter(capacity, seed)
        self._seed = seed
        self._sorted = np.empty(0, dtype=VOID20)   # consolidated run
        self._recent: list[np.ndarray] = []        # unsorted new blocks
        self._recent_n = 0
        self._key_chunks: list[np.ndarray] = []    # insertion order
        self._url_chunks: list[pa.Array] = []      # aligned with keys
        self.count = 0

    # -- internals --------------------------------------------------------
    def _new_filter(self, capacity: int, seed: int):
        if self._filter_kind == "bloom":
            from .bloom import BloomFilter

            return BloomFilter(capacity, seed=seed)
        return CuckooFilter(capacity, seed=seed)

    def _consolidate(self) -> None:
        if self._recent:
            self._sorted = np.sort(
                np.concatenate([self._sorted] + self._recent)
            )
            self._recent = []
            self._recent_n = 0

    def _ensure_capacity(self, extra: int) -> None:
        """Grow the cuckoo filter before it saturates (rebuild at 2×
        from the exact backing keys — doubling amortization)."""
        need = self.count + extra
        cap = self.filter.key_capacity
        if need <= 0.85 * cap:
            return
        new_cap = cap
        while need > 0.85 * new_cap:
            new_cap *= 2
        rebuilt = self._new_filter(int(new_cap * 0.95), seed=self._seed)
        for blk in self._key_chunks:
            rebuilt.insert_batch(blk)
        self.filter = rebuilt

    def _exact_contains(self, keys: np.ndarray) -> np.ndarray:
        """Membership of void-20 keys against the exact backing store."""
        hit = np.zeros(len(keys), dtype=bool)
        if self._sorted.size:
            pos = np.searchsorted(self._sorted, keys)
            pos_c = np.minimum(pos, self._sorted.size - 1)
            hit = self._sorted[pos_c] == keys
        for blk in self._recent:
            hit |= np.isin(keys, blk)
        return hit

    # -- ops --------------------------------------------------------------
    def contains_and_add(self, keys, urls=None) -> np.ndarray:
        """Atomically test-and-mark a batch; True where the key was NEW.

        ``keys``: np.void20 array (or list[bytes]); ``urls``: aligned
        Arrow string array (or list[str]).  The cuckoo filter answers
        the common negative fast; positives are verified against the
        exact store so dedup is exact (filter FP rate is a perf
        concern, not a correctness one).
        """
        kv = as_void20(keys)
        n = len(kv)
        if n == 0:
            return np.zeros(0, dtype=bool)
        maybe = self.filter.contains_void(kv)
        out = np.ones(n, dtype=bool)
        m_idx = np.flatnonzero(maybe)
        if m_idx.size:
            hit = self._exact_contains(kv[m_idx])
            out[m_idx[hit]] = False
        new_idx = np.flatnonzero(out)
        if new_idx.size:
            # duplicates WITHIN the call are all reported new (same as
            # the reference's first-seen semantics) but stored once.
            _, first = np.unique(kv[new_idx], return_index=True)
            if first.size != new_idx.size:
                new_idx = new_idx[np.sort(first)]
            nk = np.ascontiguousarray(kv[new_idx])
            self._ensure_capacity(int(new_idx.size))
            self._recent.append(nk)
            self._recent_n += nk.size
            self._key_chunks.append(nk)
            if urls is not None:
                if isinstance(urls, (pa.Array, pa.ChunkedArray)):
                    ua = (urls.combine_chunks()
                          if isinstance(urls, pa.ChunkedArray) else urls)
                    sel = ua.take(pa.array(new_idx, pa.int64()))
                    if isinstance(sel, pa.ChunkedArray):
                        sel = sel.combine_chunks()
                    self._url_chunks.append(sel)
                else:
                    self._url_chunks.append(
                        pa.array([urls[i] for i in new_idx], pa.string())
                    )
            else:
                self._url_chunks.append(
                    pa.array([""] * int(new_idx.size), pa.string())
                )
            self.filter.insert_void(nk)
            self.count += int(nk.size)
            if self._recent_n > max(1 << 16, self._sorted.size // 4):
                self._consolidate()
        return out

    def contains(self, keys) -> np.ndarray:
        kv = as_void20(keys)
        maybe = self.filter.contains_void(kv)
        out = np.zeros(len(kv), dtype=bool)
        m_idx = np.flatnonzero(maybe)
        if m_idx.size:
            out[m_idx] = self._exact_contains(kv[m_idx])
        return out

    def snapshot(self) -> tuple[list[bytes], list[str]]:
        """Exact key/url lists for checkpointing and conformance."""
        keys, urls = self.snapshot_columns()
        return (
            [k.tobytes() for k in keys],
            urls.to_pylist() if len(urls) else [],
        )

    def snapshot_columns(self) -> tuple[np.ndarray, pa.Array]:
        """Columnar snapshot: (void-20 key array, Arrow url column)."""
        keys = (
            np.concatenate(self._key_chunks)
            if self._key_chunks else np.empty(0, dtype=VOID20)
        )
        urls = (
            pa.concat_arrays(self._url_chunks)
            if self._url_chunks else pa.array([], pa.string())
        )
        return keys, urls

    def restore(self, keys, urls) -> int:
        """Replay a key/url batch (idempotent: existing keys skipped)."""
        kv = as_void20(keys)
        if isinstance(urls, list):
            urls = pa.array(urls, pa.string())
        self.contains_and_add(kv, urls)
        return self.count

    def stats(self) -> dict:
        return {
            "keys": self.count,
            "filter_load": self.filter.load_factor,
        }


@ray.remote(num_cpus=0)
class SeenShard(SeenCore):
    """Actor wrapper over :class:`SeenCore` (standalone shard pool)."""


class SeenSet:
    """Driver-side handle over the shard pool."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 18):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(capacity_per_shard, seed=42 + i)
            for i in range(num_shards)
        ]

    def shard_of(self, host_hash: np.ndarray) -> np.ndarray:
        return (host_hash % np.uint64(self.num_shards)).astype(np.int64)

    def contains_and_add_batch(
        self,
        keys,
        host_hash: np.ndarray,
        urls: list[str] | None = None,
    ) -> np.ndarray:
        """Partition a batch by shard, RPC all shards, reassemble the mask."""
        kv = as_void20(keys)
        n = len(kv)
        if n == 0:
            return np.zeros(0, dtype=bool)
        shard = self.shard_of(np.asarray(host_hash, dtype=np.uint64))
        out = np.zeros(n, dtype=bool)
        futures = {}
        idx_by_shard = {}
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard == s)
            if idx.size == 0:
                continue
            ks = np.ascontiguousarray(kv[idx])
            us = [urls[i] for i in idx] if urls is not None else None
            futures[s] = self.shards[s].contains_and_add.remote(ks, us)
            idx_by_shard[s] = idx
        for s, fut in futures.items():
            out[idx_by_shard[s]] = ray.get(fut)
        return out

    def snapshot_all(self) -> tuple[list[bytes], list[str]]:
        keys: list[bytes] = []
        urls: list[str] = []
        for pair in ray.get([s.snapshot.remote() for s in self.shards]):
            keys.extend(pair[0])
            urls.extend(pair[1])
        return keys, urls

    def restore_all(self, keys, urls: list[str],
                    shard: np.ndarray) -> None:
        """Replay keys into shards; ``shard`` is the per-key routing
        decision recorded in the crawl_order checkpoint (salted)."""
        kv = as_void20(keys)
        shard = np.asarray(shard, dtype=np.int64)
        futs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard == s)
            futs.append(
                self.shards[s].restore.remote(
                    np.ascontiguousarray(kv[idx]),
                    [urls[i] for i in idx],
                )
            )
        ray.get(futs)
