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
scale it is an in-memory ``set``.
"""

from __future__ import annotations

import numpy as np
import ray

from .cuckoo import CuckooFilter


class SeenCore:
    """Shard-local seen-set state: cuckoo fast path + exact backing.

    Used in two deployments: wrapped by the :class:`SeenShard` actor
    (standalone pool), or held INSIDE a frontier shard actor (true
    co-location — the schedule-time dedup probe is then a plain method
    call with zero cross-actor serialization; SURVEY.md §2.3 T2/T3).
    """

    def __init__(self, capacity: int = 1 << 18, seed: int = 42) -> None:
        self.filter = CuckooFilter(capacity, seed=seed)
        self.exact: dict[bytes, str] = {}  # sha1 -> canonical URL
        self._seed = seed

    def _ensure_capacity(self, extra: int) -> None:
        """Grow the cuckoo filter before it saturates.

        A cuckoo filter past ~90% load thrashes its eviction loop (a
        single overloaded insert costs MAX_KICKS random kicks), so when
        the incoming batch would push load past 0.85 the filter is
        rebuilt at 2× from the exact backing keys — the classic
        doubling amortization; at the 10^10 design point shards are
        pre-sized from the frontier estimate and this is the safety
        net, not the steady state.
        """
        need = len(self.exact) + extra
        cap = self.filter.num_buckets * self.filter.SLOTS
        if need <= 0.85 * cap:
            return
        new_cap = cap
        while need > 0.85 * new_cap:
            new_cap *= 2
        rebuilt = CuckooFilter(int(new_cap * 0.95), seed=self._seed)
        rebuilt.insert_batch(list(self.exact.keys()))
        self.filter = rebuilt

    def contains_and_add(self, keys: list[bytes],
                         urls: list[str] | None = None) -> np.ndarray:
        """Atomically test-and-mark a batch; True where the key was NEW.

        The cuckoo filter answers the common negative fast; positives are
        verified against the exact set so the engine's dedup is exact
        (the filter's FP rate is a perf concern, not a correctness one).
        """
        n = len(keys)
        maybe = self.filter.contains_batch(keys)
        exact = self.exact
        # Only filter-positives need the exact check (the filter's
        # guarantee: no false negatives); everything else is new.
        out = np.ones(n, dtype=bool)
        for i in np.flatnonzero(maybe):
            if keys[i] in exact:
                out[i] = False
        new_idx = np.flatnonzero(out)
        if new_idx.size:
            self._ensure_capacity(int(new_idx.size))
            if urls is not None:
                exact.update((keys[i], urls[i]) for i in new_idx)
            else:
                exact.update((keys[i], "") for i in new_idx)
            self.filter.insert_batch([keys[i] for i in new_idx])
        return out

    def contains(self, keys: list[bytes]) -> np.ndarray:
        maybe = self.filter.contains_batch(keys)
        return np.array(
            [bool(m) and k in self.exact for m, k in zip(maybe, keys)],
            dtype=bool,
        )

    def snapshot(self) -> tuple[list[bytes], list[str]]:
        """Exact key/url lists for checkpointing and conformance."""
        return list(self.exact.keys()), list(self.exact.values())

    def restore(self, keys: list[bytes], urls: list[str]) -> int:
        self._ensure_capacity(len(keys))
        for k, u in zip(keys, urls):
            if k not in self.exact:
                self.exact[k] = u
                self.filter.insert(k)
        return len(self.exact)

    def stats(self) -> dict:
        return {
            "keys": len(self.exact),
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
        keys: list[bytes],
        host_hash: np.ndarray,
        urls: list[str] | None = None,
    ) -> np.ndarray:
        """Partition a batch by shard, RPC all shards, reassemble the mask."""
        n = len(keys)
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
            ks = [keys[i] for i in idx]
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

    def restore_all(self, keys: list[bytes], urls: list[str],
                    shard: np.ndarray) -> None:
        """Replay keys into shards; ``shard`` is the per-key routing
        decision recorded in the crawl_order checkpoint (salted)."""
        shard = np.asarray(shard, dtype=np.int64)
        futs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard == s)
            futs.append(
                self.shards[s].restore.remote(
                    [keys[i] for i in idx], [urls[i] for i in idx]
                )
            )
        ray.get(futs)
