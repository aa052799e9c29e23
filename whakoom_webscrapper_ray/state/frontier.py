"""Frontier shards: per-host priority queues with politeness pacing.

The distributed generalization of Scrapy's scheduler + AutoThrottle +
robots gate (/root/reference/whakoom_webscrapper/settings.py:68,119-128)
per SURVEY.md §2.3 T4/T5 and §4.3.  Each shard owns the hosts with
``host_hash % num_shards == shard_id``: their pending URL queues, their
``next_fetch_time`` politeness clocks and (by construction) their seen
shard — ONE partitioning key across the whole engine.

Crawl semantics (the canonical deterministic model both this engine and
the sequential oracle implement — SURVEY.md §4.3 "Ordering"):

- the crawl proceeds in ROUNDS (round 0 = seeds, round r+1 = links
  discovered in round r that survive offsite/robots/dedup);
- within a round, each host's candidates are ordered by
  ``(priority, discovery_ok)`` and assigned logical fetch times
  ``next_time[host] + i * crawl_delay[host]``; ``next_time`` carries
  across rounds (the AutoThrottle per-host budget, settings.py:125);
- the round's global crawl order sorts by
  ``(fetch_time, priority, discovery_ok)``;
- ``discovery_ok = parent_global_seq * 2^20 + span_offset`` is a total
  discovery-order key (parent fetch order, then document order) — it
  needs no global counter, so candidate dedup and ordering are fully
  parallel; dense ``seq`` numbers are assigned per round when the
  crawl-order table is materialized.

Logical time means politeness is *simulated* deterministically — the
benchmark measures real compute throughput, not sleep time, while the
ordering honors the politeness budget exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

# 2^20 span offsets per document bound the discovery-order key layout.
OK_SHIFT = 20


def discovery_ok(parent_seq: np.ndarray, offset: np.ndarray) -> np.ndarray:
    """Total discovery-order key: (parent fetch seq, span offset)."""
    return (parent_seq.astype(np.int64) << OK_SHIFT) | np.minimum(
        offset.astype(np.int64), (1 << OK_SHIFT) - 1
    )


@ray.remote(num_cpus=0.25)
class FrontierShard:
    """One shard: pending queues + politeness clocks for its hosts."""

    def __init__(self, shard_id: int, num_shards: int,
                 robots: dict[str, float] | None = None,
                 seen_shard=None) -> None:
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.crawl_delay = robots or {}   # host -> delay (seconds, logical)
        # host -> list of (priority, ok, canon_url, sha1, host_hash)
        self.pending: dict[str, list] = {}
        self.next_time: dict[str, float] = {}
        # Co-located seen shard (same host_hash % P partition): the
        # schedule-time dedup probe is a LOCAL call, never a shuffle.
        self.seen_shard = seen_shard

    def set_robots(self, delays: dict[str, float]) -> None:
        self.crawl_delay.update(delays)

    def enqueue(self, canon_url: list[str], url_sha1: list[bytes],
                host: list[str], host_hash: list[int],
                priority: list[int], ok: list[int]) -> int:
        for i in range(len(canon_url)):
            self.pending.setdefault(host[i], []).append(
                (int(priority[i]), int(ok[i]), canon_url[i], url_sha1[i],
                 int(host_hash[i]), host[i])
            )
        return len(canon_url)

    def poll_round(self, round_no: int) -> dict:
        """Dedup → seen-probe → politeness-pace all pending candidates.

        Per the canonical model: duplicates of a SHA collapse to the
        min-``ok`` (first-discovered) occurrence; already-seen URLs are
        dropped WITHOUT consuming a politeness slot; survivors are
        marked seen (schedule-time marking, like Scrapy's dupefilter)
        and get fetch times ``next_time[host] + i*delay``.

        Clears the pending queues and advances the per-host clocks.
        Returns plain columns (small control-plane payload; the heavy
        doc payload never passes through this actor).
        """
        # 1. shard-wide dedup by sha, keep first-discovered (min ok).
        best: dict[bytes, tuple] = {}
        for h, items in self.pending.items():
            for it in items:
                prev = best.get(it[3])
                if prev is None or it[1] < prev[1]:
                    best[it[3]] = it
        self.pending.clear()
        cand = list(best.values())

        # 2. probe the co-located seen shard (test-and-mark in one RPC).
        if cand and self.seen_shard is not None:
            keys = [c[3] for c in cand]
            urls = [c[2] for c in cand]
            new_mask = ray.get(
                self.seen_shard.contains_and_add.remote(keys, urls)
            )
            cand = [c for c, new in zip(cand, new_mask) if new]

        # 3. per-host pacing of the survivors.
        by_host: dict[str, list] = {}
        for c in cand:
            by_host.setdefault(c[5], []).append(c)
        cols: dict[str, list] = {
            "canon_url": [], "url_sha1": [], "host": [], "host_hash": [],
            "priority": [], "ok": [], "fetch_time": [],
        }
        for h in sorted(by_host.keys()):
            items = sorted(by_host[h], key=lambda t: (t[0], t[1]))
            delay = float(self.crawl_delay.get(h, 0.0))
            t0 = self.next_time.get(h, 0.0)
            for i, (prio, ok, url, sha, hh, _h) in enumerate(items):
                cols["canon_url"].append(url)
                cols["url_sha1"].append(sha)
                cols["host"].append(h)
                cols["host_hash"].append(hh)
                cols["priority"].append(prio)
                cols["ok"].append(ok)
                cols["fetch_time"].append(t0 + i * delay)
            if items and delay > 0:
                self.next_time[h] = t0 + len(items) * delay
        return cols

    def pending_count(self) -> int:
        return sum(len(v) for v in self.pending.values())

    # -- checkpoint -------------------------------------------------------
    def dump(self) -> dict:
        return {
            "pending": {h: list(v) for h, v in self.pending.items()},
            "next_time": dict(self.next_time),
        }

    def restore(self, state: dict) -> None:
        self.pending = {h: list(v) for h, v in state["pending"].items()}
        self.next_time = dict(state["next_time"])


class Frontier:
    """Driver-side handle over the frontier shard pool."""

    def __init__(self, num_shards: int,
                 crawl_delays: dict[str, float] | None = None,
                 seen_shards: list | None = None) -> None:
        self.num_shards = num_shards
        self.shards = [
            FrontierShard.remote(
                i, num_shards, crawl_delays,
                seen_shards[i] if seen_shards else None,
            )
            for i in range(num_shards)
        ]

    def shard_of(self, host_hash: np.ndarray) -> np.ndarray:
        return (np.asarray(host_hash, dtype=np.uint64)
                % np.uint64(self.num_shards)).astype(np.int64)

    def enqueue_table(self, tbl: pa.Table) -> int:
        """Route a candidate table to shards by host hash."""
        if tbl.num_rows == 0:
            return 0
        hh = tbl.column("host_hash").to_numpy(zero_copy_only=False)
        shard = self.shard_of(hh)
        cols = {
            name: tbl.column(name).to_pylist()
            for name in ("canon_url", "url_sha1", "host", "host_hash",
                         "priority", "ok")
        }
        futs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard == s)
            if idx.size == 0:
                continue
            futs.append(
                self.shards[s].enqueue.remote(
                    *[[cols[c][i] for i in idx]
                      for c in ("canon_url", "url_sha1", "host", "host_hash",
                                "priority", "ok")]
                )
            )
        return int(sum(ray.get(futs)))

    def poll_round(self, round_no: int) -> pa.Table:
        """Collect all shards' paced candidates, globally ordered.

        Sort key = (fetch_time, priority, ok) — the canonical round
        order.  A dense global ``seq`` is appended by the caller.  At
        design scale this merge is a Ray Data sort over shard refs; at
        control-plane sizes a driver-side Arrow sort is cheaper.
        """
        parts = ray.get(
            [s.poll_round.remote(round_no) for s in self.shards]
        )
        cols: dict[str, list] = {k: [] for k in parts[0].keys()}
        for p in parts:
            for k, v in p.items():
                cols[k].extend(v)
        tbl = pa.table(
            {
                "canon_url": pa.array(cols["canon_url"], pa.string()),
                "url_sha1": pa.array(cols["url_sha1"], pa.binary(20)),
                "host": pa.array(cols["host"], pa.string()),
                "host_hash": pa.array(
                    [np.uint64(x) for x in cols["host_hash"]], pa.uint64()
                ),
                "priority": pa.array(cols["priority"], pa.int32()),
                "ok": pa.array(cols["ok"], pa.int64()),
                "fetch_time": pa.array(cols["fetch_time"], pa.float64()),
            }
        )
        if tbl.num_rows:
            order = pa.compute.sort_indices(
                tbl,
                sort_keys=[("fetch_time", "ascending"),
                           ("priority", "ascending"), ("ok", "ascending")],
            )
            tbl = tbl.take(order)
        return tbl

    def pending_total(self) -> int:
        return int(sum(ray.get(
            [s.pending_count.remote() for s in self.shards]
        )))

    def dump_all(self) -> list[dict]:
        return ray.get([s.dump.remote() for s in self.shards])

    def restore_all(self, states: list[dict]) -> None:
        ray.get([
            s.restore.remote(st) for s, st in zip(self.shards, states)
        ])
