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

**Columnar shard state (explicit skew handling).**  Pending queues are
Arrow blocks (O(1) enqueue, concatenated lazily at poll) and the
poll-time dedup → seen-probe → politeness-pacing path is fully
vectorized (numpy argsort/lexsort + pandas hash dedup).  A shard
serving a hot host with 20%+ of the URL mass processes its backlog at
vectorized speed instead of a Python tuple loop, so the slowest shard
no longer dominates the round.  The remaining lever — salted splits of
a zero-delay hot host across shards with the politeness clock leased
from the base shard (SURVEY.md §4.3) — applies when a single shard's
*vectorized* backlog exceeds the round budget.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

# 2^20 span offsets per document bound the discovery-order key layout.
OK_SHIFT = 20

PENDING_FIELDS = ("canon_url", "url_sha1", "host", "host_hash",
                  "priority", "ok")


def discovery_ok(parent_seq: np.ndarray, offset: np.ndarray) -> np.ndarray:
    """Total discovery-order key: (parent fetch seq, span offset)."""
    return (parent_seq.astype(np.int64) << OK_SHIFT) | np.minimum(
        offset.astype(np.int64), (1 << OK_SHIFT) - 1
    )


def _sha_void(sha_arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Zero-copy void-20 view of a fixed-size-binary(20) column —
    C memcmp comparisons, no Python bytes objects."""
    if isinstance(sha_arr, pa.ChunkedArray):
        sha_arr = sha_arr.combine_chunks()
    raw = np.frombuffer(
        sha_arr.buffers()[1], dtype=np.uint8
    )[sha_arr.offset * 20:(sha_arr.offset + len(sha_arr)) * 20]
    return raw.reshape(-1, 20).view(np.dtype((np.void, 20))).ravel()


def _empty_poll_table() -> pa.Table:
    return pa.table(
        {
            "canon_url": pa.array([], pa.string()),
            "url_sha1": pa.array([], pa.binary(20)),
            "host": pa.array([], pa.string()),
            "host_hash": pa.array([], pa.uint64()),
            "priority": pa.array([], pa.int32()),
            "ok": pa.array([], pa.int64()),
            "fetch_time": pa.array([], pa.float64()),
            "shard": pa.array([], pa.int32()),
        }
    )


@ray.remote(num_cpus=0)
class FrontierShard:
    """One shard: pending queue blocks + politeness clocks for its hosts."""

    def __init__(self, shard_id: int, num_shards: int,
                 robots: dict[str, float] | None = None,
                 seen_shard=None, local_seen: bool = True,
                 spill_dir: str | None = None,
                 spill_threshold_rows: int = 1 << 22,
                 max_pages_per_host: int | None = None,
                 poll_chunk_rows: int = 1 << 20,
                 adaptive: dict | None = None,
                 seen_filter: str = "cuckoo",
                 host_fail_budget: int | None = None) -> None:
        from .. import warm_worker

        warm_worker()   # pre-fault arenas once, outside any timed poll
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.crawl_delay = robots or {}   # host -> delay (seconds, logical)
        # T5 adaptive politeness (opt-in; reference AutoThrottle,
        # settings.py:119-128): per-host EWMA of observed latency.
        # ``adaptive`` carries {start_delay, max_delay,
        # target_concurrency}; effective delay = max(robots delay,
        # adapted delay).  OFF by default so the deterministic
        # politeness-clock oracle stays canonical.
        self.adaptive = adaptive
        self.adaptive_delay: dict[str, float] = {}
        # host circuit breaker (opt-in): once a host accumulates
        # ``host_fail_budget`` failed fetches, its pending candidates
        # are dropped at poll time (they are already seen-marked, so
        # like the O4 budget overflow they never reschedule).
        self.host_fail_budget = host_fail_budget
        self.host_failures: dict[str, int] = {}
        self.quarantined: set[str] = set()
        self._quarantined_hh = np.empty(0, dtype=np.uint64)
        self.n_quarantine_skipped = 0
        self.pending: list[pa.Table] = []  # columnar enqueue blocks
        self.next_time: dict[str, float] = {}
        # O4 per-host pagination budget (the reference's "Load more"
        # loop bound, publications.py:74-89): total pages scheduled per
        # host across all rounds is capped; over-budget candidates are
        # dropped AFTER seen-marking (never rescheduled).  Requires
        # host-hash routing (the engine disables url-hash salting when
        # a budget is set) so each host's counter lives on one shard.
        self.max_pages_per_host = max_pages_per_host
        self.pages_sched: dict[str, int] = {}
        # Memory-bounded queue (SURVEY.md §4.3): when the in-memory
        # pending backlog exceeds the threshold, blocks spill to this
        # shard's spill dir as OK-SORTED runs.  poll_round then does a
        # streaming min-ok merge over the runs (plus the in-memory
        # tail): bounded chunks are deduped and seen-probed one at a
        # time, so only schedule SURVIVORS accumulate in the heap — the
        # backlog itself is bounded by disk at enqueue time AND at poll
        # time (peak heap ≈ runs × poll_chunk_rows + output size).
        self.spill_dir = spill_dir
        self.spill_threshold_rows = spill_threshold_rows
        self.poll_chunk_rows = poll_chunk_rows
        self._pending_rows = 0
        self._spill_files: list[str] = []
        self._spill_seq = 0
        self.spill_count = 0
        # Co-located seen state (same routing partition): held INSIDE
        # this actor, so the schedule-time dedup probe is a plain
        # method call — no cross-actor RPC, no key-list pickling.
        # ``seen_shard`` (an external actor handle) is supported for
        # the split deployment but costs a serialized round trip.
        self.seen_shard = seen_shard
        if local_seen and seen_shard is None:
            from .seen import SeenCore

            self.seen = SeenCore(seed=42 + shard_id,
                                 filter_kind=seen_filter)
        else:
            self.seen = None

    def set_robots(self, delays: dict[str, float]) -> None:
        self.crawl_delay.update(delays)

    def enqueue_block(self, tbl: pa.Table) -> int:
        """O(1): stash the Arrow block; all work happens at poll."""
        self.pending.append(tbl)
        self._pending_rows += tbl.num_rows
        if (self.spill_dir is not None
                and self._pending_rows >= self.spill_threshold_rows):
            self._spill()
        return tbl.num_rows

    def _spill(self) -> None:
        import os

        from ..storage import backend as storage_backend

        bk = storage_backend()
        os.makedirs(self.spill_dir, exist_ok=True)
        path = bk.fragment_path(
            self.spill_dir, f"spill-{self._spill_seq:06d}"
        )
        self._spill_seq += 1
        # ok-sorted run: poll_round's streaming min-ok merge depends on
        # every spilled run being sorted (the in-memory tail is sorted
        # at poll time).
        bk.write_fragment(
            pa.concat_tables(self.pending).sort_by("ok"), path
        )
        self._spill_files.append(path)
        self.spill_count += 1
        self.pending = []
        self._pending_rows = 0

    def spill_stats(self) -> dict:
        return {"spills": self.spill_count,
                "spilled_files": len(self._spill_files),
                "pending_rows": self._pending_rows}

    def enqueue(self, canon_url, url_sha1, host, host_hash,
                priority, ok) -> int:
        """List-based enqueue (tests / simple callers)."""
        return self.enqueue_block(pa.table(
            {
                "canon_url": pa.array(canon_url, pa.string()),
                "url_sha1": pa.array(url_sha1, pa.binary(20)),
                "host": pa.array(host, pa.string()),
                "host_hash": pa.array(
                    np.asarray(host_hash, dtype=np.uint64), pa.uint64()
                ),
                "priority": pa.array(priority, pa.int32()),
                "ok": pa.array(np.asarray(ok, dtype=np.int64), pa.int64()),
            }
        ))

    def _dedup_probe(self, t: pa.Table) -> pa.Table:
        """Steps 1–2 of the canonical poll model over one bounded chunk.

        1. first-discovered (min-``ok``) occurrence per SHA wins:
           stable argsort by ok, then first-occurrence via np.unique
           over a zero-copy void-20 view of the fixed-size binary
           column — C memcmp sort, no Python bytes objects.
        2. probe the co-located seen state (test-and-mark, local).
           Keys stay a numpy void-20 array and URLs an Arrow column —
           zero per-key Python objects (SURVEY.md perf discipline).

        Returns the surviving rows in ascending-``ok`` order.
        """
        if t.num_rows == 0:
            return t
        ok = t.column("ok").to_numpy(zero_copy_only=False)
        sha_v = _sha_void(t.column("url_sha1"))
        order = np.argsort(ok, kind="stable")
        _, first = np.unique(sha_v[order], return_index=True)
        cand_idx = order[np.sort(first)]             # in ok order
        if cand_idx.size and (self.seen is not None
                              or self.seen_shard is not None):
            canon_col = t.column("canon_url")
            if isinstance(canon_col, pa.ChunkedArray):
                canon_col = canon_col.combine_chunks()
            kv = np.ascontiguousarray(sha_v[cand_idx])
            us = canon_col.take(pa.array(cand_idx, pa.int64()))
            if self.seen is not None:
                new_mask = self.seen.contains_and_add(kv, us)
            else:
                new_mask = ray.get(
                    self.seen_shard.contains_and_add.remote(kv, us)
                )
            cand_idx = cand_idx[new_mask]
        return t.take(pa.array(cand_idx, pa.int64()))

    def _poll_streaming(self) -> pa.Table:
        """Streaming min-ok merge over ok-sorted runs; heap-bounded.

        Each spill file is an ok-sorted run; the in-memory tail is
        sorted and appended as one more run.  A safe frontier — the
        minimum over non-exhausted runs of their last buffered ``ok``
        — bounds the rows that can be processed: no unread row can
        have a smaller ``ok``, so per-chunk :meth:`_dedup_probe` picks
        exactly the global min-ok occurrence per SHA (later duplicates
        land in later chunks and are rejected by the seen probe, which
        marks at schedule time).  Peak heap is runs × poll_chunk_rows
        + survivors, never the whole spilled backlog.
        """
        from ..storage import backend as storage_backend

        bk = storage_backend()
        runs = [
            bk.iter_fragment(p, self.poll_chunk_rows)
            for p in self._spill_files
        ]
        if self.pending:
            tail = pa.concat_tables(self.pending).sort_by("ok")
            self.pending = []
            self._pending_rows = 0
            runs.append(iter((tail,)))
        n = len(runs)
        bufs: list[pa.Table | None] = [None] * n
        exhausted = [False] * n
        survivors: list[pa.Table] = []
        # Without a seen state the per-chunk _dedup_probe only dedups
        # WITHIN its chunk (the non-spill path sees the whole backlog
        # at once); carry a per-poll emitted-SHA filter across chunks
        # so a SHA spanning two chunks survives exactly once.  The
        # min-ok frontier guarantees the first-emitted occurrence is
        # the global min-ok one.
        track = self.seen is None and self.seen_shard is None
        # Amortized membership structure: one big SORTED array probed
        # by searchsorted (O(s log E) per chunk) plus a small list of
        # not-yet-merged parts probed by isin; parts fold into the
        # sorted array once they outgrow it (O(E log E) total, not the
        # O(E x chunks) a per-chunk re-concatenate would cost).
        em_sorted = np.empty(0, dtype=np.dtype((np.void, 20)))
        em_parts: list[np.ndarray] = []
        em_rows = 0

        def probe(chunk: pa.Table) -> pa.Table:
            nonlocal em_sorted, em_parts, em_rows
            sub = self._dedup_probe(chunk)
            if not track or sub.num_rows == 0:
                return sub
            sha = _sha_void(sub.column("url_sha1"))
            keep = np.ones(sha.size, dtype=bool)
            if em_sorted.size:
                pos = np.searchsorted(em_sorted, sha)
                inb = pos < em_sorted.size
                keep[inb] = em_sorted[pos[inb]] != sha[inb]
            for p in em_parts:
                keep &= ~np.isin(sha, p)
            if not keep.all():
                sub = sub.filter(pa.array(keep))
                sha = sha[keep]
            if sha.size:
                em_parts.append(np.ascontiguousarray(sha))
                em_rows += sha.size
                if em_rows >= max(em_sorted.size, self.poll_chunk_rows):
                    em_sorted = np.sort(
                        np.concatenate([em_sorted, *em_parts])
                    )
                    em_parts, em_rows = [], 0
            return sub

        def refill(i: int) -> None:
            try:
                nxt = next(runs[i])
            except StopIteration:
                exhausted[i] = True
                return
            bufs[i] = (
                nxt if bufs[i] is None or bufs[i].num_rows == 0
                else pa.concat_tables([bufs[i], nxt])
            )

        for i in range(n):
            refill(i)
        while True:
            active = [
                i for i in range(n)
                if bufs[i] is not None and bufs[i].num_rows
            ]
            if not active:
                break
            open_runs = [i for i in active if not exhausted[i]]
            if not open_runs:
                # every run fully buffered — flush the remainder
                chunk = pa.concat_tables([bufs[i] for i in active])
                for i in active:
                    bufs[i] = None
                sub = probe(chunk)
                if sub.num_rows:
                    survivors.append(sub)
                break
            frontier = min(
                bufs[i].column("ok")[bufs[i].num_rows - 1].as_py()
                for i in open_runs
            )
            parts = []
            for i in active:
                okv = bufs[i].column("ok").to_numpy(
                    zero_copy_only=False
                )
                cut = int(np.searchsorted(okv, frontier, side="left"))
                if cut:
                    parts.append(bufs[i].slice(0, cut))
                    bufs[i] = bufs[i].slice(cut)
            progressed = bool(parts)
            if parts:
                sub = probe(pa.concat_tables(parts))
                if sub.num_rows:
                    survivors.append(sub)
            # Refill only shallow buffers (runs far ahead of the
            # frontier keep one batch — peak heap stays runs × chunk).
            # On a tie-stall (nothing consumed: every buffered row has
            # ok == frontier) refill ALL open runs to force progress.
            for i in open_runs:
                if not progressed or bufs[i].num_rows < \
                        self.poll_chunk_rows:
                    refill(i)
        for p in self._spill_files:
            bk.delete_fragment(p)
        self._spill_files = []
        if not survivors:
            return _empty_poll_table()
        return pa.concat_tables(survivors).combine_chunks()

    def poll_round(self, round_no: int) -> pa.Table:
        """Dedup → seen-probe → politeness-pace all pending candidates.

        Per the canonical model: duplicates of a SHA collapse to the
        min-``ok`` (first-discovered) occurrence; already-seen URLs are
        dropped WITHOUT consuming a politeness slot; survivors are
        marked seen (schedule-time marking, like Scrapy's dupefilter)
        and get fetch times ``next_time[host] + i*delay``.  Fully
        vectorized; returns one Arrow table (zero-copy to the driver's
        round merge).
        """
        import os as _os
        import time as _tm
        _trace = _os.environ.get("WKM_POLL_TIMING")
        _t0 = _tm.perf_counter()
        _c0 = _tm.process_time()
        import resource as _rs
        _r0 = _rs.getrusage(_rs.RUSAGE_SELF)
        if self._spill_files:
            # Streaming min-ok merge over the ok-sorted spill runs +
            # the in-memory tail: never rehydrates the backlog.
            sub = self._poll_streaming()
        else:
            if not self.pending:
                return _empty_poll_table()
            t = pa.concat_tables(self.pending).combine_chunks()
            self.pending = []
            self._pending_rows = 0
            sub = self._dedup_probe(t)
        _t3 = _tm.perf_counter()
        if sub.num_rows == 0:
            return _empty_poll_table()
        if self.quarantined:
            hh_np = sub.column("host_hash").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            keep = ~np.isin(hh_np, self._quarantined_hh)
            if not keep.all():
                self.n_quarantine_skipped += int((~keep).sum())
                sub = sub.filter(pa.array(keep))
                if sub.num_rows == 0:
                    return _empty_poll_table()

        # 3. politeness pacing, vectorized per host: survivors sorted
        #    (host, priority, ok); within-host rank i gets
        #    fetch_time = next_time[host] + i * delay.  Grouping runs
        #    on the int64 host hash (np.unique in C); host STRINGS are
        #    touched only once per unique host for the delay/clock maps.
        hh2 = sub.column("host_hash").to_numpy(zero_copy_only=False)
        prio = sub.column("priority").to_numpy(zero_copy_only=False)
        ok2 = sub.column("ok").to_numpy(zero_copy_only=False)
        uniq_hh, first_pos, codes = np.unique(
            hh2, return_index=True, return_inverse=True
        )
        order2 = np.lexsort((ok2, prio, codes))
        c_sorted = codes[order2]
        change = np.r_[True, c_sorted[1:] != c_sorted[:-1]]
        grp_start_pos = np.flatnonzero(change)
        grp_len = np.diff(np.r_[grp_start_pos, len(c_sorted)])
        rank = np.arange(len(c_sorted)) - np.repeat(grp_start_pos, grp_len)

        host_col = sub.column("host")
        uniq_hosts = [
            host_col[int(i)].as_py() for i in first_pos
        ]
        first_codes = c_sorted[grp_start_pos]
        eff_len = grp_len
        if self.max_pages_per_host is not None:
            # O4: cap each host's schedule at its remaining budget —
            # the first `rem` candidates in (priority, ok) order win;
            # the rest stay seen-marked and are never rescheduled.
            used = np.array(
                [self.pages_sched.get(h, 0) for h in uniq_hosts],
                dtype=np.int64,
            )
            rem = np.maximum(self.max_pages_per_host - used, 0)
            eff_len = np.minimum(grp_len, rem[first_codes])
            for gc, kl in zip(first_codes, eff_len):
                if kl:
                    h = uniq_hosts[gc]
                    self.pages_sched[h] = (
                        self.pages_sched.get(h, 0) + int(kl)
                    )
            keep = rank < rem[c_sorted]
            order2 = order2[keep]
            c_sorted = c_sorted[keep]
            rank = rank[keep]
            if order2.size == 0:
                return _empty_poll_table()
        delays = np.array(
            [float(self.crawl_delay.get(h, 0.0)) for h in uniq_hosts]
        )
        if self.adaptive is not None:
            start = float(self.adaptive.get("start_delay", 5.0))
            delays = np.maximum(delays, np.array([
                self.adaptive_delay.get(h, start) for h in uniq_hosts
            ]))
        t0s = np.array([self.next_time.get(h, 0.0) for h in uniq_hosts])
        fetch_time = t0s[c_sorted] + rank * delays[c_sorted]
        # advance clocks for delayed hosts (slots consumed this round)
        for gc, gl in zip(first_codes, eff_len):
            if delays[gc] > 0:
                self.next_time[uniq_hosts[gc]] = t0s[gc] + gl * delays[gc]

        out = sub.take(pa.array(order2, pa.int64()))
        out = out.append_column(
            "fetch_time", pa.array(fetch_time, pa.float64())
        )
        if _trace:
            import sys as _sys
            print(
                f"[poll s={self.shard_id}] survivors={sub.num_rows} "
                f"gather={_t3 - _t0:.2f} "
                f"pace={_tm.perf_counter() - _t3:.2f} "
                f"cpu={_tm.process_time() - _c0:.2f} "
                f"wall={_tm.perf_counter() - _t0:.2f} "
                + (lambda r1: f"usr={r1.ru_utime - _r0.ru_utime:.2f} "
                   f"sys={r1.ru_stime - _r0.ru_stime:.2f} "
                   f"minflt={r1.ru_minflt - _r0.ru_minflt} "
                   f"majflt={r1.ru_majflt - _r0.ru_majflt} "
                   f"ivcsw={r1.ru_nivcsw - _r0.ru_nivcsw}")(
                       _rs.getrusage(_rs.RUSAGE_SELF)),
                file=_sys.stderr, flush=True,
            )
        # routing shard of every row IS this shard — carried so the
        # fetch stage can pick the matching page partition without
        # re-deriving the (salted) routing.
        return out.append_column(
            "shard",
            pa.array(
                np.full(out.num_rows, self.shard_id, dtype=np.int32),
                pa.int32(),
            ),
        )

    # -- two-phase poll (scale path) --------------------------------------
    def poll_keys(self, round_no: int) -> pa.Table:
        """Phase 1: poll, but return ONLY the numeric sort keys.

        The full candidate table stays actor-side; the driver computes
        the global round order from (fetch_time, priority, ok) of all
        shards — ~20 bytes/row — then calls :meth:`finalize_round` with
        this shard's global ranks.  The heavy string columns never pass
        through the driver.
        """
        self._polled = self.poll_round(round_no)
        return self._polled.select(["fetch_time", "priority", "ok"])

    def finalize_round(self, seq: np.ndarray, round_no: int,
                       order_dir: str | None = None) -> pa.Table:
        """Phase 2: append the globally-ranked ``seq`` + round columns
        and return the complete block (one zero-copy object-store
        entry, consumed directly by ``from_arrow_refs``).

        When ``order_dir`` is given, this shard also writes its slice of
        the round's crawl-order log as its own parquet part — the
        checkpoint write is parallel across shards and the driver never
        concatenates, sorts or writes the full round's URL list (which
        at 10^10 URLs would be a driver OOM, and at bench scale was a
        ~30 s serial tail per round)."""
        t = self._polled
        self._polled = None
        t = t.append_column(
            "seq", pa.array(np.asarray(seq, dtype=np.int64), pa.int64())
        )
        t = t.append_column(
            "round",
            pa.array(
                np.full(t.num_rows, round_no, dtype=np.int32), pa.int32()
            ),
        )
        if order_dir is not None and t.num_rows:
            from ..storage import backend as storage_backend

            bk = storage_backend()
            bk.write_fragment_atomic(
                t,
                bk.fragment_path(
                    order_dir, f"crawl_order-shard={self.shard_id}"
                ),
            )
        return t

    def pending_count(self) -> int:
        return int(sum(b.num_rows for b in self.pending))

    # -- checkpoint -------------------------------------------------------
    def dump(self) -> dict:
        """State snapshot.  Spilled runs are NOT rehydrated — they are
        referenced by path and snapshotted by :meth:`dump_to` via hard
        links, so checkpointing an oversized backlog costs no heap."""
        return {
            "pending": (pa.concat_tables(self.pending)
                        if self.pending else None),
            "next_time": dict(self.next_time),
            "pages_sched": dict(self.pages_sched),
            "spill_files": list(self._spill_files),
            "adaptive_delay": dict(self.adaptive_delay),
            "host_failures": dict(self.host_failures),
            "quarantined": sorted(self.quarantined),
            "n_quarantine_skipped": self.n_quarantine_skipped,
        }

    def restore(self, state: dict) -> None:
        self.pending = (
            [state["pending"]] if state.get("pending") is not None else []
        )
        self._pending_rows = int(
            sum(b.num_rows for b in self.pending)
        )
        self.next_time = dict(state["next_time"])
        self.pages_sched = dict(state.get("pages_sched") or {})
        # T5 adaptive pacing state survives resume (absent in pre-r4
        # checkpoints → starts fresh, which is also correct)
        self.adaptive_delay = dict(state.get("adaptive_delay") or {})
        # circuit-breaker verdicts survive resume (absent in older
        # checkpoints -> starts fresh, matching pre-breaker behavior)
        self.host_failures = dict(state.get("host_failures") or {})
        self.quarantined = set(state.get("quarantined") or ())
        self._refresh_quarantine_hashes()
        self.n_quarantine_skipped = int(
            state.get("n_quarantine_skipped") or 0)
        # Re-link the checkpoint's spill runs into THIS incarnation's
        # spill dir: the next poll deletes its runs after consuming
        # them, and it must never mutate the checkpoint (a second
        # resume from the same round has to keep working).
        runs = list(state.get("spill_files") or [])
        self._spill_files = []
        self._spill_seq = 0
        self.spill_count = 0
        if not runs:
            return
        from ..storage import backend as storage_backend

        bk = storage_backend()
        if self.spill_dir is None:
            # config changed under the checkpoint: fall back to
            # rehydrating the runs into the in-memory queue
            for src in runs:
                t = bk.read_fragment(src)
                self.pending.append(t)
                self._pending_rows += t.num_rows
            return
        import os

        os.makedirs(self.spill_dir, exist_ok=True)
        for src in runs:
            dst = bk.fragment_path(
                self.spill_dir, f"spill-{self._spill_seq:06d}"
            )
            self._spill_seq += 1
            bk.link_fragment(src, dst)
            self._spill_files.append(dst)
        self.spill_count = len(self._spill_files)

    def dump_to(self, path: str) -> None:
        """Write this shard's state to its own file — checkpointing is
        parallel across shards and never serializes queue state through
        the driver (the per-partition lineage of the north rule).

        Spilled runs are snapshotted as hard links under
        ``path + ".spill"`` (same filesystem by the checkpoint
        layout): the link survives the original's deletion by a later
        poll, so resume-from-this-round stays valid forever, at zero
        copy cost."""
        import os
        import pickle

        state = self.dump()
        runs = state.pop("spill_files")
        linked = []
        if runs:
            from ..storage import backend as storage_backend

            bk = storage_backend()
            snap_dir = path + ".spill"
            os.makedirs(snap_dir, exist_ok=True)
            for k, src in enumerate(runs):
                dst = bk.fragment_path(snap_dir, f"run-{k:06d}")
                bk.link_fragment(src, dst)
                linked.append(dst)
        state["spill_files"] = linked
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)

    def restore_from(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            self.restore(pickle.load(f))

    # -- co-located seen state -------------------------------------------
    def seen_snapshot(self):
        """Columnar snapshot: (void-20 key array, Arrow url column)."""
        if self.seen is None:
            return (np.empty(0, dtype=np.dtype((np.void, 20))),
                    pa.array([], pa.string()))
        return self.seen.snapshot_columns()

    def seen_restore(self, keys, urls) -> int:
        return self.seen.restore(keys, urls) if self.seen is not None else 0

    def observe_failures(self, hosts: list[str],
                         counts: list[int]) -> None:
        """Accumulate per-host failed-fetch counts; trip the breaker at
        the budget.  No-op unless the shard was built with
        ``host_fail_budget``."""
        if self.host_fail_budget is None:
            return
        for h, c in zip(hosts, counts):
            n = self.host_failures.get(h, 0) + int(c)
            self.host_failures[h] = n
            if n >= self.host_fail_budget:
                self.quarantined.add(h)
        self._refresh_quarantine_hashes()

    def _refresh_quarantine_hashes(self) -> None:
        """int64-filterable form of the quarantine set, so the poll
        filter compares C-speed host hashes, never Python strings."""
        from ..functions.canonicalize import host_hash64

        self._quarantined_hh = np.array(
            sorted(host_hash64(h) for h in self.quarantined),
            dtype=np.uint64)

    def quarantine_stats(self) -> dict:
        return {
            "quarantined_hosts": sorted(self.quarantined),
            "skipped": self.n_quarantine_skipped,
        }

    def observe_latency(self, hosts: list[str],
                        latency_s: list[float]) -> None:
        """Feed observed per-host fetch latencies into the adaptive
        delay (reference AutoThrottle update, Scrapy semantics: target
        = latency / target_concurrency, new = (prev + target) / 2,
        clamped to [robots delay, max_delay]).  No-op unless the shard
        was built with ``adaptive``."""
        if self.adaptive is None:
            return
        start = float(self.adaptive.get("start_delay", 5.0))
        mx = float(self.adaptive.get("max_delay", 60.0))
        tc = float(self.adaptive.get("target_concurrency", 1.0))
        for h, lat in zip(hosts, latency_s):
            prev = self.adaptive_delay.get(h, start)
            target = float(lat) / tc
            new = (prev + target) / 2.0
            base = float(self.crawl_delay.get(h, 0.0))
            self.adaptive_delay[h] = min(max(new, base), mx)

    def adaptive_state(self) -> dict[str, float]:
        """Current per-host adapted delays (test/introspection hook)."""
        return dict(self.adaptive_delay)


class Frontier:
    """Driver-side handle over the frontier shard pool."""

    def __init__(self, num_shards: int,
                 crawl_delays: dict[str, float] | None = None,
                 seen_shards: list | None = None,
                 max_pages_per_host: int | None = None,
                 spill_dir: str | None = None,
                 spill_threshold_rows: int = 1 << 22,
                 adaptive: dict | None = None,
                 seen_filter: str = "cuckoo",
                 host_fail_budget: int | None = None) -> None:
        import os

        self.num_shards = num_shards
        self.shards = [
            FrontierShard.remote(
                i, num_shards, crawl_delays,
                seen_shards[i] if seen_shards else None,
                spill_dir=(
                    os.path.join(spill_dir, f"shard={i}")
                    if spill_dir else None
                ),
                spill_threshold_rows=spill_threshold_rows,
                max_pages_per_host=max_pages_per_host,
                adaptive=adaptive,
                seen_filter=seen_filter,
                host_fail_budget=host_fail_budget,
            )
            for i in range(num_shards)
        ]

    def spill_stats(self) -> list[dict]:
        return ray.get([s.spill_stats.remote() for s in self.shards])

    def push_failures(self, hosts: list[str],
                      counts: list[int]) -> None:
        """Synchronously deliver per-host failure counts to each host's
        home shard (breaker mode routes by host, so ownership is
        single-shard); the ray.get makes quarantine decisions visible
        to the NEXT poll — deterministic, unlike a fire-and-forget."""
        from ..functions.canonicalize import host_hash64

        hh = np.array([host_hash64(h) for h in hosts], dtype=np.uint64)
        shard = (hh % np.uint64(self.num_shards)).astype(np.int64)
        futs = []
        for si in range(self.num_shards):
            m = shard == si
            if m.any():
                futs.append(self.shards[si].observe_failures.remote(
                    [hosts[i] for i in np.flatnonzero(m)],
                    [counts[i] for i in np.flatnonzero(m)]))
        if futs:
            ray.get(futs)

    def quarantine_stats(self) -> list[dict]:
        return ray.get(
            [s.quarantine_stats.remote() for s in self.shards])

    def shard_of(self, host_hash: np.ndarray) -> np.ndarray:
        return (np.asarray(host_hash, dtype=np.uint64)
                % np.uint64(self.num_shards)).astype(np.int64)

    def enqueue_table(self, tbl: pa.Table, shard=None) -> int:
        """Route a candidate table to shards (Arrow blocks end-to-end).

        ``shard`` is the per-row routing decision (salted: url-hash for
        zero-delay hosts, host-hash for delayed ones — crawl.route_shard);
        defaults to plain host-hash routing.
        """
        if tbl.num_rows == 0:
            return 0
        tbl = tbl.select(list(PENDING_FIELDS))
        if shard is None:
            hh = tbl.column("host_hash").to_numpy(zero_copy_only=False)
            shard = self.shard_of(hh)
        futs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard == s)
            if idx.size == 0:
                continue
            futs.append(
                self.shards[s].enqueue_block.remote(
                    tbl.take(pa.array(idx, pa.int64()))
                )
            )
        return int(sum(ray.get(futs)))

    def poll_round(self, round_no: int) -> pa.Table:
        """Collect all shards' paced candidates, globally ordered.

        Sort key = (fetch_time, priority, ok) — the canonical round
        order.  A dense global ``seq`` is appended by the caller.
        """
        parts = ray.get(
            [s.poll_round.remote(round_no) for s in self.shards]
        )
        tbl = pa.concat_tables(parts).combine_chunks()
        if tbl.num_rows:
            order = pa.compute.sort_indices(
                tbl,
                sort_keys=[("fetch_time", "ascending"),
                           ("priority", "ascending"), ("ok", "ascending")],
            )
            tbl = tbl.take(order)
        return tbl

    def poll_round_distributed(self, round_no: int, seq_base: int,
                               order_dir: str | None = None):
        """Two-phase poll: numeric keys to the driver, global lexsort,
        actor-side seq finalize.  Returns ``(block_refs, n, max_ft)``
        where ``block_refs`` are per-shard Arrow tables (object refs,
        ready for ``ray.data.from_arrow_refs``) already carrying dense
        global ``seq`` in canonical order (fetch_time, priority, ok).
        Driver critical path is one lexsort over ~20 B/row — no string
        column is ever concatenated, sorted or re-put driver-side.
        """
        keys = ray.get(
            [s.poll_keys.remote(round_no) for s in self.shards]
        )
        sizes = np.array([k.num_rows for k in keys], dtype=np.int64)
        n = int(sizes.sum())
        if n == 0:
            # release the empty polled tables
            ray.get([
                s.finalize_round.remote(
                    np.empty(0, dtype=np.int64), round_no, None
                )
                for s in self.shards
            ])
            return [], 0, 0.0
        ft = np.concatenate(
            [k.column("fetch_time").to_numpy(zero_copy_only=False)
             for k in keys]
        )
        prio = np.concatenate(
            [k.column("priority").to_numpy(zero_copy_only=False)
             for k in keys]
        )
        ok = np.concatenate(
            [k.column("ok").to_numpy(zero_copy_only=False) for k in keys]
        )
        # Adaptive key collapse: with uniform priority (the common
        # case) the canonical (fetch_time, priority, ok) order splits at
        # ft == min(ft): the zero-delay mass sorts by ``ok`` alone (one
        # argsort — the driver's serial chunk shrinks ~3×) and the few
        # politeness-delayed rows (ft > min) sort after it by (ft, ok).
        # ``ok`` collides when span offsets clamp at 2^20-1, so the sort
        # must be stable (lexsort parity) for a deterministic tie order.
        uniform_prio = prio.size == 0 or (prio[0] == prio).all()
        if uniform_prio:
            ftmin = ft.min()
            simple = ft == ftmin
            if simple.all():
                order = np.argsort(ok, kind="stable")
            else:
                si = np.flatnonzero(simple)
                ci = np.flatnonzero(~simple)
                order = np.concatenate([
                    si[np.argsort(ok[si], kind="stable")],
                    ci[np.lexsort((ok[ci], ft[ci]))],
                ])
        else:
            order = np.lexsort((ok, prio, ft))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = seq_base + np.arange(n, dtype=np.int64)
        bounds = np.r_[0, np.cumsum(sizes)]
        refs = [
            s.finalize_round.remote(rank[bounds[i]:bounds[i + 1]],
                                    round_no, order_dir)
            for i, s in enumerate(self.shards)
        ]
        nonempty = [r for r, sz in zip(refs, sizes) if sz > 0]
        return nonempty, n, float(ft.max())

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

    def snapshot_seen(self) -> tuple[np.ndarray, pa.Array]:
        """Exact seen keys/urls across all co-located seen states —
        columnar: (void-20 key array, Arrow url column)."""
        pairs = ray.get([s.seen_snapshot.remote() for s in self.shards])
        keys = (
            np.concatenate([p[0] for p in pairs if len(p[0])])
            if any(len(p[0]) for p in pairs)
            else np.empty(0, dtype=np.dtype((np.void, 20)))
        )
        url_parts = [
            p[1].combine_chunks()
            if isinstance(p[1], pa.ChunkedArray) else p[1]
            for p in pairs if len(p[1])
        ]
        urls = (
            pa.concat_arrays(url_parts)
            if url_parts else pa.array([], pa.string())
        )
        return keys, urls

    def restore_seen(self, keys, urls, shard: np.ndarray) -> None:
        """Replay keys/urls into shards; ``shard`` is the recorded
        (salted) per-key routing.  Accepts columnar or list inputs."""
        from .seen import as_void20

        kv = as_void20(keys)
        if isinstance(urls, list):
            urls = pa.array(urls, pa.string())
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        shard = np.asarray(shard, dtype=np.int64)
        futs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard == s)
            if idx.size == 0:
                continue
            futs.append(
                self.shards[s].seen_restore.remote(
                    np.ascontiguousarray(kv[idx]),
                    urls.take(pa.array(idx, pa.int64())),
                )
            )
        ray.get(futs)

    def dump_to_dir(self, dirpath: str) -> None:
        import os

        os.makedirs(dirpath, exist_ok=True)
        ray.get([
            s.dump_to.remote(os.path.join(dirpath, f"shard={i}.pkl"))
            for i, s in enumerate(self.shards)
        ])

    def restore_from_dir(self, dirpath: str) -> None:
        import os

        ray.get([
            s.restore_from.remote(os.path.join(dirpath, f"shard={i}.pkl"))
            for i, s in enumerate(self.shards)
        ])
