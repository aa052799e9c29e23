"""The crawl engine: Ray-Data round loop over the frontier.

Cyclic dataflow (fetch → extract → new URLs → fetch) cannot live inside
one acyclic Dataset, so the loop lives in the DRIVER (SURVEY.md §4.3):
long-lived frontier + seen actors hold state across rounds, and each
round runs one streaming Dataset pipeline over the heavy payload:

    frontier.poll (politeness-paced, dedup-probed, globally ordered)
      → ray.data Dataset of candidates
      → map_batches(SyntheticWebFetcher)      # stateful actor pool
      → write_parquet(docs/round=r)           # resumable partitioned sink
      → read_parquet → map_batches(LinkRouter)  # extract+canonicalize+
                                                # filter+partial-dedup+route
      → tiny per-batch count rows (consumed as the round summary)

Control-plane rows (URL, sha1, priority, ok ≈ 100 B) flow through the
actor shards; data-plane rows (spans payload) flow only through Dataset
blocks and parquet partitions — at the 10^10-URL design point the
former is ~1 TB spread over shards (spillable), the latter is the
~100 TB streamed through the object store.

Checkpoint layout per round (the per-partition lineage of the north
rule): ``rounds/round=R/crawl_order-shard=S.parquet`` (scheduled URLs =
the seen-set delta, one part per frontier shard, written by the shard
actors in parallel), ``docs/round=R/*.parquet`` (fetched payload, one
part per fetch task), ``frontier/round=R/shard=S.pkl`` (pending queues
+ politeness clocks), ``manifest.json`` (run_id, next round, global
seq, max fetch time, per-round counts).  Resume = restore manifest +
frontier dumps + replay crawl_order deltas into the seen shards; doc
writes are per-round directories so finished rounds are skipped
(idempotent, mirroring the reference's HTTP-cache + upsert re-run
story, settings.py:132, queries/lists.sql:1-9).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.canonicalize import canonicalize_arrow, canonicalize_batch
from ..functions.robots import RobotsRules, offsite_mask, offsite_mask_arrow
from ..storage import backend as storage_backend
from ..stages.extract import (
    extract_profile_sections,
    extract_title_links,
    extract_title_metadata,
    extract_volumes,
    ids_from_url_tail,
    rank_positions,
)
from ..stages.fetch import SyntheticWebFetcher
from ..state.frontier import OK_SHIFT, Frontier


class LinkRouter:
    """Stateless-per-batch, stateful-per-actor link router.

    ``__init__`` (once per actor) holds the broadcast robots rules,
    allowed domains and the frontier shard handles; ``__call__`` (per
    batch) extracts link spans in document order, canonicalizes them
    against the page URL (relative hrefs, lists.py:52), applies
    offsite + robots filters, partially dedups within the batch (keep
    min ``ok`` per sha — the shuffle combiner), routes survivors to
    frontier shards by ``host_hash % P`` and returns one summary row.
    """

    def __init__(self, rules_ref, allowed_domains, frontier_shards,
                 route_by_host: bool = False,
                 strip_tracking: bool = False,
                 breaker: bool = False):
        self.rules: RobotsRules = (
            ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef)
            else rules_ref
        )
        self.allowed = frozenset(allowed_domains)
        self.shards = frontier_shards
        self.num_shards = len(frontier_shards)
        self.route_by_host = route_by_host
        self.strip_tracking = strip_tracking
        self.breaker = breaker
        self.delayed = frozenset(
            h for h, d in self.rules.delay.items() if d > 0
        )

    def _write_metrics(self, batch: pa.Table, n_links_row: np.ndarray,
                       n_cand_row: np.ndarray, path: str) -> None:
        """Per-ENTITY scraping-log rows (reference sqlmanager.py:266-302,
        001_initial_schema.sql:97-106): one row per fetched URL with
        operation/status/error plus the deterministic per-page link
        counts.  Written as a side parquet per batch, named by seq range
        (idempotent under resume, like the docs partition)."""
        ok = pc.equal(batch["fetch_status"], "fetched")
        status = pc.if_else(ok, "completed", "failed")
        # error text per failure mode (reference stores the exception
        # string; here the two semantic failures are 404 and retry
        # exhaustion — fetch.py:84,103)
        error = pc.if_else(
            ok,
            "",
            pc.if_else(
                pc.equal(batch["fetch_status"], "missing"),
                "page_not_found",
                "max_retries_exceeded",
            ),
        )
        # scrapper_name: the reference writes the owning spider's name
        # per log row (001_initial_schema.sql:99).  Title pages belong
        # to the "publications" spider (publications.py:26), everything
        # else (profile + list pages) to "lists" (lists.py:15).
        from ..stages.extract import TITLE_RE

        scrapper = pc.if_else(
            pc.match_substring_regex(batch["canon_url"], TITLE_RE),
            "publications",
            "lists",
        )
        # duration_ms (001_initial_schema.sql:104): per-entity share of
        # the fetch stage's batch wall-clock, attributed by the fetcher
        # (fetch.py); wall-clock, so excluded from oracle comparisons.
        if "fetch_ms" in batch.column_names:
            duration = pc.round(batch["fetch_ms"]).cast(pa.int64())
        else:
            duration = pa.nulls(batch.num_rows, pa.int64())
        tbl = pa.table(
            {
                "entity_id": batch["canon_url"],
                "seq": batch["seq"],
                "scrapper_name": scrapper,
                "operation": pa.array(
                    ["fetch"] * batch.num_rows, pa.string()
                ),
                "status": status,
                "error": error,
                "duration_ms": duration,
                "n_links": pa.array(n_links_row, pa.int64()),
                "n_candidates": pa.array(n_cand_row, pa.int64()),
            }
        )
        storage_backend().write_fragment(tbl, path)

    def __call__(self, batch: pa.Table,
                 metrics_path: str | None = None) -> pa.Table:
        n_fetched = int(
            pc.sum(
                pc.equal(batch["fetch_status"], "fetched").cast(pa.int32())
            ).as_py()
            or 0
        )
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(spans)
        is_link = pc.equal(flat.field("kind"), "link").to_numpy(
            zero_copy_only=False
        )
        idx = np.flatnonzero(is_link)
        failed_hosts, failed_counts = [], []
        if self.breaker and n_fetched < batch.num_rows:
            fail_mask = pc.invert(
                pc.equal(batch["fetch_status"], "fetched")).to_numpy(
                zero_copy_only=False)
            fh, fc = np.unique(
                batch["host"].to_numpy(zero_copy_only=False)[fail_mask],
                return_counts=True)
            failed_hosts = [str(h) for h in fh]
            failed_counts = [int(c) for c in fc]
        summary = {
            "links": [int(idx.size)],
            "candidates": [0],
            "fetched": [n_fetched],
            "missing": [int(batch.num_rows - n_fetched)],
            # per-host failure counts for the driver-side circuit
            # breaker feedback (applied synchronously between rounds
            # so quarantine decisions are deterministic)
            "failed_hosts": [failed_hosts],
            "failed_counts": [failed_counts],
        }
        n_links_row = np.bincount(
            parent[idx], minlength=batch.num_rows
        ).astype(np.int64)
        if idx.size == 0:
            if metrics_path:
                self._write_metrics(
                    batch, n_links_row,
                    np.zeros(batch.num_rows, np.int64), metrics_path,
                )
            return pa.table(summary)

        # Arrow-native end-to-end: no per-link Python strings are ever
        # materialized on the fast path — at 10^7 links/round, object
        # churn (allocator arena mmap/munmap) costs more in page-fault
        # kernel time on virtualized hosts than the hashing itself.
        take_idx = pa.array(idx, pa.int64())
        hrefs_arr = flat.field("media_ref").take(take_idx)
        offsets = flat.field("offset").take(take_idx).to_numpy(
            zero_copy_only=False
        )
        base_col = batch.column("canon_url")
        if isinstance(base_col, pa.ChunkedArray):
            base_col = base_col.combine_chunks()
        seqs = batch.column("seq").to_numpy(zero_copy_only=False)
        link_parent = parent[idx]
        parent_seq = seqs[link_parent]

        cols = canonicalize_arrow(
            hrefs_arr,
            base_for=lambda j: base_col[int(link_parent[j])].as_py(),
            strip_tracking=self.strip_tracking,
        )
        ok = (parent_seq.astype(np.int64) << OK_SHIFT) | np.minimum(
            offsets.astype(np.int64), (1 << OK_SHIFT) - 1
        )

        keep = offsite_mask_arrow(cols["host"], self.allowed)
        keep &= self.rules.allowed_mask_arrow(cols["host"], cols["canon"])

        # partial dedup: min-ok per sha within the batch (combiner);
        # first occurrence via C sort over the void-20 sha view.
        keep_idx = np.flatnonzero(keep)
        if metrics_path:
            self._write_metrics(
                batch, n_links_row,
                np.bincount(
                    link_parent[keep_idx], minlength=batch.num_rows
                ).astype(np.int64),
                metrics_path,
            )
        if keep_idx.size == 0:
            return pa.table(summary)
        order = keep_idx[np.argsort(ok[keep_idx], kind="stable")]
        _, first = np.unique(cols["sha_void"][order], return_index=True)
        chosen = np.sort(order[first])

        # one Arrow block of survivors, routed per shard via take —
        # columnar end-to-end, no python list marshalling in the RPC
        sha_full = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(20), len(hrefs_arr),
            [None, pa.py_buffer(cols["sha_bytes"])],
        )
        ci = pa.array(chosen, pa.int64())
        cand_tbl = pa.table(
            {
                "canon_url": cols["canon"].take(ci),
                "url_sha1": sha_full.take(ci),
                "host": cols["host"].take(ci),
                "host_hash": pa.array(
                    cols["host_hash"][chosen], pa.uint64()
                ),
                "priority": pa.array(
                    np.zeros(chosen.size, dtype=np.int32), pa.int32()
                ),
                "ok": pa.array(ok[chosen], pa.int64()),
            }
        )
        # delayed flag per unique host (few), mapped through codes
        uniq_delayed = np.array(
            [h in self.delayed for h in cols["uniq_hosts"].to_pylist()],
            dtype=bool,
        )
        is_delayed = (
            uniq_delayed[cols["host_codes"][chosen]]
            if chosen.size else np.zeros(0, dtype=bool)
        )
        if self.route_by_host:
            # budgeted crawl: every host routes to its home shard
            is_delayed = np.ones(chosen.size, dtype=bool)
        shard_of = route_shard_flags(
            is_delayed,
            cols["host_hash"][chosen],
            cols["url_hash"][chosen],
            self.num_shards,
        )
        import time as _t

        _t0 = _t.perf_counter()
        futs = []
        for s in range(self.num_shards):
            sel = np.flatnonzero(shard_of == s)
            if sel.size == 0:
                continue
            futs.append(
                self.shards[s].enqueue_block.remote(
                    cand_tbl.take(pa.array(sel, pa.int64()))
                )
            )
        _t1 = _t.perf_counter()
        ray.get(futs)  # enqueues must land before the next poll
        if os.environ.get("WKM_PROF") == "time":
            import sys

            print(f"[rt] n={batch.num_rows} links={idx.size} "
                  f"submit={_t1 - _t0:.2f} "
                  f"wait={_t.perf_counter() - _t1:.2f}",
                  file=sys.stderr, flush=True)
        summary["candidates"] = [int(chosen.size)]
        return pa.table(summary)


# Per-worker state cache for task-based round stages.  Ray Data actor
# pools are torn down when their Dataset finishes — in a driver ROUND
# LOOP that means paying pool startup every round.  Plain tasks run in
# long-lived worker processes that persist across Datasets, so
# memoizing the broadcast-derived state per worker gives actor-pool
# semantics (build once, reuse per batch) amortized across ALL rounds.
_WORKER_STATE: dict = {}


def _worker_fetcher(pages_ref):
    key = ("fetcher", pages_ref.hex())
    if key not in _WORKER_STATE:
        obj = ray.get(pages_ref)
        if isinstance(obj, dict) and "__transport__" in obj:
            # real-transport mode: the broadcast carries a fetcher
            # spec instead of a page partition (same seam — routing,
            # extraction, retries, checkpoints are transport-agnostic)
            from ..stages.fetch import HttpFetcher

            _WORKER_STATE[key] = HttpFetcher(**obj["__transport__"])
        else:
            _WORKER_STATE[key] = SyntheticWebFetcher(pages_ref)
    return _WORKER_STATE[key]


def _fetch_batch(batch: pa.Table, pages_parts=None,
                 middlewares=None) -> pa.Table:
    """Shard-run fetch: resolve each contiguous host-shard run of the
    batch against that shard's page partition only.

    run_round sorts candidates by shard before slicing, so a batch is
    one shard (common case) or a handful of contiguous runs at slice
    boundaries — each run is resolved with a small per-partition
    ``index_in`` value set instead of the whole web.
    """
    from ..extensions import (
        apply_middlewares_post,
        apply_middlewares_pre,
    )

    mws = _worker_deref(middlewares) if middlewares is not None else None
    batch = apply_middlewares_pre(batch, mws)
    shard = batch.column("shard").to_numpy(zero_copy_only=False)
    change = np.flatnonzero(np.r_[True, shard[1:] != shard[:-1]])
    if change.size == 1:
        out = _worker_fetcher(pages_parts[shard[0]])(batch)
    else:
        bounds = np.r_[change, len(shard)]
        outs = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            outs.append(
                _worker_fetcher(pages_parts[shard[b0]])(
                    batch.slice(b0, b1 - b0)
                )
            )
        out = pa.concat_tables(outs)
    return apply_middlewares_post(out, mws)


def _worker_deref(ref):
    """Memoized ray.get of a broadcast object (once per worker)."""
    key = ("deref", ref.hex() if isinstance(ref, ray.ObjectRef) else id(ref))
    if key not in _WORKER_STATE:
        _WORKER_STATE[key] = (
            ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        )
    return _WORKER_STATE[key]


_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)"


def route_shard_flags(is_delayed: np.ndarray, host_hash: np.ndarray,
                      url_hash: np.ndarray, num_shards: int) -> np.ndarray:
    """Salted routing from a precomputed per-row delayed flag."""
    if is_delayed.any():
        base = np.where(is_delayed, host_hash, url_hash)
    else:
        base = url_hash
    return (base.astype(np.uint64)
            % np.uint64(num_shards)).astype(np.int64)


def route_shard(hosts: np.ndarray, host_hash: np.ndarray,
                url_hash: np.ndarray, delayed: frozenset,
                num_shards: int,
                route_by_host: bool = False) -> np.ndarray:
    """Salted shard routing — the engine's explicit skew mitigation.

    Zero-delay hosts route by **url hash** (their URLs spread evenly
    over all shards: a hot host with 20% of the corpus no longer lands
    on one shard); hosts WITH a crawl delay route by **host hash** so
    their politeness clock stays on a single shard.  The rule is a
    pure function of (host, url), so dedup stays exact (one URL →
    one shard) and, for zero-delay hosts, pacing is unaffected
    (fetch_time is a constant per round regardless of which shard
    assigns it) — crawl-order conformance is preserved by
    construction (SURVEY.md §4.3 "salted splits").

    ``route_by_host`` forces host-hash routing for EVERY host — the
    per-host pagination budget (O4) counts scheduled pages on the
    host's home shard, so budgeted crawls cannot salt.
    """
    import pandas as pd

    if route_by_host:
        base = host_hash
    elif delayed:
        is_delayed = pd.Index(hosts).isin(list(delayed))
        base = np.where(is_delayed, host_hash, url_hash)
    else:
        base = url_hash
    return (base.astype(np.uint64)
            % np.uint64(num_shards)).astype(np.int64)


def _sha_u64_arrow(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 SHA-1 prefixes hashed straight from Arrow string buffers
    (no per-row Python strings — same memoryview trick as
    canonicalize.sha1_column)."""
    import hashlib

    from ..functions.canonicalize import _string_buffers

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs, mv = _string_buffers(arr)
    n = len(arr)
    out = np.empty(n, dtype=np.uint64)
    _sha1 = hashlib.sha1
    for i in range(n):
        out[i] = int.from_bytes(
            _sha1(mv[offs[i]:offs[i + 1]]).digest()[:8], "big"
        )
    return out


@ray.remote
def _shard_chunk(pages: pa.Table, lo: int, hi: int, num_shards: int,
                 delayed: frozenset, route_by_host: bool):
    """Stage 1 of the distributed page-store layout: route one chunk.

    Reads its slice zero-copy from the broadcast table; returns one
    sub-table PER SHARD (``num_returns=num_shards``) so stage 2 can
    pull exactly the pieces it owns without shipping the rest."""
    from ..functions.canonicalize import host_hash64

    tbl = pages.slice(lo, hi - lo)
    host = pc.struct_field(
        pc.extract_regex(tbl["doc_id"], _HOST_RE), "host"
    )
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    uniq = pc.unique(host)
    uniq_py = uniq.to_pylist()
    hashes = np.array(
        [host_hash64(h) for h in uniq_py], dtype=np.uint64
    )
    codes = pc.index_in(host, value_set=uniq).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    host_hash = hashes[codes]
    if route_by_host:
        shard = (host_hash.astype(np.uint64)
                 % np.uint64(num_shards)).astype(np.int64)
    else:
        url_hash = _sha_u64_arrow(tbl["doc_id"])
        if delayed:
            is_delayed = np.fromiter(
                (h in delayed for h in uniq_py), bool, len(uniq_py)
            )[codes]
        else:
            is_delayed = np.zeros(len(codes), bool)
        shard = route_shard_flags(
            is_delayed, host_hash, url_hash, num_shards
        )
    out = tuple(
        tbl.filter(pa.array(shard == s)) for s in range(num_shards)
    )
    return out if num_shards > 1 else out[0]


@ray.remote
def _concat_partition(*pieces: pa.Table) -> pa.Table:
    """Stage 2: assemble one shard's page partition, contiguous."""
    nonempty = [p for p in pieces if p.num_rows]
    if not nonempty:
        return pieces[0]
    return pa.concat_tables(nonempty).combine_chunks()


def partition_pages_refs(
    pages: pa.Table, num_shards: int,
    delayed: frozenset = frozenset(),
    route_by_host: bool = False,
) -> "list[ray.ObjectRef]":
    """Distributed split of the page store by the engine's (salted)
    routing key — the same rule as :func:`route_shard`, so every
    shard-pure fetch batch finds its docs in exactly one partition.

    The table is broadcast ONCE; parallel tasks route zero-copy slices
    (stage 1) and per-shard tasks assemble the partitions (stage 2), so
    the driver does no per-row work at all — at the 10^10 design point
    this partitioning is the distributed on-disk layout of the page
    store, and the chunk→shard exchange here is exactly that layout
    job.  Returns one ObjectRef per shard; row order within a shard
    equals the input order (filter preserves order per chunk, chunks
    concat in order), matching the previous driver-side layout."""
    n = pages.num_rows
    if n == 0 or num_shards == 1:
        ref = ray.put(pages.combine_chunks())
        return [ref] * num_shards
    pages_ref = ray.put(pages.combine_chunks())
    chunk = max(1 << 16, -(-n // 32))
    chunk_outs = [
        _shard_chunk.options(num_returns=num_shards).remote(
            pages_ref, lo, min(lo + chunk, n), num_shards, delayed,
            route_by_host,
        )
        for lo in range(0, n, chunk)
    ]
    refs = [
        _concat_partition.remote(*[outs[s] for outs in chunk_outs])
        for s in range(num_shards)
    ]
    # Construction is synchronous (like the layout job it stands in
    # for): callers time the crawl from a fully laid-out page store.
    ray.wait(refs, num_returns=len(refs), fetch_local=False)
    return refs


def _worker_router(engine_key, rules_ref, allowed, shards,
                   route_by_host=False,
                   strip_tracking=False,
                   breaker=False) -> "LinkRouter":
    # engine_key includes a per-engine-INSTANCE nonce, not just the
    # checkpoint dir: a resumed engine on the same checkpoint spins up
    # fresh shard actors, and a worker that memoized the previous
    # engine's router would keep enqueueing into killed actors.
    key = ("router", engine_key)
    if key not in _WORKER_STATE:
        _WORKER_STATE[key] = LinkRouter(
            rules_ref, allowed, shards, route_by_host=route_by_host,
            strip_tracking=strip_tracking, breaker=breaker,
        )
    return _WORKER_STATE[key]


def _push_latency(batch: pa.Table, shards) -> None:
    """T5 adaptive mode: report this batch's per-host mean fetch
    latency to each host's home frontier shard (adaptive mode forces
    host-hash routing, so ownership is single-shard).  Fire-and-forget
    actor calls — an observation may land one round late, which is
    fine for a heuristic throttle (Scrapy's AutoThrottle is equally
    asynchronous)."""
    hosts = batch["host"].to_numpy(zero_copy_only=False)
    ms = batch["fetch_ms"].to_numpy(zero_copy_only=False)
    hh = batch["host_hash"].to_numpy(zero_copy_only=False)
    uniq, first, inv = np.unique(
        hosts, return_index=True, return_inverse=True
    )
    sums = np.zeros(uniq.size)
    np.add.at(sums, inv, ms)
    cnt = np.zeros(uniq.size)
    np.add.at(cnt, inv, 1.0)
    lat_s = (sums / cnt) / 1000.0
    shard = (hh[first].astype(np.uint64)
             % np.uint64(len(shards))).astype(np.int64)
    for s in range(len(shards)):
        m = shard == s
        if m.any():
            shards[s].observe_latency.remote(
                [str(u) for u in uniq[m]], lat_s[m].tolist()
            )


def _route_batch(batch: pa.Table, engine_key=None, rules_ref=None,
                 route_by_host=False, strip_tracking=False,
                 breaker=False,
                 allowed=None, shards=None, docs_dir=None,
                 metrics_dir=None, adaptive=False) -> pa.Table:
    """Side-write the fetched docs partition, then extract + route.

    The docs parquet is written per batch, named by the batch's seq
    range — deterministic and idempotent, so a resumed round simply
    overwrites the same files (the reference's HTTP-cache re-run
    story, settings.py:132).  The per-entity metrics log is written
    the same way.
    """
    min_seq = int(pc.min(batch["seq"]).as_py())
    if adaptive and batch.num_rows:
        _push_latency(batch, shards)
    bk = storage_backend()
    dp = bk.fragment_path(docs_dir, f"part-{min_seq:010d}")
    mp = (
        bk.fragment_path(metrics_dir, f"part-{min_seq:010d}")
        if metrics_dir else None
    )
    if os.environ.get("WKM_PROF") == "time":
        import sys
        import time as _t

        t0 = _t.perf_counter()
        bk.write_fragment(batch, dp)
        t1 = _t.perf_counter()
        router = _worker_router(engine_key, rules_ref, allowed, shards,
                                route_by_host=route_by_host,
                                strip_tracking=strip_tracking,
                                breaker=breaker)
        out = router(batch, metrics_path=mp)
        print(f"[rb] rows={batch.num_rows} write={t1 - t0:.2f} "
              f"route={_t.perf_counter() - t1:.2f}",
              file=sys.stderr, flush=True)
        return out
    if os.environ.get("WKM_PROF"):
        import cProfile
        import time as _t

        t0 = _t.perf_counter()
        bk.write_fragment(batch, dp)
        t_write = _t.perf_counter() - t0
        router = _worker_router(engine_key, rules_ref, allowed, shards,
                                route_by_host=route_by_host,
                                strip_tracking=strip_tracking,
                                breaker=breaker)
        prof = cProfile.Profile()
        prof.enable()
        out = router(batch, metrics_path=mp)
        prof.disable()
        import pstats
        import sys

        print(f"[prof] rows={batch.num_rows} write={t_write:.2f}",
              file=sys.stderr, flush=True)
        pstats.Stats(prof, stream=sys.stderr).sort_stats(
            "cumulative").print_stats(8)
        return out
    bk.write_fragment(batch, dp)
    router = _worker_router(engine_key, rules_ref, allowed, shards,
                                route_by_host=route_by_host,
                                strip_tracking=strip_tracking,
                                breaker=breaker)
    return router(batch, metrics_path=mp)


_EMPTY_DOCS_BATCH = pa.table(
    {
        "doc_id": pa.array([], pa.string()),
        "seq": pa.array([], pa.int64()),
        "spans": pa.array(
            [],
            pa.list_(
                pa.struct(
                    [
                        ("kind", pa.string()),
                        ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32()),
                    ]
                )
            ),
        ),
    }
)

_EMPTY_FINAL = {
    "lists": pa.table(
        {
            "list_id": pa.array([], pa.int64()),
            "title": pa.array([], pa.string()),
            "url": pa.array([], pa.string()),
            "user_profile": pa.array([], pa.string()),
            "scrape_status": pa.array([], pa.string()),
            "scraped_at": pa.array([], pa.timestamp("us")),
        }
    ),
    "junction": pa.table(
        {
            "list_id": pa.array([], pa.int64()),
            "title_id": pa.array([], pa.int64()),
            "position": pa.array([], pa.int32()),
        }
    ),
    "titles": pa.table(
        {
            "title_id": pa.array([], pa.int64()),
            "title": pa.array([], pa.string()),
            "url": pa.array([], pa.string()),
            "scrape_status": pa.array([], pa.string()),
        }
    ),
    "title_metadata": pa.table(
        {
            "title_id": pa.array([], pa.int64()),
            "name": pa.array([], pa.string()),
            "cover_ref": pa.array([], pa.string()),
            "synopsis": pa.array([], pa.string()),
        }
    ),
    "volumes": pa.table(
        {
            "volume_id": pa.array([], pa.int64()),
            "title_id": pa.array([], pa.int64()),
            "volume_number": pa.array([], pa.int32()),
            "year": pa.array([], pa.int32()),
        }
    ),
    "title_enriched": pa.table(
        {
            "title_id": pa.array([], pa.int64()),
            "rating": pa.array([], pa.float64()),
            "additional_data": pa.array([], pa.string()),
        }
    ),
}


class CrawlEngine:
    """Driver-side orchestrator; owns the actor pools and the round loop."""

    def __init__(
        self,
        pages: pa.Table,
        seeds: pa.Table,
        robots: pa.Table,
        checkpoint_dir: str,
        num_shards: int = 4,
        fetcher_concurrency=(1, 4),
        batch_size: int | None = None,
        run_id: str = "run0",
        extractors=None,
        fetch_middlewares=None,
        spill_threshold_rows: int = 1 << 22,
        max_pages_per_host: int | None = None,
        pages_parts: "list[ray.ObjectRef] | None" = None,
        adaptive_throttle: "bool | dict" = False,
        seen_filter: str = "cuckoo",
        strip_tracking_params: bool = False,
        host_fail_budget: int | None = None,
        transport: dict | None = None,
    ) -> None:
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.batch_size = batch_size
        self._cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
        self.fetcher_concurrency = fetcher_concurrency
        self.run_id = run_id
        self.num_shards = num_shards

        self.rules = RobotsRules.from_table(robots)
        self.strip_tracking = bool(strip_tracking_params)
        seed_cols = canonicalize_batch(
            seeds.column("url"), strip_tracking=self.strip_tracking)
        self.allowed = frozenset(seed_cols["host"])
        self.seeds = seeds
        self._seed_cols = seed_cols

        self.delayed = frozenset(
            h for h, d in self.rules.delay.items() if d > 0
        )
        # T5 adaptive politeness, OPT-IN (reference AutoThrottle
        # defaults, settings.py:119-128: start 5 s, max 60 s, target
        # concurrency 1.0).  Off by default: the fixed crawl-delay
        # clock stays the canonical, oracle-comparable behavior.
        if adaptive_throttle:
            base = {"start_delay": 5.0, "max_delay": 60.0,
                    "target_concurrency": 1.0}
            if isinstance(adaptive_throttle, dict):
                base.update(adaptive_throttle)
            self.adaptive: dict | None = base
        else:
            self.adaptive = None
        # O4 pagination budget / T5 adaptive pacing: counting scheduled
        # pages (or owning a host's adaptive clock) needs each host on
        # ONE shard, so these modes route strictly by host hash (no
        # url-hash salting of zero-delay hosts).
        self.max_pages_per_host = max_pages_per_host
        # breaker mode also routes by host: quarantine is a per-host
        # decision, so each host must live on ONE shard
        self.host_fail_budget = host_fail_budget
        self._route_by_host = (max_pages_per_host is not None
                               or self.adaptive is not None
                               or host_fail_budget is not None)
        self.frontier = Frontier(
            num_shards, self.rules.delay,
            spill_dir=os.path.join(checkpoint_dir, "spill"),
            spill_threshold_rows=spill_threshold_rows,
            max_pages_per_host=max_pages_per_host,
            adaptive=self.adaptive,
            seen_filter=seen_filter,
            host_fail_budget=host_fail_budget,
        )
        # ``pages_parts``: reuse a prior engine's laid-out page store
        # (same pages/num_shards/routing — e.g. bench trials over one
        # input); the layout is immutable in the object store.
        # ``transport``: real-transport mode (HttpFetcher kwargs, e.g.
        # {"host": ..., "port": ..., "dynamic": ...}) — no page store
        # is broadcast at all; every shard's fetcher talks HTTP.
        if transport is not None:
            spec_ref = ray.put({"__transport__": dict(transport)})
            self.pages_parts = [spec_ref] * num_shards
        else:
            self.pages_parts = (
                list(pages_parts)
                if pages_parts is not None
                else partition_pages_refs(
                    pages, num_shards, self.delayed,
                    route_by_host=self._route_by_host,
                )
            )
        self.rules_ref = ray.put(self.rules)

        self.extractors = list(extractors or ())
        self.fetch_middlewares_ref = (
            ray.put(list(fetch_middlewares))
            if fetch_middlewares else None
        )
        self.global_seq = 0
        self.max_fetch_time = 0.0
        self.round_stats: list[dict] = []
        self.next_round = 0
        # distinguishes this instance's routers from a prior engine on
        # the SAME checkpoint dir (resume path) in worker memo caches
        import uuid as _uuid

        self._engine_id = _uuid.uuid4().hex

    def shutdown(self) -> None:
        """Kill the long-lived frontier actors (they outlive Datasets
        by design and must be released explicitly)."""
        for a in self.frontier.shards:
            ray.kill(a, no_restart=True)

    # ------------------------------------------------------------- paths
    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.checkpoint_dir, "rounds", f"round={rnd}")

    def _docs_dir(self, rnd: int) -> str:
        return os.path.join(self.checkpoint_dir, "docs", f"round={rnd}")

    def _metrics_dir(self, rnd: int) -> str:
        return os.path.join(
            self.checkpoint_dir, "metrics", f"round={rnd}"
        )

    def _manifest_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "manifest.json")

    def _order_files(self, rnd: int) -> list[str]:
        """Crawl-order checkpoint fragments for a round (per shard)."""
        import glob

        bk = storage_backend()
        return sorted(
            glob.glob(
                os.path.join(
                    self._round_dir(rnd), "crawl_order*" + bk.fragment_ext
                )
            )
        )

    def _order_table(self, rnd: int) -> pa.Table | None:
        files = self._order_files(rnd)
        if not files:
            return None
        bk = storage_backend()
        return pa.concat_tables(bk.read_fragment(f) for f in files)

    # -------------------------------------------------------------- seed
    def seed(self) -> int:
        """Canonicalize + filter the seed list and enqueue it (round 0)."""
        s = self.seeds
        cols = self._seed_cols
        n = s.num_rows
        keep = offsite_mask(cols["host"], self.allowed)
        keep &= self.rules.allowed_mask(cols["host"], cols["canon_url"])
        idx = np.flatnonzero(keep)
        prio = s.column("priority").to_numpy(zero_copy_only=False)
        seed_index = s.column("seed_index").to_numpy(zero_copy_only=False)
        tbl = pa.table(
            {
                "canon_url": pa.array(
                    [cols["canon_url"][i] for i in idx], pa.string()
                ),
                "url_sha1": pa.array(
                    [cols["url_sha1"][i] for i in idx], pa.binary(20)
                ),
                "host": pa.array([cols["host"][i] for i in idx], pa.string()),
                "host_hash": pa.array(
                    cols["host_hash"][idx], pa.uint64()
                ),
                "priority": pa.array(prio[idx], pa.int32()),
                "ok": pa.array(seed_index[idx].astype(np.int64), pa.int64()),
            }
        )
        shard = route_shard(
            np.array([cols["host"][i] for i in idx], dtype=object),
            cols["host_hash"][idx],
            cols["url_hash"][idx],
            self.delayed,
            self.num_shards,
            route_by_host=self._route_by_host,
        )
        return self.frontier.enqueue_table(tbl, shard=shard)

    # -------------------------------------------------------------- round
    def run_round(self, rnd: int) -> dict | None:
        import time as _time

        _trace = os.environ.get("WKM_ROUND_TIMING")
        _t0 = _time.perf_counter()
        # Two-phase distributed poll: only ~20 B/row of numeric sort
        # keys reach the driver; shards append the globally-ranked seq
        # actor-side and the candidate blocks go straight from shard
        # actors into the Dataset (from_arrow_refs — zero driver
        # copies, zero re-puts).
        os.makedirs(self._round_dir(rnd), exist_ok=True)
        # Per-shard crawl_order parts are written by the shard actors
        # themselves during finalize (parallel, no driver concat/sort).
        refs, n, max_ft = self.frontier.poll_round_distributed(
            rnd, self.global_seq, order_dir=self._round_dir(rnd)
        )
        _t_poll = _time.perf_counter() - _t0
        if n == 0:
            if _trace:
                print(f"[round {rnd}] terminating poll={_t_poll:.2f}",
                      flush=True)
            return None
        self.global_seq += n
        self.max_fetch_time = max(self.max_fetch_time, max_ft)

        # ---- data plane: ONE streaming pipeline per round.
        # fetch → side-write docs partition → extract+route, fused: no
        # disk barrier between fetch and extract, no per-round actor
        # pool startup (worker-memoized broadcast state instead), docs
        # still checkpointed per batch for resume.  Blocks are the
        # per-shard candidate tables (shard-pure by construction);
        # batch = WHOLE BLOCK by default so the route stage's enqueue
        # fan-out (one RPC per frontier shard) happens once per task,
        # not once per small batch.
        docs_dir = self._docs_dir(rnd)
        os.makedirs(docs_dir, exist_ok=True)
        metrics_dir = self._metrics_dir(rnd)
        os.makedirs(metrics_dir, exist_ok=True)
        batch_size = self.batch_size or None
        _t1 = _time.perf_counter()
        ds = (
            ray.data.from_arrow_refs(list(refs))
            .map_batches(
                _fetch_batch,
                fn_kwargs={
                    "pages_parts": self.pages_parts,
                    "middlewares": self.fetch_middlewares_ref,
                },
                batch_size=batch_size,
                batch_format="pyarrow",
            )
            .map_batches(
                _route_batch,
                fn_kwargs={
                    "engine_key": f"{self.checkpoint_dir}#{self._engine_id}",
                    "rules_ref": self.rules_ref,
                    "allowed": self.allowed,
                    "shards": self.frontier.shards,
                    "docs_dir": docs_dir,
                    "metrics_dir": metrics_dir,
                    "route_by_host": self._route_by_host,
                    "strip_tracking": self.strip_tracking,
                    "breaker": self.host_fail_budget is not None,
                    "adaptive": self.adaptive is not None,
                },
                batch_size=batch_size,
                batch_format="pyarrow",
            )
        )
        summaries = ds.take_all()  # tiny per-batch count rows
        if self.host_fail_budget is not None:
            agg: dict[str, int] = {}
            for r in summaries:
                for h, c in zip(r.get("failed_hosts") or [],
                                r.get("failed_counts") or []):
                    agg[h] = agg.get(h, 0) + int(c)
            if agg:
                self.frontier.push_failures(
                    list(agg.keys()), list(agg.values()))
        if _trace == "stats":
            print(ds.stats(), flush=True)

        _t_pipe = _time.perf_counter() - _t1
        if _trace:
            print(f"[round {rnd}] n={n} bs={batch_size} "
                  f"poll={_t_poll:.2f} prep={_t1 - _t0 - _t_poll:.2f} "
                  f"pipe={_t_pipe:.2f}", flush=True)
        stat = {
            "round": rnd,
            "sec": round(_time.perf_counter() - _t0, 3),
            "scheduled": n,
            "fetched": int(sum(r["fetched"] for r in summaries)),
            "missing": int(sum(r["missing"] for r in summaries)),
            "links": int(sum(r["links"] for r in summaries)),
            "candidates": int(sum(r["candidates"] for r in summaries)),
        }
        self.round_stats.append(stat)
        _t2 = _time.perf_counter()
        self._checkpoint(rnd)
        if _trace:
            print(f"[round {rnd}] ckpt={_time.perf_counter() - _t2:.2f}",
                  flush=True)
        return stat

    def _checkpoint(self, rnd: int) -> None:
        fdir = os.path.join(self.checkpoint_dir, "frontier",
                            f"round={rnd}")
        self.frontier.dump_to_dir(fdir)
        manifest = {
            "run_id": self.run_id,
            "num_shards": self.num_shards,
            "next_round": rnd + 1,
            "global_seq": self.global_seq,
            "max_fetch_time": self.max_fetch_time,
            "round_stats": self.round_stats,
        }
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic "applied or not"

    # ------------------------------------------------------------- resume
    def resume(self) -> int:
        """Restore state from the checkpoint; return the next round no."""
        with open(self._manifest_path()) as f:
            manifest = json.load(f)
        assert manifest["num_shards"] == self.num_shards
        self.global_seq = manifest["global_seq"]
        self.max_fetch_time = manifest["max_fetch_time"]
        self.round_stats = manifest["round_stats"]
        last_round = manifest["next_round"] - 1
        self.frontier.restore_from_dir(
            os.path.join(self.checkpoint_dir, "frontier",
                         f"round={last_round}")
        )
        # replay the seen-set delta (scheduled URLs) from crawl_order
        # logs; the recorded (salted) routing shard keys the replay.
        for r in range(last_round + 1):
            for f in self._order_files(r):
                tbl = storage_backend().read_fragment(
                    f, columns=["url_sha1", "canon_url", "shard"]
                )
                self.frontier.restore_seen(
                    tbl.column("url_sha1"),
                    tbl.column("canon_url"),
                    tbl.column("shard").to_numpy(zero_copy_only=False),
                )
        self.next_round = last_round + 1
        return self.next_round

    # ---------------------------------------------------------------- run
    def run(self, max_rounds: int | None = None, seed: bool = True) -> dict:
        if seed:
            self.seed()
        rnd = self.next_round
        while max_rounds is None or rnd < max_rounds:
            stat = self.run_round(rnd)
            if stat is None:
                break
            rnd += 1
        self.next_round = rnd
        return {
            "rounds": len(self.round_stats),
            "scheduled": self.global_seq,
            "stats": self.round_stats,
        }

    # ----------------------------------------------------------- outputs
    @property
    def close_time(self) -> float:
        return float(int(self.max_fetch_time) + 1)

    def crawl_order(self) -> pa.Table:
        """(seq, url, host, round) over all rounds, seq-ordered."""
        parts = [
            t
            for r in range(self.next_round)
            for t in [self._order_table(r)]
            if t is not None
        ]
        if not parts:
            return pa.table(
                {"seq": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "host": pa.array([], pa.string()),
                 "round": pa.array([], pa.int32())}
            )
        full = pa.concat_tables(parts).sort_by("seq")
        return pa.table(
            {
                "seq": full.column("seq"),
                "url": full.column("canon_url"),
                "host": full.column("host"),
                "round": full.column("round"),
            }
        )

    def export_seeds(self) -> pa.Table:
        """SEEDS_SCHEMA table of every URL this crawl scheduled, in
        crawl order — the seed list of the NEXT crawl generation (the
        incremental-recrawl pattern: re-fetch yesterday's frontier,
        then diff docs with pipelines.dedup.snapshot_diff semantics).
        Priority 0 for all rows (the reference's ``start_urls``
        default); seed_index preserves this generation's order so the
        next generation's politeness clock replays deterministically.
        """
        from ..schemas import SEEDS_SCHEMA

        order = self.crawl_order()
        return pa.table({
            "seed_index": pa.array(
                np.arange(order.num_rows), pa.int64()),
            "url": order["url"],
            "priority": pa.array(
                np.zeros(order.num_rows, np.int32), pa.int32()),
        }).cast(SEEDS_SCHEMA)

    def seen_table(self) -> pa.Table:
        """(url_sha1, canon_url) — the final URL-seen set."""
        from ..state.seen import void_to_binary20

        keys, urls = self.frontier.snapshot_seen()
        return pa.table(
            {"url_sha1": void_to_binary20(keys), "canon_url": urls}
        )

    def metrics_table(self) -> pa.Table:
        """Per-ROUND stage counters (scheduled/fetched/links/... per
        round with wall seconds) — the engine-health side of the log.
        The per-ENTITY ``scraping_log`` analog is
        :meth:`entity_metrics_dataset`."""
        rows: list[dict] = []
        for st in self.round_stats:
            for stage in ("scheduled", "fetched", "missing", "links",
                          "candidates"):
                rows.append(
                    {
                        "run_id": self.run_id,
                        "round": st["round"],
                        "stage": stage,
                        "n": int(st[stage]),
                        "round_sec": float(st["sec"]),
                    }
                )
        if not rows:
            return pa.table(
                {"run_id": pa.array([], pa.string()),
                 "round": pa.array([], pa.int64()),
                 "stage": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "round_sec": pa.array([], pa.float64())}
            )
        return pa.Table.from_pylist(rows)

    def round_metrics_rollup(self) -> pa.Table:
        """Per-round counters grouped by stage → total count + mean
        round sec (engine health; not the reference scraping_log)."""
        ds = ray.data.from_arrow(self.metrics_table())
        from ray.data.aggregate import Mean, Sum

        out = (
            ds.groupby("stage")
            .aggregate(Sum("n", alias_name="total"),
                       Mean("round_sec", alias_name="mean_round_sec"))
            .to_pandas()
            .sort_values("stage")
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    _ENTITY_METRICS_SCHEMA = pa.schema(
        [
            ("entity_id", pa.string()),
            ("seq", pa.int64()),
            ("scrapper_name", pa.string()),
            ("operation", pa.string()),
            ("status", pa.string()),
            ("error", pa.string()),
            ("duration_ms", pa.int64()),
            ("n_links", pa.int64()),
            ("n_candidates", pa.int64()),
        ]
    )

    def entity_metrics_dataset(self) -> ray.data.Dataset:
        """S5: the per-ENTITY append-only scraping log as a streaming
        Dataset — one row per scheduled URL with
        (operation, status, error, n_links, n_candidates), written by
        the route stage as idempotent per-batch partitions (reference
        sqlmanager.py:266-302, 001_initial_schema.sql:97-106)."""
        bk = storage_backend()
        files = [
            f
            for r in range(self.next_round)
            if os.path.isdir(self._metrics_dir(r))
            for f in bk.list_fragments(self._metrics_dir(r))
        ]
        if not files:
            return ray.data.from_arrow(
                self._ENTITY_METRICS_SCHEMA.empty_table()
            )
        return bk.read_dataset(files)

    def entity_metrics_table(self) -> pa.Table:
        """Small-fixture materialization of the per-entity log, in
        crawl order (conformance/test surface only)."""
        return pa.concat_tables(
            [
                ray.get(r)
                for r in self.entity_metrics_dataset().to_arrow_refs()
            ]
            or [self._ENTITY_METRICS_SCHEMA.empty_table()],
            promote_options="default",
        ).sort_by("seq")

    def metrics_rollup(self) -> pa.Table:
        """A4: the scraping_log rolled up ``GROUP BY operation,
        status`` → entity count + link totals (reference
        sqlmanager.py:296-302 reporting queries), computed as a Ray
        Data groupby over the streamed per-entity log."""
        from ray.data.aggregate import Count, Sum

        out = (
            self.entity_metrics_dataset()
            .groupby(["operation", "status"])
            .aggregate(
                Count(alias_name="n_entities"),
                Sum("n_links", alias_name="total_links"),
                Sum("n_candidates", alias_name="total_candidates"),
            )
            .to_pandas()
            .sort_values(["operation", "status"])
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def docs_dataset(self) -> ray.data.Dataset:
        """All fetched docs as a streaming Dataset (doc_id, spans, seq)."""
        bk = storage_backend()
        files = [
            f
            for r in range(self.next_round)
            if os.path.isdir(self._docs_dir(r))
            for f in bk.list_fragments(self._docs_dir(r))
        ]
        ds = bk.read_dataset(
            files, columns=["canon_url", "seq", "spans", "fetch_status"]
        )

        def _project(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t["fetch_status"], "fetched"))
            return pa.table(
                {"doc_id": f["canon_url"], "seq": f["seq"],
                 "spans": f["spans"]}
            )

        return ds.map_batches(_project, batch_format="pyarrow")

    def finalize_datasets(self) -> dict[str, ray.data.Dataset]:
        """Build the relational outputs from checkpointed docs as LAZY
        Datasets — nothing corpus-proportional touches the driver.

        Ray-Data jobs: extraction = map_batches; upsert/dedup = keyed
        groupby (the A1/A2/J1 shuffles of SURVEY.md §2.5, keys per
        §7.4).  Consume with :meth:`write_tables` (streaming partitioned
        parquet, the S4 sink shape) at scale, or
        :meth:`finalize_tables` (driver Arrow tables) for
        conformance-scale runs.
        """
        docs = self.docs_dataset()
        close_us = int(self.close_time * 1_000_000)

        # ---- lists: profile sections → last-writer-wins upsert by list_id
        def lists_stage(t: pa.Table) -> pa.Table:
            out = extract_profile_sections(t)
            if out.num_rows == 0:
                return pa.table(
                    {"list_id": pa.array([], pa.int64()),
                     "title": pa.array([], pa.string()),
                     "url": pa.array([], pa.string()),
                     "user_profile": pa.array([], pa.string()),
                     "seq": pa.array([], pa.int64())}
                )
            doc_col = t.column("doc_id")
            if isinstance(doc_col, pa.ChunkedArray):
                doc_col = doc_col.combine_chunks()
            src = out.column("src_doc_id")
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            # source doc's seq: hash-probe src against this batch's
            # doc_id column (every src_doc_id comes from this batch);
            # a null probe would round-trip through float64 NaN below,
            # so fail loudly instead of emitting garbage seqs
            idx = pc.index_in(src, value_set=doc_col)
            if pc.any(pc.is_null(idx)).as_py():
                raise ValueError(
                    "lists_stage: src_doc_id missing from batch docs"
                )
            seqs = t.column("seq").take(idx)
            # user_profile = first path segment of the profile URL
            # (``u.split("/")[3]``, spiders/lists.py:35-36); profile
            # doc_ids are canonical scheme://host/... by construction
            prof = pc.fill_null(
                pc.struct_field(
                    pc.extract_regex(src, r"^[^/]*//[^/]*/(?P<p>[^/]*)"),
                    "p",
                ),
                "",
            )
            return pa.table(
                {
                    "list_id": out.column("list_id"),
                    "title": out.column("title"),
                    "url": out.column("url"),
                    "user_profile": prof,
                    "seq": pc.cast(seqs, pa.int64()),
                }
            )

        # last-writer-wins per list via the coarse-hash-partition
        # pattern: ONE vectorized task per partition picks each list's
        # max-seq row (at crawl scale list_id cardinality is
        # output-table-sized; a per-list map_groups pays a Python
        # frame per list)
        def _lists_part(b: pa.Table) -> pa.Table:
            from .text import mix64

            lid = b["list_id"].to_numpy(zero_copy_only=False)
            return b.append_column("part", pa.array(
                (mix64(lid.astype(np.uint64)) % np.uint64(64)).astype(
                    np.int64
                )
            ))

        def _lists_reduce(g: pa.Table) -> pa.Table:
            n = g.num_rows
            if n:
                lid = g["list_id"].to_numpy(zero_copy_only=False)
                seq = g["seq"].to_numpy(zero_copy_only=False)
                # last of each (list_id, seq)-sorted run = max seq —
                # the last-writer row (seq is unique per list)
                order = np.lexsort((seq, lid))
                lid_s = lid[order]
                last = np.r_[lid_s[1:] != lid_s[:-1], True]
                g = g.take(pa.array(order[last], pa.int64()))
                n = g.num_rows
            return pa.table(
                {
                    "list_id": pc.cast(g["list_id"], pa.int64()),
                    "title": pc.cast(g["title"], pa.string()),
                    "url": pc.cast(g["url"], pa.string()),
                    "user_profile": pc.cast(
                        g["user_profile"], pa.string()
                    ),
                    "scrape_status": pa.array(
                        ["completed"] * n, pa.string()
                    ),
                    "scraped_at": pa.array(
                        np.full(n, close_us, dtype=np.int64),
                        pa.timestamp("us"),
                    ),
                }
            )

        lists_ds = (
            docs.map_batches(lists_stage, batch_format="pyarrow")
            .map_batches(_lists_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_lists_reduce, batch_format="pyarrow")
        )

        # ---- junction + titles: list-page title links in document order
        allowed = self.allowed
        strip_tracking = self.strip_tracking

        def title_links_stage(t: pa.Table) -> pa.Table:
            links = extract_title_links(t)
            if links.num_rows == 0:
                return pa.table(
                    {"list_id": pa.array([], pa.int64()),
                     "title_id": pa.array([], pa.int64()),
                     "title": pa.array([], pa.string()),
                     "url": pa.array([], pa.string()),
                     "position": pa.array([], pa.int32()),
                     "ok": pa.array([], pa.int64())}
                )
            href = links.column("href")
            if isinstance(href, pa.ChunkedArray):
                href = href.combine_chunks()
            src = links.column("src_doc_id")
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            # Arrow-native canonicalization: same fast path as the
            # crawl's route stage — slow (relative-href) rows resolve
            # against their source page URL
            cols = canonicalize_arrow(
                href, base_for=lambda j: src[int(j)].as_py(),
                strip_tracking=strip_tracking,
            )
            tid_arr = ids_from_url_tail(href)
            keep = offsite_mask_arrow(cols["host"], allowed)
            keep &= pc.is_valid(tid_arr).to_numpy(zero_copy_only=False)
            keep_pa = pa.array(keep)
            sub = links.filter(keep_pa)
            canon = cols["canon"].filter(keep_pa)
            sub_tids = tid_arr.filter(keep_pa)
            ranked = rank_positions(sub, group_col="src_doc_id")
            # source doc's seq: hash-probe against this batch's docs
            doc_col = t.column("doc_id")
            if isinstance(doc_col, pa.ChunkedArray):
                doc_col = doc_col.combine_chunks()
            rsrc = ranked.column("src_doc_id")
            if isinstance(rsrc, pa.ChunkedArray):
                rsrc = rsrc.combine_chunks()
            idx = pc.index_in(rsrc, value_set=doc_col)
            if pc.any(pc.is_null(idx)).as_py():
                raise ValueError(
                    "title_links_stage: src_doc_id missing from batch"
                )
            seqs = t.column("seq").take(idx).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            offs = ranked.column("offset").to_numpy(zero_copy_only=False)
            ok = (seqs << OK_SHIFT) | np.minimum(
                offs.astype(np.int64), (1 << OK_SHIFT) - 1
            )
            return pa.table(
                {
                    "list_id": ranked.column("list_id"),
                    "title_id": sub_tids,
                    "title": ranked.column("anchor_text"),
                    "url": canon,
                    "position": ranked.column("position"),
                    "ok": pa.array(ok, pa.int64()),
                }
            )

        # materialized once: two consumers (junction + titles) would
        # otherwise re-run extraction + canonicalization.  The rows are
        # the pruned link columns (ids + title + url), a small fraction
        # of the doc payload, held in the object store with spill.
        tl = docs.map_batches(title_links_stage, batch_format="pyarrow")
        tl_mat = tl.materialize()

        # Both finalize reductions use the coarse-hash-partition
        # pattern (one vectorized task per partition) — at crawl scale
        # (list_id, title_id) and title_id cardinalities are
        # output-table-sized, where Ray's per-key aggregate/map_groups
        # pays a Python frame per key (common.hash_keyed_agg rationale).
        _FIN_PARTS = 64

        def _junction_part(b: pa.Table) -> pa.Table:
            from .text import mix64

            lid = b["list_id"].to_numpy(zero_copy_only=False)
            tid = b["title_id"].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                key = mix64(
                    lid.astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    + tid.astype(np.uint64)
                )
            return pa.table({
                "list_id": b["list_id"],
                "title_id": b["title_id"],
                "position": b["position"],
                "part": pa.array(
                    (key % np.uint64(_FIN_PARTS)).astype(np.int64)
                ),
            })

        def _junction_reduce(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({
                    "list_id": pa.array([], pa.int64()),
                    "title_id": pa.array([], pa.int64()),
                    "position": pa.array([], pa.int32()),
                })
            lid = g["list_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            tid = g["title_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = g["position"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pairs = np.stack([lid, tid], axis=1)
            uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
            mins = np.full(uniq.shape[0], np.iinfo(np.int64).max)
            np.minimum.at(mins, inv, pos)
            return pa.table({
                "list_id": pa.array(uniq[:, 0], pa.int64()),
                "title_id": pa.array(uniq[:, 1], pa.int64()),
                "position": pa.array(mins.astype(np.int32),
                                     pa.int32()),
            })

        junction_ds = (
            tl_mat.map_batches(_junction_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_junction_reduce, batch_format="pyarrow")
        )

        def _titles_part(b: pa.Table) -> pa.Table:
            from .text import mix64

            tid = b["title_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "title_id": b["title_id"],
                "title": b["title"],
                "url": b["url"],
                "ok": b["ok"],
                "part": pa.array(
                    (mix64(tid.astype(np.uint64))
                     % np.uint64(_FIN_PARTS)).astype(np.int64)
                ),
            })

        def _titles_reduce(g: pa.Table) -> pa.Table:
            # first-seen row per title = min ok (ok is unique by
            # construction: seq<<SHIFT | offset)
            if g.num_rows == 0:
                return pa.table({
                    "title_id": pa.array([], pa.int64()),
                    "title": pa.array([], pa.string()),
                    "url": pa.array([], pa.string()),
                    "scrape_status": pa.array([], pa.string()),
                })
            tid = g["title_id"].to_numpy(zero_copy_only=False)
            ok = g["ok"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ok, tid))
            tid_s = tid[order]
            first = np.r_[True, tid_s[1:] != tid_s[:-1]]
            take = order[first]
            t = g.take(pa.array(take, pa.int64()))
            return pa.table({
                "title_id": pc.cast(t["title_id"], pa.int64()),
                "title": pc.cast(t["title"], pa.string()),
                "url": pc.cast(t["url"], pa.string()),
                "scrape_status": pa.array(
                    ["pending"] * t.num_rows, pa.string()
                ),
            })

        titles_ds = (
            tl_mat.map_batches(_titles_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_titles_reduce, batch_format="pyarrow")
        )

        # ---- title_metadata: leaf-page spec extraction (each title page
        # is fetched exactly once — dedup guaranteed upstream — so this
        # is a pure map, no shuffle).
        def metadata_final(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "title_id": pc.cast(t["title_id"], pa.int64()),
                    "name": pc.cast(t["name"], pa.string()),
                    "cover_ref": pc.cast(t["cover_ref"], pa.string()),
                    "synopsis": pc.cast(t["synopsis"], pa.string()),
                }
            )

        metadata_ds = docs.map_batches(
            extract_title_metadata, batch_format="pyarrow"
        ).map_batches(metadata_final, batch_format="pyarrow")

        # ---- volumes: title-page volume listings (reference spec
        # table 001_initial_schema.sql:45-58) — pure map, no shuffle.
        def volumes_final(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "volume_id": pc.cast(t["volume_id"], pa.int64()),
                    "title_id": pc.cast(t["title_id"], pa.int64()),
                    "volume_number": pc.cast(
                        t["volume_number"], pa.int32()
                    ),
                    "year": pc.cast(t["year"], pa.int32()),
                }
            )

        volumes_ds = docs.map_batches(
            extract_volumes, batch_format="pyarrow"
        ).map_batches(volumes_final, batch_format="pyarrow")

        # ---- title_enriched: derived enrichment (reference
        # 001_initial_schema.sql:81-95 — rating left NULL, computed
        # aggregates in the free-form additional_data JSON column,
        # README.md:140).  A keyed aggregate over the volumes stream.
        def enriched_final(t: pa.Table) -> pa.Table:
            # vectorized json.dumps(..., sort_keys=True) — both values
            # are integers, so plain string concat IS valid JSON
            blobs = pc.binary_join_element_wise(
                '{"first_year": ',
                pc.cast(pc.cast(t["first_year"], pa.int64()), pa.string()),
                ', "n_volumes": ',
                pc.cast(pc.cast(t["n_volumes"], pa.int64()), pa.string()),
                "}",
                "",
            )
            return pa.table(
                {
                    "title_id": pc.cast(t["title_id"], pa.int64()),
                    "rating": pa.array([None] * t.num_rows, pa.float64()),
                    "additional_data": pc.cast(blobs, pa.string()),
                }
            )

        from .common import hash_keyed_agg

        # per-title (count, min year): coarse-partition vectorized
        # aggregate — title cardinality is output-table-sized
        enriched_ds = hash_keyed_agg(
            volumes_ds, "title_id",
            count_alias="n_volumes", mins={"year": "first_year"},
        ).map_batches(enriched_final, batch_format="pyarrow")

        out = {
            "lists": lists_ds,
            "junction": junction_ds,
            "titles": titles_ds,
            "title_metadata": metadata_ds,
            "volumes": volumes_ds,
            "title_enriched": enriched_ds,
        }
        # user-registered extractors (extension surface X6): each one is
        # an extra finalized table computed by a map_batches pass.
        for ext in self.extractors:
            out[ext.name] = docs.map_batches(
                ext.fn, batch_format="pyarrow"
            )
        return out

    # Deterministic output order per table (conformance convenience; the
    # streamed parquet sink is order-free and relies on keys instead).
    _TABLE_SORT = {
        "lists": ["list_id"],
        "junction": ["list_id", "title_id"],
        "titles": ["title_id"],
        "title_metadata": ["title_id"],
        "volumes": ["volume_id"],
        "title_enriched": ["title_id"],
    }

    # primary key per finalized table — drives the upsert sink (the
    # reference's ON CONFLICT targets, queries/lists.sql:1-9,
    # 001_initial_schema.sql)
    _TABLE_KEYS = {
        "lists": ["list_id"],
        "junction": ["list_id", "title_id"],
        "titles": ["title_id"],
        "title_metadata": ["title_id"],
        "volumes": ["volume_id"],
        "title_enriched": ["title_id"],
    }

    def write_tables(self, out_dir: str,
                     mode: str = "overwrite") -> dict[str, str]:
        """Stream every finalized table to the storage backend — one
        table directory per name, fragments written by the workers.
        Nothing corpus-proportional is collected on the driver.

        ``mode="overwrite"``: fresh partitioned write (each run's
        directory re-derivable from the docs checkpoint).
        ``mode="upsert"``: S4 — merge this run's rows into an EXISTING
        table by primary key, incoming row winning (the reference's
        ``INSERT ... ON CONFLICT DO UPDATE`` re-run story,
        queries/lists.sql:1-9).  Batches stream through the driver
        because upsert commits are serialized — the same single-writer
        commit protocol Lance's merge_insert uses — but the stored
        table's pre-existing fragments are reconciled ONCE per table
        (stats-pruned key scan), not once per batch; per-batch memory
        stays bounded.
        """
        bk = storage_backend()
        paths = {}
        for name, ds in self.finalize_datasets().items():
            path = os.path.join(out_dir, name)
            keys = self._TABLE_KEYS.get(name)
            if mode == "upsert" and keys:
                bk.upsert_dataset(
                    ds.iter_batches(batch_format="pyarrow",
                                    batch_size=8192),
                    path, keys,
                )
            else:
                os.makedirs(path, exist_ok=True)
                bk.write_dataset(ds, path)
            paths[name] = path
        return paths

    def finalize_tables(self) -> dict[str, pa.Table]:
        """Conformance-scale collector: each finalized Dataset as ONE
        driver-side Arrow table, deterministically sorted.

        Only for tests/oracles on small fixtures — at production scale
        use :meth:`write_tables`, which never materializes a
        corpus-proportional table on the driver.
        """
        out = {}
        for name, ds in self.finalize_datasets().items():
            parts = ray.get(ds.to_arrow_refs())
            nonempty = [p for p in parts if p.num_rows]
            if nonempty:
                tbl = pa.concat_tables(nonempty)
            elif parts:
                tbl = parts[0]
            else:
                # zero blocks (empty docs dataset): emit the declared
                # schema so downstream consumers see a table.
                if name in self._TABLE_SORT:
                    tbl = _EMPTY_FINAL[name]
                else:
                    ext = next(
                        e for e in self.extractors if e.name == name
                    )
                    tbl = ext.fn(_EMPTY_DOCS_BATCH)
            sort = self._TABLE_SORT.get(name)
            out[name] = tbl.sort_by(
                [(c, "ascending") for c in sort]
            ) if sort else tbl
        return out


def get_by_id(table_dir: str, value, key_col: str | None = None) -> pa.Table:
    """J2 FK point lookup over a finalized table directory (reference
    ``GET_LIST_BY_ID``, queries/lists.sql:42-52).

    ``key_col`` defaults to the table's primary key when the directory
    is named like a finalized table (``.../lists`` → ``list_id``).
    Delegates to the storage backend's predicate-pushdown scan: only
    row groups whose statistics may contain the key are read — at the
    100-TB design point this is O(footers) + one row group, never a
    table scan.
    """
    if key_col is None:
        name = os.path.basename(os.path.normpath(table_dir))
        keys = CrawlEngine._TABLE_KEYS.get(name)
        if keys is None or len(keys) != 1:
            raise ValueError(
                f"key_col required for table {name!r} "
                f"(no single-column primary key known)"
            )
        key_col = keys[0]
    return storage_backend().point_lookup(table_dir, key_col, value)
