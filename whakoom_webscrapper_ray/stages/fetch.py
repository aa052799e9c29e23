"""Fetcher stage: stateful actor pool for ``map_batches``.

The distributed analog of the reference's expensive per-spider clients
— the Selenium WebDriver built once in ``__init__``
(/root/reference/whakoom_webscrapper/spiders/publications.py:31-40) and
Scrapy's connection pool / HTTP cache (settings.py:132).  The pattern:
a callable CLASS whose ``__init__`` (once per actor) builds the client
and whose ``__call__`` (per batch) fetches a zero-copy Arrow batch of
candidate URLs.

In this sandbox there is no network, so the client resolves against the
deterministic synthetic web (FIXTURES.md §1): the ``pages`` table is
``ray.put`` ONCE by the driver and each actor builds its url→row index
once in ``__init__`` — broadcast, never re-shipped per batch.  At the
10^10-URL design point the same class instead memory-maps the host-hash
partition of the page store that its shard serves (or holds a real HTTP
client); the interface is identical.

Fetch retries (reference: 3 attempts, 1s/2s/4s backoff,
pipelines.py:88-122) are SEMANTIC retries implemented here with an
injectable transient-failure predicate; infra failures are left to Ray's
task retries / actor restarts.  Failures are never silent: every row
comes back with a ``fetch_status`` (README/AGENTS no-silent-failure
rule, AGENTS.md:213-224).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


class SyntheticWebFetcher:
    """``map_batches`` callable class resolving URLs against ``pages``.

    Parameters
    ----------
    pages_ref:
        ``ray.ObjectRef`` to the pages Arrow table (broadcast once).
    max_attempts / fail_fn:
        semantic retry knobs; ``fail_fn(url, attempt) -> bool`` injects
        deterministic transient failures for tests (default: never).
    """

    def __init__(
        self,
        pages_ref: ray.ObjectRef | pa.Table,
        max_attempts: int = 3,
        fail_fn: Callable[[str, int], bool] | None = None,
    ) -> None:
        from .. import warm_worker

        warm_worker()   # once per actor: pre-fault arenas before work
        pages = (
            ray.get(pages_ref)
            if isinstance(pages_ref, ray.ObjectRef)
            else pages_ref
        )
        # Zero-copy views into the broadcast PARTITION.  The engine
        # partitions the page store by host-shard and each fetch batch
        # is shard-pure, so the ``pc.index_in`` value set here is one
        # partition (|pages|/num_shards), not the whole web — the
        # per-batch hash-build cost stays O(partition) and the fetch
        # stage needs NO per-worker index materialization at all.
        # (Designs that were tried and rejected: a python dict per
        # worker = seconds of per-worker setup that multiplies with
        # worker count; index_in against the FULL table = ~230 ms per
        # batch at 10^6 URLs.)
        self.doc_ids = pages.column("doc_id")
        spans_col = pages.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        self.spans = spans_col
        self.empty_spans = pa.scalar([], type=spans_col.type)
        self.max_attempts = max_attempts
        self.fail_fn = fail_fn
        self.attempt_log: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        _t0 = _time.perf_counter()
        urls = batch.column("canon_url")
        idx = pc.index_in(urls, value_set=self.doc_ids)
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        status = np.where(valid, "fetched", "missing").astype(object)

        if self.fail_fn is not None:
            # semantic-retry injection (tests): per-URL attempt loop,
            # exercised only when a failure predicate is configured.
            idx_np = np.where(
                valid, idx.to_numpy(zero_copy_only=False), -1
            ).astype(np.int64)
            url_list = urls.to_pylist()
            for i, u in enumerate(url_list):
                if not valid[i]:
                    continue
                attempts = 0
                while (attempts < self.max_attempts
                       and self.fail_fn(u, attempts)):
                    attempts += 1
                if attempts:
                    self.attempt_log[u] = attempts
                if attempts >= self.max_attempts:
                    status[i] = "failed"
                    idx_np[i] = -1
            idx = pa.array(
                np.where(idx_np < 0, np.nan, idx_np), pa.int64(),
                from_pandas=True,
            )

        spans = pc.fill_null(self.spans.take(idx), self.empty_spans)
        # per-entity fetch duration for the scraping log (reference
        # sqlmanager.py:266-302 stores duration_ms per operation).  A
        # vectorized fetch times the BATCH; each row is attributed its
        # equal share — wall-clock, excluded from oracle comparisons.
        ms = (_time.perf_counter() - _t0) * 1000.0 / max(batch.num_rows, 1)
        return (
            batch.append_column("spans", spans)
            .append_column("fetch_status", pa.array(status, pa.string()))
            .append_column(
                "fetch_ms",
                pa.array(
                    np.full(batch.num_rows, ms, dtype=np.float64),
                    pa.float64(),
                ),
            )
        )
