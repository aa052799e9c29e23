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
        pages = (
            ray.get(pages_ref)
            if isinstance(pages_ref, ray.ObjectRef)
            else pages_ref
        )
        self.pages = pages.combine_chunks()
        ids = self.pages.column("doc_id").to_pylist()
        self.index: dict[str, int] = {u: i for i, u in enumerate(ids)}
        spans_col = self.pages.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        # sentinel empty-spans row at index n for missing/failed fetches
        self.spans_ext = pa.concat_arrays(
            [spans_col, pa.array([[]], type=spans_col.type)]
        )
        self.missing_row = len(ids)
        self.max_attempts = max_attempts
        self.fail_fn = fail_fn
        self.attempt_log: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("canon_url").to_pylist()
        rows = np.empty(len(urls), dtype=np.int64)
        status = []
        for i, u in enumerate(urls):
            r = self.index.get(u, -1)
            attempts = 0
            if self.fail_fn is not None and r >= 0:
                while attempts < self.max_attempts and self.fail_fn(u, attempts):
                    attempts += 1
                if attempts >= self.max_attempts:
                    r = -2  # transient failure exhausted retries
            rows[i] = r
            if r >= 0:
                status.append("fetched")
            elif r == -1:
                status.append("missing")
            else:
                status.append("failed")
            if attempts:
                self.attempt_log[u] = attempts

        take_idx = np.where(rows >= 0, rows, self.missing_row)
        spans = self.spans_ext.take(pa.array(take_idx, pa.int64()))

        out = batch.append_column(
            "spans", spans
        ).append_column("fetch_status", pa.array(status, pa.string()))
        return out
