"""User-extension surface (SURVEY.md §2.8 X6).

The reference exposes four extension points: subclassable spiders with
``parse()`` (whakoom_webscrapper/spiders/*.py), an ordered pipeline
registry (settings.py:60-62), spider/downloader middlewares
(middlewares.py:14-60), and spider arguments (README.md:441).  The
engine's equivalents:

- :class:`Extractor` — a named batch transform ``fn(docs: pa.Table) ->
  pa.Table`` over fetched documents ``(doc_id, seq, spans)``; registered
  extractors become additional finalized output tables (the ``parse()``
  analog, batch-columnar instead of record-at-a-time).
- :class:`FetchMiddleware` — ``pre(batch)`` / ``post(batch)`` hooks
  around the fetcher (the downloader-middleware analog); ``pre`` sees
  the candidate batch before resolution, ``post`` the fetched batch
  (with ``spans`` + ``fetch_status``) and may transform it.
- Engine constructor knobs (shards, concurrency, batch size) are the
  settings.py analog.

Both kinds are plain callables shipped to workers once via the
broadcast state path (``ray.put`` + per-worker memo), never per batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa


@dataclass(frozen=True)
class Extractor:
    """Named document extractor: one extra finalized output table."""

    name: str
    fn: Callable[[pa.Table], pa.Table]


class FetchMiddleware:
    """Pre/post hooks around the fetch stage (override either)."""

    def pre(self, batch: pa.Table) -> pa.Table:  # candidates
        return batch

    def post(self, batch: pa.Table) -> pa.Table:  # fetched docs
        return batch


class ColumnStampMiddleware(FetchMiddleware):
    """Example/built-in: stamp a constant provenance column on fetched
    docs (run id, crawler version, …) — lands in the checkpointed docs
    partitions."""

    def __init__(self, column: str, value: str) -> None:
        self.column = column
        self.value = value

    def post(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            self.column,
            pa.array([self.value] * batch.num_rows, pa.string()),
        )


def image_census(batch: pa.Table) -> pa.Table:
    """Example/built-in extractor: (doc_id, n_images) per document."""
    import numpy as np
    import pyarrow.compute as pc

    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    is_img = pc.equal(flat.field("kind"), "image").to_numpy(
        zero_copy_only=False
    )
    n = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(n, parent[is_img], 1)
    return pa.table(
        {"doc_id": batch["doc_id"], "n_images": pa.array(n, pa.int64())}
    )


def apply_middlewares_pre(batch: pa.Table, middlewares) -> pa.Table:
    for m in middlewares or ():
        batch = m.pre(batch)
    return batch


def apply_middlewares_post(batch: pa.Table, middlewares) -> pa.Table:
    for m in middlewares or ():
        batch = m.post(batch)
    return batch
