"""Interleaved text+media documents over the testdata corpus.

The north-rule input shape (BASELINE.json ``input_hint``) is a table of
interleaved documents: ``(doc_id: string, spans: list<struct<kind:
string, text: string, media_ref: string, offset: int32>>)``.  The crawl
fixture (sources/synth.py) produces one organically; this module derives
the same shape **deterministically from the driver testdata** so the
span operators have a DuckDB-expressible oracle.

Derivation rule (pure function of ``documents.parquet`` columns, so SQL
can reproduce it): token ``i`` of ``text`` becomes span ``offset=i``
with

    kind      = 'link'    if i % 5 == 0
                'image'   elif i % 7 == 0
                'heading' elif i % 11 == 0
                'text'    otherwise
    media_ref = 'https://{source}/w/{i}' for link,
                'img://{source}/{i}'     for image, else ''
    text      = the token (empty for image spans — media is opaque)

Mirrors the reference's page model: a page is an ordered heterogeneous
node sequence (headings, links, text, images) iterated in document
order (reference whakoom_webscrapper/spiders/lists.py:39-47,
publications.py:96-102).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schemas import SPAN_STRUCT
from .common import read

SPAN_TYPE = pa.list_(SPAN_STRUCT)


def _derive_spans_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, source) → (doc_id:string, spans)."""
    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    offsets_arr = words.offsets.to_numpy(zero_copy_only=False)
    # per-token position within its document (vectorized)
    pos = np.arange(len(flat), dtype=np.int32) - offsets_arr[parent].astype(
        np.int32
    )

    is_link = pos % 5 == 0
    is_image = (~is_link) & (pos % 7 == 0)
    is_heading = (~is_link) & (~is_image) & (pos % 11 == 0)
    kind = np.full(len(flat), "text", dtype=object)
    kind[is_link] = "link"
    kind[is_image] = "image"
    kind[is_heading] = "heading"

    sources = batch["source"].to_pylist()
    toks = flat.to_pylist()
    media = [""] * len(flat)
    for i in np.flatnonzero(is_link):
        media[i] = f"https://{sources[parent[i]]}/w/{pos[i]}"
    for i in np.flatnonzero(is_image):
        media[i] = f"img://{sources[parent[i]]}/{pos[i]}"
    text_out = ["" if is_image[i] else toks[i] for i in range(len(toks))]

    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, pa.string()),
            pa.array(text_out, pa.string()),
            pa.array(media, pa.string()),
            pa.array(pos, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(words.offsets, span_struct)
    doc_ids = pc.cast(batch["doc_id"], pa.string())
    return pa.table(
        {"doc_id": doc_ids, "spans": pa.chunked_array([spans],
                                                      type=SPAN_TYPE)}
    )


def interleaved_docs(sf_dir: str) -> ray.data.Dataset:
    """The derived interleaved documents table (input_hint shape)."""
    return read(sf_dir, "documents", columns=["doc_id", "text", "source"]
                ).map_batches(_derive_spans_batch, batch_format="pyarrow")


def _extract_links_batch(batch: pa.Table) -> pa.Table:
    """Select link spans in offset order (the M7 extractor, flat_map)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    sel = pc.equal(flat.field("kind"), "link").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(sel)
    doc_ids = pc.cast(batch["doc_id"], pa.int64())
    return pa.table(
        {
            "doc_id": doc_ids.take(pa.array(parent[idx])),
            "offset": flat.field("offset").take(pa.array(idx)),
            "media_ref": flat.field("media_ref").take(pa.array(idx)),
        }
    )


def span_links(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, offset, media_ref) for every link span, document order.

    Demonstrates the reference's link-extraction contract (M7,
    publications.py:96-102) over the derived interleaved table.
    """
    return interleaved_docs(sf_dir).map_batches(
        _extract_links_batch, batch_format="pyarrow"
    )


def _kind_count_batch(batch: pa.Table) -> pa.Table:
    """Partial per-batch combine: (doc_id, kind) → count."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.cast(batch["doc_id"], pa.int64())
    t = pa.table(
        {"doc_id": doc_ids.take(parent), "kind": flat.field("kind")}
    )
    return pa.TableGroupBy(t, ["doc_id", "kind"]).aggregate(
        [([], "count_all")]
    ).rename_columns(["doc_id", "kind", "n_spans"])


def span_kind_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, kind, n_spans) — nested-type aggregate over spans.

    Spans of one doc never cross batch boundaries (one row = one doc),
    so the per-batch Arrow group-by IS the final result: a pure
    map-side combine with no global shuffle at all.
    """
    return interleaved_docs(sf_dir).map_batches(
        _kind_count_batch, batch_format="pyarrow"
    )


ORACLE_SPAN_LINKS = """
WITH w AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n
  FROM documents
)
SELECT doc_id,
       CAST(unnest(range(0, n, 5)) AS INTEGER) AS "offset",
       'https://' || source || '/w/' || unnest(range(0, n, 5)) AS media_ref
FROM w
"""

ORACLE_SPAN_KIND_COUNTS = """
WITH tok AS (
  SELECT doc_id,
         unnest(range(0, len(string_split(text, ' ')))) AS i
  FROM documents
)
SELECT doc_id,
       CASE WHEN i % 5 = 0 THEN 'link'
            WHEN i % 7 = 0 THEN 'image'
            WHEN i % 11 = 0 THEN 'heading'
            ELSE 'text' END AS kind,
       count(*) AS n_spans
FROM tok
GROUP BY 1, 2
"""
