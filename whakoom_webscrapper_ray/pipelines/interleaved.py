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


def _anchor_rows(batch: pa.Table) -> pa.Table:
    """link spans → (media_ref, anchor, doc_id) rows (M7 shape plus
    the anchor text the reference extracts alongside each href,
    lists.py:46-47)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    idx = np.flatnonzero(
        pc.equal(flat.field("kind"), "link").to_numpy(zero_copy_only=False)
    )
    take = pa.array(idx)
    doc_ids = pc.cast(batch["doc_id"], pa.int64())
    return pa.table({
        "media_ref": flat.field("media_ref").take(take),
        "anchor": flat.field("text").take(take),
        "doc_id": doc_ids.take(pa.array(parent[idx])),
    })


def anchor_text_stats(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(media_ref, n_refs, n_anchors, min_doc_id): inbound-link
    aggregation per link target — total references, DISTINCT anchor
    texts, first referring doc.  The anchor-text table a link-graph /
    retrieval pipeline builds from interleaved documents.

    Scale shape: link rows combine per batch (Arrow group-by on
    (media_ref, anchor) — one doc's spans never split across batches,
    and the distinct-anchor count needs the pair key anyway), then ONE
    shuffle keyed by ``hash(media_ref) % parts`` and a vectorized
    per-partition merge (``np.unique`` twice: pair level then target
    level) — per-partition work, never per-key work.  Raise ``parts``
    with target cardinality.
    """
    import pandas as pd

    rows = interleaved_docs(sf_dir).map_batches(
        _anchor_rows, batch_format="pyarrow"
    )

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["media_ref", "anchor"]).aggregate(
            [("doc_id", "min"), ([], "count_all")]
        )
        h = pd.util.hash_array(np.asarray(
            g["media_ref"].to_numpy(zero_copy_only=False), dtype=object
        )).astype(np.uint64)
        return pa.table({
            "media_ref": g["media_ref"],
            "anchor": g["anchor"],
            "m_p": g["doc_id_min"],
            "n_p": g["count_all"],
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "media_ref": pa.array([], pa.string()),
            "n_refs": pa.array([], pa.int64()),
            "n_anchors": pa.array([], pa.int64()),
            "min_doc_id": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        ref = g["media_ref"].to_numpy(zero_copy_only=False)
        anc = g["anchor"].to_numpy(zero_copy_only=False)
        n_p = g["n_p"].to_numpy(zero_copy_only=False)
        m_p = g["m_p"].to_numpy(zero_copy_only=False)
        # pair level: collapse (media_ref, anchor) partials
        pair_key = np.char.add(
            np.char.add(ref.astype(str), "\x1f"), anc.astype(str)
        )
        up, pfirst, pinv = np.unique(
            pair_key, return_index=True, return_inverse=True
        )
        pref = ref[pfirst]  # representative media_ref per pair
        pn = np.zeros(up.size, dtype=np.int64)
        np.add.at(pn, pinv, n_p)
        pm = np.full(up.size, np.iinfo(np.int64).max)
        np.minimum.at(pm, pinv, m_p)
        # target level
        ur, rinv = np.unique(pref.astype(str), return_inverse=True)
        n_refs = np.zeros(ur.size, dtype=np.int64)
        np.add.at(n_refs, rinv, pn)
        n_anchors = np.bincount(rinv, minlength=ur.size).astype(np.int64)
        mind = np.full(ur.size, np.iinfo(np.int64).max)
        np.minimum.at(mind, rinv, pm)
        return pa.table({
            "media_ref": pa.array(ur, pa.string()),
            "n_refs": pa.array(n_refs, pa.int64()),
            "n_anchors": pa.array(n_anchors, pa.int64()),
            "min_doc_id": pa.array(mind, pa.int64()),
        })

    return (
        rows.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


ORACLE_ANCHOR_TEXT_STATS = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
),
t AS (
  SELECT doc_id, source, ws,
         unnest(range(0, len(ws), 5)) AS i
  FROM w
),
a AS (
  SELECT doc_id,
         'https://' || source || '/w/' || i AS media_ref,
         ws[i + 1] AS anchor
  FROM t
)
SELECT media_ref,
       count(*) AS n_refs,
       count(DISTINCT anchor) AS n_anchors,
       min(doc_id) AS min_doc_id
FROM a
GROUP BY media_ref
"""


# ------------------------------------------------------- span stitch
def _stitch_batch(b: pa.Table) -> pa.Table:
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "para_id": pa.array([], pa.int64()),
        "para_text": pa.array([], pa.string()),
        "n_tokens": pa.array([], pa.int64()),
        "start_offset": pa.array([], pa.int32()),
    })
    spans = b.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    n = parent.size
    if n == 0:
        return empty
    istext = pc.equal(flat.field("kind"), "text").to_numpy(
        zero_copy_only=False)
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    # paragraph id = number of non-text separators before the span,
    # per doc: global separator cumsum minus its value at doc start
    sep = (~istext).astype(np.int64)
    gcs = np.cumsum(sep)
    new_doc = np.r_[True, parent[1:] != parent[:-1]]
    dstart = np.flatnonzero(new_doc)
    base = (gcs - sep)[dstart]
    para = gcs - np.repeat(base, np.diff(np.r_[dstart, n]))
    keep = np.flatnonzero(istext)
    if keep.size == 0:
        return empty
    kpar, kpara, koff = parent[keep], para[keep], off[keep]
    brk = np.r_[True,
                (kpar[1:] != kpar[:-1]) | (kpara[1:] != kpara[:-1])]
    starts = np.flatnonzero(brk)
    lens = np.diff(np.r_[starts, keep.size])
    ktok = flat.field("text").take(pa.array(keep))
    runs = pa.ListArray.from_arrays(
        pa.array(np.r_[starts, keep.size].astype(np.int32)), ktok)
    return pa.table({
        "doc_id": pc.cast(b["doc_id"], pa.int64()).take(
            pa.array(kpar[starts])),
        "para_id": pa.array(kpara[starts], pa.int64()),
        "para_text": pc.binary_join(runs, " "),
        "n_tokens": pa.array(lens, pa.int64()),
        "start_offset": pa.array(koff[starts].astype(np.int32),
                                 pa.int32()),
    })


def span_stitch(sf_dir: str) -> ray.data.Dataset:
    """Coalesce each run of consecutive TEXT spans into one paragraph
    row (doc_id, para_id, para_text, n_tokens, start_offset) — the
    ordered nested-data transform a doc-assembly stage needs (re-join
    extracted fragments between media/link/heading separators, cf.
    reference publications.py:96-102 iterating heterogeneous nodes in
    document order).

    Pure map-side: spans of one doc never cross batch boundaries, so
    every paragraph is assembled inside its batch with one vectorized
    pass (separator cumsum → run breaks → ``ListArray`` over the kept
    tokens → ``pc.binary_join``) — no shuffle, no Python row loop, and
    the output streams.
    """
    return interleaved_docs(sf_dir).map_batches(
        _stitch_batch, batch_format="pyarrow")


ORACLE_SPAN_STITCH = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), t AS (
  SELECT doc_id, ws, unnest(range(0, len(ws))) AS i FROM w
), f AS (
  SELECT doc_id, i, ws[i + 1] AS tok,
         CASE WHEN i % 5 = 0 OR i % 7 = 0 OR i % 11 = 0
              THEN 1 ELSE 0 END AS sep
  FROM t
), p AS (
  SELECT doc_id, i, tok, sep,
         CAST(sum(sep) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS para_id
  FROM f
)
SELECT doc_id, para_id,
       string_agg(tok, ' ' ORDER BY i) AS para_text,
       count(*) AS n_tokens,
       CAST(min(i) AS INTEGER) AS start_offset
FROM p WHERE sep = 0
GROUP BY doc_id, para_id
"""


# ------------------------------------------------------ media context
def _media_context_batch(b: pa.Table) -> pa.Table:
    spans = b.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    n = parent.size
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "offset": pa.array([], pa.int32()),
            "media_ref": pa.array([], pa.string()),
            "caption": pa.array([], pa.string()),
        })
    kind = flat.field("kind")
    istext = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
    isimg = pc.equal(kind, "image").to_numpy(zero_copy_only=False)
    # nearest PRECEDING text span per row: segmented running max of
    # (global index where text, else -1) with the per-doc offset trick
    g = np.arange(n, dtype=np.int64)
    val = np.where(istext, g, np.int64(-1))
    docseg = np.cumsum(np.r_[True, parent[1:] != parent[:-1]]) - 1
    k = np.int64(n + 2)
    cma = np.maximum.accumulate(val + docseg * k)
    prev = np.r_[-k, cma[:-1]] - docseg * k
    img = np.flatnonzero(isimg)
    pidx = prev[img]
    has = pa.array(pidx >= 0)
    caps = flat.field("text").take(
        pa.array(np.where(pidx >= 0, pidx, 0), pa.int64()))
    return pa.table({
        "doc_id": pc.cast(b["doc_id"], pa.int64()).take(
            pa.array(parent[img])),
        "offset": flat.field("offset").take(pa.array(img)),
        "media_ref": flat.field("media_ref").take(pa.array(img)),
        "caption": pc.if_else(has, caps, pa.scalar("", pa.string())),
    })


def media_context(sf_dir: str) -> ray.data.Dataset:
    """Caption heuristic for the multimodal columns: every image span
    paired with the nearest PRECEDING text span's token in the same
    document ('' when none) — the text-context lookup an image-caption
    / alt-text training-pair builder performs over interleaved docs.

    Map-side only: the preceding-text index is a per-doc segmented
    running max (offset trick, one ``np.maximum.accumulate`` per
    batch), so the operator streams with no shuffle and no row loop.
    """
    return interleaved_docs(sf_dir).map_batches(
        _media_context_batch, batch_format="pyarrow")


ORACLE_MEDIA_CONTEXT = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
), t AS (
  SELECT doc_id, source, ws, unnest(range(0, len(ws))) AS i FROM w
), k AS (
  SELECT doc_id, source, ws, i,
         CASE WHEN i % 5 = 0 THEN 'link'
              WHEN i % 7 = 0 THEN 'image'
              WHEN i % 11 = 0 THEN 'heading'
              ELSE 'text' END AS kind
  FROM t
), x AS (
  SELECT doc_id, source, ws, i, kind,
         max(CASE WHEN kind = 'text' THEN i END) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pti
  FROM k
)
SELECT doc_id, CAST(i AS INTEGER) AS "offset",
       'img://' || source || '/' || i AS media_ref,
       coalesce(ws[pti + 1], '') AS caption
FROM x WHERE kind = 'image'
"""
