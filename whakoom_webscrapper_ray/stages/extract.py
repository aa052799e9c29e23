"""Vectorized span extractors (the ``parse()`` logic re-expressed on Arrow).

The reference parses HTML record-at-a-time with CSS/XPath selectors:

- ListSpider: per ``h3`` section, keep sections with >1 ``<a>``, take the
  SECOND anchor's text/href, derive ``list_id`` from the href tail
  (/root/reference/whakoom_webscrapper/spiders/lists.py:39-55);
- PublicationsSpider: all ``span.title > a`` anchors in document order
  (spiders/publications.py:96-102).

Here a page is one row ``(doc_id, spans: list<struct>)`` and extraction
is a batch transform over the flattened span child array — pure
numpy/pyarrow, no per-row Python loop.  Document order is the ``offset``
field; all outputs preserve it (the span-sequence-equality invariant of
BASELINE.json).

Extractors are registered per page-kind (the engine's extension surface,
SURVEY.md §2.8 X6): ``classify_pages`` routes docs to section- or
link-extraction by URL shape, mirroring the reference's two spiders.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PROFILE_RE = r"^https?://[^/]+/[^/]+/lists/?$"
LIST_RE = r"^https?://[^/]+/[^/]+/lists/.+_[0-9]+/?$"
TITLE_RE = r"^https?://[^/]+/comics/.+_[0-9]+/?$"

_INT_TAIL = re.compile(r"_([0-9]+)/?$")


def _flatten_spans(batch: pa.Table) -> tuple[np.ndarray, dict[str, pa.Array]]:
    """Flatten the spans column → (parent_row_index, child field arrays)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    fields = {
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    return parent, fields


def ids_from_url_tail(urls: pa.Array | list[str]) -> pa.Array:
    """Vectorized ``int(url.rsplit('_', 1)[-1])`` (lists.py:47).

    Null where the tail is not numeric.
    """
    ids = pc.extract_regex(urls, r"_(?P<id>[0-9]+)/?$")
    return pc.struct_field(ids, "id").cast(pa.int64())


def extract_links(batch: pa.Table) -> pa.Table:
    """All link spans of every doc, in document (offset) order.

    Output: (src_doc_id, anchor_text, href, offset).  This is the
    frontier-expansion stream and the publications-style title/link
    stream (publications.py:96-102).
    """
    parent, f = _flatten_spans(batch)
    mask = pc.equal(f["kind"], "link").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(mask)
    doc_ids = batch.column("doc_id").combine_chunks() if isinstance(
        batch.column("doc_id"), pa.ChunkedArray
    ) else batch.column("doc_id")
    return pa.table(
        {
            "src_doc_id": doc_ids.take(pa.array(parent[idx])),
            "anchor_text": f["text"].take(pa.array(idx)),
            "href": f["media_ref"].take(pa.array(idx)),
            "offset": f["offset"].take(pa.array(idx)),
        }
    )


def extract_sections(batch: pa.Table) -> pa.Table:
    """ListSpider semantics over span rows (lists.py:39-55).

    Per doc, a ``heading`` span opens a section; the section's link spans
    are its anchors.  Sections with >1 link emit one row built from the
    SECOND link (index 1): ``title`` = stripped anchor text, ``url`` =
    href verbatim (possibly relative — the reference stores it raw,
    lists.py:52), ``list_id`` = numeric URL tail.  Rows whose tail is
    non-numeric are dropped (the reference would crash; SURVEY.md §2.2 M5).

    Output: (src_doc_id, list_id, title, url).
    """
    parent, f = _flatten_spans(batch)
    kinds = f["kind"].to_numpy(zero_copy_only=False)
    is_heading = kinds == "heading"
    is_link = kinds == "link"

    # Section id: global cumsum of headings; spans before a doc's first
    # heading get the previous doc's last section id, but combining with
    # the parent row index keys sections uniquely per doc.
    sec = np.cumsum(is_heading)
    link_idx = np.flatnonzero(is_link & (sec > 0))
    if link_idx.size == 0:
        return pa.table(
            {
                "src_doc_id": pa.array([], pa.string()),
                "list_id": pa.array([], pa.int64()),
                "title": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
            }
        )
    link_sec = sec[link_idx]
    link_parent = parent[link_idx]
    # Links sharing (parent, sec) form one section, contiguous in flat order.
    key_change = np.empty(link_idx.size, dtype=bool)
    key_change[0] = True
    key_change[1:] = (link_sec[1:] != link_sec[:-1]) | (
        link_parent[1:] != link_parent[:-1]
    )
    run_id = np.cumsum(key_change) - 1
    pos_in_run = np.arange(link_idx.size) - np.maximum.accumulate(
        np.where(key_change, np.arange(link_idx.size), 0)
    )
    run_sizes = np.bincount(run_id)
    # Second link of sections with >= 2 links:
    take = np.flatnonzero((pos_in_run == 1) & (run_sizes[run_id] >= 2))
    flat_take = link_idx[take]

    texts = f["text"].take(pa.array(flat_take))
    hrefs = f["media_ref"].take(pa.array(flat_take))
    doc_col = batch.column("doc_id")
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    src = doc_col.take(pa.array(parent[flat_take]))

    list_ids = ids_from_url_tail(hrefs)
    valid = pc.is_valid(list_ids)
    out = pa.table(
        {
            "src_doc_id": src,
            "list_id": list_ids,
            "title": pc.utf8_trim_whitespace(texts),
            "url": hrefs,
        }
    )
    return out.filter(valid)


def classify_pages(doc_ids: pa.Array) -> dict[str, np.ndarray]:
    """Boolean masks routing docs to the reference's two parse paths."""
    profile = pc.match_substring_regex(doc_ids, PROFILE_RE).to_numpy(
        zero_copy_only=False
    )
    list_page = pc.match_substring_regex(doc_ids, LIST_RE).to_numpy(
        zero_copy_only=False
    )
    return {"profile": profile, "list": list_page}


def extract_title_links(batch: pa.Table) -> pa.Table:
    """Title links from LIST pages, in document order (publications.py:96-102).

    Output: (src_doc_id, list_id, anchor_text, href, offset).  ``list_id``
    is the numeric tail of the list page's own URL.  Every link span on
    the page is emitted (offsite filtering happens downstream, where the
    canonical host is known) — position ranks are assigned after that
    filter by :func:`rank_positions`.
    """
    doc_col = batch.column("doc_id")
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    masks = classify_pages(doc_col)
    keep = pa.array(masks["list"])
    sub = batch.filter(keep)
    if sub.num_rows == 0:
        return pa.table(
            {
                "src_doc_id": pa.array([], pa.string()),
                "list_id": pa.array([], pa.int64()),
                "anchor_text": pa.array([], pa.string()),
                "href": pa.array([], pa.string()),
                "offset": pa.array([], pa.int32()),
            }
        )
    links = extract_links(sub)
    list_ids = ids_from_url_tail(links.column("src_doc_id"))
    return pa.table(
        {
            "src_doc_id": links.column("src_doc_id"),
            "list_id": list_ids,
            "anchor_text": links.column("anchor_text"),
            "href": links.column("href"),
            "offset": links.column("offset"),
        }
    )


def extract_profile_sections(batch: pa.Table) -> pa.Table:
    """Section extraction restricted to PROFILE pages (ListSpider scope)."""
    doc_col = batch.column("doc_id")
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    masks = classify_pages(doc_col)
    return extract_sections(batch.filter(pa.array(masks["profile"])))


def extract_title_metadata(batch: pa.Table) -> pa.Table:
    """Metadata rows from TITLE (leaf) pages, vectorized.

    The reference SPEC persists per-title metadata (README.md:79-110,
    migrations 001_initial_schema.sql:63-79) but its pipeline never
    implements the write (pipelines.py:161-205 only log) — the engine
    implements the spec: per title page take the FIRST ``heading``
    span's text as the display name, the FIRST ``image`` span's
    media_ref as the cover, and the FIRST ``text`` span's text as the
    synopsis, all in document (offset) order.

    Output: (title_id, name, cover_ref, synopsis), one row per title
    page in the batch.
    """
    doc_col = batch.column("doc_id")
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    keep = pc.match_substring_regex(doc_col, TITLE_RE)
    sub = batch.filter(keep)
    empty = pa.table(
        {
            "title_id": pa.array([], pa.int64()),
            "name": pa.array([], pa.string()),
            "cover_ref": pa.array([], pa.string()),
            "synopsis": pa.array([], pa.string()),
        }
    )
    if sub.num_rows == 0:
        return empty
    parent, f = _flatten_spans(sub)
    kinds = f["kind"].to_numpy(zero_copy_only=False)

    def first_per_doc(mask: np.ndarray, values: pa.Array) -> np.ndarray:
        """values[first flat index per doc row] (spans offset-ordered)."""
        out = np.full(sub.num_rows, "", dtype=object)
        idx = np.flatnonzero(mask)
        if idx.size:
            docs, firsts = np.unique(parent[idx], return_index=True)
            vals = values.take(pa.array(idx[firsts])).to_pylist()
            out[docs] = ["" if v is None else v for v in vals]
        return out

    sub_doc = sub.column("doc_id")
    if isinstance(sub_doc, pa.ChunkedArray):
        sub_doc = sub_doc.combine_chunks()
    tids = ids_from_url_tail(sub_doc)
    out = pa.table(
        {
            "title_id": tids,
            "name": pa.array(
                first_per_doc(kinds == "heading", f["text"]), pa.string()
            ),
            "cover_ref": pa.array(
                first_per_doc(kinds == "image", f["media_ref"]), pa.string()
            ),
            "synopsis": pa.array(
                first_per_doc(kinds == "text", f["text"]), pa.string()
            ),
        }
    )
    return out.filter(pc.is_valid(tids))


VOLUME_RE = r"^Volume (?P<num>[0-9]+) \((?P<year>[0-9]{4})\)$"


def extract_volumes(batch: pa.Table) -> pa.Table:
    """Volume rows from TITLE pages (reference 001_initial_schema.sql:45-58
    — spec'd but never persisted by the reference pipeline).

    Volume listings are ``text`` spans ``Volume N (YYYY)`` on title leaf
    pages; ``volume_id = title_id*1000 + N`` is the stable synthetic
    key (UNIQUE(title_id, volume_number) analog).  Fully vectorized:
    one regex extract over the flattened text spans.

    Output: (volume_id, title_id, volume_number, year).
    """
    doc_col = batch.column("doc_id")
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    sub = batch.filter(pc.match_substring_regex(doc_col, TITLE_RE))
    empty = pa.table(
        {
            "volume_id": pa.array([], pa.int64()),
            "title_id": pa.array([], pa.int64()),
            "volume_number": pa.array([], pa.int32()),
            "year": pa.array([], pa.int32()),
        }
    )
    if sub.num_rows == 0:
        return empty
    parent, f = _flatten_spans(sub)
    m = pc.extract_regex(f["text"], VOLUME_RE)
    valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
    valid &= (f["kind"].to_numpy(zero_copy_only=False) == "text")
    idx = np.flatnonzero(valid)
    if idx.size == 0:
        return empty
    take = pa.array(idx)
    nums = pc.struct_field(m, "num").take(take).cast(pa.int32())
    years = pc.struct_field(m, "year").take(take).cast(pa.int32())
    sub_doc = sub.column("doc_id")
    if isinstance(sub_doc, pa.ChunkedArray):
        sub_doc = sub_doc.combine_chunks()
    tids = ids_from_url_tail(sub_doc).take(pa.array(parent[idx]))
    vids = pc.add(
        pc.multiply(tids, pa.scalar(1000, pa.int64())),
        nums.cast(pa.int64()),
    )
    return pa.table(
        {
            "volume_id": vids,
            "title_id": tids,
            "volume_number": nums,
            "year": years,
        }
    )


def rank_positions(tbl: pa.Table, group_col: str = "list_id",
                   order_col: str = "offset",
                   out_col: str = "position") -> pa.Table:
    """0-based rank of each row within its group, by document order.

    Used to assign the junction table's ``position`` (the offset rank of
    a title link within its list page; 001_initial_schema.sql:31-40).
    Assumes rows of a group are contiguous and already offset-ordered
    within each source doc (true for extractor output within a batch).
    """
    if tbl.num_rows == 0:
        return tbl.append_column(out_col, pa.array([], pa.int32()))
    groups = tbl.column(group_col).to_numpy(zero_copy_only=False)
    change = np.empty(len(groups), dtype=bool)
    change[0] = True
    change[1:] = groups[1:] != groups[:-1]
    idx = np.arange(len(groups))
    pos = idx - np.maximum.accumulate(np.where(change, idx, 0))
    return tbl.append_column(out_col, pa.array(pos.astype(np.int32)))
