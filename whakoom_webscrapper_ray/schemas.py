"""Arrow schemas for every logical table in the engine.

The data model generalizes the reference's SQLite schema
(/root/reference/whakoom_webscrapper/migrations/001_initial_schema.sql:1-117)
and item dataclasses (items.py:10-174) into columnar Arrow tables, per
SURVEY.md §1.4 and BASELINE.json's ``input_hint``:

    documents(doc_id: string,
              spans: list<struct<kind:string, text:string,
                                 media_ref:string, offset:int32>>)

``doc_id`` IS the canonical URL.  ``spans`` preserves the interleaved
text+media structure of a fetched page in document order (``offset``
strictly increasing) — the per-row span-sequence-equality invariant is
checked element-wise over this column.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- documents
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),        # heading | text | link | image
        ("text", pa.string()),        # visible text ("" for image)
        ("media_ref", pa.string()),   # href for link, image URL for image, else ""
        ("offset", pa.int32()),       # 0-based document-order position
    ]
)

PAGES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# ------------------------------------------------------------------- seeds
# Mirrors the reference's ordered ``start_urls`` (spiders/lists.py:17,
# spiders/publications.py:28-29); priority 0 = Scrapy default.
SEEDS_SCHEMA = pa.schema(
    [
        ("seed_index", pa.int64()),
        ("url", pa.string()),
        ("priority", pa.int32()),
    ]
)

# ------------------------------------------------------------------ robots
# Synthetic robots.txt rules (ROBOTSTXT_OBEY=True, settings.py:68;
# AutoThrottle per-host pacing, settings.py:119-128).
ROBOTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("crawl_delay", pa.float64()),
        ("disallow", pa.list_(pa.string())),
        # Allow overrides (RFC 9309 longest-match precedence); both
        # rule lists accept * / $ wildcards.  Older tables without the
        # column load fine (RobotsRules.from_table treats it optional).
        ("allow", pa.list_(pa.string())),
    ]
)

# ---------------------------------------------------------------- frontier
# A candidate URL in the frontier. ``discovery_seq`` is the engine's
# monotone logical id (replaces SQLite autoincrement ``id``;
# 001_initial_schema.sql:3).  ``fetch_time`` is logical seconds.
FRONTIER_SCHEMA = pa.schema(
    [
        ("canon_url", pa.string()),
        ("url_sha1", pa.binary(20)),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("priority", pa.int32()),
        ("discovery_seq", pa.int64()),
        ("round", pa.int32()),
    ]
)

# Crawl-order golden output (FIXTURES.md §4).
CRAWL_ORDER_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("round", pa.int32()),
    ]
)

SEEN_SCHEMA = pa.schema(
    [
        ("url_sha1", pa.binary(20)),
        ("canon_url", pa.string()),
    ]
)

# ------------------------------------------------------------------- lists
# Mirrors the ``lists`` table (001_initial_schema.sql:2-12) written by the
# INSERT_OR_UPDATE_LIST upsert (queries/lists.sql:1-9).
LISTS_SCHEMA = pa.schema(
    [
        ("list_id", pa.int64()),
        ("title", pa.string()),
        ("url", pa.string()),
        ("user_profile", pa.string()),
        ("scrape_status", pa.string()),
        ("scraped_at", pa.timestamp("us")),
    ]
)

# lists_titles junction (001_initial_schema.sql:31-40); UNIQUE(list_id,
# title_id), position = span offset rank within the list page.
JUNCTION_SCHEMA = pa.schema(
    [
        ("list_id", pa.int64()),
        ("title_id", pa.int64()),
        ("position", pa.int32()),
    ]
)

# ``titles`` per the spec'd-but-unimplemented reference behavior
# (README.md:79-110; SURVEY.md §2.9): the engine implements the spec.
TITLES_SCHEMA = pa.schema(
    [
        ("title_id", pa.int64()),
        ("title", pa.string()),
        ("url", pa.string()),
        ("scrape_status", pa.string()),
    ]
)

# ----------------------------------------------------------------- metrics
# Generalizes ``scraping_log`` (001_initial_schema.sql:97-106;
# sqlmanager.py:266-302) into a per-partition metrics side channel.
METRICS_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("round", pa.int32()),
        ("partition", pa.int32()),
        ("stage", pa.string()),
        ("status", pa.string()),
        ("count", pa.int64()),
        ("duration_ms", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    """An empty Arrow table with the given schema."""
    return schema.empty_table()
