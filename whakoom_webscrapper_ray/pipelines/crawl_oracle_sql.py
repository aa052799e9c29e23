"""DuckDB oracles for the crawl-derived tables (driver correctness gate).

The crawl fixture (pages/seeds/robots, synth.py SMALL, seed=42) is a
pure function of nothing — bit-identical on every call — so it can be
persisted to parquet once and every crawl table re-derived in ANSI-ish
SQL: a recursive CTE computes the scheduled set (reachability over the
link graph under the offsite + robots filters, exactly the engine's
schedule-time semantics), and window/aggregate SQL reproduces each
extraction rule (reference spiders/lists.py:39-55,
spiders/publications.py:96-102, migrations/001_initial_schema.sql).

``crawl_order`` IS oracle-checked (since round 3): although the
politeness clock looks like a stateful priority-queue simulation, each
round's state is a closed form — a host's clock after round r equals
``crawl_delay * (#URLs of that host scheduled in rounds <= r)`` and
within-host rank is ``row_number() OVER (PARTITION BY host ORDER BY
priority, ok)``, so ``fetch_time = delay * (prior_count + rank)`` and
the global seq is the per-round rank over (fetch_time, priority, ok).
The BFS levels are UNROLLED for the fixture's fixed round count
(:data:`_ORACLE_ROUNDS`); a fixture change that adds a round makes the
row counts diverge, failing the check loudly rather than silently.
(``feed_export`` — a side-effecting sink — IS oracle-checked too: the
query reads its own export back and returns per-format row counts and
a commutative content digest, which sinks.oracle_feed_export()
reproduces from the source tables.)

URL canonicalization in SQL covers exactly the fixture's URL shapes
(scheme/host case-folding, default-port drop, absolute-path relative
refs); the full RFC 3986 machinery is unit-tested against vectors in
tests/test_canonicalize.py.
"""

from __future__ import annotations

import os
import tempfile

_FIXTURE_DIRNAME = "wkm_oracle_fixture_small_v2"  # v2: robots Allow/wildcards + S3 states support

# regexes shared by the SQL below (DuckDB RE2 syntax)
_HOST = "'://(?:[^/@]*@)?([^/:]+)'"
_PATH = "'^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/.*)$'"
PROFILE_SQL_RE = "'^https?://[^/]+/[^/]+/lists/?$'"
LIST_SQL_RE = "'^https?://[^/]+/[^/]+/lists/.+_[0-9]+/?$'"
TITLE_SQL_RE = "'^https?://[^/]+/comics/.+_[0-9]+/?$'"
INT_TAIL = "'_([0-9]+)/?$'"


def fixture_dir() -> str:
    """Persist the SMALL fixture to parquet once; return the directory.

    Written atomically (tmp dir + rename) so concurrent processes —
    the driver runs queries and oracles side by side — never read a
    half-written file.  Content is deterministic (seed=42), so an
    existing directory is always valid.
    """
    base = os.path.join(tempfile.gettempdir(), _FIXTURE_DIRNAME)
    if os.path.isdir(base) and os.path.exists(
        os.path.join(base, "robots.parquet")
    ):
        return base
    from ..sources.synth import SMALL, generate_web, write_web

    tmp = tempfile.mkdtemp(prefix=_FIXTURE_DIRNAME + ".")
    write_web(generate_web(SMALL), tmp)
    try:
        os.rename(tmp, base)
    except OSError:
        # lost the race — another process landed it; theirs is identical
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return base


def _prefix(fx: str) -> str:
    """Shared CTE prelude: fixture tables, filters, reachability.

    ``reach`` = the scheduled URL set (engine seen set): canonical
    seed URLs that pass offsite+robots, then transitively every link
    on a FETCHED page (scheduled AND present in ``pages``) that passes
    the same filters.  Schedule-time dedup = the recursive UNION.
    """
    return f"""
WITH RECURSIVE
pages AS (SELECT * FROM read_parquet('{fx}/pages.parquet')),
rob_rules AS (
  -- robots patterns → RE2: '*' ↔ '.*', trailing '$' is already the
  -- RE2 anchor, everything else in the fixture grammar is
  -- regex-inert ([a-z0-9/_-]).  Longest match wins, Allow on ties
  -- (RFC 9309 §2.2.2) — evaluated by the _robots_ok predicate.
  SELECT host, FALSE AS is_allow,
         '^' || replace(pat, '*', '.*') AS re, length(pat) AS plen
  FROM (SELECT host, unnest(disallow) AS pat
        FROM read_parquet('{fx}/robots.parquet'))
  UNION ALL
  SELECT host, TRUE,
         '^' || replace(pat, '*', '.*'), length(pat)
  FROM (SELECT host, unnest("allow") AS pat
        FROM read_parquet('{fx}/robots.parquet'))
),
seed_canon AS (
  SELECT DISTINCT
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
    CASE WHEN regexp_extract(
            url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?[^/:]+:([0-9]+)', 1
         ) IN ('80', '443')
         THEN lower(regexp_extract(
            url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:]+)', 1))
         ELSE lower(regexp_extract(
            url,
            '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:]+(?::[0-9]+)?)', 1))
    END ||
    coalesce(nullif(regexp_extract(url, {_PATH}, 1), ''), '/') AS url
  FROM read_parquet('{fx}/seeds.parquet')
),
allowed AS (
  SELECT DISTINCT lower(regexp_extract(url, {_HOST}, 1)) AS host
  FROM read_parquet('{fx}/seeds.parquet')
),
links AS (
  SELECT doc_id AS src,
         CASE WHEN s.media_ref LIKE '/%'
              THEN regexp_extract(doc_id, '^(https?://[^/]+)', 1)
                   || s.media_ref
              ELSE s.media_ref END AS url
  FROM (SELECT doc_id, unnest(spans) AS s FROM pages)
  WHERE s.kind = 'link'
),
ok_links AS (
  SELECT l.src, l.url
  FROM links l
  WHERE regexp_extract(l.url, {_HOST}, 1) IN (SELECT host FROM allowed)
    AND coalesce((
      SELECT r.is_allow FROM rob_rules r
      WHERE r.host = regexp_extract(l.url, {_HOST}, 1)
        AND regexp_matches(
          coalesce(nullif(regexp_extract(l.url, {_PATH}, 1), ''), '/'),
          r.re)
      ORDER BY r.plen DESC, r.is_allow DESC
      LIMIT 1), TRUE)
),
seed_ok AS (
  SELECT url FROM seed_canon s
  WHERE regexp_extract(s.url, {_HOST}, 1) IN (SELECT host FROM allowed)
    AND coalesce((
      SELECT r.is_allow FROM rob_rules r
      WHERE r.host = regexp_extract(s.url, {_HOST}, 1)
        AND regexp_matches(
          coalesce(nullif(regexp_extract(s.url, {_PATH}, 1), ''), '/'),
          r.re)
      ORDER BY r.plen DESC, r.is_allow DESC
      LIMIT 1), TRUE)
),
reach AS (
  SELECT url FROM seed_ok
  UNION
  SELECT o.url FROM ok_links o JOIN reach r ON o.src = r.url
),
fetched AS (
  SELECT p.* FROM pages p JOIN reach r ON p.doc_id = r.url
)
"""


# BFS depth of the SMALL fixture (profiles -> lists -> titles).  The
# crawl_order oracle unrolls exactly this many levels; if the fixture
# ever gains a deeper link graph the engine schedules a 4th round and
# the row counts diverge — a loud failure, never a silent truncation.
_ORACLE_ROUNDS = 3


def _crawl_order_sql(fx: str) -> str:
    """Closed-form politeness-clock oracle for the full crawl order.

    Engine semantics being reproduced (state/frontier.py:352-443,
    pipelines/crawl.py:779-813; reference contract: scheduler order,
    spiders/lists.py:17 + settings.py:119-128):

    - round 0 = canonicalized seeds surviving offsite+robots, dedup by
      canonical URL keeping the min ``seed_index`` row (its priority);
      ``ok = seed_index``.
    - round r+1 = links on pages FETCHED in round r that survive the
      same filters and were never scheduled before; ``ok = min over
      discoverers of (parent_seq * 2**20 + least(offset, 2**20-1))``.
    - within a host, rank = (priority, ok) order;
      ``fetch_time = crawl_delay * (#host URLs scheduled in earlier
      rounds + rank)`` — the per-shard clock carry is a closed form
      because delayed hosts route to a single home shard and
      zero-delay hosts always pace at fetch_time 0.
    - global ``seq`` = running total + per-round rank over
      (fetch_time, priority, ok); the key is tie-free (ok is unique
      within a round by construction).
    """
    canon = """
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
    CASE WHEN regexp_extract(
            url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?[^/:]+:([0-9]+)', 1
         ) IN ('80', '443')
         THEN lower(regexp_extract(
            url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:]+)', 1))
         ELSE lower(regexp_extract(
            url,
            '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:]+(?::[0-9]+)?)', 1))
    END ||
    coalesce(nullif(regexp_extract(url, {path}, 1), ''), '/')
    """.format(path=_PATH)

    sql = f"""
WITH
pages AS (SELECT * FROM read_parquet('{fx}/pages.parquet')),
rob_rules AS (
  -- robots patterns → RE2: '*' ↔ '.*', trailing '$' is already the
  -- RE2 anchor, everything else in the fixture grammar is
  -- regex-inert ([a-z0-9/_-]).  Longest match wins, Allow on ties
  -- (RFC 9309 §2.2.2) — evaluated by the _robots_ok predicate.
  SELECT host, FALSE AS is_allow,
         '^' || replace(pat, '*', '.*') AS re, length(pat) AS plen
  FROM (SELECT host, unnest(disallow) AS pat
        FROM read_parquet('{fx}/robots.parquet'))
  UNION ALL
  SELECT host, TRUE,
         '^' || replace(pat, '*', '.*'), length(pat)
  FROM (SELECT host, unnest("allow") AS pat
        FROM read_parquet('{fx}/robots.parquet'))
),
delays AS (SELECT host, coalesce(crawl_delay, 0.0) AS delay
           FROM read_parquet('{fx}/robots.parquet')),
allowed AS (
  SELECT DISTINCT lower(regexp_extract(url, {_HOST}, 1)) AS host
  FROM read_parquet('{fx}/seeds.parquet')
),
links_off AS (
  SELECT doc_id AS src, s."offset" AS off,
         CASE WHEN s.media_ref LIKE '/%'
              THEN regexp_extract(doc_id, '^(https?://[^/]+)', 1)
                   || s.media_ref
              ELSE s.media_ref END AS url
  FROM (SELECT doc_id, unnest(spans) AS s FROM pages)
  WHERE s.kind = 'link'
),
ok_links_off AS (
  SELECT l.src, l.off, l.url,
         regexp_extract(l.url, {_HOST}, 1) AS host
  FROM links_off l
  WHERE regexp_extract(l.url, {_HOST}, 1) IN (SELECT host FROM allowed)
    AND coalesce((
      SELECT r.is_allow FROM rob_rules r
      WHERE r.host = regexp_extract(l.url, {_HOST}, 1)
        AND regexp_matches(
          coalesce(nullif(regexp_extract(l.url, {_PATH}, 1), ''), '/'),
          r.re)
      ORDER BY r.plen DESC, r.is_allow DESC
      LIMIT 1), TRUE)
),
seed_rows AS (
  SELECT seed_index, priority, {canon} AS url
  FROM read_parquet('{fx}/seeds.parquet')
),
lvl0_cand AS (
  SELECT url,
         regexp_extract(url, {_HOST}, 1) AS host,
         min(seed_index) AS ok,
         CAST(arg_min(priority, seed_index) AS INTEGER) AS priority
  FROM seed_rows s
  WHERE regexp_extract(s.url, {_HOST}, 1) IN (SELECT host FROM allowed)
    AND coalesce((
      SELECT r.is_allow FROM rob_rules r
      WHERE r.host = regexp_extract(s.url, {_HOST}, 1)
        AND regexp_matches(
          coalesce(nullif(regexp_extract(s.url, {_PATH}, 1), ''), '/'),
          r.re)
      ORDER BY r.plen DESC, r.is_allow DESC
      LIMIT 1), TRUE)
  GROUP BY 1, 2
),
lvl0_ft AS (
  SELECT c.*,
         coalesce(d.delay, 0.0)
           * (row_number() OVER (PARTITION BY c.host
                                 ORDER BY c.priority, c.ok) - 1) AS ft
  FROM lvl0_cand c LEFT JOIN delays d USING (host)
),
lvl0 AS (
  SELECT url, host, ok, priority, ft,
         row_number() OVER (ORDER BY ft, priority, ok) - 1 AS seq,
         0 AS round
  FROM lvl0_ft
)"""

    prev_union = "SELECT url, host, seq FROM lvl0"
    prev_lvl = "lvl0"
    for r in range(1, _ORACLE_ROUNDS):
        sql += f""",
lvl{r}_cand AS (
  SELECT o.url,
         min(o.host) AS host,
         min(p.seq * 1048576 + least(o.off, 1048575)) AS ok
  FROM ok_links_off o
  JOIN {prev_lvl} p ON o.src = p.url
  WHERE o.url NOT IN (SELECT url FROM ({prev_union}))
  GROUP BY o.url
),
lvl{r}_ft AS (
  SELECT c.url, c.host, c.ok, CAST(0 AS INTEGER) AS priority,
         coalesce(d.delay, 0.0)
           * (coalesce(pc.n, 0)
              + row_number() OVER (PARTITION BY c.host
                                   ORDER BY c.ok) - 1) AS ft
  FROM lvl{r}_cand c
  LEFT JOIN delays d USING (host)
  LEFT JOIN (SELECT host, count(*) AS n
             FROM ({prev_union}) GROUP BY host) pc USING (host)
),
lvl{r} AS (
  SELECT url, host, ok, priority, ft,
         (SELECT count(*) FROM ({prev_union}))
           + row_number() OVER (ORDER BY ft, priority, ok) - 1 AS seq,
         {r} AS round
  FROM lvl{r}_ft
)"""
        prev_union += f" UNION ALL SELECT url, host, seq FROM lvl{r}"
        prev_lvl = f"lvl{r}"

    all_lvls = " UNION ALL ".join(
        f"SELECT seq, url, host, round FROM lvl{r}"
        for r in range(_ORACLE_ROUNDS)
    )
    sql += f"""
SELECT CAST(seq AS BIGINT) AS seq, url, host,
       CAST(round AS INTEGER) AS round
FROM ({all_lvls})
ORDER BY seq
"""
    return sql


def crawl_oracles() -> dict[str, str]:
    """SQL for every oracle-checkable crawl query (same column names
    and dtypes as the Ray results)."""
    fx = fixture_dir()
    P = _prefix(fx)

    seen = P + """
SELECT url AS canon_url FROM reach ORDER BY canon_url
"""

    doc_spans = P + """
SELECT doc_id, s.kind, s.text, s.media_ref, s."offset"
FROM (SELECT doc_id, unnest(spans) AS s FROM fetched)
"""

    # ListSpider semantics (lists.py:39-55): per heading-opened section
    # on a fetched PROFILE page, sections with >=2 links emit the
    # SECOND link: title = trimmed anchor text, url = href verbatim
    # (relative, stored raw like the reference), list_id = numeric tail.
    lists = P + f""",
prof_spans AS (
  SELECT doc_id, s.kind, s.text, s.media_ref, s."offset"
  FROM (SELECT doc_id, unnest(spans) AS s FROM fetched
        WHERE regexp_matches(doc_id, {PROFILE_SQL_RE}))
),
sec AS (
  SELECT *, count(*) FILTER (WHERE kind = 'heading')
            OVER (PARTITION BY doc_id ORDER BY "offset") AS sec_id
  FROM prof_spans
),
sec_links AS (
  SELECT doc_id, sec_id, text, media_ref,
         row_number() OVER (PARTITION BY doc_id, sec_id
                            ORDER BY "offset") AS rn,
         count(*) OVER (PARTITION BY doc_id, sec_id) AS n_links
  FROM sec WHERE kind = 'link' AND sec_id > 0
)
SELECT CAST(regexp_extract(media_ref, {INT_TAIL}, 1) AS BIGINT) AS list_id,
       trim(text) AS title,
       media_ref AS url,
       regexp_extract(doc_id, '^https?://[^/]+/([^/]+)', 1) AS user_profile,
       'completed' AS scrape_status
FROM sec_links
WHERE rn = 2 AND n_links >= 2 AND regexp_matches(media_ref, {INT_TAIL})
ORDER BY list_id
"""

    # PublicationsSpider link stream on fetched LIST pages
    # (publications.py:96-102): every link span, canonicalized, offsite
    # filtered, numeric tail -> title_id; position = 0-based offset
    # rank per list page after the filter.
    title_links = f""",
list_links AS (
  SELECT doc_id,
         CAST(regexp_extract(doc_id, {INT_TAIL}, 1) AS BIGINT) AS list_id,
         s.text AS anchor_text,
         CASE WHEN s.media_ref LIKE '/%'
              THEN regexp_extract(doc_id, '^(https?://[^/]+)', 1)
                   || s.media_ref
              ELSE s.media_ref END AS url,
         s."offset" AS off
  FROM (SELECT doc_id, unnest(spans) AS s FROM fetched
        WHERE regexp_matches(doc_id, {LIST_SQL_RE}))
  WHERE s.kind = 'link'
),
tl AS (
  SELECT list_id,
         CAST(regexp_extract(url, {INT_TAIL}, 1) AS BIGINT) AS title_id,
         anchor_text, url,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY off) - 1
              AS INTEGER) AS position
  FROM list_links
  WHERE regexp_extract(url, {_HOST}, 1) IN (SELECT host FROM allowed)
    AND regexp_matches(url, {INT_TAIL})
)
"""

    junction = P + title_links + """
SELECT list_id, title_id, CAST(min(position) AS INTEGER) AS position
FROM tl GROUP BY 1, 2 ORDER BY list_id, title_id
"""

    titles = P + title_links + """
SELECT DISTINCT title_id, anchor_text AS title, url,
       'pending' AS scrape_status
FROM tl ORDER BY title_id
"""

    title_spans = f""",
tspans AS (
  SELECT doc_id,
         CAST(regexp_extract(doc_id, {INT_TAIL}, 1) AS BIGINT) AS title_id,
         s.kind, s.text, s.media_ref, s."offset"
  FROM (SELECT doc_id, unnest(spans) AS s FROM fetched
        WHERE regexp_matches(doc_id, {TITLE_SQL_RE}))
)
"""

    metadata = P + title_spans + """
SELECT title_id,
       coalesce(arg_min(text, "offset")
                FILTER (WHERE kind = 'heading'), '') AS name,
       coalesce(arg_min(media_ref, "offset")
                FILTER (WHERE kind = 'image'), '') AS cover_ref,
       coalesce(arg_min(text, "offset")
                FILTER (WHERE kind = 'text'), '') AS synopsis
FROM tspans GROUP BY title_id ORDER BY title_id
"""

    volumes = P + title_spans + """
SELECT title_id * 1000
         + CAST(regexp_extract(text,
               '^Volume ([0-9]+) \\(([0-9]{4})\\)$', 1) AS BIGINT)
         AS volume_id,
       title_id,
       CAST(regexp_extract(text,
            '^Volume ([0-9]+) \\(([0-9]{4})\\)$', 1) AS INTEGER)
         AS volume_number,
       CAST(regexp_extract(text,
            '^Volume ([0-9]+) \\(([0-9]{4})\\)$', 2) AS INTEGER) AS year
FROM tspans
WHERE kind = 'text'
  AND regexp_matches(text, '^Volume ([0-9]+) \\(([0-9]{4})\\)$')
ORDER BY volume_id
"""

    # json.dumps({...}, sort_keys=True) layout reproduced literally.
    enriched = P + title_spans + """,
vols AS (
  SELECT title_id,
         CAST(regexp_extract(text,
              '^Volume ([0-9]+) \\(([0-9]{4})\\)$', 1) AS INTEGER) AS num,
         CAST(regexp_extract(text,
              '^Volume ([0-9]+) \\(([0-9]{4})\\)$', 2) AS INTEGER) AS year
  FROM tspans
  WHERE kind = 'text'
    AND regexp_matches(text, '^Volume ([0-9]+) \\(([0-9]{4})\\)$')
)
SELECT title_id,
       CAST(NULL AS DOUBLE) AS rating,
       '{"first_year": ' || min(year) || ', "n_volumes": ' || count(*)
         || '}' AS additional_data
FROM vols GROUP BY title_id ORDER BY title_id
"""

    # Per-entity scraping log (S5, sqlmanager.py:266-302): one row per
    # SCHEDULED url.  status/error from page existence; n_links = raw
    # link spans on the fetched page; n_candidates = links surviving
    # offsite+robots (pre-dedup — the engine's keep mask, crawl.py:176).
    metrics = P + """,
link_counts AS (
  SELECT doc_id, count(*) AS n FROM
    (SELECT doc_id, unnest(spans) AS s FROM pages)
  WHERE s.kind = 'link' GROUP BY doc_id
),
cand_counts AS (
  SELECT src AS doc_id, count(*) AS n FROM ok_links GROUP BY src
)
SELECT r.url AS entity_id,
       'fetch' AS operation,
       CASE WHEN p.doc_id IS NOT NULL
            THEN 'completed' ELSE 'failed' END AS status,
       CASE WHEN p.doc_id IS NOT NULL
            THEN '' ELSE 'page_not_found' END AS error,
       CAST(CASE WHEN p.doc_id IS NOT NULL
                 THEN coalesce(lc.n, 0) ELSE 0 END AS BIGINT) AS n_links,
       CAST(CASE WHEN p.doc_id IS NOT NULL
                 THEN coalesce(cc.n, 0) ELSE 0 END AS BIGINT)
         AS n_candidates
FROM reach r
LEFT JOIN pages p ON p.doc_id = r.url
LEFT JOIN link_counts lc ON lc.doc_id = r.url
LEFT JOIN cand_counts cc ON cc.doc_id = r.url
ORDER BY entity_id
"""

    metrics_rollup = f"""
WITH em AS ({metrics})
SELECT operation, status,
       CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(n_links) AS BIGINT) AS total_links,
       CAST(sum(n_candidates) AS BIGINT) AS total_candidates
FROM em GROUP BY operation, status ORDER BY operation, status
"""

    # per-host schedule utilization: a pure rollup of the oracle-
    # checked crawl order (the "report per-host utilization" design
    # note, SURVEY §7.4) — how many URLs each host absorbed, across
    # how many rounds, and its first/last global positions
    host_stats = f"""
WITH ord AS ({_crawl_order_sql(fx)})
SELECT host,
       count(*) AS n_scheduled,
       CAST(count(DISTINCT round) AS BIGINT) AS n_rounds,
       min(seq) AS first_seq,
       max(seq) AS last_seq
FROM ord GROUP BY host
"""

    return {
        "crawl_order": _crawl_order_sql(fx),
        "crawl_host_stats": host_stats,
        "crawl_seen_set": seen,
        "crawl_metrics": metrics,
        "crawl_metrics_rollup": metrics_rollup,
        "crawl_doc_spans": doc_spans,
        "crawl_lists": lists,
        "crawl_junction": junction,
        "crawl_titles": titles,
        "crawl_title_metadata": metadata,
        "crawl_volumes": volumes,
        "crawl_title_enriched": enriched,
    }
