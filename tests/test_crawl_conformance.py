"""Engine-vs-oracle conformance (SURVEY.md §5.2.3; BASELINE.json invariant).

The distributed Ray Data engine must reproduce the sequential oracle's
outputs exactly: crawl order, URL-seen set, per-row span sequences,
lists / junction / titles tables, and the dedup-once property.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest


@pytest.fixture(scope="module")
def engine_run(ray_session, small_web, tmp_path_factory):
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt"))
    eng = CrawlEngine(
        small_web["pages"],
        small_web["seeds"],
        small_web["robots"],
        checkpoint_dir=ckpt,
        num_shards=3,
        fetcher_concurrency=2,
        batch_size=64,
    )
    summary = eng.run()
    return eng, summary


def test_crawl_order_equality(engine_run, small_golden):
    eng, _ = engine_run
    got = eng.crawl_order()
    want = small_golden.crawl_order
    assert got.num_rows == len(want)
    rows = list(
        zip(
            got.column("seq").to_pylist(),
            got.column("url").to_pylist(),
            got.column("host").to_pylist(),
            got.column("round").to_pylist(),
        )
    )
    assert rows == want


def test_seen_set_equality(engine_run, small_golden):
    eng, _ = engine_run
    got = eng.seen_table()
    pairs = dict(
        zip(
            got.column("url_sha1").to_pylist(),
            got.column("canon_url").to_pylist(),
        )
    )
    assert pairs == small_golden.seen


def test_span_sequence_equality(engine_run, small_golden):
    """Per-row (kind, text, media_ref, order) equality — the
    BASELINE.json input_hint invariant."""
    eng, _ = engine_run
    docs = eng.docs_dataset().to_pandas()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for _, r in docs.iterrows()
    }
    want = {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp]
        for d, sp in small_golden.docs_out.items()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d], d


def test_dedup_once_property(engine_run):
    """A URL reachable from k places is fetched exactly once
    (README.md:520-531 hard requirement)."""
    eng, _ = engine_run
    order = eng.crawl_order().column("url").to_pylist()
    assert len(order) == len(set(order))


def test_lists_table_equality(engine_run, small_golden):
    eng, _ = engine_run
    tables = eng.finalize_tables()
    got = tables["lists"].to_pylist()
    want = sorted(small_golden.lists_out.values(), key=lambda r: r["list_id"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["list_id"] == w["list_id"]
        assert g["title"] == w["title"]
        assert g["url"] == w["url"]
        assert g["user_profile"] == w["user_profile"]
        assert g["scrape_status"] == w["scrape_status"] == "completed"
    eng._finalized = tables  # reuse in junction/titles tests


def test_junction_position_equality(engine_run, small_golden):
    eng, _ = engine_run
    tables = getattr(eng, "_finalized", None) or eng.finalize_tables()
    got = {
        (r["list_id"], r["title_id"]): r["position"]
        for r in tables["junction"].to_pylist()
    }
    assert got == small_golden.junction_out


def test_titles_equality(engine_run, small_golden):
    eng, _ = engine_run
    tables = getattr(eng, "_finalized", None) or eng.finalize_tables()
    got = {r["title_id"]: r for r in tables["titles"].to_pylist()}
    assert set(got) == set(small_golden.titles_out)
    for tid, w in small_golden.titles_out.items():
        g = got[tid]
        assert g["title"] == w["title"]
        assert g["url"] == w["url"]


def test_title_metadata_equality(engine_run, small_golden):
    """The spec'd title_metadata table (reference README.md:79-110 /
    001_initial_schema.sql:63-79; persistence unimplemented there)."""
    eng, _ = engine_run
    tables = getattr(eng, "_finalized", None) or eng.finalize_tables()
    got = {r["title_id"]: r for r in tables["title_metadata"].to_pylist()}
    assert set(got) == set(small_golden.metadata_out)
    for tid, w in small_golden.metadata_out.items():
        g = got[tid]
        assert g["name"] == w["name"]
        assert g["cover_ref"] == w["cover_ref"]
        assert g["synopsis"] == w["synopsis"]


def test_volumes_equality(engine_run, small_golden):
    """The spec'd volumes table (001_initial_schema.sql:45-58;
    persistence unimplemented in the reference pipeline)."""
    eng, _ = engine_run
    tables = getattr(eng, "_finalized", None) or eng.finalize_tables()
    got = {r["volume_id"]: r for r in tables["volumes"].to_pylist()}
    assert set(got) == set(small_golden.volumes_out)
    for vid, w in small_golden.volumes_out.items():
        g = got[vid]
        assert g["title_id"] == w["title_id"]
        assert g["volume_number"] == w["volume_number"]
        assert g["year"] == w["year"]


def test_robots_disallow_nowhere(engine_run, small_web):
    """URLs the robots rules forbid (Allow/Disallow, longest-match,
    wildcards) are in neither seen nor output; the fixture's Allow
    carve-out is genuinely exercised (FIXTURES.md §3)."""
    from urllib.parse import urlsplit

    from whakoom_webscrapper_ray.functions.robots import RobotsRules

    eng, _ = engine_run
    rules = RobotsRules.from_table(small_web["robots"])
    assert rules.rules  # fixture guarantees rule-bearing hosts
    seen_urls = eng.seen_table().column("canon_url").to_pylist()
    for u in seen_urls:
        sp = urlsplit(u)
        assert rules.allowed(sp.hostname, sp.path), u
    # the /comics/*0$ Allow override re-admits some title pages on the
    # otherwise-disallowed host — they must actually appear
    dis_host = small_web["robots"].to_pylist()[-1]["host"]
    carved = [u for u in seen_urls
              if f"//{dis_host}/comics/" in u and u.endswith("0")]
    assert carved
    blocked = [u for u in seen_urls
               if f"//{dis_host}/comics/" in u and not u.endswith("0")]
    assert not blocked


def test_politeness_spacing(engine_run, small_web, small_golden):
    """Delayed hosts' fetch times are spaced >= crawl_delay apart."""
    import pyarrow.parquet as pq
    import os

    eng, _ = engine_run
    robots = {r["host"]: r["crawl_delay"] for r in small_web["robots"].to_pylist()}
    delayed = [h for h, d in robots.items() if d > 0]
    assert delayed
    parts = []
    for r in range(eng.next_round):
        t = eng._order_table(r)
        if t is not None:
            parts.append(t)
    full = pa.concat_tables(parts)
    for h in delayed:
        sub = full.filter(pc.equal(full["host"], h)).sort_by("fetch_time")
        times = sub.column("fetch_time").to_pylist()
        for a, b in zip(times, times[1:]):
            assert b - a >= robots[h] - 1e-9


def test_spill_conformance(ray_session, small_web, small_golden,
                           tmp_path_factory):
    """A tiny spill threshold forces every enqueue to disk; the crawl
    must still equal the oracle exactly (memory-bounded queues,
    SURVEY.md §4.3)."""
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path_factory.mktemp("spill_ckpt"))
    eng = CrawlEngine(
        small_web["pages"], small_web["seeds"], small_web["robots"],
        checkpoint_dir=ckpt, num_shards=3, batch_size=64,
        spill_threshold_rows=8,
    )
    eng.run()
    stats = eng.frontier.spill_stats()
    assert sum(s["spills"] for s in stats) > 0
    got = eng.crawl_order()
    rows = list(
        zip(
            got.column("seq").to_pylist(),
            got.column("url").to_pylist(),
            got.column("host").to_pylist(),
            got.column("round").to_pylist(),
        )
    )
    assert rows == small_golden.crawl_order
    eng.shutdown()


def test_title_enriched_equality(engine_run, small_golden):
    """Derived enrichment table (001_initial_schema.sql:81-95): JSON
    additional_data computed from volumes."""
    eng, _ = engine_run
    tables = getattr(eng, "_finalized", None) or eng.finalize_tables()
    got = {r["title_id"]: r for r in tables["title_enriched"].to_pylist()}
    assert set(got) == set(small_golden.enriched_out)
    for tid, w in small_golden.enriched_out.items():
        g = got[tid]
        assert g["rating"] is None
        assert g["additional_data"] == w["additional_data"]


def _expected_entity_metrics(small_web, small_golden):
    """Golden per-entity scraping-log rows derived from the fixture:
    status from page existence, n_links = raw link spans, n_candidates
    = links surviving offsite+robots pre-dedup (the route stage's keep
    mask, crawl.py:176-177)."""
    from urllib.parse import urlsplit

    from whakoom_webscrapper_ray.functions.canonicalize import (
        canonicalize_url,
        host_of,
    )
    from whakoom_webscrapper_ray.functions.robots import RobotsRules

    pages = small_web["pages"]
    page_spans = dict(
        zip(
            pages.column("doc_id").to_pylist(),
            pages.column("spans").to_pylist(),
        )
    )
    rules = RobotsRules.from_table(small_web["robots"])
    allowed = frozenset(
        host_of(canonicalize_url(u))
        for u in small_web["seeds"].column("url").to_pylist()
    )

    def domain_ok(h):
        return h in allowed or any(h.endswith("." + d) for d in allowed)

    status = dict(small_golden.fetch_log)
    rows = {}
    for seq, url, host, rnd in small_golden.crawl_order:
        if status[url] != "fetched":
            rows[url] = (seq, "fetch", "failed", "page_not_found", 0, 0)
            continue
        links = [s for s in page_spans[url] if s["kind"] == "link"]
        ncand = 0
        for s in links:
            child = canonicalize_url(s["media_ref"], base=url)
            ch = host_of(child)
            if domain_ok(ch) and rules.allowed(ch, urlsplit(child).path):
                ncand += 1
        rows[url] = (seq, "fetch", "completed", "", len(links), ncand)
    return rows


def test_entity_metrics_equality(engine_run, small_web, small_golden):
    """S5: one scraping_log row per scheduled URL with status/error and
    deterministic link counts (reference sqlmanager.py:266-302)."""
    eng, _ = engine_run
    want = _expected_entity_metrics(small_web, small_golden)
    got_t = eng.entity_metrics_table()
    got = {
        r["entity_id"]: (r["seq"], r["operation"], r["status"],
                         r["error"], r["n_links"], r["n_candidates"])
        for r in got_t.to_pylist()
    }
    assert got_t.num_rows == len(want)  # exactly one row per entity
    assert got == want


def test_crawl_order_sql_oracle(engine_run):
    """The closed-form politeness-clock SQL oracle reproduces the full
    engine crawl order — seq included (crawl_oracle_sql._crawl_order_sql):
    fetch_time = delay * (prior host count + within-host rank), global
    seq = per-round rank over (fetch_time, priority, ok)."""
    import duckdb

    from whakoom_webscrapper_ray.pipelines.crawl_oracle_sql import (
        _crawl_order_sql, fixture_dir,
    )

    eng, _ = engine_run
    got = eng.crawl_order().to_pandas()
    exp = duckdb.sql(_crawl_order_sql(fixture_dir())).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_entity_metrics_log_parity_columns(engine_run):
    """Full scraping_log surface parity: the reference's log rows also
    carry scrapper_name and duration_ms (001_initial_schema.sql:97-106,
    sqlmanager.py:266-302).  scrapper_name is deterministic (title
    pages → the publications spider, profile/list pages → lists);
    duration_ms is wall-clock and only checked for presence/shape."""
    import re

    from whakoom_webscrapper_ray.stages.extract import TITLE_RE

    eng, _ = engine_run
    t = eng.entity_metrics_table()
    assert {"scrapper_name", "duration_ms"} <= set(t.column_names)
    title_re = re.compile(TITLE_RE)
    for r in t.to_pylist():
        want = ("publications" if title_re.match(r["entity_id"])
                else "lists")
        assert r["scrapper_name"] == want
        assert r["duration_ms"] is not None and r["duration_ms"] >= 0


def test_metrics_rollup_equality(engine_run, small_web, small_golden):
    """A4: GROUP BY (operation, status) over the per-entity log."""
    eng, _ = engine_run
    want_rows = _expected_entity_metrics(small_web, small_golden)
    agg: dict[tuple, list] = {}
    for _, op, st, _, nl, nc in want_rows.values():
        a = agg.setdefault((op, st), [0, 0, 0])
        a[0] += 1
        a[1] += nl
        a[2] += nc
    got = {
        (r["operation"], r["status"]): [
            r["n_entities"], r["total_links"], r["total_candidates"]
        ]
        for r in eng.metrics_rollup().to_pylist()
    }
    assert got == agg


def test_kill_resume_conformance(ray_session, small_web, small_golden,
                                 tmp_path_factory):
    """Kill after round 0, resume from checkpoint, finish: final state
    must be byte-equal to the uninterrupted run AND the oracle
    (SURVEY.md §5.2.3; the reference's idempotent re-run story —
    HTTP cache settings.py:132 + upsert queries/lists.sql:1-9 — and the
    north rule's checkpoint/per-partition-lineage claim)."""
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path_factory.mktemp("resume_ckpt"))

    def mk():
        return CrawlEngine(
            small_web["pages"], small_web["seeds"], small_web["robots"],
            checkpoint_dir=ckpt, num_shards=3, fetcher_concurrency=2,
            batch_size=64,
        )

    eng1 = mk()
    eng1.run(max_rounds=1)          # seed + round 0, then "crash"
    assert eng1.next_round == 1
    eng1.shutdown()                  # kill the frontier/seen actors

    eng2 = mk()                      # fresh process analog
    assert eng2.resume() == 1
    eng2.run(seed=False)

    # crawl order byte-equal to the sequential oracle
    got = eng2.crawl_order()
    rows = list(zip(got.column("seq").to_pylist(),
                    got.column("url").to_pylist(),
                    got.column("host").to_pylist(),
                    got.column("round").to_pylist()))
    assert rows == small_golden.crawl_order

    # seen set equal (replayed from crawl_order lineage + new rounds)
    seen = eng2.seen_table()
    pairs = dict(zip(seen.column("url_sha1").to_pylist(),
                     seen.column("canon_url").to_pylist()))
    assert pairs == small_golden.seen

    # fetched docs: per-row span sequences equal (round-0 docs come
    # from the pre-kill checkpoint — no re-fetch — later rounds fresh)
    docs = eng2.docs_dataset().to_pandas()
    got_docs = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for _, r in docs.iterrows()
    }
    want_docs = {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp]
        for d, sp in small_golden.docs_out.items()
    }
    assert got_docs == want_docs

    # finalized tables equal to the oracle
    tables = eng2.finalize_tables()
    got_lists = {r["list_id"]: r for r in tables["lists"].to_pylist()}
    for lid, w in small_golden.lists_out.items():
        g = got_lists[lid]
        assert (g["title"], g["url"], g["user_profile"]) == (
            w["title"], w["url"], w["user_profile"])
    assert len(got_lists) == len(small_golden.lists_out)
    got_j = {(r["list_id"], r["title_id"]): r["position"]
             for r in tables["junction"].to_pylist()}
    assert got_j == small_golden.junction_out

    # per-entity scraping log survives the resume without duplicates
    # (idempotent per-batch partitions, like the docs side-write)
    want_m = _expected_entity_metrics(small_web, small_golden)
    got_m = {
        r["entity_id"]: (r["seq"], r["operation"], r["status"],
                         r["error"], r["n_links"], r["n_candidates"])
        for r in eng2.entity_metrics_table().to_pylist()
    }
    assert got_m == want_m
    assert eng2.entity_metrics_table().num_rows == len(want_m)
    eng2.shutdown()


def test_kill_resume_under_spill(ray_session, small_web, small_golden,
                                 tmp_path_factory):
    """Kill while the NEXT round's backlog sits in spilled runs: the
    checkpoint must snapshot the runs (hard links), and the resumed
    engine must re-link and finish to the exact oracle crawl order and
    seen set — the intersection of the disk-bounded-queue and
    checkpoint/lineage claims."""
    import glob
    import os

    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    ckpt = str(tmp_path_factory.mktemp("spill_resume_ckpt"))

    def mk():
        return CrawlEngine(
            small_web["pages"], small_web["seeds"], small_web["robots"],
            checkpoint_dir=ckpt, num_shards=3, batch_size=64,
            spill_threshold_rows=8,
        )

    eng1 = mk()
    eng1.run(max_rounds=1)           # round-1 backlog spilled, "crash"
    eng1.shutdown()
    # the round-0 checkpoint snapshotted at least one spilled run
    snaps = glob.glob(os.path.join(
        ckpt, "frontier", "round=0", "*.spill", "*"))
    assert snaps, "no spill-run snapshots under the round checkpoint"

    eng2 = mk()
    assert eng2.resume() == 1
    eng2.run(seed=False)
    got = eng2.crawl_order()
    rows = list(zip(got.column("seq").to_pylist(),
                    got.column("url").to_pylist(),
                    got.column("host").to_pylist(),
                    got.column("round").to_pylist()))
    assert rows == small_golden.crawl_order
    seen = eng2.seen_table()
    pairs = dict(zip(seen.column("url_sha1").to_pylist(),
                     seen.column("canon_url").to_pylist()))
    assert pairs == small_golden.seen
    # the resumed run's polls consumed re-links, not the checkpoint
    assert sorted(glob.glob(os.path.join(
        ckpt, "frontier", "round=0", "*.spill", "*"))) == sorted(snaps)
    eng2.shutdown()


def test_max_pages_budget_conformance(ray_session, small_web,
                                      tmp_path_factory):
    """O4 per-host pagination budget (the reference's "Load more" loop
    bound, publications.py:74-89): with ``max_pages_per_host`` set, the
    engine's crawl order equals the budgeted oracle's, across shard
    counts, and no host exceeds its budget.  Also exercises the
    budget's checkpoint/resume path (pages_sched counters restored)."""
    from collections import Counter

    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    budget = 7
    golden = run_oracle(small_web["pages"], small_web["seeds"],
                        small_web["robots"], max_pages_per_host=budget)
    full = run_oracle(small_web["pages"], small_web["seeds"],
                      small_web["robots"])
    # the budget must actually bind on this fixture
    assert len(golden.crawl_order) < len(full.crawl_order)
    per_host = Counter(h for _, _, h, _ in golden.crawl_order)
    assert max(per_host.values()) <= budget

    def order_rows(eng):
        got = eng.crawl_order()
        return list(zip(got.column("seq").to_pylist(),
                        got.column("url").to_pylist(),
                        got.column("host").to_pylist(),
                        got.column("round").to_pylist()))

    for shards in (1, 3):
        ckpt = str(tmp_path_factory.mktemp(f"budget_ckpt{shards}"))
        eng = CrawlEngine(
            small_web["pages"], small_web["seeds"], small_web["robots"],
            checkpoint_dir=ckpt, num_shards=shards, fetcher_concurrency=2,
            batch_size=64, max_pages_per_host=budget,
        )
        eng.run()
        assert order_rows(eng) == golden.crawl_order
        eng.shutdown()

    # kill after round 0 → resume: budget counters restore from the
    # frontier checkpoint, so the completed crawl is still byte-equal
    ckpt = str(tmp_path_factory.mktemp("budget_resume"))

    def mk():
        return CrawlEngine(
            small_web["pages"], small_web["seeds"], small_web["robots"],
            checkpoint_dir=ckpt, num_shards=3, fetcher_concurrency=2,
            batch_size=64, max_pages_per_host=budget,
        )

    eng1 = mk()
    eng1.run(max_rounds=1)
    eng1.shutdown()
    eng2 = mk()
    assert eng2.resume() == 1
    eng2.run(seed=False)
    assert order_rows(eng2) == golden.crawl_order
    eng2.shutdown()


def test_write_tables_overwrite_and_upsert_rerun(engine_run,
                                                 tmp_path_factory):
    """S4 sink end-to-end: the streamed ``write_tables`` export equals
    ``finalize_tables()`` table-for-table, and upserting the same run
    into an existing export twice converges to identical content —
    the reference's idempotent ``INSERT ... ON CONFLICT DO UPDATE``
    re-run story (queries/lists.sql:1-9, settings.py:132)."""
    import pandas as pd
    import pyarrow.dataset as pds

    eng, _ = engine_run
    want = getattr(eng, "_finalized", None) or eng.finalize_tables()

    def canon(tbl: pa.Table) -> pd.DataFrame:
        df = tbl.to_pandas()[sorted(tbl.column_names)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    out_ow = str(tmp_path_factory.mktemp("export_ow"))
    paths = eng.write_tables(out_ow)
    assert set(paths) == set(want)
    for name, golden in want.items():
        got = pds.dataset(paths[name], format="parquet").to_table()
        assert got.num_rows == golden.num_rows, name
        pd.testing.assert_frame_equal(canon(got), canon(golden),
                                      check_dtype=False, obj=name)

    out_up = str(tmp_path_factory.mktemp("export_up"))
    for _rerun in range(2):  # second pass = re-run over existing table
        paths = eng.write_tables(out_up, mode="upsert")
    for name, golden in want.items():
        got = pds.dataset(paths[name], format="parquet").to_table()
        assert got.num_rows == golden.num_rows, name
        pd.testing.assert_frame_equal(canon(got), canon(golden),
                                      check_dtype=False, obj=name)


# ----------------------------------------------------------- S3 states
def test_page_state_pagination_conformance(ray_session, small_web,
                                           small_golden,
                                           tmp_path_factory):
    """S3 dynamic "Load more" pagination end-to-end: the stateful page
    store (cumulative span prefixes per state, both reference stop
    conditions — button absent AND click-loads-nothing) must produce
    the IDENTICAL crawl to the stateless store: same crawl order, same
    span sequences, and the oracle's own click-loop agrees."""
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import paginate_pages

    staged = paginate_pages(small_web["pages"])
    assert staged.num_rows > small_web["pages"].num_rows  # real states

    golden = run_oracle(staged, small_web["seeds"], small_web["robots"])
    # sequential click-loop reaches exactly the stateless content
    assert golden.docs_out == small_golden.docs_out
    assert golden.crawl_order == small_golden.crawl_order

    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt_s3"))
    eng = CrawlEngine(
        staged, small_web["seeds"], small_web["robots"],
        checkpoint_dir=ckpt, num_shards=3, fetcher_concurrency=2,
        batch_size=64,
    )
    eng.run()
    got_order = list(zip(
        eng.crawl_order().column("seq").to_pylist(),
        eng.crawl_order().column("url").to_pylist(),
        eng.crawl_order().column("host").to_pylist(),
        eng.crawl_order().column("round").to_pylist(),
    ))
    assert got_order == golden.crawl_order
    docs = eng.docs_dataset().to_pandas()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for _, r in docs.iterrows()
    }
    want = {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sp]
        for d, sp in golden.docs_out.items()
    }
    assert got == want


def test_resolve_page_states_walk():
    """Unit semantics of the state walk: cumulative growth advances,
    equal-length next state stops (click loaded nothing), absence
    stops (button gone), and n_clicks counts successful clicks."""
    import pyarrow as pa

    from whakoom_webscrapper_ray.sources.synth import PAGES_SCHEMA
    from whakoom_webscrapper_ray.stages.fetch import resolve_page_states

    def sp(n):
        return [{"kind": "text", "text": f"t{i}", "media_ref": "",
                 "offset": i} for i in range(n)]

    t = pa.table({
        "doc_id": pa.array(
            ["a", "a", "a", "b", "b", "b", "c"], pa.string()
        ),
        "state": pa.array([0, 1, 2, 0, 1, 2, 0], pa.int64()),
        "spans": pa.array(
            # a: grows then the extra click loads nothing (len repeats)
            # b: grows to absence;  c: static
            [sp(2), sp(4), sp(4), sp(2), sp(4), sp(6), sp(3)],
            PAGES_SCHEMA.field("spans").type,
        ),
    })
    r = resolve_page_states(t)
    got = {
        d: (len(s), n) for d, s, n in zip(
            r["doc_id"].to_pylist(), r["spans"].to_pylist(),
            r["n_clicks"].to_pylist(),
        )
    }
    assert got == {"a": (4, 1), "b": (6, 2), "c": (3, 0)}


def test_robots_allow_wildcard_semantics():
    """Allow overrides Disallow by longest match; * and $ wildcards;
    tie goes to Allow; unmatched URLs pass (RFC 9309 semantics the
    reference obeys via ROBOTSTXT_OBEY)."""
    import pyarrow as pa

    from whakoom_webscrapper_ray.functions.robots import RobotsRules

    r = RobotsRules(
        hosts=["a.example", "b.example"],
        delays=[0.0, 0.0],
        disallow=[["/comics/", "/tmp*"], ["/user*/settings$"]],
        allow=[["/comics/*0$", "/tmp/keep"], []],
    )
    # longest-match allow override
    assert not r.allowed("a.example", "/comics/x_123")
    assert r.allowed("a.example", "/comics/x_120")
    # wildcard disallow, allow carve-out by longer pattern
    assert not r.allowed("a.example", "/tmpanything")
    assert r.allowed("a.example", "/tmp/keeper")
    # anchored wildcard
    assert not r.allowed("b.example", "/user7_0/settings")
    assert r.allowed("b.example", "/user7_0/settings/page")
    # no rules host
    assert r.allowed("c.example", "/anything")

    # vectorized path agrees with the scalar path
    hosts = pa.array(["a.example"] * 4 + ["b.example"] * 2 + ["c.example"])
    urls = pa.array([
        "https://a.example/comics/x_123",
        "https://a.example/comics/x_120",
        "https://a.example/tmpanything",
        "https://a.example/tmp/keeper",
        "https://b.example/user7_0/settings",
        "https://b.example/user7_0/settings/page",
        "https://c.example/anything",
    ])
    got = r.allowed_mask_arrow(hosts, urls).tolist()
    assert got == [False, True, False, True, False, True, True]
