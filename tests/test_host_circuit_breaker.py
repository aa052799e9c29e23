"""Host circuit breaker (opt-in): after ``host_fail_budget`` failed
fetches, a host's pending candidates are dropped at poll time.
Feedback is applied synchronously between rounds (driver aggregates
the route summaries and ray.gets the shard updates), so quarantine
decisions are deterministic."""

from __future__ import annotations

import pyarrow as pa

from whakoom_webscrapper_ray.schemas import (
    PAGES_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA,
)


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def _web():
    """good.com seed links 4 dead bad.com pages + 2 live good pages;
    each live good page links 2 MORE dead bad.com pages (discovered
    only in round 2)."""
    link = _span
    pages = {
        "http://good.com/seed": (
            [link("link", "", f"http://bad.com/d{i}", i) for i in range(4)]
            + [link("link", "", "http://good.com/a", 4),
               link("link", "", "http://good.com/b", 5)]),
        "http://good.com/a": [
            link("link", "", "http://bad.com/late1", 0),
            link("link", "", "http://bad.com/late2", 1)],
        "http://good.com/b": [
            link("link", "", "http://bad.com/late3", 0),
            link("text", "payload", "", 0)],
    }
    pages_t = pa.table({
        "doc_id": pa.array(list(pages)),
        "spans": pa.array(list(pages.values()),
                          PAGES_SCHEMA.field("spans").type),
    }).cast(PAGES_SCHEMA)
    # bad.com must be a seed host to pass the offsite filter; its
    # seed page itself is dead (failure #1)
    seeds = pa.table({
        "seed_index": pa.array([0, 1], pa.int64()),
        "url": pa.array(["http://good.com/seed", "http://bad.com/seed"]),
        "priority": pa.array([0, 0], pa.int32()),
    }).cast(SEEDS_SCHEMA)
    robots = pa.table({
        "host": pa.array(["good.com", "bad.com"]),
        "crawl_delay": pa.array([0.0, 0.0], pa.float64()),
        "disallow": pa.array([[], []], pa.list_(pa.string())),
        "allow": pa.array([[], []], pa.list_(pa.string())),
    }).cast(ROBOTS_SCHEMA)
    return pages_t, seeds, robots


import pytest


@pytest.mark.parametrize("num_shards", [1, 2, 4])
def test_breaker_quarantines_failing_host(ray_session, tmp_path,
                                          num_shards):
    """Quarantine is a function of round boundaries, not sharding:
    identical verdicts at every shard count."""
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    pages, seeds, robots = _web()
    eng = CrawlEngine(pages, seeds, robots,
                      checkpoint_dir=str(tmp_path / "br"),
                      num_shards=num_shards, host_fail_budget=3)
    res = eng.run()
    urls = eng.crawl_order()["url"].to_pylist()
    # round 1 schedules the 4 dead bad.com pages (failures land AFTER
    # scheduling) — but the late bad.com links discovered in round 2
    # must be dropped: budget 3 < 4 round-1 failures.
    assert sum(u.startswith("http://bad.com/d") for u in urls) == 4
    assert not any("late" in u for u in urls)
    assert {"http://good.com/a", "http://good.com/b"} <= set(urls)
    qs = eng.frontier.quarantine_stats()
    assert sorted(sum((q["quarantined_hosts"] for q in qs), [])) \
        == ["bad.com"]
    assert sum(q["skipped"] for q in qs) == 3
    assert sum(st["missing"] for st in res["stats"]) == 5
    eng.shutdown()


def test_breaker_off_keeps_scheduling(ray_session, tmp_path):
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    pages, seeds, robots = _web()
    eng = CrawlEngine(pages, seeds, robots,
                      checkpoint_dir=str(tmp_path / "off"),
                      num_shards=2)
    eng.run()
    urls = eng.crawl_order()["url"].to_pylist()
    assert sum("late" in u for u in urls) == 3  # no quarantine
    eng.shutdown()


def test_breaker_state_survives_resume(ray_session, tmp_path):
    """Quarantine verdicts are checkpointed: a crawl interrupted right
    after the breaker trips resumes to the same crawl order as the
    uninterrupted run (the late bad.com links stay dropped)."""
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    pages, seeds, robots = _web()
    full = CrawlEngine(pages, seeds, robots,
                       checkpoint_dir=str(tmp_path / "full"),
                       num_shards=2, host_fail_budget=3)
    full.run()
    want = full.crawl_order()
    full.shutdown()

    part = CrawlEngine(pages, seeds, robots,
                       checkpoint_dir=str(tmp_path / "part"),
                       num_shards=2, host_fail_budget=3)
    part.run(max_rounds=2)   # breaker trips during round 2's feedback
    part.shutdown()
    resumed = CrawlEngine(pages, seeds, robots,
                          checkpoint_dir=str(tmp_path / "part"),
                          num_shards=2, host_fail_budget=3)
    resumed.resume()
    resumed.run(seed=False)
    got = resumed.crawl_order()
    assert got.equals(want)
    qs = resumed.frontier.quarantine_stats()
    assert sorted(sum((q["quarantined_hosts"] for q in qs), [])) \
        == ["bad.com"]
    resumed.shutdown()
