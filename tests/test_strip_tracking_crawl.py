"""End-to-end tracking-param stripping: two hrefs that differ only by
utm/gclid noise collapse to ONE canonical URL (one schedule, one
fetch) when --strip-tracking-params is on, and stay distinct (the
noisy one 404s against the page store) when off."""

from __future__ import annotations

import pyarrow as pa

from whakoom_webscrapper_ray.schemas import (
    PAGES_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA,
)


def _web():
    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    pages = pa.table({
        "doc_id": pa.array(["http://t.com/seed", "http://t.com/x"]),
        "spans": pa.array([
            [span("link", "clean", "http://t.com/x", 0),
             span("link", "noisy",
                  "http://t.com/x?utm_source=mail&utm_medium=cpc", 1),
             span("link", "noisy2", "http://t.com/x?gclid=9", 2)],
            [span("text", "payload", "", 0)],
        ], PAGES_SCHEMA.field("spans").type),
    }).cast(PAGES_SCHEMA)
    seeds = pa.table({
        "seed_index": pa.array([0], pa.int64()),
        "url": pa.array(["http://t.com/seed"]),
        "priority": pa.array([0], pa.int32()),
    }).cast(SEEDS_SCHEMA)
    robots = pa.table({
        "host": pa.array(["t.com"]),
        "crawl_delay": pa.array([0.0], pa.float64()),
        "disallow": pa.array([[]], pa.list_(pa.string())),
        "allow": pa.array([[]], pa.list_(pa.string())),
    }).cast(ROBOTS_SCHEMA)
    return pages, seeds, robots


def test_strip_tracking_collapses_link_variants(ray_session, tmp_path):
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    pages, seeds, robots = _web()

    on = CrawlEngine(pages, seeds, robots,
                     checkpoint_dir=str(tmp_path / "on"),
                     num_shards=2, strip_tracking_params=True)
    r_on = on.run()
    urls_on = on.crawl_order()["url"].to_pylist()
    assert sorted(urls_on) == ["http://t.com/seed", "http://t.com/x"]
    assert sum(st["missing"] for st in r_on["stats"]) == 0
    on.shutdown()

    off = CrawlEngine(pages, seeds, robots,
                      checkpoint_dir=str(tmp_path / "off"),
                      num_shards=2)
    r_off = off.run()
    urls_off = set(off.crawl_order()["url"].to_pylist())
    # RFC-only canonicalization keeps the utm variants distinct; they
    # miss against the page store (the honest no-strip behavior)
    assert len(urls_off) == 4
    assert sum(st["missing"] for st in r_off["stats"]) == 2
    off.shutdown()


def test_strip_mode_resume_equivalence(ray_session, tmp_path):
    """A strip-mode crawl interrupted at round 1 resumes to the same
    crawl order as the uninterrupted strip-mode run (canonical forms
    in the checkpoint are already stripped, so resume must not
    re-canonicalize differently)."""
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    pages, seeds, robots = _web()
    full = CrawlEngine(pages, seeds, robots,
                       checkpoint_dir=str(tmp_path / "full"),
                       num_shards=2, strip_tracking_params=True)
    full.run()
    want = full.crawl_order()
    full.shutdown()

    part = CrawlEngine(pages, seeds, robots,
                       checkpoint_dir=str(tmp_path / "part"),
                       num_shards=2, strip_tracking_params=True)
    part.run(max_rounds=1)
    part.shutdown()
    resumed = CrawlEngine(pages, seeds, robots,
                          checkpoint_dir=str(tmp_path / "part"),
                          num_shards=2, strip_tracking_params=True)
    resumed.resume()
    resumed.run(seed=False)
    assert resumed.crawl_order().equals(want)
    resumed.shutdown()
