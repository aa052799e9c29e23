"""Engine-vs-oracle conformance on randomized webs with HOSTILE links.

The fixed fixtures only emit well-formed hrefs (ADVICE r1 observation);
real pages carry mailto:/javascript: links, out-of-range ports,
userinfo, scheme-relative ``//host/path`` refs, uppercase scheme/host
duplicates, and dot-segment relative paths.  Every one of those must
flow through the full distributed pipeline (extract → canonicalize →
offsite/robots → dedup → schedule) producing EXACTLY the sequential
oracle's crawl order and seen set — never a crashed round.

Also re-proves shard-count invariance under hostile input (the salted
routing and the canonicalizer host parity are both load-bearing here).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from whakoom_webscrapper_ray.schemas import PAGES_SCHEMA

# One of each hostility class (see tests/test_canonicalize.py fuzz for
# the column-level equivalence these rely on).
HOSTILE_REFS = [
    "mailto:someone@host0.example",
    "javascript:void(0)",
    "tel:+15551234567",
    "http://host1.example:65536/boom",          # out-of-range port
    "//host2.example/user2_0/lists",            # scheme-relative, REAL page
    "http://u:p@host3.example:8080/comics/x_1",  # userinfo + port
    "HTTP://HOST0.EXAMPLE/user0_0/lists",       # case-fold + scheme swap
    "/a/../user5_0/lists",                      # dot-segment relative
    "http://host0.example/%7euser/../user0_0/lists",  # pct + dot-segment
]


def _inject_hostile(pages: pa.Table) -> pa.Table:
    """Append hostile link spans to every 7th page, offsets continuing
    document order (deterministic: pure function of the input web)."""
    ids = pages.column("doc_id").to_pylist()
    spans = pages.column("spans").to_pylist()
    k = 0
    for i in range(0, len(ids), 7):
        sp = spans[i]
        off = (sp[-1]["offset"] + 1) if sp else 0
        for _ in range(2):
            sp.append(
                {
                    "kind": "link",
                    "text": "hostile",
                    "media_ref": HOSTILE_REFS[k % len(HOSTILE_REFS)],
                    "offset": off,
                }
            )
            k += 1
            off += 1
    return pa.table({"doc_id": ids, "spans": spans}, schema=PAGES_SCHEMA)


@pytest.mark.parametrize(
    "seed,num_shards,dup_frac,offsite_frac,spill_rows,seen_filter",
    [
        (43, 2, 0.10, 0.05, None, "cuckoo"),
        (43, 5, 0.10, 0.05, None, "cuckoo"),  # same web, new sharding
        (44, 3, 0.20, 0.10, None, "cuckoo"),
        # hostile links × streaming spill merge × sharding: a tiny
        # threshold forces every round's backlog through the ok-sorted
        # spill runs and the min-ok merge
        (44, 3, 0.20, 0.10, 8, "cuckoo"),
        # Bloom seen fast path under hostile duplicate pressure: the
        # exact backing must keep the schedule oracle-identical
        (45, 4, 0.20, 0.10, None, "bloom"),
        # ... and combined with the streaming spill merge
        (45, 3, 0.20, 0.10, 8, "bloom"),
    ],
)
def test_hostile_web_conformance(
    ray_session, tmp_path, seed, num_shards, dup_frac, offsite_frac,
    spill_rows, seen_filter,
):
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web,
    )

    web = generate_web(
        SynthConfig(
            seed=seed, dup_link_frac=dup_frac, offsite_frac=offsite_frac
        )
    )
    pages = _inject_hostile(web["pages"])

    golden = run_oracle(pages, web["seeds"], web["robots"])

    eng = CrawlEngine(
        pages,
        web["seeds"],
        web["robots"],
        checkpoint_dir=str(tmp_path / f"ckpt_{seed}_{num_shards}"),
        num_shards=num_shards,
        fetcher_concurrency=2,
        batch_size=64,
        seen_filter=seen_filter,
        **({"spill_threshold_rows": spill_rows} if spill_rows else {}),
    )
    try:
        eng.run()
        if spill_rows:
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
        assert rows == golden.crawl_order

        seen = eng.seen_table()
        pairs = dict(
            zip(
                seen.column("url_sha1").to_pylist(),
                seen.column("canon_url").to_pylist(),
            )
        )
        assert pairs == golden.seen
    finally:
        eng.shutdown()


# ------------------------------------------- randomized robots rules
@pytest.mark.parametrize("seed,num_shards", [(47, 3), (48, 4)])
def test_random_robots_rules_conformance(ray_session, tmp_path, seed,
                                         num_shards):
    """Randomized Allow/Disallow rule sets with */$ wildcards: the
    distributed engine (vectorized Arrow robots gate) must reproduce
    the sequential oracle's crawl order and seen set exactly under
    rule interactions the fixed fixture never hits — overlapping
    prefixes, Allow shadowing, anchored wildcards, whole-host
    disallow."""
    import numpy as np

    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.schemas import ROBOTS_SCHEMA
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web,
    )

    web = generate_web(SynthConfig(seed=seed))
    rng = np.random.Generator(np.random.PCG64(seed * 7 + 1))
    pool_dis = [
        "/comics/", "/comics/*1$", "/user*/lists", "/*lists*",
        "/user*/settings$", "/", "/comics/*_2*",
    ]
    pool_alw = [
        "/comics/*0$", "/user*/lists", "/comics/", "/*_20*",
        "/user*/lists/*", "/*",
    ]
    hosts = web["robots"].column("host").to_pylist()
    delays = web["robots"].column("crawl_delay").to_pylist()
    dis, alw = [], []
    for _ in hosts:
        nd, na = int(rng.integers(0, 3)), int(rng.integers(0, 3))
        dis.append(list(rng.choice(pool_dis, size=nd, replace=False)))
        alw.append(list(rng.choice(pool_alw, size=na, replace=False)))
    robots = pa.Table.from_pydict(
        {"host": hosts, "crawl_delay": delays, "disallow": dis,
         "allow": alw},
        schema=ROBOTS_SCHEMA,
    )

    golden = run_oracle(web["pages"], web["seeds"], robots)
    assert golden.crawl_order  # at least the surviving seeds ran
    eng = CrawlEngine(
        web["pages"], web["seeds"], robots,
        checkpoint_dir=str(tmp_path / f"ckpt_rob_{seed}"),
        num_shards=num_shards, fetcher_concurrency=2, batch_size=64,
    )
    try:
        eng.run()
        got = eng.crawl_order()
        rows = list(zip(
            got.column("seq").to_pylist(),
            got.column("url").to_pylist(),
            got.column("host").to_pylist(),
            got.column("round").to_pylist(),
        ))
        assert rows == golden.crawl_order
        seen = dict(zip(
            eng.seen_table().column("url_sha1").to_pylist(),
            eng.seen_table().column("canon_url").to_pylist(),
        ))
        assert seen == golden.seen
    finally:
        eng.shutdown()


@pytest.mark.parametrize("seed,chunk,every,trep",
                         [(49, 3, 2, 2), (50, 5, 1, 1)])
def test_random_page_states_conformance(ray_session, tmp_path, seed,
                                        chunk, every, trep):
    """Randomized "Load more" state layouts (chunk size, which pages
    paginate, which get the terminal-repeat stop) must leave the crawl
    bit-identical to the stateless store — engine and sequential
    oracle both."""
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web, paginate_pages,
    )

    web = generate_web(SynthConfig(seed=seed))
    staged = paginate_pages(
        web["pages"], chunk=chunk, every=every,
        terminal_repeat_every=trep,
    )
    assert staged.num_rows > web["pages"].num_rows
    base = run_oracle(web["pages"], web["seeds"], web["robots"])
    golden = run_oracle(staged, web["seeds"], web["robots"])
    assert golden.crawl_order == base.crawl_order
    assert golden.docs_out == base.docs_out

    eng = CrawlEngine(
        staged, web["seeds"], web["robots"],
        checkpoint_dir=str(tmp_path / f"ckpt_ps_{seed}"),
        num_shards=3, fetcher_concurrency=2, batch_size=64,
    )
    try:
        eng.run()
        got = eng.crawl_order()
        rows = list(zip(
            got.column("seq").to_pylist(),
            got.column("url").to_pylist(),
            got.column("host").to_pylist(),
            got.column("round").to_pylist(),
        ))
        assert rows == golden.crawl_order
    finally:
        eng.shutdown()


def _inject_tracking(pages: pa.Table) -> pa.Table:
    """Decorate every 5th page's link spans with utm/gclid noise
    (deterministic pure function), so strip mode must collapse them
    back onto the clean URLs."""
    ids = pages.column("doc_id").to_pylist()
    spans = pages.column("spans").to_pylist()
    noise = ["?utm_source=mail&utm_medium=cpc", "?gclid=99",
             "?utm_campaign=x&id=1"]
    k = 0
    for i in range(0, len(ids), 5):
        for sp in spans[i]:
            if sp["kind"] == "link" and "?" not in sp["media_ref"]:
                sp["media_ref"] = sp["media_ref"] + noise[k % len(noise)]
                k += 1
    return pa.table({"doc_id": ids, "spans": spans}, schema=PAGES_SCHEMA)


@pytest.mark.parametrize("seed,num_shards", [(46, 3), (47, 5)])
def test_strip_tracking_fuzz_conformance(ray_session, tmp_path, seed,
                                         num_shards):
    """Engine with --strip-tracking-params equals the sequential
    oracle in the same mode on webs whose links carry utm/gclid noise
    (the decorated and clean forms must collapse to ONE schedule)."""
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web,
    )

    web = generate_web(SynthConfig(seed=seed, dup_link_frac=0.1))
    pages = _inject_tracking(web["pages"])
    golden = run_oracle(pages, web["seeds"], web["robots"],
                        strip_tracking=True)
    eng = CrawlEngine(
        pages, web["seeds"], web["robots"],
        checkpoint_dir=str(tmp_path / f"st_{seed}"),
        num_shards=num_shards, fetcher_concurrency=2, batch_size=64,
        strip_tracking_params=True,
    )
    try:
        eng.run()
        got = eng.crawl_order()
        rows = list(zip(got.column("seq").to_pylist(),
                        got.column("url").to_pylist(),
                        got.column("host").to_pylist(),
                        got.column("round").to_pylist()))
        assert rows == golden.crawl_order
        assert not any("utm" in u or "gclid" in u
                       for _, u, _, _ in rows)
        seen = dict(zip(eng.seen_table()["url_sha1"].to_pylist(),
                        eng.seen_table()["canon_url"].to_pylist()))
        assert seen == golden.seen
        # the finalize path must strip too: titles URLs match the
        # oracle's stripped canon forms exactly
        titles = eng.finalize_tables()["titles"]
        got_urls = dict(zip(titles["title_id"].to_pylist(),
                            titles["url"].to_pylist()))
        want_urls = {tid: row["url"]
                     for tid, row in golden.titles_out.items()}
        assert got_urls == want_urls
        assert not any("utm" in u or "gclid" in u
                       for u in got_urls.values())
    finally:
        eng.shutdown()


@pytest.mark.parametrize("seed,num_shards,budget",
                         [(48, 3, 2), (49, 4, 5)])
def test_breaker_fuzz_conformance(ray_session, tmp_path, seed,
                                  num_shards, budget):
    """Engine with a host failure budget equals the sequential oracle
    in the same mode on hostile webs with missing pages: quarantine
    verdicts apply from the next round, identically."""
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web,
    )

    web = generate_web(
        SynthConfig(seed=seed, dup_link_frac=0.15, offsite_frac=0.05))
    pages = _inject_hostile(web["pages"])
    golden = run_oracle(pages, web["seeds"], web["robots"],
                        host_fail_budget=budget)
    eng = CrawlEngine(
        pages, web["seeds"], web["robots"],
        checkpoint_dir=str(tmp_path / f"bk_{seed}"),
        num_shards=num_shards, fetcher_concurrency=2, batch_size=64,
        host_fail_budget=budget,
    )
    try:
        eng.run()
        got = eng.crawl_order()
        rows = list(zip(got.column("seq").to_pylist(),
                        got.column("url").to_pylist(),
                        got.column("host").to_pylist(),
                        got.column("round").to_pylist()))
        assert rows == golden.crawl_order
    finally:
        eng.shutdown()


def test_combined_modes_fuzz_conformance(ray_session, tmp_path):
    """Both opt-in modes at once (tracking strip + breaker) still
    match the sequential oracle — the modes must not interact."""
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web,
    )

    web = generate_web(SynthConfig(seed=50, dup_link_frac=0.15))
    pages = _inject_tracking(_inject_hostile(web["pages"]))
    golden = run_oracle(pages, web["seeds"], web["robots"],
                        strip_tracking=True, host_fail_budget=3)
    eng = CrawlEngine(
        pages, web["seeds"], web["robots"],
        checkpoint_dir=str(tmp_path / "combo"),
        num_shards=3, fetcher_concurrency=2, batch_size=64,
        strip_tracking_params=True, host_fail_budget=3,
    )
    try:
        eng.run()
        got = eng.crawl_order()
        rows = list(zip(got.column("seq").to_pylist(),
                        got.column("url").to_pylist(),
                        got.column("host").to_pylist(),
                        got.column("round").to_pylist()))
        assert rows == golden.crawl_order
    finally:
        eng.shutdown()


@pytest.mark.parametrize("seed,budget,num_shards",
                         [(51, 1, 2), (52, 3, 3), (53, 8, 5)])
def test_breaker_budget_sweep_conformance(ray_session, tmp_path, seed,
                                          budget, num_shards):
    """Budget sweep: the tightest budget (1) quarantines on first
    failure, mid budgets trip mid-crawl, loose budgets may never trip —
    engine == oracle at every point of the dial."""
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web,
    )

    web = generate_web(
        SynthConfig(seed=seed, dup_link_frac=0.2, offsite_frac=0.1))
    pages = _inject_hostile(web["pages"])
    golden = run_oracle(pages, web["seeds"], web["robots"],
                        host_fail_budget=budget)
    eng = CrawlEngine(
        pages, web["seeds"], web["robots"],
        checkpoint_dir=str(tmp_path / f"bs_{seed}_{budget}"),
        num_shards=num_shards, fetcher_concurrency=2, batch_size=64,
        host_fail_budget=budget,
    )
    try:
        eng.run()
        got = eng.crawl_order()
        rows = list(zip(got.column("seq").to_pylist(),
                        got.column("url").to_pylist(),
                        got.column("host").to_pylist(),
                        got.column("round").to_pylist()))
        assert rows == golden.crawl_order
    finally:
        eng.shutdown()


def test_breaker_with_pagination_budget_conformance(ray_session,
                                                    tmp_path):
    """Breaker + O4 pagination budget together: quarantine filters
    before the per-host budget is charged, identically in engine and
    oracle."""
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.sources.synth import (
        SynthConfig, generate_web,
    )

    web = generate_web(SynthConfig(seed=54, dup_link_frac=0.2))
    pages = _inject_hostile(web["pages"])
    golden = run_oracle(pages, web["seeds"], web["robots"],
                        max_pages_per_host=9, host_fail_budget=2)
    eng = CrawlEngine(
        pages, web["seeds"], web["robots"],
        checkpoint_dir=str(tmp_path / "bb"),
        num_shards=3, fetcher_concurrency=2, batch_size=64,
        max_pages_per_host=9, host_fail_budget=2,
    )
    try:
        eng.run()
        got = eng.crawl_order()
        rows = list(zip(got.column("seq").to_pylist(),
                        got.column("url").to_pylist(),
                        got.column("host").to_pylist(),
                        got.column("round").to_pylist()))
        assert rows == golden.crawl_order
    finally:
        eng.shutdown()
