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
    "seed,num_shards,dup_frac,offsite_frac,spill_rows",
    [
        (43, 2, 0.10, 0.05, None),
        (43, 5, 0.10, 0.05, None),   # same web, different sharding
        (44, 3, 0.20, 0.10, None),
        # hostile links × streaming spill merge × sharding: a tiny
        # threshold forces every round's backlog through the ok-sorted
        # spill runs and the min-ok merge
        (44, 3, 0.20, 0.10, 8),
    ],
)
def test_hostile_web_conformance(
    ray_session, tmp_path, seed, num_shards, dup_frac, offsite_frac,
    spill_rows,
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
