"""Cuckoo filter unit tests: insert/contains, batch probe, FP bound."""

from __future__ import annotations

import hashlib

import numpy as np

from whakoom_webscrapper_ray.state.cuckoo import CuckooFilter


def _keys(n: int, tag: str = "k") -> list[bytes]:
    return [hashlib.sha1(f"{tag}{i}".encode()).digest() for i in range(n)]


def test_insert_contains():
    f = CuckooFilter(capacity=10_000)
    keys = _keys(5000)
    for k in keys:
        assert f.insert(k)
    for k in keys:
        assert f.contains(k)
    assert f.contains_batch(keys).all()


def test_no_false_negatives_at_high_load():
    f = CuckooFilter(capacity=20_000)
    keys = _keys(18_000)
    ok = sum(f.insert(k) for k in keys)
    assert ok == len(keys)  # capacity sized for 95% load
    assert f.contains_batch(keys).all()


def test_false_positive_rate_bound():
    f = CuckooFilter(capacity=50_000)
    for k in _keys(40_000, "in"):
        f.insert(k)
    probes = _keys(50_000, "out")
    fp = int(f.contains_batch(probes).sum())
    # 16-bit fingerprints, 2 buckets × 4 slots → ~8/2^16 ≈ 0.012%
    assert fp / len(probes) < 0.005


def test_batch_matches_scalar():
    f = CuckooFilter(capacity=1000)
    ins = _keys(500, "a")
    for k in ins:
        f.insert(k)
    others = _keys(500, "b")
    batch = f.contains_batch(ins + others)
    scalar = np.array([f.contains(k) for k in ins + others])
    assert (batch == scalar).all()


# ----------------------------------------------------- bloom variant
def _void20(keys: list[bytes]) -> np.ndarray:
    from whakoom_webscrapper_ray.state.seen import as_void20

    return as_void20(keys)


def test_bloom_no_false_negatives():
    from whakoom_webscrapper_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=20_000)
    kv = _void20(_keys(18_000))
    f.insert_void(kv)
    assert f.contains_void(kv).all()


def test_bloom_false_positive_rate_bound():
    """At 90% of key capacity the measured FP rate stays under 0.1%
    (design point m/n=16, k=8 -> ~5e-4)."""
    from whakoom_webscrapper_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=50_000)
    f.insert_void(_void20(_keys(45_000)))
    probe = _void20(_keys(50_000, tag="absent"))
    fp = int(f.contains_void(probe).sum())
    assert fp / len(probe) < 1e-3, fp


def test_bloom_empty_and_incremental():
    from whakoom_webscrapper_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=1000)
    assert f.contains_void(_void20(_keys(10))).sum() == 0
    a = _void20(_keys(500, tag="a"))
    b = _void20(_keys(500, tag="b"))
    f.insert_void(a)
    assert f.contains_void(a).all()
    f.insert_void(b)
    assert f.contains_void(a).all() and f.contains_void(b).all()


def test_seencore_bloom_matches_cuckoo_exactly():
    """SeenCore is exact regardless of the fast-path filter: identical
    new/seen verdicts, counts and snapshots under either kind,
    including duplicate keys within one call and filter growth."""
    from whakoom_webscrapper_ray.state.seen import SeenCore

    rng = np.random.default_rng(7)
    batches = []
    pool = _keys(4000, tag="p")
    for _ in range(6):
        idx = rng.integers(0, len(pool), size=1500)
        batches.append([pool[i] for i in idx])

    cores = {k: SeenCore(capacity=256, filter_kind=k)
             for k in ("cuckoo", "bloom")}
    for batch in batches:
        outs = {k: c.contains_and_add(batch) for k, c in cores.items()}
        assert (outs["cuckoo"] == outs["bloom"]).all()
    assert cores["cuckoo"].count == cores["bloom"].count
    ka, _ = cores["cuckoo"].snapshot_columns()
    kb, _ = cores["bloom"].snapshot_columns()
    assert np.array_equal(np.sort(ka), np.sort(kb))


def test_crawl_identical_under_bloom_filter(ray_session, small_web,
                                            tmp_path):
    """The full SMALL crawl produces a byte-identical crawl order with
    the Bloom seen filter (exact backing makes the filter choice a
    performance knob, never a semantics one)."""
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    runs = {}
    for kind in ("cuckoo", "bloom"):
        eng = CrawlEngine(
            small_web["pages"], small_web["seeds"], small_web["robots"],
            checkpoint_dir=str(tmp_path / kind), num_shards=4,
            seen_filter=kind,
        )
        eng.run()
        runs[kind] = eng.crawl_order()
        eng.shutdown()
    assert runs["cuckoo"].equals(runs["bloom"])
