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
