"""Shim-gated LanceBackend coverage (r4 verdict item 6).

The sandbox has no ``lance`` wheel, so the import-gated LanceBackend
branch would otherwise never execute.  These tests inject
``tests/fake_lance.py`` as ``sys.modules["lance"]`` and run the seam
calls that map 1:1 onto the public lance API — fragment round-trip,
streamed iteration, snapshot link, LWW ``merge_insert`` upsert
(single + composite key, idempotent re-run), point lookup, compaction
and version pinning — mirroring the ParquetBackend contracts in
test_storage.py.  ``read_dataset`` / ``write_dataset`` delegate to
``ray.data.read_lance`` / ``ds.write_lance`` (Ray's own tested
surface, needs the real wheel) and stay out of scope here.
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pytest


@pytest.fixture
def lance_bk(monkeypatch):
    from tests import fake_lance

    import whakoom_webscrapper_ray.storage as storage

    monkeypatch.setitem(sys.modules, "lance", fake_lance)
    monkeypatch.setattr(storage, "_BACKEND", None)
    bk = storage.LanceBackend()
    assert bk.name == "lance"
    yield bk
    monkeypatch.setattr(storage, "_BACKEND", None)


def _read_all(bk, d: str) -> dict[int, tuple]:
    rows = {}
    for f in bk.list_fragments(d):
        for r in bk.read_fragment(f).to_pylist():
            assert r["k"] not in rows
            rows[r["k"]] = (r["v"], r["w"])
    return rows


def test_lance_selection_with_shim(monkeypatch):
    from tests import fake_lance

    import whakoom_webscrapper_ray.storage as storage

    monkeypatch.setitem(sys.modules, "lance", fake_lance)
    monkeypatch.setattr(storage, "_BACKEND", None)
    monkeypatch.delenv("WKM_STORAGE_BACKEND", raising=False)
    # lance-if-importable: the shim makes the default resolve to lance
    assert storage.backend("lance").name == "lance"
    assert storage.backend().name == "lance"
    monkeypatch.setattr(storage, "_BACKEND", None)


def test_lance_fragment_roundtrip(lance_bk, tmp_path):
    bk = lance_bk
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = bk.fragment_path(str(tmp_path), "part-0")
    assert p.endswith(".lance")
    bk.write_fragment(t, p)
    assert bk.read_fragment(p).equals(t)
    assert bk.read_fragment(p, columns=["b"]).column_names == ["b"]
    assert bk.list_fragments(str(tmp_path)) == [p]
    # overwrite mode: re-write replaces, does not append
    bk.write_fragment_atomic(pa.table({"a": [9], "b": ["q"]}), p)
    assert bk.read_fragment(p).to_pylist() == [{"a": 9, "b": "q"}]
    bk.delete_fragment(p)
    assert bk.list_fragments(str(tmp_path)) == []


def test_lance_iter_fragment_streams_bounded(lance_bk, tmp_path):
    bk = lance_bk
    t = pa.table({"ok": list(range(1000)), "v": ["x"] * 1000})
    p = bk.fragment_path(str(tmp_path), "run-0")
    bk.write_fragment(t, p)
    chunks = list(bk.iter_fragment(p, batch_rows=128))
    assert len(chunks) >= 8
    assert all(c.num_rows <= 128 for c in chunks)
    assert pa.concat_tables(chunks).equals(t)


def test_lance_link_fragment_snapshot(lance_bk, tmp_path):
    bk = lance_bk
    t = pa.table({"a": [1, 2]})
    src = bk.fragment_path(str(tmp_path), "src")
    dst = bk.fragment_path(str(tmp_path), "snap")
    bk.write_fragment(t, src)
    bk.link_fragment(src, dst)
    bk.delete_fragment(src)
    assert bk.read_fragment(dst).equals(t)   # snapshot survives
    bk.write_fragment(t, src)
    bk.link_fragment(src, dst)               # idempotent re-link
    assert bk.read_fragment(dst).equals(t)


def test_lance_upsert_lww(lance_bk, tmp_path):
    bk = lance_bk
    d = str(tmp_path / "t")
    bk.upsert(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"],
                        "w": [10, 20, 30]}), d, ["k"])
    bk.upsert(pa.table({"k": [3, 4], "v": ["C", "d"],
                        "w": [33, 40]}), d, ["k"])
    expect = {1: ("a", 10), 2: ("b", 20), 3: ("C", 33), 4: ("d", 40)}
    got = {r["k"]: (r["v"], r["w"])
           for r in bk.read_fragment(d).to_pylist()}
    assert got == expect
    # idempotent re-run (the resume story)
    bk.upsert(pa.table({"k": [3, 4], "v": ["C", "d"],
                        "w": [33, 40]}), d, ["k"])
    got = {r["k"]: (r["v"], r["w"])
           for r in bk.read_fragment(d).to_pylist()}
    assert got == expect


def test_lance_upsert_composite_key(lance_bk, tmp_path):
    bk = lance_bk
    d = str(tmp_path / "j")
    bk.upsert(
        pa.table({"list_id": [1, 1, 2], "title_id": [7, 8, 7],
                  "position": [0, 1, 0]}), d,
        ["list_id", "title_id"])
    bk.upsert(
        pa.table({"list_id": [1, 2], "title_id": [8, 9],
                  "position": [5, 2]}), d,
        ["list_id", "title_id"])
    got = {(r["list_id"], r["title_id"]): r["position"]
           for r in bk.read_fragment(d).to_pylist()}
    assert got == {(1, 7): 0, (1, 8): 5, (2, 7): 0, (2, 9): 2}


def test_lance_upsert_dataset_stream(lance_bk, tmp_path):
    bk = lance_bk
    d = str(tmp_path / "t")
    batches = [
        pa.record_batch({"k": pa.array([1, 2], pa.int64()),
                         "v": pa.array(["a", "b"]),
                         "w": pa.array([1, 2], pa.int64())}),
        pa.record_batch({"k": pa.array([2, 3], pa.int64()),
                         "v": pa.array(["B", "c"]),
                         "w": pa.array([22, 3], pa.int64())}),
        pa.record_batch({"k": pa.array([], pa.int64()),
                         "v": pa.array([], pa.string()),
                         "w": pa.array([], pa.int64())}),
    ]
    bk.upsert_dataset(iter(batches), d, ["k"])
    got = {r["k"]: (r["v"], r["w"])
           for r in bk.read_fragment(d).to_pylist()}
    assert got == {1: ("a", 1), 2: ("B", 22), 3: ("c", 3)}


def test_lance_point_lookup(lance_bk, tmp_path):
    bk = lance_bk
    d = str(tmp_path / "t")
    bk.upsert(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"],
                        "w": [10, 20, 30]}), d, ["k"])
    got = bk.point_lookup(d, "k", 2)
    assert got.to_pylist() == [{"k": 2, "v": "b", "w": 20}]
    assert bk.point_lookup(d, "k", 99).num_rows == 0


def test_lance_compact_and_version_pin(lance_bk, tmp_path):
    """Compaction advances the version chain without changing content,
    and a PINNED historical version still serves its snapshot — the
    lance versioning contract the checkpoint/lineage story leans on."""
    import lance  # the shim, via the fixture's sys.modules injection

    bk = lance_bk
    d = str(tmp_path / "t")
    bk.upsert(pa.table({"k": [1], "v": ["a"], "w": [1]}), d, ["k"])
    v1 = lance.dataset(d).version
    bk.upsert(pa.table({"k": [1], "v": ["A"], "w": [11]}), d, ["k"])
    assert lance.dataset(d).version == v1 + 1
    before = bk.read_fragment(d)
    bk.compact(d)
    assert bk.read_fragment(d).sort_by("k").equals(
        before.sort_by("k"))
    assert lance.dataset(d).version == v1 + 2
    # version pin: the pre-upsert snapshot is still intact
    pinned = lance.dataset(d, version=v1).to_table()
    assert pinned.to_pylist() == [{"k": 1, "v": "a", "w": 1}]
