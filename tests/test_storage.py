"""Storage seam: fragment contracts + merge_insert-shaped upsert
(reference persistence semantics: INSERT ... ON CONFLICT DO UPDATE,
/root/reference/whakoom_webscrapper/queries/lists.sql:1-9)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from whakoom_webscrapper_ray.storage import ParquetBackend, backend


def _read_all(bk, d: str) -> dict[int, tuple]:
    rows = {}
    for f in bk.list_fragments(d):
        for r in bk.read_fragment(f).to_pylist():
            assert r["k"] not in rows, "duplicate key across fragments"
            rows[r["k"]] = (r["v"], r["w"])
    return rows


def test_fragment_roundtrip(tmp_path):
    bk = ParquetBackend()
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = bk.fragment_path(str(tmp_path), "part-0")
    bk.write_fragment(t, p)
    assert bk.read_fragment(p).equals(t)
    assert bk.read_fragment(p, columns=["b"]).column_names == ["b"]
    assert bk.list_fragments(str(tmp_path)) == [p]
    bk.delete_fragment(p)
    assert bk.list_fragments(str(tmp_path)) == []


def test_iter_fragment_streams_bounded(tmp_path):
    bk = ParquetBackend()
    t = pa.table({"ok": list(range(1000)), "v": ["x"] * 1000})
    p = bk.fragment_path(str(tmp_path), "run-0")
    bk.write_fragment(t, p)
    chunks = list(bk.iter_fragment(p, batch_rows=128))
    assert len(chunks) >= 8
    assert all(c.num_rows <= 128 for c in chunks)
    assert pa.concat_tables(chunks).equals(t)


def test_link_fragment_independent_lifetimes(tmp_path):
    bk = ParquetBackend()
    t = pa.table({"a": [1, 2]})
    src = bk.fragment_path(str(tmp_path), "src")
    dst = bk.fragment_path(str(tmp_path), "snap")
    bk.write_fragment(t, src)
    bk.link_fragment(src, dst)
    bk.delete_fragment(src)          # consume the original (poll)
    assert bk.read_fragment(dst).equals(t)   # snapshot survives
    bk.link_fragment(dst, dst.replace("snap", "snap2"))
    # idempotent re-link over an existing dst
    bk.write_fragment(t, src)
    bk.link_fragment(src, dst)
    assert bk.read_fragment(dst).equals(t)


def test_upsert_lww(tmp_path):
    """when_matched_update_all + when_not_matched_insert_all: the
    incoming row wins on key conflict; unmatched rows persist."""
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    bk.upsert(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"],
                        "w": [10, 20, 30]}), d, ["k"])
    bk.upsert(pa.table({"k": [3, 4], "v": ["C", "d"],
                        "w": [33, 40]}), d, ["k"])
    assert _read_all(bk, d) == {
        1: ("a", 10), 2: ("b", 20), 3: ("C", 33), 4: ("d", 40)
    }
    # idempotent re-run (the resume story): same batch, same result
    bk.upsert(pa.table({"k": [3, 4], "v": ["C", "d"],
                        "w": [33, 40]}), d, ["k"])
    assert _read_all(bk, d) == {
        1: ("a", 10), 2: ("b", 20), 3: ("C", 33), 4: ("d", 40)
    }


def test_upsert_copy_on_write(tmp_path):
    """Fragments with no matched key are byte-untouched (Lance
    merge_insert's copy-on-write contract)."""
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    bk.upsert(pa.table({"k": [1, 2], "v": ["a", "b"], "w": [1, 2]}),
              d, ["k"])
    first = bk.list_fragments(d)[0]
    mtime = os.stat(first).st_mtime_ns
    bk.upsert(pa.table({"k": [9], "v": ["z"], "w": [9]}), d, ["k"])
    assert os.stat(first).st_mtime_ns == mtime
    assert len(bk.list_fragments(d)) == 2


def test_upsert_composite_key(tmp_path):
    """Junction-style (list_id, title_id) composite primary key."""
    bk = ParquetBackend()
    d = str(tmp_path / "j")
    bk.upsert(
        pa.table({"list_id": [1, 1, 2], "title_id": [7, 8, 7],
                  "position": [0, 1, 0]}),
        d, ["list_id", "title_id"],
    )
    bk.upsert(
        pa.table({"list_id": [1, 2], "title_id": [8, 9],
                  "position": [5, 2]}),
        d, ["list_id", "title_id"],
    )
    got = {
        (r["list_id"], r["title_id"]): r["position"]
        for f in bk.list_fragments(d)
        for r in bk.read_fragment(f).to_pylist()
    }
    assert got == {(1, 7): 0, (1, 8): 5, (2, 7): 0, (2, 9): 2}


def test_upsert_after_unlink_no_name_reuse(tmp_path):
    """Regression: once a fragment is fully superseded and unlinked, a
    later upsert must NOT reuse an existing fragment's name (the old
    fragment-count naming overwrote live rows: upserting {1,2}, {9},
    {1,2}, {7} left only {7,9})."""
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    for ks in ([1, 2], [9], [1, 2], [7]):
        bk.upsert(
            pa.table({"k": ks, "v": [str(k) for k in ks],
                      "w": [k * 10 for k in ks]}),
            d, ["k"],
        )
    assert _read_all(bk, d) == {
        1: ("1", 10), 2: ("2", 20), 7: ("7", 70), 9: ("9", 90)
    }


def test_upsert_dataset_stream_copy_on_write(tmp_path):
    """Multi-batch streaming upsert: pre-existing fragments with no
    matched key keep their inode/mtime (scanned at most once, pruned
    by footer stats); matched old rows are superseded; a later batch
    re-sending a key wins over an earlier batch (LWW)."""
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    # 20 disjoint-key-range base fragments
    for i in range(20):
        bk.upsert(
            pa.table({"k": [i * 10, i * 10 + 1],
                      "v": ["old"] * 2, "w": [i, i]}),
            d, ["k"],
        )
    before = {f: (os.stat(f).st_ino, os.stat(f).st_mtime_ns)
              for f in bk.list_fragments(d)}
    # stream: touches keys 50,51 (one fragment) + inserts 999 twice
    bk.upsert_dataset(
        iter([
            pa.table({"k": [50, 999], "v": ["new", "first"],
                      "w": [1, 1]}),
            pa.table({"k": [999], "v": ["last"], "w": [2]}),
        ]),
        d, ["k"],
    )
    rows = _read_all(bk, d)
    assert rows[50] == ("new", 1)
    assert rows[51] == ("old", 5)
    assert rows[999] == ("last", 2)
    assert len(rows) == 41
    touched = [f for f, sig in before.items()
               if not os.path.exists(f)
               or (os.stat(f).st_ino, os.stat(f).st_mtime_ns) != sig]
    # exactly the one fragment holding key 50 was rewritten
    assert len(touched) == 1


def test_upsert_dataset_parallel_rescan(ray_session, tmp_path):
    """With Ray up and >=4 live fragments the per-fragment rescans fan
    out as tasks (disjoint files commute): the merged result equals the
    serial contract and fragments whose key range is untouched keep
    their inode/mtime."""
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    for i in range(8):
        bk.upsert(
            pa.table({"k": [i * 10, i * 10 + 1],
                      "v": ["old"] * 2, "w": [i, i]}),
            d, ["k"],
        )
    before = {f: (os.stat(f).st_ino, os.stat(f).st_mtime_ns)
              for f in bk.list_fragments(d)}
    bk.upsert_dataset(
        iter([
            pa.table({"k": [10, 30], "v": ["n10", "n30"], "w": [1, 3]}),
            pa.table({"k": [70, 500], "v": ["n70", "ins"], "w": [7, 0]}),
        ]),
        d, ["k"],
    )
    rows = _read_all(bk, d)
    assert rows[10] == ("n10", 1)
    assert rows[30] == ("n30", 3)
    assert rows[70] == ("n70", 7)
    assert rows[500] == ("ins", 0)
    assert rows[11] == ("old", 1) and rows[71] == ("old", 7)
    assert len(rows) == 17
    touched = [f for f, sig in before.items()
               if not os.path.exists(f)
               or (os.stat(f).st_ino, os.stat(f).st_mtime_ns) != sig]
    # exactly the three fragments holding keys 10/30/70 were rewritten
    assert len(touched) == 3


def test_recompact_does_not_self_delete(tmp_path):
    """Regression: compacting a dir whose previous compact output is
    among the inputs must not unlink its own replacement."""
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    bk.upsert(pa.table({"k": [1], "v": ["a"], "w": [1]}), d, ["k"])
    bk.upsert(pa.table({"k": [2], "v": ["b"], "w": [2]}), d, ["k"])
    bk.compact(d)
    bk.upsert(pa.table({"k": [3], "v": ["c"], "w": [3]}), d, ["k"])
    bk.compact(d)
    assert _read_all(bk, d) == {1: ("a", 1), 2: ("b", 2), 3: ("c", 3)}


def test_compact(tmp_path):
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    bk.upsert(pa.table({"k": [1], "v": ["a"], "w": [1]}), d, ["k"])
    bk.upsert(pa.table({"k": [2], "v": ["b"], "w": [2]}), d, ["k"])
    assert len(bk.list_fragments(d)) == 2
    bk.compact(d)
    assert len(bk.list_fragments(d)) == 1
    assert _read_all(bk, d) == {1: ("a", 1), 2: ("b", 2)}


def test_backend_selection():
    assert backend("parquet").name == "parquet"
    try:
        import lance  # noqa: F401

        assert backend("lance").name == "lance"
        assert backend().name == "lance"
    except ImportError:
        with pytest.raises(ImportError):
            backend("lance")
        assert backend().name == "parquet"


def test_read_dataset_streaming(ray_session, tmp_path):
    """read_dataset returns a streaming Ray Dataset over fragments."""
    bk = ParquetBackend()
    for i in range(3):
        bk.write_fragment(
            pa.table({"k": [i], "v": [str(i)]}),
            bk.fragment_path(str(tmp_path), f"part-{i}"),
        )
    ds = bk.read_dataset(bk.list_fragments(str(tmp_path)), columns=["k"])
    assert sorted(r["k"] for r in ds.take_all()) == [0, 1, 2]


def test_write_dataset(ray_session, tmp_path):
    import ray.data

    bk = ParquetBackend()
    d = str(tmp_path / "out")
    bk.write_dataset(ray.data.range(100), d)
    assert bk.read_dataset(d).count() == 100


def test_point_lookup(tmp_path):
    """J2 FK point lookup (reference GET_LIST_BY_ID,
    queries/lists.sql:42-52): exact row(s) by key, empty on miss."""
    bk = ParquetBackend()
    d = str(tmp_path / "t")
    os.makedirs(d)
    bk.write_fragment(
        pa.table({"list_id": [1, 2], "title": ["a", "b"]}),
        bk.fragment_path(d, "p0"), fast=False,
    )
    bk.write_fragment(
        pa.table({"list_id": [3, 4], "title": ["c", "d"]}),
        bk.fragment_path(d, "p1"), fast=False,
    )
    hit = bk.point_lookup(d, "list_id", 3)
    assert hit.to_pylist() == [{"list_id": 3, "title": "c"}]
    assert bk.point_lookup(d, "list_id", 99).num_rows == 0


def test_get_by_id_over_finalized_table(ray_session, tmp_path):
    """get_by_id infers the primary key from the table directory name
    and returns the matching finalized row."""
    import ray.data

    from whakoom_webscrapper_ray.pipelines.crawl import get_by_id

    d = str(tmp_path / "lists")
    os.makedirs(d)
    ray.data.from_arrow(
        pa.table({"list_id": [7, 8], "title": ["x", "y"]})
    ).write_parquet(d)
    assert get_by_id(d, 8).to_pylist() == [{"list_id": 8, "title": "y"}]
    with pytest.raises(ValueError):
        get_by_id(str(tmp_path / "unknown_table"), 1)


def test_upsert_key_after_nested_column(tmp_path):
    """Regression: _fragment_may_match must find the key's LEAF column
    by path — with a nested column ahead of the key, the top-level
    Arrow index points at a spans leaf, whose min/max could 'prove' a
    matching fragment disjoint and leave stale duplicate keys."""
    bk = ParquetBackend()
    d = str(tmp_path / "nested")
    spans_t = pa.list_(pa.struct(
        [("kind", pa.string()), ("offset", pa.int32())]
    ))

    def tbl(keys, marks):
        return pa.table({
            "spans": pa.array(
                [[{"kind": "text", "offset": 0}]] * len(keys), spans_t
            ),
            "doc_id": pa.array(keys, pa.int64()),
            "mark": pa.array(marks, pa.string()),
        })

    bk.upsert(tbl([100, 200], ["old", "old"]), d, ["doc_id"])
    bk.upsert(tbl([200, 300], ["new", "new"]), d, ["doc_id"])
    got = {
        r["doc_id"]: r["mark"]
        for f in bk.list_fragments(d)
        for r in bk.read_fragment(f).to_pylist()
    }
    assert got == {100: "old", 200: "new", 300: "new"}


def test_hash_keyed_agg_matches_ray_aggregate(ray_session):
    """Property: the coarse-partition vectorized aggregate equals
    Ray's generic per-key aggregate (sum/min/count) on random data
    with duplicate keys across blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Min, Sum

    from whakoom_webscrapper_ray.pipelines.common import hash_keyed_agg

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 400, n), pa.int64()),
        "v": pa.array(rng.integers(-1000, 1000, n), pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    got = {
        r["k"]: (r["s"], r["m"], r["n"])
        for r in hash_keyed_agg(
            ds, "k", sums={"v": "s"}, mins={"v": "m"},
            count_alias="n", parts=16,
        ).take_all()
    }
    want = {
        r["k"]: (r["s"], r["m"], r["n"])
        for r in ds.groupby("k").aggregate(
            Sum("v", alias_name="s"), Min("v", alias_name="m"),
            Count(alias_name="n"),
        ).take_all()
    }
    assert got == want

    # skew: one key owns 90% of rows — the hot key's partials still
    # combine map-side, so one partition holds |blocks| partial rows,
    # not the row count, and the result stays exact
    hot = pa.table({
        "k": pa.array(
            np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n)),
            pa.int64(),
        ),
        "v": pa.array(rng.integers(-5, 5, n), pa.int64()),
    })
    hds = ray.data.from_arrow(hot).repartition(8)
    g2 = {
        r["k"]: (r["s"], r["n"])
        for r in hash_keyed_agg(
            hds, "k", sums={"v": "s"}, count_alias="n", parts=16
        ).take_all()
    }
    w2 = {
        r["k"]: (r["s"], r["n"])
        for r in hds.groupby("k").aggregate(
            Sum("v", alias_name="s"), Count(alias_name="n"),
        ).take_all()
    }
    assert g2 == w2
