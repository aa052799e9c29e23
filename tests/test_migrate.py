"""Schema-evolution migrations (S8): versioned column ops over a
fragment table, applied-once semantics, crash-idempotence.

Reference behavior mirrored: versioned migrations applied in order
exactly once, tracked in an applied-versions set
(/root/reference/whakoom_webscrapper/sqlmanager.py:141-246)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from whakoom_webscrapper_ray.state.migrate import (
    Migration,
    MigrationRunner,
    apply_ops,
    parse_migration_id,
)
from whakoom_webscrapper_ray.storage import ParquetBackend


def _mk_table(tmp_path, n_frags=3):
    bk = ParquetBackend()
    d = str(tmp_path / "titles")
    os.makedirs(d)
    for i in range(n_frags):
        bk.write_fragment(
            pa.table({
                "title_id": [i * 10 + 1, i * 10 + 2],
                "title": [f"t{i}a", f"t{i}b"],
            }),
            bk.fragment_path(d, f"part-{i:04d}"),
        )
    return bk, d


MIGS = [
    Migration("002_add_rating", [
        {"op": "add_column", "name": "rating", "type": "float64",
         "default": None},
    ]),
    Migration("003_rename_title", [
        {"op": "rename_column", "from": "title", "to": "name"},
    ]),
]


def test_parse_migration_id():
    assert parse_migration_id("001_initial_schema") == \
        ("001", "initial_schema")
    for bad in ("001", "_x", "001_", "noversion"):
        with pytest.raises(RuntimeError):
            parse_migration_id(bad)


def test_apply_in_order_and_record(tmp_path):
    bk, d = _mk_table(tmp_path)
    r = MigrationRunner(d)
    out = r.apply(MIGS, logical_time=7.0)
    assert out == {"002": 6, "003": 6}
    for f in bk.list_fragments(d):
        t = bk.read_fragment(f)
        assert t.column_names == ["title_id", "title", "rating"] or \
            t.column_names == ["title_id", "name", "rating"]
        assert "name" in t.column_names  # 003 ran after 002
    applied = r.applied()
    assert [(m["version"], m["name"]) for m in applied] == [
        ("002", "add_rating"), ("003", "rename_title")
    ]
    assert all(m["applied_at"] == 7.0 for m in applied)


def test_reapply_is_noop(tmp_path):
    bk, d = _mk_table(tmp_path)
    r = MigrationRunner(d)
    r.apply(MIGS)
    before = {f: bk.read_fragment(f) for f in bk.list_fragments(d)}
    assert r.apply(MIGS) == {}          # nothing pending
    assert r.pending(MIGS) == []
    for f, t in before.items():
        assert bk.read_fragment(f).equals(t)


def test_crash_mid_migration_converges(tmp_path):
    """Simulate a crash after some fragments rewrote but before the
    version was recorded: re-running applies idempotently."""
    bk, d = _mk_table(tmp_path)
    r = MigrationRunner(d)
    # "crash": rewrite only fragment 0 by hand, record nothing
    from whakoom_webscrapper_ray.state.migrate import _rewrite_fragment

    frags = bk.list_fragments(d)
    _rewrite_fragment(frags[0], MIGS[0].ops)
    assert "rating" in bk.read_fragment(frags[0]).column_names
    assert "rating" not in bk.read_fragment(frags[1]).column_names
    # full re-run converges; counts include the already-done fragment
    out = r.apply(MIGS)
    assert out["002"] == 6
    for f in bk.list_fragments(d):
        t = bk.read_fragment(f)
        assert "rating" in t.column_names and "name" in t.column_names


def test_drop_column_and_defaults(tmp_path):
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    out = apply_ops(t, [
        {"op": "add_column", "name": "c", "type": "int64", "default": 5},
        {"op": "drop_column", "name": "b"},
        {"op": "drop_column", "name": "never_there"},
    ])
    assert out.column_names == ["a", "c"]
    assert out.column("c").to_pylist() == [5, 5]
    with pytest.raises(ValueError):
        apply_ops(t, [{"op": "explode"}])


def test_parallel_fragment_rewrite(ray_session, tmp_path):
    """Above the threshold the rewrites fan out as Ray tasks; result
    identical to the serial path."""
    bk, d = _mk_table(tmp_path, n_frags=6)
    r = MigrationRunner(d, parallel_threshold=2)
    out = r.apply(MIGS)
    assert out == {"002": 12, "003": 12}
    for f in bk.list_fragments(d):
        t = bk.read_fragment(f)
        assert t.column_names == ["title_id", "name", "rating"]


def test_manifest_survives_partial_versions(tmp_path):
    """Applying a later migration list re-runs only unapplied ones."""
    bk, d = _mk_table(tmp_path)
    r = MigrationRunner(d)
    r.apply(MIGS[:1])
    assert [m["version"] for m in r.applied()] == ["002"]
    out = r.apply(MIGS)
    assert list(out) == ["003"]
    raw = json.load(open(os.path.join(d, "_migrations.json")))
    assert {m["version"] for m in raw} == {"002", "003"}
