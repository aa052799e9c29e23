"""Schema-evolution migrations over stored tables (S8).

The reference applies versioned SQL files once each, tracked in a
``migrations`` table (/root/reference/whakoom_webscrapper/sqlmanager.py:141-246,
migrations/001_initial_schema.sql).  SQLite DDL doesn't translate to a
fragment store, so the Ray-native re-expression is *declarative column
ops* applied to a table directory:

- ``add_column``    (name, type, default)   — backfill with a constant
- ``rename_column`` (from, to)
- ``drop_column``   (name)

Execution model, designed for the 100-TB layout where a table is
thousands of fragments:

- each fragment is rewritten in place (atomic tmp+rename) by a Ray
  task — fragment rewrites are embarrassingly parallel and never pass
  through the driver;
- every op is idempotent on an already-migrated fragment (add skips
  when present, rename skips when source absent, drop skips when
  absent), so a crash mid-migration just re-runs: fragments already
  rewritten are no-ops, the rest catch up (per-partition lineage);
- the applied-versions set (T8) is a ``_migrations.json`` manifest in
  the table directory, replaced atomically only after EVERY fragment
  commits — the reference's ``migrations`` table.

Version/name parsing mirrors the reference's ``XXX_name`` filename
contract (sqlmanager.py:169-195) so migration ids sort and validate
the same way.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa

from ..storage import backend as storage_backend

MANIFEST = "_migrations.json"


def parse_migration_id(mig_id: str) -> tuple[str, str]:
    """``'002_add_rating'`` → ``('002', 'add_rating')`` — the
    reference's filename contract (sqlmanager.py:169-195); raises on
    malformed ids exactly like its RuntimeError."""
    parts = mig_id.split("_", 1)
    if len(parts) != 2 or not parts[0] or not parts[1]:
        raise RuntimeError(
            f"Invalid migration id format: {mig_id!r}. "
            "Expected format: XXX_name (e.g., 001_initial_schema)"
        )
    return parts[0], parts[1]


@dataclass
class Migration:
    """One versioned schema change: an ordered list of column ops."""

    mig_id: str                       # "002_add_rating"
    ops: list[dict] = field(default_factory=list)

    @property
    def version(self) -> str:
        return parse_migration_id(self.mig_id)[0]

    @property
    def name(self) -> str:
        return parse_migration_id(self.mig_id)[1]


_ARROW_TYPES = {
    "int64": pa.int64(), "int32": pa.int32(), "float64": pa.float64(),
    "string": pa.string(), "bool": pa.bool_(), "binary": pa.binary(),
}


def apply_ops(t: pa.Table, ops: list[dict]) -> pa.Table:
    """Apply column ops to one table; idempotent per op so re-running
    a crashed migration converges instead of erroring."""
    for op in ops:
        kind = op["op"]
        if kind == "add_column":
            if op["name"] in t.column_names:
                continue
            typ = _ARROW_TYPES[op["type"]]
            default = op.get("default")
            col = pa.array([default] * t.num_rows, typ)
            t = t.append_column(pa.field(op["name"], typ), col)
        elif kind == "rename_column":
            if op["from"] not in t.column_names:
                continue  # already renamed (idempotent re-run)
            names = [
                op["to"] if c == op["from"] else c for c in t.column_names
            ]
            t = t.rename_columns(names)
        elif kind == "drop_column":
            if op["name"] in t.column_names:
                t = t.drop_columns([op["name"]])
        else:
            raise ValueError(f"unknown migration op: {kind!r}")
    return t


def _rewrite_fragment(path: str, ops: list[dict]) -> int:
    bk = storage_backend()
    t = bk.read_fragment(path)
    out = apply_ops(t, ops)
    if out is not t:  # schema actually changed for this fragment
        bk.write_fragment_atomic(out, path)
    return out.num_rows


class MigrationRunner:
    """Applies pending migrations to one table directory.

    Parallelism: fragment rewrites fan out as Ray tasks when the table
    has more than ``parallel_threshold`` fragments (driver-side loop
    for tiny tables — actor startup would dominate).
    """

    def __init__(self, table_dir: str, parallel_threshold: int = 4):
        self.table_dir = table_dir
        self.parallel_threshold = parallel_threshold

    # -- applied-versions set (T8) ---------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.table_dir, MANIFEST)

    def applied(self) -> list[dict]:
        """Applied migrations, ordered by version (the reference's
        ``SELECT * FROM migrations ORDER BY version``)."""
        try:
            with open(self._manifest_path()) as f:
                rows = json.load(f)
        except FileNotFoundError:
            return []
        return sorted(rows, key=lambda r: r["version"])

    def _record(self, mig: Migration, logical_time: float) -> None:
        rows = self.applied()
        rows.append({
            "version": mig.version,
            "name": mig.name,
            "applied_at": logical_time,
        })
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rows, f, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    # -- pending / apply --------------------------------------------------
    def pending(self, migrations: list[Migration]) -> list[Migration]:
        done = {r["version"] for r in self.applied()}
        out = []
        for m in sorted(migrations, key=lambda m: m.version):
            m.version  # validate id format eagerly (reference parity)
            if m.version not in done:
                out.append(m)
        return out

    def apply(self, migrations: list[Migration],
              logical_time: float = 0.0) -> dict:
        """Apply all pending migrations in version order; returns
        ``{version: n_rows_rewritten}``.  Safe to re-run after a crash:
        fragment ops are idempotent and a version is recorded only
        after every fragment committed."""
        import ray

        bk = storage_backend()
        results: dict[str, int] = {}
        for mig in self.pending(migrations):
            frags = bk.list_fragments(self.table_dir)
            if len(frags) > self.parallel_threshold:
                fn = ray.remote(_rewrite_fragment)
                counts = ray.get(
                    [fn.remote(f, mig.ops) for f in frags]
                )
            else:
                counts = [_rewrite_fragment(f, mig.ops) for f in frags]
            self._record(mig, logical_time)
            results[mig.version] = int(sum(counts))
        return results
