"""Minimal in-process stand-in for the public ``lance`` API surface
that :class:`whakoom_webscrapper_ray.storage.LanceBackend` maps onto —
``write_dataset`` / ``dataset`` / ``to_table`` / ``to_batches`` /
``merge_insert`` / ``optimize.compact_files`` plus dataset VERSIONING
(every commit appends a new immutable version; ``dataset(path,
version=n)`` pins a historical snapshot, like Lance's manifest chain).

Exists so the import-gated LanceBackend branch is EXECUTED by tests
(tests/test_lance_backend.py injects this module as ``sys.modules
["lance"]``) instead of rotting as documented-but-never-run code.
Storage is one parquet file per version holding the full table state —
semantics over fidelity; the contracts exercised are the ones the
backend relies on (LWW merge_insert, atomic overwrite, snapshot
isolation of a pinned version).
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq


def _ver_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "v*.parquet")))


def _commit(table: pa.Table, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    n = len(_ver_files(path)) + 1
    tmp = os.path.join(path, f".v{n:06d}.tmp")
    pq.write_table(table, tmp)
    os.rename(tmp, os.path.join(path, f"v{n:06d}.parquet"))


def write_dataset(table: pa.Table, path: str,
                  mode: str = "create") -> None:
    if mode == "create" and _ver_files(path):
        raise OSError(f"dataset exists: {path}")
    if mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)
    _commit(table, path)


class _Optimize:
    def __init__(self, ds: "_Dataset") -> None:
        self._ds = ds

    def compact_files(self) -> None:
        # state is already one file per version; commit a fresh
        # compacted version so the call advances the version chain the
        # way real lance does
        _commit(self._ds.to_table(), self._ds._path)


class _MergeInsert:
    def __init__(self, ds: "_Dataset", on) -> None:
        self._ds = ds
        self._on = [on] if isinstance(on, str) else list(on)
        self._matched = False
        self._not_matched = False

    def when_matched_update_all(self) -> "_MergeInsert":
        self._matched = True
        return self

    def when_not_matched_insert_all(self) -> "_MergeInsert":
        self._not_matched = True
        return self

    def execute(self, incoming: pa.Table) -> None:
        import pyarrow.compute as pc

        cur = self._ds.to_table()
        # composite-key struct equality join surrogate: string-encode
        # the key tuple (test-scale only)
        def keys(t: pa.Table):
            parts = [pc.cast(t[c], pa.string()) for c in self._on]
            out = parts[0]
            for p in parts[1:]:
                out = pc.binary_join_element_wise(out, p, "\x1f")
            return out

        ik = set(keys(incoming).to_pylist())
        cmask = [k not in ik for k in keys(cur).to_pylist()]
        pieces = [cur.filter(pa.array(cmask, pa.bool_()))]
        if not self._matched:       # matched rows keep the CURRENT side
            pieces.append(cur.filter(pa.array(
                [not m for m in cmask], pa.bool_())))
        if self._not_matched:
            pieces.append(incoming.select(cur.column_names))
        elif self._matched:
            ck = set(keys(cur).to_pylist())
            imask = [k in ck for k in keys(incoming).to_pylist()]
            pieces.append(incoming.filter(
                pa.array(imask, pa.bool_())).select(cur.column_names))
        _commit(pa.concat_tables(pieces), self._ds._path)


class _Dataset:
    def __init__(self, path: str, version: int | None = None) -> None:
        files = _ver_files(path)
        if not files:
            raise ValueError(f"not a lance dataset: {path}")
        self._path = path
        self.version = version if version is not None else len(files)
        self._file = files[self.version - 1]

    def to_table(self, columns: list[str] | None = None,
                 filter=None) -> pa.Table:
        t = pq.read_table(self._file)
        if filter is not None:
            t = pads.dataset(t).to_table(columns=columns, filter=filter)
        elif columns is not None:
            t = t.select(columns)
        return t

    def to_batches(self, batch_size: int = 1 << 18):
        yield from self.to_table().to_batches(batch_size)

    def merge_insert(self, on) -> _MergeInsert:
        return _MergeInsert(self, on)

    @property
    def optimize(self) -> _Optimize:
        return _Optimize(self)


def dataset(path: str, version: int | None = None) -> _Dataset:
    return _Dataset(path, version)
