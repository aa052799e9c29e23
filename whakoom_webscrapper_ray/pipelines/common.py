"""Shared helpers for the data-ops pipelines over the driver testdata.

All readers prune columns at the read (`read_parquet(columns=[...])`) so
only needed columns leave storage — at the 100 TB design point a read
that loads all columns for a 2-column transform is wrong.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read(sf_dir: str, name: str, columns: list[str] | None = None,
         **kwargs) -> ray.data.Dataset:
    """Column-pruned parquet read of one testdata table."""
    return ray.data.read_parquet(
        table_path(sf_dir, name), columns=columns, **kwargs
    )


def collect_small(ds: ray.data.Dataset, schema: pa.Schema) -> pa.Table:
    """Materialize a SMALL (post-aggregation/candidate-set) dataset
    driver-side as one Arrow table with the given schema.

    ``to_arrow_refs`` hands back whatever block format the last
    operator produced — ``map_groups(batch_format="pandas")`` leaves
    pandas blocks, and EMPTY pandas blocks carry no column schema at
    all — so each block is normalized (pandas→arrow, empties dropped,
    columns reordered, cast) before the concat.  Only for results that
    are small by construction; never a corpus materialization.
    """
    import ray as _ray

    parts = []
    for r in ds.to_arrow_refs():
        b = _ray.get(r)
        if not isinstance(b, pa.Table):
            if len(b) == 0:
                continue
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_rows == 0:
            continue
        parts.append(b.select(schema.names).cast(schema))
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts).combine_chunks()


_DEREF_CACHE: dict = {}


def deref(ref):
    """ray.get an ObjectRef passed through fn_kwargs, memoized per worker.

    map_batches ``fn_kwargs`` does not auto-resolve ObjectRefs (task
    args do); broadcast lookups therefore deref explicitly.  The
    per-worker memo keeps one deserialized copy per object so repeated
    tasks in the same worker process pay plasma-get once.
    """
    import ray as _ray

    if not isinstance(ref, _ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _DEREF_CACHE:
        _DEREF_CACHE[key] = _ray.get(ref)
    return _DEREF_CACHE[key]


def two_phase_agg(ds: ray.data.Dataset, keys: list[str],
                  sums: dict[str, str] | None = None,
                  count_alias: str | None = None) -> ray.data.Dataset:
    """Partial-aggregate per block, then a tiny global groupby.

    The canonical pre-aggregation combiner: each block collapses to at
    most |groups-in-block| rows via a zero-copy Arrow ``group_by``
    BEFORE the all-to-all exchange, so the shuffle moves partial
    aggregates instead of raw rows.  For low-cardinality keys (the Q1 /
    windowed-count shape) this turns a 10⁶-row sort-shuffle into a few
    hundred rows.  Sums must be over exact (integer) columns so the
    two-phase reduction is order-independent.

    ``sums`` maps input column → output alias; ``count_alias`` adds a
    row count.  Correct for any input layout (partials re-reduce);
    maximally effective when keys are low-cardinality or clustered.
    """
    import pyarrow.compute as pc  # noqa: F401  (kept for parity)
    from ray.data.aggregate import Sum

    sums = sums or {}

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums]
        if count_alias:
            aggs.append(([], "count_all"))
        g = pa.TableGroupBy(batch, keys).aggregate(aggs)
        names = list(keys) + [f"{c}_p" for c in sums]
        if count_alias:
            names.append(f"{count_alias}_p")
        # TableGroupBy puts key columns last; reorder to keys-first.
        out_cols = {}
        for k in keys:
            out_cols[k] = g.column(k)
        for c in sums:
            out_cols[f"{c}_p"] = g.column(f"{c}_sum")
        if count_alias:
            out_cols[f"{count_alias}_p"] = g.column("count_all")
        return pa.table(out_cols)

    aggs = [Sum(f"{c}_p", alias_name=alias) for c, alias in sums.items()]
    if count_alias:
        aggs.append(Sum(f"{count_alias}_p", alias_name=count_alias))
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(*aggs)
    )


def hash_keyed_agg(ds: ray.data.Dataset, key: str,
                   sums: dict[str, str] | None = None,
                   count_alias: str | None = None,
                   mins: dict[str, str] | None = None,
                   parts: int = 64) -> ray.data.Dataset:
    """Exact groupby sum/count for HIGH-cardinality int64 keys.

    Ray's generic ``groupby(key).aggregate(...)`` pays per-group
    overhead that dominates beyond ~10⁴ groups (measured 8.7 s for a
    35k-group Sum+Max at sf0.1).  This is the engine's coarse-partition
    alternative: per-block Arrow ``group_by`` partials, ONE shuffle
    keyed by ``mix64(key) % parts``, then one vectorized numpy merge
    per partition (``np.unique`` + ``np.add.at``) — per-partition
    work, never per-key work.  Raise ``parts`` with key cardinality so
    a partition's distinct keys fit one worker's heap.

    ``sums`` / ``mins`` map input column → output alias (int64 columns
    — exact, order-independent); ``count_alias`` adds a row count.
    """
    import numpy as np
    import pyarrow.compute as pc

    from whakoom_webscrapper_ray.pipelines.text import mix64

    sums = sums or {}
    mins = mins or {}

    def partial(b: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sums] + [(c, "min") for c in mins]
        if count_alias:
            aggs.append(([], "count_all"))
        g = pa.TableGroupBy(b, [key]).aggregate(aggs)
        v = g[key].to_numpy(zero_copy_only=False)
        cols = {key: g[key]}
        for c in sums:
            cols[f"{c}_sp"] = g[f"{c}_sum"]
        for c in mins:
            cols[f"{c}_mp"] = g[f"{c}_min"]
        if count_alias:
            cols["_n_p"] = g["count_all"]
        cols["part"] = pa.array(
            (mix64(v.view(np.uint64)) % np.uint64(parts)).astype(
                np.int64
            )
        )
        return pa.table(cols)

    out_names = (list(sums.values()) + list(mins.values())
                 + ([count_alias] if count_alias else []))

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            cols = {key: pa.array([], pa.int64())}
            for a in out_names:
                cols[a] = pa.array([], pa.int64())
            return pa.table(cols)
        k = g[key].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        cols = {key: pa.array(uk, pa.int64())}
        for c, alias in sums.items():
            # same null-partial hazard as mins below: an all-null
            # group's NULL partial becomes NaN and np.add.at would
            # silently write garbage into the int64 accumulator
            col = g[f"{c}_sp"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = (np.ones(len(col), dtype=bool)
                     if col.null_count == 0
                     else pc.is_valid(col).to_numpy(
                         zero_copy_only=False))
            s = np.zeros(uk.size, dtype=np.int64)
            np.add.at(
                s, inv[valid],
                col.to_numpy(zero_copy_only=False)[valid].astype(
                    np.int64
                ),
            )
            cols[alias] = pa.array(s, pa.int64())
        for c, alias in mins.items():
            # an all-null group yields a NULL block partial; NaN.astype
            # (int64) is undefined (typically int64 min, which would
            # silently win every merge) — drop null partials and emit
            # NULL for groups with no valid value (ADVICE r3 low)
            col = g[f"{c}_mp"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = (np.ones(len(col), dtype=bool) if col.null_count == 0
                     else pc.is_valid(col).to_numpy(zero_copy_only=False))
            vals = col.to_numpy(zero_copy_only=False)
            m = np.full(uk.size, np.iinfo(np.int64).max)
            np.minimum.at(m, inv[valid], vals[valid].astype(np.int64))
            seen = np.zeros(uk.size, dtype=bool)
            seen[inv[valid]] = True
            cols[alias] = pa.array(m, pa.int64(), mask=~seen)
        if count_alias:
            n = np.zeros(uk.size, dtype=np.int64)
            np.add.at(n, inv,
                      g["_n_p"].to_numpy(zero_copy_only=False))
            cols[count_alias] = pa.array(n, pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """double currency → exact integer cents (order-independent sums).

    Float sums are summation-order-dependent, so a Ray partial-aggregate
    sum and a DuckDB sequential sum can drift in the last ulps and break
    value-hash comparison.  Scaling 2-decimal currency to int64 cents
    makes every downstream sum exact and order-independent; oracle SQL
    does the same with ``CAST(ROUND(x * 100) AS BIGINT)``.
    """
    import pyarrow.compute as pc

    return pc.cast(pc.round(pc.multiply(arr, 100.0)), pa.int64())
