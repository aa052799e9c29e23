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


def copartition_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                     on: str, right_on: str | None = None,
                     parts: int = 32,
                     left_schema: pa.Schema | None = None,
                     right_schema: pa.Schema | None = None
                     ) -> "ray.data.Dataset":
    """Inner hash join via the engine's own co-partitioning — ONE
    exchange, then a vectorized per-partition Arrow (acero) join.

    Exists because Ray Data's built-in ``Dataset.join`` builds each
    hash partition by concatenating received blocks and crashes with
    ``No match ... for key field`` when a partition receives no blocks
    from one side (routine for small/filtered inputs, and possible at
    any scale for a skewed key space).  Here both sides ride one
    ``groupby(part)`` exchange tagged with their origin; each
    partition rebuilds two schema-stable tables and joins them with
    ``pa.Table.join`` — empty sides are fine because the schema always
    travels with the partition.

    Key columns must be join-compatible; ``right_on`` defaults to
    ``on``.  Output columns = left columns + right columns minus the
    right key (acero inner-join layout).  Keys may be int64 (hashed
    via mix64) or string (hashed via the token hash) — both routes are
    deterministic so the same key always lands in one partition.
    """
    import numpy as np

    from whakoom_webscrapper_ray.pipelines.text import (mix64,
                                                        token_hashes)

    right_on = right_on or on
    # explicit Arrow schemas: ds.schema() returns a Ray wrapper and is
    # unreliable on pipelines whose tail stage can emit zero-schema
    # empties, so callers state what their blocks carry
    if left_schema is None or right_schema is None:
        raise ValueError("copartition_join requires explicit "
                         "left_schema/right_schema")
    lschema, rschema = left_schema, right_schema
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    out_rnames = [n for n in rnames if n != right_on]
    overlap = set(lnames) & set(out_rnames)
    if overlap:
        raise ValueError(f"column collision in copartition_join: "
                         f"{sorted(overlap)}")

    lfields = [pa.field(f"__L_{n}", lschema.field(n).type)
               for n in lnames]
    rfields = [pa.field(f"__R_{n}", rschema.field(n).type)
               for n in rnames]
    union_schema = pa.schema(
        [pa.field("__kind", pa.int8()), pa.field("part", pa.int64())]
        + lfields + rfields)

    def key_parts(col: pa.Array) -> pa.Array:
        v = col.to_numpy(zero_copy_only=False)
        if v.dtype == object or v.dtype.kind in "US":
            h = token_hashes(v)
        else:
            h = mix64(np.ascontiguousarray(
                v.astype(np.int64)).view(np.uint64))
        return pa.array((h % np.uint64(parts)).astype(np.int64))

    def tag(kind: int, keycol: str):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return union_schema.empty_table()
            cols = {
                "__kind": pa.array(
                    np.full(b.num_rows, kind, np.int8), pa.int8()),
                "part": key_parts(b[keycol].combine_chunks()
                                  if isinstance(b[keycol],
                                                pa.ChunkedArray)
                                  else b[keycol]),
            }
            for f in lfields:
                n = f.name[4:]
                cols[f.name] = (b[n] if kind == 0 else
                                pa.nulls(b.num_rows, f.type))
            for f in rfields:
                n = f.name[4:]
                cols[f.name] = (b[n] if kind == 1 else
                                pa.nulls(b.num_rows, f.type))
            return pa.table(cols).cast(union_schema)
        return fn

    tagged = left.map_batches(
        tag(0, on), batch_format="pyarrow"
    ).union(right.map_batches(tag(1, right_on),
                              batch_format="pyarrow"))

    out_fields = ([pa.field(n, lschema.field(n).type) for n in lnames]
                  + [pa.field(n, rschema.field(n).type)
                     for n in out_rnames])
    out_schema = pa.schema(out_fields)

    def join_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        kind = g["__kind"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(kind == 0)).select(
            [f"__L_{n}" for n in lnames]).rename_columns(lnames)
        rt = g.filter(pa.array(kind == 1)).select(
            [f"__R_{n}" for n in rnames]).rename_columns(rnames)
        # drop the all-null placeholder typing: cast to origin schemas
        lt = lt.cast(pa.schema([lschema.field(n) for n in lnames]))
        rt = rt.cast(pa.schema([rschema.field(n) for n in rnames]))
        j = lt.join(rt, keys=[on], right_keys=[right_on],
                    join_type="inner")
        return j.select(out_schema.names).cast(out_schema)

    return (
        tagged.groupby("part")
        .map_groups(join_part, batch_format="pyarrow")
    )


def exact_quantiles_multi(ds: "ray.data.Dataset", cols: list[str],
                          pcts: tuple[int, ...],
                          nbins: int = 1 << 16
                          ) -> dict[str, list[tuple[int, object]]]:
    """EXACT discrete percentiles (``percentile_disc`` semantics: the
    value at 1-based rank ceil(pct·n/100)) for SEVERAL columns of
    ``ds`` in ONE set of shared scans — the distributed selection
    primitive behind value_quantiles / customer_value_deciles /
    customer_rfm.  Fusing the columns matters: each extra dimension
    costs vector math inside the same three passes, not three more
    passes over the corpus.

      pass 1: per-block (min, max, count) partials per column;
      pass 2: fixed ``nbins`` bin counts per column via the map-side
              combiner — the exchange moves bin-count partials, never
              rows;
      pass 3: ONLY the (column, bin) cells containing a target rank
              are re-scanned, and each exact order statistic is picked
              locally from the original values (native dtype — int64
              stays int64, so no float rounding on exact domains).

    NULLs are dropped on every pass (percentile_disc semantics).
    Returns ``{col: [(pct, value), ...]}``; a column with no non-null
    rows maps to [].
    """
    import numpy as np
    import pyarrow.compute as pc

    def mmx(b: pa.Table) -> pa.Table:
        out_c, out_mn, out_mx, out_n = [], [], [], []
        for c in cols:
            v = b[c].drop_null().to_numpy(zero_copy_only=False)
            if v.size == 0:
                continue
            out_c.append(c)
            out_mn.append(float(v.min()))
            out_mx.append(float(v.max()))
            out_n.append(int(v.size))
        return pa.table({
            "c": pa.array(out_c, pa.string()),
            "mn": pa.array(out_mn, pa.float64()),
            "mx": pa.array(out_mx, pa.float64()),
            "n": pa.array(out_n, pa.int64())})

    mm = collect_small(
        ds.map_batches(mmx, batch_format="pyarrow"),
        pa.schema([("c", pa.string()), ("mn", pa.float64()),
                   ("mx", pa.float64()), ("n", pa.int64())]))
    bounds: dict[str, tuple[float, float, int]] = {}
    mmc = mm["c"].to_numpy(zero_copy_only=False)
    for col in cols:
        sel = mmc == col
        if not sel.any():
            continue
        bounds[col] = (
            float(mm["mn"].to_numpy(zero_copy_only=False)[sel].min()),
            float(mm["mx"].to_numpy(zero_copy_only=False)[sel].max()),
            int(mm["n"].to_numpy(zero_copy_only=False)[sel].sum()))
    if not bounds:
        return {c: [] for c in cols}
    width = {c: ((hi - lo) / nbins or 1.0)
             for c, (lo, hi, _) in bounds.items()}

    def bin_of(c: str, v: "np.ndarray") -> "np.ndarray":
        lo = bounds[c][0]
        return np.clip(
            np.floor((v.astype(np.float64) - lo) / width[c]).astype(
                np.int64), 0, nbins - 1)

    live = [c for c in cols if c in bounds]

    def binc(b: pa.Table) -> pa.Table:
        out_c, out_b, out_n = [], [], []
        for c in live:
            v = b[c].drop_null().to_numpy(zero_copy_only=False)
            ub, cnt = np.unique(bin_of(c, v), return_counts=True)
            out_c.append(np.full(ub.size, c, dtype=object))
            out_b.append(ub)
            out_n.append(cnt.astype(np.int64))
        return pa.table({
            "c": pa.array(np.concatenate(out_c).tolist(), pa.string()),
            "bin": pa.array(np.concatenate(out_b), pa.int64()),
            "n": pa.array(np.concatenate(out_n), pa.int64())})

    hist = collect_small(
        two_phase_agg(ds.map_batches(binc, batch_format="pyarrow"),
                      ["c", "bin"], sums={"n": "n"}),
        pa.schema([("c", pa.string()), ("bin", pa.int64()),
                   ("n", pa.int64())]))
    hc = hist["c"].to_numpy(zero_copy_only=False)
    want: dict[str, dict[int, list[tuple[int, int]]]] = {}
    need: dict[str, "np.ndarray"] = {}
    for col in live:
        sel = hc == col
        sub = hist.filter(pa.array(sel)).sort_by("bin")
        hbins = sub["bin"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(sub["n"].to_numpy(zero_copy_only=False))
        n = bounds[col][2]
        w: dict[int, list[tuple[int, int]]] = {}
        for pct in pcts:
            r = -(-pct * n // 100)
            i = int(np.searchsorted(cum, r))
            b_id = int(hbins[i])
            w.setdefault(b_id, []).append(
                (pct, int(r - (cum[i - 1] if i else 0))))
        want[col] = w
        need[col] = np.array(sorted(w), dtype=np.int64)

    sch = ds.schema()  # Ray Schema wrapper, not pyarrow
    vt = {c: sch.types[sch.names.index(c)] for c in live}

    def pick(b: pa.Table) -> pa.Table:
        out_c, out_v, out_b = [], [], []
        for c in live:
            v = b[c].drop_null().to_numpy(zero_copy_only=False)
            bv = bin_of(c, v)
            keep = np.isin(bv, need[c])
            vk = v[keep]
            if (pa.types.is_integer(vt[c]) and vk.size
                    and int(np.abs(vk).max()) >= 2 ** 53):
                # checked HERE, against the original integer values —
                # past this point the carrier is float64 and the loss
                # would be silent (ADVICE r4: the old post-hoc
                # float(int(val)) == val check was tautological)
                raise ValueError(
                    f"exact_quantiles_multi: int64 column {c!r} has "
                    f"|values| >= 2**53 — float64 candidate carrier "
                    f"would lose precision")
            out_c.append(np.full(int(keep.sum()), c, dtype=object))
            out_v.append(vk.astype(np.float64))
            out_b.append(bv[keep])
        return pa.table({
            "c": pa.array(np.concatenate(out_c).tolist(), pa.string()),
            # float64 carrier is exact for doubles AND for int64 cents
            # domains < 2^53; the final cast back is checked
            "value": pa.array(np.concatenate(out_v), pa.float64()),
            "bin": pa.array(np.concatenate(out_b), pa.int64())})

    cand = collect_small(
        ds.map_batches(pick, batch_format="pyarrow"),
        pa.schema([("c", pa.string()), ("value", pa.float64()),
                   ("bin", pa.int64())]))
    cc = cand["c"].to_numpy(zero_copy_only=False)
    cv = cand["value"].to_numpy(zero_copy_only=False)
    cb = cand["bin"].to_numpy(zero_copy_only=False)
    result: dict[str, list[tuple[int, object]]] = {c: [] for c in cols}
    for col in live:
        out: dict[int, object] = {}
        sel = cc == col
        for b_id, picks in want[col].items():
            sv = np.sort(cv[sel][cb[sel] == b_id])
            for pct, r_local in picks:
                val = sv[r_local - 1]
                # precision for integer columns is guaranteed by the
                # |v| < 2**53 check in pick() (against the original
                # int64 values, before the float64 carrier)
                if pa.types.is_integer(vt[col]):
                    out[pct] = int(val)
                else:
                    out[pct] = float(val)
        result[col] = [(p, out[p]) for p in pcts]
    return result


def exact_quantiles(ds: "ray.data.Dataset", col: str,
                    pcts: tuple[int, ...],
                    nbins: int = 1 << 16) -> list[tuple[int, object]]:
    """Single-column wrapper over :func:`exact_quantiles_multi` (one
    code path for every selection caller)."""
    return exact_quantiles_multi(ds, [col], pcts, nbins=nbins)[col]
