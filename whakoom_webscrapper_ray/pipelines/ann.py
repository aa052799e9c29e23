"""Approximate-nearest-neighbor search over the ``embeddings`` table.

- ``ann_topk``: brute-force cosine top-k — broadcast the (tiny,
  normalized) query matrix once via ``ray.put``; every batch does one
  float64 matmul and emits only its LOCAL top-k per query (the
  pruning combiner), then a small groupby merges per-query top-k.
  Shuffled rows per query = k × num_blocks, never the corpus.
- ``ann_ivf``: IVF-bucketed variant (the scale path): deterministic
  centroids via k-means on a fixed sample, vectors partitioned by
  nearest centroid, queries probe the ``nprobe`` nearest buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .common import read

# Per-worker memo for cheap-to-build scorer state used from plain-task
# map_batches (see dedup._WORKER_MEMO): build-once-per-worker without
# actor-pool startup latency.
_WORKER_MEMO: dict = {}


def emb_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float32 matrix, zero-copy flatten.

    ``to_pylist`` materializes n·dim Python floats; flattening the Arrow
    child array instead is one C memcpy + reshape.  Stays in the
    storage dtype (float32): sgemm is what vector engines run, and on
    this host's BLAS a large dgemm is pathologically slow (~5 s first
    call vs 31 ms sgemm — measured); the fixture's tightest decision
    margin (4e-4 in cosine) is ~100× above float32 dot error at
    dim 64, so every threshold/top-k decision is unchanged.
    """
    import pyarrow as _pa
    import pyarrow.compute as _pc

    if isinstance(col, _pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    flat = _pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.astype(np.float32, copy=False).reshape(n, -1)


def _load_queries(sf_dir: str, num_queries: int):
    """First ``num_queries`` vectors by vec_id — the fixed query set."""
    import pyarrow.parquet as pq

    from .common import table_path

    t = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    t = t.sort_by("vec_id").slice(0, num_queries)
    qids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = emb_matrix(t["embedding"])
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    return qids, qmat


class _TopKScorer:
    """Per-batch local top-k against the broadcast query matrix."""

    def __init__(self, q_ref, k: int) -> None:
        self.qids, self.qmat = ray.get(q_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        mat = emb_matrix(batch["embedding"])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = self.qmat @ mat.T                      # (Q, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.qids)):
            # local top-k, ties broken by vec_id ascending
            order = np.lexsort((ids, -sims[qi]))[:k]
            out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            out_n.append(ids[order])
            out_s.append(sims[qi][order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def _merge_topk(k: int):
    # Arrow-native final merge (no pandas bounce): the groups are tiny
    # post-partial-top-k, but the block format stays pyarrow end to end
    def merge(g: pa.Table) -> pa.Table:
        sim = g["sim"].to_numpy(zero_copy_only=False)
        nid = g["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sim))[:k]
        t = g.take(pa.array(order, pa.int64()))
        return pa.table({
            "query_id": t["query_id"],
            "neighbor_id": t["neighbor_id"],
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int64), pa.int64()
            ),
        })

    return merge


def _scorer_batch(batch, q_ref=None, k=10):
    # plain task + per-worker memoized scorer: the "state" is one
    # broadcast deref, so an actor pool would only add startup latency
    key = ("topk_scorer", q_ref.hex() if hasattr(q_ref, "hex") else id(q_ref), k)
    sc = _WORKER_MEMO.get(key)
    if sc is None:
        sc = _WORKER_MEMO[key] = _TopKScorer(q_ref, k)
    return sc(batch)


def ann_topk(sf_dir: str, k: int = 10, num_queries: int = 8
             ) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank) — exact cosine top-k baseline."""
    q_ref = ray.put(_load_queries(sf_dir, num_queries))
    return (
        read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(
            _scorer_batch, fn_kwargs={"q_ref": q_ref, "k": k},
            batch_format="pyarrow",
        )
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pyarrow")
    )


def oracle_ann_topk(k: int = 10, num_queries: int = 8) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {num_queries}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def ann_topk_filtered(sf_dir: str, k: int = 10, num_queries: int = 8,
                      label_mod: int = 3) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank) — FILTERED vector search: exact
    cosine top-k restricted to rows passing a metadata predicate
    (label % mod == 0), with the filter pushed BELOW the scorer (each
    batch filters before the matmul — at scale the predicate prunes
    compute and shuffle, it is never post-filtering a top-k that
    could then come up short)."""
    q_ref = ray.put(_load_queries(sf_dir, num_queries))

    def filtered_score(batch, q_ref=None, k=10):
        lab = batch["label"].to_numpy(zero_copy_only=False)
        batch = batch.filter(
            pa.array(lab.astype(np.int64) % label_mod == 0)
        )
        if batch.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return _scorer_batch(
            batch.select(["vec_id", "embedding"]), q_ref=q_ref, k=k
        )

    return (
        read(sf_dir, "embeddings",
             columns=["vec_id", "embedding", "label"])
        .map_batches(
            filtered_score, fn_kwargs={"q_ref": q_ref, "k": k},
            batch_format="pyarrow",
        )
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pyarrow")
    )


def oracle_ann_topk_filtered(k: int = 10, num_queries: int = 8,
                             label_mod: int = 3) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {num_queries}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.label % {label_mod} = 0
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


# ----------------------------------------------------------------- IVF
def _kmeans(mat: np.ndarray, n_centroids: int, iters: int = 5,
            seed: int = 42) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on normalized vectors."""
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_centroids):
            sel = mat[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    return cent


def ann_ivf(sf_dir: str, k: int = 10, num_queries: int = 8,
            n_centroids: int = 16, nprobe: int = 8) -> ray.data.Dataset:
    """IVF top-k: probe only the ``nprobe`` nearest buckets per query.

    The bucket assignment is one extra map_batches column; at 100 TB
    the buckets are the partitioning key of the stored index, so a
    query touches nprobe/n_centroids of the data.  Recall vs the
    brute-force baseline is asserted in tests.
    """
    qids, qmat = _load_queries(sf_dir, num_queries)

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = _train_centroids(emb, n_centroids)

    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probe_sets = [frozenset(row.tolist()) for row in probe]
    state_ref = ray.put((qids, qmat, cent, probe_sets))

    class IVFScorer:
        def __init__(self, state_ref, k: int) -> None:
            self.qids, self.qmat, self.cent, self.probe = ray.get(state_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            m = emb_matrix(batch["embedding"])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            bucket = np.argmax(m @ self.cent.T, axis=1)
            sims = self.qmat @ m.T
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(bucket, list(self.probe[qi]))
                if not mask.any():
                    continue
                cand_ids = ids[mask]
                cand_sims = sims[qi][mask]
                kk = min(self.k, len(cand_ids))
                order = np.lexsort((cand_ids, -cand_sims))[:kk]
                out_q.append(np.full(kk, self.qids[qi], dtype=np.int64))
                out_n.append(cand_ids[order])
                out_s.append(cand_sims[order])
            if not out_q:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()),
                     "neighbor_id": pa.array([], pa.int64()),
                     "sim": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    def ivf_batch(batch, state=None, k=k):
        key = ("ivf_scorer",
               state.hex() if hasattr(state, "hex") else id(state), k)
        sc = _WORKER_MEMO.get(key)
        if sc is None:
            sc = _WORKER_MEMO[key] = IVFScorer(state, k)
        return sc(batch)

    return (
        emb.map_batches(
            ivf_batch, fn_kwargs={"state": state_ref},
            batch_format="pyarrow",
        )
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pyarrow")
    )


# ----------------------------------------------------------------- LSH
def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    """Deterministic random-hyperplane matrix (n_bits, dim) float32."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack sign bits of mat @ planes.T into one int64 bucket per row."""
    bits = (mat @ planes.T) > 0                       # (n, n_bits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def _probe_buckets(sig: int, n_bits: int, radius: int) -> np.ndarray:
    """All bucket ids within Hamming distance <= radius of ``sig``
    (multi-probe set; tiny — sum of C(n_bits, i) for i <= radius)."""
    outs = [np.array([sig], dtype=np.int64)]
    flips = [np.int64(0)]
    for _ in range(radius):
        nxt = set()
        for f in flips:
            for b in range(n_bits):
                nf = int(f) | (1 << b)
                nxt.add(nf)
        flips = [np.int64(f) for f in nxt]
        outs.append(np.array([sig ^ f for f in flips], dtype=np.int64))
    return np.unique(np.concatenate(outs))


def ann_lsh(sf_dir: str, k: int = 10, num_queries: int = 8,
            n_bits: int = 8, n_tables: int = 6,
            radius: int = 1) -> ray.data.Dataset:
    """LSH-bucketed cosine top-k (the hash-partitioned scale path,
    alongside IVF): ``n_tables`` independent sign-LSH tables of
    ``n_bits`` seeded random hyperplanes each; a vector lives in one
    bucket per table, and a query scores the union over tables of the
    buckets within Hamming distance ``radius`` of its own signature
    (multi-probe).  At 100 TB each table's bucket id is a partition
    key of the stored index (the classic L-times space tradeoff), so a
    query touches ~n_tables * sum(C(n_bits, i), i<=radius) / 2^n_bits
    of the corpus.  Recall vs the brute-force baseline is asserted in
    tests; the plumbing's exactness via :func:`ann_lsh_fullprobe`."""
    qids, qmat = _load_queries(sf_dir, num_queries)
    planes = [
        _hyperplanes(qmat.shape[1], n_bits, seed=7 + 13 * t)
        for t in range(n_tables)
    ]
    probe_sets = [
        [
            _probe_buckets(int(s), n_bits, radius)
            for s in _signatures(qmat, planes[t])
        ]
        for t in range(n_tables)
    ]  # [table][query] -> admissible bucket ids
    state_ref = ray.put((qids, qmat, planes, probe_sets))

    class LSHScorer:
        def __init__(self, state_ref, k: int) -> None:
            (self.qids, self.qmat, self.planes,
             self.probe) = ray.get(state_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            m = emb_matrix(batch["embedding"])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            buckets = [_signatures(m, p) for p in self.planes]
            sims = self.qmat @ m.T
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = np.zeros(len(ids), dtype=bool)
                for t, bucket in enumerate(buckets):
                    mask |= np.isin(bucket, self.probe[t][qi])
                if not mask.any():
                    continue
                cand_ids = ids[mask]
                cand_sims = sims[qi][mask]
                kk = min(self.k, len(cand_ids))
                order = np.lexsort((cand_ids, -cand_sims))[:kk]
                out_q.append(np.full(kk, self.qids[qi], dtype=np.int64))
                out_n.append(cand_ids[order])
                out_s.append(cand_sims[order])
            if not out_q:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()),
                     "neighbor_id": pa.array([], pa.int64()),
                     "sim": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    def lsh_batch(batch, state=None, k=k):
        key = ("lsh_scorer",
               state.hex() if hasattr(state, "hex") else id(state), k)
        sc = _WORKER_MEMO.get(key)
        if sc is None:
            sc = _WORKER_MEMO[key] = LSHScorer(state, k)
        return sc(batch)

    return (
        read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(
            lsh_batch, fn_kwargs={"state": state_ref},
            batch_format="pyarrow",
        )
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pyarrow")
    )


def ann_lsh_fullprobe(sf_dir: str, k: int = 10, num_queries: int = 8,
                      n_bits: int = 8) -> ray.data.Dataset:
    """LSH exactness invariant: radius = n_bits probes every bucket of
    table 0, so the signature/probe/merge machinery must reproduce the
    brute-force top-k bit-exactly (same SQL oracle as ``ann_topk``);
    approximation quality at radius < n_bits stays covered by the
    recall pytest."""
    return ann_lsh(sf_dir, k=k, num_queries=num_queries,
                   n_bits=n_bits, n_tables=1, radius=n_bits)


def ann_ivf_fullprobe(sf_dir: str, k: int = 10, num_queries: int = 8,
                      n_centroids: int = 16) -> ray.data.Dataset:
    """IVF exactness invariant: probing ALL buckets reproduces the
    brute-force top-k exactly, so the bucket assignment, probe masking
    and per-query merge machinery get a hard driver-checked oracle
    (the same SQL as ``ann_topk``).  The approximate path
    (``nprobe < n_centroids``) stays covered by the recall-vs-brute
    pytest — approximation quality is not SQL-expressible, exactness
    of the plumbing is."""
    return ann_ivf(sf_dir, k=k, num_queries=num_queries,
                   n_centroids=n_centroids, nprobe=n_centroids)


# --------------------------------------- persisted IVF index (storage seam)
def _train_centroids(emb: ray.data.Dataset,
                     n_centroids: int) -> np.ndarray:
    """Deterministic centroid training on a bounded sample (first rows
    by storage order — at 100 TB the trainer never sees the corpus)."""
    sample = pa.concat_tables(
        [ray.get(r) for r in emb.limit(16384).to_arrow_refs()]
    )
    mat = emb_matrix(sample["embedding"])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return _kmeans(mat, min(n_centroids, len(mat)))


def _ensure_ivf_index(sf_dir: str, index_dir: str | None) -> str:
    """Resolve (and build exactly once) the per-corpus-version IVF
    index under the artifact root when no explicit ``index_dir`` is
    given.  Version-keyed on the EMBEDDINGS table — the source the
    index derives from — so a re-embedded corpus gets a fresh index
    instead of silently serving stale neighbors.  Publish is an atomic
    directory rename (the dedup_labels pattern)."""
    import os

    if index_dir is not None:
        return index_dir
    from .curate import _ARTIFACT_ROOT, _corpus_version

    final = os.path.join(
        _ARTIFACT_ROOT, "ivf_index",
        _corpus_version(sf_dir, table="embeddings") + "-c16")
    if not os.path.isdir(final):
        tmp = f"{final}.tmp-{os.getpid()}"
        build_ivf_index(sf_dir, tmp)
        try:
            os.rename(tmp, final)
        except OSError:            # concurrent builder won the race
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return final


def _load_index_centroids(index_dir: str) -> np.ndarray:
    """The stored centroid matrix, centroid_id-ordered, f64."""
    from .. import storage

    bk = storage.backend()
    t = bk.read_fragment(bk.fragment_path(index_dir, "centroids"))
    order = np.argsort(
        t["centroid_id"].to_numpy(zero_copy_only=False))
    return emb_matrix(
        t["centroid"].take(pa.array(order, pa.int64()))
    ).astype(np.float64)


def _index_bucket_files(index_dir: str,
                        buckets: "list[int] | None" = None
                        ) -> list[str]:
    """Fragment files of the given buckets (all when None), filtered
    through the backend's fragment listing so torn ``*.tmp`` files
    from a crashed build are never scanned."""
    import glob as _glob
    import os

    from .. import storage

    bk = storage.backend()
    if buckets is None:
        dirs = sorted(_glob.glob(os.path.join(index_dir, "bucket=*")))
    else:
        dirs = [d for kb in buckets
                for d in [os.path.join(index_dir, f"bucket={kb}")]
                if os.path.isdir(d)]
    return [f for d in dirs for f in bk.list_fragments(d)]


def build_ivf_index(sf_dir: str, index_dir: str,
                    n_centroids: int = 16) -> None:
    """Persist the IVF-partitioned vector index through the storage
    seam: centroids at ``index_dir/centroids``, vectors at
    ``index_dir/bucket=K/`` with each bucket its own sub-table — the
    STORED partitioning the ann_ivf docstring promises, so a query
    touches ``nprobe / n_centroids`` of the data at the read
    (directory pruning, not a post-read filter).  Streaming sink: one
    routed exchange groups vectors by nearest centroid and each group
    task writes its own fragment (the :func:`dedup.build_lsh_index`
    shape)."""
    import os
    import uuid

    from .. import storage
    from .common import deref

    bk = storage.backend()
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = _train_centroids(emb, n_centroids)
    # a build is a full REBUILD: clear any prior contents so a rerun
    # (or a crashed build's torn temp files) can never leave each
    # vector duplicated across uuid-named fragments
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    bk.write_fragment_atomic(
        pa.table({
            "centroid_id": pa.array(
                np.arange(len(cent), dtype=np.int64), pa.int64()),
            "centroid": pa.array(
                [c.tolist() for c in cent.astype(np.float64)],
                pa.list_(pa.float64())),
        }),
        bk.fragment_path(index_dir, "centroids"))
    cent_ref = ray.put(np.ascontiguousarray(cent.astype(np.float64)))

    def assign(b: pa.Table, cref=None) -> pa.Table:
        c = deref(cref)
        m = emb_matrix(b["embedding"]).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        bucket = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return b.append_column("bucket", pa.array(bucket, pa.int64()))

    def write_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        kb = int(g["bucket"][0].as_py())
        d = os.path.join(index_dir, f"bucket={kb}")
        os.makedirs(d, exist_ok=True)
        bk2 = storage.backend()
        # bucket travels as a stored column too, so the query path can
        # scan all probed buckets as ONE dataset (blocks may coalesce
        # fragments across buckets; the scorer masks per row)
        bk2.write_fragment_atomic(
            g.select(["vec_id", "embedding", "bucket"]),
            bk2.fragment_path(d, f"part-{uuid.uuid4().hex[:12]}"))
        return pa.table({"bucket": pa.array([kb], pa.int64()),
                         "n": pa.array([g.num_rows], pa.int64())})

    # consume the tiny per-bucket manifest to drive execution
    (
        emb.map_batches(assign, fn_kwargs={"cref": cent_ref},
                        batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )


def ann_ivf_indexed(sf_dir: str, k: int = 10, num_queries: int = 8,
                    nprobe: int = 8, index_dir: str | None = None
                    ) -> ray.data.Dataset:
    """IVF top-k against the PERSISTED index: centroids load from the
    index (never retrained at query time), queries pick their
    ``nprobe`` buckets, and ONLY those ``bucket=K/`` sub-tables are
    scanned — the steady-state serving path where query cost is
    ``nprobe/n_centroids`` of the corpus at the READ, not post-read.
    With ``index_dir=None`` the index is built once per corpus version
    under the artifact root (the dedup_labels pattern).  Bit-identical
    to :func:`ann_ivf` at the same centroids (pytest); ``nprobe = all``
    reproduces brute-force exactly (oracle row)."""
    from .. import storage
    from .common import deref

    index_dir = _ensure_ivf_index(sf_dir, index_dir)
    bk = storage.backend()
    cent = _load_index_centroids(index_dir)

    qids, qmat = _load_queries(sf_dir, num_queries)
    nprobe = min(nprobe, len(cent))
    probe = np.argsort(-(qmat @ cent.T), axis=1, kind="stable")[:, :nprobe]
    probe_sets = [frozenset(row.tolist()) for row in probe]
    needed = sorted(set().union(*probe_sets)) if probe_sets else []
    files = _index_bucket_files(index_dir, needed)
    if not files:
        return ray.data.from_arrow(pa.schema(
            [("query_id", pa.int64()), ("neighbor_id", pa.int64()),
             ("rank", pa.int64())]).empty_table())
    state_ref = ray.put((qids, qmat, probe_sets))

    def scorer(b: pa.Table, state=None, k_=k) -> pa.Table:
        # the stored bucket column drives the probe mask — buckets are
        # assigned at BUILD time, never recomputed at query time
        sids, smat, sprobes = deref(state)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        bucket = b["bucket"].to_numpy(zero_copy_only=False)
        m = emb_matrix(b["embedding"]).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = smat @ m.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(sids)):
            mask = np.isin(bucket, list(sprobes[qi]))
            if not mask.any():
                continue
            cid, csim = ids[mask], sims[qi][mask]
            kk = min(k_, cid.size)
            o = np.lexsort((cid, -csim))[:kk]
            out_q.append(np.full(kk, sids[qi], dtype=np.int64))
            out_n.append(cid[o])
            out_s.append(csim[o])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return (
        bk.read_dataset(files,
                        columns=["vec_id", "embedding", "bucket"])
        .map_batches(scorer, fn_kwargs={"state": state_ref},
                     batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pyarrow")
    )


def ann_ivf_indexed_fullprobe(sf_dir: str, k: int = 10,
                              num_queries: int = 8) -> ray.data.Dataset:
    """Every bucket of the persisted index probed — must equal
    brute-force top-k bit for bit (same SQL oracle as ann_topk): the
    hard check that the index write/read/merge path loses nothing."""
    return ann_ivf_indexed(sf_dir, k=k, num_queries=num_queries,
                           nprobe=1 << 30)


# ------------------------------------------- distributed k-means (Lloyd)
_KM_K = 8
_KM_ITERS = 2


def _km_seeds(emb: ray.data.Dataset, k: int) -> np.ndarray:
    """Deterministic seeds: embeddings of the k SMALLEST vec_ids,
    gathered by a per-block partial top-k (each block emits at most k
    candidate rows) + a tiny driver-side final select — never a full
    sort or a driver materialization of the corpus."""
    def local_min_k(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        take = np.argsort(ids)[:k]
        return b.take(pa.array(take, pa.int64()))

    cand = emb.map_batches(local_min_k, batch_format="pyarrow")
    t = pa.concat_tables(
        list(cand.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))[:k]
    t = t.take(pa.array(order, pa.int64()))
    return emb_matrix(t["embedding"]).astype(np.float64)


def _km_cosine(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, k) cosine similarities in float64: dot(a, c)/(|a||c|) —
    the same formula DuckDB's list_cosine_similarity evaluates, so
    argmax decisions agree (cluster margins are ~1e-1; cross-engine
    summation-order drift is ~1e-15)."""
    num = mat @ cent.T
    den = (np.linalg.norm(mat, axis=1, keepdims=True)
           * np.linalg.norm(cent, axis=1, keepdims=True).T)
    return num / den


def kmeans_assign(sf_dir: str, k: int = _KM_K,
                  iters: int = _KM_ITERS) -> ray.data.Dataset:
    """(vec_id, cluster): k-means cluster assignment after ``iters``
    Lloyd updates from deterministic seeds (the k lowest vec_ids) —
    the semantic-clustering primitive (SemDeDup-style curation buckets,
    IVF coarse quantizers) as a first-class distributed operator.

    Scale shape per iteration: centroids (k x dim, tiny) broadcast via
    ``ray.put``; ONE streaming pass computes each block's assignments
    and collapses them to k partial rows (sum-vector + count) — the
    shuffle moves k rows per block, never vectors.  Driver reduces
    k x nblocks partials (tiny) and re-broadcasts.  Final pass emits
    assignments only.  Empty clusters keep their previous centroid.
    The projected (vec_id, embedding) read is materialized ONCE and
    reused across the iters+1 passes (same checkpoint pattern as
    link_rank's iterative state).

    Assignment = argmax cosine, ties to the lowest cluster id; floats
    stay float64 end-to-end to track the SQL oracle's double math.
    """
    emb = read(sf_dir, "embeddings",
               columns=["vec_id", "embedding"]).materialize()
    cent = _km_seeds(emb, k)
    dim = cent.shape[1]

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref) if not isinstance(_ref, np.ndarray) else _ref
            mat = emb_matrix(b["embedding"]).astype(np.float64)
            a = np.argmax(_km_cosine(mat, c), axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, mat)
            cnt = np.bincount(a, minlength=c.shape[0])
            return pa.table({
                "cid": pa.array(np.arange(c.shape[0]), pa.int64()),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        parts = pa.concat_tables(list(
            emb.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ))
        cid = parts["cid"].to_numpy(zero_copy_only=False)
        n = parts["n"].to_numpy(zero_copy_only=False)
        flat = np.asarray(
            parts["s"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
        ).reshape(-1, dim)
        sums = np.zeros((k, dim))
        np.add.at(sums, cid, flat)
        cnt = np.zeros(k, dtype=np.int64)
        np.add.at(cnt, cid, n)
        nonempty = cnt > 0
        cent = cent.copy()
        cent[nonempty] = sums[nonempty] / cnt[nonempty, None]

    ref = ray.put(cent)

    def assign(b: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref) if not isinstance(_ref, np.ndarray) else _ref
        mat = emb_matrix(b["embedding"]).astype(np.float64)
        a = np.argmax(_km_cosine(mat, c), axis=1)
        return pa.table({
            "vec_id": b["vec_id"],
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        })

    return emb.map_batches(assign, batch_format="pyarrow")


def kmeans_assign_oracle_sql(k: int = _KM_K, iters: int = _KM_ITERS,
                             dim: int = 64) -> str:
    """Chained-CTE Lloyd iterations: assignment via
    list_cosine_similarity argmax (row_number ties to lowest cid),
    centroid update via per-dimension avg re-packed with
    list(... ORDER BY dim); empty clusters COALESCE to the previous
    centroid — mirroring the engine exactly."""
    ctes = [f"""emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
  FROM emb ORDER BY vec_id LIMIT {k}
)"""]
    for i in range(iters + 1):
        ctes.append(f"""a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.v) DESC, c.cid
           ) AS rn
    FROM emb e CROSS JOIN c{i} c) WHERE rn = 1
)""")
        if i < iters:
            ctes.append(f"""c{i + 1} AS (
  SELECT c{i}.cid, COALESCE(u.nv, c{i}.v) AS v
  FROM c{i} LEFT JOIN (
    SELECT cid, list(av ORDER BY dim) AS nv FROM (
      SELECT a{i}.cid, d.dim, avg(e.v[d.dim]) AS av
      FROM a{i} JOIN emb e USING (vec_id)
      CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS dim) d
      GROUP BY a{i}.cid, d.dim) GROUP BY cid) u USING (cid)
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT vec_id, cid AS cluster FROM a{iters}")


# ------------------------------------------- radius (range) search
_RANGE_TAU = 0.35


def ann_range(sf_dir: str, tau: float = _RANGE_TAU,
              num_queries: int = 8) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank): RADIUS similarity search — every
    corpus vector with cosine >= ``tau`` per query, ranked by
    (sim DESC, neighbor_id ASC).  The "find everything similar enough"
    retrieval shape, complementing top-k (ann_topk) — the result size
    is data-driven, not fixed.

    Scale shape: the threshold filter IS the combiner — each batch
    emits only its qualifying rows after one matmul against the
    broadcast query matrix, so shuffled rows per query = radius
    selectivity x corpus, never the corpus itself.  The final
    per-query merge only sorts qualifying rows (bounded by
    selectivity; at 100 TB pick tau accordingly or cap with a top-k
    guard).  Scoring runs in float64 here — unlike top-k (rank-only
    output, margins >> f32 error), a global threshold compares
    bit-for-bit against the float64 oracle, and the (Q x batch)
    matmul is far below the big-dgemm pathology noted in emb_matrix.
    """
    from .common import deref

    q_ref = ray.put(_load_queries(sf_dir, num_queries))

    def radius_score(batch: pa.Table, q_ref=None) -> pa.Table:
        qids, qmat = deref(q_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        mat = emb_matrix(batch["embedding"]).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qmat.astype(np.float64) @ mat.T            # (Q, batch)
        qi, ni = np.nonzero(sims >= tau)
        return pa.table({
            "query_id": pa.array(qids[qi], pa.int64()),
            "neighbor_id": pa.array(ids[ni], pa.int64()),
            "sim": pa.array(sims[qi, ni], pa.float64()),
        })

    def rank_group(g: pa.Table) -> pa.Table:
        sim = g["sim"].to_numpy(zero_copy_only=False)
        nid = g["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sim))
        t = g.take(pa.array(order, pa.int64()))
        return pa.table({
            "query_id": t["query_id"],
            "neighbor_id": t["neighbor_id"],
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int64),
                pa.int64()),
        })

    return (
        read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(radius_score, fn_kwargs={"q_ref": q_ref},
                     batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(rank_group, batch_format="pyarrow")
    )


def oracle_ann_range(tau: float = _RANGE_TAU,
                     num_queries: int = 8) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {num_queries}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
       ) AS BIGINT) AS rank
FROM scored WHERE sim >= {tau}
"""


# ----------------------------------------------- k-NN graph build
_KNN_K = 5


def _knn_pair_kernel(ta: pa.Table, tb: pa.Table, k: int,
                     tile: int = 2048) -> pa.Table:
    """Local top-k candidates from source block ta against dest block
    tb (self-matches masked).  float64 tiled matmul: the adjacent-rank
    sim gaps in this corpus bottom out ~1.4e-6 — far above f64
    accumulation-order noise (~1e-15) but within f32 error, so ranking
    (unlike ann_topk's 8-query case) needs the double path."""
    ia = ta["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ma = emb_matrix(ta["embedding"]).astype(np.float64)
    ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
    ib = tb["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mb = emb_matrix(tb["embedding"]).astype(np.float64)
    mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
    out = []
    for sa in range(0, len(ia), tile):
        aid = ia[sa:sa + tile]
        sims = ma[sa:sa + tile] @ mb.T
        sims[aid[:, None] == ib[None, :]] = -2.0  # mask self
        kk = min(k, sims.shape[1])
        # per-row local top-k: argpartition then exact ordering
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(part.shape[0]), kk)
        cols = part.ravel()
        out.append(pa.table({
            "vec_id": pa.array(aid[rows], pa.int64()),
            "neighbor_id": pa.array(ib[cols], pa.int64()),
            "sim": pa.array(sims[rows, cols], pa.float64()),
        }))
    return pa.concat_tables(out)


_knn_block_pair = ray.remote(_knn_pair_kernel)

_KNN_OUT_SCHEMA = pa.schema([
    ("vec_id", pa.int64()), ("neighbor_id", pa.int64()),
    ("rank", pa.int64()),
])


def _knn_coarse_merge(cands: ray.data.Dataset, k: int,
                      parts: int = 64) -> ray.data.Dataset:
    """Global per-source top-k over candidate rows (vec_id,
    neighbor_id, sim) — ONE exchange keyed by ``mix64(vec_id) %
    parts`` and one vectorized lexsort + segmented-rank sweep per
    partition.  NEVER ``groupby(vec_id)``: vec_id is corpus-cardinality
    and Ray's per-key path dominates beyond ~10⁴ groups (measured at
    common.hash_keyed_agg).  Candidate generators must not emit a
    (vec_id, neighbor_id) pair twice (exact blocks are disjoint; an
    IVF member lives in exactly one bucket), so rank = segmented
    position after the (vec_id, -sim, neighbor_id) lexsort."""
    from .text import mix64

    def keyed(b: pa.Table) -> pa.Table:
        v = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("part", pa.array(
            (mix64(v.view(np.uint64)) % np.uint64(parts)).astype(
                np.int64)))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _KNN_OUT_SCHEMA.empty_table()
        vid = g["vec_id"].to_numpy(zero_copy_only=False)
        sim = g["sim"].to_numpy(zero_copy_only=False)
        nid = g["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -sim, vid))
        vid, nid = vid[order], nid[order]
        first = np.ones(vid.size, dtype=bool)
        first[1:] = vid[1:] != vid[:-1]
        gstart = np.flatnonzero(first)
        gcnt = np.diff(np.r_[gstart, vid.size])
        rank = (np.arange(vid.size, dtype=np.int64)
                - np.repeat(gstart, gcnt) + 1)
        keep = rank <= k
        return pa.table({
            "vec_id": pa.array(vid[keep], pa.int64()),
            "neighbor_id": pa.array(nid[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
        })

    return (
        cands.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )


def knn_graph(sf_dir: str, k: int = _KNN_K,
              block_rows: int = 4096) -> ray.data.Dataset:
    """(vec_id, neighbor_id, rank): the exact k-nearest-neighbor GRAPH
    over the whole embedding corpus (every vector a source, self
    excluded) — the substrate for graph-based clustering, kNN-descent
    seeding and hard-negative mining.

    Scale shape: a blocked self-join (cf. embedding_dup_pairs) — the
    corpus is cut into angularly-arbitrary blocks, every ordered block
    pair runs as one Ray task emitting LOCAL top-k rows per source
    (k x |block| rows, never |block|²), and the coarse-partition merge
    reduces per-source candidates (one exchange, vectorized segmented
    rank — no per-key groupby).  Exact is O(B²) tasks by construction
    — the small-corpus / oracle baseline; the 100-TB path is
    :func:`knn_graph_ivf` (IVF-bucketed candidate generation, linear
    tasks, recall-tested against this exact build).  Raw tasks per the
    custom-operator rule: a top-k self-join has no Dataset-API
    expression.
    """
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    mat = emb.materialize()
    n_rows = mat.count()
    n_blocks = max(1, -(-n_rows // block_rows))
    refs = list(mat.repartition(n_blocks).to_arrow_refs())
    tasks = [
        _knn_block_pair.remote(ra, rb, k)
        for ra in refs for rb in refs
    ]
    return _knn_coarse_merge(ray.data.from_arrow_refs(tasks), k)


def knn_graph_ivf(sf_dir: str, k: int = _KNN_K,
                  n_centroids: int = 16, nprobe: int = 4
                  ) -> ray.data.Dataset:
    """(vec_id, neighbor_id, rank): the APPROXIMATE k-NN graph — the
    100-TB path :func:`knn_graph`'s docstring promises.  Work is
    linear in the corpus instead of O(B²) block pairs:

      1. centroids train on a bounded deterministic sample (the
         ann_ivf recipe — at 100 TB the trainer never sees the corpus);
      2. ONE routed exchange: every vector ships to its nearest
         centroid's bucket as a MEMBER and to its ``nprobe`` nearest
         buckets as a SOURCE (1 + nprobe copies — the standard IVF
         build amplification, tunable);
      3. per bucket, one tiled f64 matmul emits each source's LOCAL
         top-k against that bucket's members (the
         :func:`_knn_pair_kernel` kernel — k rows per source per
         bucket, never |bucket|²);
      4. the same coarse-partition merge as exact knn_graph reduces
         the <= nprobe·k candidates per source.

    The bucket groupby is over ``n_centroids`` keys — a DESIGN
    cardinality (≈ sqrt(corpus) at scale, 16 here), never the corpus;
    a member lives in exactly one bucket so no (vec_id, neighbor_id)
    pair is emitted twice.  Recall vs the exact graph is pytest-pinned;
    ``nprobe = n_centroids`` (:func:`knn_graph_ivf_fullprobe`) makes
    every source see every member — bit-identical to exact knn_graph
    and oracle-checked against the same SQL.
    """
    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = _train_centroids(emb, n_centroids)
    nprobe = min(nprobe, len(cent))
    cent_ref = ray.put(np.ascontiguousarray(cent.astype(np.float64)))
    return _knn_ivf_graph(emb, cent_ref, nprobe, k,
                          stored_member=False)


def _knn_ivf_graph(vectors: ray.data.Dataset, cent_ref,
                   nprobe: int, k: int,
                   stored_member: bool) -> ray.data.Dataset:
    """Shared IVF knn-graph machinery: route every vector to its
    member bucket (the STORED ``bucket`` column when
    ``stored_member``, else the f64 argmax — identical values by
    construction, build-time assignment runs the same argmax) plus
    its ``nprobe`` nearest buckets as a source; per-bucket
    :func:`_knn_pair_kernel`; coarse-partition merge."""
    from .common import deref

    def route(b: pa.Table, cref=None, npb=nprobe) -> pa.Table:
        c = deref(cref)
        emb_col = b["embedding"]
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = ids.size
        if n == 0:
            return pa.table({
                "bucket": pa.array([], pa.int64()),
                "role": pa.array([], pa.int8()),
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], emb_col.type),
            })
        m = emb_matrix(b["embedding"]).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ c.T                                    # (n, C)
        # stable sort: probe[:, 0] == argmax even on tied centroids,
        # so the member bucket is always among the probed ones
        probe = np.argsort(-sims, axis=1, kind="stable")[:, :npb]
        member = (
            b["bucket"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            if stored_member else probe[:, 0].astype(np.int64))
        idx = np.tile(np.arange(n, dtype=np.int64), 1 + npb)
        buckets = np.concatenate(
            [member] + [probe[:, j] for j in range(npb)])
        roles = np.concatenate(
            [np.zeros(n, np.int8), np.ones(n * npb, np.int8)])
        return pa.table({
            "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
            "role": pa.array(roles, pa.int8()),
            "vec_id": pa.array(ids[idx], pa.int64()),
            "embedding": emb_col.take(pa.array(idx, pa.int64())),
        })

    cand_schema = pa.schema([
        ("vec_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("sim", pa.float64()),
    ])

    def bucket_knn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return cand_schema.empty_table()
        role = g["role"].to_numpy(zero_copy_only=False)
        mem = g.filter(pa.array(role == 0))
        src = g.filter(pa.array(role == 1))
        if mem.num_rows == 0 or src.num_rows == 0:
            return cand_schema.empty_table()
        return _knn_pair_kernel(
            src.select(["vec_id", "embedding"]),
            mem.select(["vec_id", "embedding"]), k)

    cands = (
        vectors.map_batches(route, fn_kwargs={"cref": cent_ref},
                            batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_knn, batch_format="pyarrow")
    )
    return _knn_coarse_merge(cands, k)


def knn_graph_ivf_indexed(sf_dir: str, k: int = _KNN_K,
                          nprobe: int = 4,
                          index_dir: str | None = None
                          ) -> ray.data.Dataset:
    """knn_graph_ivf served from the PERSISTED IVF index: member
    bucket assignments are READ from the ``bucket=K/`` partitions
    (stored at build time, never recomputed), centroids load from the
    index, and only the source-probe routing runs at query time — the
    steady-state shape where one index build amortizes across every
    graph (re)build, hard-negative pass and dedup sweep over the same
    corpus version.  Bit-identical to :func:`knn_graph_ivf` at the
    same centroids (pytest: both argmax/probe formulas run in f64 on
    the same training output)."""
    from .. import storage

    index_dir = _ensure_ivf_index(sf_dir, index_dir)
    cent = _load_index_centroids(index_dir)
    nprobe = min(nprobe, len(cent))
    cent_ref = ray.put(np.ascontiguousarray(cent))
    idx = storage.backend().read_dataset(
        _index_bucket_files(index_dir),
        columns=["vec_id", "embedding", "bucket"])
    return _knn_ivf_graph(idx, cent_ref, nprobe, k,
                          stored_member=True)


def knn_graph_ivf_fullprobe(sf_dir: str, k: int = _KNN_K,
                            n_centroids: int = 16) -> ray.data.Dataset:
    """knn_graph_ivf with every bucket probed — exact by construction
    (each source meets every member exactly once, same f64 kernel and
    tie order as the block-pair build), so the brute-force SQL oracle
    applies verbatim.  The correctness anchor for the IVF machinery."""
    return knn_graph_ivf(sf_dir, k=k, n_centroids=n_centroids,
                         nprobe=n_centroids)


def knn_graph_oracle_sql(k: int = _KNN_K) -> str:
    return f"""
SELECT vec_id, neighbor_id, rank FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         CAST(row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id ASC
         ) AS BIGINT) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
) WHERE rank <= {k}
"""


# ------------------------------------------- per-label centroids
def embedding_centroids(sf_dir: str) -> ray.data.Dataset:
    """(label, dim, centroid_q, n): the per-label mean embedding,
    QUANTIZED to exact integers — the class-prototype reduction
    (nearest-class-mean classifiers, cluster summaries, drift checks).

    Exactness discipline: each float32 component quantizes to
    ``floor(x·10⁶)`` int64 FIRST (float32→float64 and the multiply are
    bit-identical in numpy and DuckDB), so the sums are
    order-independent integers; the mean uses TRUNCATING division to
    match DuckDB's ``//`` on signed values.

    Scale shape: one pass — each block collapses to (label × dim)
    partial sums via one ``np.add.at`` on a fused label·dim index (no
    per-label loop, no unnest blowup leaving the task); partials ride
    the two-phase combiner keyed by (label, dim) — ≤ labels×dims rows
    exchanged regardless of corpus size.
    """
    from .common import two_phase_agg

    def partial(b: pa.Table) -> pa.Table:
        mat = emb_matrix(b["embedding"])
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = mat.shape[1]
        q = np.floor(mat.astype(np.float64) * 1_000_000.0).astype(
            np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((ul.size, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ul, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    ul.size), pa.int64()),
            "s_q": pa.array(sums.ravel(), pa.int64()),
            "n_q": pa.array(np.repeat(cnt, d), pa.int64()),
        })

    agg = two_phase_agg(
        read(sf_dir, "embeddings", columns=["embedding", "label"])
        .map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], sums={"s_q": "s", "n_q": "n"},
    )

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        cq = np.sign(s) * (np.abs(s) // n)      # trunc, matches SQL //
        return pa.table({
            "label": b["label"], "dim": b["dim"],
            "centroid_q": pa.array(cq, pa.int64()),
            "n": b["n"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_EMBEDDING_CENTROIDS = """
WITH x AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(sum(q) // count(*) AS BIGINT) AS centroid_q,
       count(*) AS n
FROM x GROUP BY label, dim
"""


# --------------------------------- k-center / farthest-point coreset
_FPS_K = 12


def farthest_point_sample(sf_dir: str, k: int = _FPS_K) -> pa.Table:
    """(step, vec_id): greedy k-center coreset over the embedding
    corpus — start at the smallest vec_id, then repeatedly pick the
    vector whose min cosine DISTANCE to the chosen set is largest
    (quantized to 1e-6 so both engines compare integers; ties break to
    the smallest vec_id).  The diversity-selection pass a training
    pipeline runs to pick k maximally-spread exemplars.

    Scale shape: ZERO shuffles.  State is a per-vector running
    min-distance column materialized once per round; each of the k
    rounds broadcasts only the last chosen center (one dim-length
    vector), streams one fused update (dmin = min(dmin, 1 - m @ c))
    over the blocks, and reduces per-block top-1 candidates —
    k × n distance evaluations total, exactly the sequential greedy's
    work, with k small collects of (#blocks) rows.  2^63 is ~9e18 so
    the 1e-6 quantization never overflows int64 on a [0, 2] distance.
    """
    import pyarrow.compute as pc

    from .common import collect_small

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norm_rows(b: pa.Table) -> np.ndarray:
        m = emb_matrix(b["embedding"]).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        np.divide(m, n, out=m, where=n > 0)
        return m

    _emb_t = pa.list_(pa.float64())

    def prep(b: pa.Table) -> pa.Table:
        m = norm_rows(b)
        offsets = pa.array(
            (np.arange(b.num_rows + 1) * m.shape[1]).astype(np.int32))
        return pa.table({
            "vec_id": pc.cast(b["vec_id"], pa.int64()),
            "emb": pa.ListArray.from_arrays(
                offsets, pa.array(m.ravel(), pa.float64())),
            "dmin": pa.array(np.full(b.num_rows, np.inf), pa.float64()),
        })

    state = emb.map_batches(prep, batch_format="pyarrow").materialize()

    def mat(col) -> np.ndarray:
        la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = pc.list_flatten(la).to_numpy(zero_copy_only=False)
        return flat.reshape(len(la), -1)

    def first_candidate(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        i = int(np.argmin(b["vec_id"].to_numpy(zero_copy_only=False)))
        return b.slice(i, 1)

    seed = collect_small(
        state.map_batches(first_candidate, batch_format="pyarrow"),
        pa.schema([("vec_id", pa.int64()), ("emb", _emb_t),
                   ("dmin", pa.float64())]),
    )
    if seed.num_rows == 0:
        return pa.table({"step": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    i0 = int(seed["vec_id"].to_numpy(zero_copy_only=False).min())
    seed = seed.filter(pc.equal(seed["vec_id"], i0))
    chosen_ids = [i0]
    center = mat(seed["emb"])[0]

    cand_schema = pa.schema([
        ("qd", pa.int64()), ("vec_id", pa.int64()), ("emb", _emb_t),
    ])

    for _ in range(1, k):
        c = center  # bind loop value

        def update(b: pa.Table, cv=c) -> pa.Table:
            if b.num_rows == 0:
                return b
            m = mat(b["emb"])
            d = np.maximum(1.0 - m @ cv, 0.0)
            dm = np.minimum(
                b["dmin"].to_numpy(zero_copy_only=False), d)
            return pa.table({"vec_id": b["vec_id"], "emb": b["emb"],
                             "dmin": pa.array(dm, pa.float64())})

        state = state.map_batches(
            update, batch_format="pyarrow").materialize()

        def top1(b: pa.Table, ex=tuple(chosen_ids)) -> pa.Table:
            if b.num_rows == 0:
                return cand_schema.empty_table()
            ids = b["vec_id"].to_numpy(zero_copy_only=False)
            qd = np.floor(
                b["dmin"].to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)
            ok = ~np.isin(ids, np.asarray(ex, np.int64))
            if not ok.any():
                return cand_schema.empty_table()
            qi, ii = qd[ok], ids[ok]
            best = np.lexsort((ii, -qi))[0]
            row = b.slice(int(np.flatnonzero(ok)[best]), 1)
            return pa.table({
                "qd": pa.array([int(qi[best])], pa.int64()),
                "vec_id": row["vec_id"],
                "emb": row["emb"],
            })

        cands = collect_small(
            state.map_batches(top1, batch_format="pyarrow"),
            cand_schema)
        if cands.num_rows == 0:
            break
        qd = cands["qd"].to_numpy(zero_copy_only=False)
        ids = cands["vec_id"].to_numpy(zero_copy_only=False)
        w = int(np.lexsort((ids, -qd))[0])
        chosen_ids.append(int(ids[w]))
        center = mat(cands["emb"])[w]

    return pa.table({
        "step": pa.array(range(1, len(chosen_ids) + 1), pa.int64()),
        "vec_id": pa.array(chosen_ids, pa.int64()),
    })


def farthest_point_sample_oracle_sql(k: int = _FPS_K) -> str:
    return f"""
WITH RECURSIVE sel AS (
  SELECT 1 AS step,
         [(SELECT min(vec_id) FROM embeddings)] AS chosen
  UNION ALL
  SELECT step + 1,
         list_append(chosen, (
           SELECT e.vec_id FROM embeddings e
           WHERE NOT list_contains(sel.chosen, e.vec_id)
           ORDER BY (
             SELECT CAST(floor(min(greatest(
                      1 - list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 0))
                      * 1000000) AS BIGINT)
             FROM embeddings c
             WHERE list_contains(sel.chosen, c.vec_id)
           ) DESC, e.vec_id ASC
           LIMIT 1))
  FROM sel WHERE step < {k}
)
SELECT unnest(range(1, step + 1)) AS step,
       unnest(chosen) AS vec_id
FROM sel WHERE step = (SELECT max(step) FROM sel)
"""


# ------------------------------------------------- distributed PCA
def embedding_pca(sf_dir: str, k: int = 2, scale: int = 1_000_000,
                  parts: int | None = None) -> ray.data.Dataset:
    """(component, dim_idx, eigenvalue_q, loading_q): the top-``k``
    principal components of the embedding corpus — distributed
    covariance PCA, the linear-algebra reduction pattern (whitening,
    drift monitoring, spectral diagnostics for embedding spaces).

    Scale shape: ONE streaming pass; each block collapses to its
    dim×dim Gram partial + mean partial (a constant w.r.t. rows —
    dim²+dim floats per block, the same "shuffle carries sketch state,
    never rows" discipline as the sketch family).  The covariance
    eigendecomposition runs driver-side on the dim×dim fold — exact
    for any corpus size, no iteration, no broadcast rounds (for
    dim ≲ 10³; beyond that switch to randomized-sketch or power
    iteration over the same partials).  DETERMINISM: float partials
    are summed in content-sorted order, so the result is independent
    of block arrival order and parallelism (pytest-pinned); the
    eigenvector sign is fixed by making the largest-|loading| entry
    positive (ties → lowest dim).  Not SQL-expressible — rows-only
    driver check; the hard checks are the numpy eigendecomposition
    parity and block-layout invariance tests (tests/test_curate.py
    companion style, see tests/test_new_ops_edge_cases.py).
    """
    from .common import collect_small

    emb = read(sf_dir, "embeddings", columns=["embedding"])
    if parts:
        emb = emb.repartition(parts)

    empty_partials = pa.schema([
        ("g", pa.list_(pa.float64())), ("s", pa.list_(pa.float64())),
        ("n", pa.int64()),
    ]).empty_table()

    def gram_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # zero-row partial, not a degenerate (g=[], n=0) row: the
            # driver fold reshapes g into (dim, dim), so an empty-block
            # row would poison the fold (same guard as block_max in
            # customer_rfm; Ray's skip-empty-blocks behavior is not
            # contractual)
            return empty_partials
        mat = emb_matrix(b["embedding"]).astype(np.float64)
        g = mat.T @ mat
        s = mat.sum(axis=0)
        return pa.table({
            "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "n": pa.array([mat.shape[0]], pa.int64()),
        })

    partials = collect_small(
        emb.map_batches(gram_partial, batch_format="pyarrow"),
        pa.schema([("g", pa.list_(pa.float64())),
                   ("s", pa.list_(pa.float64())), ("n", pa.int64())]),
    )
    out_schema = pa.schema([
        ("component", pa.int64()), ("dim_idx", pa.int64()),
        ("eigenvalue_q", pa.int64()), ("loading_q", pa.int64()),
    ])
    if partials.num_rows == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    gs = [np.asarray(v, dtype=np.float64)
          for v in partials["g"].to_pylist()]
    ss = [np.asarray(v, dtype=np.float64)
          for v in partials["s"].to_pylist()]
    ns = partials["n"].to_numpy(zero_copy_only=False)
    # content-sorted fold: summation order is a function of the partial
    # VALUES, not of scheduling, so reruns at any parallelism agree bit
    # for bit.
    order = np.argsort([g.tobytes() for g in gs], kind="stable")
    dim = int(round(np.sqrt(gs[0].size)))
    G = np.zeros((dim, dim))
    S = np.zeros(dim)
    N = 0
    for i in order:
        G += gs[i].reshape(dim, dim)
        S += ss[i]
        N += int(ns[i])
    C = G / N - np.outer(S / N, S / N)
    w, v = np.linalg.eigh(C)  # ascending
    out_c, out_d, out_ev, out_ld = [], [], [], []
    for c in range(k):
        ev = w[-1 - c]
        vec = v[:, -1 - c]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        q = np.floor(vec * scale).astype(np.int64)
        out_c.extend([c] * dim)
        out_d.extend(range(dim))
        out_ev.extend([int(np.floor(ev * scale))] * dim)
        out_ld.extend(q.tolist())
    return ray.data.from_arrow(pa.table({
        "component": pa.array(out_c, pa.int64()),
        "dim_idx": pa.array(out_d, pa.int64()),
        "eigenvalue_q": pa.array(out_ev, pa.int64()),
        "loading_q": pa.array(out_ld, pa.int64()),
    }))
