"""Deduplication operators over ``documents`` / ``embeddings``.

Five dedup strategies a training-data pipeline needs, each expressed
Ray-Data-first:

- **exact**: content hash → `groupby(hash)` keep-min — the distributed
  analog of the reference's stable-id dedup (README.md:520-531, DB
  uniques 001_initial_schema.sql:4,19) with a SQL oracle.
- **MinHash + LSH**: shingle → minhash sig → band buckets → groupby
  band → candidate pairs → exact-Jaccard verify.  The only shuffle is
  over tiny (band_key, doc_id) rows, never the documents.
- **SimHash**: 64-bit projection fingerprint, single pass.
- **n-gram Jaccard**: blockwise sparse all-pairs (small side broadcast
  once via ``ray.put``) — the brute-force oracle path for MinHash; the
  scale path IS MinHash/LSH.
- **embedding cosine**: blockwise matmul vs a broadcast normalized
  matrix; ≥ threshold pairs (SQL oracle via list_cosine_similarity).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min

from .common import read
from .text import token_hashes

# ------------------------------------------------------------- exact


def _md5_batch(batch: pa.Table) -> pa.Table:
    digests = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {
            "text_md5": pa.array(digests, pa.string()),
            "doc_id": batch["doc_id"],
        }
    )


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """(text_md5, keep_doc_id, n_dups): one survivor per distinct text.

    Hash inside ``map_batches`` (map-side), then shuffle only the
    16-byte digest + id — at 100 TB the groupby moves ~50 B/doc, not
    documents.  Survivor = min doc_id (deterministic first-writer, the
    reference's first-seen-wins semantics, pipelines.py:152).
    """
    # digest cardinality is corpus-sized: per-block Arrow partials +
    # one coarse-hash shuffle + one vectorized merge per partition
    # (string-key analog of common.hash_keyed_agg)
    parts = 64

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["text_md5"]).aggregate(
            [("doc_id", "min"), ([], "count_all")]
        )
        import pandas as pd

        h = pd.util.hash_array(
            np.asarray(g["text_md5"].to_numpy(zero_copy_only=False),
                       dtype=object)
        ).astype(np.uint64)
        return pa.table({
            "text_md5": g["text_md5"],
            "m_p": g["doc_id_min"],
            "n_p": g["count_all"],
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "text_md5": pa.array([], pa.string()),
                "keep_doc_id": pa.array([], pa.int64()),
                "n_dups": pa.array([], pa.int64()),
            })
        d = g["text_md5"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        m = np.full(ud.size, np.iinfo(np.int64).max)
        np.minimum.at(m, inv,
                      g["m_p"].to_numpy(zero_copy_only=False))
        n = np.zeros(ud.size, dtype=np.int64)
        np.add.at(n, inv, g["n_p"].to_numpy(zero_copy_only=False))
        return pa.table({
            "text_md5": pa.array(ud, pa.string()),
            "keep_doc_id": pa.array(m, pa.int64()),
            "n_dups": pa.array(n, pa.int64()),
        })

    return (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_md5_batch, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


ORACLE_EXACT_DEDUP = """
SELECT md5(text) AS text_md5,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_dups
FROM documents
GROUP BY md5(text)
"""


# ----------------------------------------------------------- shingles
_GRAM_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def shingle_hashes_from_th(th: np.ndarray, k: int = 3) -> np.ndarray:
    """Shingle (word-k-gram) hashes from a doc's token-hash array.

    Gram hash = positional mix of k consecutive token hashes — pure
    numpy slicing, no gram-string construction.  Shorter-than-k docs
    hash their whole token sequence.
    """
    with np.errstate(over="ignore"):
        if th.size < k:
            g = np.uint64(0)
            for i in range(th.size):
                g = g * _GRAM_MIX + th[i]
            return np.array([g], dtype=np.uint64)
        g = np.zeros(th.size - k + 1, dtype=np.uint64)
        for j in range(k):
            g = g * _GRAM_MIX + th[j:th.size - k + 1 + j]
        return np.unique(g)


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Hashes of word k-grams (padded doc if shorter than k)."""
    return shingle_hashes_from_th(token_hashes(tokens), k)


# MinHash permutation parameters: h_i(x) = (a_i * x + b_i) mod p, fixed
# seed so every worker computes identical signatures.
_P = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P), size=num_perm, dtype=np.uint64)
    return a, b


def _mod_mersenne61(v: np.ndarray) -> np.ndarray:
    """Exact ``v % (2^61 - 1)`` via the Mersenne fold: for v < 2^63,
    ``(v & P) + (v >> 61)`` < P + 4, one conditional subtract finishes.
    Bit-identical to ``%`` and ~10× cheaper than vector udiv."""
    r = (v & _P) + (v >> np.uint64(61))
    return np.where(r >= _P, r - _P, r)


def minhash_signature(sh: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """Vectorized (num_perm,) signature over shingle hashes.

    Shingle hashes are truncated to 32 bits and ``a`` to 31 bits so
    ``a*x + b`` fits exactly in uint64 (< 2^63) — the whole
    num_perm × n_shingles grid is one numpy broadcast, no Python loop.
    """
    x = (sh & np.uint64(0xFFFFFFFF))[None, :]
    with np.errstate(over="ignore"):
        grid = _mod_mersenne61(a[:, None] * x + b[:, None])
    return grid.min(axis=1).astype(np.uint64)


# Per-worker memo for cheap-to-build stage state used from plain-task
# map_batches (same pattern as crawl._WORKER_STATE): plain tasks reuse
# long-lived worker processes, so this gives build-once-per-worker
# without actor-pool startup latency.
_WORKER_MEMO: dict = {}


def _gram_hashes_flat(th: np.ndarray, starts: np.ndarray,
                      lens: np.ndarray, k: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch gram hashes: every doc's k-gram Horner hashes in one
    flat array plus per-doc boundaries — no per-doc Python loop.

    Semantics identical to :func:`shingle_hashes_from_th` per doc
    (short docs hash their whole token sequence), except duplicates
    are NOT removed — min over a multiset equals min over its set, so
    minhash signatures are unchanged and the unique pass is saved.
    """
    ns = np.maximum(lens - (k - 1), 1)
    bounds = np.r_[0, np.cumsum(ns)]
    total = int(bounds[-1])
    gstart = np.repeat(starts, ns) + (
        np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], ns)
    )
    glen = np.repeat(np.minimum(lens, k), ns)
    g = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            valid = j < glen
            idx = np.minimum(gstart + j, max(th.size - 1, 0))
            g = np.where(valid, g * _GRAM_MIX + th[idx], g)
    return g, bounds


class MinHasher:
    """Actor-pool stage: permutation params built once per actor.

    Fully batch-vectorized: flat gram hashes for the whole batch, then
    per-permutation ``np.minimum.reduceat`` over doc boundaries (in
    16-perm chunks to bound the broadcast grid) — no per-doc loop, and
    the signature column is rebuilt zero-copy as one ListArray.
    """

    def __init__(self, num_perm: int = 64, k: int = 3) -> None:
        self.a, self.b = _perm_params(num_perm)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import _split_flat

        th, starts, lens = _split_flat(batch)
        n = batch.num_rows
        num_perm = self.a.size
        g, gb = _gram_hashes_flat(th, starts, lens, self.k)
        x = g & np.uint64(0xFFFFFFFF)
        gstarts = gb[:-1]
        sig = np.empty((n, num_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for p in range(num_perm):
                v = _mod_mersenne61(self.a[p] * x + self.b[p])
                sig[:, p] = np.minimum.reduceat(v, gstarts)
        flat = pa.array(
            np.ascontiguousarray(sig.reshape(-1)).view(np.int64),
            pa.int64(),
        )
        offsets = pa.array(
            np.arange(n + 1, dtype=np.int32) * num_perm, pa.int32()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.ListArray.from_arrays(offsets, flat),
            }
        )


def _band_flat_map(batch: pa.Table, num_bands: int, rows_per_band: int
                   ) -> pa.Table:
    """sig → (band_key, doc_id) rows — the tiny LSH shuffle key.

    Vectorized: the flat sig column reshapes zero-copy to
    (docs × bands × rows), each band's key is a Horner hash of its
    rows seeded per band (fmix64-finalized), so ``band_key`` alone
    identifies a bucket — int64 keys group faster than md5 hex strings
    and the whole batch is a handful of numpy passes.  Two unequal
    band chunks collide with p≈2⁻⁶⁴, same as the md5[:16] this
    replaces; equal chunks still collide by construction.
    """
    from .text import mix64

    sigs = batch["sig"]
    if isinstance(sigs, pa.ChunkedArray):
        sigs = sigs.combine_chunks()
    flat = pc.list_flatten(sigs).to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False
    ).view(np.uint64)
    n = batch.num_rows
    mat = flat.reshape(n, num_bands, rows_per_band)
    with np.errstate(over="ignore"):
        key = np.broadcast_to(
            mix64(np.arange(1, num_bands + 1, dtype=np.uint64)),
            (n, num_bands),
        ).copy()
        for j in range(rows_per_band):
            key = key * _GRAM_MIX + mat[:, :, j]
        key = mix64(key)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "band_key": pa.array(
                np.ascontiguousarray(key.reshape(-1)).view(np.int64),
                pa.int64(),
            ),
            "doc_id": pa.array(
                np.repeat(doc_ids, num_bands), pa.int64()
            ),
        }
    )


def minhash_lsh_pairs(sf_dir: str, num_perm: int = 64, num_bands: int = 16,
                      threshold: float = 0.8, k: int = 3
                      ) -> ray.data.Dataset:
    """Near-duplicate pairs (doc_a, doc_b, jaccard ≥ threshold).

    shingle → minhash (actor pool) → band flat_map → groupby band
    bucket → candidate pairs → exact-Jaccard verify (re-shingling only
    the candidates).  At scale the verify stage fetches only candidate
    texts (a semi-join by doc_id), never the full corpus.
    """
    rows_per_band = num_perm // num_bands
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    # Plain tasks with a worker-memoized hasher, not an actor pool:
    # the "model" (perm params) costs microseconds to build, so pool
    # startup latency would be pure overhead — the memo gives the same
    # build-once-per-worker semantics for free (crawl.py:_WORKER_STATE
    # pattern).  Band flat_map fuses into the same task (one pass, no
    # intermediate sig dataset).
    def sig_and_bands(b: pa.Table) -> pa.Table:
        key = ("minhasher", num_perm, k)
        mh = _WORKER_MEMO.get(key)
        if mh is None:
            mh = _WORKER_MEMO[key] = MinHasher(num_perm=num_perm, k=k)
        return _band_flat_map(mh(b), num_bands, rows_per_band)

    bands = docs.map_batches(sig_and_bands, batch_format="pyarrow")

    import pandas as pd

    # Almost every LSH bucket is a singleton; running a Python
    # map_groups over all of them pays per-group overhead ~N times.
    # Instead: (1) tiny count-aggregate finds bucket keys with >= 2
    # members, (2) that small key set is broadcast and probed inside
    # map_batches (the seen-set anti-join pattern), (3) pair generation
    # runs only over the surviving rows.
    bands_mat = bands.materialize()
    from .common import hash_keyed_agg

    # band_key cardinality ~ docs x bands: the coarse-partition
    # vectorized count, not Ray's per-key aggregate
    hot = hash_keyed_agg(
        bands_mat, "band_key", count_alias="n"
    ).filter(expr="n >= 2")
    hot_ref = ray.put(
        pa.array(
            sorted(r["band_key"] for r in hot.take_all()), pa.int64()
        )
    )

    def keep_hot(b: pa.Table, hot=None) -> pa.Table:
        from .common import deref

        return b.filter(
            pc.is_in(b["band_key"], value_set=deref(hot))
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        return pd.DataFrame(
            {
                "doc_a": pd.array([p[0] for p in pairs], dtype="int64"),
                "doc_b": pd.array([p[1] for p in pairs], dtype="int64"),
            }
        )

    cand = bands_mat.map_batches(
        keep_hot, fn_kwargs={"hot": hot_ref}, batch_format="pyarrow"
    ).groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")

    # verify: exact Jaccard over ONLY the candidate docs.  The pair set
    # is tiny post-LSH (collisions only), so collecting it is a small
    # driver-side result, not a corpus materialization — which is also
    # why cross-band duplicate pairs are dropped HERE with one
    # np.unique instead of paying a second all-to-all groupby.
    from .common import collect_small

    cand_tbl = collect_small(
        cand,
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]),
    )
    if cand_tbl.num_rows:
        da = cand_tbl["doc_a"].to_numpy(zero_copy_only=False)
        db = cand_tbl["doc_b"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([da, db], axis=1), axis=0)
        cand_tbl = pa.table(
            {
                "doc_a": pa.array(uniq[:, 0], pa.int64()),
                "doc_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )
    return _verify_candidate_pairs(docs, cand_tbl, threshold, k)


def _verify_candidate_pairs(docs: ray.data.Dataset, cand_tbl: pa.Table,
                            threshold: float, k: int
                            ) -> ray.data.Dataset:
    """Exact-Jaccard verify of a small candidate pair table
    (doc_a, doc_b) → Dataset (doc_a, doc_b, jaccard ≥ threshold).

    Candidate texts are fetched by a distributed semi-join: the
    documents dataset STREAMS through an is_in filter (broadcast
    sorted id array) that also computes each survivor's shingle set
    map-side — the full corpus is never pulled to the driver or
    broadcast.  Shared by :func:`minhash_lsh_pairs` and
    :func:`incremental_dedup` (same recall contract)."""
    if cand_tbl.num_rows == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    cand_ids = np.unique(
        np.concatenate(
            [
                cand_tbl["doc_a"].to_numpy(zero_copy_only=False),
                cand_tbl["doc_b"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
    )
    ids_ref = ray.put(pa.array(cand_ids, pa.int64()))

    def cand_shingles(b: pa.Table, ids=None) -> pa.Table:
        from .common import deref
        from .text import _split_flat

        keep = pc.is_in(b["doc_id"], value_set=deref(ids))
        b = b.filter(keep)
        th, starts, lens = _split_flat(b)
        bounds = np.r_[starts, th.size]
        shingles = [
            shingle_hashes_from_th(th[bounds[i]:bounds[i + 1]], k)
            .view(np.int64).tolist()
            for i in range(b.num_rows)
        ]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "shingles": pa.array(shingles, pa.list_(pa.int64())),
            }
        )

    sh_ds = docs.map_batches(
        cand_shingles, fn_kwargs={"ids": ids_ref}, batch_format="pyarrow"
    )
    sh_tbl = pa.concat_tables(
        [ray.get(r) for r in sh_ds.to_arrow_refs()]
    )  # candidates only: |rows| == |cand_ids|, small by construction
    sh_ref = ray.put(
        {
            int(d): np.asarray(s, dtype=np.int64).view(np.uint64)
            for d, s in zip(
                sh_tbl["doc_id"].to_pylist(),
                sh_tbl["shingles"].to_pylist(),
            )
        }
    )

    def jaccard_verify(batch: pa.Table, sh=None, threshold=0.8
                       ) -> pa.Table:
        # plain task + memoized broadcast deref (no actor-pool startup
        # for a post-LSH candidate set that is tiny by construction)
        from .common import deref

        shingles = deref(sh)
        da = batch["doc_a"].to_pylist()
        db = batch["doc_b"].to_pylist()
        keep_a, keep_b, jac = [], [], []
        for x, y in zip(da, db):
            sa, sb = shingles[x], shingles[y]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            j = inter / (sa.size + sb.size - inter)
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                jac.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return ray.data.from_arrow(cand_tbl).map_batches(
        jaccard_verify,
        fn_kwargs={"sh": sh_ref, "threshold": threshold},
        batch_format="pyarrow",
    )


# -------------------------------------------- incremental ingest dedup
_INC_MOD = 2  # fixture split: odd doc_ids play the "new batch" role


def build_lsh_index(sf_dir: str, index_dir: str, num_perm: int = 64,
                    num_bands: int = 16, k: int = 3,
                    parity: int = 0) -> None:
    """Persist the corpus side's LSH band table (band_key, doc_id) as
    a partitioned table through the storage seam — the stored index
    :func:`incremental_dedup` probes instead of recomputing bands per
    ingest batch.  Streaming sink: workers write their own fragments;
    re-ingesting new corpus docs appends bands for those docs only
    (the band table is append-only — doc edits are new doc_ids)."""
    from .. import storage

    rows_per_band = num_perm // num_bands
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % _INC_MOD == parity))
        key = ("minhasher", num_perm, k)
        mh = _WORKER_MEMO.get(key)
        if mh is None:
            mh = _WORKER_MEMO[key] = MinHasher(num_perm=num_perm, k=k)
        return _band_flat_map(mh(b), num_bands, rows_per_band)

    storage.backend().write_dataset(
        docs.map_batches(f, batch_format="pyarrow"), index_dir
    )


def incremental_dedup(sf_dir: str, num_perm: int = 64,
                      num_bands: int = 16, threshold: float = 0.8,
                      k: int = 3, index_dir: str | None = None
                      ) -> ray.data.Dataset:
    """(doc_id, dup_of, jaccard): for each NEW document, its smallest
    near-duplicate in the EXISTING corpus — the daily-ingest dedup
    path.  Fixture split: odd doc_ids are the incoming batch, even the
    stored corpus.

    The asymmetric LSH shape that makes incremental ingest cheap at
    100 TB: the corpus's band table is NEVER shuffled or re-paired
    against itself.  The new batch (small by definition — one day's
    ingest) computes its bands, which are collected and broadcast once
    as a sorted-key lookup; corpus bands then STREAM through a
    vectorized probe (searchsorted + repeat/cumsum pair expansion) —
    one pass over the stored band table, zero all-to-all.  Candidate
    (new, corpus) pairs are exact-Jaccard verified by the same
    candidate-only semi-join as :func:`minhash_lsh_pairs`; per new doc
    the minimum corpus id wins.  With ``index_dir`` the corpus bands
    are READ from the persisted LSH index (:func:`build_lsh_index`,
    storage seam) instead of recomputed — the steady-state ingest
    path: per batch, cost = one streamed pass over the stored index.
    """
    rows_per_band = num_perm // num_bands
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def side_bands(parity: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(ids % _INC_MOD == parity))
            key = ("minhasher", num_perm, k)
            mh = _WORKER_MEMO.get(key)
            if mh is None:
                mh = _WORKER_MEMO[key] = MinHasher(num_perm=num_perm, k=k)
            return _band_flat_map(mh(b), num_bands, rows_per_band)

        return f

    from .common import collect_small, deref

    new_tbl = collect_small(
        docs.map_batches(side_bands(1), batch_format="pyarrow"),
        pa.schema([("band_key", pa.int64()), ("doc_id", pa.int64())]),
    )
    if new_tbl.num_rows == 0:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "dup_of": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        ))
    nk_all = new_tbl["band_key"].to_numpy(zero_copy_only=False)
    nid_all = new_tbl["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nid_all, nk_all))
    nk_s, nid_s = nk_all[order], nid_all[order]
    uk_starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]])
    lk_ref = ray.put({
        "nk": nk_s[uk_starts],                       # unique sorted keys
        "starts": np.r_[uk_starts, nk_s.size],       # group bounds
        "flat": nid_s,                               # new ids per key
    })

    def probe(b: pa.Table, lk=None) -> pa.Table:
        lk = deref(lk)
        keys = b["band_key"].to_numpy(zero_copy_only=False)
        cid = b["doc_id"].to_numpy(zero_copy_only=False)
        nk = lk["nk"]
        pos = np.searchsorted(nk, keys)
        pos_c = np.minimum(pos, max(nk.size - 1, 0))
        valid = (pos < nk.size) & (nk[pos_c] == keys)
        pos, cid = pos_c[valid], cid[valid]
        s, e = lk["starts"][pos], lk["starts"][pos + 1]
        cnt = e - s
        total = int(cnt.sum())
        base = np.repeat(s, cnt)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.r_[0, np.cumsum(cnt)][:-1], cnt))
        return pa.table({
            "doc_a": pa.array(lk["flat"][base + within], pa.int64()),
            "doc_b": pa.array(np.repeat(cid, cnt), pa.int64()),
        })

    if index_dir is not None:
        from .. import storage

        corpus_bands = storage.backend().read_dataset(
            index_dir, columns=["band_key", "doc_id"]
        )
    else:
        corpus_bands = docs.map_batches(
            side_bands(0), batch_format="pyarrow"
        )
    cand = collect_small(
        corpus_bands.map_batches(probe, fn_kwargs={"lk": lk_ref},
                                 batch_format="pyarrow"),
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]),
    )
    if cand.num_rows:
        uniq = np.unique(np.stack(
            [cand["doc_a"].to_numpy(zero_copy_only=False),
             cand["doc_b"].to_numpy(zero_copy_only=False)], axis=1
        ), axis=0)
        cand = pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                         "doc_b": pa.array(uniq[:, 1], pa.int64())})
    verified = collect_small(
        _verify_candidate_pairs(docs, cand, threshold, k),
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("jaccard", pa.float64())]),
    )
    if verified.num_rows == 0:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "dup_of": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        ))
    a = verified["doc_a"].to_numpy(zero_copy_only=False)
    bcol = verified["doc_b"].to_numpy(zero_copy_only=False)
    j = verified["jaccard"].to_numpy(zero_copy_only=False)
    o = np.lexsort((bcol, a))
    a, bcol, j = a[o], bcol[o], j[o]
    first = np.r_[True, a[1:] != a[:-1]]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(a[first], pa.int64()),
        "dup_of": pa.array(bcol[first], pa.int64()),
        "jaccard": pa.array(j[first], pa.float64()),
    }))


def incremental_dedup_oracle_sql() -> str:
    """Cross-side exact Jaccard (new = odd ids vs corpus = even ids),
    min corpus id per new doc — same recall caveat as
    ORACLE_JACCARD_PAIRS (fixture dups sit at J ≥ 0.9 where 16-band/
    4-row LSH recall > 0.99997)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3 THEN
           list_distinct(list_transform(range(1, len(ws) - 1),
              i -> ws[i] || chr(31) || ws[i+1] || chr(31) || ws[i+2]))
         ELSE [array_to_string(ws, chr(31))] END AS gs
  FROM toks
),
xp AS (
  SELECT n.doc_id AS nid, c.doc_id AS cid,
         CAST(len(list_intersect(n.gs, c.gs)) AS DOUBLE)
           / (len(n.gs) + len(c.gs) - len(list_intersect(n.gs, c.gs)))
           AS j
  FROM (SELECT * FROM grams WHERE doc_id % {_INC_MOD} = 1) n
  JOIN (SELECT * FROM grams WHERE doc_id % {_INC_MOD} = 0) c ON true
)
SELECT nid AS doc_id, cid AS dup_of, round(j, 6) AS jaccard
FROM xp
WHERE j >= 0.8
QUALIFY row_number() OVER (PARTITION BY nid ORDER BY cid) = 1
"""


# Exact all-pairs word-3-gram Jaccard at the 0.8 threshold.  This is
# the value-level oracle for BOTH pair operators: ngram_jaccard_pairs
# computes exactly this, and minhash_lsh_pairs equals it whenever LSH
# recall is 1 at the threshold — guaranteed here because every true
# near-dup pair in the fixture sits at J ≥ 0.9 where the 16-band/4-row
# collision probability is 1 - (1 - J^4)^16 > 0.99997 (and verified
# empirically by the driver's hash compare).  chr(31) joins tokens
# unambiguously; hashed-shingle Jaccard equals string-shingle Jaccard
# absent 64-bit collisions.
JACCARD_CTES = """toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3 THEN
           list_distinct(list_transform(range(1, len(ws) - 1),
              i -> ws[i] || chr(31) || ws[i+1] || chr(31) || ws[i+2]))
         ELSE [array_to_string(ws, chr(31))] END AS gs
  FROM toks
),
jpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
           / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)))
           AS j
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
)"""

ORACLE_JACCARD_PAIRS = f"""
WITH {JACCARD_CTES}
SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM jpairs WHERE j >= 0.8
"""


# ------------------------------------------------------------ simhash
def simhash_batch(batch: pa.Table) -> pa.Table:
    """Whole-batch vectorized simhash: flat token-bit matrix, per-doc
    bit votes via ``np.add.reduceat``, no per-row Python loop.

    Token hashes are fmix64-finalized char-polynomial hashes (not
    SipHash) so the DuckDB oracle reproduces the simhash bit-exactly;
    the avalanche step restores the bit independence simhash voting
    needs."""
    from .text import char_poly_hashes, mix64

    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    th = mix64(char_poly_hashes(pc.list_flatten(words)))
    starts, lens = offs[:-1], np.diff(offs)
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    bits = ((th[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
    votes = (
        np.add.reduceat(bits, starts, axis=0)
        if th.size
        else np.zeros((0, 64), dtype=np.int32)
    )
    # majority bit: set where ones outnumber zeros (2·ones > n_tokens)
    mask = (2 * votes) > lens[:, None]
    with np.errstate(over="ignore"):
        out = (mask.astype(np.uint64) << shifts).sum(
            axis=1, dtype=np.uint64
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(out.view(np.int64), pa.int64()),
        }
    )


def simhash(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, simhash) — 64-bit near-dup fingerprint, single pass."""
    return read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


def simhash_oracle_sql() -> str:
    """DuckDB SQL reproducing the simhash bit-exactly: per-token
    char-poly Horner hash → fmix64 avalanche (xor/shift/mod-2**64
    multiply on HUGEINT) → per-bit majority vote over each doc's 64
    bit positions → bits recombined and wrapped to signed int64."""
    from .text import FP_SEED, TOK_BASE, TOK_SEED  # noqa: F401

    m = "18446744073709551616::HUGEINT"  # 2**64
    c1 = 0xFF51AFD7ED558CCD
    c2 = 0xC4CEB9FE1A85EC53

    def mulmod(c: int) -> str:
        # (h * c) mod 2**64 without overflowing INT128: split both
        # factors at 2**32 — h*c ≡ h_lo·c_lo + 2³²·((h_lo·c_hi +
        # h_hi·c_lo) mod 2³²); every partial product stays < 2**64.
        lo, hi = c % (1 << 32), c >> 32
        return (
            f"((h % 4294967296) * {lo}::HUGEINT"
            f" + (((h % 4294967296) * {hi}::HUGEINT"
            f"     + (h // 4294967296) * {lo}::HUGEINT) % 4294967296)"
            f"   * 4294967296::HUGEINT) % {m}"
        )

    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
poly AS (
    SELECT doc_id,
        list_reduce(
            list_concat(
                [CAST({int(TOK_SEED)} AS HUGEINT)],
                list_transform(
                    string_split(t, ''),
                    ch -> CAST(unicode(ch) AS HUGEINT)
                )
            ),
            (a, b) -> (a * {int(TOK_BASE)} + b) % {m}
        ) AS h
    FROM tok
),
mix1 AS (SELECT doc_id, xor(h, h >> 33) AS h FROM poly),
mix2 AS (SELECT doc_id, {mulmod(c1)} AS h FROM mix1),
mix3 AS (SELECT doc_id, xor(h, h >> 33) AS h FROM mix2),
mix4 AS (SELECT doc_id, {mulmod(c2)} AS h FROM mix3),
th AS (SELECT doc_id, xor(h, h >> 33) AS h FROM mix4),
n AS (SELECT doc_id, count(*) AS n_tokens FROM th GROUP BY 1),
votes AS (
    SELECT th.doc_id, b.b,
        count(*) FILTER (WHERE (h >> b.b) % 2 = 1) AS ones
    FROM th, (SELECT unnest(range(64)) AS b) b
    GROUP BY 1, 2
),
bits AS (
    SELECT v.doc_id,
        sum(CASE WHEN 2 * v.ones > n.n_tokens
                 THEN (1::HUGEINT << v.b) ELSE 0::HUGEINT END) AS v
    FROM votes v JOIN n USING (doc_id) GROUP BY 1
)
SELECT doc_id,
    CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
              THEN v - {m} ELSE v END AS BIGINT) AS simhash
FROM bits
"""


# ------------------------------------------- simhash Hamming join
_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count):
    byte-table lookup over the raw buffer."""
    return (
        _POP8[np.ascontiguousarray(x).view(np.uint8)]
        .reshape(-1, 8)
        .sum(axis=1, dtype=np.int64)
    )


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3
                      ) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming): ALL pairs at simhash Hamming distance
    <= max_hamming — exact, not approximate.

    Manku–Jain–Das Sarma block bucketing (WWW'07, public) specialized
    to one permutation: the 64-bit simhash splits into max_hamming+1
    16-bit blocks; by pigeonhole any pair within distance 3 agrees
    EXACTLY on >= 1 block, so block-equality buckets have recall 1 and
    the per-bucket popcount verify makes the result exact.  Shuffle
    moves (block_key, doc_id, simhash) = 24 B/row × 4 — never text.
    Hot-bucket prune + per-bucket pair verify reuse the minhash LSH
    shapes; a pathological bucket (thousands of identical simhashes)
    would need the same salted-split remedy the frontier uses for hot
    hosts.
    """
    import pandas as pd

    nb = max_hamming + 1
    assert 64 % nb == 0, "block split must tile 64 bits"
    width = 64 // nb
    bmask = np.uint64((1 << width) - 1)

    sh = read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )

    def blocks(b: pa.Table) -> pa.Table:
        v = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        keys = np.concatenate([
            (np.uint64(i << width) | ((v >> np.uint64(i * width)) & bmask))
            for i in range(nb)
        ]).view(np.int64)
        return pa.table(
            {
                "block_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(np.tile(ids, nb), pa.int64()),
                "simhash": pa.array(
                    np.tile(v.view(np.int64), nb), pa.int64()
                ),
            }
        )

    bands = sh.map_batches(blocks, batch_format="pyarrow").materialize()
    from .common import hash_keyed_agg

    # block_key cardinality ~ docs x blocks: coarse-partition count
    hot = hash_keyed_agg(
        bands, "block_key", count_alias="n"
    ).filter(expr="n >= 2")
    hot_keys = sorted(r["block_key"] for r in hot.take_all())
    if not hot_keys:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
    hot_ref = ray.put(pa.array(hot_keys, pa.int64()))

    def keep_hot(b: pa.Table, hot=None) -> pa.Table:
        from .common import deref

        return b.filter(pc.is_in(b["block_key"], value_set=deref(hot)))

    # ONE vectorized task per coarse hash partition (not a pandas call
    # per hot bucket — the per-group analog of a row loop); equal
    # block_keys co-locate because the partition is a pure function of
    # the key.  The inner per-bucket triu loop is fine: within-bucket
    # work is quadratic anyway and buckets are verify-sized.
    n_parts = 64

    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = b["block_key"].to_numpy(zero_copy_only=False)
        part = (mix64(k.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return b.append_column("part", pa.array(part))

    def partition_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        key = g["block_key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        shv = g["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, key))
        key, ids, shv = key[order], ids[order], shv[order]
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1], True])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            iu, ju = np.triu_indices(e - s, k=1)
            ham = _popcount64(shv[s:e][iu] ^ shv[s:e][ju])
            keep = ham <= max_hamming
            out_a.append(ids[s:e][iu[keep]])
            out_b.append(ids[s:e][ju[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
                "hamming": pa.array(
                    np.concatenate(out_h).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        bands.map_batches(
            keep_hot, fn_kwargs={"hot": hot_ref}, batch_format="pyarrow"
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


def simhash_dup_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """Brute-force Hamming join over the bit-exact simhash oracle —
    exact because the blocked Ray path has recall 1 by pigeonhole."""
    return f"""
WITH sh AS ({simhash_oracle_sql()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ------------------------------------------------- n-gram Jaccard (BF)
def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, k: int = 3,
                        max_rows: int = 50_000) -> ray.data.Dataset:
    """All-pairs exact n-gram Jaccard ≥ threshold (brute-force path).

    The full shingle-set side is broadcast ONCE via ``ray.put`` and
    each batch compares its docs against it (blockwise). This is the
    oracle/baseline for `minhash_lsh_pairs`; at 100 TB you run the LSH
    variant — this one is O(n²) by construction and says so, and it
    HARD-REFUSES inputs above ``max_rows`` so the oracle path can't be
    pointed at corpus scale by accident (the comparison count and the
    broadcast shingle-set size both grow without bound).
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()   # parquet metadata only — no scan
    if n_docs > max_rows:
        raise ValueError(
            f"ngram_jaccard_pairs is the O(n²) brute-force ORACLE for "
            f"minhash_lsh_pairs and refuses {n_docs} rows "
            f"(max_rows={max_rows}); run minhash_lsh_pairs at scale, "
            f"or raise max_rows explicitly if you really mean it"
        )
    full = pa.concat_tables([ray.get(r) for r in docs.to_arrow_refs()])
    ids = np.asarray(full["doc_id"].to_pylist(), dtype=np.int64)
    sets = [
        shingle_hashes(t.split(" "), k) for t in full["text"].to_pylist()
    ]
    sets_ref = ray.put((ids, sets))

    class BlockJaccard:
        def __init__(self, sets_ref, threshold: float, k: int) -> None:
            self.ids, self.sets = ray.get(sets_ref)
            self.by_id = {
                int(d): s for d, s in zip(self.ids, self.sets)
            }
            self.threshold = threshold
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            da, db, jac = [], [], []
            for d, t in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
                sa = self.by_id[int(d)]
                for other, sb in zip(self.ids, self.sets):
                    if other <= d:
                        continue
                    inter = np.intersect1d(
                        sa, sb, assume_unique=True
                    ).size
                    j = inter / (sa.size + sb.size - inter)
                    if j >= self.threshold:
                        da.append(int(d))
                        db.append(int(other))
                        jac.append(round(j, 6))
            return pa.table(
                {
                    "doc_a": pa.array(da, pa.int64()),
                    "doc_b": pa.array(db, pa.int64()),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )

    return docs.map_batches(
        BlockJaccard,
        fn_constructor_kwargs={
            "sets_ref": sets_ref, "threshold": threshold, "k": k,
        },
        concurrency=(1, 8),
        batch_format="pyarrow",
    )


# ------------------------------------------------- embedding cosine
_EMPTY_PAIRS = pa.schema(
    [("vec_a", pa.int64()), ("vec_b", pa.int64())]
)


def _block_summary(tbl: pa.Table) -> tuple[np.ndarray, float]:
    """(normalized mean direction, max angle of any member to it)."""
    from .ann import emb_matrix

    m = emb_matrix(tbl["embedding"])
    if m.shape[0] == 0:
        # empty block (repartition edge): r = pi makes the triangle
        # bound prune every pair involving it instead of crashing
        return np.zeros(max(m.shape[1], 1)), float(np.pi)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    mu = m.mean(axis=0)
    n = np.linalg.norm(mu)
    mu = mu / n if n > 0 else np.eye(m.shape[1])[0]
    r = float(np.arccos(np.clip(m @ mu, -1.0, 1.0)).max())
    return mu, r


@ray.remote
def _summarize_block(tbl: pa.Table) -> tuple[np.ndarray, float]:
    return _block_summary(tbl)


@ray.remote
def _pairs_between(ta: pa.Table, tb: pa.Table | None,
                   threshold: float, tile: int = 4096) -> pa.Table:
    """Exact cosine ≥ threshold pairs between two blocks (tb=None:
    within ta).  Tiled matmul bounds the similarity matrix to
    tile × tile regardless of block size."""
    from .ann import emb_matrix

    ia = ta["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ma = emb_matrix(ta["embedding"])
    ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
    if tb is None:
        ib, mb = ia, ma
    else:
        ib = tb["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mb = emb_matrix(tb["embedding"])
        mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
    out_a, out_b = [], []
    for sa in range(0, len(ia), tile):
        for sb in range(0, len(ib), tile):
            sims = ma[sa:sa + tile] @ mb[sb:sb + tile].T
            aid = ia[sa:sa + tile]
            bid = ib[sb:sb + tile]
            if tb is None:
                # within-block: id comparison dedups the symmetric pair
                mask = (sims >= threshold) & (aid[:, None] < bid[None, :])
            else:
                # cross-block: blocks are ordered by IVF bucket, NOT by
                # vec_id, so an id-order filter here would drop every
                # pair whose smaller id lives in block B — take the
                # threshold alone and canonicalize below
                mask = sims >= threshold
            ii, jj = np.nonzero(mask)
            out_a.append(aid[ii])
            out_b.append(bid[jj])
    va = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    vb = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    if tb is not None and len(va):
        va, vb = np.minimum(va, vb), np.maximum(va, vb)
    order = np.lexsort((vb, va))
    return pa.table(
        {
            "vec_a": pa.array(va[order], pa.int64()),
            "vec_b": pa.array(vb[order], pa.int64()),
        }
    )


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.45,
                        n_centroids: int = 16, block_rows: int = 4096
                        ) -> ray.data.Dataset:
    """(vec_a, vec_b) embedding pairs with exact cosine ≥ threshold.

    An exact threshold-similarity self-join.  The fixture is
    adversarial by construction — true pairs at cos ≈ 0.4501 vs
    non-pairs at 0.4497 — so NO approximate router (IVF buckets,
    angular LSH, any probe count) can be exact; measured: 16-centroid
    IVF misses 4/144 true pairs at sf0.1 even probing 4 buckets.  The
    scale path is therefore a *bound-pruned blocked join*:

    1. bucket-sort the vectors by nearest IVF centroid (the stored
       index's partition key) so blocks are angularly compact,
    2. summarize each block map-side as (mean direction μ, max member
       angle r) — tiny driver-side metadata,
    3. prune every block pair whose best case
       angle(μᵢ,μⱼ) − rᵢ − rⱼ exceeds arccos(threshold) — exact by the
       triangle inequality on angles,
    4. run the surviving block pairs as Ray tasks doing tiled
       matmuls (no full-matrix broadcast; a task holds 2 blocks).

    O(surviving-pairs) compute, memory bounded by 2 blocks + one tile²
    sims buffer.  Raw tasks are used because a threshold self-join is
    the one shape Ray Data's Dataset API cannot express (no join-on-
    predicate); documented per the custom-operator rule.
    """
    from .ann import _kmeans, emb_matrix

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = pa.concat_tables(
        [ray.get(r) for r in emb.limit(16384).to_arrow_refs()]
    )
    smat = emb_matrix(sample["embedding"])
    smat = smat / np.linalg.norm(smat, axis=1, keepdims=True)
    cent = _kmeans(smat, min(n_centroids, len(smat)))
    cent_ref = ray.put(cent)

    def add_bucket(b: pa.Table, cent=None) -> pa.Table:
        from .common import deref

        c = deref(cent)
        m = emb_matrix(b["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return b.append_column(
            "bucket", pa.array(np.argmax(m @ c.T, axis=1), pa.int32())
        )

    # ONE execution of the read→bucket→sort lineage: count and block
    # refs both come from the post-sort materialization (sort is a
    # materializing all-to-all anyway), instead of paying the scan
    # again for a separate count() and again for to_arrow_refs().
    bucketed = emb.map_batches(
        add_bucket, fn_kwargs={"cent": cent_ref},
        batch_format="pyarrow",
    ).sort("bucket").materialize()
    n_rows = bucketed.count()  # metadata-only on a materialized ds
    n_blocks = max(1, -(-n_rows // block_rows))
    refs = [r for r in bucketed.repartition(n_blocks).to_arrow_refs()]
    summaries = ray.get([_summarize_block.remote(r) for r in refs])

    theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    tasks = []
    for i in range(len(refs)):
        tasks.append(_pairs_between.remote(refs[i], None, threshold))
        mi, ri = summaries[i]
        for j in range(i + 1, len(refs)):
            mj, rj = summaries[j]
            gap = float(np.arccos(np.clip(mi @ mj, -1.0, 1.0)))
            if gap - ri - rj > theta:
                continue  # no member pair can reach the threshold
            tasks.append(_pairs_between.remote(refs[i], refs[j], threshold))
    if not tasks:
        return ray.data.from_arrow(_EMPTY_PAIRS.empty_table())
    return ray.data.from_arrow_refs(tasks)


ORACLE_EMBEDDING_DUPS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(
        CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
      ) >= 0.45
"""
