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
from ray.data.aggregate import Count, Min

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
    return (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_md5_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(
            Min("doc_id", alias_name="keep_doc_id"),
            Count(alias_name="n_dups"),
        )
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


def minhash_signature(sh: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """Vectorized (num_perm,) signature over shingle hashes.

    Shingle hashes are truncated to 32 bits and ``a`` to 31 bits so
    ``a*x + b`` fits exactly in uint64 (< 2^63) — the whole
    num_perm × n_shingles grid is one numpy broadcast, no Python loop.
    """
    x = (sh & np.uint64(0xFFFFFFFF))[None, :]
    grid = (a[:, None] * x + b[:, None]) % _P
    return grid.min(axis=1).astype(np.uint64)


class MinHasher:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, k: int = 3) -> None:
        self.a, self.b = _perm_params(num_perm)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .text import _split_flat

        th, starts, lens = _split_flat(batch)
        bounds = np.r_[starts, th.size]
        sigs = np.stack(
            [
                minhash_signature(
                    shingle_hashes_from_th(th[bounds[i]:bounds[i + 1]],
                                           self.k),
                    self.a, self.b,
                )
                for i in range(batch.num_rows)
            ]
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.array(
                    [row.view(np.int64).tolist() for row in sigs],
                    pa.list_(pa.int64()),
                ),
            }
        )


def _band_flat_map(batch: pa.Table, num_bands: int, rows_per_band: int
                   ) -> pa.Table:
    """sig → (band, band_key, doc_id) rows — the tiny LSH shuffle key."""
    doc_ids = batch["doc_id"].to_pylist()
    sigs = batch["sig"].to_pylist()
    out_band, out_key, out_doc = [], [], []
    for d, sig in zip(doc_ids, sigs):
        arr = np.asarray(sig, dtype=np.int64).view(np.uint64)
        for bnd in range(num_bands):
            chunk = arr[bnd * rows_per_band:(bnd + 1) * rows_per_band]
            key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            out_band.append(bnd)
            out_key.append(key)
            out_doc.append(d)
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
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
    sigs = docs.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm, "k": k},
        concurrency=(1, 8), batch_format="pyarrow",
    )
    bands = sigs.map_batches(
        lambda b: _band_flat_map(b, num_bands, rows_per_band),
        batch_format="pyarrow",
    )

    import pandas as pd

    # Almost every LSH bucket is a singleton; running a Python
    # map_groups over all of them pays per-group overhead ~N times.
    # Instead: (1) tiny count-aggregate finds bucket keys with >= 2
    # members, (2) that small key set is broadcast and probed inside
    # map_batches (the seen-set anti-join pattern), (3) pair generation
    # runs only over the surviving rows.
    bands_mat = bands.materialize()
    hot = (
        bands_mat.groupby(["band", "band_key"])
        .aggregate(Count(alias_name="n"))
        .filter(expr="n >= 2")
    )
    hot_keys = frozenset(
        (r["band"], r["band_key"]) for r in hot.take_all()
    )
    hot_ref = ray.put(hot_keys)

    def keep_hot(b: pa.Table, hot=None) -> pa.Table:
        from .common import deref

        keys = deref(hot)
        bnd = b["band"].to_pylist()
        bk = b["band_key"].to_pylist()
        mask = pa.array([(x, y) in keys for x, y in zip(bnd, bk)])
        return b.filter(mask)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        return pd.DataFrame(
            {
                "doc_a": pd.array([p[0] for p in pairs], dtype="int64"),
                "doc_b": pd.array([p[1] for p in pairs], dtype="int64"),
            }
        )

    cand = (
        bands_mat.map_batches(
            keep_hot, fn_kwargs={"hot": hot_ref}, batch_format="pyarrow"
        )
        .groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .drop_columns(["n_bands"])
    )

    # verify: join candidate pairs against texts (both sides small at
    # candidate stage; broadcast the needed texts once via ray.put)
    texts_tbl = pa.concat_tables([ray.get(r) for r in docs.to_arrow_refs()])
    text_ref = ray.put(
        dict(
            zip(
                texts_tbl["doc_id"].to_pylist(),
                texts_tbl["text"].to_pylist(),
            )
        )
    )

    class JaccardVerify:
        def __init__(self, text_ref, threshold: float, k: int) -> None:
            self.texts = ray.get(text_ref)
            self.threshold = threshold
            self.k = k
            self._cache: dict[int, np.ndarray] = {}

        def _sh(self, d: int) -> np.ndarray:
            if d not in self._cache:
                self._cache[d] = shingle_hashes(
                    self.texts[d].split(" "), self.k
                )
            return self._cache[d]

        def __call__(self, batch: pa.Table) -> pa.Table:
            da = batch["doc_a"].to_pylist()
            db = batch["doc_b"].to_pylist()
            keep_a, keep_b, jac = [], [], []
            for x, y in zip(da, db):
                sa, sb = self._sh(x), self._sh(y)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                j = inter / (sa.size + sb.size - inter)
                if j >= self.threshold:
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

    return cand.map_batches(
        JaccardVerify,
        fn_constructor_kwargs={
            "text_ref": text_ref, "threshold": threshold, "k": k,
        },
        concurrency=(1, 4),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------ simhash
def simhash_batch(batch: pa.Table) -> pa.Table:
    """Whole-batch vectorized simhash: flat token-bit matrix, per-doc
    bit votes via ``np.add.reduceat``, no per-row Python loop."""
    from .text import _split_flat

    th, starts, lens = _split_flat(batch)
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


# ------------------------------------------------- n-gram Jaccard (BF)
def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, k: int = 3
                        ) -> ray.data.Dataset:
    """All-pairs exact n-gram Jaccard ≥ threshold (brute-force path).

    The full shingle-set side is broadcast ONCE via ``ray.put`` and
    each batch compares its docs against it (blockwise). This is the
    oracle/baseline for `minhash_lsh_pairs`; at 100 TB you run the LSH
    variant — this one is O(n²) by construction and says so.
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
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
def embedding_dup_pairs(sf_dir: str, threshold: float = 0.45
                        ) -> ray.data.Dataset:
    """(vec_a, vec_b) embedding pairs with cosine ≥ threshold.

    Normalized full matrix broadcast once (``ray.put``); each batch
    does one float64 matmul block against it.  The SQL oracle is a
    self-join with list_cosine_similarity.  Scale path: IVF-bucket the
    vectors first (see ann.ivf_bucketed) so the matmul is per-bucket.
    """
    from .ann import emb_matrix

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = pa.concat_tables([ray.get(r) for r in emb.to_arrow_refs()])
    ids = full["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = emb_matrix(full["embedding"])
    norms = np.linalg.norm(mat, axis=1)
    mat_ref = ray.put((ids, mat, norms))

    class BlockCosine:
        def __init__(self, mat_ref, threshold: float) -> None:
            self.ids, self.mat, self.norms = ray.get(mat_ref)
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .ann import emb_matrix as _em

            bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            bmat = _em(batch["embedding"])
            bnorms = np.linalg.norm(bmat, axis=1)
            sims = (bmat @ self.mat.T) / np.outer(bnorms, self.norms)
            ii, jj = np.nonzero(
                (sims >= self.threshold) & (bids[:, None] < self.ids[None, :])
            )
            return pa.table(
                {
                    "vec_a": pa.array(bids[ii], pa.int64()),
                    "vec_b": pa.array(self.ids[jj], pa.int64()),
                }
            )

    return emb.map_batches(
        BlockCosine,
        fn_constructor_kwargs={"mat_ref": mat_ref, "threshold": threshold},
        concurrency=(1, 8),
        batch_format="pyarrow",
    )


ORACLE_EMBEDDING_DUPS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(
        CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
      ) >= 0.45
"""
