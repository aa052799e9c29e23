"""Corpus-curation operators: dup-cluster resolution, corpus dedup,
test-set decontamination, quality-stratified sampling.

These are the steps a training-data pipeline runs AFTER the pair/score
operators in dedup.py / text.py: near-dup pairs become clusters
(connected components), clusters become a deduplicated corpus (one
representative per cluster), the corpus is scrubbed of benchmark
n-gram overlap, and the survivors are down-sampled by quality stratum.
The reference's analog surface is the pipeline dedup/cleanup pass
(/root/reference/whakoom_webscrapper/pipelines.py:88-159 — first-seen
dedup + normalize before persisting); everything beyond that is the
LLM-training-data extension family.

Connected components use Hash-to-Min (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013):
each node keeps a member set seeded with its pair neighbors; every
round the group sends its full set to its minimum and the minimum to
every member.  Both messages are one ``groupby(node).map_groups``; the
state is re-distincted by a second groupby.  Converges in O(log d)
rounds; per-node min labels are monotonically nonincreasing.  Known
caveat at scale: the component-minimum's group grows to component
size, so a pathological giant cluster (boilerplate pages) skews one
group — the remedy is alternating large-star/small-star contraction
(Kiveris et al. 2014), not needed at this corpus's cluster sizes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .common import collect_small, deref, read
from .dedup import JACCARD_CTES, _gram_hashes_flat, minhash_lsh_pairs
from .text import (
    ORACLE_QUALITY_SCORE,
    _fingerprint_batch,
    _quality_batch,
    _split_flat,
    fingerprints_oracle_sql,
    mix64,
)

_GOLD = np.uint64(0x9E3779B97F4A7C15)


# ----------------------------------------------------- hash-to-min CC
def _seed_state(b: pa.Table) -> pa.Table:
    """(doc_a, doc_b) pairs → symmetric neighbor rows + self loops."""
    a = b["doc_a"].combine_chunks() if isinstance(
        b["doc_a"], pa.ChunkedArray) else b["doc_a"]
    d = b["doc_b"].combine_chunks() if isinstance(
        b["doc_b"], pa.ChunkedArray) else b["doc_b"]
    return pa.table(
        {
            "node": pa.concat_arrays([a, d, a, d]),
            "member": pa.concat_arrays([d, a, a, d]),
        }
    )


# Coarse hash partitions per star round: the shuffle key is
# mix64(node) % _CC_PARTS, so ONE vectorized task handles every node
# group in its partition (a per-node map_groups call costs a Python
# frame + pandas frame per node — the per-group analog of a row loop).
# Each task holds O(state_rows / parts); raise ``parts`` with corpus
# size (>= cluster cores) so a partition fits one worker's heap.
_CC_PARTS = 64


def _with_part(b: pa.Table) -> pa.Table:
    n = b["node"].to_numpy(zero_copy_only=False)
    part = (mix64(n.view(np.uint64)) % np.uint64(_CC_PARTS)).astype(
        np.int64
    )
    return b.append_column("part", pa.array(part))


def _star_part(b: pa.Table) -> pa.Table:
    """One Hash-to-Min round for EVERY node group in one hash
    partition, fully vectorized: sort (node, member), dedupe, segment
    by node, then per group send the member set to its min, the min to
    every member, and an IN-BAND label row ``(~node, min)`` —
    bitwise-not marks it (doc ids are >= 0), so the round's labels
    ride the same shuffle instead of needing their own groupby."""
    empty = pa.table(
        {"node": pa.array([], pa.int64()),
         "member": pa.array([], pa.int64())}
    )
    if b.num_rows == 0:
        return empty
    n = b["node"].to_numpy(zero_copy_only=False)
    m = b["member"].to_numpy(zero_copy_only=False)
    # a node is an implicit member of its own set (the old per-group
    # star appended it before taking the min)
    u = np.unique(n)
    n2 = np.concatenate([n, u])
    m2 = np.concatenate([m, u])
    order = np.lexsort((m2, n2))
    n2, m2 = n2[order], m2[order]
    keep = np.empty(n2.size, dtype=bool)
    keep[0] = True
    keep[1:] = (n2[1:] != n2[:-1]) | (m2[1:] != m2[:-1])
    n2, m2 = n2[keep], m2[keep]
    starts = np.flatnonzero(np.r_[True, n2[1:] != n2[:-1]])
    counts = np.diff(np.r_[starts, n2.size])
    mins = m2[starts]  # members sorted ascending per group
    gmin = np.repeat(mins, counts)
    gnode = n2[starts]
    return pa.table(
        {
            "node": pa.array(np.concatenate([gmin, m2, ~gnode])),
            "member": pa.array(np.concatenate([m2, gmin, mins])),
        }
    )


def _split_labels(b: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Map-side split of a star-output block into (state rows, label
    rows) — label rows must not reach the next round's groupby (they
    would all collide into marker groups)."""
    node = b["node"]
    is_label = pc.less(node, 0)
    return b.filter(pc.invert(is_label)), b.filter(is_label)


def _strip_labels(b: pa.Table) -> pa.Table:
    return _split_labels(b)[0]


_DIGEST_SCHEMA = pa.schema([("cnt", pa.int64()), ("hsum", pa.uint64())])


def _label_digest_batch(b: pa.Table) -> pa.Table:
    """Per-block (label count, wrap-sum of mixed label hashes): an
    exact multiset digest of this round's (node → min) labels (uint64
    wraparound is the combiner — partials merge associatively and
    never overflow).  Labels are unique per node by construction (one
    label row per group)."""
    lab = _split_labels(b)[1]
    n = pc.bit_wise_not(lab["node"]).to_numpy(zero_copy_only=False)
    m = lab["member"].to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        h = mix64(n.view(np.uint64) * _GOLD + mix64(m.view(np.uint64)))
        s = h.sum(dtype=np.uint64)
    return pa.table(
        {
            "cnt": pa.array([lab.num_rows], pa.int64()),
            "hsum": pa.array([int(s)], pa.uint64()),
        }
    )


def _label_digest(state: ray.data.Dataset) -> tuple[int, int]:
    t = collect_small(state.map_batches(
        _label_digest_batch, batch_format="pyarrow"), _DIGEST_SCHEMA)
    cnt = int(pc.sum(t["cnt"]).as_py() or 0)
    hsum = 0
    for v in t["hsum"].to_pylist():
        hsum = (hsum + v) & 0xFFFFFFFFFFFFFFFF
    return cnt, hsum


def _labels_from_state(state: ray.data.Dataset) -> ray.data.Dataset:
    def decode(b: pa.Table) -> pa.Table:
        lab = _split_labels(b)[1]
        return pa.table(
            {
                "node": pc.bit_wise_not(lab["node"]),
                "cluster_id": lab["member"],
            }
        )

    return state.map_batches(decode, batch_format="pyarrow")


def _cc_one_task(a, b) -> "pa.Table":
    """Single-task connected components over (a, b) int64 edge arrays:
    vectorized min-label relaxation with pointer jumping (O(log n)
    in-task rounds).  The budget-gated fast path of :func:`_cc_labels`;
    also reused by dataops.copurchase_components."""
    import numpy as np

    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[:a.size], inv[a.size:]
    lab = np.arange(nodes.size, dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, ea, lab[eb])
        np.minimum.at(new, eb, lab[ea])
        while True:                       # pointer jumping
            j = new[new]
            if np.array_equal(j, new):
                break
            new = j
        if np.array_equal(new, lab):
            break
        lab = new
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "cluster_id": pa.array(nodes[lab], pa.int64()),
    })


def _cc_labels(pairs: ray.data.Dataset,
               max_rounds: int = 64,
               small_graph_budget: int = 5_000_000) -> ray.data.Dataset:
    """(node, cluster_id=component min) for every node in ``pairs``.

    ONE all-to-all per round: the star groupby, keyed by
    ``mix64(node) % _CC_PARTS`` so each shuffle partition is processed
    by ONE vectorized task (:func:`_star_part`) rather than a Python
    call per node group.  State rows are NOT re-distincted — duplicate
    pairs across emitting groups are collapsed by the next round's
    in-task sort-dedupe, and the per-round row count stays O(sum of
    member-set sizes), so the extra shuffle a distinct pass would cost
    buys nothing.  Convergence is label-based:
    per-node min labels are monotonically nonincreasing, and a round
    with NO label change can never be followed by one with a change —
    a node's min drops only when it receives a smaller min, which
    requires either (a) membership in a group whose min already
    dropped-below-it in the PREVIOUS round (that round would have
    delivered the smaller min to it directly), or (b) receiving a set
    from a group that elected it minimum, whose elements are all >= it
    by construction.  So equal consecutive label digests == fixpoint,
    checked by an exact distributed multiset digest — never by
    materializing labels driver-side.
    """
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())})
        )
    if n_pairs <= small_graph_budget:
        # budget gate: a dup-pair graph that fits one worker's heap
        # solves in ONE vectorized task — the per-round exchanges of
        # the Hash-to-Min engine are pure fixed overhead there.  The
        # exchange engine below runs unchanged past the budget and is
        # pinned by tests with small_graph_budget=0.
        def one_task(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "node": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64())})
            a = b["doc_a"].to_numpy(zero_copy_only=False)
            d = b["doc_b"].to_numpy(zero_copy_only=False)
            return _cc_one_task(a, d)

        return pairs.repartition(1).map_batches(
            one_task, batch_format="pyarrow")

    state = pairs.map_batches(
        _seed_state, batch_format="pyarrow"
    ).materialize()
    prev: tuple[int, int] | None = None
    for rnd in range(max_rounds):
        strip = _strip_labels if rnd else None  # round 0 input has none
        src = state if strip is None else state.map_batches(
            strip, batch_format="pyarrow"
        )
        state = src.map_batches(
            _with_part, batch_format="pyarrow"
        ).groupby("part").map_groups(
            _star_part, batch_format="pyarrow"
        ).materialize()
        cur = _label_digest(state)
        if cur == prev:
            break
        prev = cur
    else:  # pragma: no cover - diameter 2^64 is unreachable
        raise RuntimeError("hash-to-min did not converge")
    return _labels_from_state(state)


def _label_join(base: ray.data.Dataset, labels: ray.data.Dataset,
                idcol: str, num_partitions: int,
                broadcast_budget: int = 5_000_000) -> ray.data.Dataset:
    """Left-attach component labels onto the full id column, losslessly.

    Budget gate: a label table under ``broadcast_budget`` rows is
    ``ray.put`` once and probed per block with a sorted ``searchsorted``
    lookup — zero exchanges.  Past the budget (at 100 TB labels can be
    a third of the corpus — a broadcast would not hold) the
    co-partitioned hash join below engages.

    Join-path detail: Ray's left-outer hash join may hand the nullable
    side back through pandas, where int64-with-nulls becomes float64 —
    silently corrupting ids >= 2**53.  The label therefore travels as
    a STRING through the join (object/utf8 survives pandas exactly)
    and is decoded back to int64 after the null fill.  ``labels`` must
    have columns (idcol:int64, cluster_id:int64); rows of ``base``
    without a label get their own id.
    """
    import ray as _ray

    from .common import collect_small, deref

    if labels.count() <= broadcast_budget:
        lt = collect_small(labels, pa.schema([
            (idcol, pa.int64()), ("cluster_id", pa.int64())]))
        ids = lt[idcol].to_numpy(zero_copy_only=False)
        cid = lt["cluster_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ref = _ray.put((ids[order], cid[order]))

        def attach(b: pa.Table, lut=None) -> pa.Table:
            k, v = deref(lut)
            d = b[idcol].to_numpy(zero_copy_only=False)
            out = d.copy()                 # unlabeled → own id
            if k.size:
                pos = np.minimum(np.searchsorted(k, d), k.size - 1)
                m = k[pos] == d
                out[m] = v[pos[m]]
            return pa.table({
                idcol: b[idcol],
                "cluster_id": pa.array(out, pa.int64()),
            })

        return base.map_batches(attach, batch_format="pyarrow",
                                fn_kwargs={"lut": ref})

    enc = labels.map_batches(
        lambda b: pa.table({
            idcol: b[idcol],
            "_cluster_str": pc.cast(b["cluster_id"], pa.string()),
        }),
        batch_format="pyarrow",
    )
    joined = base.join(enc, "left_outer", num_partitions, on=(idcol,))
    return joined.map_batches(
        lambda b: pa.table({
            idcol: b[idcol],
            "cluster_id": pc.coalesce(
                pc.cast(b["_cluster_str"], pa.int64()), b[idcol]
            ),
        }),
        batch_format="pyarrow",
    )


def dedup_clusters(sf_dir: str, num_partitions: int = 8
                   ) -> ray.data.Dataset:
    """(doc_id, cluster_id) for EVERY document: cluster_id = min doc_id
    of its near-duplicate component (minhash-verified Jaccard >= 0.8
    pairs as edges), own id for singletons.

    Pair graph → Hash-to-Min components → distributed left-outer hash
    join back onto the corpus (labels are only dup-pair members, but at
    100 TB that can be a third of the corpus — a broadcast would not
    hold, the hash join co-partitions by doc_id).

    This is the CHAIN; consumers (corpus_dedup / dedup_report /
    cluster_best_doc / corpus_prep, and the registry row) go through
    :func:`dedup_labels`, which runs the chain once per corpus version
    and serves the persisted artifact afterwards.
    """
    pairs = minhash_lsh_pairs(sf_dir).drop_columns(["jaccard"])
    labels = _cc_labels(pairs).map_batches(
        lambda b: pa.table(
            {"doc_id": b["node"], "cluster_id": b["cluster_id"]}
        ),
        batch_format="pyarrow",
    ).materialize()  # small (dup-pair members only); makes count() free
    docs = read(sf_dir, "documents", columns=["doc_id"])
    if labels.count() == 0:
        # no dup pairs at all — Ray's hash join rejects an all-empty
        # side, and every doc is its own cluster anyway
        return docs.map_batches(
            lambda b: pa.table(
                {"doc_id": b["doc_id"], "cluster_id": b["doc_id"]}
            ),
            batch_format="pyarrow",
        )
    return _label_join(docs, labels, "doc_id", num_partitions)


# Transitive closure over the exact-Jaccard pair graph; min reachable
# id = component id.  Small-component fixture keeps the recursive CTE
# cheap; the Ray path is the log-round distributed algorithm.
ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {JACCARD_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs WHERE j >= 0.8
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jpairs WHERE j >= 0.8
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc_id, e.v FROM reach JOIN edges e ON e.u = reach.r
)
SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
"""


# ------------------------------------------ persisted label artifact
# At 100 TB nobody recomputes near-dup labels per report: the
# shingle→LSH→verify→CC chain runs ONCE per corpus version and every
# consumer (corpus_dedup / dedup_report / cluster_best_doc /
# corpus_prep) joins against the persisted (doc_id, cluster_id) table
# through the storage seam — the same persisted-index pattern as
# incremental_dedup's band index (dedup.build_lsh_index).
_ARTIFACT_ROOT = os.environ.get(
    "WKM_ARTIFACT_DIR", "/tmp/whakoom_ray_artifacts")
_LABELS_FMT = 1  # bump on any chain-semantics change to invalidate


def _corpus_version(sf_dir: str, table: str = "documents") -> str:
    """Corpus-version key for persisted artifacts: identity + size +
    mtime_ns of the SOURCE table the artifact derives from (ns
    granularity makes a silent same-size in-place rewrite collision
    implausible; regenerated tables get fresh mtimes and therefore
    fresh artifacts).  Callers must name the table they actually read
    — the dedup labels derive from ``documents``, the IVF index from
    ``embeddings`` — or a regenerated source would silently serve a
    stale artifact."""
    import hashlib

    p = os.path.join(os.path.realpath(sf_dir), f"{table}.parquet")
    st = os.stat(p)
    return hashlib.sha1(
        f"{p}|{st.st_size}|{st.st_mtime_ns}|fmt{_LABELS_FMT}".encode()
    ).hexdigest()[:16]


def dedup_labels(sf_dir: str, num_partitions: int = 8,
                 artifact_root: str | None = None) -> ray.data.Dataset:
    """(doc_id, cluster_id) for every document — :func:`dedup_clusters`
    semantics, served from the per-corpus-version persisted artifact.

    First call per corpus version runs the full chain and streams the
    labels through the storage seam (workers write their own
    fragments, atomic directory rename publishes); subsequent calls —
    including every consumer pipeline — are ONE column-pruned scan.
    The chain output is deterministic, so artifact and fresh compute
    are interchangeable (pytest-pinned)."""
    from .. import storage

    root = artifact_root if artifact_root is not None else _ARTIFACT_ROOT
    final = os.path.join(root, "dedup_labels", _corpus_version(sf_dir))
    if not os.path.isdir(final):
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.tmp-{os.getpid()}"
        storage.backend().write_dataset(
            dedup_clusters(sf_dir, num_partitions), tmp)
        try:
            os.rename(tmp, final)      # atomic publish
        except OSError:                # concurrent builder won the race
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return storage.backend().read_dataset(
        final, columns=["doc_id", "cluster_id"])


def corpus_dedup(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_members): the deduplicated corpus — one representative
    (= component-min doc_id) per near-dup cluster, with its member
    count.  The materialized output a dedup pass feeds to training."""
    from .common import hash_keyed_agg

    # cluster_id cardinality ~ |docs|: coarse-partition vectorized
    # count, not Ray's per-key aggregate
    return hash_keyed_agg(
        dedup_labels(sf_dir), "cluster_id", count_alias="n_members"
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": b["cluster_id"], "n_members": b["n_members"]}
        ),
        batch_format="pyarrow",
    )


ORACLE_CORPUS_DEDUP = f"""
WITH RECURSIVE {JACCARD_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs WHERE j >= 0.8
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jpairs WHERE j >= 0.8
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc_id, e.v FROM reach JOIN edges e ON e.u = reach.r
),
labels AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
SELECT cluster_id AS doc_id, count(*) AS n_members
FROM labels GROUP BY cluster_id
"""


def embedding_clusters(sf_dir: str, num_partitions: int = 8
                       ) -> ray.data.Dataset:
    """(vec_id, cluster_id): semantic near-dup components over the
    EXACT cosine>=threshold pair graph (dedup.embedding_dup_pairs) —
    the embedding analog of :func:`dedup_clusters`, same hash-to-min
    engine, labels hash-joined back onto the embeddings table."""
    from .dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(sf_dir).map_batches(
        lambda b: pa.table({"doc_a": b["vec_a"], "doc_b": b["vec_b"]}),
        batch_format="pyarrow",
    )
    labels = _cc_labels(pairs).map_batches(
        lambda b: pa.table(
            {"vec_id": b["node"], "cluster_id": b["cluster_id"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    vecs = read(sf_dir, "embeddings", columns=["vec_id"])
    if labels.count() == 0:
        return vecs.map_batches(
            lambda b: pa.table(
                {"vec_id": b["vec_id"], "cluster_id": b["vec_id"]}
            ),
            batch_format="pyarrow",
        )
    return _label_join(vecs, labels, "vec_id", num_partitions)


ORACLE_EMBEDDING_CLUSTERS = """
WITH RECURSIVE epairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(
          CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
        ) >= 0.45
),
edges AS (SELECT u, v FROM epairs UNION SELECT v, u FROM epairs),
reach(vec_id, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT reach.vec_id, e.v FROM reach JOIN edges e ON e.u = reach.r
)
SELECT vec_id, min(r) AS cluster_id FROM reach GROUP BY vec_id
"""


# ------------------------------------------------- decontamination
_EVAL_MOD = 97  # deterministic eval split: doc_id % 97 == 0


def _gram_set(b: pa.Table, k: int = 3) -> np.ndarray:
    th, starts, lens = _split_flat(b)
    g, _ = _gram_hashes_flat(th, starts, lens, k)
    return np.unique(g)


def _decon_eval_ref(docs: ray.data.Dataset) -> "ray.ObjectRef":
    """One pass over documents: the eval split's unique gram hashes,
    unioned driver-side and broadcast once (the small side)."""

    def eval_grams(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        g = _gram_set(b.filter(pa.array(ids % _EVAL_MOD == 0)))
        return pa.table({"g": pa.array(g.view(np.int64), pa.int64())})

    gs = collect_small(
        docs.map_batches(eval_grams, batch_format="pyarrow"),
        pa.schema([("g", pa.int64())]),
    )
    return ray.put(
        pa.array(np.unique(gs["g"].to_numpy(zero_copy_only=False)),
                 pa.int64())
    )


def _decon_flag_batch(b: pa.Table, gset) -> pa.Table:
    """(doc_id, contaminated) for one batch's TRAINING docs — the
    vectorized is_in probe against the broadcast eval-gram set (per-doc
    any via logical_or.reduceat).  Shared by :func:`decontaminate` and
    the fused corpus_prep scan."""
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    b = b.filter(pa.array(ids % _EVAL_MOD != 0))
    th, starts, lens = _split_flat(b)
    g, bounds = _gram_hashes_flat(th, starts, lens, 3)
    hit = pc.is_in(
        pa.array(g.view(np.int64), pa.int64()), value_set=deref(gset)
    ).to_numpy(zero_copy_only=False)
    # every doc owns >= 1 gram (short docs hash their whole token
    # sequence), so bounds are strictly increasing per doc
    contaminated = (
        np.logical_or.reduceat(hit, bounds[:-1])
        if b.num_rows else np.empty(0, dtype=bool)
    )
    return pa.table(
        {
            "doc_id": b["doc_id"],
            "contaminated": pa.array(contaminated, pa.bool_()),
        }
    )


def decontaminate(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, contaminated) over TRAINING docs (doc_id % 97 != 0):
    contaminated = shares any word-3-gram with the held-out eval split
    (doc_id % 97 == 0) — the benchmark-decontamination pass.

    Eval grams are the small side: computed distributed, unioned
    driver-side, broadcast ONCE via ray.put; training docs stream
    through a vectorized is_in probe (per-doc any via
    logical_or.reduceat).  Gram hashes stand in for gram strings —
    overlap equality modulo 64-bit collisions, same contract the
    Jaccard oracle documents (dedup.py ORACLE_JACCARD_PAIRS).
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    gs_ref = _decon_eval_ref(docs)
    return docs.map_batches(
        _decon_flag_batch, fn_kwargs={"gset": gs_ref},
        batch_format="pyarrow",
    )


ORACLE_DECONTAMINATE = f"""
WITH {JACCARD_CTES},
eval_g AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams
  WHERE doc_id % {_EVAL_MOD} = 0
),
hits AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams
        WHERE doc_id % {_EVAL_MOD} <> 0) t
  JOIN eval_g e USING (g)
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM grams d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_EVAL_MOD} <> 0
"""


# --------------------------------------- quality-stratified sampling
_SAMPLE_PCT_LOW = 25  # keep % of quality_ok=false docs


def quality_sample(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, quality_ok, samp_bucket): deterministic
    quality-stratified downsample — every quality_ok doc survives,
    below-bar docs survive at 25% selected by a content
    hash (fingerprint mod 100), so the sample is reproducible across
    runs/cluster sizes with no RNG state.  Single fused map_batches
    (quality + fingerprint share the read), no shuffle.
    """

    return read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _quality_sample_batch, batch_format="pyarrow"
    )


def _quality_sample_batch(b: pa.Table) -> pa.Table:
    """One batch of the quality-stratified downsample — shared by
    :func:`quality_sample` and the fused corpus_prep scan."""
    q = _quality_batch(b)
    fp = _fingerprint_batch(b)["fingerprint"].to_numpy(
        zero_copy_only=False
    ).view(np.uint64)
    bucket = (fp % np.uint64(100)).astype(np.int64)
    ok = q["quality_ok"].to_numpy(zero_copy_only=False)
    keep = ok | (bucket < _SAMPLE_PCT_LOW)
    return pa.table(
        {
            "doc_id": q["doc_id"],
            "quality_ok": q["quality_ok"],
            "samp_bucket": pa.array(bucket, pa.int64()),
        }
    ).filter(pa.array(keep))


# ----------------------------------- deterministic split / shuffle
_SPLIT_SEED = 0x9E3779B97F4A7C15   # golden-ratio odd constant
_SHUF_SEED = 0xD1B54A32D192ED03    # distinct seed: split ⟂ shuffle order


def _split_buckets(ids: np.ndarray) -> np.ndarray:
    """Deterministic 80/10/10 bucket labels for int64 doc ids — the
    ONE implementation split_assign and corpus_prep both use."""
    h = mix64(np.ascontiguousarray(ids).view(np.uint64)
              ^ np.uint64(_SPLIT_SEED))
    bucket = (h % np.uint64(100)).astype(np.int64)
    return np.where(
        bucket < 80, "train", np.where(bucket < 90, "val", "test")
    )


def split_assign(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, split) — deterministic 80/10/10 train/val/test
    assignment by ``fmix64(doc_id ^ seed) % 100``.  Pure map, no
    shuffle, reproducible across runs and cluster sizes (the property
    RNG-based splits lose when block boundaries move); id-keyed (not
    content-keyed) so re-crawled versions of a document stay in the
    same split and never leak train→test."""

    def assign(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "split": pa.array(_split_buckets(ids), pa.string()),
            }
        )

    return read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


def split_assign_oracle_sql() -> str:
    from .text import fmix64_docid_ctes

    ctes, final = fmix64_docid_ctes(_SPLIT_SEED, "sp")
    return f"""
WITH {ctes}
SELECT doc_id,
       CASE WHEN h % 100 < 80 THEN 'train'
            WHEN h % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM {final}
"""


# Range partitions for the distributed rank: keys are fmix64-uniform,
# so the TOP bits of the key range-partition the corpus evenly AND
# preserve global order across partitions (partition i's keys all sort
# before partition i+1's).  Raise with corpus size so one partition
# fits a worker's heap (4096 parts ≈ 25 GB/part at 100 TB).
_SHUF_PART_BITS = 6


def corpus_shuffle(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, position) — deterministic global training order:
    position = rank of ``fmix64(doc_id ^ seed)`` (ties by doc_id).

    A seeded hash ORDER, not ``random_shuffle()``: the permutation is a
    pure function of the ids, so a resumed or re-sharded run (or the
    DuckDB oracle) reproduces it exactly.  Distributed rank in ONE
    all-to-all: (1) tiny map-side partial counts per range partition →
    driver cumsum → broadcast offsets (≤2^bits rows, never doc rows);
    (2) groupby(part) ranks each partition locally and adds its
    offset.  Top-bits range partitioning keeps cross-partition order,
    so ranks are globally correct without a global sort.
    """
    docs = read(sf_dir, "documents", columns=["doc_id"])
    shift = np.uint64(64 - _SHUF_PART_BITS)

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        h = mix64(ids.view(np.uint64) ^ np.uint64(_SHUF_SEED))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                # int64 view is order-safe INSIDE a partition: all keys
                # there share the top bits, hence the sign bit
                "h": pa.array(h.view(np.int64), pa.int64()),
                "part": pa.array((h >> shift).astype(np.int64)),
            }
        )

    # two consumers (partial counts + the rank groupby): materialize
    # the slim keyed rows (24 B/doc) once instead of re-reading and
    # re-hashing the corpus for each
    keyed_ds = docs.map_batches(
        keyed, batch_format="pyarrow"
    ).materialize()

    def part_counts(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["part"]).aggregate([([], "count_all")])
        return pa.table({"part": g["part"], "n": g["count_all"]})

    cnt = collect_small(
        keyed_ds.map_batches(part_counts, batch_format="pyarrow"),
        pa.schema([("part", pa.int64()), ("n", pa.int64())]),
    )
    totals = np.zeros(1 << _SHUF_PART_BITS, dtype=np.int64)
    np.add.at(totals, cnt["part"].to_numpy(zero_copy_only=False),
              cnt["n"].to_numpy(zero_copy_only=False))
    offsets = ray.put(np.r_[0, np.cumsum(totals)][:-1])

    def rank_part(g: pa.Table, offs=None) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "position": pa.array([], pa.int64())})
        offs = deref(offs)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, h))
        base = int(offs[int(g["part"][0].as_py())])
        pos = np.empty(ids.size, dtype=np.int64)
        pos[order] = base + np.arange(ids.size, dtype=np.int64)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "position": pa.array(pos, pa.int64()),
            }
        )

    return keyed_ds.groupby("part").map_groups(
        rank_part, batch_format="pyarrow", fn_kwargs={"offs": offsets}
    )


def corpus_shuffle_oracle_sql() -> str:
    from .text import fmix64_docid_ctes

    ctes, final = fmix64_docid_ctes(_SHUF_SEED, "sh")
    return f"""
WITH {ctes}
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
         AS position
FROM {final}
"""


_BAL_CAP = 120  # per-language document cap
_BAL_SEED = 0xA24BAED4963EE407


def lang_balanced_sample(sf_dir: str, cap: int = _BAL_CAP
                         ) -> ray.data.Dataset:
    """(doc_id, lang) — language-balanced subcorpus: at most ``cap``
    documents per language, selected deterministically by
    ``fmix64(doc_id ^ seed)`` order (ties by doc_id) — the corpus
    re-balancing pass that stops a head language from drowning the
    tail.  Hash order makes the per-language selection a uniform
    random-without-RNG sample that is stable across runs and cluster
    sizes.

    Distributed shape: a map-side combiner keeps only each block's
    first ``cap`` rows per language BEFORE the shuffle (the grouped
    top-k prune — the exchange moves ≤ cap × langs × blocks rows,
    never the corpus), then one groupby(lang) finishes the selection
    per group."""
    from .text import mix64

    def keyed_prune(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        h = mix64(ids.view(np.uint64) ^ np.uint64(_BAL_SEED))
        langs = b["lang"].to_numpy(zero_copy_only=False)
        _, codes = np.unique(langs, return_inverse=True)
        order = np.lexsort((ids, h.view(np.int64), codes))
        # h int64 view vs uint64 order: within the lexsort we only
        # need SOME total order per lang for the local prune to be a
        # superset of the global winners — and the final per-group
        # sort below uses the same int64-view key, so local and
        # global orders agree and the prune is lossless.
        starts = np.flatnonzero(
            np.r_[True, codes[order][1:] != codes[order][:-1]]
        ) if len(codes) else np.empty(0, dtype=np.int64)
        within = (
            np.arange(len(codes)) - np.repeat(
                starts, np.diff(np.r_[starts, len(codes)])
            ) if len(codes) else np.empty(0, dtype=np.int64)
        )
        keep = np.sort(order[within < cap])
        t = b.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "h": pa.array(
                    h[keep].view(np.int64), pa.int64()
                ),
            }
        )

    def per_lang(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:cap]
        t = g.take(pa.array(np.sort(order), pa.int64()))
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"]})

    return (
        read(sf_dir, "documents", columns=["doc_id", "lang"])
        .map_batches(keyed_prune, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(per_lang, batch_format="pyarrow")
    )


def lang_balanced_sample_oracle_sql(cap: int = _BAL_CAP) -> str:
    """row_number over the SAME int64-view hash order the engine uses:
    the engine compares fmix64 keys as SIGNED int64 (a fixed bijective
    re-ordering, still a uniform sample), so the oracle wraps h to
    signed before ranking."""
    from .text import fmix64_docid_ctes

    ctes, final = fmix64_docid_ctes(_BAL_SEED, "bal")
    two64 = "18446744073709551616::HUGEINT"
    return f"""
WITH {ctes},
signed AS (
  SELECT doc_id,
         CAST(CASE WHEN h >= 9223372036854775808::UBIGINT
                   THEN CAST(h AS HUGEINT) - {two64}
                   ELSE CAST(h AS HUGEINT) END AS BIGINT) AS hs
  FROM {final}
),
ranked AS (
  SELECT d.doc_id, d.lang,
         row_number() OVER (
           PARTITION BY d.lang ORDER BY s.hs, d.doc_id
         ) AS rn
  FROM documents d JOIN signed s USING (doc_id)
)
SELECT doc_id, lang FROM ranked WHERE rn <= {cap}
"""


_MIX_SEED = 0x6A09E667F3BCC909


def source_mix_sample(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, source) — deterministic data-mixing downsample: each
    source s survives at its own rate (basis points derived from the
    source's numeric id: 1000 + 557·(id mod 16)), selected by
    ``fmix64(doc_id ^ seed) % 10000``.  The training-mixture
    composition pass: pure map, no shuffle, reproducible across runs
    and cluster sizes, and per-source proportions hold exactly in
    expectation regardless of how rows are sharded."""
    from .text import mix64

    def sample(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["source"], pattern=r"(?P<n>[0-9]+)")
        srcnum = pc.cast(pc.struct_field(m, "n"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rate = 1000 + 557 * (srcnum % 16)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        h = mix64(ids.view(np.uint64) ^ np.uint64(_MIX_SEED))
        keep = (h % np.uint64(10000)).astype(np.int64) < rate
        return pa.table(
            {"doc_id": b["doc_id"], "source": b["source"]}
        ).filter(pa.array(keep))

    return read(sf_dir, "documents", columns=["doc_id", "source"]
                ).map_batches(sample, batch_format="pyarrow")


def source_mix_sample_oracle_sql() -> str:
    from .text import fmix64_docid_ctes

    ctes, final = fmix64_docid_ctes(_MIX_SEED, "mx")
    return f"""
WITH {ctes}
SELECT d.doc_id, d.source
FROM documents d JOIN {final} h USING (doc_id)
WHERE h.h % 10000
      < 1000 + 557 * (CAST(regexp_extract(d.source, '([0-9]+)', 1)
                           AS BIGINT) % 16)
"""


_PACK_BUDGET = 1024  # token budget per packed training sequence


def _shuffle_keyed(b: pa.Table) -> pa.Table:
    """documents batch → slim (doc_id, h, part, n_tok) packing rows:
    corpus_shuffle hash, its top-bits range partition, token count."""
    ids = b["doc_id"].to_numpy(zero_copy_only=False)
    h = mix64(ids.view(np.uint64) ^ np.uint64(_SHUF_SEED))
    n_tok = pc.list_value_length(
        pc.split_pattern(b["text"], " ")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    shift = np.uint64(64 - _SHUF_PART_BITS)
    return pa.table(
        {
            "doc_id": b["doc_id"],
            "h": pa.array(h.view(np.int64), pa.int64()),
            "part": pa.array((h >> shift).astype(np.int64)),
            "n_tok": pa.array(n_tok, pa.int64()),
        }
    )


def _pack_keyed(keyed_ds: ray.data.Dataset,
                budget: int) -> ray.data.Dataset:
    """(doc_id, pack_id) from MATERIALIZED keyed rows (doc_id, h,
    part, n_tok): the two-level exact prefix sum shared by
    sequence_pack and corpus_prep — top-bits range partitioning
    preserves the global hash order, tiny per-partition token totals
    cumsum driver-side into offsets, each partition packs locally."""

    def part_tok(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["part"]).aggregate([("n_tok", "sum")])
        return pa.table({"part": g["part"], "t": g["n_tok_sum"]})

    cnt = collect_small(
        keyed_ds.map_batches(part_tok, batch_format="pyarrow"),
        pa.schema([("part", pa.int64()), ("t", pa.int64())]),
    )
    totals = np.zeros(1 << _SHUF_PART_BITS, dtype=np.int64)
    np.add.at(totals, cnt["part"].to_numpy(zero_copy_only=False),
              cnt["t"].to_numpy(zero_copy_only=False))
    offsets = ray.put(np.r_[0, np.cumsum(totals)][:-1])

    def pack_part(g: pa.Table, offs=None) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pack_id": pa.array([], pa.int64())})
        offs = deref(offs)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        h = np.ascontiguousarray(
            g["h"].to_numpy(zero_copy_only=False)
        ).view(np.uint64)
        nt = g["n_tok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        base = int(offs[int(g["part"][0].as_py())])
        prefix_excl = base + np.cumsum(nt[order]) - nt[order]
        pack = np.empty(ids.size, dtype=np.int64)
        pack[order] = prefix_excl // budget
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "pack_id": pa.array(pack, pa.int64()),
            }
        )

    return keyed_ds.groupby("part").map_groups(
        pack_part, batch_format="pyarrow", fn_kwargs={"offs": offsets}
    )


def sequence_pack(sf_dir: str, budget: int = _PACK_BUDGET
                  ) -> ray.data.Dataset:
    """(doc_id, pack_id) — context-window packing: documents are laid
    out in the deterministic :func:`corpus_shuffle` order and chunked
    into packs by a running token budget (pack_id = exclusive prefix
    token sum ÷ budget).  The sequence-packing pass a training
    pipeline runs before tokenization; machinery in
    :func:`_pack_keyed` (shared with :func:`corpus_prep`)."""
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    # two consumers (token totals + the packing groupby): materialize
    # the slim keyed rows once — the text column never leaves the
    # first pass
    keyed_ds = docs.map_batches(
        _shuffle_keyed, batch_format="pyarrow"
    ).materialize()
    return _pack_keyed(keyed_ds, budget)


def sequence_pack_oracle_sql(budget: int = _PACK_BUDGET) -> str:
    """Window prefix-sum over the SAME unsigned hash order the engine
    packs in (corpus_shuffle order: uint64 h ascending)."""
    from .text import fmix64_docid_ctes

    ctes, final = fmix64_docid_ctes(_SHUF_SEED, "pk")
    return f"""
WITH {ctes},
toks AS (
  SELECT d.doc_id, f.h,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
  FROM documents d JOIN {final} f USING (doc_id)
)
SELECT doc_id,
       CAST((sum(n_tok) OVER (ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok)
            // {budget} AS BIGINT) AS pack_id
FROM toks
"""


def quality_sample_oracle_sql() -> str:
    """Quality CTE + bit-exact fingerprint CTE → stratified keep."""
    two64 = "18446744073709551616::HUGEINT"
    return f"""
WITH q AS ({ORACLE_QUALITY_SCORE}),
f AS ({fingerprints_oracle_sql()}),
b AS (
  SELECT q.doc_id, q.quality_ok,
         CAST((CASE WHEN f.fingerprint < 0
                    THEN CAST(f.fingerprint AS HUGEINT) + {two64}
                    ELSE CAST(f.fingerprint AS HUGEINT) END
               % 100) AS BIGINT) AS samp_bucket
  FROM q JOIN f USING (doc_id)
)
SELECT doc_id, quality_ok, samp_bucket FROM b
WHERE quality_ok OR samp_bucket < {_SAMPLE_PCT_LOW}
"""


# ------------------------------------- end-to-end corpus preparation
def corpus_prep(sf_dir: str, budget: int = _PACK_BUDGET,
                parts: int = 64) -> ray.data.Dataset:
    """(doc_id, split, pack_id) — the END-TO-END training-data prep
    pipeline, composed from the curation stages a real corpus run
    chains: a document survives iff it is (a) its near-dup cluster's
    REPRESENTATIVE (dedup_clusters: cluster-min doc_id), (b) a
    quality-stratified sample survivor (quality_sample), and (c) a
    decontaminated training doc (decontaminate: not in the held-out
    eval split, shares no 3-gram with it); survivors then get the
    deterministic 80/10/10 split and are context-window packed in
    corpus_shuffle order with prefix sums over the SURVIVING corpus
    only (pack_id is a function of the filtered stream, so the whole
    chain must compose correctly end to end — this is what the oracle
    checks).

    Scale shape (r5: FUSED scan): the quality and decontamination
    masks are batch-local kernels given the broadcast eval-gram set,
    so ONE pass over documents emits the keyed packing rows AND both
    mask-bit row families from the same batch — the documents table
    is read twice total (eval-gram collection + fused scan) instead
    of four times, which at 100 TB is the dominant I/O halved.  The
    cluster-representative bit rides the slim persisted
    :func:`dedup_labels` artifact.  All row families co-partition by
    ``mix64(doc_id) % parts`` in ONE tagged-union shuffle; each
    partition ORs the per-doc mask bits and keeps the keyed rows of
    docs with all three bits — id-level rows only, never text.
    Packing then reuses the two-level exact prefix sum (top-bits range
    partitions preserve the global hash order; per-partition token
    totals cumsum driver-side into offsets).
    """
    from .dedup import _id_part

    reps = dedup_labels(sf_dir)  # persisted artifact, not a recompute
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    gs_ref = _decon_eval_ref(docs)   # pass 1 of 2 over documents

    z64 = lambda n: pa.array(np.zeros(n, np.int64), pa.int64())  # noqa: E731

    def bit_rows_tbl(b: pa.Table, bit: int) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "mpart": _id_part(b["doc_id"], parts),
            "bit": pa.array(np.full(n, bit, np.int8), pa.int8()),
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "h": z64(n),
            "part": z64(n),
            "n_tok": z64(n),
        })

    def keyed(b: pa.Table) -> pa.Table:
        # the packing rows (shared _shuffle_keyed), tagged for the
        # mask co-partition
        t = _shuffle_keyed(b)
        n = t.num_rows
        return pa.table({
            "mpart": _id_part(t["doc_id"], parts),
            "bit": pa.array(np.zeros(n, np.int8), pa.int8()),
            "doc_id": t["doc_id"],
            "h": t["h"],
            "part": t["part"],
            "n_tok": t["n_tok"],
        })

    def fused(b: pa.Table, gset=None) -> pa.Table:
        # pass 2 of 2: keyed rows + quality survivors (bit 2) +
        # decontaminated training docs (bit 4), one batch in flight —
        # identical kernels to the standalone pipelines
        qs = _quality_sample_batch(b)
        dec = _decon_flag_batch(b, gset)
        clean = dec.filter(pc.invert(dec["contaminated"]))
        return pa.concat_tables([
            keyed(b),
            bit_rows_tbl(qs, 2),
            bit_rows_tbl(clean, 4),
        ])

    def rep_rows(b: pa.Table) -> pa.Table:
        return bit_rows_tbl(
            b.filter(pc.equal(b["doc_id"], b["cluster_id"])), 1)

    tagged = (
        docs.map_batches(fused, fn_kwargs={"gset": gs_ref},
                         batch_format="pyarrow")
        .union(reps.map_batches(rep_rows, batch_format="pyarrow"))
    )

    def survivors(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
            "n_tok": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        bits = g["bit"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uid.size, dtype=np.int64)
        np.bitwise_or.at(acc, inv, bits)
        full = acc[inv] == 7
        keyed_row = bits == 0
        return g.filter(pa.array(full & keyed_row)).select(
            ["doc_id", "h", "part", "n_tok"]
        )

    kept = tagged.groupby("mpart").map_groups(
        survivors, batch_format="pyarrow"
    ).materialize()  # slim id-level rows; two consumers in _pack_keyed

    def add_split(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "split": pa.array(_split_buckets(ids), pa.string()),
            "pack_id": b["pack_id"],
        })

    return _pack_keyed(kept, budget).map_batches(
        add_split, batch_format="pyarrow"
    )


def corpus_prep_oracle_sql(budget: int = _PACK_BUDGET) -> str:
    """The composed chain in one SQL statement: cluster reps ∩ quality
    survivors ∩ decontaminated docs → split + packing over survivors.
    Stage oracles nest as subqueries (inner WITHs shadow the outer
    JACCARD CTEs, which is fine — correctness over reuse at oracle
    scale)."""
    from .text import fmix64_docid_ctes

    sp_ctes, sp_final = fmix64_docid_ctes(_SPLIT_SEED, "sp")
    pk_ctes, pk_final = fmix64_docid_ctes(_SHUF_SEED, "pk")
    return f"""
WITH RECURSIVE {JACCARD_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs WHERE j >= 0.8
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jpairs WHERE j >= 0.8
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc_id, e.v FROM reach JOIN edges e ON e.u = reach.r
),
labels AS (
  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
),
qsurv AS ({quality_sample_oracle_sql()}),
dec AS ({ORACLE_DECONTAMINATE}),
{sp_ctes},
{pk_ctes},
surv AS (
  SELECT l.doc_id FROM labels l
  JOIN qsurv q USING (doc_id)
  JOIN dec USING (doc_id)
  WHERE l.cluster_id = l.doc_id AND NOT dec.contaminated
),
ptoks AS (
  SELECT d.doc_id, pk.h,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
  FROM documents d
  JOIN surv USING (doc_id)
  JOIN {pk_final} pk USING (doc_id)
),
packed AS (
  SELECT doc_id,
         CAST((sum(n_tok) OVER (ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok)
              // {budget} AS BIGINT) AS pack_id
  FROM ptoks
)
SELECT p.doc_id,
       CASE WHEN sp.h % 100 < 80 THEN 'train'
            WHEN sp.h % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       p.pack_id
FROM packed p JOIN {sp_final} sp USING (doc_id)
"""


# ------------------------------- decontamination, Bloom-filter path
_BLOOM_LOG2M = 20  # 2^20 bits = 128 KiB packed; scale up with |eval|
_BLOOM_HASHES = 4
# odd 64-bit multipliers (splitmix64 increments) — h_i(g) derives from
# the gram hash alone, so build and probe agree with no shared state
_BLOOM_MULTS = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                0x94D049BB133111EB, 0xD6E8FEB86659FD93)


def _bloom_positions(g: np.ndarray, log2m: int) -> list[np.ndarray]:
    shift = np.uint64(64 - log2m)
    return [((g * np.uint64(_BLOOM_MULTS[i])) >> shift).astype(np.int64)
            for i in range(_BLOOM_HASHES)]


def decontaminate_bloom(sf_dir: str,
                        log2m: int = _BLOOM_LOG2M) -> ray.data.Dataset:
    """(doc_id, contaminated): the BLOOM-FILTER path for benchmark
    decontamination — same contract as ``decontaminate`` but the eval
    gram set is compressed to a 2^log2m-bit filter instead of being
    broadcast verbatim, the shape that survives an eval suite too
    large to ship as raw 64-bit hashes (bits are |eval_grams|-
    independent; build-side traffic is sparse nonzero words only).

    One-sided by construction: false positives at rate
    ~(1 − e^(−h·n/m))^h, NEVER false negatives — every exactly-
    contaminated doc stays flagged (property-tested against the exact
    companion).  Approximate BY DESIGN → no SQL oracle; the bit-exact
    companion is ``decontaminate``.
    """
    import ray as _ray

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    n_words = (1 << log2m) >> 6

    def eval_bits(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        g = _gram_set(b.filter(pa.array(ids % _EVAL_MOD == 0)))
        words = np.zeros(n_words, dtype=np.uint64)
        for pos in _bloom_positions(g, log2m):
            np.bitwise_or.at(words, pos >> 6,
                             np.uint64(1) << (pos.astype(np.uint64)
                                              & np.uint64(63)))
        nz = np.flatnonzero(words)
        return pa.table({
            "w": pa.array(nz, pa.int64()),
            "bits": pa.array(words[nz].view(np.int64), pa.int64()),
        })

    sparse = collect_small(
        docs.map_batches(eval_bits, batch_format="pyarrow"),
        pa.schema([("w", pa.int64()), ("bits", pa.int64())]),
    )
    words = np.zeros(n_words, dtype=np.uint64)
    np.bitwise_or.at(
        words,
        sparse["w"].to_numpy(zero_copy_only=False),
        sparse["bits"].to_numpy(zero_copy_only=False).view(np.uint64),
    )
    bits_ref = _ray.put(words)

    def flag(b: pa.Table, bloom=None) -> pa.Table:
        bw = deref(bloom)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % _EVAL_MOD != 0))
        th, starts, lens = _split_flat(b)
        g, bounds = _gram_hashes_flat(th, starts, lens, 3)
        hit = np.ones(g.size, dtype=bool)
        for pos in _bloom_positions(g, log2m):
            hit &= (bw[pos >> 6]
                    >> (pos.astype(np.uint64) & np.uint64(63))
                    ) & np.uint64(1) != 0
        contaminated = (
            np.logical_or.reduceat(hit, bounds[:-1])
            if b.num_rows else np.empty(0, dtype=bool)
        )
        return pa.table({
            "doc_id": b["doc_id"],
            "contaminated": pa.array(contaminated, pa.bool_()),
        })

    return docs.map_batches(
        flag, fn_kwargs={"bloom": bits_ref}, batch_format="pyarrow"
    )


# ----------------------------------- deterministic weighted sampling
_WSAMPLE_SEED = 0xA24BAED4963EE407   # distinct seed: ⟂ split / shuffle
_WSAMPLE_K = 200


def contamination_report(sf_dir: str, parts: int = 32
                         ) -> ray.data.Dataset:
    """(source, n_docs, n_contaminated, contaminated_per_million):
    what benchmark decontamination would delete from each source —
    the per-source leakage telemetry a curation run reports alongside
    :func:`dedup_report` before committing to the cleaned corpus.

    Scale shape mirrors dedup_report: the decontamination flags
    co-partition-join onto the corpus-sized (doc_id, source)
    projection (never a broadcast) and per-source counts ride the
    two-phase combiner."""
    from .common import copartition_join, two_phase_agg

    dec = decontaminate(sf_dir)
    docs = read(sf_dir, "documents", columns=["doc_id", "source"])
    joined = copartition_join(
        dec, docs, on="doc_id", parts=parts,
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("contaminated", pa.bool_())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("source", pa.string())]),
    )

    def flag(b: pa.Table) -> pa.Table:
        c = b["contaminated"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "one": pa.array(np.ones(c.size, np.int64), pa.int64()),
            "con": pa.array(
                np.asarray(c, dtype=bool).astype(np.int64),
                pa.int64()),
        })

    agg = two_phase_agg(
        joined.map_batches(flag, batch_format="pyarrow"),
        ["source"],
        sums={"one": "n_docs", "con": "n_contaminated"},
    )

    def finish(b: pa.Table) -> pa.Table:
        nd = b["n_docs"].to_numpy(zero_copy_only=False)
        nc = b["n_contaminated"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "n_docs": b["n_docs"],
            "n_contaminated": b["n_contaminated"],
            "contaminated_per_million": pa.array(
                nc * 1_000_000 // nd, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_CONTAMINATION_REPORT = f"""
WITH dec AS ({ORACLE_DECONTAMINATE})
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN dec.contaminated THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(sum(CASE WHEN dec.contaminated THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT)
         AS contaminated_per_million
FROM dec JOIN documents d USING (doc_id)
GROUP BY d.source
"""


def pack_stats(sf_dir: str, budget: int = _PACK_BUDGET,
               parts: int = 64) -> ray.data.Dataset:
    """(pack_id, n_docs, n_tokens, fill_ppm): per-pack utilization of
    the :func:`sequence_pack` layout (fill_ppm = tokens packed per
    million of budget) — the packing-efficiency telemetry that tells a
    training run how much context window it wastes.

    pack_id cardinality is corpus_tokens/budget — corpus-scale — so
    the rollup rides the coarse-partition :func:`~.common
    .hash_keyed_agg`, never Ray's per-key aggregate; the token counts
    join the packing assignment through the slim keyed rows (doc_id,
    n_tok) already materialized for the pack pass."""
    from .common import copartition_join, hash_keyed_agg

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    keyed = docs.map_batches(
        _shuffle_keyed, batch_format="pyarrow"
    ).materialize()
    packed = _pack_keyed(keyed, budget)
    toks = keyed.map_batches(
        lambda b: b.select(["doc_id", "n_tok"]),
        batch_format="pyarrow")
    joined = copartition_join(
        packed, toks, on="doc_id", parts=parts,
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("pack_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_tok", pa.int64())]),
    )
    agg = hash_keyed_agg(joined, "pack_id",
                         sums={"n_tok": "n_tokens"},
                         count_alias="n_docs", parts=parts)

    def finish(b: pa.Table) -> pa.Table:
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pack_id": b["pack_id"],
            "n_docs": b["n_docs"],
            "n_tokens": b["n_tokens"],
            "fill_ppm": pa.array(
                nt * 1_000_000 // budget, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def pack_stats_oracle_sql(budget: int = _PACK_BUDGET) -> str:
    from .text import fmix64_docid_ctes

    ctes, final = fmix64_docid_ctes(_SHUF_SEED, "pk")
    return f"""
WITH {ctes},
toks AS (
  SELECT d.doc_id, f.h,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
  FROM documents d JOIN {final} f USING (doc_id)
),
packed AS (
  SELECT doc_id, n_tok,
         CAST((sum(n_tok) OVER (ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok)
              // {budget} AS BIGINT) AS pack_id
  FROM toks
)
SELECT pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(n_tok) * 1000000 // {budget} AS BIGINT) AS fill_ppm
FROM packed GROUP BY pack_id
"""


def weighted_sample(sf_dir: str, k: int = _WSAMPLE_K) -> ray.data.Dataset:
    """(doc_id, n_chars): a deterministic size-weighted sample of k
    documents — longer documents proportionally likelier, the
    training-mix primitive for byte-budget-weighted corpus draws.

    Priority scheme: ``pri = fmix64(doc_id ^ seed) // n_chars``; take
    the k SMALLEST priorities.  Dividing a fixed uniform 64-bit hash
    by the weight makes selection probability rise with weight
    (integer analog of the exponential-jump A-ES scheme) while staying
    pure-integer, so Ray and the DuckDB oracle agree bit for bit —
    no float ``u^(1/w)`` whose ulps could flip a boundary row.

    Scale shape: ZERO shuffles — each block reduces to its own k
    smallest priorities (vectorized argpartition-equivalent), and only
    k×blocks candidate rows reach the single-task final merge.  The
    same top-k-by-priority layout at any corpus size; adding nodes
    only adds candidate rows linearly in block count.
    """
    def local_k(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        w = b["n_chars"].to_numpy(zero_copy_only=False)
        h = mix64(np.ascontiguousarray(ids).view(np.uint64)
                  ^ np.uint64(_WSAMPLE_SEED))
        # clamp to >=1 (mirrored by greatest() in the oracle): a
        # zero-length doc must not divide by zero — numpy would
        # silently yield priority 0 (always selected) while SQL errors
        pri = h // np.maximum(w, 1).astype(np.uint64)
        if ids.size > k:
            idx = np.lexsort((ids, pri))[:k]
            ids, w, pri = ids[idx], w[idx], pri[idx]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(w, pa.int64()),
            # pri < 2**64 may exceed int64: split into high/low halves
            # so the merge can reconstruct without overflow
            "pri_hi": pa.array((pri >> np.uint64(32)).astype(np.int64),
                               pa.int64()),
            "pri_lo": pa.array(
                (pri & np.uint64(0xFFFFFFFF)).astype(np.int64),
                pa.int64()),
        })

    def merge_k(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        w = b["n_chars"].to_numpy(zero_copy_only=False)
        pri = (b["pri_hi"].to_numpy(zero_copy_only=False)
               .astype(np.uint64) << np.uint64(32)) | (
            b["pri_lo"].to_numpy(zero_copy_only=False)
            .astype(np.uint64))
        idx = np.lexsort((ids, pri))[:k]
        return pa.table({
            "doc_id": pa.array(ids[idx], pa.int64()),
            "n_chars": pa.array(w[idx], pa.int64()),
        })

    return (
        read(sf_dir, "documents", columns=["doc_id", "n_chars"])
        .map_batches(local_k, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_k, batch_format="pyarrow")
    )


def weighted_sample_oracle_sql(k: int = _WSAMPLE_K) -> str:
    from .text import fmix64_docid_ctes

    ctes, final = fmix64_docid_ctes(_WSAMPLE_SEED, "ws")
    return f"""
WITH {ctes}
SELECT m.doc_id, d.n_chars
FROM {final} m JOIN documents d ON m.doc_id = d.doc_id
ORDER BY m.h // CAST(greatest(d.n_chars, 1) AS UBIGINT), m.doc_id
LIMIT {k}
"""


def dedup_report(sf_dir: str, parts: int = 32) -> ray.data.Dataset:
    """(source, n_docs, n_removed, removed_per_million): what the
    near-dup pass would delete from each source — the dedup-impact
    telemetry a curation run reports before anyone commits to the
    pruned corpus.

    Composition: the persisted :func:`dedup_labels` artifact labels
    every document (one scan, no chain recompute); a doc is REMOVED
    iff it is not its own cluster representative (cluster_id !=
    doc_id).  Labels co-partition-join back onto the (doc_id, source)
    projection — doc→source is corpus-sized, so this is never a
    broadcast — and per-source counts ride the two-phase combiner.
    """
    from .common import copartition_join, read, two_phase_agg

    labels = dedup_labels(sf_dir)
    docs = read(sf_dir, "documents", columns=["doc_id", "source"])
    joined = copartition_join(
        labels, docs, on="doc_id", parts=parts,
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("cluster_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("source", pa.string())]),
    )

    def flag(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        c = b["cluster_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "one": pa.array(np.ones(d.size, np.int64), pa.int64()),
            "rem": pa.array((d != c).astype(np.int64), pa.int64()),
        })

    agg = two_phase_agg(
        joined.map_batches(flag, batch_format="pyarrow"),
        ["source"], sums={"one": "n_docs", "rem": "n_removed"},
    )

    def finish(b: pa.Table) -> pa.Table:
        nd = b["n_docs"].to_numpy(zero_copy_only=False)
        nr = b["n_removed"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "n_docs": b["n_docs"],
            "n_removed": b["n_removed"],
            "removed_per_million": pa.array(
                nr * 1_000_000 // nd, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_DEDUP_REPORT = f"""
WITH RECURSIVE {JACCARD_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs WHERE j >= 0.8
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jpairs WHERE j >= 0.8
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc_id, e.v FROM reach JOIN edges e ON e.u = reach.r
),
labels AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN l.cluster_id <> l.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN l.cluster_id <> l.doc_id THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS removed_per_million
FROM labels l JOIN documents d USING (doc_id)
GROUP BY d.source
"""


# ------------------------------------------- representative selection
def cluster_best_doc(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(cluster_id, best_doc_id, best_n_tokens, n_members): quality-
    aware canonical selection — for every near-dup cluster keep the
    LONGEST member (token count, ties to the smallest doc_id), the
    curation policy that prefers the most complete copy of duplicated
    content over the arbitrary min-id representative corpus_dedup
    keeps.

    Scale shape: cluster labels come from the persisted
    :func:`dedup_labels` artifact (one scan), token counts from a
    single-pass map over documents; the two meet in the engine's
    ONE-exchange copartition_join on doc_id, and the per-cluster
    argmax is one lexsort per hash partition keyed by cluster — never
    a driver-side collection, never a broadcast of the label table
    (at 100 TB a third of the corpus can be cluster members).
    """
    from .text import mix64

    labels = dedup_labels(sf_dir)

    def tok_count(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "n_tokens": pc.cast(pc.list_value_length(words), pa.int64()),
        })

    toks = read(sf_dir, "documents",
                columns=["doc_id", "text"]).map_batches(
        tok_count, batch_format="pyarrow")

    from .common import copartition_join

    joined = copartition_join(
        labels, toks, on="doc_id",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("cluster_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_tokens", pa.int64())]),
    )

    def keyed(b: pa.Table) -> pa.Table:
        c = b["cluster_id"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (mix64(c.view(np.uint64)) % np.uint64(parts)).astype(
                np.int64)))

    out_schema = pa.schema([
        ("cluster_id", pa.int64()), ("best_doc_id", pa.int64()),
        ("best_n_tokens", pa.int64()), ("n_members", pa.int64()),
    ])

    def best(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        c = g["cluster_id"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        t = g["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -t, c))
        c, d, t = c[order], d[order], t[order]
        first = np.ones(c.size, dtype=bool)
        first[1:] = c[1:] != c[:-1]
        n = np.zeros(int(first.sum()), dtype=np.int64)
        np.add.at(n, np.cumsum(first) - 1, 1)
        return pa.table({
            "cluster_id": pa.array(c[first], pa.int64()),
            "best_doc_id": pa.array(d[first], pa.int64()),
            "best_n_tokens": pa.array(t[first], pa.int64()),
            "n_members": pa.array(n, pa.int64()),
        })

    return (
        joined.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(best, batch_format="pyarrow")
    )


ORACLE_CLUSTER_BEST_DOC = f"""
WITH RECURSIVE {JACCARD_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs WHERE j >= 0.8
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jpairs WHERE j >= 0.8
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.doc_id, e.v FROM reach JOIN edges e ON e.u = reach.r
),
labels AS (
  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
),
tok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
         AS n_tokens
  FROM documents
),
ranked AS (
  SELECT l.cluster_id, l.doc_id, t.n_tokens,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY t.n_tokens DESC, l.doc_id)
           AS rn,
         count(*) OVER (PARTITION BY l.cluster_id) AS n_members
  FROM labels l JOIN tok t USING (doc_id)
)
SELECT cluster_id, doc_id AS best_doc_id,
       n_tokens AS best_n_tokens, n_members
FROM ranked WHERE rn = 1
"""


# ------------------------------ embedding-space decontamination
_EMB_EVAL_MOD = 19  # deterministic eval split: vec_id % 19 == 0


# per-worker SINGLE-SLOT cache of the current chunk's normalized-
# transposed eval matrix for the above-budget decontaminate_embedding
# path.  One slot, not a dict that grows: each chained flag stage
# touches exactly one chunk, and an unbounded memo would accumulate
# every chunk until the worker held the ENTIRE eval matrix — the
# memory the eval_broadcast_budget gate exists to bound.
_EVT_MEMO: dict = {}
_EVT_MEMO_CAP = 1


@ray.remote(num_cpus=0)
def _nrows_task(t: pa.Table) -> int:
    return t.num_rows


def decontaminate_embedding(sf_dir: str, threshold: float = 0.45,
                            eval_broadcast_budget: int = 1_000_000
                            ) -> ray.data.Dataset:
    """(vec_id, contaminated) over CORPUS vectors (vec_id % 19 != 0):
    contaminated = cosine similarity >= ``threshold`` against ANY
    vector of the held-out eval split (vec_id % 19 == 0) — the
    embedding-space analog of ``decontaminate``, catching paraphrased
    benchmark leakage that shares no exact n-gram.

    The eval matrix is the small side (a benchmark suite is thousands
    of items, the corpus is billions): gathered distributed, unit-
    normalized once, broadcast ONCE via ray.put; corpus batches stream
    through one sgemm + rowwise max — no shuffle at all.  Same cosine
    kernel and float32 contract as embedding_dup_pairs
    (dedup.py _pairs_between; margin analysis at ann.emb_matrix).

    Budget gate (the minhash ``ids_broadcast_budget`` discipline): the
    driver-side gather only happens while the eval split is under
    ``eval_broadcast_budget`` rows.  Past it, the eval blocks STAY in
    the object store; block refs are greedy-packed into chunks under
    the budget and the corpus streams through one flag stage per chunk
    (per-chunk comparisons are independent, so the OR-fold is exactly
    the single-matrix result — pytest-pinned at a forced budget).
    """
    from .ann import emb_matrix

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def eval_side(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % _EMB_EVAL_MOD == 0))

    ev_ds = emb.map_batches(
        eval_side, batch_format="pyarrow"
    ).materialize()  # eval rows only — tiny relative to the corpus

    def keep_training(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % _EMB_EVAL_MOD != 0))

    empty_out = pa.table({"vec_id": pa.array([], pa.int64()),
                          "contaminated": pa.array([], pa.bool_())})

    if ev_ds.count() <= eval_broadcast_budget:
        ev = collect_small(
            ev_ds,
            pa.schema([("vec_id", pa.int64()),
                       ("embedding", pa.list_(pa.float32()))]),
        )
        me = emb_matrix(ev["embedding"])
        me = me / np.linalg.norm(me, axis=1, keepdims=True)
        ev_ref = ray.put(np.ascontiguousarray(me.T))

        def flag(b: pa.Table, evt=None) -> pa.Table:
            b = keep_training(b)
            if b.num_rows == 0:
                return empty_out
            m = emb_matrix(b["embedding"])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ deref(evt)
            return pa.table({
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "contaminated": pa.array(
                    (sims >= threshold).any(axis=1), pa.bool_()),
            })

        return emb.map_batches(flag, fn_kwargs={"evt": ev_ref},
                               batch_format="pyarrow")

    # ---- above budget: chunked object-store probe, no driver gather
    import ray as _ray

    refs = list(ev_ds.to_arrow_refs())
    # row counts per block via tiny metadata tasks (blocks stay put)
    counts = _ray.get([_nrows_task.remote(r) for r in refs])
    chunks: list[list] = []
    cur, cur_rows = [], 0
    for r, n in zip(refs, counts):
        if n == 0:
            continue
        if cur and cur_rows + n > max(eval_broadcast_budget, 1):
            chunks.append(cur)
            cur, cur_rows = [], 0
        cur.append(r)
        cur_rows += n
    if cur:
        chunks.append(cur)

    empty_mid = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("contaminated", pa.bool_()),
    ]).empty_table()

    def flag_chunk(b: pa.Table, chunk=None, first=False) -> pa.Table:
        if first:
            b = keep_training(b)
        if b.num_rows == 0:
            return empty_mid  # keep the mid-chain schema stable
        key = ("evt", tuple(r.hex() for r in chunk))
        evt = _EVT_MEMO.get(key)
        if evt is None:
            parts = [t for t in _ray.get(list(chunk)) if t.num_rows]
            me = emb_matrix(pa.concat_tables(parts)["embedding"])
            me = me / np.linalg.norm(me, axis=1, keepdims=True)
            evt = np.ascontiguousarray(me.T)
            while len(_EVT_MEMO) >= _EVT_MEMO_CAP:  # evict old chunks
                _EVT_MEMO.pop(next(iter(_EVT_MEMO)))
            _EVT_MEMO[key] = evt
        m = emb_matrix(b["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        hit = (m @ evt >= threshold).any(axis=1)
        if first:
            prev = np.zeros(b.num_rows, dtype=bool)
            base = b
        else:
            prev = b["contaminated"].to_numpy(zero_copy_only=False)
            base = b
        return pa.table({
            "vec_id": pc.cast(base["vec_id"], pa.int64()),
            "embedding": base["embedding"],
            "contaminated": pa.array(prev | hit, pa.bool_()),
        })

    def strip(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_out
        return b.select(["vec_id", "contaminated"])

    if not chunks:  # no eval vectors at all — nothing can contaminate
        def none_flag(b: pa.Table) -> pa.Table:
            b = keep_training(b)
            if b.num_rows == 0:
                return empty_out
            return pa.table({
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "contaminated": pa.array(
                    np.zeros(b.num_rows, dtype=bool), pa.bool_()),
            })

        return emb.map_batches(none_flag, batch_format="pyarrow")

    ds = emb
    for i, ch in enumerate(chunks):
        ds = ds.map_batches(
            flag_chunk, fn_kwargs={"chunk": ch, "first": i == 0},
            batch_format="pyarrow",
        )
    return ds.map_batches(strip, batch_format="pyarrow")


ORACLE_DECONTAMINATE_EMBEDDING = f"""
WITH ev AS (
  SELECT embedding FROM embeddings WHERE vec_id % {_EMB_EVAL_MOD} = 0
),
hits AS (
  SELECT DISTINCT a.vec_id
  FROM embeddings a JOIN ev e
    ON list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                              CAST(e.embedding AS DOUBLE[])) >= 0.45
  WHERE a.vec_id % {_EMB_EVAL_MOD} <> 0
)
SELECT a.vec_id, (h.vec_id IS NOT NULL) AS contaminated
FROM embeddings a LEFT JOIN hits h USING (vec_id)
WHERE a.vec_id % {_EMB_EVAL_MOD} <> 0
"""
