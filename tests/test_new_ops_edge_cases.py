"""Edge-case conformance for the continuation-session operators.

The sf0.001 / sf0.01 oracle suite exercises the ops on the driver
testdata; these tests feed them ADVERSARIAL tiny tables (dominance
ties, zero-length intervals, triangle-free hubs, k > n samples,
chunk-boundary lengths) and check Ray == DuckDB on the exact same
oracle SQL the driver runs — so the comparison logic itself is the
production one, only the inputs are hostile.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_sf(tmp_path, **tables: pa.Table) -> str:
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    for name, t in tables.items():
        pq.write_table(t, f"{sf}/{name}.parquet")
    return sf


def _compare(sf_dir: str, result, sql: str) -> None:
    import ray.data

    con = duckdb.connect()
    import glob
    import os

    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    if isinstance(result, ray.data.Dataset):
        mine = result.to_pandas()
    elif isinstance(result, pa.Table):
        mine = result.to_pandas()
    else:
        mine = result
    orc = con.sql(sql).df()
    con.close()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a, b = canon(mine), canon(orc)
    if len(a) == 0 and len(b) == 0 and len(a.columns) == 0:
        # a fully-empty Ray Dataset carries no blocks, hence no
        # schema — both sides agree the result is empty, which is
        # the semantic contract here
        return
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), (len(a), len(b))
    if len(a):
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_pareto_front_ties_and_duplicates(ray_session, tmp_path):
    """Duplicate front points BOTH survive; a dominated duplicate pair
    is fully removed; equal-price groups keep only the max size."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    part = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        # (price, size): (1.00,10) twice — both on the front;
        # (1.00, 5) dominated inside its price group;
        # (0.50, 10) dominates the 1.00 pair entirely? strictly
        # cheaper, equal size → yes: the pair must DROP.
        # (2.00, 11) survives (bigger size than anything cheaper).
        "p_retailprice": pa.array([1.0, 1.0, 1.0, 0.5, 2.0, 3.0]),
        "p_size": pa.array([10, 10, 5, 10, 11, 11], pa.int32()),
    })
    sf = _write_sf(tmp_path, part=part)
    _compare(sf, do.pareto_front(sf), do.ORACLE_PARETO_FRONT)
    # sanity: the dominated 1.00 duplicates are gone, 0.50 stays
    got = do.pareto_front(sf).to_pandas()
    assert set(got["p_partkey"]) == {4, 5}


def test_pareto_front_single_and_identical(ray_session, tmp_path):
    from whakoom_webscrapper_ray.pipelines import dataops as do

    part = pa.table({
        "p_partkey": pa.array([7, 8, 9], pa.int64()),
        "p_retailprice": pa.array([2.5, 2.5, 2.5]),
        "p_size": pa.array([3, 3, 3], pa.int32()),
    })
    sf = _write_sf(tmp_path, part=part)
    _compare(sf, do.pareto_front(sf), do.ORACLE_PARETO_FRONT)
    assert len(do.pareto_front(sf).to_pandas()) == 3


def test_time_weighted_avg_ties_and_singletons(ray_session, tmp_path):
    """Same-timestamp consecutive events (dt 0), single-event users
    (no interval), and a user whose ONLY intervals are zero-length
    (active_s == 0 → excluded) all match the lead() oracle."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    ts = pa.array([
        # user 1: two events 10 s apart
        1_000_000, 11_000_000,
        # user 2: three events, middle pair at the same microsecond
        5_000_000, 5_000_000, 8_500_000,
        # user 3: single event
        9_000_000,
        # user 4: two events at the same instant (active_s == 0)
        4_000_000, 4_000_000,
    ], pa.timestamp("us"))
    events = pa.table({
        "event_id": pa.array(list(range(8)), pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 2, 2, 2, 3, 4, 4], pa.int64()),
        "event_type": pa.array(["x"] * 8, pa.string()),
        "value": pa.array([1.5, 9.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]),
        "props": pa.array(["{}"] * 8, pa.string()),
    })
    sf = _write_sf(tmp_path, events=events)
    _compare(sf, do.time_weighted_avg(sf), do.ORACLE_TIME_WEIGHTED_AVG)
    got = do.time_weighted_avg(sf).to_pandas().set_index("user_id")
    assert 3 not in got.index and 4 not in got.index
    assert got.loc[1, "active_s"] == 10
    assert got.loc[1, "weighted_cents_s"] == 150 * 10


def test_triangle_topk_star_and_clique(ray_session, tmp_path):
    """A hub star (triangle-free) yields no rows; a K4 clique yields
    4 nodes × 3 triangles each; both built as co-purchase orders."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    rows = []
    oid = 0

    def add_order(parts):
        nonlocal oid
        for p in parts:
            rows.append((oid, p))
        oid += 1

    # K4 on parts 1-4: every pair needs >= 2 shared orders; two
    # orders containing all four parts give every pair count 2.
    add_order([1, 2, 3, 4])
    add_order([1, 2, 3, 4])
    # star: hub 10 with spokes 11..15, each pair twice — spokes never
    # co-occur, so no triangles from the star.
    for s in (11, 12, 13, 14, 15):
        add_order([10, s])
        add_order([10, s])
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    sf = _write_sf(tmp_path, lineitem=li)
    _compare(sf, do.triangle_topk(sf), do.ORACLE_TRIANGLE_TOPK)
    got = do.triangle_topk(sf).to_pandas()
    assert set(got["part"]) == {1, 2, 3, 4}
    assert (got["n_triangles"] == 3).all()


def test_triangle_topk_no_edges(ray_session, tmp_path):
    """Every pair below the min_orders support → empty result."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    li = pa.table({
        "l_orderkey": pa.array([0, 0, 1, 1], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
    })
    sf = _write_sf(tmp_path, lineitem=li)
    _compare(sf, do.triangle_topk(sf), do.ORACLE_TRIANGLE_TOPK)


def test_weighted_sample_k_exceeds_n(ray_session, tmp_path):
    from whakoom_webscrapper_ray.pipelines import curate as cu

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a", "bb", "ccc"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([1, 2, 3], pa.int64()),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, cu.weighted_sample(sf), cu.weighted_sample_oracle_sql())
    assert len(cu.weighted_sample(sf).to_pandas()) == 3


def test_chunk_dedup_ratio_boundary_lengths(ray_session, tmp_path):
    """Lengths exactly at the window boundary (64, 128), one char
    over, shorter than a window, and exact duplicate docs."""
    from whakoom_webscrapper_ray.pipelines import text as tx

    texts = [
        "x" * 64,          # one full chunk
        "x" * 64,          # duplicate doc -> duplicate chunk
        "y" * 65,          # two chunks, second of length 1
        "z" * 10,          # sub-window doc
        "x" * 128,         # two identical 64-char chunks
    ]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, tx.chunk_dedup_ratio(sf),
             tx.chunk_dedup_ratio_oracle_sql())
    got = tx.chunk_dedup_ratio(sf).to_pandas().set_index("source")
    # source a: chunks [x64, x64, y64, y1] -> 4 total, 3 distinct
    assert got.loc["a", "n_chunks"] == 4
    assert got.loc["a", "n_distinct"] == 3
    # source b: chunks [z10, x64, x64] -> 3 total, 2 distinct
    assert got.loc["b", "n_chunks"] == 3
    assert got.loc["b", "n_distinct"] == 2


def test_bigram_assoc_short_docs_and_repeats(ray_session, tmp_path):
    """Single-token docs contribute no bigrams but DO count as
    unigrams; a doc-spanning pair is never a bigram."""
    from whakoom_webscrapper_ray.pipelines import text as tx

    texts = [
        "alpha beta alpha beta alpha beta",
        "beta alpha beta alpha",
        "gamma",                     # no bigram
        "alpha",                     # boosts n_x only
        "delta epsilon delta epsilon delta epsilon delta epsilon",
    ]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, tx.bigram_assoc(sf), tx.bigram_assoc_oracle_sql())
    got = tx.bigram_assoc(sf).to_pandas()
    # delta/epsilon alternate exclusively -> highest association
    assert got.iloc[0]["w1"] in ("delta", "epsilon")


def test_triangle_topk_exchange_path_matches_fast_path(ray_session,
                                                       tmp_path):
    """small_graph_budget=0 forces the multi-stage exchange path; it
    must equal the single-task fast path and the oracle on the same
    clique+star graph."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    rows = []
    oid = 0
    for _ in range(2):
        for p in (1, 2, 3, 4):
            rows.append((oid, p))
        oid += 1
    for s in (11, 12, 13):
        for _ in range(2):
            rows.append((oid, 10))
            rows.append((oid, s))
            oid += 1
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    sf = _write_sf(tmp_path, lineitem=li)
    fast = do.triangle_topk(sf).to_pandas().sort_values(
        ["n_triangles", "part"], ascending=[False, True]
    ).reset_index(drop=True)
    slow = do.triangle_topk(sf, small_graph_budget=0).to_pandas(
    ).sort_values(["n_triangles", "part"],
                  ascending=[False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    _compare(sf, do.triangle_topk(sf, small_graph_budget=0),
             do.ORACLE_TRIANGLE_TOPK)


def test_bigram_assoc_join_path_matches_broadcast(ray_session,
                                                  tmp_path):
    """vocab_broadcast_budget=0 forces the co-partitioned join path."""
    from whakoom_webscrapper_ray.pipelines import text as tx

    texts = [
        "alpha beta alpha beta alpha beta",
        "beta alpha beta alpha",
        "delta epsilon delta epsilon delta epsilon delta epsilon",
    ]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, tx.bigram_assoc(sf, vocab_broadcast_budget=0),
             tx.bigram_assoc_oracle_sql())


def test_copurchase_components_exchange_path(ray_session, tmp_path):
    """small_graph_budget=0 forces the Hash-to-Min exchange engine;
    fast path, exchange path and the recursive-CTE oracle agree on a
    two-component graph (a path and a separate clique)."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    rows = []
    oid = 0

    def add_order(parts):
        nonlocal oid
        for p in parts:
            rows.append((oid, p))
        oid += 1

    # path 1-2-3 (each adjacent pair twice), clique 7-8-9
    for pair in ((1, 2), (2, 3)):
        add_order(pair)
        add_order(pair)
    add_order([7, 8, 9])
    add_order([7, 8, 9])
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    sf = _write_sf(tmp_path, lineitem=li)
    fast = do.copurchase_components(sf).to_pandas().sort_values(
        "part").reset_index(drop=True)
    slow = do.copurchase_components(sf, small_graph_budget=0
                                    ).to_pandas().sort_values(
        "part").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    _compare(sf, do.copurchase_components(sf),
             do.ORACLE_COPURCHASE_COMPONENTS)
    got = fast.set_index("part")["component_id"]
    assert (got.loc[[1, 2, 3]] == 1).all()
    assert (got.loc[[7, 8, 9]] == 7).all()


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_copartition_join_matches_pandas_merge(ray_session, seed):
    """copartition_join == pandas inner merge on randomized inputs:
    int and string keys, duplicate keys on both sides (fanout),
    keys present on only one side, and empty partitions (parts >>
    distinct keys — the exact pathology Ray's built-in join dies on)."""
    import numpy as np
    import ray.data

    from whakoom_webscrapper_ray.pipelines.common import (
        copartition_join,
    )

    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(0, 40)), int(rng.integers(0, 40))
    keyspace = [f"k{i}" for i in range(int(rng.integers(1, 12)))]
    lk = rng.choice(keyspace, size=nl).tolist() if nl else []
    rk = rng.choice(keyspace, size=nr).tolist() if nr else []
    left = pa.table({
        "kl": pa.array(lk, pa.string()),
        "lv": pa.array(rng.integers(0, 100, nl), pa.int64()),
    })
    right = pa.table({
        "kr": pa.array(rk, pa.string()),
        "rv": pa.array(rng.integers(0, 100, nr), pa.int64()),
    })
    got = copartition_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="kl", right_on="kr", parts=16,
        left_schema=left.schema, right_schema=right.schema,
    ).to_pandas()
    want = left.to_pandas().merge(
        right.to_pandas(), left_on="kl", right_on="kr", how="inner"
    )[["kl", "lv", "rv"]]
    if len(want) == 0:
        assert len(got) == 0
        return
    key = ["kl", "lv", "rv"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_labels_exchange_path_matches_fast_path(ray_session, seed):
    """The Hash-to-Min exchange engine (small_graph_budget=0) and the
    single-task kernel agree on random graphs with chains, cliques and
    singleton-free edge sets."""
    import numpy as np
    import ray.data

    from whakoom_webscrapper_ray.pipelines.curate import _cc_labels

    rng = np.random.default_rng(seed)
    n_edges = int(rng.integers(1, 60))
    a = rng.integers(0, 30, n_edges).astype("int64")
    b = rng.integers(0, 30, n_edges).astype("int64")
    keep = a != b
    a, b = a[keep], b[keep]
    if a.size == 0:
        a = np.array([1], dtype="int64")
        b = np.array([2], dtype="int64")
    pairs = pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})
    fast = _cc_labels(ray.data.from_arrow(pairs)).to_pandas(
    ).sort_values("node").reset_index(drop=True)
    slow = _cc_labels(ray.data.from_arrow(pairs), small_graph_budget=0
                      ).to_pandas().sort_values("node").reset_index(
        drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_label_join_broadcast_matches_hash_join(ray_session):
    """_label_join's broadcast fast path == the hash-join path on ids
    around 2**53 (the float-corruption regime the string encoding
    protects) and unlabeled rows."""
    import numpy as np
    import ray.data

    from whakoom_webscrapper_ray.pipelines.curate import _label_join

    big = 2**53
    base = pa.table({"doc_id": pa.array(
        [1, 2, 3, big + 1, big + 3], pa.int64())})
    labels = pa.table({
        "doc_id": pa.array([2, big + 3], pa.int64()),
        "cluster_id": pa.array([1, big + 1], pa.int64()),
    })
    fast = _label_join(ray.data.from_arrow(base),
                       ray.data.from_arrow(labels), "doc_id", 2
                       ).to_pandas().sort_values("doc_id"
                                                 ).reset_index(drop=True)
    slow = _label_join(ray.data.from_arrow(base),
                       ray.data.from_arrow(labels), "doc_id", 2,
                       broadcast_budget=0
                       ).to_pandas().sort_values("doc_id"
                                                 ).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    got = fast.set_index("doc_id")["cluster_id"]
    assert got.loc[2] == 1 and got.loc[big + 3] == big + 1
    assert got.loc[1] == 1 and got.loc[3] == 3
    assert got.loc[big + 1] == big + 1


def test_graph_bfs_hops_exchange_path(ray_session, tmp_path):
    """budget=0 forces the per-round frontier-join + visited anti-join
    engine; both paths and the recursive oracle agree on a path graph
    with an unreachable clique."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    rows, oid = [], 0
    for pair in ((1, 2), (2, 3), (3, 4)):   # path 1-2-3-4
        for _ in range(2):
            rows.append((oid, pair[0]))
            rows.append((oid, pair[1]))
            oid += 1
    for _ in range(2):                        # unreachable clique 8-9
        rows.append((oid, 8))
        rows.append((oid, 9))
        oid += 1
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    sf = _write_sf(tmp_path, lineitem=li)
    fast = do.graph_bfs_hops(sf).to_pandas().sort_values(
        "part").reset_index(drop=True)
    slow = do.graph_bfs_hops(sf, small_graph_budget=0
                             ).to_pandas().sort_values(
        "part").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    _compare(sf, do.graph_bfs_hops(sf), do.ORACLE_GRAPH_BFS_HOPS)
    got = fast.set_index("part")["hops"]
    assert got.to_dict() == {1: 0, 2: 1, 3: 2, 4: 3}


def test_weighted_sample_zero_length_doc(ray_session, tmp_path):
    """A zero-length doc must not divide by zero on either engine."""
    from whakoom_webscrapper_ray.pipelines import curate as cu

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "bb", "ccc"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([0, 2, 3], pa.int64()),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, cu.weighted_sample(sf), cu.weighted_sample_oracle_sql())


def test_time_weighted_avg_negative_values(ray_session, tmp_path):
    """Negative values (refunds): the trunc-division ratio must match
    DuckDB's signed // semantics."""
    from whakoom_webscrapper_ray.pipelines import dataops as do

    events = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([1_000_000, 4_000_000, 11_000_000],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["x"] * 3, pa.string()),
        "value": pa.array([-3.33, 1.0, 2.0]),
        "props": pa.array(["{}"] * 3, pa.string()),
    })
    sf = _write_sf(tmp_path, events=events)
    _compare(sf, do.time_weighted_avg(sf), do.ORACLE_TIME_WEIGHTED_AVG)


@pytest.mark.parametrize("dist", ["uniform", "zipf", "normal"])
def test_kll_sketch_rank_error_bound(dist):
    """Distributed KLL-style sketch: merged block sketches answer
    quantiles within 5% rank error at capacity 192 (measured ~2%
    worst-case on these distributions)."""
    import numpy as np

    from whakoom_webscrapper_ray.pipelines.text import (_kll_build,
                                                        _kll_merge,
                                                        _kll_quantile)

    rng = np.random.default_rng(7)
    if dist == "uniform":
        data = rng.integers(0, 10_000, 100_000)
    elif dist == "zipf":
        data = rng.zipf(1.5, 100_000).astype("int64")
    else:
        data = np.abs(rng.normal(500, 100, 100_000)).astype("int64")
    sk = None
    for chunk in np.array_split(data, 16):
        s = _kll_build(chunk.astype("int64"))
        sk = s if sk is None else _kll_merge(sk, s)
    srt = np.sort(data)
    n = data.size
    for pct in (50, 90, 99):
        est = _kll_quantile(sk, pct)
        true_rank = np.searchsorted(srt, est, side="right")
        target = -(-pct * n // 100)
        assert abs(true_rank - target) / n <= 0.05


def test_kll_matches_exact_on_fixture(ray_session):
    """On the sf0.001 fixture the sketch's percentiles land within the
    exact companion's neighborhood (domain is small ints, so they are
    typically equal)."""
    from whakoom_webscrapper_ray.pipelines.text import (
        kll_token_quantiles,
        token_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    exact = token_quantiles(sf).to_pandas().set_index("pct")["value"]
    est = kll_token_quantiles(sf).to_pandas().set_index("pct")["value"]
    for pct in exact.index:
        assert abs(int(est.loc[pct]) - int(exact.loc[pct])) <= max(
            2, int(0.1 * exact.loc[pct]))
