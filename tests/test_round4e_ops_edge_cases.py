"""Edge-case conformance for event_transitions, user_set_ops,
qty_price_moments and source_dup_matrix.

Same harness as test_new_ops_edge_cases.py: adversarial tiny tables,
Ray == DuckDB on the exact oracle SQL the driver runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tests.test_new_ops_edge_cases import _compare, _write_sf


def _us(*stamps: str) -> pa.Array:
    return pa.array([np.datetime64(s, "us") for s in stamps],
                    pa.timestamp("us"))


def test_event_transitions_ties_boundaries_and_floor(
        ray_session, tmp_path):
    """Equal timestamps order by event_id; the first event of each user
    emits NO transition (no cross-user bleed); pct_bp is FLOOR basis
    points (1/3 -> 3333); a single-event user contributes nothing."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_EVENT_TRANSITIONS, event_transitions)

    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        # user 1: a -> b -> c -> a with a TIE between b and c resolved
        # by event_id; user 2: a -> b; user 3: singleton.
        "event_type": pa.array(["a", "b", "c", "a", "a", "b", "z"]),
        "ts": _us("2024-01-01T00:00:00", "2024-01-01T00:01:00",
                  "2024-01-01T00:01:00", "2024-01-01T00:02:00",
                  "2024-01-01T00:00:00", "2024-01-01T00:00:01",
                  "2024-01-01T00:00:00"),
    })
    sf = _write_sf(tmp_path, events=events)
    _compare(sf, event_transitions(sf, parts=4),
             ORACLE_EVENT_TRANSITIONS)


def test_event_transitions_floor_division(ray_session, tmp_path):
    """3 outgoing transitions from 'a' split 2/1: pct_bp must be the
    floored 6666/3333, never a rounded 6667."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_EVENT_TRANSITIONS, event_transitions)

    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "a", "c"]),
        "ts": _us(*["2024-01-01T00:00:00", "2024-01-01T00:00:01"] * 3),
    })
    sf = _write_sf(tmp_path, events=events)
    _compare(sf, event_transitions(sf, parts=2),
             ORACLE_EVENT_TRANSITIONS)


def test_user_set_ops_venn_and_duplicates(ray_session, tmp_path):
    """Duplicated keys on either side count ONCE; a key in both tables
    lands in 'both' only; empty segments are absent, not zero rows."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_USER_SET_OPS, user_set_ops)

    orders = pa.table({
        "o_custkey": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
    })
    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([3, 3, 4, 5], pa.int64()),
    })
    sf = _write_sf(tmp_path, orders=orders, events=events)
    _compare(sf, user_set_ops(sf, parts=4), ORACLE_USER_SET_OPS)


def test_user_set_ops_one_side_only(ray_session, tmp_path):
    """With disjoint key sets the 'both' segment must not appear."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_USER_SET_OPS, user_set_ops)

    orders = pa.table({
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderkey": pa.array([10, 11], pa.int64()),
    })
    events = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([9], pa.int64()),
    })
    sf = _write_sf(tmp_path, orders=orders, events=events)
    _compare(sf, user_set_ops(sf, parts=2), ORACLE_USER_SET_OPS)


def test_qty_price_moments_exact_cents_and_cov_sign(
        ray_session, tmp_path):
    """Prices go through the floor-cents contract (10.009 -> 1000);
    the covariance numerator must come out negative for an
    anti-correlated group and zero for a constant-quantity group."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_QTY_PRICE_MOMENTS, qty_price_moments)

    lineitem = pa.table({
        "l_returnflag": pa.array(["A", "A", "A", "B", "B"]),
        "l_linestatus": pa.array(["F", "F", "F", "O", "O"]),
        # group A/F: qty up, price down -> cov_num < 0
        "l_quantity": pa.array([1.0, 2.0, 3.0, 5.0, 5.0]),
        "l_extendedprice": pa.array(
            [30.009, 20.004, 10.001, 7.77, 9.99]),
    })
    sf = _write_sf(tmp_path, lineitem=lineitem)
    res = qty_price_moments(sf).to_pandas()
    a = res[(res.l_returnflag == "A")].iloc[0]
    assert a.cov_num_cents < 0
    b = res[(res.l_returnflag == "B")].iloc[0]
    assert b.cov_num_cents == 0  # constant quantity -> zero covariance
    _compare(sf, qty_price_moments(sf), ORACLE_QTY_PRICE_MOMENTS)


def test_source_dup_matrix_pairs_and_prefix(ray_session, tmp_path):
    """A prefix shared by three sources yields all three unordered
    pairs; duplication WITHIN one source yields no pair; texts that
    diverge only after the 120-char prefix still collide; multi-byte
    characters slice by CHARACTER on both sides."""
    from whakoom_webscrapper_ray.pipelines.dedup import (
        ORACLE_SOURCE_DUP_MATRIX, source_dup_matrix)

    head = "ñ" * 120  # multi-byte prefix, same first 120 chars
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "text": pa.array([
            head + "tail-one", head + "tail-two", head + "tail-three",
            "unique to s1", "unique to s1",  # intra-source dup: no pair
            "short", "short",                # cross-source short text
        ]),
        "source": pa.array(
            ["s1", "s2", "s3", "s1", "s1", "s2", "s3"]),
    })
    sf = _write_sf(tmp_path, documents=docs)
    res = source_dup_matrix(sf, parts=4).to_pandas()
    pairs = set(zip(res.source_a, res.source_b))
    assert ("s1", "s2") in pairs and ("s1", "s3") in pairs \
        and ("s2", "s3") in pairs
    _compare(sf, source_dup_matrix(sf, parts=4),
             ORACLE_SOURCE_DUP_MATRIX)


def test_snapshot_diff_statuses(ray_session, tmp_path):
    """All four fates in one table: doc 17 removed (only in old),
    doc 11 added (only in new), doc 13 changed (stale old body),
    doc 1 unchanged (absent from the delta); ids divisible by both
    11 and 17 appear in NEITHER snapshot and must not surface."""
    from whakoom_webscrapper_ray.pipelines.dedup import (
        ORACLE_SNAPSHOT_DIFF, snapshot_diff)

    ids = [1, 11, 13, 17, 11 * 17, 26]
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"body of {i}" for i in ids]),
        "source": pa.array(["s"] * len(ids)),
    })
    sf = _write_sf(tmp_path, documents=docs)
    res = snapshot_diff(sf, parts=4).to_pandas()
    by = dict(zip(res.doc_id, res.status))
    assert by[11] == "added" and by[17] == "removed"
    assert by[13] == "changed" and by[26] == "changed"
    assert 1 not in by and 11 * 17 not in by
    _compare(sf, snapshot_diff(sf, parts=4), ORACLE_SNAPSHOT_DIFF)


def test_embedding_pca_parity_and_determinism(ray_session):
    """Distributed covariance PCA: (a) same block layout -> bit-equal
    reruns (content-sorted fold); (b) different block layouts agree
    within one quantum per loading (float fold non-associativity is
    the only slack); (c) loadings match a direct numpy
    eigendecomposition of the same float32-loaded corpus."""
    import numpy as np
    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.pipelines.ann import embedding_pca

    sf = "/root/testdata/sf0.001"
    a = embedding_pca(sf, parts=7).to_pandas().sort_values(
        ["component", "dim_idx"]).reset_index(drop=True)
    b = embedding_pca(sf, parts=7).to_pandas().sort_values(
        ["component", "dim_idx"]).reset_index(drop=True)
    assert a.equals(b), "same layout must be bit-deterministic"
    c = embedding_pca(sf, parts=1).to_pandas().sort_values(
        ["component", "dim_idx"]).reset_index(drop=True)
    assert (a.loading_q - c.loading_q).abs().max() <= 1

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    X = np.array(t["embedding"].to_pylist(),
                 dtype=np.float32).astype(np.float64)
    C = X.T @ X / len(X) - np.outer(X.mean(0), X.mean(0))
    w, v = np.linalg.eigh(C)
    for comp in (0, 1):
        vec = v[:, -1 - comp]
        if vec[int(np.argmax(np.abs(vec)))] < 0:
            vec = -vec
        ref = np.floor(vec * 1_000_000).astype(np.int64)
        mine = a[a.component == comp].loading_q.to_numpy()
        assert np.abs(mine - ref).max() <= 1
        ev = a[a.component == comp].eigenvalue_q.iloc[0] / 1e6
        assert abs(ev - w[-1 - comp]) / abs(w[-1 - comp]) < 1e-3


def test_copartition_join_hot_key_skew(ray_session):
    """One key carrying 80% of both sides (the crawl's hot-host shape):
    the co-partitioned join must produce the full quadratic fanout of
    the hot key (120x80 rows) without dropping or duplicating pairs,
    with the remaining keys untouched."""
    import numpy as np
    import pandas as pd
    import ray.data

    from whakoom_webscrapper_ray.pipelines.common import copartition_join

    hot_l, hot_r = 120, 80
    left = pa.table({
        "k": pa.array(["hot"] * hot_l + ["a", "b", "c"], pa.string()),
        "lv": pa.array(np.arange(hot_l + 3), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(["hot"] * hot_r + ["b", "c", "d"], pa.string()),
        "rv": pa.array(np.arange(hot_r + 3) * 10, pa.int64()),
    })
    got = copartition_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", right_on="k", parts=8,
        left_schema=left.schema, right_schema=right.schema,
    ).to_pandas()
    want = left.to_pandas().merge(right.to_pandas(), on="k")
    assert len(got) == len(want) == hot_l * hot_r + 2
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_vocab_encode_oov_ties_and_truncation(ray_session, tmp_path):
    """Vocabulary ranked (count DESC, term ASC) with id ties broken
    lexicographically; OOV encodes as 0; docs truncate at max_tokens;
    a doc of pure OOV still emits a row."""
    from whakoom_webscrapper_ray.pipelines.text import (
        vocab_encode, vocab_encode_oracle_sql)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # counts: b=3, a=3 (tie -> a gets id 1, b id 2), c=1
        "text": pa.array([
            "a b a b",
            "b a rare1 rare2 c",
            "zz zz zz zz zz",     # pure OOV with vocab_top=3? zz×5 ranks
        ]),
        "source": pa.array(["s"] * 3),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, vocab_encode(sf, vocab_top=3, max_tokens=4),
             vocab_encode_oracle_sql(vocab_top=3, max_tokens=4))
    res = vocab_encode(sf, vocab_top=3, max_tokens=4).to_pandas()
    by = dict(zip(res.doc_id, res.ids))
    # zz (5 occurrences) takes id 1; a (3) id 2; b (3) id 3; c/rare OOV
    assert by[1] == "2 3 2 3"
    assert by[2] == "3 2 0 0"           # truncated at 4 tokens
    assert by[3] == "1 1 1 1"
    assert (res.n_tokens <= 4).all()


def test_newest_ops_empty_corpus_safe(ray_session, tmp_path):
    """Degenerate-input guard: every round-4e operator returns an
    empty result (never crashes) on a zero-row corpus — the
    embedding_pca empty-partials crash class, pinned for all of them."""
    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.pipelines import ann as an
    from whakoom_webscrapper_ray.pipelines import dedup as dd
    from whakoom_webscrapper_ray.pipelines import text as tx

    sf = str(tmp_path / "sf")
    import os
    os.makedirs(sf)
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    }), f"{sf}/documents.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32()),
    }), f"{sf}/embeddings.parquet")

    from whakoom_webscrapper_ray.pipelines import dataops as do

    pq.write_table(pa.table({
        "o_custkey": pa.array([], pa.int64()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_totalprice": pa.array([], pa.float64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
    }), f"{sf}/orders.parquet")

    import ray.data
    for fn in (tx.cms_term_counts, tx.lang_hll_vocab,
               tx.lang_kll_quantiles, tx.vocab_encode,
               dd.source_dup_matrix, dd.snapshot_diff,
               an.embedding_pca, do.customer_value_deciles,
               do.customer_rfm):
        r = fn(sf)
        n = r.count() if isinstance(r, ray.data.Dataset) else r.num_rows
        assert n == 0, fn.__name__


def test_customer_value_deciles_ties_and_mass_points(ray_session,
                                                     tmp_path):
    """A point mass (many equal totals) makes several decile cuts
    coincide — values at the mass must land in the same (skipped-
    bucket) decile in both engines; single-order customers and
    duplicate orders sum correctly."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_CUSTOMER_VALUE_DECILES, customer_value_deciles)

    cust = list(range(1, 21))
    rows, keys = [], []
    for c in cust:
        # customers 1-14 all total 10.00 (mass point); 15-20 ascend
        v = 10.0 if c <= 14 else 10.0 * (c - 13)
        rows.append(v / 2)
        rows.append(v / 2)
        keys += [c, c]
    orders = pa.table({
        "o_custkey": pa.array(keys, pa.int64()),
        "o_orderkey": pa.array(range(len(keys)), pa.int64()),
        "o_totalprice": pa.array(rows, pa.float64()),
    })
    sf = _write_sf(tmp_path, orders=orders)
    _compare(sf, customer_value_deciles(sf, parts=4),
             ORACLE_CUSTOMER_VALUE_DECILES)
    res = customer_value_deciles(sf, parts=4).to_pandas()
    mass = res[res.monetary_cents == 1000]
    assert mass.decile.nunique() == 1 and len(mass) == 14


def test_customer_rfm_recency_and_scores(ray_session, tmp_path):
    """Recency is measured against the corpus max date in whole days
    (floor); single-order customers score; all three dimensions match
    the oracle through quintile mass points."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_CUSTOMER_RFM, customer_rfm)

    orders = pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 3, 4, 5, 5], pa.int64()),
        "o_orderkey": pa.array(range(8), pa.int64()),
        "o_totalprice": pa.array(
            [10.0, 20.0, 30.0, 5.0, 500.0, 5.0, 40.0, 40.0]),
        "ts_helper": pa.array(range(8), pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64(s, "us") for s in
             ("2024-01-01T12:00:00", "2024-02-01T00:00:00",
              "2024-03-15T23:59:59", "2024-01-10T00:00:00",
              "2024-03-16T00:00:00", "2024-02-29T06:00:00",
              "2024-01-20T00:00:00", "2024-03-01T00:00:00")],
            pa.timestamp("us")),
    }).drop_columns(["ts_helper"])
    sf = _write_sf(tmp_path, orders=orders)
    _compare(sf, customer_rfm(sf, parts=4), ORACLE_CUSTOMER_RFM)
    res = customer_rfm(sf, parts=4).to_pandas().set_index("o_custkey")
    # corpus max is cust 3's 2024-03-16; cust 1's last order is
    # 2024-03-15T23:59:59 -> 0 full days elapsed (floor)
    assert res.loc[3].recency_days == 0
    assert res.loc[1].recency_days == 0
    assert res.loc[2].recency_days == 66
    assert res.loc[1].n_orders == 3 and res.loc[1].monetary_cents == 6000
