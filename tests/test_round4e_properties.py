"""Randomized conformance for the round-4e operators: arbitrary tiny
inputs, Ray == DuckDB on the exact oracle SQL the driver runs (the
comparison harness is test_new_ops_edge_cases._compare — the
production one).  Example counts are small because every example runs
a full Ray pipeline; the deterministic edge-case suite carries the
known-hostile layouts, these sweep the space between them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_new_ops_edge_cases import _compare, _write_sf

_SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(st.lists(
    st.tuples(st.integers(1, 4),                 # user_id
              st.sampled_from(["a", "b", "c"]),  # event_type
              st.integers(0, 50)),               # ts seconds (collides)
    min_size=1, max_size=40,
))
def test_event_transitions_random_streams(ray_session,
                                          tmp_path_factory, rows):
    """Random multi-user streams with heavy ts collisions: the
    partitioned adjacent-pair count equals the lag-window oracle,
    including the event_id tie-break and the floor normalization."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_EVENT_TRANSITIONS, event_transitions)

    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array(
            [np.datetime64(r[2] * 1_000_000, "us") for r in rows],
            pa.timestamp("us")),
    })
    sf = _write_sf(tmp_path_factory.mktemp("et"), events=events)
    _compare(sf, event_transitions(sf, parts=3),
             ORACLE_EVENT_TRANSITIONS)


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 15), min_size=1, max_size=25),
       st.lists(st.integers(0, 15), min_size=1, max_size=25),
       st.integers(1, 5))
def test_user_set_ops_random_key_sets(ray_session, tmp_path_factory,
                                      okeys, ekeys, parts):
    """Arbitrary overlapping multisets on both sides under arbitrary
    partition counts: the Venn counts equal the FULL OUTER JOIN
    oracle (duplicates collapse, empty segments absent)."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_USER_SET_OPS, user_set_ops)

    orders = pa.table({
        "o_custkey": pa.array(okeys, pa.int64()),
        "o_orderkey": pa.array(range(len(okeys)), pa.int64()),
    })
    events = pa.table({
        "event_id": pa.array(range(len(ekeys)), pa.int64()),
        "user_id": pa.array(ekeys, pa.int64()),
    })
    sf = _write_sf(tmp_path_factory.mktemp("us"), orders=orders,
                   events=events)
    _compare(sf, user_set_ops(sf, parts=parts), ORACLE_USER_SET_OPS)


@settings(**_SETTINGS)
@given(st.lists(
    st.tuples(st.sampled_from(["A", "N"]),       # returnflag
              st.sampled_from(["F", "O"]),       # linestatus
              st.integers(1, 50),                # quantity
              st.floats(0.01, 99999.99,          # price (2dp-ish)
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=40,
))
def test_qty_price_moments_random_groups(ray_session,
                                         tmp_path_factory, rows):
    """Random groups and float prices: every sum and the covariance
    numerator match the HUGEINT oracle exactly through the floor-cents
    contract."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_QTY_PRICE_MOMENTS, qty_price_moments)

    lineitem = pa.table({
        "l_returnflag": pa.array([r[0] for r in rows]),
        "l_linestatus": pa.array([r[1] for r in rows]),
        "l_quantity": pa.array([float(r[2]) for r in rows]),
        "l_extendedprice": pa.array([r[3] for r in rows]),
    })
    sf = _write_sf(tmp_path_factory.mktemp("qp"), lineitem=lineitem)
    _compare(sf, qty_price_moments(sf), ORACLE_QTY_PRICE_MOMENTS)


@settings(**_SETTINGS)
@given(st.lists(
    st.tuples(st.sampled_from(["h1", "h2", "h3"]),   # shared prefix id
              st.integers(0, 3),                     # tail variant
              st.sampled_from(["s1", "s2", "s3", "s4"])),
    min_size=1, max_size=30,
))
def test_source_dup_matrix_random_overlap(ray_session,
                                          tmp_path_factory, rows):
    """Random (prefix, tail, source) layouts: pair counts equal the
    distinct-digest self-join oracle for every source-overlap shape,
    including digests present in 3+ sources and intra-source-only
    duplication."""
    from whakoom_webscrapper_ray.pipelines.dedup import (
        ORACLE_SOURCE_DUP_MATRIX, source_dup_matrix)

    texts = [p * 60 + f"tail{t}" for p, t, _ in rows]  # 120-char prefix
    docs = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array([r[2] for r in rows]),
    })
    sf = _write_sf(tmp_path_factory.mktemp("sd"), documents=docs)
    _compare(sf, source_dup_matrix(sf, parts=3),
             ORACLE_SOURCE_DUP_MATRIX)


@settings(**_SETTINGS)
@given(st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "rare"]),
             min_size=1, max_size=8),
    min_size=1, max_size=10,
), st.integers(1, 4), st.integers(1, 6))
def test_vocab_encode_random_docs(ray_session, tmp_path_factory,
                                  docs, vocab_top, max_tokens):
    """Random tiny corpora under random vocab/window sizes: the
    encoded id strings equal the ordered string_agg oracle, including
    rank ties (count DESC, term ASC), OOV zeros and truncation."""
    from whakoom_webscrapper_ray.pipelines.text import (
        vocab_encode, vocab_encode_oracle_sql)

    table = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs]),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
    })
    sf = _write_sf(tmp_path_factory.mktemp("ve"), documents=table)
    _compare(sf, vocab_encode(sf, vocab_top=vocab_top,
                              max_tokens=max_tokens),
             vocab_encode_oracle_sql(vocab_top=vocab_top,
                                     max_tokens=max_tokens))


@settings(**_SETTINGS)
@given(st.dictionaries(st.sampled_from([f"u/{i}" for i in range(8)]),
                       st.integers(0, 3), min_size=0, max_size=8),
       st.dictionaries(st.sampled_from([f"u/{i}" for i in range(8)]),
                       st.integers(0, 3), min_size=0, max_size=8),
       st.integers(1, 5))
def test_docs_diff_random_generations(ray_session, tmp_path_factory,
                                      old_docs, new_docs, parts):
    """Random old/new generations (ids with versioned bodies): the
    distributed delta equals the dict reference for every overlap
    shape, at any partition count."""
    import os

    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.pipelines.dedup import docs_diff
    from whakoom_webscrapper_ray.schemas import PAGES_SCHEMA

    def tbl(d):
        return pa.table({
            "doc_id": pa.array(list(d)),
            "spans": pa.array(
                [[{"kind": "text", "text": f"body v{v}",
                   "media_ref": "", "offset": 0}] for v in d.values()],
                PAGES_SCHEMA.field("spans").type),
        }).cast(PAGES_SCHEMA)

    base = tmp_path_factory.mktemp("dd")
    d0, d1 = str(base / "o"), str(base / "n")
    os.makedirs(d0); os.makedirs(d1)
    pq.write_table(tbl(old_docs), f"{d0}/p.parquet")
    pq.write_table(tbl(new_docs), f"{d1}/p.parquet")

    want = {}
    for k in set(old_docs) | set(new_docs):
        if k not in old_docs:
            want[k] = "added"
        elif k not in new_docs:
            want[k] = "removed"
        elif old_docs[k] != new_docs[k]:
            want[k] = "changed"
    res = docs_diff(d0, d1, parts=parts).to_pandas()
    if len(res) == 0:
        # a fully-empty Ray Dataset carries no blocks (hence no
        # schema); both sides agree the delta is empty
        assert want == {}
        return
    assert dict(zip(res.doc_id, res.status)) == want


@settings(**_SETTINGS)
@given(st.lists(
    st.tuples(st.integers(1, 6),          # custkey
              st.integers(0, 90),         # order day offset
              st.floats(1.0, 999.99, allow_nan=False,
                        allow_infinity=False)),
    min_size=1, max_size=30,
))
def test_customer_rfm_random_orders(ray_session, tmp_path_factory,
                                    rows):
    """Random order histories: metrics and all three quintile scores
    equal the percentile_disc oracle, including heavy customer-count
    mass points (few distinct customers -> coinciding cuts)."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_CUSTOMER_RFM, customer_rfm)

    orders = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_totalprice": pa.array([r[2] for r in rows]),
        "o_orderdate": pa.array(
            [np.datetime64(r[1] * 86_400_000_000 + 3_600_000_000,
                           "us") for r in rows],
            pa.timestamp("us")),
    })
    sf = _write_sf(tmp_path_factory.mktemp("rfm"), orders=orders)
    _compare(sf, customer_rfm(sf, parts=3), ORACLE_CUSTOMER_RFM)
