"""Randomized conformance for the round-4d operators: arbitrary tiny
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
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(st.lists(
    st.tuples(st.integers(1, 3),               # user_id
              st.sampled_from(["a", "b"]),     # event_type
              st.integers(0, 200)),            # ts seconds
    min_size=1, max_size=40,
))
def test_burst_events_random_streams(ray_session, tmp_path_factory, rows):
    """Random (user, type, ts) streams with heavy ts collisions: the
    segmented burst count equals the lag-window oracle, including the
    event_id tie-break on equal timestamps."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_BURST_EVENTS, burst_events)

    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array(
            [np.datetime64(r[2] * 1_000_000, "us") for r in rows],
            pa.timestamp("us")),
    })
    sf = _write_sf(tmp_path_factory.mktemp("be"), events=events)
    _compare(sf, burst_events(sf, parts=4), ORACLE_BURST_EVENTS)


@settings(**_SETTINGS)
@given(st.sets(st.integers(0, 120), min_size=1, max_size=40),
       st.integers(1, 6))
def test_id_gaps_random_sparse_ids(ray_session, tmp_path_factory,
                                   ids, parts):
    """Arbitrary sparse id sets under arbitrary bucket counts: interior
    + stitched boundary gaps together equal the lead-window oracle."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        id_gaps, id_gaps_oracle_sql)

    ids = sorted(ids)
    events = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "event_type": pa.array(["click"] * len(ids)),
        "user_id": pa.array([1] * len(ids), pa.int64()),
        "ts": pa.array(
            [np.datetime64(0, "us")] * len(ids), pa.timestamp("us")),
    })
    sf = _write_sf(tmp_path_factory.mktemp("ig"), events=events)
    _compare(sf, id_gaps(sf, parts=parts), id_gaps_oracle_sql())


@settings(**_SETTINGS)
@given(st.lists(
    st.lists(st.sampled_from(["the", "a", "hot", "cold", "data", "x"]),
             min_size=0, max_size=6),
    min_size=1, max_size=12,
))
def test_inverted_index_random_docs(ray_session, tmp_path_factory,
                                    docs):
    """Random small-vocab docs (stopwords included, empty docs
    included): df and the k-capped postings equal the list_sort-slice
    oracle — k=2 forces the cap on any term in 3+ docs."""
    from whakoom_webscrapper_ray.pipelines.text import (
        inverted_index, inverted_index_oracle_sql)

    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(d) for d in docs]),
    })
    sf = _write_sf(tmp_path_factory.mktemp("ii"), documents=t)
    _compare(sf, inverted_index(sf, k=2, parts=3),
             inverted_index_oracle_sql(k=2))
