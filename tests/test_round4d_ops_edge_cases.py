"""Edge-case conformance for burst_events and fk_integrity_report.

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


def test_burst_events_threshold_and_ties(ray_session, tmp_path):
    """Gap EXACTLY 60 s counts as burst (<=); 60.000001 s does not;
    equal timestamps order by event_id and each successor at zero gap
    is a burst; the same user's two event types are separate streams
    (the type boundary must never inherit the other stream's clock);
    singleton streams report zero."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_BURST_EVENTS, burst_events)

    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["c", "c", "c", "c", "v", "v",
                                "c", "c", "c"]),
        # user 1 type c: t0, t0+60s (burst, inclusive), tie at +60s
        # (burst, zero gap), +120.000001s (NOT burst);
        # user 1 type v starts 1us after the last c — its first event
        # must NOT be a burst despite the adjacent c clock;
        # user 2: gap just over a minute -> not a burst;
        # user 3: singleton.
        "ts": _us("2024-01-01T00:00:00", "2024-01-01T00:01:00",
                  "2024-01-01T00:01:00", "2024-01-01T00:02:00.000001",
                  "2024-01-01T00:02:00.000002",
                  "2024-01-01T00:02:30",
                  "2024-01-01T00:00:00", "2024-01-01T00:01:00.000001",
                  "2024-01-01T00:00:00"),
    })
    sf = _write_sf(tmp_path, events=events)
    _compare(sf, burst_events(sf), ORACLE_BURST_EVENTS)


def test_fk_integrity_orphans_and_nulls(ray_session, tmp_path):
    """Orphan FKs count per ROW (a duplicated orphan value counts
    twice); NULL FKs count as null, never as orphan; an edge with no
    violations reports zeros; n_rows includes null rows."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_FK_INTEGRITY, fk_integrity_report)

    nation = pa.table({"n_nationkey": pa.array([1, 2], pa.int64())})
    customer = pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        # one orphan nation, one null
        "c_nationkey": pa.array([1, 99, None], pa.int64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([20, 21], pa.int64()),
        "s_nationkey": pa.array([2, 2], pa.int64()),  # clean edge
    })
    part = pa.table({"p_partkey": pa.array([30], pa.int64())})
    orders = pa.table({
        "o_orderkey": pa.array([40, 41], pa.int64()),
        # 11 exists, 999 orphan
        "o_custkey": pa.array([11, 999], pa.int64()),
    })
    lineitem = pa.table({
        # same orphan orderkey twice -> n_orphans = 2 on that edge
        "l_orderkey": pa.array([40, 77, 77], pa.int64()),
        "l_partkey": pa.array([30, 30, None], pa.int64()),
        "l_suppkey": pa.array([20, None, 888], pa.int64()),
    })
    sf = _write_sf(tmp_path, nation=nation, customer=customer,
                   supplier=supplier, part=part, orders=orders,
                   lineitem=lineitem)
    _compare(sf, fk_integrity_report(sf), ORACLE_FK_INTEGRITY)
