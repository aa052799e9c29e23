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


def test_decontaminate_embedding_margins(ray_session, tmp_path):
    """An exact copy of an eval vector is contaminated (cos 1); a
    scaled copy too (cosine is scale-free); an orthogonal vector is
    clean; a negative-cosine vector is clean; eval rows themselves are
    excluded from the output."""
    from whakoom_webscrapper_ray.pipelines.curate import (
        ORACLE_DECONTAMINATE_EMBEDDING, decontaminate_embedding)

    dim = pa.list_(pa.float32())
    emb = pa.table({
        # 0 and 19 are the eval split (vec_id % 19 == 0)
        "vec_id": pa.array([0, 19, 1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([
            [1.0, 0.0, 0.0, 0.0],    # eval A
            [0.0, 1.0, 0.0, 0.0],    # eval B
            [2.0, 0.0, 0.0, 0.0],    # scaled copy of A -> contaminated
            [0.0, 0.0, 1.0, 0.0],    # orthogonal -> clean
            [-1.0, 0.0, 0.0, 0.0],   # anti-parallel -> clean
            [0.6, 0.8, 0.0, 0.0],    # cos 0.6 vs A, 0.8 vs B -> hit
        ], dim),
    })
    sf = _write_sf(tmp_path, embeddings=emb)
    _compare(sf, decontaminate_embedding(sf),
             ORACLE_DECONTAMINATE_EMBEDDING)


def test_inverted_index_caps_and_dedup(ray_session, tmp_path):
    """A term repeated within one doc posts that doc ONCE; a term in
    more than k docs keeps df exact but caps postings at the k
    smallest doc_ids; stopwords never index; a stopword-only doc
    contributes nothing to any term."""
    from whakoom_webscrapper_ray.pipelines.text import (
        inverted_index, inverted_index_oracle_sql)

    rows = [(i, "hot data") for i in range(10)]        # 10 > k=8 docs
    rows += [(100, "cold cold cold"), (101, "the a of"),
             (102, "cold data")]
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, inverted_index(sf), inverted_index_oracle_sql())


def test_farthest_point_sample_dups_and_ties(ray_session, tmp_path):
    """Exact duplicates of chosen centers sit at quantized distance 0
    (the clamp region) and can still be selected when everything else
    is exhausted; equal quantized distances break to the smallest
    vec_id; the greedy trace matches the recursive-CTE oracle step for
    step."""
    from whakoom_webscrapper_ray.pipelines.ann import (
        farthest_point_sample, farthest_point_sample_oracle_sql)

    dim = pa.list_(pa.float32())
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "embedding": pa.array([
            [1.0, 0.0],      # seed (min id)
            [1.0, 0.0],      # exact dup of seed -> d 0
            [0.0, 1.0],      # orthogonal
            [-1.0, 0.0],     # antipode: wins step 2 ...
            [0.7071, 0.7071],
            [-1.0, 0.0],     # ... but 5 ties it; id 3 must win
        ], dim),
    })
    sf = _write_sf(tmp_path, embeddings=emb)
    _compare(sf, farthest_point_sample(sf, k=5),
             farthest_point_sample_oracle_sql(k=5))


def test_id_gaps_bucket_boundaries(ray_session, tmp_path):
    """A gap spanning a whole (empty) bucket is stitched into ONE
    range; adjacent ids produce no gap; duplicate ids produce no
    phantom gap; a gap exactly at a bucket boundary is found once.
    parts=4 over a 0..99 domain forces the cross-bucket paths."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        id_gaps, id_gaps_oracle_sql)

    # buckets of width 25: [0,25) [25,50) [50,75) [75,100)
    ids = [0, 1, 2, 24, 26,          # interior gap 3-23, boundary 25
           49, 50,                   # adjacent across boundary: no gap
           52, 52,                   # duplicate id: no phantom gap
           99]                       # 53-98 spans two buckets + stitch
    events = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "event_type": pa.array(["click"] * len(ids)),
        "user_id": pa.array([1] * len(ids), pa.int64()),
        "ts": _us(*(["2024-01-01T00:00:00"] * len(ids))),
    })
    sf = _write_sf(tmp_path, events=events)
    _compare(sf, id_gaps(sf, parts=4), id_gaps_oracle_sql())
