"""Edge-case conformance for the round-4 late-session operators.

Same harness as test_new_ops_edge_cases.py: feed the ops ADVERSARIAL
tiny tables (bucket-boundary windows, inclusive/exclusive range ends,
ordering ties, chunk-boundary token counts) and check Ray == DuckDB on
the exact oracle SQL the driver runs.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from tests.test_new_ops_edge_cases import _compare, _write_sf


def _ts(*dates: str) -> pa.Array:
    import numpy as np

    return pa.array([np.datetime64(d, "us") for d in dates],
                    pa.timestamp("us"))


def test_ship_window_join_bucket_boundaries(ray_session, tmp_path):
    """A window straddling the 16-day bucket boundary counts items in
    BOTH buckets exactly once; range ends are [inclusive, exclusive);
    an order with no in-window items still appears with zeros."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_SHIP_WINDOW_JOIN, ship_window_join)

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        # order 1: window 1995-01-14..21 straddles the day-16 bucket
        # edge; order 2: all items far away; order 3: same day as 1
        "o_orderdate": _ts("1995-01-14", "1997-06-01", "1995-01-14"),
    })
    items = pa.table({
        # at t0 (in), at t0+6d23h59 (in), at t0+7d (OUT, exclusive),
        # one the day before t0 (OUT), one across the bucket edge (in)
        "l_shipdate": _ts("1995-01-14", "1995-01-20", "1995-01-21",
                          "1995-01-13", "1995-01-17"),
        "l_extendedprice": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
    })
    sf = _write_sf(tmp_path, orders=orders, lineitem=items)
    _compare(sf, ship_window_join(sf), ORACLE_SHIP_WINDOW_JOIN)


def test_ship_disorder_ties_and_singletons(ray_session, tmp_path):
    """Equal ship dates are NOT late (strict <); single-line orders
    report zero; duplicate line numbers break ties by part/supp key."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_SHIP_DISORDER, ship_disorder)

    items = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        # order 1: dup linenumber 1 twice (tie-break by partkey) then
        # a regression; order 2: singleton; order 3: equal dates
        "l_linenumber": pa.array([1, 1, 2, 1, 1, 2], pa.int32()),
        "l_partkey": pa.array([10, 5, 7, 1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 1, 1, 1], pa.int64()),
        "l_shipdate": _ts("1995-03-01", "1995-05-01", "1995-04-01",
                          "1995-01-01", "1995-02-02", "1995-02-02"),
    })
    sf = _write_sf(tmp_path, lineitem=items)
    _compare(sf, ship_disorder(sf), ORACLE_SHIP_DISORDER)


def test_shipping_priority_cutoff_is_strict(ray_session, tmp_path):
    """Orders ON the cutoff date are excluded (strict <); lineitems
    shipped ON the cutoff are excluded (strict >); result smaller than
    n is fine."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_SHIPPING_PRIORITY, shipping_priority_topk)

    customer = pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"]),
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        # order 2 is ON the cutoff -> excluded; order 3 wrong segment
        "o_orderdate": _ts("1996-06-01", "1996-06-30", "1996-06-01"),
    })
    items = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 10.0, 10.0]),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0]),
        # first ships ON the cutoff -> excluded from revenue
        "l_shipdate": _ts("1996-06-30", "1996-07-04", "1996-07-04",
                          "1996-07-04"),
    })
    sf = _write_sf(tmp_path, customer=customer, orders=orders,
                   lineitem=items)
    _compare(sf, shipping_priority_topk(sf), ORACLE_SHIPPING_PRIORITY)


def test_doc_chunks_boundary_lengths(ray_session, tmp_path):
    """n = 1, n = stride, n = stride+1, n = chunk size: chunk counts
    and last-chunk lengths land exactly on the closed-form."""
    from whakoom_webscrapper_ray.pipelines.text import (
        doc_chunks, doc_chunks_oracle_sql)

    def words(n: int) -> str:
        return " ".join(["w"] * n)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["", words(96), words(97), words(128),
                          words(300)]),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, doc_chunks(sf), doc_chunks_oracle_sql())


def test_value_moving_avg_short_frames_and_ties(ray_session, tmp_path):
    """Frames shorter than the window divide by the ACTUAL length;
    equal timestamps order by event_id; negative cents floor-divide
    the SQL way."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_VALUE_MOVING_AVG, value_moving_avg)

    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 9], pa.int64()),
        "ts": _ts("2024-01-01", "2024-01-01", "2024-01-02",
                  "2024-01-03", "2024-01-01"),
        "value": pa.array([1.0, 2.0, -3.5, 10.0, 4.0]),
    })
    sf = _write_sf(tmp_path, events=events)
    _compare(sf, value_moving_avg(sf), ORACLE_VALUE_MOVING_AVG)


def test_promo_share_zero_promo_month(ray_session, tmp_path):
    """A month whose only items are non-promo reports promo_cents=0;
    discounts flow through the floor-cents rule."""
    from whakoom_webscrapper_ray.pipelines.dataops import (
        ORACLE_PROMO_SHARE, promo_share_monthly)

    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"]),
    })
    items = pa.table({
        "l_partkey": pa.array([1, 2, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 7.77]),
        "l_discount": pa.array([0.05, 0.0, 0.1]),
        "l_shipdate": _ts("1995-01-10", "1995-01-20", "1995-02-01"),
    })
    sf = _write_sf(tmp_path, part=part, lineitem=items)
    _compare(sf, promo_share_monthly(sf), ORACLE_PROMO_SHARE)


def test_cluster_best_doc_token_tie_breaks_to_min_id(ray_session,
                                                     tmp_path):
    """Two near-identical docs with EQUAL token counts: the smaller
    doc_id is the representative; a longer third member wins its own
    cluster outright; singletons keep themselves."""
    from whakoom_webscrapper_ray.pipelines.curate import (
        ORACLE_CLUSTER_BEST_DOC, cluster_best_doc)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
        "text": pa.array([
            base,                      # near-dup of 2, equal length
            base,                      # tie -> doc 1 wins
            base + " phi chi psi",     # near-dup, longer -> wins
            "completely different text about nothing at all here",
        ]),
    })
    sf = _write_sf(tmp_path, documents=docs)
    _compare(sf, cluster_best_doc(sf), ORACLE_CLUSTER_BEST_DOC)
