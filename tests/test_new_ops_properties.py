"""Behavioral invariants for the round-4b operators (beyond the
DuckDB-parity rows in test_pipelines_oracle.py):

- event_funnel: stages are monotone in the window size, and the
  greedy step timestamps are strictly increasing.
- orders_topn_per_customer: at most n rows per customer, ranks
  contiguous from 1, prices non-increasing within a customer.
- price_winsorize: clipped-tail counts respect the discrete-percentile
  bounds and the winsorized sum never exceeds the clip-free sum.
- kmeans_assign: deterministic run-to-run, and Lloyd iterations never
  increase the cosine inertia (sum of 1 - sim-to-own-centroid).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_event_funnel_window_monotone_and_ordered(ray_session):
    from whakoom_webscrapper_ray.pipelines.dataops import event_funnel

    small = event_funnel(SF, window_s=3600).to_pandas()
    big = event_funnel(SF, window_s=30 * 86400).to_pandas()
    m = small.merge(big, on="user_id", suffixes=("_s", "_b"))
    assert len(m) == len(small) == len(big)  # same user set
    assert (m["stage_b"] >= m["stage_s"]).all()
    # greedy step times strictly increase: last_ts > first_ts whenever
    # the user advanced beyond stage 1
    adv = big[big["stage"] > 1]
    assert (adv["last_ts"] > adv["first_ts"]).all()
    one = big[big["stage"] == 1]
    assert (one["last_ts"] == one["first_ts"]).all()


def test_orders_topn_shape(ray_session):
    from whakoom_webscrapper_ray.pipelines.dataops import (
        orders_topn_per_customer,
    )

    df = orders_topn_per_customer(SF, n=3).to_pandas()
    g = df.groupby("o_custkey")
    assert (g.size() <= 3).all()
    # ranks contiguous from 1 and prices non-increasing in rank order
    for _, grp in list(g)[:50]:
        grp = grp.sort_values("rn")
        assert list(grp["rn"]) == list(range(1, len(grp) + 1))
        assert (np.diff(grp["price_cents"].to_numpy()) <= 0).all()


def test_price_winsorize_bounds(ray_session):
    import duckdb

    from whakoom_webscrapper_ray.pipelines.dataops import price_winsorize

    df = price_winsorize(SF).to_pandas()
    raw = duckdb.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, "
        "sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS c "
        f"FROM '{SF}/lineitem.parquet' GROUP BY 1, 2"
    ).df()
    m = df.merge(raw, on=["l_returnflag", "l_linestatus"])
    assert (m["n_rows"] == m["n"]).all()
    # discrete percentiles: strictly-below-lo count < ceil(p*n),
    # strictly-above-hi count <= n - ceil(p*n)
    lo_cap = np.ceil(0.05 * m["n"].to_numpy())
    hi_cap = m["n"].to_numpy() - np.ceil(0.95 * m["n"].to_numpy())
    assert (m["n_low"].to_numpy() < lo_cap).all()
    assert (m["n_high"].to_numpy() <= hi_cap).all()
    # every winsorized value lies in [lo, hi]: the cents sum is bounded
    # by the per-group boundary values
    bounds = duckdb.sql(
        "SELECT l_returnflag, l_linestatus, "
        "percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice)"
        " AS lo, "
        "percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)"
        " AS hi "
        f"FROM '{SF}/lineitem.parquet' GROUP BY 1, 2"
    ).df()
    m = m.merge(bounds, on=["l_returnflag", "l_linestatus"])
    lo_c = np.floor(m["lo"].to_numpy() * 100)
    hi_c = np.floor(m["hi"].to_numpy() * 100)
    s = m["sum_wins_cents"].to_numpy()
    n = m["n_rows"].to_numpy()
    assert (s >= n * lo_c).all() and (s <= n * hi_c).all()


def test_kmeans_deterministic_and_inertia_monotone(ray_session):
    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.pipelines.ann import (
        _km_cosine, emb_matrix, kmeans_assign,
    )

    a = kmeans_assign(SF).to_pandas().sort_values("vec_id")
    b = kmeans_assign(SF).to_pandas().sort_values("vec_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))

    # inertia (1 - cosine to own centroid, summed) is non-increasing
    # across Lloyd iterations
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    mat = emb_matrix(t["embedding"]).astype(np.float64)
    ids = t["vec_id"].to_numpy(zero_copy_only=False)

    inertias = []
    for iters in (0, 1, 2, 3):
        assign = kmeans_assign(SF, iters=iters).to_pandas()
        lab = (assign.set_index("vec_id").loc[ids, "cluster"]
               .to_numpy())
        cent = np.stack([
            mat[lab == c].mean(axis=0) if (lab == c).any()
            else np.zeros(mat.shape[1])
            for c in range(8)
        ])
        sims = _km_cosine(mat, cent)[np.arange(mat.shape[0]), lab]
        inertias.append(float(np.sum(1.0 - sims)))
    assert all(x >= y - 1e-9 for x, y in zip(inertias, inertias[1:]))
