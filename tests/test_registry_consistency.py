"""Cross-surface registry invariants.

The driver consumes three surfaces that must stay aligned by NAME:
``__ray_entry__.queries()`` / ``oracle_sql()``, ``bench.BENCH_QUERIES``
and the sf0.001 oracle-parity suite.  A typo in any registration shows
up here in milliseconds instead of as a missing driver row next round.
"""

from __future__ import annotations


def _entry():
    import __ray_entry__ as E

    return E


# Approximate-by-design operators: no SQL oracle, each hard-checked by
# an exact companion and/or a property-tested bound (see docstrings).
EXPECTED_NO_ORACLE = {
    "ann_ivf": "ann_ivf_fullprobe companion + recall pytest",
    "ann_ivf_indexed": "ann_ivf_indexed_fullprobe companion + "
                       "equality-vs-ann_ivf pytest",
    "knn_graph_ivf": "knn_graph_ivf_fullprobe companion + recall pytest",
    "knn_graph_ivf_indexed": "equality-vs-knn_graph_ivf pytest "
                             "(whose fullprobe is oracled)",
    "ann_lsh": "ann_lsh_fullprobe companion + recall pytest",
    "hll_vocab": "vocab_size companion + 5% bound pytest",
    "lang_hll_vocab": "lang_vocab companion + 5% bound pytest",
    "kll_token_quantiles": "token_quantiles companion + rank bound",
    "heavy_hitters": "term_counts_topk companion + MG bound",
    "cms_term_counts": "term_counts_topk companion + CMS bound",
    "lang_kll_quantiles": "lang_token_quantiles companion + rank bound",
    "embedding_pca": "numpy eigendecomposition parity + layout-determinism pytest",
    "decontaminate_bloom": "decontaminate companion + one-sided pytest",
}


def test_every_oracle_has_a_query():
    E = _entry()
    q, o = set(E.queries()), set(E.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"


def test_no_oracle_set_is_exactly_the_documented_one():
    E = _entry()
    missing = set(E.queries()) - set(E.oracle_sql())
    assert missing == set(EXPECTED_NO_ORACLE), (
        f"undocumented no-oracle queries: "
        f"{sorted(missing - set(EXPECTED_NO_ORACLE))}; "
        f"stale entries: {sorted(set(EXPECTED_NO_ORACLE) - missing)}"
    )


def test_in_cap_prefix_is_fully_oracled():
    """The driver's correctness file caps at 50 rows taken from the
    dict head; every one of those slots must carry a SQL oracle, or a
    no-oracle row burns a slot as `err` (r4 verdict item 4)."""
    E = _entry()
    head = list(E.queries())[:50]
    o = set(E.oracle_sql())
    missing = [n for n in head if n not in o]
    assert not missing, f"no-oracle rows inside the cap: {missing}"


def test_bench_queries_are_registered():
    import bench

    E = _entry()
    q = set(E.queries())
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert not missing, f"bench rows without queries: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES), \
        "duplicate bench rows"


def test_parity_suite_names_are_oracled():
    from tests import test_pipelines_oracle as tpo

    E = _entry()
    o = set(E.oracle_sql())
    missing = [n for n in tpo.QUERIES if n not in o]
    assert not missing, f"parity suite rows without oracles: {missing}"
    assert len(set(tpo.QUERIES)) == len(tpo.QUERIES), \
        "duplicate parity rows"


def test_queries_are_callables():
    E = _entry()
    for name, fn in E.queries().items():
        assert callable(fn), name
