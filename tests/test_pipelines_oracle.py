"""DuckDB-oracle parity for the data-ops / training-data pipelines.

Mirrors the driver's correctness gate locally at sf0.001: run the Ray
pipeline and its ``oracle_sql()`` over the same parquet, compare row
count, column names, and order-insensitive values exactly.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# Fast-at-sf0.001 representatives of every pipeline family (crawl ops
# are covered by test_crawl_conformance.py against the sequential
# simulator instead).
QUERIES = [
    "span_links", "span_kind_counts",           # interleaved spans
    "anchor_text_stats",                        # link-target aggregation
    "cooccurrence_topk",                        # windowed pair counts
    "distinctive_terms",                        # tf/df keyword extraction
    "corpus_prep",                              # composed end-to-end prep
    "token_stats", "quality_score",             # text analysis
    "bpe_token_count", "lang_topk", "token_quantiles",
    "lang_token_quantiles",
    "ngram_df_topk", "vocab_size", "redact_terms",
    "exact_dedup", "embedding_dups",            # dedup family
    "incremental_dedup",
    "simhash_dup_pairs",
    "dedup_clusters", "corpus_dedup",           # corpus curation
    "decontaminate", "quality_sample", "embedding_clusters",
    "split_assign", "corpus_shuffle",           # deterministic split/order
    "lang_balanced_sample", "source_mix_sample", "sequence_pack",
    "revenue_by_nation",                        # large x large hash join
    "link_rank",                                # iterative graph rank
    "ann_topk", "ann_topk_filtered", "ann_lsh_fullprobe",  # similarity
    "frame_sample", "media_resize",             # multimodal plumbing
    "pricing_summary", "junction_min_position",  # relational aggs
    "orders_by_month", "customers_no_big_orders",
    "events_hourly", "sessionize", "latest_user_state",  # streaming
    "user_running_total",
    "props_field_stats",                        # JSON-field extraction
    "events_sliding", "latest_order_before_event",  # window / as-of
    "event_funnel",                             # ordered step sequence
    "orders_topn_per_customer",                 # per-key windowed top-n
    "price_winsorize",                          # percentile clipping
    "kmeans_assign",                            # distributed Lloyd
    "attribution_window",                       # range / interval join
    "event_type_pivot",                         # long→wide crosstab
    "ann_range",                                # radius vector search
    "term_counts_topk",                         # exact heavy hitters
    "price_histogram",                          # fixed-width histogram
    "mad_outliers",                             # robust median/MAD screen
    "user_event_sequence",                      # ordered string agg
    "knn_graph",                                # exact k-NN graph
    "knn_graph_ivf_fullprobe",                  # IVF machinery, exact
    "ann_ivf_indexed_fullprobe",                # persisted index, exact
    "contamination_report",                     # per-source leakage
    "pack_stats",                               # packing utilization
    "events_rollup",                            # multi-level ROLLUP agg
    "lang_vocab",                               # groupwise count-distinct
    "doc_percentile_rank",                      # global rank via CDF bcast
    "source_overlap",                           # cross-source gram matrix
    "value_quantiles",                          # continuous-domain selection
    "retention_cohorts",                        # cohort matrix, 1 shuffle
    "rolling_active_users",                     # sliding COUNT DISTINCT
    "copurchase_pairs",                         # frequent-pair mining
    "duplicate_ngram_coverage",                 # per-doc dup-gram frac
    "keyword_search",                           # tf x rarity top-k
    "interval_merge",                           # islands w/ running-max end
    "span_stitch",                              # text-run paragraphs
    "media_context",                            # image caption heuristic
    "revenue_mom_growth",                       # lag-window deltas
    "pareto_front",                             # skyline (local-then-merge)
    "time_weighted_avg",                        # step-function integral
    "triangle_topk",                            # degree-oriented triangles
    "bigram_assoc",                             # integer-exact PMI ranking
    "chunk_dedup_ratio",                        # fixed-window chunk dedup
    "weighted_sample",                          # deterministic weighted draw
    "copurchase_components",                    # CC via Hash-to-Min reuse
    "fuzzy_name_pairs",                         # exact dist-1 string join
    "state_history",                            # SCD-2 change intervals
    "event_path_topk",                          # sequential trigram mining
    "embedding_centroids",                      # quantized class prototypes
    "graph_bfs_hops",                           # iterative frontier BFS
    "lang_term_topk",                           # grouped heavy hitters
    "dedup_report",                             # per-source dedup impact
    "order_gaps",                               # inter-purchase cadence
    "ship_window_join",                         # non-equi date range join
    "ship_disorder",                            # watermark-lateness profile
    "shipping_priority_topk",                   # Q3-shape 3-table topk
    "cluster_best_doc",                         # keep-longest per cluster
    "promo_share_monthly",                      # flag-join conditional agg
    "doc_chunks",                               # overlapping token windows
    "value_moving_avg",                         # ROWS-frame window
    "nation_trade_matrix",                      # bilateral revenue matrix
    "burst_events",                             # machine-rate burst screen
    "fk_integrity_report",                      # FK orphan audit
    "decontaminate_embedding",                  # embedding-space decon
    "inverted_index",                           # capped postings build
    "farthest_point_sample",                    # k-center coreset greedy
    "id_gaps",                                  # range-partitioned gaps
    "event_transitions",                        # Markov transition matrix
    "user_set_ops",                             # key-set Venn split
    "qty_price_moments",                        # mergeable 2nd moments
    "source_dup_matrix",                        # cross-feed contamination
    "snapshot_diff",                            # incremental recrawl diff
    "vocab_encode",                             # vocab build + encode
    "customer_value_deciles",                   # exact decile scoring
    "customer_rfm",                             # 3-dim quintile scoring
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def entry(ray_session):
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_parity(entry, ddb, name):
    res = canon(to_pandas(entry.queries()[name](SF_DIR)))
    exp = canon(ddb.sql(entry.oracle_sql()[name]).df())
    assert list(res.columns) == list(exp.columns)
    assert len(res) == len(exp)
    pd.testing.assert_frame_equal(res, exp, check_dtype=True)


def test_embedding_dups_multiblock(entry, ddb):
    """Regression: with block_rows far below the row count the blocked
    self-join runs many cross-block tasks; blocks are IVF-bucket-sorted
    (NOT id-sorted), so a pair whose smaller vec_id sits in the second
    block must still be emitted (the old id-order filter dropped it)."""
    from whakoom_webscrapper_ray.pipelines.dedup import (
        ORACLE_EMBEDDING_DUPS, embedding_dup_pairs,
    )

    got = canon(
        embedding_dup_pairs(SF_DIR, block_rows=64, n_centroids=8)
        .to_pandas()
    )
    exp = canon(ddb.sql(ORACLE_EMBEDDING_DUPS).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_knn_graph_multiblock(entry, ddb):
    """With block_rows far below the corpus the k-NN graph runs B²
    block-pair tasks and a per-source candidate merge; the merged
    ranks must equal the single-block (all-in-one-matmul) result."""
    from whakoom_webscrapper_ray.pipelines.ann import (
        knn_graph, knn_graph_oracle_sql,
    )

    got = canon(knn_graph(SF_DIR, block_rows=64).to_pandas())
    exp = canon(ddb.sql(knn_graph_oracle_sql()).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_incremental_dedup_persisted_index(entry):
    """The stored-LSH-index path returns exactly the recompute path's
    result: build_lsh_index persists corpus bands through the storage
    seam, incremental_dedup(index_dir=...) probes the stored table."""
    import tempfile

    from whakoom_webscrapper_ray.pipelines.dedup import (
        build_lsh_index, incremental_dedup,
    )

    fresh = canon(incremental_dedup(SF_DIR).to_pandas())
    with tempfile.TemporaryDirectory(prefix="wkm_lsh_idx_") as idx:
        build_lsh_index(SF_DIR, idx)
        stored = canon(
            incremental_dedup(SF_DIR, index_dir=idx).to_pandas()
        )
    pd.testing.assert_frame_equal(stored, fresh, check_dtype=True)


def test_feed_export_manifest(entry):
    """The sink writes real partitioned files (manifest side) and the
    query surface reports matching round-trip facts per format."""
    import tempfile

    from whakoom_webscrapper_ray.pipelines.interleaved import span_links
    from whakoom_webscrapper_ray.pipelines.sinks import export_dataset

    with tempfile.TemporaryDirectory(prefix="wkm_feed_t_") as out:
        m = export_dataset(span_links(SF_DIR), out).to_pandas()
    assert set(m["format"]) == {"parquet", "json", "csv"}
    assert (m["n_files"] > 0).all()
    assert (m["n_bytes"] > 0).all()

    facts = entry.queries()["feed_export"](SF_DIR).to_pandas()
    assert set(facts["format"]) == {"parquet", "json", "csv"}
    assert facts["n_rows"].nunique() == 1          # both formats agree
    assert facts["content_sum"].nunique() == 1
    assert (facts["n_rows"] > 0).all()


def test_media_features_schema(entry):
    df = to_pandas(entry.queries()["media_features"](SF_DIR))
    assert list(df.columns) == [
        "doc_id", "n_bytes", "width", "height", "payload_md5"
    ]
    assert len(df) == 500
    assert (df["width"] >= 16).all() and (df["height"] >= 16).all()
    # digest parity vs the DuckDB oracle, bit-exact on all rows
    import duckdb

    from whakoom_webscrapper_ray.pipelines.multimodal import (
        ORACLE_MEDIA_FEATURES,
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    exp = con.sql(ORACLE_MEDIA_FEATURES).df()
    a = df.sort_values("doc_id").reset_index(drop=True)
    b = exp.sort_values("doc_id").reset_index(drop=True)
    assert list(a["payload_md5"]) == list(b["payload_md5"])
    assert list(a["n_bytes"]) == list(b["n_bytes"])


def test_asof_semijoin_both_paths(ray_session):
    """latest_order_before_event: the broadcast semi-join pushdown and
    the over-budget co-partitioned path (users_broadcast_budget=0 —
    orders ride the hash shuffle and are filtered per partition) must
    produce identical results (VERDICT r3 #5)."""
    from whakoom_webscrapper_ray.pipelines import dataops

    cols = ["event_id", "user_id", "ts", "last_order_date",
            "n_orders_before"]
    a = dataops.latest_order_before_event(SF_DIR).to_pandas()[cols] \
        .sort_values("event_id").reset_index(drop=True)
    b = dataops.latest_order_before_event(
        SF_DIR, users_broadcast_budget=0
    ).to_pandas()[cols].sort_values("event_id").reset_index(drop=True)
    assert a.equals(b)
    # a different partition count must not change the answer either
    c = dataops.latest_order_before_event(SF_DIR, parts=7) \
        .to_pandas()[cols].sort_values("event_id").reset_index(drop=True)
    assert a.equals(c)


def test_entry_contract(entry):
    """The driver's smoke contract: entry() returns a Dataset in the
    input_hint shape with >0 rows (crawl docs ∪ derived interleaved
    documents)."""
    import pyarrow as pa

    ds = entry.entry()
    schema = ds.schema()
    assert schema.names == ["doc_id", "spans"]
    spans_t = schema.types[1]
    assert pa.types.is_list(spans_t)
    f = {spans_t.value_type.field(i).name
         for i in range(spans_t.value_type.num_fields)}
    assert f == {"kind", "text", "media_ref", "offset"}
    assert ds.count() > 0
