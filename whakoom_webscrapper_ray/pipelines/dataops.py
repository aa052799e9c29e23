"""Relational operators over the driver testdata (TPC-H-ish tables).

These exercise the engine's general operator vocabulary — the
distributed generalizations of the reference's SQL layer
(whakoom_webscrapper/queries/lists.sql, sqlmanager.py): filter /
project (J4), groupby aggregate with map-side partials (A4), broadcast
joins (J5), anti-joins (J3), last-writer-wins upsert merge (A2,
queries/lists.sql:1-9), junction min-position (J1,
001_initial_schema.sql:31-43), sort/limit (O1), and windowed /
sessionized event streams (the streaming-window custom operator).

Exactness discipline: every currency aggregate goes through
``floor(x * 100) → int64`` cents on BOTH sides (Ray and oracle SQL) so
sums are order-independent and hash-comparable; see common.cents.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .common import deref, read, two_phase_agg


def _floor_cents(arr) -> pa.Array:
    return pc.cast(pc.floor(pc.multiply(arr, 100.0)), pa.int64())


# ------------------------------------------------- filter / project
def docs_filter_project(sf_dir: str) -> ray.data.Dataset:
    """English documents, 2-column projection (M-family, J4)."""
    ds = read(sf_dir, "documents",
              columns=["doc_id", "lang", "source", "n_chars"])
    return ds.filter(
        expr="lang == 'en'"
    ).select_columns(["doc_id", "source", "n_chars"])


ORACLE_DOCS_FILTER = """
SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en'
"""


# ------------------------------------------------- pricing summary (A4)
def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped aggregate with exact integer-cents sums.

    The per-batch projection computes the cents columns map-side; the
    groupby on the 2 low-cardinality keys then moves only partial
    aggregates (Ray Data's hash-agg combines per block before the
    exchange).
    """
    import datetime

    cutoff = datetime.datetime(1998, 9, 1)

    def project(b: pa.Table) -> pa.Table:
        keep = pc.less_equal(b["l_shipdate"],
                             pa.scalar(cutoff, pa.timestamp("us")))
        b = b.filter(keep)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pc.cast(b["l_quantity"], pa.int64()),
                "price_cents": _floor_cents(b["l_extendedprice"]),
                "disc_cents": _floor_cents(b["l_discount"]),
            }
        )

    projected = read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(project, batch_format="pyarrow")
    return two_phase_agg(
        projected, ["l_returnflag", "l_linestatus"],
        sums={"qty": "sum_qty", "price_cents": "sum_price_cents",
              "disc_cents": "sum_disc_cents"},
        count_alias="count_order",
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(sum(CAST(floor(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------- top customers (J5 + O1)
def top_customers(sf_dir: str, n: int = 10) -> ray.data.Dataset:
    """Revenue top-N: shuffle-aggregate orders by custkey, prune with
    a per-block top-N combiner (limit pushdown — no global sort), then
    enrich only the final N rows from the customer table."""
    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "price_cents": _floor_cents(b["o_totalprice"]),
            }
        )

    from .common import hash_keyed_agg

    # o_custkey is high-cardinality (every customer): the coarse-
    # partition vectorized aggregate, not Ray's per-key path
    agg = hash_keyed_agg(
        read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow"),
        "o_custkey",
        sums={"price_cents": "revenue_cents"},
        count_alias="n_orders",
    )

    # Limit pushdown instead of a global sort: each block emits its
    # local top-n (the pruning combiner), a single merge block picks
    # the global top-n — no all-to-all sort of the aggregate, and the
    # shuffle moves n × blocks rows, never the customer count.
    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= n:
            return b
        keys = b["revenue_cents"].to_numpy(zero_copy_only=False)
        cust = b["o_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cust, -keys))[:n]
        return b.take(pa.array(np.sort(order), pa.int64()))

    top = (
        agg.map_batches(local_top, batch_format="pyarrow")
        .repartition(1)
        .sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(n)
    )

    # Names are needed only for the FINAL n rows, so the small-side
    # lookup runs after the limit: n point lookups, not a broadcast of
    # every customer name (the J2/point-lookup shape — at 100 TB this
    # is n row-group reads, never a full dimension-table ship).
    import pyarrow.parquet as pq

    from .common import table_path

    cust = pq.read_table(table_path(sf_dir, "customer"),
                         columns=["c_custkey", "c_name"])
    name_ref = ray.put(
        dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))
    )

    def enrich(b: pa.Table, names=None) -> pa.Table:
        names = deref(names)
        keys = b["o_custkey"].to_pylist()
        return b.append_column(
            "c_name",
            pa.array([names.get(k) for k in keys], pa.string()),
        )

    out = top.map_batches(
        enrich, fn_kwargs={"names": name_ref}, batch_format="pyarrow",
    )
    return out.select_columns(
        ["o_custkey", "c_name", "revenue_cents", "n_orders"]
    )


ORACLE_TOP_CUSTOMERS = """
SELECT o_custkey, c_name, revenue_cents, n_orders
FROM (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
) r JOIN customer ON c_custkey = o_custkey
ORDER BY revenue_cents DESC, o_custkey ASC
LIMIT 10
"""


# ------------------------------------- nation/region rollup (J5 chain)
def customer_rollup(sf_dir: str) -> ray.data.Dataset:
    """customer ⋈ nation ⋈ region via two broadcast lookups, then agg."""
    import pyarrow.parquet as pq

    from .common import table_path

    nation = pq.read_table(table_path(sf_dir, "nation")).combine_chunks()
    region = pq.read_table(table_path(sf_dir, "region")).combine_chunks()
    # nation ⋈ region resolved driver-side ONCE into a small Arrow
    # lookup table (25 rows) — probes below are vectorized
    # index_in + take, never per-row dict lookups
    ridx = pc.index_in(nation["n_regionkey"],
                       value_set=region["r_regionkey"].combine_chunks())
    lookup = pa.table(
        {
            "key": nation["n_nationkey"],
            "nation_name": nation["n_name"],
            "region_name": region["r_name"].take(ridx),
        }
    ).combine_chunks()
    lookup_ref = ray.put(lookup)

    def tag(b: pa.Table, lookups=None) -> pa.Table:
        lk = deref(lookups)
        idx = pc.index_in(b["c_nationkey"],
                          value_set=lk.column("key").chunk(0))
        return pa.table(
            {
                "region_name": lk.column("region_name").take(idx),
                "nation_name": lk.column("nation_name").take(idx),
                "acctbal_cents": _floor_cents(b["c_acctbal"]),
            }
        )

    tagged = read(
        sf_dir, "customer", columns=["c_nationkey", "c_acctbal"]
    ).map_batches(tag, fn_kwargs={"lookups": lookup_ref},
                  batch_format="pyarrow")
    return two_phase_agg(tagged, ["region_name", "nation_name"],
                         sums={"acctbal_cents": "acctbal_cents_sum"},
                         count_alias="n_customers")


ORACLE_CUSTOMER_ROLLUP = """
SELECT r_name AS region_name, n_name AS nation_name,
       count(*) AS n_customers,
       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents_sum
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, n_name
"""


# ------------------------------------------------ orders by month (F4)
def orders_by_month(sf_dir: str) -> ray.data.Dataset:
    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
                "price_cents": _floor_cents(b["o_totalprice"]),
            }
        )

    projected = read(
        sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]
    ).map_batches(project, batch_format="pyarrow")
    return two_phase_agg(projected, ["month"],
                         sums={"price_cents": "total_cents"},
                         count_alias="n_orders")


ORACLE_ORDERS_BY_MONTH = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY 1
"""


# --------------------------------------------- junction min-position (J1)
def junction_min_position(sf_dir: str) -> ray.data.Dataset:
    """groupby (orderkey, partkey) min(linenumber) — the exact shape of
    the reference's lists_titles junction UNIQUE + min(position)
    aggregate (001_initial_schema.sql:31-43, SURVEY.md J1)."""
    num_buckets = 32

    def add_bucket(b: pa.Table) -> pa.Table:
        k = pc.add(pc.multiply(b["l_orderkey"], 2654435761),
                   b["l_partkey"])
        return b.append_column(
            "bucket", pc.cast(pc.bit_wise_and(k, num_buckets - 1),
                              pa.int32())
        )

    def agg_group(g: pa.Table) -> pa.Table:
        r = pa.TableGroupBy(g, ["l_orderkey", "l_partkey"]).aggregate(
            [("l_linenumber", "min")]
        )
        return pa.table(
            {
                "l_orderkey": r["l_orderkey"],
                "l_partkey": r["l_partkey"],
                "position": pc.cast(r["l_linenumber_min"], pa.int64()),
            }
        )

    return (
        read(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_linenumber"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(agg_group, batch_format="pyarrow")
    )


ORACLE_JUNCTION_MIN = """
SELECT l_orderkey, l_partkey,
       CAST(min(l_linenumber) AS BIGINT) AS position
FROM lineitem
GROUP BY l_orderkey, l_partkey
"""


# ------------------------------------------------------- anti-join (J3)
def customers_no_big_orders(sf_dir: str, cents_threshold: int = 45_000_000
                            ) -> ray.data.Dataset:
    """Customers with no order above the threshold — the seen-set
    anti-join pattern: the small 'seen' key set is collected once,
    broadcast via ``ray.put``, and probed inside map_batches (exactly
    how candidate URLs probe the crawl seen-set, SURVEY.md J3)."""
    def big_keys(b: pa.Table) -> pa.Table:
        keep = pc.greater(_floor_cents(b["o_totalprice"]),
                          pa.scalar(cents_threshold, pa.int64()))
        return b.filter(keep).select(["o_custkey"])

    big = (
        read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(big_keys, batch_format="pyarrow")
        .unique("o_custkey")
    )
    # broadcast the small key set ONCE as an Arrow array; the probe is
    # a vectorized C hash lookup (pc.is_in), not a per-row set test
    seen_ref = ray.put(pa.array(sorted(big), pa.int64()))

    def anti_probe(b: pa.Table, seen=None) -> pa.Table:
        vs = deref(seen)
        return b.filter(
            pc.invert(pc.is_in(b["c_custkey"], value_set=vs))
        )

    return read(sf_dir, "customer", columns=["c_custkey", "c_name"]
                ).map_batches(
        anti_probe, fn_kwargs={"seen": seen_ref}, batch_format="pyarrow",
    )


ORACLE_CUSTOMERS_NO_BIG = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND CAST(floor(o.o_totalprice * 100) AS BIGINT) > 45000000
)
"""


# ------------------------------------------------------ sort/limit (O1)
def top_parts(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    def project(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b["p_size"], pa.scalar(40, pa.int32()))
        b = b.filter(keep)
        return pa.table(
            {
                "p_partkey": b["p_partkey"],
                "p_name": b["p_name"],
                "price_cents": _floor_cents(b["p_retailprice"]),
            }
        )

    def local_top(b: pa.Table) -> pa.Table:
        # limit pushdown: per-block top-n prune before the tiny final
        # sort — the global sort never sees more than n × blocks rows
        if b.num_rows <= n:
            return b
        keys = b["price_cents"].to_numpy(zero_copy_only=False)
        pk = b["p_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, -keys))[:n]
        return b.take(pa.array(np.sort(order), pa.int64()))

    return (
        read(sf_dir, "part", columns=["p_partkey", "p_name", "p_size",
                                      "p_retailprice"])
        .map_batches(project, batch_format="pyarrow")
        .map_batches(local_top, batch_format="pyarrow")
        .repartition(1)
        .sort(["price_cents", "p_partkey"], descending=[True, False])
        .limit(n)
    )


ORACLE_TOP_PARTS = """
SELECT p_partkey, p_name,
       CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
FROM part WHERE p_size >= 40
ORDER BY price_cents DESC, p_partkey ASC
LIMIT 20
"""


# ------------------------------------------------ events hourly window
def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window count/sum per event type."""
    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.strftime(b["ts"], format="%Y-%m-%d %H:00"),
                "event_type": b["event_type"],
                "value_cents": _floor_cents(b["value"]),
            }
        )

    projected = read(
        sf_dir, "events", columns=["ts", "event_type", "value"]
    ).map_batches(project, batch_format="pyarrow")
    return two_phase_agg(projected, ["hour", "event_type"],
                         sums={"value_cents": "value_cents_sum"},
                         count_alias="n_events")


def events_rollup(sf_dir: str) -> ray.data.Dataset:
    """(day, event_type, n_events, value_cents_sum) at every ROLLUP
    level of (day, event_type) — finest, per-day subtotal, grand total —
    the multi-level report shape (``GROUP BY ROLLUP``).  Rolled-up key
    columns carry the sentinel ``'ALL'`` (both keys are non-null in the
    source) so the driver's hash compare stays NULL-free.

    Scale shape: ONE pass over the raw table builds the finest level
    via the map-side-partial combiner (``two_phase_agg``); the coarser
    levels re-aggregate THAT result — days × types rows, bounded
    regardless of corpus size — in a single-block Arrow group_by, so
    raw rows are shuffled exactly once and never re-read per level.
    """
    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
                "event_type": b["event_type"],
                "value_cents": _floor_cents(b["value"]),
            }
        )

    projected = read(
        sf_dir, "events", columns=["ts", "event_type", "value"]
    ).map_batches(project, batch_format="pyarrow")
    finest = two_phase_agg(projected, ["day", "event_type"],
                           sums={"value_cents": "value_cents_sum"},
                           count_alias="n_events")

    def lift(t: pa.Table) -> pa.Table:
        def level(keys: list[str]) -> pa.Table:
            g = pa.TableGroupBy(t, keys).aggregate(
                [("n_events", "sum"), ("value_cents_sum", "sum")]
            ) if keys else None
            n = t.num_rows if g is None else g.num_rows
            all_col = pa.array(["ALL"] * n, pa.string())

            def key_or_all(name: str):
                return g[name] if g is not None and name in keys \
                    else all_col

            if g is None:
                ne = pa.array(
                    [pc.sum(t["n_events"]).as_py() or 0], pa.int64())
                vs = pa.array(
                    [pc.sum(t["value_cents_sum"]).as_py() or 0],
                    pa.int64())
                one = pa.array(["ALL"], pa.string())
                return pa.table({"day": one, "event_type": one,
                                 "n_events": ne, "value_cents_sum": vs})
            return pa.table({
                "day": key_or_all("day"),
                "event_type": key_or_all("event_type"),
                "n_events": pc.cast(g["n_events_sum"], pa.int64()),
                "value_cents_sum": pc.cast(
                    g["value_cents_sum_sum"], pa.int64()),
            })

        fine = t.select(["day", "event_type", "n_events",
                         "value_cents_sum"])
        return pa.concat_tables([fine, level(["day"]), level([])])

    return finest.repartition(1).map_batches(
        lift, batch_format="pyarrow", batch_size=None
    )


ORACLE_EVENTS_ROLLUP = """
SELECT coalesce(day, 'ALL') AS day,
       coalesce(event_type, 'ALL') AS event_type,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents_sum
FROM (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
)
GROUP BY ROLLUP(day, event_type)
"""


# -------------------------------------- JSON-field extraction (F-family)
def props_field_stats(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n_events, k_sum, k_min, k_max): aggregate a field
    extracted from the free-form JSON-as-TEXT ``props`` column — the
    read-side analog of the reference's ``title_enriched
    .additional_data`` JSON column (001_initial_schema.sql:92,
    README.md:140).  Extraction is a vectorized RE2 kernel
    (``pc.extract_regex``), not per-row ``json.loads``; DuckDB's
    ``regexp_extract`` shares the RE2 engine so the oracle is
    semantics-exact (same contract as redact_terms)."""
    pattern = r'"k":\s*(?P<k>[0-9]+)'

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], pattern=pattern)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        keep = pc.is_valid(k)
        return pa.table({
            "event_type": b["event_type"],
            "k": k,
        }).filter(keep)

    ext = read(sf_dir, "events", columns=["event_type", "props"]
               ).map_batches(extract, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["event_type"]).aggregate(
            [("k", "sum"), ("k", "min"), ("k", "max"),
             ([], "count_all")]
        )
        return pa.table({
            "event_type": g["event_type"],
            "s_p": g["k_sum"], "mn_p": g["k_min"],
            "mx_p": g["k_max"], "n_p": g["count_all"],
        })

    from ray.data.aggregate import Max, Min, Sum

    # event_type is low-cardinality: map-side partials + tiny groupby
    return (
        ext.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_p", alias_name="n_events"),
            Sum("s_p", alias_name="k_sum"),
            Min("mn_p", alias_name="k_min"),
            Max("mx_p", alias_name="k_max"),
        )
    )


ORACLE_PROPS_FIELD_STATS = r"""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max
FROM (
  SELECT event_type,
         CAST(NULLIF(regexp_extract(props, '"k":\s*([0-9]+)', 1), '')
              AS BIGINT) AS k
  FROM events
)
WHERE k IS NOT NULL
GROUP BY event_type
"""


ORACLE_EVENTS_HOURLY = """
SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents_sum
FROM events
GROUP BY 1, 2
"""


# ------------------------------------------------------- sessionize
SESSION_GAP_S = 1800


def sessionize(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """30-min-gap sessionization — the streaming-window custom operator.

    Partition by ``user_id`` (one shuffle), then a per-group ordered
    scan assigns session ids.  At 100 TB the same shape holds: the
    shuffle key is the session/entity key and each group is processed
    independently; skewed users would be range-split by time with
    boundary-session stitching.
    """
    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(np.int64)
        ))

    gap_us = SESSION_GAP_S * 1_000_000

    def assign_part(g: pa.Table) -> pa.Table:
        # ONE vectorized pass sessionizes EVERY user in the partition:
        # lexsort (user, ts, event_id), session breaks at user
        # boundaries or >gap deltas, sessions = contiguous runs —
        # per-user cumsum via a global cumsum minus its value at each
        # user's first row (the old per-user pandas map_groups paid a
        # Python frame + two pandas groupbys per user)
        if g.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "session_id": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "start_ts": pa.array([], pa.timestamp("us")),
                 "end_ts": pa.array([], pa.timestamp("us"))}
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).view(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        new_s = new_user | (gap > gap_us)
        cs = np.cumsum(new_s)
        ustart_cs = cs[np.flatnonzero(new_user)]
        # session_id restarts at 1 per user: cs minus the cs value at
        # the user's first row, +1
        per_user_base = np.repeat(
            ustart_cs,
            np.diff(np.r_[np.flatnonzero(new_user), uid.size]),
        )
        sess = cs - per_user_base + 1
        starts = np.flatnonzero(new_s)
        lens = np.diff(np.r_[starts, uid.size])
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_id": pa.array(sess[starts], pa.int64()),
                "n_events": pa.array(lens, pa.int64()),
                "start_ts": pa.array(
                    ts[starts].view("datetime64[us]")
                ),
                "end_ts": pa.array(
                    ts[starts + lens - 1].view("datetime64[us]")
                ),
            }
        )

    return (
        read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(assign_part, batch_format="pyarrow")
    )


ORACLE_SESSIONIZE = """
WITH x AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 1800 SECOND
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), y AS (
  SELECT user_id, event_id, ts,
         CAST(sum(new_s) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS session_id
  FROM x
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM y
GROUP BY user_id, session_id
"""


# ------------------------------------- cumulative window (running total)
def user_running_total(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(event_id, user_id, ts, running_cents, running_n): per-user
    cumulative value sum and event count in (ts, event_id) order — the
    CUMULATIVE window shape (ROWS UNBOUNDED PRECEDING), completing the
    window family (tumbling events_hourly, sliding events_sliding,
    session sessionize).  Same coarse-hash-partition transport as
    sessionize: one lexsorted vectorized pass per partition computes
    every user's prefix sums (global cumsum minus its value at each
    user's first row), exact in integer cents."""

    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(np.int64)
        ))

    def running_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "running_cents": pa.array([], pa.int64()),
                 "running_n": pa.array([], pa.int64())}
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).view(np.int64)
        cents_v = np.floor(
            g["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid_s, cents_s = uid[order], cents_v[order]
        new_user = np.r_[True, uid_s[1:] != uid_s[:-1]]
        cs = np.cumsum(cents_s)
        cn = np.arange(1, uid_s.size + 1, dtype=np.int64)
        ustarts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[ustarts, uid_s.size])
        # exclusive base at each user's first row
        base_c = np.repeat(cs[ustarts] - cents_s[ustarts], lens)
        base_n = np.repeat(cn[ustarts] - 1, lens)
        run_c = np.empty(uid_s.size, dtype=np.int64)
        run_n = np.empty(uid_s.size, dtype=np.int64)
        run_c[order] = cs - base_c
        run_n[order] = cn - base_n
        return pa.table(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "ts": g["ts"],
                "running_cents": pa.array(run_c, pa.int64()),
                "running_n": pa.array(run_n, pa.int64()),
            }
        )

    return (
        read(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(running_part, batch_format="pyarrow")
    )


ORACLE_USER_RUNNING_TOTAL = """
SELECT event_id, user_id, ts,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS running_cents,
       CAST(count(*) OVER w AS BIGINT) AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
"""


# ------------------------------------------- sliding window (custom op)
def events_sliding(sf_dir: str) -> ray.data.Dataset:
    """1-hour windows sliding every 30 min over the event stream.

    Ray Data has no sliding-window primitive; the composition is
    flat_map (each event → its 2 covering windows, as an integer
    window-start key) → two-phase aggregate.  Exact-integer keys and
    cents sums keep the oracle comparison bit-exact.
    """
    win_s, slide_s = 3600, 1800

    def expand(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // (slide_s * 1_000_000)) * slide_s
        k = win_s // slide_s
        starts = np.concatenate(
            [base - i * slide_s for i in range(k)]
        )
        etype = pa.concat_arrays(
            [b["event_type"].combine_chunks()
             if isinstance(b["event_type"], pa.ChunkedArray)
             else b["event_type"]] * k
        )
        cents = _floor_cents(b["value"])
        if isinstance(cents, pa.ChunkedArray):
            cents = cents.combine_chunks()
        cents_rep = pa.concat_arrays([cents] * k)
        return pa.table(
            {
                "window_start_s": pa.array(starts, pa.int64()),
                "event_type": etype,
                "value_cents": cents_rep,
            }
        )

    expanded = read(
        sf_dir, "events", columns=["ts", "event_type", "value"]
    ).map_batches(expand, batch_format="pyarrow")
    return two_phase_agg(expanded, ["window_start_s", "event_type"],
                         sums={"value_cents": "value_cents_sum"},
                         count_alias="n_events")


ORACLE_EVENTS_SLIDING = """
WITH w AS (
  SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS window_start_s,
         event_type, value
  FROM events
  UNION ALL
  SELECT CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT),
         event_type, value
  FROM events
)
SELECT window_start_s, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents_sum
FROM w
GROUP BY 1, 2
"""


# ---------------------------------------------- as-of join (custom op)
def latest_order_before_event(sf_dir: str, parts: int = 64,
                              users_broadcast_budget: int = 2_000_000
                              ) -> ray.data.Dataset:
    """As-of enrichment: each event gets the latest order date of its
    user at-or-before the event time, plus how many orders preceded it.

    Ray Data has no as-of join; the composition is the standard
    distributed one: tag-union both sides → one shuffle on the join key
    → per-key ordered sweep (vectorized ``searchsorted``, not a row
    loop).  The outputs (max date + count) are deterministic under
    date ties, so the DuckDB oracle compares exactly.  Raise ``parts``
    with key cardinality (each hash partition sweeps in one task).
    """
    events = read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    # Semi-join pushdown, threshold-switched (VERDICT r3 #5): only
    # orders of users that actually have events need to enter the
    # shuffle.  Under the budget the distinct-user set broadcasts once
    # (cheap, avoids shipping orders of event-less users); above it —
    # 10⁹ distinct users would not fit a broadcast — the pushdown is
    # skipped and the filter happens CO-PARTITIONED instead: orders
    # ride the same mix64(key) hash shuffle as events and partitions
    # drop order rows of event-less users locally in sweep_part (only
    # event rows are ever emitted).  The event row count (parquet
    # metadata, no scan) upper-bounds the distinct count, so the
    # switch costs nothing.
    if events.count() <= users_broadcast_budget:
        user_ids = sorted(int(u) for u in events.unique("user_id"))
        # Broadcast the Arrow value_set itself (built ONCE here), not a
        # Python set that every batch would re-sort and re-encode.
        uid_ref = ray.put(pa.array(user_ids, pa.int64()))

        def keep_evented(b: pa.Table, uids=None) -> pa.Table:
            uids = deref(uids)
            key = b["o_custkey"]
            if key.type != uids.type:
                key = pc.cast(key, uids.type)
            return b.filter(pc.is_in(key, value_set=uids))

        orders = orders.map_batches(
            keep_evented, fn_kwargs={"uids": uid_ref},
            batch_format="pyarrow",
        )

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b["user_id"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "ts": b["ts"],
                "side": pa.array(
                    np.zeros(b.num_rows, np.int8), pa.int8()
                ),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b["o_custkey"], pa.int64()),
                "event_id": pa.array(
                    np.full(b.num_rows, -1, np.int64), pa.int64()
                ),
                "ts": pc.cast(b["o_orderdate"], pa.timestamp("us")),
                "side": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            }
        )

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    # Coarse-hash partition by user, then ONE vectorized sweep per
    # partition via surrogate keys: per-partition-local user index u
    # and per-partition timestamp RANK r collapse to s = u·SPAN + r,
    # which orders (user, ts) pairs globally within the partition —
    # one sort + one searchsorted serves EVERY user at once (the old
    # per-user pandas map_groups paid a Python frame + frame
    # conversion per user).  Ranks, not raw microsecond offsets: with
    # a multi-year span (~10¹⁴ µs) the old u·span_µs + Δt surrogate
    # silently wrapped int64 past ~10⁵ users per partition (ADVICE r3
    # medium); SPAN = |distinct ts| + 1 keeps the product under
    # n_rows², overflow-checked explicitly below.
    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = b["key"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(
                np.int64
            )
        ))

    def sweep_part(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "ts": pa.array([], pa.timestamp("us")),
             "last_order_date": pa.array([], pa.timestamp("us")),
             "n_orders_before": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).view(np.int64)
        ev = side == 0
        if not ev.any():
            return empty
        ekey, ets = key[ev], ts[ev]
        okey, ots = key[~ev], ts[~ev]
        eids = g["event_id"].to_numpy(zero_copy_only=False)[ev]
        # rank-compress timestamps (monotonic, so <= is preserved)
        uts = np.unique(ts)
        span = uts.size + 1
        uk = np.unique(key)
        if uk.size * span >= 2**63:  # pragma: no cover - heap-bound
            raise AssertionError(
                "as-of surrogate would overflow int64: raise `parts` "
                f"(partition has {uk.size} users x {span} ts ranks)"
            )
        eu = np.searchsorted(uk, ekey).astype(np.int64)
        ou = np.searchsorted(uk, okey).astype(np.int64)
        es = eu * span + np.searchsorted(uts, ets)
        osur = np.sort(ou * span + np.searchsorted(uts, ots))
        pos = np.searchsorted(osur, es, side="right")
        base = np.searchsorted(osur, eu * span)
        n_before = (pos - base).astype(np.int64)
        last = np.full(eids.size, np.iinfo(np.int64).min)  # NaT
        nz = n_before > 0
        prev = osur[pos[nz] - 1]
        last[nz] = uts[prev % span]
        return pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "user_id": pa.array(ekey, pa.int64()),
                "ts": pa.array(ets.view("datetime64[us]")),
                "last_order_date": pa.array(
                    last.view("datetime64[us]")
                ),
                "n_orders_before": pa.array(n_before, pa.int64()),
            }
        )

    return both.map_batches(add_part, batch_format="pyarrow").groupby(
        "part"
    ).map_groups(sweep_part, batch_format="pyarrow")


ORACLE_ASOF = """
SELECT e.event_id, e.user_id, e.ts,
       CAST(max(o.o_orderdate) AS TIMESTAMP) AS last_order_date,
       count(o.o_orderdate) AS n_orders_before
FROM events e
LEFT JOIN orders o
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
GROUP BY 1, 2, 3
"""


# ------------------------------------------- last-writer-wins (A2/X5)
def latest_user_state(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """Per-user last event — the upsert/last-writer-wins merge of the
    reference (queries/lists.sql:1-9): groupby key, keep max by the
    total order (ts, event_id)."""
    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(np.int64)
        ))

    def lww_part(g: pa.Table) -> pa.Table:
        # last-writer row per user: lexsort (user, ts, event_id), the
        # last row of each user run wins — one vectorized task per
        # hash partition, not a pandas frame per user
        if g.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "last_event_type": pa.array([], pa.string()),
                 "last_value_cents": pa.array([], pa.int64()),
                 "last_ts": pa.array([], pa.timestamp("us"))}
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).view(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        last = np.r_[uid_s[1:] != uid_s[:-1], True]
        t = g.take(pa.array(order[last], pa.int64()))
        return pa.table(
            {
                "user_id": t["user_id"],
                "last_event_type": t["event_type"],
                "last_value_cents": pc.cast(
                    pc.floor(pc.multiply(t["value"], 100.0)),
                    pa.int64(),
                ),
                "last_ts": t["ts"],
            }
        )

    return (
        read(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lww_part, batch_format="pyarrow")
    )


ORACLE_LATEST_USER_STATE = """
SELECT user_id,
       event_type AS last_event_type,
       CAST(floor(value * 100) AS BIGINT) AS last_value_cents,
       ts AS last_ts
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY ts DESC, event_id DESC
) = 1
"""


# ----------------------------- multi-way join (TPC-H Q5 shape, J5+J2)
def revenue_by_nation(sf_dir: str, region: str = "ASIA",
                      year: int = 1996,
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Local-supplier revenue per nation for one region/year — the
    large×large distributed-join shape (TPC-H Q5) the broadcast
    operators above cannot express.

    Join strategy by side size (the 100 TB plan):

    - nation ⋈ region (25 × 5 rows) resolves driver-side into one
      broadcast lookup, like :func:`customer_rollup`;
    - supplier is the small fact-dim → broadcast suppkey→nationkey
      probe inside the lineitem projection (no shuffle);
    - orders ⋈ customer and lineitem ⋈ (orders⋈customer) are BOTH
      sides unbounded at scale → Ray's hash ``join`` co-partitions
      each pair by the join key (the only two all-to-all exchanges);
      filters (region, year) are pushed below the shuffles so only
      surviving rows move.

    Revenue is exact integer cents: floor(extprice · (1−disc) · 100)
    with the identical IEEE-double evaluation order on the SQL side.
    """
    import pyarrow.parquet as pq

    from .common import table_path

    if num_partitions is None:
        # join aggregators carry a fixed per-partition cost, so size
        # the partition count to the probe side: ~128 MB of lineitem
        # per partition (at 100 TB this lands in the hundreds; at the
        # test fixtures it stays at the 2-partition floor)
        num_partitions = max(
            2, os.path.getsize(table_path(sf_dir, "lineitem")) >> 27
        )

    nation = pq.read_table(table_path(sf_dir, "nation")).combine_chunks()
    reg = pq.read_table(table_path(sf_dir, "region")).combine_chunks()
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nat = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rkey))
    nat_keys = nat["n_nationkey"].combine_chunks()
    sup = pq.read_table(table_path(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    sup = sup.filter(pc.is_in(sup["s_nationkey"], value_set=nat_keys))
    lk_ref = ray.put({
        "nat_keys": nat_keys,
        "nat_names": nat["n_name"].combine_chunks(),
        "sup_keys": sup["s_suppkey"].combine_chunks(),
        "sup_nat": sup["s_nationkey"].combine_chunks(),
    })

    def cust_in_region(b: pa.Table, lk=None) -> pa.Table:
        lk = deref(lk)
        b = b.filter(pc.is_in(b["c_nationkey"], value_set=lk["nat_keys"]))
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int32()),
        })

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
                ).map_batches(cust_in_region, fn_kwargs={"lk": lk_ref},
                              batch_format="pyarrow")

    import datetime

    lo = pa.scalar(datetime.datetime(year, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(year + 1, 1, 1), pa.timestamp("us"))

    def orders_in_year(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                       pc.less(b["o_orderdate"], hi))
        b = b.filter(keep)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
        })

    orders = read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate"]
                  ).map_batches(orders_in_year, batch_format="pyarrow")
    oc = orders.join(cust, "inner", num_partitions,
                     on=("o_custkey",), right_on=("c_custkey",))

    def line_project(b: pa.Table, lk=None) -> pa.Table:
        lk = deref(lk)
        idx = pc.index_in(b["l_suppkey"], value_set=lk["sup_keys"])
        keep = pc.is_valid(idx)
        b, idx = b.filter(keep), idx.filter(keep)
        rev = pc.cast(pc.floor(pc.multiply(pc.multiply(
            b["l_extendedprice"], pc.subtract(
                pa.scalar(1.0), b["l_discount"])), 100.0)), pa.int64())
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "s_nationkey": lk["sup_nat"].take(idx),
            "revenue_cents": rev,
        })

    line = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(line_project, fn_kwargs={"lk": lk_ref},
                  batch_format="pyarrow")
    j = line.join(oc, "inner", num_partitions,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    def local_tag(b: pa.Table, lk=None) -> pa.Table:
        lk = deref(lk)
        b = b.filter(pc.equal(b["s_nationkey"], b["c_nationkey"]))
        nidx = pc.index_in(b["s_nationkey"], value_set=lk["nat_keys"])
        return pa.table({
            "nation_name": lk["nat_names"].take(nidx),
            "revenue_cents": b["revenue_cents"],
        })

    tagged = j.map_batches(local_tag, fn_kwargs={"lk": lk_ref},
                           batch_format="pyarrow")
    return two_phase_agg(tagged, ["nation_name"],
                         sums={"revenue_cents": "revenue_cents"})


# --------------------------------- iterative graph rank (fixed-point)
_RANK_ITERS = 3
_RANK_BASE = 1_000_000_000          # initial rank (fixed-point 1e9)
_RANK_TELEPORT = 150_000_000        # 0.15 in the same fixed-point


def link_rank(sf_dir: str, iters: int = _RANK_ITERS,
              num_partitions: int | None = None) -> ray.data.Dataset:
    """(node, rank): PageRank-style importance over the undirected
    customer↔part purchase graph — the ITERATIVE distributed
    algorithm shape (repeated join + aggregate until the iteration
    budget).  node = 2·custkey for customers, 2·partkey+1 for parts.

    Exactness: INTEGER fixed-point update
    ``r' = 150_000_000 + (85 · Σ_in (r_src // deg_src)) // 100`` —
    integer sums are order-independent and floor-divisions are exact,
    so the distributed result equals the DuckDB chained-CTE oracle bit
    for bit (a float PageRank could never hash-compare: float sums
    depend on reduction order).

    Scale shape per iteration: ranks ⋈ edges on src (both unbounded →
    distributed hash join), contribution projection, groupby(dst) sum;
    zero-contribution rows for every node ride the same union so
    in-edge-less nodes keep the teleport mass without a left join.
    Rank state is materialized per iteration (checkpointing the
    iteration, keeping the plan shallow).  Edges and degrees are
    computed once and reused across iterations.
    """
    if num_partitions is None:
        # one-time edge-build join; size partitions to the probe side
        # (see revenue_by_nation)
        from .common import table_path

        num_partitions = max(
            2, os.path.getsize(table_path(sf_dir, "lineitem")) >> 27
        )

    def edge_project(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "src": pc.multiply(b["o_custkey"], 2),
        })

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]
                  ).map_batches(edge_project, batch_format="pyarrow")

    def line_project(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "dst": pc.add(pc.multiply(b["l_partkey"], 2), 1),
        })

    line = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]
                ).map_batches(line_project, batch_format="pyarrow")
    pairs = line.join(orders, "inner", num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def both_dirs(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks() if isinstance(
            b["src"], pa.ChunkedArray) else b["src"]
        d = b["dst"].combine_chunks() if isinstance(
            b["dst"], pa.ChunkedArray) else b["dst"]
        return pa.table({
            "src": pa.concat_arrays([s, d]),
            "dst": pa.concat_arrays([d, s]),
        })

    # distinct undirected edges: hash-partition by edge key so ONE
    # vectorized task dedups every edge group in its partition (a
    # per-edge map_groups would pay a Python frame per edge — the
    # per-group analog of a row loop; same pattern as curate._CC_PARTS)
    dedup_parts = 64

    def edge_part(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            key = (s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   + d.astype(np.uint64))
        return b.append_column(
            "part", pa.array((key % np.uint64(dedup_parts)).astype(
                np.int64))
        )

    def dedup_part(g: pa.Table) -> pa.Table:
        s = g["src"].to_numpy(zero_copy_only=False)
        d = g["dst"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.table({
            "src": pa.array(uniq[:, 0], pa.int64()),
            "dst": pa.array(uniq[:, 1], pa.int64()),
        })

    edges = (
        pairs.map_batches(both_dirs, batch_format="pyarrow")
        .map_batches(edge_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
        .materialize()
    )

    # Iteration transport: NOT Ray's hash join (heavy aggregator
    # machinery per iteration) but the tag-union co-partitioned join
    # the as-of operator already uses — rank rows and edge rows ride
    # ONE shuffle keyed by mix64(src) % parts, and one vectorized task
    # per partition joins them (searchsorted) and partial-sums
    # contributions per dst, so the second (dst) groupby moves at most
    # |nodes| rows per partition, never |edges|.
    from .curate import _CC_PARTS  # same coarse-partition constant

    def with_part(b: pa.Table, col: str) -> pa.Array:
        from .text import mix64

        v = b[col].to_numpy(zero_copy_only=False)
        return pa.array(
            (mix64(v.view(np.uint64)) % np.uint64(_CC_PARTS)).astype(
                np.int64
            )
        )

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "part": with_part(b, "src"),
            "is_rank": pa.array(
                np.zeros(b.num_rows, dtype=np.int8)
            ),
            "a": b["src"],
            "b": b["dst"],
            "c": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
        })

    # repartition before materializing loop-invariant state: the
    # groupby/map_groups chain leaves hundreds of tiny blocks, and
    # per-iteration task overhead compounds on them (measured
    # superlinear iteration cost at 384 blocks for 35k rows)
    edges_tagged = edges.map_batches(
        tag_edges, batch_format="pyarrow"
    ).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        from .text import mix64

        g = pa.TableGroupBy(b, ["src"]).aggregate([([], "count_all")])
        v = g["src"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": g["src"], "d_p": g["count_all"],
            "part": pa.array(
                (mix64(v.view(np.uint64)) % np.uint64(_CC_PARTS))
                .astype(np.int64)
            ),
        })

    def deg_reduce(g: pa.Table) -> pa.Table:
        # vectorized partial-sum merge per hash partition (not Ray's
        # per-key aggregate — src cardinality is |nodes|)
        if g.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        s = g["src"].to_numpy(zero_copy_only=False)
        d = g["d_p"].to_numpy(zero_copy_only=False)
        us, inv = np.unique(s, return_inverse=True)
        sums = np.zeros(us.size, dtype=np.int64)
        np.add.at(sums, inv, d)
        return pa.table({"src": pa.array(us, pa.int64()),
                         "deg": pa.array(sums, pa.int64())})

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("part").map_groups(deg_reduce, batch_format="pyarrow")
        .materialize()
    )

    # rank state carries deg so no per-iteration degree join is needed
    ranks = degrees.map_batches(
        lambda b: pa.table({
            "node": b["src"],
            "r": pa.array(
                np.full(b.num_rows, _RANK_BASE, dtype=np.int64)
            ),
            "deg": b["deg"],
        }),
        batch_format="pyarrow",
    ).materialize()

    # zero-contribution rows keep in-edge-less nodes at teleport mass
    # AND carry deg through the dst aggregate (Max picks it up; edge
    # contributions carry deg=0)
    zero = degrees.map_batches(
        lambda b: pa.table({
            "dst": b["src"],
            "c": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "deg": b["deg"],
        }),
        batch_format="pyarrow",
    ).materialize()

    def tag_ranks(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False)
        d = b["deg"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": with_part(b, "node"),
            "is_rank": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "a": b["node"],
            "b": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "c": pa.array(r // d, pa.int64()),
        })

    def co_join(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "dst": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        is_rank = g["is_rank"].to_numpy(zero_copy_only=False) == 1
        a = g["a"].to_numpy(zero_copy_only=False)
        b_ = g["b"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        rsrc, rval = a[is_rank], c[is_rank]
        ro = np.argsort(rsrc)
        rsrc, rval = rsrc[ro], rval[ro]
        esrc, edst = a[~is_rank], b_[~is_rank]
        if esrc.size == 0 or rsrc.size == 0:
            return empty
        idx = np.searchsorted(rsrc, esrc)
        # every edge src has a rank row (nodes come FROM edges)
        contrib_v = rval[idx]
        # partial-sum per dst inside the task: the global groupby then
        # moves unique-dst rows, not edge rows
        ud, inv = np.unique(edst, return_inverse=True)
        sums = np.zeros(ud.size, dtype=np.int64)
        np.add.at(sums, inv, contrib_v)
        return pa.table({
            "dst": pa.array(ud, pa.int64()),
            "c": pa.array(sums, pa.int64()),
            "deg": pa.array(np.zeros(ud.size, dtype=np.int64)),
        })

    def dst_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        v = b["dst"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (mix64(v.view(np.uint64)) % np.uint64(_CC_PARTS)).astype(
                np.int64
            )
        ))

    def reduce_update(g: pa.Table) -> pa.Table:
        # vectorized per-dst (sum c, max deg) + the fixed-point rank
        # update fused into ONE task per hash partition — Ray's
        # generic multi-aggregate pays per-key overhead at 10^4+
        # groups, this pays one numpy pass (same rationale as the
        # hash-to-min star rounds, curate._star_part)
        if g.num_rows == 0:
            return pa.table({
                "node": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64()),
            })
        d = g["dst"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        dg = g["deg"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        sums = np.zeros(ud.size, dtype=np.int64)
        np.add.at(sums, inv, c)
        degs = np.zeros(ud.size, dtype=np.int64)
        np.maximum.at(degs, inv, dg)
        return pa.table({
            "node": pa.array(ud, pa.int64()),
            "r": pa.array(
                _RANK_TELEPORT + (85 * sums) // 100, pa.int64()
            ),
            "deg": pa.array(degs, pa.int64()),
        })

    # Coalesce width for the per-iteration rank state: the per-group
    # blocks out of reduce_update are tiny at toy scale (the round-3
    # pathology), but a hard-coded 8 would cap iteration parallelism
    # on a big cluster — derive from the cluster's CPU count instead
    # (VERDICT r3 #6; ray.cluster_resources sees every node).
    state_width = max(8, int(ray.cluster_resources().get("CPU", 8)))

    for _ in range(iters):
        tagged = ranks.map_batches(
            tag_ranks, batch_format="pyarrow"
        ).union(edges_tagged)
        ranks = (
            tagged.groupby("part")
            .map_groups(co_join, batch_format="pyarrow")
            .union(zero)
            .map_batches(dst_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(reduce_update, batch_format="pyarrow")
            .repartition(state_width)  # coalesce tiny per-group blocks
            .materialize()
        )
    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"], "r": b["r"]}),
        batch_format="pyarrow",
    )


def link_rank_oracle_sql(iters: int = _RANK_ITERS) -> str:
    """Chained-CTE power iteration mirroring the integer fixed-point
    update exactly (DuckDB sums BIGINT into HUGEINT; the 85·S//100 is
    evaluated in HUGEINT then wrapped back — values stay < 2**63)."""
    ctes = [f"""e0 AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM e),
r0 AS (SELECT node, {_RANK_BASE}::BIGINT AS r FROM nodes)"""]
    for i in range(iters):
        ctes.append(f"""r{i + 1} AS (
  SELECT n.node,
         CAST({_RANK_TELEPORT} + (85 * COALESCE(s.s, 0)) // 100
              AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.r // deg.d) AS s
    FROM e
    JOIN r{i} r ON r.node = e.src
    JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) s USING (node)
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r FROM r{iters}"
    )


ORACLE_REVENUE_BY_NATION = """
SELECT n_name AS nation_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------- ordered funnel (sequence)
FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 3 * 86400


def event_funnel(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS,
                 window_s: int = FUNNEL_WINDOW_S,
                 parts: int = 64) -> ray.data.Dataset:
    """(user_id, stage, first_ts, last_ts): ordered multi-step funnel —
    how far each user progressed through ``steps`` (strictly increasing
    timestamps, greedy earliest completion) within ``window_s`` of the
    first step.  The sequence-analytics operator missing from the plain
    window family: sessionize groups by gap, this matches an ORDERED
    event-type pattern per user.

    Greedy-earliest semantics (deterministic, SQL-expressible):
    t1 = min ts of step-1 events; t_{i+1} = min ts of step-(i+1) events
    with ts > t_i.  The t_i are strictly increasing, so the window
    check (t_i - t1 <= window) is monotone and the reached stage is a
    simple count.  Users with no step-1 event don't appear.

    Scale shape: type-filter + hash-partition by user (ONE shuffle of
    only the funnel-relevant rows), then a per-partition vectorized
    sweep — one ``np.minimum.at`` per step over compacted user slots,
    never a per-user loop.  Same transport as sessionize; raise
    ``parts`` with user cardinality.
    """
    step_list = list(steps)

    def tag_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        code = pc.index_in(b["event_type"],
                           pa.array(step_list, pa.string()))
        keep = pc.is_valid(code)
        t = b.filter(keep)
        code = pc.cast(pc.drop_null(code), pa.int64())
        k = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"],
            "code": code,
            "part": pa.array(
                (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64
                )
            ),
        })

    n_steps = len(step_list)
    window_us = np.int64(window_s) * 1_000_000
    sentinel = np.iinfo(np.int64).max

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "stage": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.timestamp("us")),
                "last_ts": pa.array([], pa.timestamp("us")),
            })
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        code = g["code"].to_numpy(zero_copy_only=False)
        uu, idx = np.unique(uid, return_inverse=True)
        t = np.full((n_steps, uu.size), sentinel, dtype=np.int64)
        for i in range(n_steps):
            m = code == i
            if i == 0:
                np.minimum.at(t[0], idx[m], ts[m])
            else:
                # prev==sentinel ⇒ ts > prev impossible ⇒ t[i] only
                # set where the prior step completed
                m = m & (ts > t[i - 1][idx])
                np.minimum.at(t[i], idx[m], ts[m])
        started = t[0] != sentinel
        # stage = count of steps reached within the window (monotone:
        # t_i strictly increase, so the first failure stops the count)
        reached = (t != sentinel) & (t - t[0] <= window_us)
        stage = np.cumprod(reached, axis=0).sum(axis=0)
        last = t[np.maximum(stage - 1, 0), np.arange(uu.size)]
        return pa.table({
            "user_id": pa.array(uu[started], pa.int64()),
            "stage": pa.array(stage[started], pa.int64()),
            "first_ts": pa.array(
                t[0][started].view("datetime64[us]")),
            "last_ts": pa.array(last[started].view("datetime64[us]")),
        })

    return (
        read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
        .map_batches(tag_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
    )


ORACLE_EVENT_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id,
       CAST(CASE
         WHEN t3 IS NOT NULL
              AND t3 - t1 <= INTERVAL {FUNNEL_WINDOW_S} SECOND THEN 3
         WHEN t2 IS NOT NULL
              AND t2 - t1 <= INTERVAL {FUNNEL_WINDOW_S} SECOND THEN 2
         ELSE 1 END AS BIGINT) AS stage,
       t1 AS first_ts,
       CASE
         WHEN t3 IS NOT NULL
              AND t3 - t1 <= INTERVAL {FUNNEL_WINDOW_S} SECOND THEN t3
         WHEN t2 IS NOT NULL
              AND t2 - t1 <= INTERVAL {FUNNEL_WINDOW_S} SECOND THEN t2
         ELSE t1 END AS last_ts
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


# ----------------------------------------------- per-key top-n (window)
def orders_topn_per_customer(sf_dir: str, n: int = 3,
                             parts: int = 64) -> ray.data.Dataset:
    """(o_custkey, rn, o_orderkey, price_cents): each customer's top-n
    orders by (o_totalprice DESC, o_orderkey ASC) — the ROW_NUMBER()
    windowed top-n shape over a HIGH-cardinality key (every customer),
    complementing top_customers' global sort/limit.

    Scale shape: hash-partition by customer (one shuffle), then ONE
    lexsort per partition ranks every customer's orders at once —
    segment starts via the key-change mask, rank = position minus the
    segment start, no per-key work.  Raise ``parts`` with customer
    cardinality.
    """
    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(
                np.int64
            )
        ))

    def topn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "o_custkey": pa.array([], pa.int64()),
                "rn": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "price_cents": pa.array([], pa.int64()),
            })
        cust = g["o_custkey"].to_numpy(zero_copy_only=False)
        okey = g["o_orderkey"].to_numpy(zero_copy_only=False)
        price = g["o_totalprice"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -price, cust))
        cust, okey, price = cust[order], okey[order], price[order]
        new_key = np.r_[True, cust[1:] != cust[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(new_key, np.arange(cust.size), 0)
        )
        rn = np.arange(cust.size) - seg_start + 1
        keep = rn <= n
        return pa.table({
            "o_custkey": pa.array(cust[keep], pa.int64()),
            "rn": pa.array(rn[keep], pa.int64()),
            "o_orderkey": pa.array(okey[keep], pa.int64()),
            "price_cents": pa.array(
                np.floor(price[keep] * 100.0).astype(np.int64),
                pa.int64(),
            ),
        })

    return (
        read(sf_dir, "orders",
             columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topn, batch_format="pyarrow")
    )


ORACLE_ORDERS_TOPN = """
SELECT o_custkey, rn, o_orderkey, price_cents FROM (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
"""


# -------------------------------------- percentile clip (winsorize)
_WINS_LO, _WINS_HI = 0.05, 0.95


def price_winsorize(sf_dir: str) -> ray.data.Dataset:
    """(l_returnflag, l_linestatus, n_rows, n_low, n_high,
    sum_wins_cents): per-group discrete-percentile winsorization of
    l_extendedprice — the outlier-trim aggregate a quality pipeline
    runs before normalizing numeric features.

    Boundaries are DISCRETE percentiles (actual order statistics,
    numpy ``inverted_cdf`` == DuckDB ``percentile_disc``: element at
    ceil(p*n)-1) so lo/hi are exact data values and both engines clip
    against identical doubles; the clipped sum is exact integer cents.

    Two passes, both streaming: (1) per-group boundary quantiles —
    the group key is 6-valued so a per-group gather is partition-sized
    (at 100 TB swap in a distributed selection / t-digest here);
    (2) boundaries broadcast into a map-side clip + cents projection,
    reduced by the canonical two-phase partial aggregate.
    """
    bounds_ds = (
        read(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(_wins_bounds, batch_format="pyarrow")
    )
    bounds = {
        (r["l_returnflag"], r["l_linestatus"]): (r["lo"], r["hi"])
        for r in bounds_ds.take_all()  # ≤ |rf|x|ls| rows: tiny
    }

    def clip_project(b: pa.Table) -> pa.Table:
        rf = b["l_returnflag"].to_numpy(zero_copy_only=False)
        ls = b["l_linestatus"].to_numpy(zero_copy_only=False)
        x = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        lo = np.empty(x.size)
        hi = np.empty(x.size)
        # group key is 6-valued: per-value masks, not per-row lookups
        for (kr, kl), (blo, bhi) in bounds.items():
            m = (rf == kr) & (ls == kl)
            lo[m], hi[m] = blo, bhi
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "low": pa.array((x < lo).astype(np.int64), pa.int64()),
            "high": pa.array((x > hi).astype(np.int64), pa.int64()),
            "wins_cents": pa.array(
                np.floor(np.minimum(np.maximum(x, lo), hi) * 100.0)
                .astype(np.int64), pa.int64()),
        })

    src = read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus",
                        "l_extendedprice"])
    return two_phase_agg(
        src.map_batches(clip_project, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sums={"low": "n_low", "high": "n_high",
              "wins_cents": "sum_wins_cents"},
        count_alias="n_rows",
    )


def _wins_bounds(g: pa.Table) -> pa.Table:
    if g.num_rows == 0:
        return pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "l_linestatus": pa.array([], pa.string()),
            "lo": pa.array([], pa.float64()),
            "hi": pa.array([], pa.float64()),
        })
    x = np.sort(g["l_extendedprice"].to_numpy(zero_copy_only=False))
    lo = x[max(min(int(np.ceil(_WINS_LO * x.size)) - 1, x.size - 1), 0)]
    hi = x[max(min(int(np.ceil(_WINS_HI * x.size)) - 1, x.size - 1), 0)]
    return pa.table({
        "l_returnflag": g["l_returnflag"][:1],
        "l_linestatus": g["l_linestatus"][:1],
        "lo": pa.array([lo], pa.float64()),
        "hi": pa.array([hi], pa.float64()),
    })


ORACLE_PRICE_WINSORIZE = f"""
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         percentile_disc({_WINS_LO}) WITHIN GROUP
           (ORDER BY l_extendedprice) AS lo,
         percentile_disc({_WINS_HI}) WITHIN GROUP
           (ORDER BY l_extendedprice) AS hi
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT l.l_returnflag, l.l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high,
       CAST(sum(CAST(floor(
         least(greatest(l_extendedprice, lo), hi) * 100)
         AS BIGINT)) AS BIGINT) AS sum_wins_cents
FROM lineitem l
JOIN b USING (l_returnflag, l_linestatus)
GROUP BY l.l_returnflag, l.l_linestatus
"""


# -------------------------------------------- range join (custom op)
_ATTR_WIN_US = 3_600 * 1_000_000  # 1-hour attribution window


def attribution_window(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(event_id, user_id, n_views_1h, n_clicks_1h): for every
    purchase event, how many view / click events the SAME user fired
    in the hour before it (``t - 1h <= e2.ts < t``) — the RANGE /
    interval join, the ad-attribution shape Ray Data has no primitive
    for.

    Composition (same skeleton as the as-of join above): map-side
    filter to the three participating event types, ONE hash shuffle on
    the user key, then a single vectorized sweep per partition.  Range
    bounds use rank-compressed surrogates like the as-of sweep, with
    one twist: the lower bound ``t - 1h`` is not an existing timestamp,
    so the rank vocabulary is ``unique(ts ∪ purchase_ts - 1h)`` — both
    bounds are then exact members and two ``searchsorted`` calls per
    side count the window without any per-user loop.  Partition
    blowup is bounded by the window width x per-user rate (pairs are
    never materialized — only counts).  Raise ``parts`` with user
    cardinality.
    """
    events = read(sf_dir, "events",
                  columns=["event_id", "ts", "user_id", "event_type"])

    def tag(b: pa.Table) -> pa.Table:
        from .text import mix64

        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["purchase", "view", "click"]))
        b = b.filter(keep)
        # side: 0 = purchase (probe), 1 = view, 2 = click (build)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        side = np.where(et == "purchase", 0,
                        np.where(et == "view", 1, 2)).astype(np.int8)
        k = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "ts": b["ts"],
            "side": pa.array(side, pa.int8()),
            "part": pa.array(
                (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    def sweep(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "n_views_1h": pa.array([], pa.int64()),
            "n_clicks_1h": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        probe = side == 0
        if not probe.any():
            return empty
        pkey, pts = key[probe], ts[probe]
        eids = g["event_id"].to_numpy(zero_copy_only=False)[probe]
        # rank vocabulary includes BOTH window bounds exactly
        uts = np.unique(np.concatenate([ts, pts - _ATTR_WIN_US]))
        span = uts.size + 1
        uk = np.unique(key)
        if uk.size * span >= 2**63:  # pragma: no cover - heap-bound
            raise AssertionError(
                "range-join surrogate would overflow int64: raise "
                f"`parts` ({uk.size} users x {span} ts ranks)")
        pu = np.searchsorted(uk, pkey).astype(np.int64)
        lo = pu * span + np.searchsorted(uts, pts - _ATTR_WIN_US)
        hi = pu * span + np.searchsorted(uts, pts)  # rank(t): excludes t
        out = {"event_id": pa.array(eids, pa.int64()),
               "user_id": pa.array(pkey, pa.int64())}
        for s, name in ((1, "n_views_1h"), (2, "n_clicks_1h")):
            m = side == s
            su = np.searchsorted(uk, key[m]).astype(np.int64)
            sur = np.sort(su * span + np.searchsorted(uts, ts[m]))
            out[name] = pa.array(
                (np.searchsorted(sur, hi, side="left")
                 - np.searchsorted(sur, lo, side="left")).astype(
                     np.int64), pa.int64())
        return pa.table(out)

    return (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
    )


ORACLE_ATTRIBUTION = """
SELECT p.event_id, p.user_id,
       CAST(count(*) FILTER (WHERE e.event_type = 'view')
            AS BIGINT) AS n_views_1h,
       CAST(count(*) FILTER (WHERE e.event_type = 'click')
            AS BIGINT) AS n_clicks_1h
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.event_type IN ('view', 'click')
 AND e.ts >= p.ts - INTERVAL 1 HOUR
 AND e.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
"""


# ------------------------------------------------- pivot / crosstab
# The pivot's column set is a DECLARED schema, not discovered from the
# data: a streaming engine cannot grow output columns mid-stream, and
# at 100 TB a discovery pass would be a full extra read.  (Same
# contract as SQL PIVOT ... IN (...).)
PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view,
    value_cents_total): per-user crosstab of event counts by type plus
    the exact-cents value total — the long→wide PIVOT shape.

    Map-side one-hot projection (one int64 column per declared type)
    collapses each block via the Arrow group-by partial, then the
    coarse hash-partition merge reduces per user — user_id is a
    HIGH-cardinality key, so this rides ``hash_keyed_agg`` (one
    shuffle of partials, vectorized numpy merge, no per-key work).
    """
    from .common import hash_keyed_agg

    src = read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])

    def onehot(b: pa.Table) -> pa.Table:
        cols = {"user_id": pc.cast(b["user_id"], pa.int64())}
        for t in PIVOT_EVENT_TYPES:
            cols[f"is_{t}"] = pc.cast(
                pc.equal(b["event_type"], t), pa.int64())
        cols["value_cents"] = _floor_cents(b["value"])
        return pa.table(cols)

    return hash_keyed_agg(
        src.map_batches(onehot, batch_format="pyarrow"),
        key="user_id",
        sums={**{f"is_{t}": f"n_{t}" for t in PIVOT_EVENT_TYPES},
              "value_cents": "value_cents_total"},
        parts=parts,
    )


ORACLE_EVENT_PIVOT = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
            AS value_cents_total
FROM events
GROUP BY 1
"""


# ------------------------------------------------------- histogram
_HIST_BIN_CENTS = 25_000 * 100  # fixed 25k-currency-unit bins


def price_histogram(sf_dir: str) -> ray.data.Dataset:
    """(bin_id, n_orders, sum_price_cents): fixed-width histogram of
    order totals — the distribution-profiling aggregate.  Bin edges
    are a DECLARED spec (bin = floor(price_cents / width)), not
    data-driven, so the whole histogram is one map-side projection +
    the canonical two-phase aggregate: no extremes pass, no gather.
    """
    src = read(sf_dir, "orders", columns=["o_totalprice"])

    def project(b: pa.Table) -> pa.Table:
        c = _floor_cents(b["o_totalprice"])
        return pa.table({
            "bin_id": pc.cast(
                pc.floor(pc.divide(pc.cast(c, pa.float64()),
                                   float(_HIST_BIN_CENTS))), pa.int64()),
            "price_cents": c,
        })

    return two_phase_agg(
        src.map_batches(project, batch_format="pyarrow"),
        keys=["bin_id"],
        sums={"price_cents": "sum_price_cents"},
        count_alias="n_orders",
    )


ORACLE_PRICE_HISTOGRAM = f"""
SELECT CAST(floor(CAST(floor(o_totalprice * 100) AS BIGINT)
            / {_HIST_BIN_CENTS}.0) AS BIGINT) AS bin_id,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders
GROUP BY 1
"""


# --------------------------------------- robust outliers (median/MAD)
_MAD_CUT = 3.0


def mad_outliers(sf_dir: str) -> ray.data.Dataset:
    """(o_orderpriority, med, mad, n_rows, n_outliers): per-group
    robust outlier profile of order totals — discrete median, median
    absolute deviation, and the count beyond ``med ± 3·mad`` — the
    robust-statistics screen a quality pipeline runs where winsorize's
    percentile clip is too blunt.

    Exactness: both med and mad are DISCRETE medians (actual data /
    derived values, numpy ``inverted_cdf`` == DuckDB
    ``percentile_disc``), and |x − med| on identical float64 inputs is
    the identical IEEE result in both engines, so the float columns
    compare bit-for-bit.  Same two-pass scale shape as
    price_winsorize: the group key is 5-valued so the per-group gather
    is partition-sized (swap in distributed selection at 100 TB);
    bounds then broadcast into a map-side count reduced two-phase.
    """
    def bounds(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "o_orderpriority": pa.array([], pa.string()),
                "med": pa.array([], pa.float64()),
                "mad": pa.array([], pa.float64()),
            })
        x = np.sort(g["o_totalprice"].to_numpy(zero_copy_only=False))
        med = x[max(int(np.ceil(0.5 * x.size)) - 1, 0)]
        d = np.sort(np.abs(x - med))
        mad = d[max(int(np.ceil(0.5 * d.size)) - 1, 0)]
        return pa.table({
            "o_orderpriority": g["o_orderpriority"][:1],
            "med": pa.array([med], pa.float64()),
            "mad": pa.array([mad], pa.float64()),
        })

    bounds_tbl = {
        r["o_orderpriority"]: (r["med"], r["mad"])
        for r in (
            read(sf_dir, "orders",
                 columns=["o_orderpriority", "o_totalprice"])
            .groupby("o_orderpriority")
            .map_groups(bounds, batch_format="pyarrow")
        ).take_all()  # <= |priorities| rows: tiny
    }

    def flag(b: pa.Table) -> pa.Table:
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        x = b["o_totalprice"].to_numpy(zero_copy_only=False)
        out = np.zeros(x.size, dtype=np.int64)
        for p, (med, mad) in bounds_tbl.items():
            m = pr == p
            out[m] = (np.abs(x[m] - med) > _MAD_CUT * mad).astype(
                np.int64)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "is_outlier": pa.array(out, pa.int64()),
        })

    src = read(sf_dir, "orders",
               columns=["o_orderpriority", "o_totalprice"])
    counted = two_phase_agg(
        src.map_batches(flag, batch_format="pyarrow"),
        keys=["o_orderpriority"],
        sums={"is_outlier": "n_outliers"},
        count_alias="n_rows",
    )

    def attach_bounds(b: pa.Table) -> pa.Table:
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        med = np.array([bounds_tbl[p][0] for p in pr], np.float64)
        mad = np.array([bounds_tbl[p][1] for p in pr], np.float64)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "med": pa.array(med, pa.float64()),
            "mad": pa.array(mad, pa.float64()),
            "n_rows": b["n_rows"],
            "n_outliers": b["n_outliers"],
        })

    return counted.map_batches(attach_bounds, batch_format="pyarrow")


ORACLE_MAD_OUTLIERS = f"""
WITH m AS (
  SELECT o_orderpriority,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
             AS med
  FROM orders GROUP BY 1
), d AS (
  SELECT o.o_orderpriority, m.med,
         abs(o.o_totalprice - m.med) AS dev, o.o_totalprice
  FROM orders o JOIN m USING (o_orderpriority)
), b AS (
  SELECT o_orderpriority, any_value(med) AS med,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
  FROM d GROUP BY 1
)
SELECT d.o_orderpriority, b.med, b.mad,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN abs(d.o_totalprice - b.med)
                          > {_MAD_CUT} * b.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN b USING (o_orderpriority)
GROUP BY 1, 2, 3
"""


# ------------------------------------- ordered aggregation (sequence)
def user_event_sequence(sf_dir: str, parts: int = 64
                        ) -> ray.data.Dataset:
    """(user_id, n_events, event_seq): each user's event types joined
    in (ts, event_id) order — the ORDERED string aggregation a
    sessionization / behavior-modeling pipeline emits as training
    text.

    Scale shape: one hash shuffle on the user key, then one lexsort
    per partition; the per-user join is Arrow-native — list offsets
    from the segment-boundary mask + ``binary_join`` — no per-user
    Python.  Raise ``parts`` with user cardinality.
    """
    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(k, pa.int64()),
            "ts": b["ts"],
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "event_type": b["event_type"],
            "part": pa.array(
                (mix64(k.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    def join_seq(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "event_seq": pa.array([], pa.string()),
            })
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        et = g["event_type"].take(pa.array(order, pa.int64()))
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        new_u = np.r_[True, uid_s[1:] != uid_s[:-1]]
        starts = np.flatnonzero(new_u)
        counts = np.diff(np.r_[starts, uid_s.size])
        offsets = pa.array(np.r_[0, np.cumsum(counts)], pa.int32())
        lists = pa.ListArray.from_arrays(offsets, et)
        return pa.table({
            "user_id": pa.array(uid_s[starts], pa.int64()),
            "n_events": pa.array(counts.astype(np.int64), pa.int64()),
            "event_seq": pc.binary_join(lists, ","),
        })

    return (
        read(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(join_seq, batch_format="pyarrow")
    )


ORACLE_USER_EVENT_SEQUENCE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq
FROM events
GROUP BY 1
"""


# ------------------------------- global analytic rank without a sort
def doc_percentile_rank(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars, pct_rank): each document's exact
    ``percent_rank() OVER (ORDER BY n_chars)`` across the WHOLE corpus
    — the global windowed analytic, computed without a global sort.

    Scale shape: percent_rank needs only (#rows strictly below) / (N-1),
    so a value histogram (map-side-partial combiner over ``n_chars``,
    bounded by value cardinality, not corpus size) builds the exact CDF
    once; the (sorted values -> count-below) arrays broadcast via
    ``ray.put``, and a second streaming pass ranks every row with one
    vectorized ``searchsorted`` — corpus rows are never exchanged.
    The same two-pass CDF pattern generalizes to ntile / cume_dist.
    """
    hist = two_phase_agg(
        read(sf_dir, "documents", columns=["n_chars"]),
        ["n_chars"], count_alias="cnt",
    )
    from .common import collect_small

    h = collect_small(hist, pa.schema(
        [("n_chars", pa.int64()), ("cnt", pa.int64())]))
    vals = h["n_chars"].to_numpy(zero_copy_only=False)
    cnts = h["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    below = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    total = int(cnts.sum())
    denom = float(total - 1) if total > 1 else 1.0
    cdf_ref = ray.put((vals, below))

    def rank(b: pa.Table, *, cdf) -> pa.Table:
        sv, blw = deref(cdf)
        x = b["n_chars"].to_numpy(zero_copy_only=False)
        pr = blw[np.searchsorted(sv, x)] / denom
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chars": b["n_chars"],
            "pct_rank": pa.array(pr, pa.float64()),
        })

    return read(sf_dir, "documents", columns=["doc_id", "n_chars"]
                ).map_batches(rank, fn_kwargs={"cdf": cdf_ref},
                              batch_format="pyarrow")


ORACLE_DOC_PERCENTILE_RANK = """
SELECT doc_id, n_chars,
       percent_rank() OVER (ORDER BY n_chars) AS pct_rank
FROM documents
"""


# -------------------- exact order statistics on a continuous domain
def value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """(pct, value): EXACT discrete percentiles of ``events.value`` — a
    CONTINUOUS domain, where token_quantiles' bounded-integer histogram
    cannot enumerate values.  Thin wrapper over
    :func:`common.exact_quantiles` (the shared distributed-selection
    primitive: min/max pass → binned counts → rank-bin re-scan; no
    global sort).  Result values are untouched input doubles, so the
    DuckDB ``percentile_disc`` oracle compares bit-exactly.
    """
    from .common import exact_quantiles

    qs = exact_quantiles(
        read(sf_dir, "events", columns=["value"]), "value",
        (25, 50, 75, 99))
    return ray.data.from_arrow(pa.table({
        "pct": pa.array([p for p, _ in qs], pa.int64()),
        "value": pa.array([v for _, v in qs], pa.float64()),
    }))


def value_quantiles_oracle_sql() -> str:
    parts = [
        f"SELECT CAST({p} AS BIGINT) AS pct, "
        f"percentile_disc({p / 100}) WITHIN GROUP (ORDER BY value) "
        f"AS value FROM events"
        for p in (25, 50, 75, 99)
    ]
    return " UNION ALL ".join(parts)


# ------------------------------------------------- cohort retention
def retention_cohorts(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """Daily cohort-retention matrix: users are cohorted by the day of
    their FIRST event; each (cohort_day, activity_day) cell counts the
    distinct cohort members active that day.

    The naive plan is two shuffles (distinct (user, day), then a
    user-keyed join back to the per-user min).  Here both collapse into
    ONE ``mix64(user) % parts`` exchange: per-block Arrow ``group_by``
    partials shrink the stream to distinct (user, day) pairs before
    the shuffle, and because every row of a user lands in one
    partition, the cohort anchor (per-user min day) and the cell
    counts are both computed locally per partition with numpy — no
    second exchange, no join.  Raise ``parts`` with user cardinality
    (a partition holds ~|users|/parts distinct pairs, never raw rows).
    """
    from .common import collect_small  # noqa: F401 (parity with siblings)
    from whakoom_webscrapper_ray.pipelines.text import mix64

    ev = read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = (
            us.astype("datetime64[us]").astype("datetime64[D]")
            .astype(np.int64)
        )
        t = pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "day": pa.array(day, pa.int64()),
        })
        g = pa.TableGroupBy(t, ["user_id", "day"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": g["user_id"],
            "day": g["day"],
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64
                )
            ),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "cohort_m": pa.array([], pa.int64()),
            "activity_m": pa.array([], pa.int64()),
            "n_p": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        m = g["day"].to_numpy(zero_copy_only=False)
        # cross-block dedup of (user, day), sorted so each user's
        # first row carries their minimum (= cohort) day
        order = np.lexsort((m, u))
        u, m = u[order], m[order]
        keep = np.ones(u.size, dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (m[1:] != m[:-1])
        u, m = u[keep], m[keep]
        first = np.ones(u.size, dtype=bool)
        first[1:] = u[1:] != u[:-1]
        cohort = m[first][np.cumsum(first) - 1]
        # days-since-epoch stay < 2^20 until year ~4840; pack the
        # (cohort, day) cell into one int64 for a single np.unique
        assert m.size == 0 or (m.max() < (1 << 20) and m.min() >= 0)
        pack = (cohort << 21) | m
        cells, cnt = np.unique(pack, return_counts=True)
        return pa.table({
            "cohort_m": pa.array(cells >> 21, pa.int64()),
            "activity_m": pa.array(cells & ((1 << 21) - 1), pa.int64()),
            "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )
    agg = two_phase_agg(cells, ["cohort_m", "activity_m"],
                        sums={"n_p": "n_users"})

    def finalize(b: pa.Table) -> pa.Table:
        def ts(col: pa.ChunkedArray) -> pa.Array:
            v = (col.to_numpy(zero_copy_only=False)
                 .astype("datetime64[D]").astype("datetime64[us]"))
            return pa.array(v, pa.timestamp("us"))

        return pa.table({
            "cohort_day": ts(b["cohort_m"]),
            "activity_day": ts(b["activity_m"]),
            "n_users": b["n_users"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


ORACLE_RETENTION_COHORTS = """
WITH um AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS activity_day
  FROM events
),
c AS (
  SELECT user_id, min(activity_day) AS cohort_day
  FROM um GROUP BY user_id
)
SELECT c.cohort_day, um.activity_day, count(*) AS n_users
FROM um JOIN c USING (user_id)
GROUP BY 1, 2
"""


# ------------------------------------------- rolling active users
def rolling_active_users(sf_dir: str, window_days: int = 7,
                         parts: int = 64) -> ray.data.Dataset:
    """Rolling window_days-day active-user count per day (the WAU
    curve): for each anchor day, how many distinct users had at least
    one event in the ``window_days`` days ending at that anchor.

    Sliding distinct-count is the shape Ray Data's aggregates cannot
    express directly (COUNT DISTINCT over overlapping windows).  The
    composition keeps it to ONE user-keyed exchange: per-block distinct
    (user, day) partials shrink the stream before the shuffle, then —
    because all rows of a user land in one partition — each partition
    expands activity days to their ``window_days`` covering anchors,
    dedups (user, anchor) LOCALLY (a user active on consecutive days
    covers overlapping anchor ranges), and emits per-anchor partial
    counts.  A tiny two-phase sum finishes; no row ever carries a user
    id past the first exchange.
    """
    from whakoom_webscrapper_ray.pipelines.text import mix64

    ev = read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = (
            us.astype("datetime64[us]").astype("datetime64[D]")
            .astype(np.int64)
        )
        t = pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "day": pa.array(day, pa.int64()),
        })
        g = pa.TableGroupBy(t, ["user_id", "day"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": g["user_id"],
            "day": g["day"],
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64
                )
            ),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "anchor_d": pa.array([], pa.int64()),
                "n_p": pa.array([], pa.int64()),
            })
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        # local user index so the (user, anchor) cell packs into int64
        # (days-since-epoch < 2^20 until year ~4840)
        _, uidx = np.unique(u, return_inverse=True)
        assert d.size == 0 or (d.max() + window_days < (1 << 20)
                               and d.min() >= 0)
        # expand each activity day to its covering anchors, dedup cells
        off = np.arange(window_days, dtype=np.int64)
        pack = ((uidx.astype(np.int64) << 21)[:, None]
                | (d[:, None] + off[None, :])).ravel()
        cells = np.unique(pack)
        anchors, cnt = np.unique(cells & ((1 << 21) - 1),
                                 return_counts=True)
        return pa.table({
            "anchor_d": pa.array(anchors, pa.int64()),
            "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = two_phase_agg(
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow"),
        ["anchor_d"], sums={"n_p": "active_users"},
    )

    def finalize(b: pa.Table) -> pa.Table:
        v = (b["anchor_d"].to_numpy(zero_copy_only=False)
             .astype("datetime64[D]").astype("datetime64[us]"))
        return pa.table({
            "day": pa.array(v, pa.timestamp("us")),
            "active_users": b["active_users"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


ORACLE_ROLLING_ACTIVE_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
w AS (
  SELECT DISTINCT user_id, d + o * INTERVAL 1 DAY AS day
  FROM ud CROSS JOIN (SELECT UNNEST([0, 1, 2, 3, 4, 5, 6]) AS o)
)
SELECT day, count(*) AS active_users FROM w GROUP BY 1
"""


# ------------------------------------------- frequent co-occurring pairs
def _copurchase_pair_counts(sf_dir: str, parts: int) -> ray.data.Dataset:
    """(pair, n_orders): co-occurrence counts of every part pair that
    shares at least one order — the shared pair-mining core of
    :func:`copurchase_pairs` (top-k report) and :func:`triangle_topk`
    (graph construction).  ``pair`` packs the two 31-bit part keys as
    ``lo << 32 | hi`` with lo < hi.

    Pair mining is a self-join the engine never runs as a join: rows
    hash-partition by order key (ONE exchange of distinct
    (order, part) partials), each partition expands its orders' pairs
    with a vectorized segment-pair kernel (np.repeat over per-order
    fanout — no Python loop over orders), packs each (a < b) pair into
    one int64, and pre-counts locally.  Pair totals then ride
    ``hash_keyed_agg`` (pair-keyed partitions).  Per-order fanout
    bounds the expansion (C(lines,2) ≤ ~136 at TPC-H shape); a skewed
    giant order would need the same cap treatment as the LSH buckets —
    asserted.
    """
    from .common import hash_keyed_agg
    from whakoom_webscrapper_ray.pipelines.text import mix64

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            b.select(["l_orderkey", "l_partkey"]),
            ["l_orderkey", "l_partkey"],
        ).aggregate([])
        o = g["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o": g["l_orderkey"],
            "p": g["l_partkey"],
            "part": pa.array(
                (mix64(o.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64
                )
            ),
        })

    def pairs_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "pair": pa.array([], pa.int64()),
            "n_p": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        o = g["o"].to_numpy(zero_copy_only=False)
        p = g["p"].to_numpy(zero_copy_only=False)
        assert p.size == 0 or (p.max() < (1 << 31) and p.min() >= 0)
        # sort by (order, part); dedup cross-block repeats of a cell
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        keep = np.ones(o.size, dtype=bool)
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        o, p = o[keep], p[keep]
        # segment-pair expansion: element at pos i of a segment ending
        # at e pairs with positions i+1..e-1 (parts sorted → a < b)
        seg_first = np.ones(o.size, dtype=bool)
        seg_first[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(seg_first)
        lens = np.diff(np.append(starts, o.size))
        ends = np.repeat(starts + lens, lens)
        pos = np.arange(o.size, dtype=np.int64)
        reps = ends - pos - 1
        if int(reps.sum()) == 0:
            return empty
        L = np.repeat(pos, reps)
        cum = np.concatenate([[0], np.cumsum(reps)])
        R = (np.arange(cum[-1], dtype=np.int64)
             - np.repeat(cum[:-1], reps) + np.repeat(pos + 1, reps))
        pack = (p[L] << 32) | p[R]
        pair, cnt = np.unique(pack, return_counts=True)
        return pa.table({
            "pair": pa.array(pair, pa.int64()),
            "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    return hash_keyed_agg(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pyarrow"),
        "pair", sums={"n_p": "n_orders"}, parts=parts,
    )


def copurchase_pairs(sf_dir: str, k: int = 50,
                     parts: int = 64) -> ray.data.Dataset:
    """Top-k part pairs by the number of orders containing BOTH parts
    (market-basket frequent pairs over ``lineitem``).

    Pair counts come from :func:`_copurchase_pair_counts` (see its
    docstring for the no-join pair-mining shape); only per-partition
    top-k survivors reach the final merge.
    """
    totals = _copurchase_pair_counts(sf_dir, parts)

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        c = b["n_orders"].to_numpy(zero_copy_only=False)
        pr = b["pair"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((pr, -c))[:k]
        return b.take(pa.array(np.sort(idx), pa.int64()))

    merged = (
        totals.map_batches(local_topk, batch_format="pyarrow")
        .sort(["n_orders", "pair"], descending=[True, False])
        .limit(k)
    )

    def unpack(b: pa.Table) -> pa.Table:
        pr = b["pair"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part_a": pa.array(pr >> 32, pa.int64()),
            "part_b": pa.array(pr & ((1 << 32) - 1), pa.int64()),
            "n_orders": b["n_orders"],
        })

    return merged.map_batches(unpack, batch_format="pyarrow")


ORACLE_COPURCHASE_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_orders
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders FROM p
ORDER BY n_orders DESC, part_a, part_b LIMIT 50
"""


# ------------------------------------------------- interval merge
def interval_merge(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """Merge overlapping variable-length intervals per user — the
    gaps-and-islands operator that sessionize can't express: each
    event spans ``[ts, ts + value minutes)``, and an early LONG
    interval may swallow several later short ones, so the island
    break depends on the running MAX of interval ends, not the
    previous row's end.

    One shuffle (user-hash partitions), then ONE vectorized pass
    merges every user in the partition: rank-compress the start/end
    values jointly (so comparisons stay exact in a small int domain —
    the same surrogate trick as the as-of sweep, immune to the
    int64-overflow hazard ADVICE flagged for epoch-us arithmetic),
    compute the per-user running max of ends with the segmented-cummax
    offset trick, break where start > prev running max, and reduce
    islands with ``np.maximum.reduceat``.  At 100 TB the shape holds:
    partition by entity key, per-partition vectorized sweep, island
    rows only leave the partition.
    """
    def add_part(b: pa.Table) -> pa.Table:
        from .text import mix64

        k = b["user_id"].to_numpy(zero_copy_only=False)
        s = b["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        # duration: floor(value * 60e6) us — floor on BOTH sides so
        # the float multiply rounds identically in numpy and DuckDB
        dur = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 60_000_000.0
        ).astype(np.int64)
        return pa.table({
            "user_id": pa.array(k, pa.int64()),
            "s": pa.array(s, pa.int64()),
            "e": pa.array(s + dur, pa.int64()),
            "part": pa.array(
                (mix64(k.view(np.uint64)) % np.uint64(parts))
                .astype(np.int64)),
        })

    def merge_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "interval_id": pa.array([], pa.int64()),
                "start_ts": pa.array([], pa.timestamp("us")),
                "end_ts": pa.array([], pa.timestamp("us")),
                "n_merged": pa.array([], pa.int64()),
            })
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        e = g["e"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, s, uid))
        uid, s, e = uid[order], s[order], e[order]
        # joint dense-rank of starts and ends: a > b iff rank(a) >
        # rank(b), and nseg * nvals stays far below 2**63 for any
        # partition that fits a worker
        vals = np.unique(np.concatenate([s, e]))
        sr = np.searchsorted(vals, s).astype(np.int64)
        er = np.searchsorted(vals, e).astype(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        useg = np.cumsum(new_user) - 1
        k = np.int64(vals.size + 1)
        cm = np.maximum.accumulate(er + useg * k) - useg * k
        prev = np.r_[np.int64(-1), cm[:-1]]
        brk = new_user | (sr > prev)
        starts = np.flatnonzero(brk)
        cs = np.cumsum(brk)
        ustart_cs = cs[np.flatnonzero(new_user)]
        per_user_base = np.repeat(
            ustart_cs,
            np.diff(np.r_[np.flatnonzero(new_user), uid.size]),
        )
        island = (cs - per_user_base + 1)[starts]
        lens = np.diff(np.r_[starts, uid.size])
        end_us = np.maximum.reduceat(e, starts)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "interval_id": pa.array(island, pa.int64()),
            "start_ts": pa.array(s[starts].view("datetime64[us]")),
            "end_ts": pa.array(end_us.view("datetime64[us]")),
            "n_merged": pa.array(lens, pa.int64()),
        })

    return (
        read(sf_dir, "events", columns=["user_id", "ts", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


ORACLE_INTERVAL_MERGE = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + CAST(FLOOR(value * 60000000) AS BIGINT) AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max
  FROM iv
), g AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max
              THEN 1 ELSE 0 END AS brk
  FROM m
), isl AS (
  SELECT user_id, s, e,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS interval_id
  FROM g
)
SELECT user_id, interval_id,
       make_timestamp(min(s)) AS start_ts,
       make_timestamp(max(e)) AS end_ts,
       count(*) AS n_merged
FROM isl
GROUP BY user_id, interval_id
"""


# ------------------------------------------- month-over-month growth
def revenue_mom_growth(sf_dir: str) -> ray.data.Dataset:
    """Month-over-month revenue delta per order priority — the
    lead/lag window class: consecutive-row differences over an ordered
    per-group series (TPC-H-style trend report).

    The heavy part is one :func:`common.two_phase_agg` (map-side
    partials, priority×month keys → a few hundred rows); the lag diff
    itself then runs per priority on the tiny aggregate, so nothing
    beyond partial aggregates ever moves.  First month of each
    priority is excluded (no predecessor), keeping every output column
    null-free int64 for exact hash compare.
    """
    def prep(b: pa.Table) -> pa.Table:
        m = (b["o_orderdate"].to_numpy(zero_copy_only=False)
             .astype("datetime64[M]").astype("datetime64[us]")
             .view(np.int64))
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "priority": b["o_orderpriority"],
            "month_us": pa.array(m, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    agg = two_phase_agg(
        read(sf_dir, "orders",
             columns=["o_orderpriority", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow"),
        ["priority", "month_us"], sums={"cents": "revenue_cents"},
    )

    def growth(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "priority": pa.array([], pa.string()),
            "month": pa.array([], pa.timestamp("us")),
            "revenue_cents": pa.array([], pa.int64()),
            "prev_cents": pa.array([], pa.int64()),
            "growth_cents": pa.array([], pa.int64()),
        })
        if g.num_rows < 2:
            return empty
        m = g["month_us"].to_numpy(zero_copy_only=False)
        r = g["revenue_cents"].to_numpy(zero_copy_only=False)
        o = np.argsort(m)
        m, r = m[o], r[o]
        pr = g["priority"].take(pa.array(np.zeros(m.size - 1, np.int64)))
        return pa.table({
            "priority": pr,
            "month": pa.array(m[1:].view("datetime64[us]")),
            "revenue_cents": pa.array(r[1:], pa.int64()),
            "prev_cents": pa.array(r[:-1], pa.int64()),
            "growth_cents": pa.array(r[1:] - r[:-1], pa.int64()),
        })

    return agg.groupby("priority").map_groups(
        growth, batch_format="pyarrow")


ORACLE_REVENUE_MOM_GROWTH = """
WITH m AS (
  SELECT o_orderpriority AS priority,
         date_trunc('month', o_orderdate) AS month,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1, 2
), g AS (
  SELECT priority, month, revenue_cents,
         lag(revenue_cents) OVER (PARTITION BY priority
                                  ORDER BY month) AS prev_cents
  FROM m
)
SELECT priority, month, revenue_cents, prev_cents,
       revenue_cents - prev_cents AS growth_cents
FROM g WHERE prev_cents IS NOT NULL
"""


# ------------------------------------------------- pareto front
def pareto_front(sf_dir: str) -> ray.data.Dataset:
    """(p_partkey, price_cents, p_size): the skyline of ``part`` —
    every part not strictly dominated on (minimize price, maximize
    size) — the multi-objective "best tradeoffs" query class.

    Scale shape: skylines obey a local-then-merge algebra —
    ``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — so each
    block reduces to its own front with ONE vectorized kernel (lexsort
    + segmented running max, no row loop), and only per-block fronts
    (typically a few dozen rows regardless of block size) reach the
    single-task final merge.  Nothing corpus-sized ever moves: this is
    the skyline analog of the map-side-partial combiner.

    Dominance is evaluated on exact integer cents (floor(price·100),
    mirrored in the oracle) so Ray and DuckDB agree bit for bit; ties
    (equal price AND equal size) are mutually non-dominating and all
    survive, matching the strict ``NOT EXISTS`` semantics.
    """
    empty = pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "price_cents": pa.array([], pa.int64()),
        "p_size": pa.array([], pa.int64()),
    })

    def front_kernel(pk: np.ndarray, price: np.ndarray,
                     size: np.ndarray) -> pa.Table:
        # sort (price asc, size desc): within an equal-price group only
        # rows at the group-max size can survive; across groups a front
        # point must STRICTLY beat the best size of all cheaper groups
        order = np.lexsort((pk, -size, price))
        price, size, pk = price[order], size[order], pk[order]
        grp_start = np.ones(price.size, dtype=bool)
        grp_start[1:] = price[1:] != price[:-1]
        grp_idx = np.cumsum(grp_start) - 1
        grp_max = size[grp_start]                   # size desc in group
        prefix = np.empty(grp_max.size, dtype=np.int64)
        prefix[0] = np.iinfo(np.int64).min
        if grp_max.size > 1:
            prefix[1:] = np.maximum.accumulate(grp_max)[:-1]
        keep = (size == grp_max[grp_idx]) & (grp_max > prefix)[grp_idx]
        return pa.table({
            "p_partkey": pa.array(pk[keep], pa.int64()),
            "price_cents": pa.array(price[keep], pa.int64()),
            "p_size": pa.array(size[keep], pa.int64()),
        })

    def local_front(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        return front_kernel(
            b["p_partkey"].to_numpy(zero_copy_only=False),
            np.floor(b["p_retailprice"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64),
            b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    def merge_front(b: pa.Table) -> pa.Table:
        # per-block fronts re-enter the identical kernel (the algebra
        # above) ON THE INTEGER CENTS — never a cents→double→cents
        # round-trip, whose last-ulp error could shift the floor
        if b.num_rows == 0:
            return empty
        return front_kernel(
            b["p_partkey"].to_numpy(zero_copy_only=False),
            b["price_cents"].to_numpy(zero_copy_only=False),
            b["p_size"].to_numpy(zero_copy_only=False),
        )

    return (
        read(sf_dir, "part",
             columns=["p_partkey", "p_retailprice", "p_size"])
        .map_batches(local_front, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_front, batch_format="pyarrow")
    )


ORACLE_PARETO_FRONT = """
WITH p AS (
  SELECT p_partkey,
         CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT a.p_partkey, a.price_cents, a.p_size FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)
)
"""


# ------------------------------------------------- time-weighted average
def time_weighted_avg(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(user_id, n_intervals, active_s, weighted_cents_s, twa_cents):
    per-user TIME-WEIGHTED average of the event value — each event's
    value held until the next event (left-continuous step function),
    weighted by the interval length in whole seconds.  The
    billing/metering aggregate SQL expresses with a lead() window.

    Scale shape: same ONE-exchange coarse-hash layout as sessionize —
    events hash-partition by user (never a per-user task), and each
    partition computes every user's integral with one lexsort + one
    segmented diff.  Integer exactness: value → floor cents, interval
    → floor seconds, so sums are order-independent; per-term magnitude
    (≤ 5·10⁴ cents × ~10⁸ s) keeps the int64 accumulator far from
    overflow even at multi-year spans.
    """
    from whakoom_webscrapper_ray.pipelines.text import mix64

    ev = read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                         "value"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "t_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "vc": _floor_cents(b["value"]),
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    def integrate(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "n_intervals": pa.array([], pa.int64()),
            "active_s": pa.array([], pa.int64()),
            "weighted_cents_s": pa.array([], pa.int64()),
            "twa_cents": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t_us"].to_numpy(zero_copy_only=False)
        e = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["vc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, v = u[order], t[order], v[order]
        same = np.zeros(u.size, dtype=bool)
        if u.size > 1:
            same[:-1] = u[1:] == u[:-1]          # row i has a successor
        if not same.any():
            return empty
        dt_s = np.zeros(u.size, dtype=np.int64)
        dt_s[:-1] = (t[1:] - t[:-1]) // 1_000_000
        uk, inv = np.unique(u, return_inverse=True)
        n = np.zeros(uk.size, dtype=np.int64)
        act = np.zeros(uk.size, dtype=np.int64)
        wsum = np.zeros(uk.size, dtype=np.int64)
        np.add.at(n, inv[same], 1)
        np.add.at(act, inv[same], dt_s[same])
        np.add.at(wsum, inv[same], (v * dt_s)[same])
        keep = act > 0                            # ratio needs a divisor
        ws, ac = wsum[keep], act[keep]
        # TRUNCATING division mirrors DuckDB's `//` on signed sums
        # (negative values never occur in the fixture, but the
        # operator should not silently disagree with its oracle on a
        # domain where they could)
        twa = np.sign(ws) * (np.abs(ws) // ac)
        return pa.table({
            "user_id": pa.array(uk[keep], pa.int64()),
            "n_intervals": pa.array(n[keep], pa.int64()),
            "active_s": pa.array(ac, pa.int64()),
            "weighted_cents_s": pa.array(ws, pa.int64()),
            "twa_cents": pa.array(twa, pa.int64()),
        })

    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(integrate, batch_format="pyarrow")
    )


ORACLE_TIME_WEIGHTED_AVG = """
WITH e AS (
  SELECT user_id,
         CAST(floor(value * 100) AS BIGINT) AS vc,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), iv AS (
  SELECT user_id, vc, (nxt - t) // 1000000 AS dt_s
  FROM e WHERE nxt IS NOT NULL
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(dt_s) AS BIGINT) AS active_s,
       CAST(sum(vc * dt_s) AS BIGINT) AS weighted_cents_s,
       CAST(sum(vc * dt_s) // sum(dt_s) AS BIGINT) AS twa_cents
FROM iv GROUP BY user_id HAVING sum(dt_s) > 0
"""


# ------------------------------------------------- triangle counting
def triangle_topk(sf_dir: str, k: int = 20, min_orders: int = 2,
                  parts: int = 64,
                  join_partitions: int = 8,
                  small_graph_budget: int = 5_000_000
                  ) -> ray.data.Dataset:
    """(part, n_triangles): the k parts participating in the most
    triangles of the co-purchase graph (nodes = parts, undirected edge
    iff the two parts share ≥ ``min_orders`` orders) — the classic
    distributed graph-mining kernel (clustering coefficient /
    community-density building block).

    Algorithm (degree-oriented wedge counting, the MapReduce-standard
    scheme): orient every edge from its lower-(degree, id) endpoint to
    the higher one, so each node's OUT-degree is bounded by O(√m) on
    any graph; generate each out-neighbor pair (a "wedge") at its
    apex; a wedge closes into a triangle iff its far pair is itself an
    edge.  Every triangle has exactly one vertex with out-degree 2
    inside it, so it is generated and verified exactly once.

    Scale shape: pair counts ride :func:`_copurchase_pair_counts`
    (no self-join); degrees ride ``hash_keyed_agg``; the two
    degree-attach steps are distributed hash joins (never a broadcast
    — the degree table scales with the node set); wedges
    hash-partition by apex and expand with the vectorized segment-pair
    kernel; closure testing co-partitions wedges WITH the edge set by
    a shared key hash, so the membership probe is a per-partition
    ``np.isin`` — no driver-side set, no all-pairs blowup (the
    orientation bounds per-apex fanout where raw id-orientation would
    square a hub's degree).

    Budget gate: when the THRESHOLDED edge set fits one worker's heap
    (≤ ``small_graph_budget`` edges), the whole count runs as ONE
    vectorized task on the coalesced edges — the six post-threshold
    shuffle stages above are pure fixed overhead on a small graph
    (measured 22.9 s → ~4 s at sf0.1, where only ~10⁴ edges survive).
    Past the budget the multi-stage exchange path engages unchanged;
    the edge count (not the raw corpus) decides, so a 100 TB corpus
    whose co-purchase graph is small still takes the fast path.  Both
    paths are oracle-identical (the edge-case suite pins the exchange
    path with ``small_graph_budget=0``).
    """
    from .common import hash_keyed_agg
    from whakoom_webscrapper_ray.pipelines.text import mix64

    mask32 = (1 << 32) - 1
    pair_counts = _copurchase_pair_counts(sf_dir, parts)

    def unpack_edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:          # zero-schema shuffle artifact
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        t = b.filter(pc.greater_equal(b["n_orders"], min_orders))
        pr = t["pair"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(pr >> 32, pa.int64()),
            "b": pa.array(pr & mask32, pa.int64()),
        })

    edges = pair_counts.map_batches(
        unpack_edges, batch_format="pyarrow").materialize()

    out_schema = pa.schema([("part", pa.int64()),
                            ("n_triangles", pa.int64())])

    if edges.count() <= small_graph_budget:
        def one_task(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_schema.empty_table()
            a = b["a"].to_numpy(zero_copy_only=False)
            c = b["b"].to_numpy(zero_copy_only=False)
            nodes = np.concatenate([a, c])
            un, inv = np.unique(nodes, return_inverse=True)
            degs = np.bincount(inv, minlength=un.size)
            da, dc = degs[inv[:a.size]], degs[inv[a.size:]]
            a_first = (da < dc) | ((da == dc) & (a < c))
            src = np.where(a_first, a, c)
            dst = np.where(a_first, c, a)
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            seg_first = np.ones(src.size, dtype=bool)
            seg_first[1:] = src[1:] != src[:-1]
            starts = np.flatnonzero(seg_first)
            lens = np.diff(np.append(starts, src.size))
            ends = np.repeat(starts + lens, lens)
            pos = np.arange(src.size, dtype=np.int64)
            reps = ends - pos - 1
            if int(reps.sum()) == 0:
                return out_schema.empty_table()
            L = np.repeat(pos, reps)
            cum = np.concatenate([[0], np.cumsum(reps)])
            R = (np.arange(cum[-1], dtype=np.int64)
                 - np.repeat(cum[:-1], reps) + np.repeat(pos + 1, reps))
            lo, hi = dst[L], dst[R]
            wkey = (lo << 32) | hi
            ekey = (a << 32) | c
            closed = np.isin(wkey, ekey)
            if not closed.any():
                return out_schema.empty_table()
            tri_nodes = np.concatenate(
                [src[L][closed], lo[closed], hi[closed]])
            node, cnt = np.unique(tri_nodes, return_counts=True)
            idx = np.lexsort((node, -cnt))[:k]
            return pa.table({
                "part": pa.array(node[idx], pa.int64()),
                "n_triangles": pa.array(cnt[idx].astype(np.int64),
                                        pa.int64()),
            })

        return edges.repartition(1).map_batches(
            one_task, batch_format="pyarrow")

    def node_emit(b: pa.Table) -> pa.Table:
        a = b["a"].combine_chunks() if isinstance(
            b["a"], pa.ChunkedArray) else b["a"]
        bb = b["b"].combine_chunks() if isinstance(
            b["b"], pa.ChunkedArray) else b["b"]
        return pa.table({"node": pa.concat_arrays([a, bb])})

    from .common import copartition_join

    deg = hash_keyed_agg(
        edges.map_batches(node_emit, batch_format="pyarrow"),
        "node", count_alias="deg", parts=parts,
    ).select_columns(["node", "deg"]).materialize()
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    # attach each endpoint's degree (two co-partitioned hash joins —
    # the engine's own, so sparse partitions are fine; the rename
    # keeps the second join's output columns collision-free)
    e1 = copartition_join(
        edges, deg, on="a", right_on="node", parts=join_partitions,
        left_schema=edge_schema, right_schema=deg_schema,
    ).rename_columns({"deg": "deg_a"})
    e1_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("deg_a", pa.int64())])
    e2 = copartition_join(
        e1, deg, on="b", right_on="node", parts=join_partitions,
        left_schema=e1_schema, right_schema=deg_schema,
    ).rename_columns({"deg": "deg_b"})

    def orient(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        c = b["b"].to_numpy(zero_copy_only=False)
        da = b["deg_a"].to_numpy(zero_copy_only=False)
        db = b["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < c))
        src = np.where(a_first, a, c)
        dst = np.where(a_first, c, a)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "part": pa.array(
                (mix64(src.astype(np.uint64)) % np.uint64(parts))
                .astype(np.int64)),
        })

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    def wedges_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "kind": pa.array([], pa.int8()),
            "apex": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        s = g["src"].to_numpy(zero_copy_only=False)
        d = g["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        seg_first = np.ones(s.size, dtype=bool)
        seg_first[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(seg_first)
        lens = np.diff(np.append(starts, s.size))
        ends = np.repeat(starts + lens, lens)
        pos = np.arange(s.size, dtype=np.int64)
        reps = ends - pos - 1
        if int(reps.sum()) == 0:
            return empty
        L = np.repeat(pos, reps)
        cum = np.concatenate([[0], np.cumsum(reps)])
        R = (np.arange(cum[-1], dtype=np.int64)
             - np.repeat(cum[:-1], reps) + np.repeat(pos + 1, reps))
        lo, hi = d[L], d[R]                       # sorted: lo < hi
        return pa.table({
            "kind": pa.array(np.zeros(lo.size, np.int8), pa.int8()),
            "apex": pa.array(s[L], pa.int64()),
            "key": pa.array((lo << 32) | hi, pa.int64()),
        })

    wedges = (
        oriented.groupby("part")
        .map_groups(wedges_part, batch_format="pyarrow")
    )

    def edge_keys(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        c = b["b"].to_numpy(zero_copy_only=False)
        key = (a << 32) | c                       # a < b by packing
        return pa.table({
            "kind": pa.array(np.ones(key.size, np.int8), pa.int8()),
            "apex": pa.array(np.full(key.size, -1, np.int64),
                             pa.int64()),
            "key": pa.array(key, pa.int64()),
        })

    tagged = wedges.union(edges.map_batches(edge_keys,
                                            batch_format="pyarrow"))

    def add_key_part(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False)
        return b.append_column("kpart", pa.array(
            (mix64(key.view(np.uint64)) % np.uint64(parts)).astype(
                np.int64)))

    def close_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        kind = g["kind"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        apex = g["apex"].to_numpy(zero_copy_only=False)
        ek = key[kind == 1]
        wsel = kind == 0
        wk, wa = key[wsel], apex[wsel]
        closed = np.isin(wk, ek)
        if not closed.any():
            return empty
        wk, wa = wk[closed], wa[closed]
        nodes = np.concatenate([wa, wk >> 32, wk & mask32])
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table({
            "node": pa.array(un, pa.int64()),
            "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    per_node = hash_keyed_agg(
        tagged.map_batches(add_key_part, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(close_part, batch_format="pyarrow"),
        "node", sums={"n_p": "n_triangles"}, parts=parts,
    )

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        c = b["n_triangles"].to_numpy(zero_copy_only=False)
        n = b["node"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((n, -c))[:k]
        return b.take(pa.array(np.sort(idx), pa.int64()))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:      # keep the schema on an empty graph
            return out_schema.empty_table()
        return pa.table({"part": b["node"],
                         "n_triangles": b["n_triangles"]})

    return (
        per_node.map_batches(local_topk, batch_format="pyarrow")
        .sort(["n_triangles", "node"], descending=[True, False])
        .limit(k)
        .map_batches(finish, batch_format="pyarrow")
    )


ORACLE_TRIANGLE_TOPK = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
n AS (SELECT unnest([x, y, z]) AS part FROM t)
SELECT part, count(*) AS n_triangles FROM n
GROUP BY part ORDER BY n_triangles DESC, part LIMIT 20
"""


# ------------------------------------------------- co-purchase components
def copurchase_components(sf_dir: str, min_orders: int = 2,
                          parts: int = 64,
                          small_graph_budget: int = 5_000_000
                          ) -> ray.data.Dataset:
    """(part, component_id): connected components of the co-purchase
    graph (same edge definition as :func:`triangle_topk`), labeling
    every part in the edge set with its component's minimum part key —
    the product-affinity "market segment" discovery query.

    Scale shape: edges ride :func:`_copurchase_pair_counts`, and the
    labeling reuses the curation engine's Hash-to-Min component solver
    (``curate._cc_labels``): one all-to-all per round over
    node-hash-partitioned star states, vectorized per partition,
    convergence decided by a distributed digest — never by collecting
    labels driver-side.  The recursive-CTE oracle proves the
    distributed fixpoint equals sequential min-label propagation.

    Budget gate (same discipline as triangle_topk): a thresholded edge
    set under ``small_graph_budget`` rows solves in ONE task —
    vectorized min-label relaxation with pointer jumping, O(log n)
    in-task rounds — because per-round exchanges are pure fixed
    overhead on a small graph.  Past the budget the Hash-to-Min
    exchange engine runs unchanged; the edge-case suite pins the
    exchange path with budget 0.
    """
    mask32 = (1 << 32) - 1
    pair_counts = _copurchase_pair_counts(sf_dir, parts)

    def unpack_edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        t = b.filter(pc.greater_equal(b["n_orders"], min_orders))
        pr = t["pair"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": pa.array(pr >> 32, pa.int64()),
            "doc_b": pa.array(pr & mask32, pa.int64()),
        })

    edges = pair_counts.map_batches(
        unpack_edges, batch_format="pyarrow")

    out_schema = pa.schema([("part", pa.int64()),
                            ("component_id", pa.int64())])

    from .curate import _cc_labels

    labels = _cc_labels(edges, small_graph_budget=small_graph_budget)

    out_schema = pa.schema([("part", pa.int64()),
                            ("component_id", pa.int64())])

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        return pa.table({"part": b["node"],
                         "component_id": b["cluster_id"]})

    return labels.map_batches(finish, batch_format="pyarrow")


ORACLE_COPURCHASE_COMPONENTS = """
WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
ud AS (SELECT a AS s, b AS t FROM e UNION ALL SELECT b, a FROM e),
reach(node, lab) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM ud)
  UNION
  SELECT ud.s, reach.lab FROM ud JOIN reach ON reach.node = ud.t
)
SELECT node AS part, min(lab) AS component_id
FROM reach GROUP BY node
"""


# ------------------------------------------------- fuzzy string join
def fuzzy_name_pairs(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(name_a, name_b): every pair of DISTINCT customer names at edit
    distance exactly 1 — the string-similarity self-join (entity
    resolution / record-linkage blocking), solved EXACTLY with no
    quadratic pass.

    Algorithm (deletion-variant blocking, the FastSS scheme): each
    name of length L emits L single-deletion variants plus itself.
    Distance-1 pairs are exactly (a) two names whose deletion variants
    coincide AT THE SAME POSITION (a substitution), or (b) a name
    equal to another's deletion variant (an insertion/deletion) — so
    bucketing by variant string finds every qualifying pair and only
    qualifying pairs: no verification stage, no Levenshtein kernel.

    Scale shape: work is vocabulary-linear (L+1 emitted rows per
    name); ONE exchange partitions by variant hash; per-partition pair
    generation rides the shared segment-pair kernel over row indices
    (zero Python loops).  Bucket fanout is bounded structurally — a
    variant's bucket can only hold names formed by inserting one
    alphabet char into it, so |bucket| ≤ (L+1)·|alphabet| regardless
    of corpus size (contrast LSH's unbounded degenerate buckets).
    Duplicate discoveries (a run of equal chars deletes to the same
    variant at several positions) collapse inside the bucket's
    partition — never a second exchange.

    Input assumption: names are short identifiers (the variant stage
    runs one vectorized Arrow pass per character position up to the
    block's LONGEST name, so a pathological megabyte-long outlier
    would serialize that block; key columns of that shape belong in
    the n-gram/LSH family instead).
    """
    from whakoom_webscrapper_ray.pipelines.dedup import _allpairs_contig
    from whakoom_webscrapper_ray.pipelines.text import token_hashes

    names = read(sf_dir, "customer", columns=["c_name"])

    def variants(b: pa.Table) -> pa.Table:
        col = b["c_name"].combine_chunks() if isinstance(
            b["c_name"], pa.ChunkedArray) else b["c_name"]
        col = col.cast(pa.string())
        # block-local distinct (names are unique per customer row, but
        # stay safe under any input layout)
        col = pc.unique(col)
        lens = pc.utf8_length(col).to_numpy(zero_copy_only=False)
        if lens.size == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "pos": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64())})
        keys, poss, terms = [col], [np.full(len(col), -1, np.int64)], [col]
        big = 1 << 30
        for i in range(int(lens.max())):
            sel = pa.array(lens > i)
            sub = col.filter(sel)
            if len(sub) == 0:
                break
            d = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub, 0, i),
                pc.utf8_slice_codeunits(sub, i + 1, big), "")
            keys.append(d)
            poss.append(np.full(len(sub), i, np.int64))
            terms.append(sub)
        key = pa.concat_arrays([k.cast(pa.string()) for k in keys])
        term = pa.concat_arrays([t.cast(pa.string()) for t in terms])
        h = token_hashes(key.to_numpy(zero_copy_only=False))
        return pa.table({
            "key": key,
            "pos": pa.array(np.concatenate(poss), pa.int64()),
            "term": term,
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    out_schema = pa.schema([("name_a", pa.string()),
                            ("name_b", pa.string())])

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        key = g["key"].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        term = g["term"].to_numpy(zero_copy_only=False)
        # cross-block repeats of the same (key,pos,term) emission can
        # occur only if a name appeared in two input blocks; distinct
        order = np.lexsort((term, pos, key))
        key, pos, term = key[order], pos[order], term[order]
        keep = np.ones(key.size, dtype=bool)
        keep[1:] = ((key[1:] != key[:-1]) | (pos[1:] != pos[:-1])
                    | (term[1:] != term[:-1]))
        key, pos, term = key[keep], pos[keep], term[keep]
        idx = np.arange(key.size, dtype=np.int64)
        pa_list, pb_list = [], []
        # (a) substitutions: all-pairs within identical (key, pos>=0)
        sub = pos >= 0
        if sub.any():
            sk, sp, si = key[sub], pos[sub], idx[sub]
            grp_first = np.ones(sk.size, dtype=bool)
            grp_first[1:] = (sk[1:] != sk[:-1]) | (sp[1:] != sp[:-1])
            gid = np.cumsum(grp_first) - 1
            cnt = np.bincount(gid).astype(np.int64)
            cnt_per_row = cnt[gid]
            rank = (np.arange(sk.size, dtype=np.int64)
                    - np.repeat(np.flatnonzero(grp_first), cnt))
            a, b2 = _allpairs_contig(si, cnt_per_row, rank)
            pa_list.append(a)
            pb_list.append(b2)
        # (b) insert/delete: the pos=-1 row of a key (at most one —
        # names are distinct) pairs with every pos>=0 row of that key
        base = pos == -1
        if base.any() and sub.any():
            # segment boundaries over ALL rows of each key
            kf = np.ones(key.size, dtype=bool)
            kf[1:] = key[1:] != key[:-1]
            kid = np.cumsum(kf) - 1
            n_keys = int(kid[-1]) + 1
            base_row = np.full(n_keys, -1, np.int64)
            base_row[kid[base]] = idx[base]
            del_rows = idx[sub]
            partner = base_row[kid[sub]]
            ok = partner >= 0
            pa_list.append(del_rows[ok])
            pb_list.append(partner[ok])
        if not pa_list:
            return out_schema.empty_table()
        ia = np.concatenate(pa_list)
        ib = np.concatenate(pb_list)
        ta, tb = term[ia], term[ib]
        ne = ta != tb
        ta, tb = ta[ne], tb[ne]
        lo = np.minimum(ta, tb)
        hi = np.maximum(ta, tb)
        # collapse duplicate discoveries (equal-char runs) in place
        pair = np.char.add(np.char.add(lo.astype(str), "\x1f"),
                           hi.astype(str))
        _, uidx = np.unique(pair, return_index=True)
        return pa.table({
            "name_a": pa.array(lo[uidx], pa.string()),
            "name_b": pa.array(hi[uidx], pa.string()),
        })

    return (
        names.map_batches(variants, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


ORACLE_FUZZY_NAME_PAIRS = """
WITH v AS (SELECT DISTINCT c_name AS t FROM customer)
SELECT a.t AS name_a, b.t AS name_b
FROM v a JOIN v b
  ON a.t < b.t AND abs(len(a.t) - len(b.t)) <= 1
 AND levenshtein(a.t, b.t) = 1
"""


# ------------------------------------------------- state-change history
def state_history(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(user_id, state, valid_from, valid_to, n_events): the SCD-2
    history table — consecutive same-type runs of each user's event
    stream collapse to one validity interval, closed by the start of
    the next run (the change-data-capture shape; open last runs are
    excluded so every output column is null-free for exact compare).

    Complements the other stream operators: sessionize cuts on TIME
    gaps, interval_merge unions OVERLAPS, this cuts on VALUE change.

    Scale shape: the standard ONE-exchange layout — events
    hash-partition by user, one lexsort per partition orders every
    user's stream at once, run boundaries and per-run aggregates fall
    out of two vectorized diffs (no per-user task, no window join).
    """
    from whakoom_webscrapper_ray.pipelines.text import mix64

    ev = read(sf_dir, "events",
              columns=["user_id", "ts", "event_id", "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "t_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "state": b["event_type"],
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("state", pa.string()),
        ("valid_from", pa.timestamp("us")),
        ("valid_to", pa.timestamp("us")), ("n_events", pa.int64()),
    ])

    def runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t_us"].to_numpy(zero_copy_only=False)
        e = g["event_id"].to_numpy(zero_copy_only=False)
        s = g["state"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, s = u[order], t[order], s[order]
        run_start = np.ones(u.size, dtype=bool)
        run_start[1:] = (u[1:] != u[:-1]) | (s[1:] != s[:-1])
        starts = np.flatnonzero(run_start)
        lens = np.diff(np.append(starts, u.size))
        ru, rs, rt = u[starts], s[starts], t[starts]
        # a run is CLOSED iff the next run belongs to the same user
        closed = np.zeros(starts.size, dtype=bool)
        if starts.size > 1:
            closed[:-1] = ru[1:] == ru[:-1]
        nxt_from = np.empty(starts.size, dtype=np.int64)
        if starts.size > 1:
            nxt_from[:-1] = rt[1:]
        return pa.table({
            "user_id": pa.array(ru[closed], pa.int64()),
            "state": pa.array(rs[closed], pa.string()),
            "valid_from": pa.array(
                rt[closed].view("datetime64[us]")),
            "valid_to": pa.array(
                nxt_from[closed].view("datetime64[us]")),
            "n_events": pa.array(lens[closed], pa.int64()),
        })

    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(runs, batch_format="pyarrow")
    )


ORACLE_STATE_HISTORY = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM e
), agg AS (
  SELECT user_id, run_id, min(event_type) AS state,
         min(ts) AS valid_from, count(*) AS n_events
  FROM r GROUP BY user_id, run_id
), closed AS (
  SELECT user_id, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY run_id) AS valid_to,
         n_events
  FROM agg
)
SELECT user_id, state, valid_from, valid_to, n_events
FROM closed WHERE valid_to IS NOT NULL
"""


# ------------------------------------------------- event path mining
def event_path_topk(sf_dir: str, k: int = 20,
                    parts: int = 64) -> ray.data.Dataset:
    """(path, n): the k most common consecutive event-type TRIGRAMS
    across all user streams ("view>click>purchase") — sequential
    pattern mining, the journey-analysis staple.

    Scale shape: one user-keyed exchange orders each user's stream
    (the state_history layout); trigrams fall out of two shifted
    comparisons per partition (no window join, no per-user task); path
    cardinality is bounded by |event_types|³, so the final count rides
    the cheap two-phase combiner and only per-partition partials move.
    """
    from .common import two_phase_agg
    from whakoom_webscrapper_ray.pipelines.text import mix64

    ev = read(sf_dir, "events",
              columns=["user_id", "ts", "event_id", "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "t_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "etype": b["event_type"],
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    def trigrams(g: pa.Table) -> pa.Table:
        empty = pa.table({"path": pa.array([], pa.string()),
                          "n_p": pa.array([], pa.int64())})
        if g.num_rows < 3:
            return empty
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t_us"].to_numpy(zero_copy_only=False)
        e = g["event_id"].to_numpy(zero_copy_only=False)
        s = g["etype"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, s = u[order], s[order]
        ok = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not ok.any():
            return empty
        i = np.flatnonzero(ok)
        path = np.char.add(
            np.char.add(np.char.add(np.char.add(
                s[i].astype(str), ">"), s[i + 1].astype(str)), ">"),
            s[i + 2].astype(str))
        up, cnt = np.unique(path, return_counts=True)
        return pa.table({
            "path": pa.array(up, pa.string()),
            "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    counts = two_phase_agg(
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(trigrams, batch_format="pyarrow"),
        ["path"], sums={"n_p": "n"},
    )
    return (
        counts.repartition(1)
        .sort(["n", "path"], descending=[True, False])
        .limit(k)
    )


ORACLE_EVENT_PATH_TOPK = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS path,
       count(*) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
"""


# ------------------------------------------------- BFS hop distances
def graph_bfs_hops(sf_dir: str, max_hops: int = 6, min_orders: int = 2,
                   parts: int = 64,
                   small_graph_budget: int = 5_000_000
                   ) -> ray.data.Dataset:
    """(part, hops): exact minimum hop distance from a deterministic
    seed (the lowest part key in the edge set) to every part within
    ``max_hops`` over the co-purchase graph — the iterative
    frontier-expansion shape (the crawl engine's frontier + seen
    anti-join in miniature, here with a recursive-CTE oracle the crawl
    loop itself cannot have).

    Scale shape past the budget gate: one materialized symmetric edge
    table; per round the frontier attaches its neighbors through the
    engine's co-partitioned hash join, and the visited set filters new
    nodes with a tagged-union anti-join (``np.isin`` per hash
    partition — the same discipline as the crawl seen-set, never a
    driver-side set).  Rounds are bounded by ``max_hops``.  Under the
    budget the whole walk is ONE vectorized CSR-levels task.
    """
    from whakoom_webscrapper_ray.pipelines.text import mix64

    mask32 = (1 << 32) - 1
    pair_counts = _copurchase_pair_counts(sf_dir, parts)

    def unpack_sym(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"s": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        t = b.filter(pc.greater_equal(b["n_orders"], min_orders))
        pr = t["pair"].to_numpy(zero_copy_only=False)
        a = pr >> 32
        c = pr & mask32
        return pa.table({
            "s": pa.array(np.concatenate([a, c]), pa.int64()),
            "t": pa.array(np.concatenate([c, a]), pa.int64()),
        })

    edges = pair_counts.map_batches(
        unpack_sym, batch_format="pyarrow").materialize()

    out_schema = pa.schema([("part", pa.int64()), ("hops", pa.int64())])

    if edges.count() <= small_graph_budget:
        def one_task(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_schema.empty_table()
            s = b["s"].to_numpy(zero_copy_only=False)
            t = b["t"].to_numpy(zero_copy_only=False)
            nodes, inv = np.unique(np.concatenate([s, t]),
                                   return_inverse=True)
            es, et = inv[:s.size], inv[s.size:]
            order = np.argsort(es, kind="stable")
            es, et = es[order], et[order]
            starts = np.searchsorted(es, np.arange(nodes.size + 1))
            hops = np.full(nodes.size, -1, np.int64)
            frontier = np.array([0], dtype=np.int64)  # min id = index 0
            hops[0] = 0
            for h in range(1, max_hops + 1):
                reps = starts[frontier + 1] - starts[frontier]
                if int(reps.sum()) == 0:
                    break
                idx = (np.repeat(starts[frontier], reps)
                       + np.arange(int(reps.sum()), dtype=np.int64)
                       - np.repeat(np.concatenate(
                           [[0], np.cumsum(reps)[:-1]]), reps))
                neigh = np.unique(et[idx])
                new = neigh[hops[neigh] < 0]
                if new.size == 0:
                    break
                hops[new] = h
                frontier = new
            seen = hops >= 0
            return pa.table({
                "part": pa.array(nodes[seen], pa.int64()),
                "hops": pa.array(hops[seen], pa.int64()),
            })

        return edges.repartition(1).map_batches(
            one_task, batch_format="pyarrow")

    # ---- exchange path: per-round frontier join + visited anti-join
    from .common import copartition_join

    edge_schema = pa.schema([("s", pa.int64()), ("t", pa.int64())])
    seed = int(edges.min("s"))
    visited = ray.data.from_arrow(pa.table({
        "node": pa.array([seed], pa.int64()),
        "hops": pa.array([0], pa.int64()),
    })).materialize()
    frontier = visited.select_columns(["node"]).materialize()

    def anti_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64())})
        kind = g["kind"].to_numpy(zero_copy_only=False)
        node = g["node"].to_numpy(zero_copy_only=False)
        cand = np.unique(node[kind == 0])
        seen = node[kind == 1]
        return pa.table({"node": pa.array(
            cand[~np.isin(cand, seen)], pa.int64())})

    for h in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        neigh = copartition_join(
            frontier, edges, on="node", right_on="s", parts=parts,
            left_schema=pa.schema([("node", pa.int64())]),
            right_schema=edge_schema,
        ).select_columns(["t"]).rename_columns({"t": "node"})

        def tag(kind):
            def fn(b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    return pa.table({
                        "kind": pa.array([], pa.int8()),
                        "node": pa.array([], pa.int64()),
                        "part": pa.array([], pa.int64())})
                n = b["node"].to_numpy(zero_copy_only=False)
                return pa.table({
                    "kind": pa.array(
                        np.full(n.size, kind, np.int8), pa.int8()),
                    "node": b["node"],
                    "part": pa.array(
                        (mix64(n.view(np.uint64)) % np.uint64(parts))
                        .astype(np.int64)),
                })
            return fn

        new = (
            neigh.map_batches(tag(0), batch_format="pyarrow")
            .union(visited.select_columns(["node"]).map_batches(
                tag(1), batch_format="pyarrow"))
            .groupby("part")
            .map_groups(anti_part, batch_format="pyarrow")
        ).materialize()
        if new.count() == 0:
            break
        stamped = new.map_batches(
            lambda b, hh=h: b.append_column(
                "hops", pa.array(np.full(b.num_rows, hh, np.int64))),
            batch_format="pyarrow",
        )
        visited = visited.union(stamped).materialize()
        frontier = new

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        return pa.table({"part": b["node"], "hops": b["hops"]})

    return visited.map_batches(finish, batch_format="pyarrow")


ORACLE_GRAPH_BFS_HOPS = """
WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
ud AS (SELECT a AS s, b AS t FROM e UNION ALL SELECT b, a FROM e),
seed AS (SELECT min(s) AS n FROM ud),
walk(node, hops) AS (
  SELECT n, 0 FROM seed
  UNION
  SELECT ud.t, walk.hops + 1 FROM ud JOIN walk ON ud.s = walk.node
  WHERE walk.hops < 6
)
SELECT node AS part, CAST(min(hops) AS BIGINT) AS hops
FROM walk GROUP BY node
"""


# ------------------------------------------------- inter-order gaps
def order_gaps(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(o_custkey, n_orders, total_gap_days, avg_gap_days,
    max_gap_days): per-customer inter-purchase intervals — the
    repeat-purchase cadence report (churn/retention feature
    engineering).  Customers with one order have no interval and are
    excluded, keeping every column null-free.

    Scale shape: the standard ONE-exchange per-entity layout — orders
    hash-partition by customer, one lexsort per partition orders every
    customer's history, gaps fall out of one segmented diff.  Days are
    exact integers (timestamp diff // 86_400_000_000 μs, mirrored in
    the oracle), so sums, trunc-averages and maxes hash-compare.
    """
    from whakoom_webscrapper_ray.pipelines.text import mix64

    orders = read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cust": b["o_custkey"],
            "t_us": pc.cast(b["o_orderdate"], pa.int64()),
            "okey": b["o_orderkey"],
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    out_schema = pa.schema([
        ("o_custkey", pa.int64()), ("n_orders", pa.int64()),
        ("total_gap_days", pa.int64()), ("avg_gap_days", pa.int64()),
        ("max_gap_days", pa.int64()),
    ])

    def gaps(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        u = g["cust"].to_numpy(zero_copy_only=False)
        t = g["t_us"].to_numpy(zero_copy_only=False)
        o = g["okey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, t, u))
        u, t = u[order], t[order]
        same = np.zeros(u.size, dtype=bool)
        if u.size > 1:
            same[:-1] = u[1:] == u[:-1]
        if not same.any():
            return out_schema.empty_table()
        gap_d = np.zeros(u.size, dtype=np.int64)
        gap_d[:-1] = (t[1:] - t[:-1]) // 86_400_000_000
        uk, inv = np.unique(u, return_inverse=True)
        n = np.zeros(uk.size, dtype=np.int64)
        tot = np.zeros(uk.size, dtype=np.int64)
        mx = np.zeros(uk.size, dtype=np.int64)
        np.add.at(n, inv[same], 1)
        np.add.at(tot, inv[same], gap_d[same])
        np.maximum.at(mx, inv[same], gap_d[same])
        keep = n > 0
        return pa.table({
            "o_custkey": pa.array(uk[keep], pa.int64()),
            "n_orders": pa.array(n[keep] + 1, pa.int64()),
            "total_gap_days": pa.array(tot[keep], pa.int64()),
            "avg_gap_days": pa.array(tot[keep] // n[keep], pa.int64()),
            "max_gap_days": pa.array(mx[keep], pa.int64()),
        })

    return (
        orders.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps, batch_format="pyarrow")
    )


ORACLE_ORDER_GAPS = """
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS t,
         lead(epoch_us(o_orderdate)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders
), iv AS (
  SELECT o_custkey, (nxt - t) // 86400000000 AS gap_d
  FROM o WHERE nxt IS NOT NULL
)
SELECT o_custkey,
       count(*) + 1 AS n_orders,
       CAST(sum(gap_d) AS BIGINT) AS total_gap_days,
       CAST(sum(gap_d) // count(*) AS BIGINT) AS avg_gap_days,
       CAST(max(gap_d) AS BIGINT) AS max_gap_days
FROM iv GROUP BY o_custkey
"""


# --------------------------------------------------- range (band) join
def ship_window_join(sf_dir: str, window_days: int = 7,
                     parts: int = 64) -> ray.data.Dataset:
    """(o_orderkey, o_orderdate, n_items, revenue_cents): for every
    order, the count and revenue of ALL lineitems (any order's) shipped
    inside ``[o_orderdate, o_orderdate + window_days)`` — a pure
    non-equi RANGE JOIN on the date axis (demand experienced in the
    week following each order's placement).

    Ray Data has no range join; the scale shape is the classic band
    join: both sides key by a coarse date BUCKET at least as wide as
    the window, so every order's window overlaps at most 2 buckets —
    orders flat-map to the 1–2 covering buckets, ONE shuffle co-locates
    each bucket, and a per-bucket vectorized sweep (sorted ship dates +
    prefix sums, two searchsorted per order batch) replaces the O(n·m)
    nested loop.  Per-order partials from the ≤2 buckets then merge in
    the engine's coarse-hash aggregate.  No broadcast side: both inputs
    stream, the exchange moves each row exactly once (orders twice at
    worst), and skew is bounded by rows-per-16-days, which at 100 TB is
    handled by raising ``parts`` / narrowing the bucket to the window
    width.  Oracle: the equivalent LEFT JOIN ON range predicate.
    """
    from .common import hash_keyed_agg

    w_us = window_days * 86_400_000_000
    bucket_us = 16 * 86_400_000_000
    assert w_us <= bucket_us

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    items = read(sf_dir, "lineitem",
                 columns=["l_shipdate", "l_extendedprice"])

    def tag_orders(b: pa.Table) -> pa.Table:
        t0 = pc.cast(b["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        b0 = t0 // bucket_us
        b1 = (t0 + w_us - 1) // bucket_us
        two = b1 != b0
        okey = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(np.concatenate([b0, b1[two]]), pa.int64()),
            "okey": pa.array(np.concatenate([okey, okey[two]]),
                             pa.int64()),
            "t": pa.array(np.concatenate([t0, t0[two]]), pa.int64()),
            "cents": pa.array(
                np.zeros(t0.size + int(two.sum()), np.int64), pa.int64()),
            "side": pa.array(
                np.zeros(t0.size + int(two.sum()), np.int8), pa.int8()),
        })

    def tag_items(b: pa.Table) -> pa.Table:
        t = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(t // bucket_us, pa.int64()),
            "okey": pa.array(np.full(t.size, -1, np.int64), pa.int64()),
            "t": pa.array(t, pa.int64()),
            "cents": _floor_cents(b["l_extendedprice"]),
            "side": pa.array(np.ones(t.size, np.int8), pa.int8()),
        })

    both = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        items.map_batches(tag_items, batch_format="pyarrow"))

    partial_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("t0", pa.int64()),
        ("n_p", pa.int64()), ("cents_p", pa.int64()),
    ])

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return partial_schema.empty_table()
        side = g["side"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        ord_mask = side == 0
        if not ord_mask.any():
            return partial_schema.empty_table()
        lt = t[~ord_mask]
        lc = g["cents"].to_numpy(zero_copy_only=False)[~ord_mask]
        srt = np.argsort(lt, kind="stable")
        lt = lt[srt]
        psum = np.concatenate([[0], np.cumsum(lc[srt])])
        t0 = t[ord_mask]
        lo = np.searchsorted(lt, t0, side="left")
        hi = np.searchsorted(lt, t0 + w_us, side="left")
        return pa.table({
            "o_orderkey": pa.array(
                g["okey"].to_numpy(zero_copy_only=False)[ord_mask],
                pa.int64()),
            "t0": pa.array(t0, pa.int64()),
            "n_p": pa.array((hi - lo).astype(np.int64), pa.int64()),
            "cents_p": pa.array(psum[hi] - psum[lo], pa.int64()),
        })

    partials = both.groupby("bucket").map_groups(
        sweep, batch_format="pyarrow")
    merged = hash_keyed_agg(
        partials, "o_orderkey",
        sums={"n_p": "n_items", "cents_p": "revenue_cents"},
        mins={"t0": "t_us"}, parts=parts,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_orderdate": pc.cast(
                pc.cast(b["t_us"], pa.int64()), pa.timestamp("us")),
            "n_items": b["n_items"],
            "revenue_cents": b["revenue_cents"],
        })

    return merged.map_batches(finish, batch_format="pyarrow")


ORACLE_SHIP_WINDOW_JOIN = """
SELECT o.o_orderkey, o.o_orderdate,
       count(l.l_shipdate) AS n_items,
       CAST(coalesce(sum(
         CAST(floor(l.l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_cents
FROM orders o
LEFT JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
GROUP BY 1, 2
"""


# --------------------------------------------- stream disorder metric
def ship_disorder(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(l_orderkey, n_lines, n_late, max_late_days): per-order
    out-of-order shipping report — scanning each order's lineitems in
    LINE order (l_linenumber, deterministically tie-broken by
    (l_partkey, l_suppkey), which is unique per order), a line is late
    when its ship date precedes the running max of every earlier line;
    ``max_late_days`` is the worst such regression.  This is the
    watermark-lateness profile of a disordered stream (the synthetic
    events table is ts-ordered by construction — zero disorder — so
    the operator runs over lineitem, where ~half the lines ship out of
    line order).

    Scale shape: the standard ONE-exchange per-entity layout (lines
    hash-partition by order key), then one vectorized pass per
    partition — a segmented running max via rank-compressed surrogates
    (seg·span + ts_rank, the as-of sweep's overflow-safe trick), so no
    per-key Python loop.  All outputs are exact integer days.
    """
    from .text import mix64

    items = read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_linenumber", "l_partkey",
                          "l_suppkey", "l_shipdate"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": b["l_orderkey"],
            "eid": pc.cast(b["l_linenumber"], pa.int64()),
            "pk": pc.cast(b["l_partkey"], pa.int64()),
            "sk": pc.cast(b["l_suppkey"], pa.int64()),
            "t": pc.cast(b["l_shipdate"], pa.int64()),
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    out_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("n_lines", pa.int64()),
        ("n_late", pa.int64()), ("max_late_days", pa.int64()),
    ])

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        u = g["u"].to_numpy(zero_copy_only=False)
        e = g["eid"].to_numpy(zero_copy_only=False)
        pk = g["pk"].to_numpy(zero_copy_only=False)
        sk = g["sk"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, pk, e, u))
        u, t = u[order], t[order]
        newseg = np.ones(u.size, dtype=bool)
        newseg[1:] = u[1:] != u[:-1]
        seg = np.cumsum(newseg) - 1
        uts = np.unique(t)
        span = np.int64(uts.size + 1)
        if (seg[-1] + 2) * span >= 2**63:  # pragma: no cover
            raise AssertionError(
                "disorder surrogate would overflow int64: raise `parts`")
        r = np.searchsorted(uts, t).astype(np.int64)
        surr = seg * span + r
        runmax = np.maximum.accumulate(surr)
        prev_rank = np.full(u.size, -1, np.int64)
        prev_rank[1:] = runmax[:-1] - seg[1:] * span
        prev_rank[newseg] = -1   # first line of each order
        late = prev_rank > r
        late_d = np.zeros(u.size, dtype=np.int64)
        late_d[late] = (uts[prev_rank[late]] - t[late]) // 86_400_000_000
        uk = u[newseg]
        inv = seg
        n = np.zeros(uk.size, dtype=np.int64)
        nl = np.zeros(uk.size, dtype=np.int64)
        mx = np.zeros(uk.size, dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(nl, inv[late], 1)
        np.maximum.at(mx, inv[late], late_d[late])
        return pa.table({
            "l_orderkey": pa.array(uk, pa.int64()),
            "n_lines": pa.array(n, pa.int64()),
            "n_late": pa.array(nl, pa.int64()),
            "max_late_days": pa.array(mx, pa.int64()),
        })

    return (
        items.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
    )


ORACLE_SHIP_DISORDER = """
WITH w AS (
  SELECT l_orderkey, l_shipdate,
         max(l_shipdate) OVER (PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_suppkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_max
  FROM lineitem
)
SELECT l_orderkey, count(*) AS n_lines,
       CAST(coalesce(sum(CASE WHEN l_shipdate < prev_max THEN 1 END), 0)
            AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN l_shipdate < prev_max
                          THEN (epoch_us(prev_max) - epoch_us(l_shipdate))
                               // 86400000000 END), 0)
            AS BIGINT) AS max_late_days
FROM w GROUP BY l_orderkey
"""


# ------------------------------------ shipping-priority top-k (Q3 shape)
def shipping_priority_topk(sf_dir: str, segment: str = "BUILDING",
                           cutoff: str = "1996-06-30",
                           n: int = 10) -> ray.data.Dataset:
    """(o_orderkey, o_orderdate, revenue_cents): the ``n`` highest-
    value unshipped orders — orders placed by ``segment`` customers
    BEFORE the cutoff whose revenue counts only lineitems shipped
    AFTER it (the classic shipping-priority report: a 3-table join
    where each side carries its own date inequality).

    Scale shape: the customer dimension reduces to a qualifying-key
    set broadcast once (``ray.put`` + ``is_in``; customers are the
    small side of this star — at 10⁹ customers the same semi-join
    switches co-partitioned like latest_order_before_event's).  Both
    fact sides prune columns AND rows at the scan, meet in the
    engine's ONE-exchange copartition_join, aggregate per order in
    the coarse-hash merge, and the final top-n is a per-block pruning
    combiner + one tiny merge block — no global sort of the aggregate.
    """
    import pyarrow.parquet as pq

    from .common import copartition_join, hash_keyed_agg, table_path

    cut_us = pa.scalar(np.datetime64(cutoff, "us").astype(np.int64),
                       pa.int64())

    cust = pq.read_table(table_path(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(
        pc.equal(cust["c_mktsegment"], segment))["c_custkey"]
    key_ref = ray.put(pc.cast(keys.combine_chunks(), pa.int64()))

    def order_side(b: pa.Table, ks=None) -> pa.Table:
        ks = deref(ks)
        t = pc.cast(b["o_orderdate"], pa.int64())
        b = b.append_column("t_us", t).filter(
            pc.and_(pc.less(t, cut_us),
                    pc.is_in(pc.cast(b["o_custkey"], pa.int64()),
                             value_set=ks)))
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "t_us": b["t_us"]})

    orders = read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_side, fn_kwargs={"ks": key_ref},
                  batch_format="pyarrow")

    def line_side(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(pc.cast(b["l_shipdate"], pa.int64()),
                                cut_us))
        rev = pc.cast(pc.floor(pc.multiply(pc.multiply(
            b["l_extendedprice"], pc.subtract(
                pa.scalar(1.0), b["l_discount"])), 100.0)), pa.int64())
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_cents": rev})

    line = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(line_side, batch_format="pyarrow")

    joined = copartition_join(
        line, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("rev_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("t_us", pa.int64())]),
    )

    agg = hash_keyed_agg(joined, "l_orderkey",
                         sums={"rev_cents": "revenue_cents"},
                         mins={"t_us": "t_us"})

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= n:
            return b
        rev = b["revenue_cents"].to_numpy(zero_copy_only=False)
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -rev))[:n]
        return b.take(pa.array(np.sort(order), pa.int64()))

    top = (
        agg.map_batches(local_top, batch_format="pyarrow")
        .repartition(1)
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(n)
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["l_orderkey"],
            "o_orderdate": pc.cast(
                pc.cast(b["t_us"], pa.int64()), pa.timestamp("us")),
            "revenue_cents": b["revenue_cents"],
        })

    return top.map_batches(finish, batch_format="pyarrow")


ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey AS o_orderkey, o_orderdate,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------- promo revenue share (Q14 shape)
def promo_share_monthly(sf_dir: str) -> ray.data.Dataset:
    """(month, promo_cents, total_cents): per ship-month, revenue from
    PROMO-type parts vs all revenue — the promotion-effect report (a
    fact⋈dimension join where the join's only purpose is a boolean
    flag).  Reported as the two exact integer numerators, not the
    float ratio, so sums stay order-independent and hash-comparable.

    Scale shape: the part dimension collapses to ONE bit per key —
    broadcast the promo key set once (``ray.put`` + ``is_in``) instead
    of shuffling lineitem against part (the J5 broadcast-small-side
    call; were the dimension to outgrow a broadcast, the same flag
    rides the engine's copartition_join).  Then a single map computes
    flagged cents and the low-cardinality month aggregate is the
    map-side-partial two_phase_agg.
    """
    import pyarrow.parquet as pq

    from .common import table_path

    part = pq.read_table(table_path(sf_dir, "part"),
                         columns=["p_partkey", "p_type"])
    promo = part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"]
    promo_ref = ray.put(pc.cast(promo.combine_chunks(), pa.int64()))

    def project(b: pa.Table, pk=None) -> pa.Table:
        pk = deref(pk)
        rev = pc.cast(pc.floor(pc.multiply(pc.multiply(
            b["l_extendedprice"], pc.subtract(
                pa.scalar(1.0), b["l_discount"])), 100.0)), pa.int64())
        is_promo = pc.is_in(pc.cast(b["l_partkey"], pa.int64()),
                            value_set=pk)
        return pa.table({
            "month": pc.strftime(b["l_shipdate"], format="%Y-%m"),
            "promo_cents": pc.if_else(is_promo, rev,
                                      pa.scalar(0, pa.int64())),
            "total_cents": rev,
        })

    items = read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(project, fn_kwargs={"pk": promo_ref},
                  batch_format="pyarrow")

    return two_phase_agg(items, ["month"],
                         sums={"promo_cents": "promo_cents",
                               "total_cents": "total_cents"})


ORACLE_PROMO_SHARE = """
SELECT strftime(l_shipdate, '%Y-%m') AS month,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# ------------------------------------------ rows-frame moving average
def value_moving_avg(sf_dir: str, window_rows: int = 3,
                     parts: int = 64) -> ray.data.Dataset:
    """(event_id, user_id, ma_cents): per-user trailing moving average
    of event value over the last ``window_rows`` events INCLUDING the
    current one, scanning each user's stream in (ts, event_id) order —
    the ROWS-frame window class (events_sliding covers the RANGE/
    time-interval class).  Exact integers: cents summed, then FLOOR
    division by the actual frame length (floor, not truncate-toward-
    zero: -50/3 → -17; the oracle floors a double quotient, exact
    while |sum| < 2^53 cents).

    Scale shape: ONE exchange (hash-partition by user), then one
    vectorized pass per partition — segmented prefix sums with a
    shifted-prefix subtraction give every row's trailing-k sum without
    a per-row loop.
    """
    from .text import mix64

    events = read(sf_dir, "events",
                  columns=["event_id", "user_id", "ts", "value"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": b["user_id"],
            "eid": b["event_id"],
            "t": pc.cast(b["ts"], pa.int64()),
            "cents": _floor_cents(b["value"]),
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ma_cents", pa.int64()),
    ])

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        u = g["u"].to_numpy(zero_copy_only=False)
        e = g["eid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, e, c = u[order], e[order], c[order]
        newseg = np.ones(u.size, dtype=bool)
        newseg[1:] = u[1:] != u[:-1]
        seg_start = np.repeat(
            np.flatnonzero(newseg),
            np.diff(np.append(np.flatnonzero(newseg), u.size)))
        pos = np.arange(u.size, dtype=np.int64)
        in_seg = pos - seg_start            # 0-based rank within user
        frame = np.minimum(in_seg + 1, window_rows)
        psum = np.concatenate([[0], np.cumsum(c)])
        lo = pos - frame + 1                # first row of the frame
        s = psum[pos + 1] - psum[lo]
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "user_id": pa.array(u, pa.int64()),
            "ma_cents": pa.array(
                np.floor_divide(s, frame).astype(np.int64), pa.int64()),
        })

    return (
        events.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
    )


ORACLE_VALUE_MOVING_AVG = """
WITH w AS (
  SELECT event_id, user_id,
         sum(CAST(floor(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s,
         count(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n
  FROM events
)
SELECT event_id, user_id,
       CAST(floor(s / CAST(n AS DOUBLE)) AS BIGINT) AS ma_cents
FROM w
"""


# ------------------------------------ bilateral trade matrix (Q7 shape)
def nation_trade_matrix(sf_dir: str) -> ray.data.Dataset:
    """(cust_nation, supp_nation, revenue_cents): the customer-nation ×
    supplier-nation revenue matrix — which nations buy from which (the
    volume-shipping report).  A two-dimension enrichment of a
    fact⋈fact join: lineitem meets orders in the engine's ONE-exchange
    copartition_join on order key; both nation lookups are
    dimension-broadcast maps (``ray.put`` once, probe per batch), and
    the 25×25-bounded matrix aggregates map-side first.
    """
    import pyarrow.parquet as pq

    from .common import copartition_join, table_path

    nation = pq.read_table(table_path(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"])
    cust = pq.read_table(table_path(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"])
    supp = pq.read_table(table_path(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"])
    lk_ref = ray.put({
        "nat_keys": pc.cast(nation["n_nationkey"].combine_chunks(),
                            pa.int64()),
        "nat_names": nation["n_name"].combine_chunks(),
        "cust_keys": pc.cast(cust["c_custkey"].combine_chunks(),
                             pa.int64()),
        "cust_nat": pc.cast(cust["c_nationkey"].combine_chunks(),
                            pa.int64()),
        "sup_keys": pc.cast(supp["s_suppkey"].combine_chunks(),
                            pa.int64()),
        "sup_nat": pc.cast(supp["s_nationkey"].combine_chunks(),
                           pa.int64()),
    })

    def order_side(b: pa.Table, lk=None) -> pa.Table:
        lk = deref(lk)
        idx = pc.index_in(pc.cast(b["o_custkey"], pa.int64()),
                          value_set=lk["cust_keys"])
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "c_nat": lk["cust_nat"].take(idx),
        })

    orders = read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey"]).map_batches(
        order_side, fn_kwargs={"lk": lk_ref}, batch_format="pyarrow")

    def line_side(b: pa.Table, lk=None) -> pa.Table:
        lk = deref(lk)
        idx = pc.index_in(pc.cast(b["l_suppkey"], pa.int64()),
                          value_set=lk["sup_keys"])
        rev = pc.cast(pc.floor(pc.multiply(pc.multiply(
            b["l_extendedprice"], pc.subtract(
                pa.scalar(1.0), b["l_discount"])), 100.0)), pa.int64())
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "s_nat": lk["sup_nat"].take(idx),
            "rev_cents": rev,
        })

    line = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(line_side, fn_kwargs={"lk": lk_ref},
                  batch_format="pyarrow")

    joined = copartition_join(
        line, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("s_nat", pa.int64()),
                               ("rev_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("c_nat", pa.int64())]),
    )

    def name_pair(b: pa.Table, lk=None) -> pa.Table:
        lk = deref(lk)
        ci = pc.index_in(b["c_nat"], value_set=lk["nat_keys"])
        si = pc.index_in(b["s_nat"], value_set=lk["nat_keys"])
        return pa.table({
            "cust_nation": lk["nat_names"].take(ci),
            "supp_nation": lk["nat_names"].take(si),
            "revenue_cents": b["rev_cents"],
        })

    named = joined.map_batches(name_pair, fn_kwargs={"lk": lk_ref},
                               batch_format="pyarrow")
    return two_phase_agg(named, ["cust_nation", "supp_nation"],
                         sums={"revenue_cents": "revenue_cents"})


ORACLE_NATION_TRADE_MATRIX = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1, 2
"""


# ----------------------------------------------- burst (bot) detection
def burst_events(sf_dir: str, gap_seconds: int = 60,
                 parts: int = 64) -> ray.data.Dataset:
    """(user_id, event_type, n_events, n_burst): per (user, type)
    stream, how many events arrive within ``gap_seconds`` of their
    predecessor (ordered by ts, then event_id) — the bot-burst /
    machine-rate screen an ingest pipeline applies before trusting
    engagement counts.

    Scale shape: ONE composite-key exchange (user⊕type hash), one
    lexsort + segmented diff per partition — order_gaps' layout on a
    composite key with a threshold count instead of gap stats.  The
    hash routes rows to partitions only; segment identity inside a
    partition is the exact (user_id, dictionary-encoded event_type)
    pair, so a 64-bit hash collision can never merge two streams.
    """
    from .text import mix64, token_hashes

    gap_us = gap_seconds * 1_000_000
    events = read(sf_dir, "events",
                  columns=["user_id", "event_type", "event_id", "ts"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        th = token_hashes(
            b["event_type"].to_numpy(zero_copy_only=False))
        h = mix64(u.view(np.uint64) ^ th)
        return pa.table({
            "u": b["user_id"],
            "et": b["event_type"],
            "eid": b["event_id"],
            "t": pc.cast(b["ts"], pa.int64()),
            "part": pa.array(
                (h % np.uint64(parts)).astype(np.int64)),
        })

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("n_events", pa.int64()), ("n_burst", pa.int64()),
    ])

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        u = g["u"].to_numpy(zero_copy_only=False)
        etc = (g["et"].combine_chunks()
               .dictionary_encode().indices
               .to_numpy(zero_copy_only=False).astype(np.int64))
        e = g["eid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, etc, u))
        u, etc, t = u[order], etc[order], t[order]
        newseg = np.ones(u.size, dtype=bool)
        newseg[1:] = (u[1:] != u[:-1]) | (etc[1:] != etc[:-1])
        seg = np.cumsum(newseg) - 1
        burst = np.zeros(u.size, dtype=bool)
        burst[1:] = (~newseg[1:]) & ((t[1:] - t[:-1]) <= gap_us)
        nseg = int(newseg.sum())
        n = np.zeros(nseg, dtype=np.int64)
        nb = np.zeros(nseg, dtype=np.int64)
        np.add.at(n, seg, 1)
        np.add.at(nb, seg[burst], 1)
        firsts = np.flatnonzero(newseg)
        return pa.table({
            "user_id": pa.array(u[firsts].astype(np.int64),
                                pa.int64()),
            "event_type": g["et"].take(
                pa.array(order[firsts], pa.int64())),
            "n_events": pa.array(n, pa.int64()),
            "n_burst": pa.array(nb, pa.int64()),
        })

    return (
        events.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
    )


# ------------------------------------------ referential-integrity audit
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


def fk_integrity_report(sf_dir: str, parts: int = 32) -> pa.Table:
    """(relation, fk_column, n_rows, n_null, n_orphans) for every FK
    edge of the star schema — the referential-integrity audit an
    ingest pipeline runs before trusting joins (an orphan l_orderkey
    silently drops revenue in every inner join downstream).

    Scale shape: each table is read ONCE (all FK columns of interest
    projected together), each batch pre-aggregates to distinct
    (value, count) partials, and all six edges ride ONE hash exchange
    (partition id = edge * parts + hash(value) % parts) where child
    partials anti-probe the co-partitioned parent key set with a
    vectorized ``np.isin``.  Only distinct-value partials shuffle —
    never rows — so a 100 TB lineitem moves at the cardinality of its
    key space, and no parent key set is ever broadcast or collected.
    """
    from .common import collect_small
    from .text import mix64

    by_child: dict[str, list[tuple[int, str]]] = {}
    by_parent: dict[str, list[tuple[int, str]]] = {}
    for ei, (ct, cc, pt, pk) in enumerate(_FK_EDGES):
        by_child.setdefault(ct, []).append((ei, cc))
        by_parent.setdefault(pt, []).append((ei, pk))

    union_schema = pa.schema([
        ("part", pa.int64()), ("kind", pa.int8()),
        ("val", pa.int64()), ("cnt", pa.int64()),
        ("nnull", pa.int64()),
    ])

    def _rows(ei: int, col: pa.ChunkedArray, kind: int) -> pa.Table:
        nnull = col.null_count
        v = pc.drop_null(col).to_numpy(zero_copy_only=False)
        v = v.astype(np.int64, copy=False)
        vals, cnts = np.unique(v, return_counts=True)
        slot = (mix64(vals.view(np.uint64))
                % np.uint64(parts)).astype(np.int64)
        t = pa.table({
            "part": pa.array(ei * parts + slot, pa.int64()),
            "kind": pa.array(
                np.full(vals.size, kind, np.int8), pa.int8()),
            "val": pa.array(vals, pa.int64()),
            "cnt": pa.array(cnts, pa.int64()),
            "nnull": pa.array(np.zeros(vals.size, np.int64),
                              pa.int64()),
        })
        if kind == 0 and nnull:
            t = pa.concat_tables([t, pa.table({
                "part": pa.array([ei * parts], pa.int64()),
                "kind": pa.array([0], pa.int8()),
                "val": pa.array([0], pa.int64()),
                "cnt": pa.array([0], pa.int64()),
                "nnull": pa.array([nnull], pa.int64()),
            })])
        return t.cast(union_schema)

    def emitter(edges: list[tuple[int, str]], kind: int):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return union_schema.empty_table()
            return pa.concat_tables(
                [_rows(ei, b[c].combine_chunks()
                       if isinstance(b[c], pa.ChunkedArray)
                       else pa.chunked_array([b[c]]), kind)
                 for ei, c in edges])
        return fn

    import os

    from .common import table_path

    def blocks_for(tbl: str) -> int:
        # size the read to the table, not a fixed fan-out: the nine
        # unioned streams otherwise contribute 64 near-empty map tasks
        # EACH for the dimension tables (measured: task scheduling, not
        # UDF time, dominated the stage)
        return max(1, os.path.getsize(table_path(sf_dir, tbl)) >> 23)

    streams = []
    for tbl, edges in by_child.items():
        ds = read(sf_dir, tbl, columns=[c for _, c in edges],
                  override_num_blocks=blocks_for(tbl))
        streams.append(
            ds.map_batches(emitter(edges, 0), batch_format="pyarrow"))
    for tbl, edges in by_parent.items():
        # nation backs two edges through the same key column — read it
        # once and let the emitter fan the column out per edge
        ds = read(sf_dir, tbl, columns=sorted({c for _, c in edges}),
                  override_num_blocks=blocks_for(tbl))
        streams.append(
            ds.map_batches(emitter(edges, 1), batch_format="pyarrow"))
    tagged = streams[0].union(*streams[1:])

    partial_schema = pa.schema([
        ("edge", pa.int64()), ("n_rows", pa.int64()),
        ("n_null", pa.int64()), ("n_orphans", pa.int64()),
    ])

    def probe(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return partial_schema.empty_table()
        edge = int(g["part"][0].as_py()) // parts
        kind = g["kind"].to_numpy(zero_copy_only=False)
        val = g["val"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        child = kind == 0
        orphan = child & ~np.isin(val, val[~child])
        # the null-sentinel rows carry cnt 0, so they never count as
        # rows or orphans; their nnull sums below
        return pa.table({
            "edge": pa.array([edge], pa.int64()),
            "n_rows": pa.array([int(cnt[child].sum())], pa.int64()),
            "n_null": pa.array(
                [int(g["nnull"].to_numpy(
                    zero_copy_only=False).sum())], pa.int64()),
            "n_orphans": pa.array([int(cnt[orphan].sum())],
                                  pa.int64()),
        })

    # the 9-way union carries 64 blocks per stream; coalesce before
    # the exchange or the groupby sort pays per-block overhead on
    # ~600 near-empty partitions (measured 34 s -> ~8 s at sf0.1)
    partials = collect_small(
        tagged.repartition(parts)
        .groupby("part").map_groups(probe, batch_format="pyarrow"),
        partial_schema,
    )
    # <= 6 x parts one-row partials: the edge-level merge is driver
    # arithmetic, not a second exchange
    edge = partials["edge"].to_numpy(zero_copy_only=False)
    nr = np.zeros(len(_FK_EDGES), np.int64)
    nn = np.zeros(len(_FK_EDGES), np.int64)
    no = np.zeros(len(_FK_EDGES), np.int64)
    np.add.at(nr, edge,
              partials["n_rows"].to_numpy(zero_copy_only=False))
    np.add.at(nn, edge,
              partials["n_null"].to_numpy(zero_copy_only=False))
    np.add.at(no, edge,
              partials["n_orphans"].to_numpy(zero_copy_only=False))
    return pa.table({
        "relation": pa.array([e[0] for e in _FK_EDGES], pa.string()),
        "fk_column": pa.array([e[1] for e in _FK_EDGES], pa.string()),
        "n_rows": pa.array(nr + nn, pa.int64()),
        "n_null": pa.array(nn, pa.int64()),
        "n_orphans": pa.array(no, pa.int64()),
    })


ORACLE_FK_INTEGRITY = "\nUNION ALL\n".join(
    f"""SELECT '{ct}' AS relation, '{cc}' AS fk_column,
  count(*) AS n_rows,
  CAST(coalesce(sum(CASE WHEN c.{cc} IS NULL THEN 1 END), 0)
       AS BIGINT) AS n_null,
  CAST(coalesce(sum(CASE WHEN c.{cc} IS NOT NULL
                          AND p.{pk} IS NULL THEN 1 END), 0)
       AS BIGINT) AS n_orphans
FROM {ct} c LEFT JOIN {pt} p ON c.{cc} = p.{pk}"""
    for ct, cc, pt, pk in _FK_EDGES)


ORACLE_BURST_EVENTS = """
WITH w AS (
  SELECT user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id, event_type, count(*) AS n_events,
       CAST(coalesce(sum(CASE WHEN epoch_us(ts) - epoch_us(prev_ts)
                               <= 60000000 THEN 1 END), 0) AS BIGINT)
         AS n_burst
FROM w GROUP BY 1, 2
"""


# ------------------------------------------ sequence-completeness audit
def id_gaps(sf_dir: str, event_type: str = "click",
            parts: int = 64) -> ray.data.Dataset:
    """(gap_start, gap_end): the missing event_id ranges inside one
    event type's stream — the sequence-completeness / data-loss audit
    run after an ingest (a gap in a per-type dense id sequence means
    dropped records).

    Scale shape: RANGE partitioning, the one exchange discipline the
    rest of the suite doesn't exercise — order statistics need
    neighboring ids co-located, so ids bucket by ``(id - lo) // width``
    (hash would scatter neighbors).  Per bucket one sort + diff finds
    interior gaps; the ≤ ``parts`` per-bucket (min, max) summaries
    stitch cross-bucket gaps driver-side, and buckets that are entirely
    missing fall out of consecutive-summary comparison for free.  The
    filtered id column is materialized once (8 B/row) to feed the
    min/max probe and the bucketed pass without re-reading.
    """
    from .common import collect_small

    ev = read(sf_dir, "events", columns=["event_id", "event_type"])

    def only(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], event_type)
        return pa.table({
            "event_id": pc.cast(b.filter(m)["event_id"], pa.int64())})

    ids = ev.map_batches(only, batch_format="pyarrow").materialize()

    mm_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def block_mm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return mm_schema.empty_table()
        v = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(v.min())], pa.int64()),
                         "hi": pa.array([int(v.max())], pa.int64())})

    mm = collect_small(
        ids.map_batches(block_mm, batch_format="pyarrow"), mm_schema)
    gap_schema = pa.schema([("gap_start", pa.int64()),
                            ("gap_end", pa.int64())])
    if mm.num_rows == 0:
        return ray.data.from_arrow(gap_schema.empty_table())
    lo = int(pc.min(mm["lo"]).as_py())
    hi = int(pc.max(mm["hi"]).as_py())
    width = max(1, (hi - lo) // parts + 1)

    def bucketed(b: pa.Table) -> pa.Table:
        v = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b["event_id"],
            "bucket": pa.array((v - lo) // width, pa.int64()),
        })

    sweep_schema = pa.schema([("gap_start", pa.int64()),
                              ("gap_end", pa.int64()),
                              ("kind", pa.int8())])

    def sweep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return sweep_schema.empty_table()
        v = np.sort(g["event_id"].to_numpy(zero_copy_only=False))
        d = np.flatnonzero(np.diff(v) > 1)
        gs = np.concatenate([v[d] + 1, [v[0]]])
        ge = np.concatenate([v[d + 1] - 1, [v[-1]]])
        kind = np.zeros(gs.size, np.int8)
        kind[-1] = 1  # (bucket min, bucket max) summary row
        return pa.table({"gap_start": pa.array(gs, pa.int64()),
                         "gap_end": pa.array(ge, pa.int64()),
                         "kind": pa.array(kind, pa.int8())})

    swept = (
        ids.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .materialize()
    )

    summaries = collect_small(
        swept.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 1)),
            batch_format="pyarrow"),
        sweep_schema)
    smin = summaries["gap_start"].to_numpy(zero_copy_only=False)
    smax = summaries["gap_end"].to_numpy(zero_copy_only=False)
    order = np.argsort(smin)
    smin, smax = smin[order], smax[order]
    cross = np.flatnonzero(smin[1:] - smax[:-1] > 1)
    boundary = pa.table({
        "gap_start": pa.array(smax[cross] + 1, pa.int64()),
        "gap_end": pa.array(smin[cross + 1] - 1, pa.int64()),
    })

    interior = swept.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0)).select(
            ["gap_start", "gap_end"]),
        batch_format="pyarrow")
    return interior.union(ray.data.from_arrow(boundary))


def id_gaps_oracle_sql(event_type: str = "click") -> str:
    return f"""
WITH c AS (SELECT event_id FROM events
           WHERE event_type = '{event_type}'),
w AS (SELECT event_id,
             lead(event_id) OVER (ORDER BY event_id) AS nx FROM c)
SELECT event_id + 1 AS gap_start, nx - 1 AS gap_end
FROM w WHERE nx - event_id > 1
"""


# ------------------------------------------------- event transitions
def event_transitions(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(prev_type, event_type, n_trans, pct_bp): the Markov transition
    matrix of per-user event sequences — how often each event type
    follows each other type, with the row-conditional probability in
    integer basis points (n·10000 // row-total, exact).

    The behavioral generalization of the reference's per-item status
    progression (pending → completed sweep, pipelines.py:93-100): at
    corpus scale the "what follows what" table is the session-model
    input.  Scale shape: ONE exchange — events hash-partition by user
    (mix64, same layout as sessionize), each partition lexsorts its
    users' histories once and counts adjacent (prev, next) type pairs
    vectorized; per-partition partials are (≤ types²)-row tables, so
    the final groupby moves a few hundred rows no matter the corpus
    size.  The pct_bp normalization runs per prev_type on the tiny
    merged matrix.
    """
    from whakoom_webscrapper_ray.pipelines.text import mix64

    ev = read(sf_dir, "events",
              columns=["user_id", "ts", "event_id", "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": b["user_id"],
            "t": pc.cast(b["ts"], pa.int64()),
            "e": b["event_id"],
            "k": b["event_type"],
            "part": pa.array(
                (mix64(u.view(np.uint64)) % np.uint64(parts)).astype(
                    np.int64)),
        })

    part_schema = pa.schema([
        ("prev_type", pa.string()), ("event_type", pa.string()),
        ("n_p", pa.int64()),
    ])

    def count_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return part_schema.empty_table()
        u = g["u"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        e = g["e"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u = u[order]
        k = g["k"].to_numpy(zero_copy_only=False)[order]
        ks, code = np.unique(k, return_inverse=True)
        same = u[1:] == u[:-1]
        if not same.any():
            return part_schema.empty_table()
        # combined (prev, next) code; type cardinality is tiny so the
        # product never approaches int64.
        pair = code[:-1][same] * np.int64(ks.size) + code[1:][same]
        up, n = np.unique(pair, return_counts=True)
        return pa.table({
            "prev_type": pa.array(ks[up // ks.size], pa.string()),
            "event_type": pa.array(ks[up % ks.size], pa.string()),
            "n_p": pa.array(n.astype(np.int64), pa.int64()),
        })

    counted = two_phase_agg(
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_pairs, batch_format="pyarrow"),
        keys=["prev_type", "event_type"], sums={"n_p": "n_trans"},
    )

    out_schema = pa.schema([
        ("prev_type", pa.string()), ("event_type", pa.string()),
        ("n_trans", pa.int64()), ("pct_bp", pa.int64()),
    ])

    def normalize(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        n = g["n_trans"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "prev_type": g["prev_type"],
            "event_type": g["event_type"],
            "n_trans": pa.array(n, pa.int64()),
            "pct_bp": pa.array(n * 10000 // n.sum(), pa.int64()),
        })

    # the matrix is ≤ types² rows — the per-prev normalization groupby
    # is a driver-scale formality, not a data-plane shuffle.
    return counted.groupby("prev_type").map_groups(
        normalize, batch_format="pyarrow")


ORACLE_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), t AS (
  SELECT prev_type, event_type, count(*) AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, event_type, CAST(n AS BIGINT) AS n_trans,
       CAST(n * 10000 // sum(n) OVER (PARTITION BY prev_type)
            AS BIGINT) AS pct_bp
FROM t
"""


# ------------------------------------------------- key-set Venn split
def user_set_ops(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(segment, n_users): the Venn split of the orders customer-key
    set against the events user-key set — how many ids appear only as
    purchasers, only as event actors, or as both.

    The distributed form of the reference's seen-set membership test
    (pipelines.py:32-34) applied across TWO corpora: a full outer
    key-set comparison without materializing either side.  Scale
    shape: each side collapses to per-block distinct keys tagged with
    a side bit (map-side partial), then ONE hash exchange co-locates
    equal keys; each partition ORs the bits per key and emits three
    partial counters, so the final aggregate moves 3 rows per
    partition.  Keys-only shuffle: ~9 B/id, never the parent rows.
    """
    from whakoom_webscrapper_ray.pipelines.text import mix64

    def tagged(col: str, bit: int):
        def fn(b: pa.Table) -> pa.Table:
            u = np.unique(b[col].to_numpy(zero_copy_only=False))
            return pa.table({
                "k": pa.array(u, pa.int64()),
                "bit": pa.array(np.full(u.size, bit, np.int8)),
                "part": pa.array(
                    (mix64(u.view(np.uint64)) % np.uint64(parts))
                    .astype(np.int64)),
            })
        return fn

    both = (
        read(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(tagged("o_custkey", 1), batch_format="pyarrow")
        .union(
            read(sf_dir, "events", columns=["user_id"])
            .map_batches(tagged("user_id", 2), batch_format="pyarrow"))
    )

    part_schema = pa.schema([("segment", pa.string()),
                             ("n_p", pa.int64())])
    names = np.array(["", "orders_only", "events_only", "both"])

    def venn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return part_schema.empty_table()
        k = g["k"].to_numpy(zero_copy_only=False)
        b = g["bit"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        bits = np.zeros(uk.size, dtype=np.int8)
        np.bitwise_or.at(bits, inv, b)
        n = np.bincount(bits, minlength=4)[1:]
        keep = n > 0
        return pa.table({
            "segment": pa.array(names[1:][keep], pa.string()),
            "n_p": pa.array(n[keep].astype(np.int64), pa.int64()),
        })

    return two_phase_agg(
        both.groupby("part").map_groups(venn, batch_format="pyarrow"),
        keys=["segment"], sums={"n_p": "n_users"},
    )


ORACLE_USER_SET_OPS = """
WITH o AS (SELECT DISTINCT o_custkey AS k FROM orders),
     e AS (SELECT DISTINCT user_id AS k FROM events),
     u AS (SELECT (o.k IS NOT NULL) AS in_o, (e.k IS NOT NULL) AS in_e
           FROM o FULL OUTER JOIN e ON o.k = e.k)
SELECT CASE WHEN in_o AND in_e THEN 'both'
            WHEN in_o THEN 'orders_only'
            ELSE 'events_only' END AS segment,
       CAST(count(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""


# ------------------------------------------------- grouped moments
def qty_price_moments(sf_dir: str) -> ray.data.Dataset:
    """(l_returnflag, l_linestatus, n_rows, sum_qty, sum_price_cents,
    sum_qty_sq, sum_qty_price_cents, cov_num_cents, var_num_qty): the
    mergeable second-moment sketch of (quantity, price) per
    flag/status group, with the covariance numerator n·Σxy − Σx·Σy and
    the OLS-denominator n·Σx² − (Σx)² evaluated exactly.

    The one-pass distributed-statistics primitive: every downstream
    estimator (variance, covariance, Pearson r, OLS slope) is a pure
    function of these partials, and partials MERGE — the map side
    collapses each block to ≤|groups| rows before the exchange, so
    the shuffle is group-count-sized regardless of corpus size.
    Quantities are small integers and prices go through the
    floor-cents contract, so every sum is exact int64 (Σxy per row ≤
    5·10⁸; the int64 headroom holds to ~10¹⁰ rows per group — beyond
    that promote the merge to Python ints).  cov_num is finished on
    the merged group totals in object-precision Python ints and
    asserted back into int64, mirroring the oracle's HUGEINT
    evaluation.
    """
    li = read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice"])

    def moments(b: pa.Table) -> pa.Table:
        q = pc.cast(b["l_quantity"], pa.int64())
        p = _floor_cents(b["l_extendedprice"])
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "q": q, "p": p,
            "qq": pc.multiply_checked(q, q),
            "qp": pc.multiply_checked(q, p),
        })

    merged = two_phase_agg(
        li.map_batches(moments, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sums={"q": "sum_qty", "p": "sum_price_cents",
              "qq": "sum_qty_sq",
              "qp": "sum_qty_price_cents"},
        count_alias="n_rows",
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_rows"].to_numpy(zero_copy_only=False)
        sq = b["sum_qty"].to_numpy(zero_copy_only=False)
        sp = b["sum_price_cents"].to_numpy(zero_copy_only=False)
        sqq = b["sum_qty_sq"].to_numpy(zero_copy_only=False)
        sqp = b["sum_qty_price_cents"].to_numpy(zero_copy_only=False)
        cov = [int(nn) * int(xy) - int(x) * int(y)
               for nn, xy, x, y in zip(n, sqp, sq, sp)]
        # n·Σx² − (Σx)² — the OLS-slope denominator (slope = cov/var)
        var = [int(nn) * int(xx) - int(x) * int(x)
               for nn, xx, x in zip(n, sqq, sq)]
        assert all(-2**63 <= c < 2**63 for c in cov + var), \
            "moment numerator exceeds int64: widen the output type"
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "n_rows": pa.array(n, pa.int64()),
            "sum_qty": pa.array(sq, pa.int64()),
            "sum_price_cents": pa.array(sp, pa.int64()),
            "sum_qty_sq": pa.array(sqq, pa.int64()),
            "sum_qty_price_cents": pa.array(sqp, pa.int64()),
            "cov_num_cents": pa.array(cov, pa.int64()),
            "var_num_qty": pa.array(var, pa.int64()),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


ORACLE_QTY_PRICE_MOMENTS = """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem
), s AS (
  SELECT l_returnflag, l_linestatus,
         count(*) AS n, sum(q) AS sq, sum(p) AS sp,
         sum(q * q) AS sqq, sum(q * p) AS sqp
  FROM c GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
       CAST(n AS BIGINT) AS n_rows,
       CAST(sq AS BIGINT) AS sum_qty,
       CAST(sp AS BIGINT) AS sum_price_cents,
       CAST(sqq AS BIGINT) AS sum_qty_sq,
       CAST(sqp AS BIGINT) AS sum_qty_price_cents,
       CAST(n * sqp - sq * sp AS BIGINT) AS cov_num_cents,
       CAST(n * sqq - sq * sq AS BIGINT) AS var_num_qty
FROM s
"""


# ------------------------------------------------- customer deciles
def customer_value_deciles(sf_dir: str,
                           parts: int = 64) -> ray.data.Dataset:
    """(o_custkey, monetary_cents, decile): every customer's lifetime
    order value and their 1–10 value decile — the "M" of an RFM
    segmentation, scored against EXACT corpus-wide decile boundaries.

    Two primitives compose: the coarse-hash keyed aggregate
    (hash_keyed_agg — one exchange builds the per-customer totals) and
    the shared distributed-selection quantile engine
    (common.exact_quantiles — min/max pass, binned counts, rank-bin
    re-scan over the totals; no global sort even though the totals
    table is customer-cardinality).  The nine cut points broadcast
    driver-side and the final scoring pass is a zero-shuffle
    searchsorted map.  decile = 1 + #(cuts <= m) with percentile_disc
    cut points — duplicate cuts (mass points) skip buckets identically
    in both engines, keeping the hash compare exact.
    """
    from .common import exact_quantiles, hash_keyed_agg

    orders = read(sf_dir, "orders",
                  columns=["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "m": _floor_cents(b["o_totalprice"]),
        })

    totals = hash_keyed_agg(
        orders.map_batches(cents, batch_format="pyarrow"),
        key="o_custkey", sums={"m": "monetary_cents"}, parts=parts,
    ).materialize()   # consumed by 3 selection passes + the scorer

    qs = exact_quantiles(totals, "monetary_cents",
                         tuple(range(10, 100, 10)))
    cuts = np.array([v for _, v in qs], dtype=np.int64)

    def score(b: pa.Table) -> pa.Table:
        m = b["monetary_cents"].to_numpy(zero_copy_only=False)
        d = 1 + np.searchsorted(cuts, m, side="right")
        return pa.table({
            "o_custkey": b["o_custkey"],
            "monetary_cents": b["monetary_cents"],
            "decile": pa.array(d.astype(np.int64), pa.int64()),
        })

    return totals.map_batches(score, batch_format="pyarrow")


def _cut_sql(col: str, pcts: tuple[int, ...]) -> str:
    """percentile_disc cut-list SQL shared by BOTH scoring oracles —
    one representation, so cut semantics can never drift between
    deciles and RFM."""
    return " UNION ALL ".join(
        f"SELECT percentile_disc({p / 100}) WITHIN GROUP "
        f"(ORDER BY {col}) AS cut FROM t" for p in pcts)


def _rfm_cut_sql(col: str) -> str:
    return _cut_sql(col, (20, 40, 60, 80))


ORACLE_CUSTOMER_VALUE_DECILES = f"""
WITH t AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS m
  FROM orders GROUP BY 1
), cuts AS (
  {_cut_sql('m', tuple(range(10, 100, 10)))}
)
SELECT t.o_custkey,
       CAST(t.m AS BIGINT) AS monetary_cents,
       CAST(1 + (SELECT count(*) FROM cuts WHERE cut <= t.m)
            AS BIGINT) AS decile
FROM t
"""


# ------------------------------------------------- full RFM scoring
def customer_rfm(sf_dir: str, parts: int = 64) -> ray.data.Dataset:
    """(o_custkey, recency_days, n_orders, monetary_cents, r_score,
    f_score, m_score): the full RFM segmentation — every customer's
    recency (days since last order, against the corpus max date),
    frequency and lifetime value, each scored 1–5 against EXACT
    corpus-wide quintile boundaries.

    Composition of the engine's primitives, nothing new per-dimension:
    ONE keyed exchange builds all three per-customer metrics
    (hash_keyed_agg; max-date rides as min of the negated int64), the
    shared selection engine (common.exact_quantiles) produces four
    percentile_disc cuts per dimension over the customer-cardinality
    totals, and one zero-shuffle broadcast-searchsorted pass scores
    all three dimensions.  score = 1 + #(cuts <= v) — mechanical on
    every dimension (recency scores read "5 = longest-lapsed"), mass
    points skip buckets identically in both engines.
    """
    from .common import (collect_small, exact_quantiles_multi,
                         hash_keyed_agg)

    orders = read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def keyed(b: pa.Table) -> pa.Table:
        t = pc.cast(b["o_orderdate"], pa.int64())
        return pa.table({
            "o_custkey": b["o_custkey"],
            "m": _floor_cents(b["o_totalprice"]),
            "neg_t": pc.negate_checked(t),
        })

    totals = hash_keyed_agg(
        orders.map_batches(keyed, batch_format="pyarrow"),
        key="o_custkey", sums={"m": "monetary_cents"},
        mins={"neg_t": "neg_last_us"}, count_alias="n_orders",
        parts=parts,
    ).materialize()

    def block_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:   # empty partitions contribute NOTHING —
            # a sentinel row would win the max on all-pre-epoch corpora
            return pa.table({"mx": pa.array([], pa.int64())})
        return pa.table({"mx": pa.array(
            [-int(b["neg_last_us"].to_numpy(
                zero_copy_only=False).min())], pa.int64())})

    mx = collect_small(
        totals.map_batches(block_max, batch_format="pyarrow"),
        pa.schema([("mx", pa.int64())]))
    corpus_max_us = (int(pc.max(mx["mx"]).as_py())
                     if mx.num_rows else 0)

    def with_metrics(b: pa.Table) -> pa.Table:
        last = -b["neg_last_us"].to_numpy(zero_copy_only=False)
        rec = (corpus_max_us - last) // 86_400_000_000
        return pa.table({
            "o_custkey": b["o_custkey"],
            "recency_days": pa.array(rec.astype(np.int64), pa.int64()),
            "n_orders": b["n_orders"],
            "monetary_cents": b["monetary_cents"],
        })

    metrics = totals.map_batches(
        with_metrics, batch_format="pyarrow").materialize()

    pcts = (20, 40, 60, 80)
    qs = exact_quantiles_multi(
        metrics, ["recency_days", "n_orders", "monetary_cents"], pcts)
    cuts = {col: np.array([v for _, v in qs[col]], dtype=np.int64)
            for col in qs}

    def score(b: pa.Table) -> pa.Table:
        out = {c: b[c] for c in ("o_custkey", "recency_days",
                                 "n_orders", "monetary_cents")}
        for col, alias in (("recency_days", "r_score"),
                           ("n_orders", "f_score"),
                           ("monetary_cents", "m_score")):
            v = b[col].to_numpy(zero_copy_only=False)
            out[alias] = pa.array(
                (1 + np.searchsorted(cuts[col], v, side="right"))
                .astype(np.int64), pa.int64())
        return pa.table(out)

    return metrics.map_batches(score, batch_format="pyarrow")


ORACLE_CUSTOMER_RFM = f"""
WITH t AS (
  SELECT o_custkey,
         ((SELECT epoch_us(max(o_orderdate)) FROM orders)
          - epoch_us(max(o_orderdate))) // 86400000000 AS recency_days,
         count(*) AS n_orders,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS monetary_cents
  FROM orders GROUP BY o_custkey
), rc AS ({_rfm_cut_sql('recency_days')}),
   fc AS ({_rfm_cut_sql('n_orders')}),
   mc AS ({_rfm_cut_sql('monetary_cents')})
SELECT o_custkey,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(monetary_cents AS BIGINT) AS monetary_cents,
       CAST(1 + (SELECT count(*) FROM rc WHERE cut <= recency_days)
            AS BIGINT) AS r_score,
       CAST(1 + (SELECT count(*) FROM fc WHERE cut <= n_orders)
            AS BIGINT) AS f_score,
       CAST(1 + (SELECT count(*) FROM mc WHERE cut <= monetary_cents)
            AS BIGINT) AS m_score
FROM t
"""
