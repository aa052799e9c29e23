"""CLI entry point — usable under ``ray job submit`` (north rule).

    ray job submit -- python -m whakoom_webscrapper_ray.cli crawl \
        --synth MEDIUM --checkpoint /tmp/ckpt --num-shards 8

Subcommands
-----------
``crawl``   run (or resume) a crawl over a synthetic or on-disk web
            fixture; prints one JSON summary line.
``export``  write the finalized relational tables + docs of an existing
            checkpoint as partitioned parquet.
``get``     J2 point lookup over one exported table directory.
``query``   S7 named query (``# NAME`` .sql packs) over an export dir.

The CLI owns the Ray session (guarded ``ray.init``); the library never
calls ``ray.init``/``ray.shutdown`` itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_web(args) -> dict:
    import pyarrow.parquet as pq

    if args.web_dir:
        return {
            n: pq.read_table(os.path.join(args.web_dir, f"{n}.parquet"))
            for n in ("pages", "seeds", "robots")
        }
    from .sources.synth import (
        MEDIUM,
        SMALL,
        SynthConfig,
        generate_web,
        generate_web_fast,
    )

    spec = args.synth.upper()
    if spec == "SMALL":
        web = generate_web(SMALL)
    elif spec == "MEDIUM":
        web = generate_web(MEDIUM)
    else:
        h, l_, t = (int(x) for x in args.synth.lower().split("x"))
        web = generate_web_fast(
            SynthConfig(num_hosts=h, lists_per_profile=l_,
                        titles_per_list=t)
        )
    if getattr(args, "paginate", False):
        # S3 dynamic-pagination surface (the `scrapy crawl
        # publications` analog): explode the page store into "Load
        # more" states; the fetcher walks each URL to its terminal
        # state, and the crawl is bit-identical to the stateless one.
        from .sources.synth import paginate_pages

        web = dict(web, pages=paginate_pages(web["pages"]))
    return web


def cmd_crawl(args) -> int:
    import time

    from .pipelines.crawl import CrawlEngine

    _init_ray()
    web = _load_web(args)
    seeds = web["seeds"]
    if args.user_profile:
        # literal analog of the reference's spider argument
        # ``scrapy crawl lists -a user_profile=<name>`` (README.md:441,
        # spiders/lists.py:17-27): crawl only the seed(s) belonging to
        # that profile.
        import pyarrow.compute as pc

        seeds = seeds.filter(
            pc.match_substring(seeds["url"], f"/{args.user_profile}/")
        )
        if seeds.num_rows == 0:
            print(json.dumps({
                "error": f"no seed matches user_profile="
                         f"{args.user_profile!r}"
            }))
            return 2
    server = None
    transport = None
    pages = web["pages"]
    robots = web["robots"]
    if getattr(args, "http", False):
        # real-transport mode: serve the synthetic web over a loopback
        # socket and crawl it with the HttpFetcher — the page store is
        # never broadcast; every fetch is an actual HTTP request, and
        # the robots rules are FETCHED per host from /robots.txt at
        # seed time instead of handed over as a table
        from .functions.canonicalize import canonicalize_batch
        from .sources.httpserve import SynthWebServer
        from .stages.fetch import fetch_robots_table

        server = SynthWebServer(pages, robots=robots).__enter__()
        seed_hosts = sorted(
            set(canonicalize_batch(seeds.column("url"))["host"]))
        robots = fetch_robots_table(seed_hosts, server.host,
                                    server.port)
        transport = {"host": server.host, "port": server.port,
                     "dynamic": bool(getattr(args, "paginate", False))}
        pages = None
    eng = CrawlEngine(
        pages, seeds, robots,
        checkpoint_dir=args.checkpoint,
        num_shards=args.num_shards,
        run_id=args.run_id,
        max_pages_per_host=args.max_pages_per_host,
        adaptive_throttle=args.adaptive_throttle,
        seen_filter=args.seen_filter,
        strip_tracking_params=args.strip_tracking_params,
        host_fail_budget=args.host_fail_budget,
        transport=transport,
    )
    t0 = time.perf_counter()
    if args.resume:
        eng.resume()
        res = eng.run(max_rounds=args.max_rounds, seed=False)
    else:
        res = eng.run(max_rounds=args.max_rounds)
    dt = time.perf_counter() - t0
    out = {
        "rounds": res["rounds"],
        "scheduled": res["scheduled"],
        "sec": round(dt, 2),
        "urls_per_sec": round(res["scheduled"] / dt, 1) if dt else None,
        "checkpoint": args.checkpoint,
        "stats": res["stats"],
    }
    print(json.dumps(out))
    eng.shutdown()
    if server is not None:
        server.__exit__()
    return 0


def cmd_export(args) -> int:
    import pyarrow.parquet as pq

    from .pipelines.crawl import CrawlEngine

    _init_ray()
    web = _load_web(args)
    eng = CrawlEngine(
        web["pages"], web["seeds"], web["robots"],
        checkpoint_dir=args.checkpoint,
        num_shards=args.num_shards,
    )
    eng.resume()
    os.makedirs(args.out, exist_ok=True)
    # streaming partitioned write: one directory of worker-written
    # parquet parts per table — nothing collected on the driver.
    import pyarrow.dataset as pads

    paths = eng.write_tables(args.out)
    docs_dir = os.path.join(args.out, "docs")
    eng.docs_dataset().write_parquet(docs_dir)
    order_path = os.path.join(args.out, "crawl_order.parquet")
    pq.write_table(eng.crawl_order(), order_path)
    # next-generation seed list (incremental recrawl: `cli crawl
    # --web-dir ... ` with these seeds re-fetches this frontier)
    pq.write_table(eng.export_seeds(),
                   os.path.join(args.out, "next_seeds.parquet"))
    print(json.dumps({
        "out": args.out,
        "tables": {
            k: pads.dataset(p).count_rows() for k, p in paths.items()
        },
    }))
    eng.shutdown()
    return 0


def cmd_get(args) -> int:
    from .pipelines.crawl import get_by_id

    tbl = get_by_id(args.table_dir, args.id, key_col=args.key_col)
    print(json.dumps(tbl.to_pylist(), default=str))
    return 0


def cmd_diff(args) -> int:
    """Generation delta between two crawl-export docs dirs: print the
    per-status counts; optionally stream the full (doc_id, status)
    delta to a parquet dir (the incremental-recrawl work list)."""
    from .pipelines.dedup import docs_diff

    _init_ray()
    ds = docs_diff(args.old, args.new)
    if args.out:
        ds = ds.materialize()
        ds.write_parquet(args.out)
    import pyarrow.compute as pc

    counts: dict[str, int] = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        for row in pc.value_counts(b["status"]).to_pylist():
            counts[row["values"]] = (
                counts.get(row["values"], 0) + row["counts"])
    print(json.dumps({"counts": counts,
                      **({"out": args.out} if args.out else {})}))
    return 0


def cmd_query(args) -> int:
    from .namedq import NamedQueryStore

    store = NamedQueryStore(args.export_dir, sql_dir=args.sql_dir)
    if args.list:
        print(json.dumps(store.names()))
        return 0
    params = [
        int(x) if x.lstrip("-").isdigit() else x for x in args.param
    ]
    print(json.dumps(store.run(args.name, *params).to_pylist(),
                     default=str))
    return 0


def cmd_index(args) -> int:
    """Build one of the persisted corpus artifacts through the storage
    seam — the production "build your indexes once" entry the serving
    paths (ann_ivf_indexed / knn_graph_ivf_indexed, incremental_dedup
    index_dir, dedup-label consumers) read from:

      ivf     bucket-partitioned vector index + centroids
              (served by ann_ivf_indexed / knn_graph_ivf_indexed via
              their index_dir parameter, or auto-resolved from the
              artifact root when --out is omitted)
      lsh     minhash band table (incremental_dedup's index_dir)
      labels  near-dup cluster labels, PUBLISHED into the artifact
              root (WKM_ARTIFACT_DIR) where the dedup-label consumers
              (corpus_dedup / dedup_report / cluster_best_doc /
              corpus_prep) actually read; --out additionally exports
              a portable copy
    """
    _init_ray()
    out = args.out
    if args.kind == "ivf":
        if out:
            from .pipelines.ann import build_ivf_index

            build_ivf_index(args.sf_dir, out,
                            n_centroids=args.n_centroids)
        else:
            from .pipelines.ann import _ensure_ivf_index

            out = _ensure_ivf_index(args.sf_dir, None)
    elif args.kind == "lsh":
        if not out:
            print(json.dumps({"error": "--kind lsh requires --out"}))
            return 2
        from .pipelines.dedup import build_lsh_index

        build_lsh_index(args.sf_dir, out)
    else:  # labels: build/publish the artifact the consumers resolve
        from .pipelines.curate import (
            _ARTIFACT_ROOT,
            _corpus_version,
            dedup_labels,
        )

        labels = dedup_labels(args.sf_dir)
        published = os.path.join(
            _ARTIFACT_ROOT, "dedup_labels",
            _corpus_version(args.sf_dir))
        if out:
            from .storage import backend

            backend().write_dataset(labels, out)  # portable export
        else:
            out = published
    import glob as _glob

    n_files = len(_glob.glob(os.path.join(out, "**", "*"),
                             recursive=True))
    print(json.dumps({"kind": args.kind, "out": out,
                      "files": n_files}))
    return 0


def cmd_pipeline(args) -> int:
    """Run one data-ops / training-data pipeline from the registry over
    an sf-style parquet dir; stream the result to a parquet dir
    (replaced atomically-per-file if it already holds data — a rerun
    must not double rows) or print rows as JSON."""
    import importlib

    _init_ray()
    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    if args.list:
        print(json.dumps(sorted(qs.keys())))
        return 0
    if args.name not in qs:
        print(json.dumps({"error": f"unknown pipeline {args.name!r}"}))
        return 2
    res = qs[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if getattr(args, "stats", False) and args.out:
        print(json.dumps({
            "error": "--stats and --out are mutually exclusive "
                     "(--stats executes for diagnostics only and "
                     "would silently skip the write)"
        }))
        return 2
    if getattr(args, "stats", False):
        # tuning feedback loop: execute the pipeline and print Ray
        # Data's per-operator execution stats (wall time, blocks,
        # rows, memory) so a stage dominated by overhead instead of
        # useful compute is visible from the CLI
        if not isinstance(res, ray.data.Dataset):
            print(json.dumps({
                "pipeline": args.name,
                "stats": "driver-side result (no Dataset plan)",
            }))
            return 0
        res = res.materialize()
        print(json.dumps({
            "pipeline": args.name, "rows": res.count(),
        }))
        print(res.stats())
        return 0
    if args.out:
        if not isinstance(res, ray.data.Dataset):
            tbl = (pa.Table.from_pandas(res, preserve_index=False)
                   if isinstance(res, pd.DataFrame) else res)
            res = ray.data.from_arrow(tbl)
        # write_parquet only ADDS uuid-named files; a rerun into a
        # non-empty dir would silently double every row and the
        # printed count, so clear prior output first
        if os.path.isdir(args.out) and os.listdir(args.out):
            import shutil

            shutil.rmtree(args.out)
        res.write_parquet(args.out)
        import pyarrow.dataset as pds

        print(json.dumps({
            "pipeline": args.name, "out": args.out,
            "rows": pds.dataset(args.out, format="parquet").count_rows(),
        }))
        return 0
    if isinstance(res, ray.data.Dataset):
        rows = res.limit(args.limit).take_all()
    else:
        tbl = (pa.Table.from_pandas(res, preserve_index=False)
               if isinstance(res, pd.DataFrame) else res)
        rows = tbl.slice(0, args.limit).to_pylist()
    print(json.dumps(rows, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="whakoom_webscrapper_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--web-dir", default=None,
                        help="dir with pages/seeds/robots parquet")
        sp.add_argument("--synth", default="SMALL",
                        help="SMALL | MEDIUM | <hosts>x<lists>x<titles>")
        sp.add_argument("--checkpoint", required=True)
        sp.add_argument("--num-shards", type=int, default=8)
        sp.add_argument("--run-id", default="run0")

    c = sub.add_parser("crawl", help="run or resume a crawl")
    common(c)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--max-rounds", type=int, default=None)
    c.add_argument("--user-profile", default=None,
                   help="crawl only the seed(s) of this profile "
                        "(reference: scrapy crawl lists -a "
                        "user_profile=<name>)")
    c.add_argument("--max-pages-per-host", type=int, default=None,
                   help="O4 pagination budget: cap total pages "
                        "scheduled per host across all rounds")
    c.add_argument("--http", action="store_true",
                   help="real-transport mode: serve the synthetic web "
                        "over a loopback HTTP socket and crawl it via "
                        "HttpFetcher (with --paginate the fetcher runs "
                        "the dynamic Load-more loop over page states)")
    c.add_argument("--paginate", action="store_true",
                   help="S3 dynamic pagination: serve the synthetic "
                        "web as cumulative 'Load more' page states "
                        "(scrapy crawl publications analog); the "
                        "crawl result is identical to the stateless "
                        "store")
    c.add_argument("--adaptive-throttle", action="store_true",
                   help="T5 AutoThrottle analog: per-host EWMA of "
                        "observed fetch latency paces the politeness "
                        "clock (reference settings.py:119-128 "
                        "defaults; off = deterministic fixed-delay "
                        "clock, the oracle-canonical mode)")
    c.add_argument("--host-fail-budget", type=int, default=None,
                   help="X2+ circuit breaker: quarantine a host after "
                        "this many failed fetches (pending candidates "
                        "from it are dropped at poll time; opt-in)")
    c.add_argument("--strip-tracking-params", action="store_true",
                   help="drop utm_*/fbclid/gclid-style query params "
                        "during canonicalization (opt-in; off = "
                        "RFC-only, the oracle-canonical mode)")
    c.add_argument("--seen-filter", choices=("cuckoo", "bloom"),
                   default="cuckoo",
                   help="URL-seen fast-path filter (north rule: "
                        "bloom/cuckoo); both are exact-backed, so the "
                        "crawl result is identical either way")
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("export", help="export finalized tables")
    common(e)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export)

    d = sub.add_parser(
        "diff", help="added/removed/changed delta between two "
                     "crawl-export docs dirs (recrawl work list)")
    d.add_argument("--old", required=True, help="previous docs dir")
    d.add_argument("--new", required=True, help="current docs dir")
    d.add_argument("--out", default=None,
                   help="write the full delta as partitioned parquet")
    d.set_defaults(fn=cmd_diff)

    g = sub.add_parser("get", help="J2 point lookup over an exported "
                                   "table (GET_LIST_BY_ID analog)")
    g.add_argument("--table-dir", required=True)
    g.add_argument("--id", required=True, type=int)
    g.add_argument("--key-col", default=None)
    g.set_defaults(fn=cmd_get)

    q = sub.add_parser(
        "query",
        help="S7 named query over an export dir (reference "
             "sqlmanager named-query surface)")
    q.add_argument("--export-dir", required=True,
                   help="cli export output dir (tables become views)")
    q.add_argument("--name", default=None, help="query name, e.g. "
                   "GET_LISTS_BY_STATUS")
    q.add_argument("--param", action="append", default=[],
                   help="positional ? parameter (repeatable)")
    q.add_argument("--sql-dir", default=None,
                   help="dir of '# NAME' .sql packs (default: shipped)")
    q.add_argument("--list", action="store_true",
                   help="list available query names")
    q.set_defaults(fn=cmd_query)

    pl = sub.add_parser(
        "pipeline",
        help="run a data-ops / training-data pipeline from the "
             "__ray_entry__ registry over an sf-style parquet dir")
    pl.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="dir of <table>.parquet inputs")
    pl.add_argument("--name", default=None,
                    help="pipeline name, e.g. dedup_clusters")
    pl.add_argument("--out", default=None,
                    help="write result as partitioned parquet here "
                         "instead of printing")
    pl.add_argument("--stats", action="store_true",
                    help="run the pipeline and print Ray Data's "
                         "per-operator execution stats")
    pl.add_argument("--limit", type=int, default=100,
                    help="max rows to print without --out")
    pl.add_argument("--list", action="store_true",
                    help="list available pipeline names")
    pl.set_defaults(fn=cmd_pipeline)

    ix = sub.add_parser(
        "index", help="build a persisted corpus artifact "
                      "(ivf / lsh / labels) through the storage seam")
    ix.add_argument("--kind", choices=("ivf", "lsh", "labels"),
                    required=True)
    ix.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ix.add_argument("--out", default=None,
                    help="explicit output dir; omitted -> publish "
                         "into the artifact root the serving paths "
                         "resolve (labels/ivf)")
    ix.add_argument("--n-centroids", type=int, default=16)
    ix.set_defaults(fn=cmd_index)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
