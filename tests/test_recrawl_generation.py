"""Incremental recrawl generation: seed the next crawl from the prior
generation's crawl order, fetch against a mutated web, and identify
the changed pages — the engine-side pairing of the snapshot_diff
analytics operator (the reference's upsert/pending-sweep semantics at
corpus scale: a recrawl touches the delta)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _doc_texts(eng) -> dict[str, str]:
    """canon_url -> concatenated span text of every FETCHED doc."""
    out = {}
    for b in eng.docs_dataset().iter_batches(batch_format="pyarrow"):
        flat = b["spans"].combine_chunks()
        parent = pc.list_parent_indices(flat)
        texts = pc.list_flatten(flat).field("text")
        urls = b["doc_id"].take(parent)
        for u, t in zip(urls.to_pylist(), texts.to_pylist()):
            out[u] = out.get(u, "") + "\x1f" + t
    return out


def test_recrawl_generation_finds_mutations(ray_session, small_web,
                                            tmp_path):
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    gen0 = CrawlEngine(
        small_web["pages"], small_web["seeds"], small_web["robots"],
        checkpoint_dir=str(tmp_path / "gen0"), num_shards=4,
    )
    gen0.run()
    seeds1 = gen0.export_seeds()
    order0 = set(gen0.crawl_order()["url"].to_pylist())
    assert seeds1.num_rows == len(order0)

    # mutate the text of every 10th page (deterministic target set)
    pages = small_web["pages"]
    mutated_ids = set(pages["doc_id"].to_pylist()[::10])

    def mutate(spans, hit):
        if not hit:
            return spans
        return [{**sp, "text": sp["text"] + " v2"} for sp in spans]

    new_pages = pa.table({
        "doc_id": pages["doc_id"],
        "spans": pa.array(
            [mutate(sp, d in mutated_ids)
             for d, sp in zip(pages["doc_id"].to_pylist(),
                              pages["spans"].to_pylist())],
            pages.schema.field("spans").type),
    })

    gen1 = CrawlEngine(
        new_pages, seeds1, small_web["robots"],
        checkpoint_dir=str(tmp_path / "gen1"), num_shards=4,
    )
    gen1.run()
    order1 = set(gen1.crawl_order()["url"].to_pylist())
    # every gen0 URL is re-scheduled (it is now a seed)
    assert order0 <= order1

    t0, t1 = _doc_texts(gen0), _doc_texts(gen1)
    # fetched both generations: same page set (mutation edits text only)
    assert set(t0) == set(t1)
    changed = {u for u in t0 if t0[u] != t1[u]}
    expected = {u for u in t0 if u in mutated_ids}
    assert changed == expected and changed, (
        len(changed), len(expected))
    gen0.shutdown()
    gen1.shutdown()


def test_docs_diff_between_generations(ray_session, small_web,
                                       tmp_path):
    """docs_diff over two real engine exports pinpoints exactly the
    mutated pages as 'changed' (added/removed empty here: both
    generations fetch the same URL set)."""
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine
    from whakoom_webscrapper_ray.pipelines.dedup import docs_diff

    gen0 = CrawlEngine(
        small_web["pages"], small_web["seeds"], small_web["robots"],
        checkpoint_dir=str(tmp_path / "g0"), num_shards=4)
    gen0.run()
    d0 = str(tmp_path / "docs0")
    gen0.docs_dataset().map_batches(
        lambda t: t.select(["doc_id", "spans"]),
        batch_format="pyarrow").write_parquet(d0)

    pages = small_web["pages"]
    mutated = set(pages["doc_id"].to_pylist()[::10])
    new_pages = pa.table({
        "doc_id": pages["doc_id"],
        "spans": pa.array(
            [[{**sp, "text": sp["text"] + " v2"} for sp in spans]
             if d in mutated else spans
             for d, spans in zip(pages["doc_id"].to_pylist(),
                                 pages["spans"].to_pylist())],
            pages.schema.field("spans").type),
    })
    gen1 = CrawlEngine(
        new_pages, gen0.export_seeds(), small_web["robots"],
        checkpoint_dir=str(tmp_path / "g1"), num_shards=4)
    gen1.run()
    d1 = str(tmp_path / "docs1")
    gen1.docs_dataset().map_batches(
        lambda t: t.select(["doc_id", "spans"]),
        batch_format="pyarrow").write_parquet(d1)

    diff = docs_diff(d0, d1, parts=8).to_pandas()
    fetched0 = set()
    for b in gen0.docs_dataset().iter_batches(batch_format="pyarrow"):
        fetched0 |= set(b["doc_id"].to_pylist())
    expected_changed = {u for u in fetched0 if u in mutated}
    assert set(diff[diff.status == "changed"].doc_id) \
        == expected_changed and expected_changed
    assert (diff.status == "changed").all()
    gen0.shutdown()
    gen1.shutdown()


def test_docs_diff_added_removed(ray_session, tmp_path):
    """All four fates over hand-built export dirs: present-only-in-new
    is added, only-in-old removed, span mutation (text OR order) is
    changed, identical spans absent."""
    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.pipelines.dedup import docs_diff
    from whakoom_webscrapper_ray.schemas import PAGES_SCHEMA

    def tbl(rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows]),
            "spans": pa.array([r[1] for r in rows],
                              PAGES_SCHEMA.field("spans").type),
        }).cast(PAGES_SCHEMA)

    sp = lambda t, o: {"kind": "text", "text": t, "media_ref": "",  # noqa: E731
                       "offset": o}
    old = tbl([("u/keep", [sp("a", 0), sp("b", 1)]),
               ("u/gone", [sp("x", 0)]),
               ("u/edit", [sp("a", 0), sp("b", 1)]),
               ("u/reorder", [sp("a", 0), sp("b", 1)])])
    new = tbl([("u/keep", [sp("a", 0), sp("b", 1)]),
               ("u/new", [sp("n", 0)]),
               ("u/edit", [sp("a", 0), sp("B", 1)]),
               ("u/reorder", [sp("b", 0), sp("a", 1)])])
    d0, d1 = str(tmp_path / "o"), str(tmp_path / "n")
    import os
    os.makedirs(d0); os.makedirs(d1)
    pq.write_table(old, f"{d0}/part.parquet")
    pq.write_table(new, f"{d1}/part.parquet")
    res = docs_diff(d0, d1, parts=4).to_pandas()
    got = dict(zip(res.doc_id, res.status))
    assert got == {"u/gone": "removed", "u/new": "added",
                   "u/edit": "changed", "u/reorder": "changed"}


def test_cli_diff_subcommand(tmp_path):
    """`cli diff --old A --new B` prints per-status counts and writes
    the delta parquet."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.schemas import PAGES_SCHEMA

    sp = lambda t, o: {"kind": "text", "text": t, "media_ref": "",  # noqa: E731
                       "offset": o}
    old = pa.table({
        "doc_id": pa.array(["u/keep", "u/gone", "u/edit"]),
        "spans": pa.array([[sp("a", 0)], [sp("x", 0)], [sp("e", 0)]],
                          PAGES_SCHEMA.field("spans").type),
    }).cast(PAGES_SCHEMA)
    new = pa.table({
        "doc_id": pa.array(["u/keep", "u/new", "u/edit"]),
        "spans": pa.array([[sp("a", 0)], [sp("n", 0)], [sp("E", 0)]],
                          PAGES_SCHEMA.field("spans").type),
    }).cast(PAGES_SCHEMA)
    d0, d1 = str(tmp_path / "o"), str(tmp_path / "n")
    os.makedirs(d0); os.makedirs(d1)
    pq.write_table(old, f"{d0}/p.parquet")
    pq.write_table(new, f"{d1}/p.parquet")
    out = subprocess.run(
        [sys.executable, "-m", "whakoom_webscrapper_ray.cli", "diff",
         "--old", d0, "--new", d1, "--out", str(tmp_path / "delta")],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr[-1500:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["counts"] == {"added": 1, "removed": 1, "changed": 1}
    got = pq.read_table(str(tmp_path / "delta"))
    assert got.num_rows == 3
