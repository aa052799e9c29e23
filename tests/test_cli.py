"""CLI surface (the ``ray job submit`` analog): crawl → export →
get → query driven in-process through ``main(argv)`` — ``_init_ray``
is guarded, so the commands run against the session Ray fixture."""

from __future__ import annotations

import json
import os


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_crawl_export_get_query(ray_session, tmp_path, capsys):
    from whakoom_webscrapper_ray.cli import main

    ckpt = str(tmp_path / "ckpt")
    assert main(["crawl", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2"]) == 0
    out = _last_json(capsys)
    assert out["rounds"] == 3 and out["scheduled"] == 168

    exp = str(tmp_path / "out")
    assert main(["export", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2", "--out", exp]) == 0
    out = _last_json(capsys)
    assert out["tables"]["lists"] == 32
    assert out["tables"]["junction"] == 190
    assert os.path.exists(os.path.join(exp, "crawl_order.parquet"))

    # J2 point lookup over the export
    assert main(["get", "--table-dir", os.path.join(exp, "lists"),
                 "--id", "100000"]) == 0
    rows = _last_json(capsys)
    assert len(rows) == 1 and rows[0]["list_id"] == 100000

    # S7 named queries over the same export
    assert main(["query", "--export-dir", exp, "--list"]) == 0
    names = _last_json(capsys)
    assert "GET_LIST_BY_ID" in names
    assert main(["query", "--export-dir", exp, "--name",
                 "GET_LIST_BY_ID", "--param", "100000"]) == 0
    rows = _last_json(capsys)
    assert len(rows) == 1 and rows[0]["list_id"] == 100000


def test_cli_user_profile_filter(ray_session, tmp_path, capsys):
    """Spider-arg analog (scrapy crawl lists -a user_profile=NAME,
    reference README.md:441): seed filter to one profile's crawl."""
    from whakoom_webscrapper_ray.cli import main

    ckpt = str(tmp_path / "ckpt_profile")
    assert main(["crawl", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2", "--user-profile", "user0_0"]) == 0
    out = _last_json(capsys)
    assert 0 < out["scheduled"] < 168   # one profile, not the full web

    exp = str(tmp_path / "out_profile")
    assert main(["export", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2", "--out", exp]) == 0
    _last_json(capsys)
    import pyarrow.dataset as pads

    lists = pads.dataset(os.path.join(exp, "lists")).to_table()
    assert lists.num_rows > 0
    assert set(lists.column("user_profile").to_pylist()) == {"user0_0"}

    # unknown profile: explicit error, nonzero exit
    assert main(["crawl", "--synth", "SMALL",
                 "--checkpoint", str(tmp_path / "ckpt_none"),
                 "--num-shards", "2",
                 "--user-profile", "nobody"]) == 2
    assert "error" in _last_json(capsys)


def test_cli_max_pages_budget(ray_session, tmp_path, capsys):
    """O4 pagination budget through the CLI: 8 hosts × 7 pages and the
    title round is cut entirely (verify-recipe golden numbers)."""
    from whakoom_webscrapper_ray.cli import main

    ckpt = str(tmp_path / "ckpt_budget")
    assert main(["crawl", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2", "--max-pages-per-host", "7"]) == 0
    out = _last_json(capsys)
    # golden numbers from the sequential oracle under the same budget
    from whakoom_webscrapper_ray.oracle import run_oracle
    from whakoom_webscrapper_ray.sources.synth import SMALL, generate_web

    w = generate_web(SMALL)
    g = run_oracle(w["pages"], w["seeds"], w["robots"],
                   max_pages_per_host=7)
    want_rounds = max(r for *_, r in g.crawl_order) + 1
    assert out["scheduled"] == len(g.crawl_order) == 56
    assert out["rounds"] == want_rounds


def test_cli_resume(ray_session, tmp_path, capsys):
    """--resume picks up a killed crawl from its checkpoint and
    finishes it: cumulative scheduled count reaches the full 168."""
    from whakoom_webscrapper_ray.cli import main

    ckpt = str(tmp_path / "ckpt_resume")
    assert main(["crawl", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2", "--max-rounds", "1"]) == 0
    out1 = _last_json(capsys)
    assert out1["scheduled"] == 8          # seeds only, then "crash"

    assert main(["crawl", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2", "--resume"]) == 0
    out2 = _last_json(capsys)
    assert out2["scheduled"] == 168        # global_seq is cumulative


def test_cli_pipeline(ray_session, tmp_path, capsys):
    """`cli pipeline` runs a registry pipeline over an sf dir: --list
    names it, --out streams partitioned parquet (resumable output),
    no --out prints rows."""
    import pyarrow.dataset as pds

    from whakoom_webscrapper_ray.cli import main

    assert main(["pipeline", "--list"]) == 0
    names = _last_json(capsys)
    assert "exact_dedup" in names and "dedup_clusters" in names

    assert main(["pipeline", "--name", "quality_sample",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--limit", "5"]) == 0
    rows = _last_json(capsys)
    assert len(rows) == 5 and {"doc_id", "quality_ok",
                               "samp_bucket"} <= set(rows[0])

    out = str(tmp_path / "ts")
    assert main(["pipeline", "--name", "token_stats",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out]) == 0
    summary = _last_json(capsys)
    assert summary["rows"] == 500
    assert pds.dataset(out, format="parquet").count_rows() == 500

    # rerun into the same --out (retry after an interruption) must
    # REPLACE the prior output, not add a second uuid-named copy of
    # every row
    assert main(["pipeline", "--name", "token_stats",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out]) == 0
    assert _last_json(capsys)["rows"] == 500
    assert pds.dataset(out, format="parquet").count_rows() == 500

    assert main(["pipeline", "--name", "nope"]) == 2


def test_cli_index(ray_session, tmp_path, capsys):
    """`cli index` builds the persisted artifacts the serving paths
    consume: the ivf index is immediately queryable via
    ann_ivf_indexed(index_dir=...), and the labels table round-trips
    through the storage seam."""
    from whakoom_webscrapper_ray.cli import main
    from whakoom_webscrapper_ray.pipelines.ann import ann_ivf_indexed
    from whakoom_webscrapper_ray.storage import backend

    sf = "/root/testdata/sf0.001"
    ivf = str(tmp_path / "ivf")
    assert main(["index", "--kind", "ivf", "--sf-dir", sf,
                 "--out", ivf]) == 0
    info = _last_json(capsys)
    assert info["kind"] == "ivf" and info["files"] > 1
    got = ann_ivf_indexed(sf, index_dir=ivf).to_pandas()
    assert len(got) > 0

    lab = str(tmp_path / "labels")
    assert main(["index", "--kind", "labels", "--sf-dir", sf,
                 "--out", lab]) == 0
    t = backend().read_dataset(
        lab, columns=["doc_id", "cluster_id"]).to_pandas()
    assert len(t) == 500 and (t["cluster_id"] <= t["doc_id"]).all()


def test_cli_paginate(ray_session, tmp_path, capsys):
    """--paginate serves the web as 'Load more' page states; the crawl
    schedule is identical to the stateless store (S3 CLI surface)."""
    from whakoom_webscrapper_ray.cli import main

    ckpt = str(tmp_path / "ckpt_pag")
    assert main(["crawl", "--synth", "SMALL", "--checkpoint", ckpt,
                 "--num-shards", "2", "--paginate"]) == 0
    out = _last_json(capsys)
    assert out["rounds"] == 3 and out["scheduled"] == 168


def test_cli_pipeline_stats(ray_session, capsys):
    """--stats executes the pipeline and prints per-operator execution
    stats (the tuning feedback surface)."""
    from whakoom_webscrapper_ray.cli import main

    assert main(["pipeline", "--name", "token_stats",
                 "--sf-dir", "/root/testdata/sf0.001", "--stats"]) == 0
    out = capsys.readouterr().out
    assert '"rows": 500' in out
    assert "Operator" in out and "wall time" in out


def test_cli_crawl_all_optins_compose(tmp_path):
    """The opt-in knobs compose: bloom seen filter + tracking strip +
    circuit breaker + pagination budget in one run still crawls SMALL
    and reports the O4-bounded schedule."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "whakoom_webscrapper_ray.cli", "crawl",
         "--synth", "SMALL", "--checkpoint", str(tmp_path / "ks"),
         "--num-shards", "4", "--seen-filter", "bloom",
         "--strip-tracking-params", "--host-fail-budget", "50",
         "--max-pages-per-host", "7"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    # the SMALL fixture has no tracking-decorated or failing-host
    # pathologies, so the O4 budget alone shapes the schedule: the
    # documented {"rounds": 3, "scheduled": 56} oracle figure
    assert res["rounds"] == 3 and res["scheduled"] == 56
