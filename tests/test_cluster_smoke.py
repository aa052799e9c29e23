"""Multi-node smoke: the crawl CLI against a REAL two-process Ray
cluster (``ray start --head`` + one worker process), not the in-process
local mode every other test uses.

The north rule's scaling criterion talks about ``ray job submit`` at N
vs 4N nodes; this sandbox has no dashboard (so no job-submission
server), but a head + worker cluster of separate processes exercises
the same seams that matter for multi-node correctness: cross-process
actor placement (frontier shards and Ray Data workers land on BOTH
nodes), object transfer between nodes, and a driver that attaches with
``RAY_ADDRESS`` instead of owning a local instance
(cli.py:31 — the CLI honors the env var by design).

Everything runs in subprocesses so the pytest session's own local Ray
(conftest ray_session) is never touched.  Skips rather than fails when
the sandbox cannot start a cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

_PORT = 6390
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env=None, timeout=180):
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout,
        cwd=_REPO, env=env,
    )


# Unique marker embedded in the cluster's --temp-dir so teardown can
# kill EXACTLY this cluster's processes (the head's session dir appears
# on the command line of every process of BOTH nodes — the worker
# reuses it for its socket paths).  `ray stop` is NOT usable here: it
# kills every Ray process of this user on the machine, including the
# pytest session's own local Ray — the whole suite then dies silently
# at the next Ray-using test.  The dir must be SHORT: socket paths live
# under it and AF_UNIX caps them at 107 bytes.
_TMP_MARK = f"wkm_smoke_{_PORT}"
_TMP_DIR = f"/tmp/{_TMP_MARK}"


def _kill_cluster(env):
    import time

    subprocess.run(["pkill", "-f", _TMP_MARK], env=env,
                   capture_output=True)
    for _ in range(20):   # processes exit asynchronously
        alive = subprocess.run(["pgrep", "-f", _TMP_MARK],
                               capture_output=True)
        if alive.returncode != 0:
            return
        time.sleep(0.25)
    subprocess.run(["pkill", "-9", "-f", _TMP_MARK], env=env,
                   capture_output=True)


@pytest.fixture(scope="module")
def two_node_cluster():
    if shutil.which("pkill") is None:
        pytest.skip("pkill unavailable — cannot scope cluster teardown")
    shutil.rmtree(_TMP_DIR, ignore_errors=True)
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    head = _run(
        ["ray", "start", "--head", f"--port={_PORT}", "--num-cpus=2",
         "--include-dashboard=false", "--disable-usage-stats",
         f"--temp-dir={_TMP_DIR}"],
        env=env,
    )
    if head.returncode != 0:
        _kill_cluster(env)
        pytest.skip(f"cannot start ray head: {head.stderr[-300:]}")
    worker = _run(
        ["ray", "start", f"--address=127.0.0.1:{_PORT}", "--num-cpus=2",
         "--disable-usage-stats"],
        env=env,
    )
    try:
        if worker.returncode != 0:
            pytest.skip(f"cannot start ray worker: {worker.stderr[-300:]}")
        env["RAY_ADDRESS"] = f"127.0.0.1:{_PORT}"
        yield env
    finally:
        _kill_cluster(env)
        shutil.rmtree(_TMP_DIR, ignore_errors=True)


def test_crawl_cli_on_two_node_cluster(two_node_cluster, tmp_path):
    env = dict(two_node_cluster)
    env["PYTHONPATH"] = _REPO

    # the cluster really is two alive nodes / 4 CPUs
    probe = _run(
        [sys.executable, "-c",
         "import ray; ray.init(address='auto');"
         "import json; print(json.dumps(["
         "sum(1 for n in ray.nodes() if n['Alive']),"
         "ray.cluster_resources().get('CPU')]))"],
        env=env,
    )
    assert probe.returncode == 0, probe.stderr[-500:]
    nodes, cpus = json.loads(probe.stdout.strip().splitlines()[-1])
    assert nodes == 2 and cpus == 4.0

    ckpt = str(tmp_path / "ckpt")
    res = _run(
        [sys.executable, "-m", "whakoom_webscrapper_ray.cli", "crawl",
         "--synth", "SMALL", "--checkpoint", ckpt, "--num-shards", "4"],
        env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-800:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    # identical schedule to the single-process runs (conformance golden)
    assert out["rounds"] == 3
    assert out["scheduled"] == 168
    by_round = [(s["scheduled"], s["fetched"], s["missing"])
                for s in out["stats"]]
    # robots Allow/wildcard fixture: one settings candidate blocked,
    # one /comics/*0$ title carved back in
    assert by_round == [(8, 8, 0), (47, 32, 15), (113, 113, 0)]
