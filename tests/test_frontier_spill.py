"""Streaming spill-merge unit tests, at the FrontierShard level.

The engine-level spill conformance test (test_crawl_conformance.py)
proves end-to-end equality; these drive the shard directly to pin the
merge semantics the streaming path must preserve:

- global min-ok dedup: when a SHA's first-discovered (lowest-``ok``)
  occurrence lives in a LATER spill run than a higher-ok duplicate,
  the low-ok row still wins (its priority/row is scheduled);
- chunked processing (tiny ``poll_chunk_rows``) is byte-equal to the
  single-pass no-spill shard, including politeness pacing/ranks;
- spill runs are consumed and deleted by the poll, not rehydrated
  into ``pending``.

FrontierShard is a plain class (Ray wraps it as an actor); with
``local_seen=True`` everything here runs in-process — no cluster.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from whakoom_webscrapper_ray.state.frontier import FrontierShard

# the actor decorator wraps the plain class; drive it in-process
FrontierShard = FrontierShard.__ray_actor_class__  # type: ignore


def _rows(urls, priorities, oks, delays=None):
    """Candidate rows for enqueue(); sha/host derived from the url."""
    hosts = [u.split("/")[2] for u in urls]
    return dict(
        canon_url=list(urls),
        url_sha1=[hashlib.sha1(u.encode()).digest() for u in urls],
        host=hosts,
        host_hash=[
            int.from_bytes(
                hashlib.sha1(h.encode()).digest()[:8], "little"
            )
            for h in hosts
        ],
        priority=list(priorities),
        ok=list(oks),
    )


def _mk(tmp, spill, **kw):
    return FrontierShard(
        shard_id=0,
        num_shards=1,
        robots={"slow.example": 2.0},
        spill_dir=str(tmp / "spill") if spill else None,
        spill_threshold_rows=4 if spill else 1 << 22,
        **kw,
    )


def _urls(n, host="a.example"):
    return [f"http://{host}/p{i}" for i in range(n)]


def test_min_ok_winner_across_runs(tmp_path):
    """Low-ok occurrence in a LATER spill run still wins the dedup."""
    dup = "http://a.example/dup"
    # run 1 (spilled first): dup at ok=50, filler to cross threshold
    batch1 = _rows(
        [dup] + _urls(4), [9, 1, 1, 1, 1], [50, 10, 11, 12, 13]
    )
    # run 2: the same sha at ok=5 — first-discovered, must win and
    # carry ITS priority (2), not the earlier-enqueued row's 9.
    batch2 = _rows(
        [dup] + _urls(4, "b.example"), [2, 1, 1, 1, 1],
        [5, 20, 21, 22, 23],
    )
    spilled = _mk(tmp_path, spill=True, poll_chunk_rows=3)
    plain = _mk(tmp_path, spill=False)
    for shard in (spilled, plain):
        shard.enqueue(**batch1)
        shard.enqueue(**batch2)
    assert spilled.spill_count >= 2

    got = spilled.poll_round(0)
    want = plain.poll_round(0)
    assert got.equals(want)
    d = {
        u: (p, o) for u, p, o in zip(
            got.column("canon_url").to_pylist(),
            got.column("priority").to_pylist(),
            got.column("ok").to_pylist(),
        )
    }
    assert d[dup] == (2, 5)
    # runs were consumed, deleted from disk, and NOT rehydrated
    assert spilled._spill_files == []
    assert spilled.pending == []
    assert os.listdir(str(tmp_path / "spill")) == []


def test_chunked_merge_equals_single_pass(tmp_path):
    """Randomized interleaved backlog: tiny chunks ≡ one-shot poll,
    including politeness fetch_time/rank for a delayed host."""
    rng = np.random.default_rng(7)
    hosts = ["a.example", "b.example", "slow.example"]
    urls, prios, oks = [], [], []
    for i in range(60):
        h = hosts[int(rng.integers(0, 3))]
        # ~25% duplicate URLs so cross-run dedup has work to do
        uid = int(rng.integers(0, 45))
        urls.append(f"http://{h}/page{uid}")
        prios.append(int(rng.integers(0, 4)))
        oks.append(int(rng.integers(0, 1000)))
    spilled = _mk(tmp_path, spill=True, poll_chunk_rows=2)
    plain = _mk(tmp_path, spill=False)
    for lo in range(0, 60, 5):
        sl = slice(lo, lo + 5)
        b = _rows(urls[sl], prios[sl], oks[sl])
        spilled.enqueue(**b)
        plain.enqueue(**b)
    assert spilled.spill_count > 3

    got = spilled.poll_round(0)
    want = plain.poll_round(0)
    assert got.equals(want)
    assert got.num_rows > 0

    # second poll after more enqueues: seen-set state carried equally
    extra = _rows(urls[:10], prios[:10], [o + 2000 for o in oks[:10]])
    fresh = _rows(
        ["http://slow.example/new1", "http://a.example/new2"],
        [0, 0], [3000, 3001],
    )
    for shard in (spilled, plain):
        shard.enqueue(**extra)
        shard.enqueue(**fresh)
    got2 = spilled.poll_round(1)
    want2 = plain.poll_round(1)
    assert got2.equals(want2)
    # everything in `extra` was already seen; only the fresh rows pass
    assert set(got2.column("canon_url").to_pylist()) == {
        "http://slow.example/new1", "http://a.example/new2"
    }


def test_checkpoint_links_spill_runs(tmp_path):
    """dump_to snapshots spilled runs as hard links (no rehydration);
    restore re-links them into the new incarnation's spill dir; the
    next poll consumes the re-links and leaves the checkpoint intact,
    so a SECOND restore from the same checkpoint still works."""
    b = _rows(_urls(12), [0] * 12, list(range(12)))
    shard = _mk(tmp_path, spill=True, poll_chunk_rows=4)
    shard.enqueue(**b)
    assert shard.spill_count >= 1 and shard._spill_files

    ckpt = str(tmp_path / "shard-0.pkl")
    shard.dump_to(ckpt)
    # no rehydration at dump time: backlog still on disk, heap empty
    assert shard.pending == [] and shard._spill_files
    snap = os.listdir(ckpt + ".spill")
    assert len(snap) == len(shard._spill_files)

    def restore_and_poll():
        s2 = _mk(tmp_path, spill=True, poll_chunk_rows=4)
        s2.restore_from(ckpt)
        assert s2._spill_files  # re-linked, not loaded into pending
        assert s2.pending == []
        return s2.poll_round(0)

    out1 = restore_and_poll()
    # the poll deleted ITS runs but the checkpoint snapshot survives
    assert sorted(os.listdir(ckpt + ".spill")) == sorted(snap)
    out2 = restore_and_poll()  # second resume from the same round
    assert out1.equals(out2)
    assert out1.num_rows == 12


def test_spill_merge_dedups_without_seen_state(tmp_path):
    """Regression: with no seen state (local_seen=False, no shard),
    a SHA whose duplicates span two merge chunks must still collapse
    to its min-ok occurrence — the per-poll emitted filter carries
    across chunks (the non-spill path sees the whole backlog at once)."""
    dup = "http://a.example/dup"
    spilled = _mk(tmp_path, spill=True, poll_chunk_rows=2,
                  local_seen=False)
    plain = _mk(tmp_path, spill=False, local_seen=False)
    # duplicates far apart in ok so they land in different chunks/runs
    b1 = _rows([dup] + _urls(4), [3, 1, 1, 1, 1], [900, 1, 2, 3, 4])
    b2 = _rows([dup] + _urls(4, "b.example"), [0, 1, 1, 1, 1],
               [5, 10, 11, 12, 13])
    for shard in (spilled, plain):
        shard.enqueue(**b1)
        shard.enqueue(**b2)
    assert spilled.spill_count >= 2
    got = spilled.poll_round(0)
    want = plain.poll_round(0)
    assert got.equals(want)
    urls = got.column("canon_url").to_pylist()
    assert urls.count(dup) == 1
    d = dict(zip(urls, got.column("ok").to_pylist()))
    assert d[dup] == 5


# ---------------------------------------------------------------- property
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(deadline=None, max_examples=30)
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 20),    # uid → ~heavy URL duplication
            st.integers(0, 3),     # priority
            st.integers(0, 6),     # ok drawn from a TINY range: most
        ),                         # rows tie at the merge frontier,
        min_size=1, max_size=48,   # exercising the stall-refill branch
    ),
    chunk=st.integers(1, 3),
    batch=st.integers(1, 7),
)
def test_streaming_poll_property(tmp_path_factory, data, chunk, batch):
    """For ANY backlog shape — duplicate SHAs across runs, equal-ok
    ties at the safe frontier, chunk size down to 1 — the streaming
    spill merge is byte-equal to the single-pass no-spill poll."""
    tmp = tmp_path_factory.mktemp("prop_spill")
    hosts = ["a.example", "b.example", "slow.example"]
    urls = [f"http://{hosts[u % 3]}/p{u}" for u, _, _ in data]
    prios = [p for _, p, _ in data]
    oks = [o for _, _, o in data]

    spilled = _mk(tmp, spill=True, poll_chunk_rows=chunk)
    plain = _mk(tmp, spill=False)
    for lo in range(0, len(data), batch):
        sl = slice(lo, lo + batch)
        b = _rows(urls[sl], prios[sl], oks[sl])
        spilled.enqueue(**b)
        plain.enqueue(**b)

    got = spilled.poll_round(0)
    want = plain.poll_round(0)
    assert got.equals(want)
    assert spilled._spill_files == [] and spilled.pending == []
