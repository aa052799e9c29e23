"""Property tests for the round-4 pure helpers (no Ray needed).

- _allpairs_contig: the vectorized variable-group all-pairs generator
  equals the brute-force double loop for arbitrary group layouts.
- resolve_page_states: the vectorized terminal-state walk equals the
  sequential "click loop" the oracle runs.
- RobotsRules: longest-match Allow/Disallow with wildcards equals a
  naive per-rule reference model, and the Arrow mask equals the scalar
  path row-for-row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=6), min_size=0,
                max_size=8))
def test_allpairs_contig_matches_bruteforce(sizes):
    from whakoom_webscrapper_ray.pipelines.dedup import _allpairs_contig

    vals, cnts, ranks, want = [], [], [], []
    nxt = 0
    for s in sizes:
        group = list(range(nxt, nxt + s))
        nxt += s + 3
        vals += group
        cnts += [s] * s
        ranks += list(range(s))
        for i in range(s):
            for j in range(i + 1, s):
                want.append((group[i], group[j]))
    a, b = _allpairs_contig(
        np.array(vals, dtype=np.int64),
        np.array(cnts, dtype=np.int64),
        np.array(ranks, dtype=np.int64),
    )
    assert list(zip(a.tolist(), b.tolist())) == want


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.lists(st.integers(min_value=0, max_value=5), min_size=1,
             max_size=6),
    min_size=1, max_size=6,
))
def test_resolve_page_states_matches_click_loop(deltas_per_doc):
    """States are cumulative prefixes with arbitrary (possibly zero)
    per-state growth; the vectorized resolve must stop exactly where
    the sequential click loop stops."""
    from whakoom_webscrapper_ray.stages.fetch import resolve_page_states

    def sp(n):
        return [{"kind": "text", "text": f"t{i}", "media_ref": "",
                 "offset": i} for i in range(n)]

    ids, states, spans = [], [], []
    want = {}
    for d, deltas in enumerate(deltas_per_doc):
        doc = f"doc{d}"
        lens = [1]
        for g in deltas:
            lens.append(lens[-1] + g)
        for s, ln in enumerate(lens):
            ids.append(doc)
            states.append(s)
            spans.append(sp(ln))
        # sequential click loop (oracle semantics)
        cur = 0
        while cur + 1 < len(lens) and lens[cur + 1] != lens[cur]:
            cur += 1
        want[doc] = (lens[cur], cur)

    t = pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "state": pa.array(states, pa.int64()),
        "spans": pa.array(
            spans,
            pa.list_(pa.struct([
                ("kind", pa.string()), ("text", pa.string()),
                ("media_ref", pa.string()), ("offset", pa.int32()),
            ])),
        ),
    })
    r = resolve_page_states(t)
    got = {
        d: (len(s), n)
        for d, s, n in zip(r["doc_id"].to_pylist(),
                           r["spans"].to_pylist(),
                           r["n_clicks"].to_pylist())
    }
    assert got == want


_PAT_CHARS = "abc/_"


def _naive_allowed(dis, alw, path):
    """Reference model: collect every matching rule, pick the longest
    pattern, Allow wins ties, default allow."""
    best = None
    for is_allow, pats in ((False, dis), (True, alw)):
        for p in pats:
            anchored = p.endswith("$")
            body = p[:-1] if anchored else p
            rx = "^" + re.escape(body).replace(r"\*", ".*") + (
                "$" if anchored else ""
            )
            if re.match(rx, path):
                key = (len(p), is_allow)
                if best is None or key > best:
                    best = key
    return True if best is None else best[1]


pattern_st = st.lists(
    st.sampled_from(list(_PAT_CHARS) + ["*"]), min_size=1, max_size=6
).map("".join).map(lambda s: "/" + s).flatmap(
    lambda s: st.sampled_from([s, s + "$"])
)
path_st = st.lists(
    st.sampled_from(list(_PAT_CHARS)), min_size=1, max_size=8
).map("".join).map(lambda s: "/" + s)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(pattern_st, min_size=0, max_size=4),
    st.lists(pattern_st, min_size=0, max_size=4),
    st.lists(path_st, min_size=1, max_size=6),
)
def test_robots_longest_match_property(dis, alw, paths):
    from whakoom_webscrapper_ray.functions.robots import RobotsRules

    r = RobotsRules(["h.example"], [0.0], [dis], [alw])
    urls = [f"https://h.example{p}" for p in paths]
    scalar = [r.allowed("h.example", p) for p in paths]
    assert scalar == [_naive_allowed(dis, alw, p) for p in paths]
    mask = r.allowed_mask_arrow(
        pa.array(["h.example"] * len(paths)), pa.array(urls)
    )
    assert mask.tolist() == scalar
