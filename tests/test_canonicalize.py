"""Unit + property tests for the RFC 3986 canonicalizer (SURVEY.md §2.2 M9)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from whakoom_webscrapper_ray.functions.canonicalize import (
    canonicalize_batch,
    canonicalize_table,
    canonicalize_url,
    host_hash64,
    id_from_url,
    url_sha1,
    user_profile_of,
)

# FIXTURES.md §5 unit vectors
VECTORS = [
    # case-folding of scheme/host
    ("HTTP://WWW.Example.COM/Path", "http://www.example.com/Path"),
    # default-port removal
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # dot-segment resolution
    ("http://e.com/a/b/../c/./d", "http://e.com/a/c/d"),
    ("http://e.com/../a", "http://e.com/a"),
    ("http://e.com/a/..", "http://e.com/"),
    # percent-encoding normalization
    ("http://e.com/%7euser", "http://e.com/~user"),
    ("http://e.com/a%2fb", "http://e.com/a%2Fb"),
    # fragment stripping
    ("http://e.com/a#frag", "http://e.com/a"),
    # query param sorting
    ("http://e.com/a?b=2&a=1", "http://e.com/a?a=1&b=2"),
    ("http://e.com/a?z&y=1", "http://e.com/a?y=1&z"),
    # empty path
    ("http://e.com", "http://e.com/"),
    # trailing dot host
    ("http://e.com./x", "http://e.com/x"),
]

RELATIVE_VECTORS = [
    # (href, base, expected) — RFC 3986 §5.4 reference resolution
    ("/user/lists", "https://h.example/a/b", "https://h.example/user/lists"),
    ("g", "http://a/b/c/d;p?q", "http://a/b/c/g"),
    ("../g", "http://a/b/c/d", "http://a/b/g"),
    ("//other.example/x", "https://h.example/a", "https://other.example/x"),
    ("?y=2", "http://a/b/c", "http://a/b/c?y=2"),
]


def test_vectors():
    for raw, want in VECTORS:
        assert canonicalize_url(raw) == want, raw


def test_relative_resolution():
    for href, base, want in RELATIVE_VECTORS:
        assert canonicalize_url(href, base=base) == want, (href, base)


def test_idempotent_on_vectors():
    for raw, want in VECTORS:
        assert canonicalize_url(want) == want


@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"),
            whitelist_characters="/._-~%?&=#:",
        ),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_idempotence_property(path):
    """canonicalize(canonicalize(u)) == canonicalize(u)."""
    u = "http://ex.example/" + path
    try:
        c = canonicalize_url(u)
    except ValueError:
        return  # unparseable input is out of contract
    assert canonicalize_url(c) == c


def test_sha1_and_host_hash():
    c = canonicalize_url("HTTPS://Host3.Example:443/lists/a_1")
    assert c == "https://host3.example/lists/a_1"
    assert len(url_sha1(c)) == 20
    assert host_hash64("host3.example") == host_hash64("host3.example")
    assert host_hash64("a") != host_hash64("b")


def test_id_from_url():
    assert id_from_url("/u/lists/foo_116039") == 116039
    assert id_from_url("https://x/comics/bar_77") == 77
    assert id_from_url("/u/lists/foo") is None
    assert id_from_url("/u/profile") is None


def test_user_profile_of():
    assert user_profile_of("https://h/deirdre/lists") == "deirdre"
    assert user_profile_of("https://h/") == ""


def test_batch_matches_scalar():
    urls = [v[0] for v in VECTORS]
    cols = canonicalize_batch(urls)
    assert cols["canon_url"] == [canonicalize_url(u) for u in urls]
    assert cols["url_sha1"] == [url_sha1(canonicalize_url(u)) for u in urls]


def test_canonicalize_table():
    tbl = pa.table({"url": ["HTTP://A.B/x", "http://a.b/x"]})
    out = canonicalize_table(tbl)
    assert out.column("canon_url").to_pylist() == ["http://a.b/x"] * 2
    assert out.column("url_sha1")[0].as_py() == out.column("url_sha1")[1].as_py()
    assert out.column("host").to_pylist() == ["a.b", "a.b"]


def test_arrow_hostless_and_portful_hosts():
    """Regression (ADVICE r1): canonicalize_arrow must (a) not crash on
    hostless schemes (mailto:, javascript:, tel:) — host becomes "" so
    the offsite mask drops them — and (b) strip userinfo/port from the
    host so host_hash matches canonicalize_batch/host_of exactly."""
    from whakoom_webscrapper_ray.functions.canonicalize import (
        canonicalize_arrow,
        host_of,
    )

    urls = [
        "mailto:someone@example.com",
        "javascript:void(0)",
        "tel:+15551234567",
        "http://a.example:8080/x",
        "http://user@a.example/x",
        "http://user:pw@a.example:8080/x",
        "https://host0.example/u/lists",
    ]
    cols = canonicalize_arrow(pa.array(urls, pa.string()))
    canon = cols["canon"].to_pylist()
    hosts = cols["host"].to_pylist()
    assert hosts == [host_of(c) for c in canon]
    # parity with the scalar batch path on every column
    ref = canonicalize_batch(urls)
    assert canon == ref["canon_url"]
    assert hosts == ref["host"]
    assert cols["host_hash"].tolist() == ref["host_hash"].tolist()


# ---- fuzz equivalence: vectorized Arrow path ≡ scalar batch path ----
# The round-1 regression (mailto:/userinfo/port hosts crashing or
# hashing differently in canonicalize_arrow) was exactly a divergence
# between the two implementations on inputs the fixtures never emit.
# Generate URL-ish strings compositionally (plus raw garbage) and
# require every derived column to agree.

_scheme = st.sampled_from(
    ["http", "https", "HTTP", "HtTpS", "ftp", "mailto", "javascript", "tel"]
)
_label = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
_host = st.builds(".".join, st.lists(_label, min_size=1, max_size=3))
_userinfo = st.one_of(
    st.just(""),
    _label.map(lambda u: u + "@"),
    st.builds(lambda u, p: f"{u}:{p}@", _label, _label),
)
_port = st.sampled_from(["", ":80", ":443", ":8080", ":0", ":65536"])
_seg = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"),
        whitelist_characters="._-~%!$'()*+,;= ",
    ),
    max_size=10,
)
_path = st.builds(
    lambda segs: "/" + "/".join(segs),
    st.lists(st.one_of(_seg, st.sampled_from([".", "..", "%7e", "%2F"])),
             max_size=4),
)
_query = st.one_of(
    st.just(""),
    st.builds(
        lambda kvs: "?" + "&".join(kvs),
        st.lists(
            st.one_of(_seg, st.builds(lambda k, v: f"{k}={v}", _seg, _seg)),
            min_size=1,
            max_size=3,
        ),
    ),
)
_frag = st.one_of(st.just(""), _seg.map(lambda s: "#" + s))

_urlish = st.one_of(
    st.builds(
        lambda sch, ui, h, pt, pa_, q, f: f"{sch}://{ui}{h}{pt}{pa_}{q}{f}",
        _scheme, _userinfo, _host, _port, _path, _query, _frag,
    ),
    st.builds(lambda sch, rest: f"{sch}:{rest}", _scheme, _seg),
    _path,  # relative references
    st.text(max_size=30),  # raw garbage
)


@given(st.lists(_urlish, min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_arrow_batch_fuzz_equivalence(urls):
    from whakoom_webscrapper_ray.functions.canonicalize import (
        canonicalize_arrow,
    )

    ref = canonicalize_batch(urls)
    cols = canonicalize_arrow(pa.array(urls, pa.string()))
    assert cols["canon"].to_pylist() == ref["canon_url"]
    assert cols["host"].to_pylist() == ref["host"]
    assert cols["host_hash"].tolist() == ref["host_hash"].tolist()
    assert cols["url_hash"].tolist() == ref["url_hash"].tolist()
    n = len(urls)
    sha = np.frombuffer(cols["sha_bytes"], dtype=np.uint8).reshape(n, 20)
    assert [bytes(r) for r in sha] == ref["url_sha1"]


# ------------------------------------------- tracking-param stripping
def test_strip_tracking_unit_vectors():
    from whakoom_webscrapper_ray.functions.canonicalize import (
        canonicalize_url,
    )

    f = lambda u: canonicalize_url(u, strip_tracking=True)  # noqa: E731
    # utm_* family and exact keys drop; other params survive and sort
    assert f("http://h.com/p?utm_source=x&id=3") == "http://h.com/p?id=3"
    assert f("http://h.com/p?fbclid=abc") == "http://h.com/p"
    assert (f("http://h.com/p?b=2&utm_campaign=c&a=1")
            == "http://h.com/p?a=1&b=2")
    # a key merely CONTAINING a tracking name survives
    assert (f("http://h.com/p?xutm_source=1")
            == "http://h.com/p?xutm_source=1")
    # valueless tracking key drops too
    assert f("http://h.com/p?gclid") == "http://h.com/p"
    # default path unchanged (oracle-canonical)
    assert (canonicalize_url("http://h.com/p?utm_source=x")
            == "http://h.com/p?utm_source=x")


def test_strip_tracking_batch_and_arrow_paths_agree():
    import pyarrow as pa

    from whakoom_webscrapper_ray.functions.canonicalize import (
        canonicalize_arrow, canonicalize_batch, canonicalize_url,
    )

    urls = [
        "http://h.com/a?utm_source=mail&x=1",
        "http://h.com/a?x=1",
        "http://h.com/plain",
        "HTTP://H.com/b?gclid=9&utm_medium=cpc",
    ]
    want = [canonicalize_url(u, strip_tracking=True) for u in urls]
    got_b = canonicalize_batch(urls, strip_tracking=True)["canon_url"]
    assert got_b == want
    got_a = canonicalize_arrow(
        pa.array(urls, pa.string()), strip_tracking=True
    )["canon"].to_pylist()
    assert got_a == want
    # the two utm variants of /a collapse onto the plain /a?x=1 form
    assert want[0] == want[1]
