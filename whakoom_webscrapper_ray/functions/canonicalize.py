"""From-scratch RFC 3986 URL canonicalizer + SHA-1 fingerprints.

Reproduces the observable behavior of Scrapy's 2.7 request fingerprinter
(enabled at /root/reference/whakoom_webscrapper/settings.py:139), which
hashes a canonicalized URL: lowercase scheme/host, strip fragment, sort
query parameters, normalize percent-encoding, resolve dot-segments,
drop default ports.  No w3lib/scrapy dependency — pure stdlib + numpy.

Also resolves *relative* hrefs against the page URL: the reference
stores the relative ``href`` verbatim (spiders/lists.py:52) and relies
on Scrapy to absolutize at request time — our frontier needs absolute
canonical URLs, so resolution happens here (RFC 3986 §5).

Batch entry points are vectorized per-batch with a memo dict (URL sets
repeat heavily within a crawl round); the hot loop is C-level dict/str
work, and output columns are built once per batch.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _norm_pct(component: str) -> str:
    """Normalize percent-encoding: decode unreserved chars, uppercase hex."""

    def repl(m: re.Match[str]) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, component)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    # Work segment-wise; keep leading-slash semantics.
    leading = path.startswith("/")
    segs = path.split("/")
    for seg in segs:
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
        else:
            output.append(seg)
    # Re-add trailing slash when path ended in "." / ".."
    if segs and segs[-1] in (".", "..") and (not output or output[-1] != ""):
        output.append("")
    out = "/".join(output)
    if leading and not out.startswith("/"):
        out = "/" + out
    return out


# Opt-in tracking-parameter strip list (the w3lib/url-normalizer
# convention real crawlers ship): exact keys plus the utm_* family.
# OFF by default — the RFC-only canonicalizer stays oracle-canonical.
TRACKING_PARAMS = frozenset({
    "fbclid", "gclid", "msclkid", "mc_eid", "igshid", "yclid",
    "_hsenc", "_hsmi", "mkt_tok",
})
TRACKING_PREFIXES = ("utm_",)


def _is_tracking(key: str) -> bool:
    return key in TRACKING_PARAMS or key.startswith(TRACKING_PREFIXES)


def canonicalize_url(url: str, base: str | None = None,
                     strip_tracking: bool = False) -> str:
    """Return the canonical absolute form of ``url``.

    Steps (RFC 3986 §6.2.2 syntax-based normalization + Scrapy-style
    fingerprint canonicalization):

    1. resolve against ``base`` if relative,
    2. lowercase scheme and host,
    3. drop default port,
    4. remove dot-segments; empty path → "/",
    5. normalize percent-encoding (decode unreserved, uppercase hex),
    6. sort query parameters bytewise by (key, value),
    7. strip the fragment.
    """
    try:
        if base:
            url = urljoin(base, url)
        parts = urlsplit(url.strip())
    except ValueError:
        # Unparseable reference (e.g. invalid IPv6 literal).  Return it
        # stripped-but-opaque: deterministic, idempotent, and host_of()
        # yields "" so the offsite mask drops it — a malformed href on
        # one page must never abort a crawl round.
        return url.strip()
    scheme = parts.scheme.lower()
    try:
        host = parts.hostname or ""
    except ValueError:
        host = ""
    host = host.lower().rstrip(".")
    try:
        port = parts.port
    except ValueError:
        port = None  # out-of-range/non-numeric port on an invalid URL
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        netloc = f"{userinfo}@{netloc}"
    path = _norm_pct(remove_dot_segments(parts.path)) or "/"
    query = parts.query
    if query:
        pairs = []
        for piece in query.split("&"):
            if not piece:
                continue
            if "=" in piece:
                k, v = piece.split("=", 1)
            else:
                k, v = piece, None
            k = _norm_pct(k)
            v = _norm_pct(v) if v is not None else None
            if strip_tracking and _is_tracking(k):
                continue
            pairs.append((k, v))
        pairs.sort(key=lambda kv: (kv[0], kv[1] if kv[1] is not None else ""))
        query = "&".join(k if v is None else f"{k}={v}" for k, v in pairs)
    return urlunsplit((scheme, netloc, path, query, ""))  # fragment stripped


def url_sha1(canon: str) -> bytes:
    """20-byte SHA-1 of the canonical URL (the stable fingerprint)."""
    return hashlib.sha1(canon.encode("utf-8")).digest()


def host_of(canon: str) -> str:
    """Host component of an already-canonical URL ("" if unparseable)."""
    try:
        return urlsplit(canon).hostname or ""
    except ValueError:
        return ""


def host_hash64(host: str) -> int:
    """uint64 from the first 8 bytes of SHA-1(host) — the partition key.

    Frontier/seen shard = ``host_hash % num_shards`` so a host's URLs
    co-locate with its robots + politeness state (SURVEY.md §4.3).
    """
    return int.from_bytes(hashlib.sha1(host.encode("utf-8")).digest()[:8], "big")


def user_profile_of(canon: str) -> str:
    """First path segment — mirrors spiders/lists.py:35-36."""
    try:
        path = urlsplit(canon).path
    except ValueError:
        return ""
    segs = path.split("/")
    return segs[1] if len(segs) > 1 else ""


def id_from_url(url: str) -> int | None:
    """Stable numeric id from the URL tail: ``int(url.rsplit('_',1)[-1])``.

    Mirrors spiders/lists.py:47.  Returns None when the tail is not an
    integer (the reference would raise; we filter such links out before
    building list items).
    """
    tail = url.rsplit("_", 1)[-1]
    try:
        return int(tail)
    except ValueError:
        return None


# ------------------------------------------------------------------ batch API

# Fast-path detector: URLs that are PROVABLY already canonical —
# lowercase http(s) scheme+host, no port/userinfo, no query/fragment,
# no percent-encoding, no dot-segments or empty segments in the path.
# For these, canonicalize_url(u) == u, so the full RFC machinery can be
# skipped; everything else (relative hrefs, uppercase, ports, queries,
# encodings) takes the exact slow path.  At 10^10 URLs the fast path is
# the difference between hours and days of canonicalization CPU.
_FAST_RE = re.compile(
    r"^https?://[a-z0-9]([a-z0-9.-]*[a-z0-9])?"
    r"(/(?!\.)[!$&'()*+,:;=@A-Za-z0-9_.~-]*(?<!/\.)(?<!/\.\.)"
    r"(?:/(?!\.)[!$&'()*+,:;=@A-Za-z0-9_.~-]*(?<!/\.)(?<!/\.\.))*)$"
)
_FAST_HOST_RE = re.compile(r"^https?://([^/]+)")


def canonicalize_batch(
    urls: list[str] | pa.Array,
    bases: list[str] | pa.Array | None = None,
    strip_tracking: bool = False,
) -> dict[str, np.ndarray | list]:
    """Canonicalize a batch of URLs (optionally relative to per-row bases).

    Returns dict of equal-length columns: ``canon_url`` (list[str]),
    ``url_sha1`` (list[bytes]), ``host`` (list[str]), ``host_hash`` /
    ``url_hash`` (np.uint64 arrays).  Already-canonical URLs (the vast
    majority in a well-formed crawl) are detected by ``_FAST_RE`` and
    skip the RFC machinery — only the SHA-1 fingerprint (C speed)
    remains per-URL; the rest goes through the exact slow path with a
    per-batch memo.
    """
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    if bases is not None and isinstance(bases, (pa.Array, pa.ChunkedArray)):
        bases = bases.to_pylist()

    n = len(urls)
    fast_match = _FAST_RE.match
    host_match = _FAST_HOST_RE.match
    canon_col: list[str] = [""] * n
    sha_col: list[bytes] = [b""] * n
    host_col: list[str] = [""] * n
    hh_col = np.empty(n, dtype=np.uint64)
    uh_col = np.empty(n, dtype=np.uint64)
    host_memo: dict[str, int] = {}
    slow_idx: list[int] = []
    _sha1 = hashlib.sha1
    for i, u in enumerate(urls):
        if fast_match(u) is None:
            slow_idx.append(i)
            continue
        h = host_match(u).group(1)
        hh = host_memo.get(h)
        if hh is None:
            hh = host_hash64(h)
            host_memo[h] = hh
        sha = _sha1(u.encode("utf-8")).digest()
        canon_col[i] = u
        sha_col[i] = sha
        host_col[i] = h
        hh_col[i] = hh
        uh_col[i] = int.from_bytes(sha[:8], "big")
    if not slow_idx:
        return {
            "canon_url": canon_col,
            "url_sha1": sha_col,
            "host": host_col,
            "host_hash": hh_col,
            "url_hash": uh_col,
        }
    slow = _canonicalize_slow(
        [urls[i] for i in slow_idx],
        [bases[i] for i in slow_idx] if bases is not None else None,
        host_memo,
        strip_tracking=strip_tracking,
    )
    for j, i in enumerate(slow_idx):
        canon_col[i] = slow["canon_url"][j]
        sha_col[i] = slow["url_sha1"][j]
        host_col[i] = slow["host"][j]
        hh_col[i] = slow["host_hash"][j]
        uh_col[i] = slow["url_hash"][j]
    return {
        "canon_url": canon_col,
        "url_sha1": sha_col,
        "host": host_col,
        "host_hash": hh_col,
        "url_hash": uh_col,
    }


def _canonicalize_slow(
    urls: list[str],
    bases: list[str] | None,
    host_memo: dict[str, int] | None = None,
    strip_tracking: bool = False,
) -> dict[str, np.ndarray | list]:
    """Exact RFC 3986 path with per-batch memo (see canonicalize_url)."""

    memo: dict[tuple[str, str | None], tuple] = {}
    canon_col: list[str] = []
    sha_col: list[bytes] = []
    host_col: list[str] = []
    hh_col = np.empty(len(urls), dtype=np.uint64)
    uh_col = np.empty(len(urls), dtype=np.uint64)
    if host_memo is None:
        host_memo = {}

    for i, u in enumerate(urls):
        b = bases[i] if bases is not None else None
        key = (u, b)
        hit = memo.get(key)
        if hit is None:
            c = canonicalize_url(u, b, strip_tracking=strip_tracking)
            h = host_of(c)
            hh = host_memo.get(h)
            if hh is None:
                hh = host_hash64(h)
                host_memo[h] = hh
            sha = url_sha1(c)
            hit = (c, sha, h, hh,
                   int.from_bytes(sha[:8], "big"))
            memo[key] = hit
        canon_col.append(hit[0])
        sha_col.append(hit[1])
        host_col.append(hit[2])
        hh_col[i] = hit[3]
        uh_col[i] = hit[4]

    return {
        "canon_url": canon_col,
        "url_sha1": sha_col,
        "host": host_col,
        "host_hash": hh_col,
        "url_hash": uh_col,
    }


_RE2_FAST_PARTS = {
    # provably-canonical test, decomposed into RE2-safe pieces (Arrow's
    # regex engine has no lookaround): lowercase http(s) + lowercase
    # host + a path, and NONE of query/fragment/percent/whitespace,
    # userinfo/port, empty path segments, or dot segments.
    "shape": r"^https?://[a-z0-9]([a-z0-9.-]*[a-z0-9])?/",
    "bad_qfp": r"[?#%\s]",
    "bad_userport": r"^https?://[^/]*[:@]",
    "bad_emptyseg": r"^https?://.*//",
    "bad_dotseg": r"/\.\.?(/|$)",
}

# Strip userinfo ("user:pass@") and stop at ":" so ports never leak into
# the host — must match host_of()/urlsplit().hostname semantics exactly,
# else the same host routes to different frontier shards (politeness /
# robots lookups keyed by bare host would miss).
_HOST_EXTRACT_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?(?P<host>[^/:]+)"


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """(offsets int64, data memoryview) of a single-chunk string array."""
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset:arr.offset + len(arr) + 1
    ].astype(np.int64)
    return offs, memoryview(bufs[2])


def sha1_column(arr: pa.Array) -> bytes:
    """SHA-1 of every string in ``arr`` → one packed n×20 byte buffer.

    Hashes straight from the Arrow data buffer via memoryview slices —
    no per-row Python string/bytes objects survive the loop, so the
    allocator never grows (the per-iteration temporaries reuse the same
    small-object slots).  This matters beyond CPU: transient-object
    churn at 10^7 rows/round causes page-fault storms on virtualized
    hosts.
    """
    offs, mv = _string_buffers(arr)
    n = len(arr)
    out = bytearray(n * 20)
    _sha1 = hashlib.sha1
    for i in range(n):
        out[i * 20:(i + 1) * 20] = _sha1(mv[offs[i]:offs[i + 1]]).digest()
    return bytes(out)


def canonicalize_arrow(
    urls: pa.Array | pa.ChunkedArray,
    base_for: "callable | None" = None,
    strip_tracking: bool = False,
) -> dict:
    """Arrow-native batch canonicalizer (zero per-row Python objects on
    the fast path).

    ``base_for(i)`` supplies the base URL string for slow-path row ``i``
    (relative-href resolution); fast-path rows never materialize Python
    strings.  Returns dict with:

    - ``canon``: pa.StringArray of canonical URLs
    - ``sha_bytes``: packed n×20 SHA-1 buffer (``url_sha1`` column)
    - ``sha_void``: numpy void-20 view of it (C-sortable keys)
    - ``host``: pa.StringArray
    - ``host_hash`` / ``url_hash``: np.uint64 arrays
    """
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    n = len(urls)
    p = _RE2_FAST_PARTS
    fast = pc.and_kleene(
        pc.match_substring_regex(urls, p["shape"]),
        pc.invert(
            pc.or_(
                pc.or_(
                    pc.match_substring_regex(urls, p["bad_qfp"]),
                    pc.match_substring_regex(urls, p["bad_userport"]),
                ),
                pc.or_(
                    pc.match_substring_regex(urls, p["bad_emptyseg"]),
                    pc.match_substring_regex(urls, p["bad_dotseg"]),
                ),
            )
        ),
    )
    fast_np = fast.to_numpy(zero_copy_only=False)
    slow_idx = np.flatnonzero(~fast_np)
    take_idx = None
    if slow_idx.size:
        slow_canon = []
        slow_host = []
        for i in slow_idx:
            u = urls[int(i)].as_py()
            b = base_for(int(i)) if base_for is not None else None
            c = canonicalize_url(u, b, strip_tracking=strip_tracking)
            slow_canon.append(c)
            slow_host.append(host_of(c))
        merged = pa.concat_arrays(
            [urls, pa.array(slow_canon, pa.string())]
        )
        idx = np.arange(n, dtype=np.int64)
        idx[slow_idx] = n + np.arange(slow_idx.size)
        take_idx = pa.array(idx, pa.int64())
        canon = merged.take(take_idx)
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
    else:
        canon = urls

    # Host column: the regex is provably exact ONLY on fast-path rows
    # (the fast shape guarantees scheme://lowercase-host/ with no
    # port/userinfo).  Slow rows — relative refs, scheme-relative
    # ``//host/``, hostless schemes, malformed authorities — take
    # ``host_of()`` (urlsplit semantics) computed above while they were
    # already materialized, so both paths agree by construction.
    host = pc.struct_field(
        pc.extract_regex(canon, _HOST_EXTRACT_RE), "host"
    )
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    host = pc.fill_null(host, "")
    if slow_idx.size:
        host = pa.concat_arrays(
            [host, pa.array(slow_host, pa.string())]
        ).take(take_idx)
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()

    sha_bytes = sha1_column(canon)
    sha_u8 = np.frombuffer(sha_bytes, dtype=np.uint8).reshape(n, 20)
    sha_void = sha_u8.view(np.dtype((np.void, 20))).ravel()
    url_hash = np.ascontiguousarray(sha_u8[:, :8]).view(">u8").ravel(
    ).astype(np.uint64)

    uniq = pc.unique(host)
    uniq_hash = np.array(
        [host_hash64(h) for h in uniq.to_pylist()], dtype=np.uint64
    )
    codes = pc.index_in(host, value_set=uniq).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    host_hash = uniq_hash[codes] if n else np.empty(0, np.uint64)

    return {
        "canon": canon,
        "sha_bytes": sha_bytes,
        "sha_void": sha_void,
        "host": host,
        "host_hash": host_hash,
        "url_hash": url_hash,
        "host_codes": codes,
        "uniq_hosts": uniq,
    }


def canonicalize_table(
    batch: pa.Table,
    url_col: str = "url",
    base_col: str | None = None,
) -> pa.Table:
    """``map_batches``-ready transform: append canonical columns to a table."""
    cols = canonicalize_batch(
        batch[url_col],
        batch[base_col] if base_col else None,
    )
    out = batch
    for name, typ in (
        ("canon_url", pa.string()),
        ("url_sha1", pa.binary(20)),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
    ):
        arr = pa.array(cols[name], type=typ)
        if name in out.column_names:
            out = out.set_column(out.column_names.index(name), name, arr)
        else:
            out = out.append_column(name, arr)
    return out
