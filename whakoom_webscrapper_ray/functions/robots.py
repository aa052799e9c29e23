"""Robots rules + offsite filtering (broadcast small-side lookups).

Mirrors ``ROBOTSTXT_OBEY = True`` (settings.py:68) and
``allowed_domains`` offsite filtering (spiders/lists.py:16,
publications.py:27; SURVEY.md §2.2 M10, §2.4 J5).

Rules are a small per-host table: broadcast ONCE via ``ray.put`` and
looked up inside ``map_batches`` — never a shuffle join, never
re-shipped per batch.  Disallowed URLs are dropped BEFORE the seen-set
probe, so they appear in neither the seen set nor any output
(FIXTURES.md §3).
"""

from __future__ import annotations

import re as _re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

# extracts the path (no query/fragment) of a canonical URL; canonical
# URLs always carry at least "/"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(?P<p>/[^?#]*)?"


def _compile_rule(pat: str):
    """robots pattern → fast path matcher.

    Full robots wildcard grammar (RFC 9309 §2.2.3, what Scrapy's
    ``ROBOTSTXT_OBEY`` honors via its parser): ``*`` matches any char
    sequence, a trailing ``$`` anchors the end, otherwise the pattern
    is a path prefix.  Plain prefixes take the C ``startswith`` path;
    wildcard/anchored patterns compile once to a regex."""
    if "*" not in pat and not pat.endswith("$"):
        return None  # plain prefix — matched with startswith
    anchored = pat.endswith("$")
    body = pat[:-1] if anchored else pat
    return _re.compile(
        "^" + _re.escape(body).replace(r"\*", ".*")
        + ("$" if anchored else "")
    )


class RobotsRules:
    """Parsed per-host rules: crawl_delay + Allow/Disallow patterns.

    Reference behavior: the spider obeys the FULL robots protocol
    (``ROBOTSTXT_OBEY = True``, settings.py:68) — Allow rules override
    Disallow by longest-match precedence (RFC 9309 §2.2.2: the most
    specific, i.e. longest, matching pattern wins; on a length tie
    Allow wins), and patterns may use ``*`` / ``$`` wildcards.  A URL
    matching no rule is allowed.
    """

    def __init__(self, hosts: list[str], delays: list[float],
                 disallow: list[list[str]],
                 allow: list[list[str]] | None = None):
        self.delay = dict(zip(hosts, (float(d) for d in delays)))
        if allow is None:
            allow = [[] for _ in hosts]
        # host -> [(pattern_len, is_allow, pattern, compiled|None)]
        self.rules: dict[str, list] = {}
        for h, dis, alw in zip(hosts, disallow, allow):
            rs = [(len(p), False, p, _compile_rule(p))
                  for p in (dis or [])]
            rs += [(len(p), True, p, _compile_rule(p))
                   for p in (alw or [])]
            if rs:
                # longest-first so the first match decides
                self.rules[h] = sorted(
                    rs, key=lambda r: (-r[0], not r[1])
                )

    @classmethod
    def from_table(cls, tbl: pa.Table) -> "RobotsRules":
        allow = (
            tbl.column("allow").to_pylist()
            if "allow" in tbl.column_names else None
        )
        return cls(
            tbl.column("host").to_pylist(),
            tbl.column("crawl_delay").to_pylist(),
            tbl.column("disallow").to_pylist(),
            allow,
        )

    def allowed(self, host: str, path: str) -> bool:
        for _, is_allow, pat, rx in self.rules.get(host, ()):
            if rx.match(path) if rx is not None else path.startswith(pat):
                return is_allow
        return True

    def allowed_mask_arrow(self, host: pa.Array,
                           canon: pa.Array) -> np.ndarray:
        """Vectorized robots gate over Arrow columns.

        Rules exist for few hosts; each (host, pattern) pair is one C
        ``equal`` + ``starts_with`` / RE2 pass — no per-row Python.
        Longest-match precedence is evaluated per row with running
        (best_len, best_allow) arrays, exactly :meth:`allowed`.
        """
        import pyarrow.compute as pc

        out = np.ones(len(canon), dtype=bool)
        if not self.rules:
            return out
        paths = None
        for h, rs in self.rules.items():
            hm = pc.equal(host, h).to_numpy(zero_copy_only=False)
            hm = np.asarray(hm, dtype=bool)
            if not hm.any():
                continue
            if paths is None:
                m = pc.extract_regex(canon, _PATH_RE)
                p = pc.struct_field(m, "p")
                paths = pc.fill_null(p, "/")
                paths = pc.if_else(pc.equal(paths, ""), "/", paths)
            best_len = np.full(len(canon), -1, dtype=np.int64)
            best_allow = np.zeros(len(canon), dtype=bool)
            for plen, is_allow, pat, rx in rs:
                if rx is None:
                    mk = pc.starts_with(paths, pat)
                else:
                    mk = pc.match_substring_regex(paths, rx.pattern)
                mk = np.asarray(
                    mk.to_numpy(zero_copy_only=False), dtype=bool
                )
                upd = mk & (
                    (plen > best_len)
                    | ((plen == best_len) & is_allow & ~best_allow)
                )
                best_len[upd] = plen
                best_allow[upd] = is_allow
            out &= ~(hm & (best_len >= 0) & ~best_allow)
        return out

    def allowed_mask(self, hosts: list[str], urls: list[str]) -> np.ndarray:
        out = np.ones(len(urls), dtype=bool)
        for i, (h, u) in enumerate(zip(hosts, urls)):
            if h in self.rules:
                out[i] = self.allowed(h, urlsplit(u).path)
        return out


def parse_robots_txt(text: str) -> tuple[float, list[str], list[str]]:
    """RFC 9309 robots.txt text → (crawl_delay, disallow, allow).

    Group handling per the RFC: lines are ``key: value`` with ``#``
    comments, keys case-insensitive; a group is one or more
    ``User-agent`` lines followed by rules.  This engine sends no
    product token, so it honors the ``*`` group(s); groups for other
    user agents are ignored.  Multiple ``*`` groups merge (RFC 9309
    §2.2.1: rules of groups sharing a user agent combine).  An empty
    ``Disallow:`` value is a no-op (allow-all), not an empty-prefix
    match-everything rule.  ``Crawl-delay`` is the de-facto extension
    Scrapy/AutoThrottle honors; absent → 0.
    """
    delay = 0.0
    disallow: list[str] = []
    allow: list[str] = []
    in_star = False          # current group applies to us
    after_rules = True       # a UA line after rules starts a NEW group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if after_rules:
                in_star = False
                after_rules = False
            in_star = in_star or val == "*"
            continue
        after_rules = True
        if not in_star:
            continue
        if key == "disallow" and val:
            disallow.append(val)
        elif key == "allow" and val:
            allow.append(val)
        elif key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return delay, disallow, allow


def robots_table_from_texts(hosts: list[str],
                            texts: list[str | None]) -> pa.Table:
    """Per-host robots.txt bodies → the engine's robots rules table
    (``None`` body = no robots.txt served → allow-all, no delay — the
    RFC 9309 §2.3.1.2 unavailable-status behavior)."""
    delays, dis, alw = [], [], []
    for t in texts:
        d, di, al = parse_robots_txt(t) if t is not None else (0.0, [], [])
        delays.append(d)
        dis.append(di)
        alw.append(al)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "crawl_delay": pa.array(delays, pa.float64()),
        "disallow": pa.array(dis, pa.list_(pa.string())),
        "allow": pa.array(alw, pa.list_(pa.string())),
    })


def offsite_mask_arrow(host: pa.Array,
                       allowed_domains: frozenset[str] | set[str]
                       ) -> np.ndarray:
    """Vectorized offsite filter: exact ``is_in`` (C hash probe) plus a
    Python suffix check only for the rare non-exact rows."""
    import pyarrow.compute as pc

    out = pc.is_in(
        host, value_set=pa.array(sorted(allowed_domains), pa.string())
    ).to_numpy(zero_copy_only=False).copy()
    rem = np.flatnonzero(~out)
    if rem.size:
        for i in rem:
            h = host[int(i)].as_py()
            if h is None:
                continue
            for d in allowed_domains:
                if h.endswith("." + d):
                    out[i] = True
                    break
    return out


def offsite_mask(hosts: list[str] | pa.Array,
                 allowed_domains: frozenset[str] | set[str]) -> np.ndarray:
    """True where the host is inside the allowed-domain set.

    Suffix semantics like Scrapy's OffsiteMiddleware: ``a.b.example``
    matches allowed domain ``b.example``.
    """
    if isinstance(hosts, (pa.Array, pa.ChunkedArray)):
        hosts = hosts.to_pylist()
    out = np.zeros(len(hosts), dtype=bool)
    for i, h in enumerate(hosts):
        if h in allowed_domains:
            out[i] = True
            continue
        for d in allowed_domains:
            if h.endswith("." + d):
                out[i] = True
                break
    return out
