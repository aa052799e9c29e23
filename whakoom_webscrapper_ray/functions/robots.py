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

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa


class RobotsRules:
    """Parsed per-host rules: crawl_delay + disallow path prefixes."""

    def __init__(self, hosts: list[str], delays: list[float],
                 disallow: list[list[str]]):
        self.delay = dict(zip(hosts, (float(d) for d in delays)))
        self.disallow = {
            h: tuple(d or ()) for h, d in zip(hosts, disallow)
        }

    @classmethod
    def from_table(cls, tbl: pa.Table) -> "RobotsRules":
        return cls(
            tbl.column("host").to_pylist(),
            tbl.column("crawl_delay").to_pylist(),
            tbl.column("disallow").to_pylist(),
        )

    def allowed(self, host: str, path: str) -> bool:
        for prefix in self.disallow.get(host, ()):
            if path.startswith(prefix):
                return False
        return True

    def allowed_mask_arrow(self, host: pa.Array,
                           canon: pa.Array) -> np.ndarray:
        """Vectorized robots gate over Arrow columns.

        Disallow rules exist for few hosts; each (host, prefix) pair is
        one C ``equal`` + ``starts_with`` pass — no per-row Python.  A
        canonical URL's path starts right after ``scheme://host``, so
        ``path.startswith(prefix)`` ≡ URL starts with
        ``scheme://host<prefix>`` for either scheme.
        """
        import pyarrow.compute as pc

        out = np.ones(len(canon), dtype=bool)
        for h, prefixes in self.disallow.items():
            if not prefixes:
                continue
            hm = pc.equal(host, h).to_numpy(zero_copy_only=False)
            if not hm.any():
                continue
            for p in prefixes:
                bad = np.zeros(len(canon), dtype=bool)
                for scheme in ("https", "http"):
                    bad |= pc.starts_with(
                        canon, f"{scheme}://{h}{p}"
                    ).to_numpy(zero_copy_only=False)
                out &= ~(hm & bad)
        return out

    def allowed_mask(self, hosts: list[str], urls: list[str]) -> np.ndarray:
        out = np.ones(len(urls), dtype=bool)
        for i, (h, u) in enumerate(zip(hosts, urls)):
            rules = self.disallow.get(h)
            if rules:
                path = urlsplit(u).path
                for prefix in rules:
                    if path.startswith(prefix):
                        out[i] = False
                        break
        return out


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
