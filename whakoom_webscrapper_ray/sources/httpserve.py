"""Local-socket HTTP face of the synthetic web: renderer + server.

The reference's whole point is fetching real pages over HTTP
(/root/reference/whakoom_webscrapper/spiders/lists.py:17-19,
publications.py:28-40).  This sandbox has no network, so the proof
that the engine's Fetcher seam holds for a REAL transport is a
loopback socket: :class:`SynthWebServer` renders each synthetic page's
span sequence as an HTML document (headings/paragraphs/anchors/images
in document order) and serves it over stdlib ``http.server``;
:class:`~..stages.fetch.HttpFetcher` crawls it with a persistent
``http.client`` connection and parses the HTML back into spans.  The
round trip is lossless (span-sequence equality, pytest-pinned), so a
crawl over HTTP produces byte-identical tables to the synthetic
in-memory path on the same graph.

Dynamic "Load more" pages (S3): a pages table with a ``state`` column
is served state-by-state behind a ``?page_state=N`` query param; the
fetcher's click loop (fetch next state while it exists and grows) is
the HTTP realization of the reference's Selenium pagination loop
(publications.py:74-93) and of ``resolve_page_states``'s semantics.
"""

from __future__ import annotations

import html as _html
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

import pyarrow as pa


def render_spans_html(kinds, texts, refs) -> str:
    """One page's span sequence → an HTML document, document order
    preserved: heading → <h3>, text → <p>, link → <a href>, image →
    <img src alt>.  Escaping is exact (html.escape / parser unescape
    round-trips any text, including the fixture's padded-whitespace
    strip targets and unicode glyphs)."""
    out = ["<!doctype html>", "<html><body>"]
    for k, t, r in zip(kinds, texts, refs):
        if k == "heading":
            out.append(f"<h3>{_html.escape(t)}</h3>")
        elif k == "text":
            out.append(f"<p>{_html.escape(t)}</p>")
        elif k == "link":
            out.append(
                f'<a href="{_html.escape(r, quote=True)}">'
                f"{_html.escape(t)}</a>")
        elif k == "image":
            out.append(
                f'<img src="{_html.escape(r, quote=True)}" '
                f'alt="{_html.escape(t, quote=True)}">')
        else:
            raise ValueError(f"unknown span kind: {k!r}")
    out.append("</body></html>")
    return "\n".join(out)


def render_robots_txt(crawl_delay: float, disallow: list[str],
                      allow: list[str]) -> str:
    """One host's rules table row → an RFC 9309 robots.txt body (the
    inverse of ``functions.robots.parse_robots_txt``)."""
    out = ["# synthetic web robots", "User-agent: *"]
    if crawl_delay:
        d = crawl_delay
        out.append("Crawl-delay: "
                   f"{int(d) if float(d).is_integer() else d}")
    out.extend(f"Disallow: {p}" for p in disallow)
    out.extend(f"Allow: {p}" for p in allow)
    if not disallow and not allow:
        out.append("Disallow:")   # explicit allow-all (RFC example)
    return "\n".join(out) + "\n"


def _page_key(url: str) -> tuple[str, str, str, str]:
    # the QUERY is part of page identity (two doc_ids differing only
    # in ?id= are different pages); the dynamic page_state param is
    # appended by the fetcher and stripped by the handler before
    # lookup, so stored keys never carry it
    s = urlsplit(url)
    return (s.scheme, s.netloc, s.path or "/", s.query)


class SynthWebServer:
    """Threaded loopback HTTP server over a synthetic ``pages`` table.

    Pages are pre-rendered to HTML bytes at construction, keyed by
    (host, path, state).  Requests resolve the virtual host from the
    ``Host`` header (origin-form targets) or from an absolute-form
    request target — the two ways a real crawler reaches a virtual
    host through one socket.  ``fail_503`` maps a URL to a number of
    leading requests that return 503 (transient-failure injection for
    the retry path).
    """

    def __init__(self, pages: pa.Table, host: str = "127.0.0.1",
                 fail_503: dict[str, int] | None = None,
                 robots: pa.Table | None = None) -> None:
        store: dict[tuple[str, str, str, str, int], bytes] = {}
        has_state = "state" in pages.column_names
        for row in pages.to_pylist():
            sch, h, p, q = _page_key(row["doc_id"])
            state = int(row["state"]) if has_state else 0
            spans = sorted(row["spans"], key=lambda s: s["offset"])
            store[(sch, h, p, q, state)] = render_spans_html(
                [s["kind"] for s in spans],
                [s["text"] for s in spans],
                [s["media_ref"] for s in spans],
            ).encode("utf-8")
        if robots is not None:
            # each host's /robots.txt, rendered from the rules table —
            # the transport-complete loop: the crawler FETCHES its
            # politeness/deny rules instead of being handed a table
            for row in robots.to_pylist():
                store[("https", row["host"], "/robots.txt", "", 0)] = (
                    render_robots_txt(
                        row["crawl_delay"], row["disallow"],
                        row.get("allow") or [],
                    ).encode("utf-8"))
        self._store = store
        remaining = dict(fail_503 or {})
        self.request_log: list[str] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def do_GET(self) -> None:
                target = self.path
                if target.startswith("http://") or target.startswith(
                        "https://"):
                    # absolute-form request target (RFC 9112 §3.2.2,
                    # proxy semantics) — the only origin-form-free way
                    # one plain socket can carry the URL's scheme, so
                    # http:// and https:// virtual origins stay
                    # distinct (real crawlers treat them as different
                    # pages; so does the synthetic fetcher)
                    s = urlsplit(target)
                    scheme, host_hdr = s.scheme, s.netloc
                    path, query = s.path, s.query
                else:
                    scheme = "https"   # the synthetic web's native
                    host_hdr = (self.headers.get("Host") or "").split(
                        ":")[0]
                    s = urlsplit(target)
                    path, query = s.path, s.query
                outer.request_log.append(
                    f"{scheme}://{host_hdr}{path}?{query}")
                # the fetcher appends page_state as the LAST query
                # param; strip exactly that so the remaining query is
                # the page's own identity
                import re as _re

                m = _re.search(r"(?:^|&)page_state=(\d+)$", query)
                state = int(m.group(1)) if m else 0
                base_q = query[: m.start()] if m else query
                url = f"{scheme}://{host_hdr}{path}" + (
                    f"?{base_q}" if base_q else "")
                n = remaining.get(url, 0)
                if n > 0:
                    remaining[url] = n - 1
                    self.send_response(503)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = outer._store.get(
                    (scheme, host_hdr, path or "/", base_q, state))
                if body is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, 0), Handler)
        self.host = host
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)

    def __enter__(self) -> "SynthWebServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
