"""Sequential reference oracle: golden producer for crawl conformance.

A pure-Python, record-at-a-time reimplementation of the *observable*
Scrapy semantics of the reference crawl (SURVEY.md §5.2):

- seed order = ``start_urls`` order (spiders/lists.py:17),
- robots gate before anything else (settings.py:68) — disallowed URLs
  enter neither the seen set nor any output,
- offsite filter on allowed domains (lists.py:16),
- SHA-1 fingerprint dedup marked at schedule time (settings.py:139),
- per-host politeness pacing in logical time (AutoThrottle,
  settings.py:119-128),
- document-order link extraction (lists.py:39-55, publications.py:96-102),
- upsert + status lifecycle pending→completed at close
  (pipelines.py:140-159, :66-71; queries/lists.sql:1-9, :37-40).

The canonical deterministic crawl model (rounds + per-host pacing +
``(fetch_time, priority, discovery_ok)`` ordering) is documented in
``state/frontier.py``; the distributed engine must reproduce this
oracle's outputs exactly — crawl order, seen set, per-row span
sequences, lists/junction/titles tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from .functions.canonicalize import (
    canonicalize_url,
    host_of,
    id_from_url,
    url_sha1,
    user_profile_of,
)
from .functions.robots import RobotsRules
from .stages.extract import LIST_RE, PROFILE_RE, TITLE_RE
import re

OK_SHIFT = 20  # must match state/frontier.py


@dataclass
class OracleResult:
    crawl_order: list[tuple[int, str, str, int]]          # seq,url,host,round
    seen: dict[bytes, str]                                 # sha1 -> canon url
    docs_out: dict[str, list[dict]]                        # doc_id -> spans
    lists_out: dict[int, dict]                             # list_id -> row
    junction_out: dict[tuple[int, int], int]               # (lid,tid)->pos
    titles_out: dict[int, dict]                            # title_id -> row
    metadata_out: dict[int, dict]                          # title_id -> row
    volumes_out: dict[int, dict]                           # volume_id -> row
    enriched_out: dict[int, dict] = None                   # title_id -> row
    close_time: float = 0.0
    fetch_log: list[tuple[str, str]] = field(default_factory=list)


def run_oracle(
    pages: pa.Table,
    seeds: pa.Table,
    robots: pa.Table,
    max_rounds: int | None = None,
    max_pages_per_host: int | None = None,
    strip_tracking: bool = False,
    host_fail_budget: int | None = None,
) -> OracleResult:
    """Run the sequential crawl; return all golden outputs.

    ``max_pages_per_host`` caps the TOTAL pages scheduled per host
    across all rounds (the reference's pagination loop bound —
    publications.py:74-89 stops requesting more pages of one site).
    Candidates beyond the budget are dropped at schedule time after
    being marked seen, exactly like the engine (state/frontier.py).
    ``strip_tracking`` applies the canonicalizer's tracking-param
    strip to every URL, and ``host_fail_budget`` models the per-host
    circuit breaker with the engine's round-synchronous feedback:
    failures observed in round N quarantine the host from round N+1's
    scheduling; dropped candidates stay seen-marked (exactly the
    engine ordering: dedup → seen-mark → quarantine filter → pacing).
    """

    def _c(u: str, base: str | None = None) -> str:
        return canonicalize_url(u, base, strip_tracking=strip_tracking)
    if "state" in pages.column_names:
        # Dynamic "Load more" pages (S3, publications.py:74-93): the
        # sequential reference loop, verbatim — start at state 0,
        # click while the next state exists AND loads new content,
        # extract from the final accumulated page source.
        staged: dict[str, dict[int, list]] = {}
        for d, st, s in zip(
            pages.column("doc_id").to_pylist(),
            pages.column("state").to_pylist(),
            pages.column("spans").to_pylist(),
        ):
            staged.setdefault(d, {})[int(st)] = s
        page_spans = {}
        for d, states in staged.items():
            s_cur = 0
            while (
                s_cur + 1 in states
                and len(states[s_cur + 1]) != len(states[s_cur])
            ):
                s_cur += 1
            page_spans[d] = states[s_cur]
    else:
        page_spans = {
            d: s
            for d, s in zip(
                pages.column("doc_id").to_pylist(),
                pages.column("spans").to_pylist(),
            )
        }
    rules = RobotsRules.from_table(robots)
    profile_re = re.compile(PROFILE_RE)
    list_re = re.compile(LIST_RE)
    title_re = re.compile(TITLE_RE)

    seed_rows = sorted(
        zip(
            seeds.column("seed_index").to_pylist(),
            seeds.column("url").to_pylist(),
            seeds.column("priority").to_pylist(),
        )
    )
    # Allowed domains = canonical hosts of the seed list (the engine's
    # generalization of the hardcoded allowed_domains, lists.py:16).
    allowed = frozenset(host_of(_c(u)) for _, u, _ in seed_rows)

    def domain_ok(host: str) -> bool:
        return host in allowed or any(host.endswith("." + d) for d in allowed)

    seen: dict[bytes, str] = {}
    next_time: dict[str, float] = {}
    pages_budget: dict[str, int] = {}
    host_failures: dict[str, int] = {}
    quarantined: set[str] = set()
    crawl_order: list[tuple[int, str, str, int]] = []
    docs_out: dict[str, list[dict]] = {}
    lists_out: dict[int, dict] = {}
    junction: dict[tuple[int, int], int] = {}
    titles_out: dict[int, dict] = {}
    metadata_out: dict[int, dict] = {}
    volumes_out: dict[int, dict] = {}
    fetch_log: list[tuple[str, str]] = []

    # candidates for the current round: (priority, ok, canon, sha, host)
    cands: list[tuple[int, int, str, bytes, str]] = []
    for idx, url, prio in seed_rows:
        cu = _c(url)
        host = host_of(cu)
        if not domain_ok(host):
            continue
        from urllib.parse import urlsplit

        if not rules.allowed(host, urlsplit(cu).path):
            continue
        sha = url_sha1(cu)
        cands.append((int(prio), int(idx), cu, sha, host))

    seq = 0
    rnd = 0
    max_time = 0.0
    while cands and (max_rounds is None or rnd < max_rounds):
        # dedup per sha keeping min ok, then mark seen
        best: dict[bytes, tuple[int, int, str, bytes, str]] = {}
        for c in sorted(cands, key=lambda c: c[1]):
            if c[3] not in best:
                best[c[3]] = c
        sched = [c for c in best.values() if c[3] not in seen]
        for c in sched:
            seen[c[3]] = c[2]
        if quarantined:
            sched = [c for c in sched if c[4] not in quarantined]
        # per-host pacing
        by_host: dict[str, list] = {}
        for c in sched:
            by_host.setdefault(c[4], []).append(c)
        timed = []  # (fetch_time, priority, ok, canon, host)
        for h, items in by_host.items():
            items.sort(key=lambda c: (c[0], c[1]))
            if max_pages_per_host is not None:
                used = pages_budget.get(h, 0)
                items = items[:max(0, max_pages_per_host - used)]
                pages_budget[h] = used + len(items)
            delay = rules.delay.get(h, 0.0)
            t0 = next_time.get(h, 0.0)
            for i, c in enumerate(items):
                timed.append((t0 + i * delay, c[0], c[1], c[2], h))
            if delay > 0:
                next_time[h] = t0 + len(items) * delay
            else:
                next_time[h] = t0
        timed.sort(key=lambda t: (t[0], t[1], t[2]))

        next_cands: list[tuple[int, int, str, bytes, str]] = []
        for ft, prio, ok, canon, host in timed:
            my_seq = seq
            seq += 1
            crawl_order.append((my_seq, canon, host, rnd))
            max_time = max(max_time, ft)
            spans = page_spans.get(canon)
            if spans is None:
                fetch_log.append((canon, "missing"))
                host_failures[host] = host_failures.get(host, 0) + 1
                continue
            fetch_log.append((canon, "fetched"))
            docs_out[canon] = spans

            # ---- frontier expansion: every link span in offset order
            for sp in spans:
                if sp["kind"] != "link":
                    continue
                child = _c(sp["media_ref"], base=canon)
                ch_host = host_of(child)
                if not domain_ok(ch_host):
                    continue
                from urllib.parse import urlsplit

                if not rules.allowed(ch_host, urlsplit(child).path):
                    continue
                ch_sha = url_sha1(child)
                if ch_sha in seen:
                    continue
                ok_key = (my_seq << OK_SHIFT) | min(
                    sp["offset"], (1 << OK_SHIFT) - 1
                )
                next_cands.append((0, ok_key, child, ch_sha, ch_host))

            # ---- ListSpider section extraction on profile pages
            if profile_re.match(canon):
                profile = user_profile_of(canon)
                section_links: list[dict] = []
                in_section = False
                sections: list[list[dict]] = []
                for sp in spans:
                    if sp["kind"] == "heading":
                        in_section = True
                        sections.append([])
                    elif sp["kind"] == "link" and in_section:
                        sections[-1].append(sp)
                for sec in sections:
                    if len(sec) > 1:
                        a1 = sec[1]
                        lid = id_from_url(a1["media_ref"])
                        if lid is None:
                            continue
                        lists_out[lid] = {
                            "list_id": lid,
                            "title": a1["text"].strip(),
                            "url": a1["media_ref"],
                            "user_profile": profile,
                            "scrape_status": "pending",
                            "scraped_at": ft,
                        }

            # ---- title-metadata spec on title leaf pages (the
            #      reference SPEC's title_metadata table,
            #      001_initial_schema.sql:63-79; persistence
            #      unimplemented in the reference pipeline)
            if title_re.match(canon):
                tid = id_from_url(canon)
                if tid is not None:
                    row = {"title_id": tid, "name": "", "cover_ref": "",
                           "synopsis": ""}
                    for sp in spans:
                        if sp["kind"] == "heading" and not row["name"]:
                            row["name"] = sp["text"]
                        elif sp["kind"] == "image" and not row["cover_ref"]:
                            row["cover_ref"] = sp["media_ref"]
                        elif sp["kind"] == "text" and not row["synopsis"]:
                            row["synopsis"] = sp["text"]
                    metadata_out[tid] = row
                    vol_re = re.compile(
                        r"^Volume ([0-9]+) \(([0-9]{4})\)$"
                    )
                    for sp in spans:
                        if sp["kind"] != "text":
                            continue
                        m = vol_re.match(sp["text"])
                        if m:
                            num = int(m.group(1))
                            vid = tid * 1000 + num
                            volumes_out[vid] = {
                                "volume_id": vid,
                                "title_id": tid,
                                "volume_number": num,
                                "year": int(m.group(2)),
                            }

            # ---- title links on list pages (publications semantics)
            if list_re.match(canon):
                lid = id_from_url(canon)
                if lid is not None:
                    pos = 0
                    for sp in spans:
                        if sp["kind"] != "link":
                            continue
                        child = _c(sp["media_ref"], base=canon)
                        if not domain_ok(host_of(child)):
                            continue
                        tid = id_from_url(sp["media_ref"])
                        if tid is None:
                            continue
                        key = (lid, tid)
                        if key not in junction:
                            junction[key] = pos
                        if tid not in titles_out:
                            titles_out[tid] = {
                                "title_id": tid,
                                "title": sp["text"],
                                "url": child,
                                "scrape_status": "pending",
                            }
                        pos += 1

        if host_fail_budget is not None:
            for h, n in host_failures.items():
                if n >= host_fail_budget:
                    quarantined.add(h)
        cands = next_cands
        rnd += 1

    # title_enriched: derived from volumes (n_volumes, first_year)
    import json as _json

    enriched_out: dict[int, dict] = {}
    for row in volumes_out.values():
        tid = row["title_id"]
        e = enriched_out.setdefault(
            tid, {"title_id": tid, "rating": None,
                  "n_volumes": 0, "first_year": 10**9}
        )
        e["n_volumes"] += 1
        e["first_year"] = min(e["first_year"], row["year"])
    for e in enriched_out.values():
        e["additional_data"] = _json.dumps(
            {"n_volumes": e.pop("n_volumes"),
             "first_year": e.pop("first_year")},
            sort_keys=True,
        )

    # close sweep: pending → completed at the logical close time
    close_time = float(int(max_time) + 1)
    for row in lists_out.values():
        row["scrape_status"] = "completed"
        row["scraped_at"] = close_time

    return OracleResult(
        crawl_order=crawl_order,
        seen=seen,
        docs_out=docs_out,
        lists_out=lists_out,
        junction_out=junction,
        titles_out=titles_out,
        metadata_out=metadata_out,
        volumes_out=volumes_out,
        enriched_out=enriched_out,
        close_time=close_time,
        fetch_log=fetch_log,
    )
