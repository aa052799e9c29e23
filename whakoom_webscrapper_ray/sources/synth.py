"""Deterministic synthetic web generator (seed=42, FIXTURES.md §1-§3).

Builds the three crawl-fixture tables — ``pages``, ``seeds``, ``robots``
— with the 3-level site graph mirroring the reference crawl shape:

    profile page  →  list pages  →  title pages
    (spiders/lists.py)  (spiders/publications.py)

Rules encoded (FIXTURES.md):
- profile pages: sections = ``heading`` span then >=2 ``link`` spans
  (the ``len(a) > 1`` arity rule, lists.py:45); some sections have
  exactly 1 link and must be skipped by the extractor;
- list pages: interleaved ``text``/``image``/``link`` spans; ~10% of
  title links are duplicates across lists (dedup-once invariant) and
  ~5% point off-domain (offsite filter, lists.py:16);
- profile-page hrefs are RELATIVE (the reference stores relative hrefs,
  lists.py:52) — exercises RFC 3986 reference resolution; elsewhere
  absolute;
- list/title URLs end in ``_<numeric id>`` so
  ``int(url.rsplit('_',1)[-1])`` yields a stable id (lists.py:47).

Everything derives from ``numpy.random.Generator(PCG64(seed))`` so the
same parameters always produce bit-identical tables.  No network.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..schemas import PAGES_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA

_WORDS = (
    "shojo shonen seinen manga comic tomo viz panini norma ivrea planeta "
    "glenat arechi milky kodansha shueisha tokyopop babel drama romance "
    "slice life action mystery horror fantasy school sports music idol"
).split()


@dataclass
class SynthConfig:
    """Knobs for the synthetic web; presets below match FIXTURES.md §1."""

    seed: int = 42
    num_hosts: int = 8
    profiles_per_host: int = 1
    lists_per_profile: int = 4
    titles_per_list: int = 6
    dup_link_frac: float = 0.10      # titles shared across lists
    offsite_frac: float = 0.05       # links pointing off-domain
    hot_host_frac: float = 0.0       # extra doc share for host 0 (skew path)
    # politeness fixture
    delayed_hosts: int = 1           # hosts with crawl_delay=2.0
    disallow_hosts: int = 1          # hosts with a /private disallow rule
    extra: dict = field(default_factory=dict)


SMALL = SynthConfig()  # 8 hosts × ~40 docs
MEDIUM = SynthConfig(
    num_hosts=32, lists_per_profile=6, titles_per_list=10, hot_host_frac=0.30
)


def bench_config(num_hosts: int = 64, lists_per_profile: int = 12,
                 titles_per_list: int = 40) -> SynthConfig:
    """Scaled-up config with the same rules (FIXTURES.md 'bench')."""
    return SynthConfig(
        num_hosts=num_hosts,
        lists_per_profile=lists_per_profile,
        titles_per_list=titles_per_list,
        hot_host_frac=0.30,
    )


def _host(i: int) -> str:
    return f"host{i}.example"


def _title_words(rng: np.random.Generator, n: int = 3) -> str:
    return " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), size=n))


def generate_web(cfg: SynthConfig) -> dict[str, pa.Table]:
    """Generate {pages, seeds, robots} Arrow tables deterministically."""
    rng = np.random.Generator(np.random.PCG64(cfg.seed))

    hosts = [_host(i) for i in range(cfg.num_hosts)]

    # --- global title pool: titles may be shared across lists (dup links)
    total_title_slots = (
        cfg.num_hosts * cfg.profiles_per_host * cfg.lists_per_profile
        * cfg.titles_per_list
    )
    n_unique_titles = max(1, int(total_title_slots * (1.0 - cfg.dup_link_frac)))

    # Assign each unique title to a home host (hot host takes extra share).
    if cfg.hot_host_frac > 0 and cfg.num_hosts > 1:
        p = np.full(cfg.num_hosts, (1.0 - cfg.hot_host_frac) / (cfg.num_hosts - 1))
        p[0] = cfg.hot_host_frac
    else:
        p = np.full(cfg.num_hosts, 1.0 / cfg.num_hosts)
    title_home = rng.choice(cfg.num_hosts, size=n_unique_titles, p=p)
    title_ids = 200_000 + np.arange(n_unique_titles)
    title_names = [_title_words(rng) for _ in range(n_unique_titles)]
    title_urls = [
        f"https://{hosts[title_home[t]]}/comics/"
        f"{title_names[t].replace(' ', '_')}_{title_ids[t]}"
        for t in range(n_unique_titles)
    ]

    pages_doc_id: list[str] = []
    pages_spans: list[list[dict]] = []

    def add_page(url: str, spans: list[dict]) -> None:
        pages_doc_id.append(url)
        pages_spans.append(spans)

    next_list_id = 100_000
    list_pages: list[tuple[str, list[int]]] = []  # (url, title indices)

    # --- profile pages with sections of list links (relative hrefs)
    for hi, host in enumerate(hosts):
        for pi in range(cfg.profiles_per_host):
            profile = f"user{hi}_{pi}"
            purl = f"https://{host}/{profile}/lists"
            spans: list[dict] = []
            off = 0

            def span(kind: str, text: str = "", media_ref: str = "") -> None:
                nonlocal off
                spans.append(
                    {"kind": kind, "text": text, "media_ref": media_ref,
                     "offset": off}
                )
                off += 1

            span("text", f"Lists curated by {profile}")
            for li in range(cfg.lists_per_profile):
                lid = next_list_id
                next_list_id += 1
                lname = _title_words(rng, 4)
                lslug = lname.replace(" ", "_")
                lurl_rel = f"/{profile}/lists/{lslug}_{lid}"
                span("heading", f"Section {li}")
                # First link in a section is decorative (an icon link);
                # the reference takes a[1] (lists.py:46-47).
                span("link", "★", f"/{profile}")
                span("link", f"  {lname}  ", lurl_rel)  # strip() target
                if rng.random() < 0.5:
                    span("text", f"{cfg.titles_per_list} titles")
                list_pages.append(
                    (f"https://{host}{lurl_rel}", [])
                )
            # a single-link section that must be skipped (arity rule)
            span("heading", "About")
            span("link", "profile settings", f"/{profile}/settings")
            add_page(purl, spans)

    # --- choose titles for each list page (dups come from reuse)
    for idx, (lurl, tlist) in enumerate(list_pages):
        chosen = rng.integers(0, n_unique_titles, size=cfg.titles_per_list)
        tlist.extend(int(t) for t in chosen)

    # --- list pages: interleaved text/image/link spans
    for lurl, tlist in list_pages:
        spans = []
        off = 0

        def span(kind: str, text: str = "", media_ref: str = "") -> None:
            nonlocal off
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref,
                 "offset": off}
            )
            off += 1

        span("heading", "Titles in this list")
        for rank, t in enumerate(tlist):
            if rng.random() < 0.4:
                span("text", f"entry {rank}")
            if rng.random() < 0.5:
                span("image", "", f"https://cdn.example/covers/{title_ids[t]}.jpg")
            if rng.random() < cfg.offsite_frac:
                span("link", "buy at external shop",
                     f"https://shop{int(rng.integers(0, 5))}.offsite/buy_{title_ids[t]}")
            span("link", title_names[t], title_urls[t])
        add_page(lurl, spans)

    # --- title pages (leaves): a few text/image spans, no out-links
    for t in range(n_unique_titles):
        spans = [
            {"kind": "heading", "text": title_names[t], "media_ref": "",
             "offset": 0},
            {"kind": "image", "text": "",
             "media_ref": f"https://cdn.example/covers/{title_ids[t]}.jpg",
             "offset": 1},
            {"kind": "text",
             "text": f"Synopsis of {title_names[t]} ({title_ids[t]})",
             "media_ref": "", "offset": 2},
        ]
        add_page(title_urls[t], spans)

    pages = pa.Table.from_pydict(
        {"doc_id": pages_doc_id, "spans": pages_spans}, schema=PAGES_SCHEMA
    )

    # --- seeds: profile pages (FIXTURES.md §2) + one list page + one
    #     duplicate-after-canonicalization of seed 0.
    seed_urls: list[str] = []
    for hi in range(cfg.num_hosts):
        seed_urls.append(f"https://{_host(hi)}/user{hi}_0/lists")
    seed_rows = {
        "seed_index": [], "url": [], "priority": [],
    }
    for i, u in enumerate(seed_urls):
        seed_rows["seed_index"].append(i)
        seed_rows["url"].append(u)
        seed_rows["priority"].append(0)
    # non-canonical duplicate of seed 0: uppercase host + default port
    first = seed_urls[0]
    dup = first.replace("https://", "HTTPS://").replace(
        ".example/", ".EXAMPLE:443/"
    )
    seed_rows["seed_index"].append(len(seed_urls))
    seed_rows["url"].append(dup)
    seed_rows["priority"].append(0)
    seeds = pa.Table.from_pydict(seed_rows, schema=SEEDS_SCHEMA)

    # --- robots: hot host delay 0; some hosts delayed; some disallowed
    r_host, r_delay, r_dis = [], [], []
    for hi, host in enumerate(hosts):
        delay = 0.0
        dis: list[str] = []
        if 1 <= hi <= cfg.delayed_hosts:
            delay = 2.0
        if cfg.disallow_hosts and hi == cfg.num_hosts - 1:
            # disallow this host's /comics prefix: its title pages are
            # linked but must never be fetched nor enter the seen set.
            dis = ["/comics/"]
        r_host.append(host)
        r_delay.append(delay)
        r_dis.append(dis)
    robots = pa.Table.from_pydict(
        {"host": r_host, "crawl_delay": r_delay, "disallow": r_dis},
        schema=ROBOTS_SCHEMA,
    )

    return {"pages": pages, "seeds": seeds, "robots": robots}


def write_web(tables: dict[str, pa.Table], out_dir: str) -> None:
    """Write the fixture tables as parquet files under ``out_dir``."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
