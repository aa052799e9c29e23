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

    # --- title pages (leaves): heading/image/synopsis plus volume
    #     listing spans (the reference's volumes table data,
    #     001_initial_schema.sql:45-58) — text spans, so no extra
    #     crawl level is introduced.
    for t in range(n_unique_titles):
        tid = int(title_ids[t])
        spans = [
            {"kind": "heading", "text": title_names[t], "media_ref": "",
             "offset": 0},
            {"kind": "image", "text": "",
             "media_ref": f"https://cdn.example/covers/{tid}.jpg",
             "offset": 1},
            {"kind": "text",
             "text": f"Synopsis of {title_names[t]} ({tid})",
             "media_ref": "", "offset": 2},
        ]
        n_volumes = 1 + tid % 4
        for v in range(1, n_volumes + 1):
            spans.append(
                {"kind": "text",
                 "text": f"Volume {v} ({1990 + (tid + v) % 30})",
                 "media_ref": "", "offset": len(spans)}
            )
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
    r_host, r_delay, r_dis, r_alw = [], [], [], []
    for hi, host in enumerate(hosts):
        delay = 0.0
        dis: list[str] = []
        alw: list[str] = []
        if 1 <= hi <= cfg.delayed_hosts:
            delay = 2.0
        if cfg.disallow_hosts and hi == cfg.num_hosts - 1:
            # disallow this host's /comics prefix: its title pages are
            # linked but must never be fetched nor enter the seen set —
            # EXCEPT titles whose id ends in 0, re-allowed by a longer
            # wildcard Allow rule (RFC 9309 longest-match precedence).
            dis = ["/comics/"]
            alw = ["/comics/*0$"]
        if cfg.disallow_hosts and hi == cfg.num_hosts - 2:
            # wildcard + anchored disallow: this host's per-profile
            # settings links never become crawl candidates.
            dis = ["/user*/settings$"]
        r_host.append(host)
        r_delay.append(delay)
        r_dis.append(dis)
        r_alw.append(alw)
    robots = pa.Table.from_pydict(
        {"host": r_host, "crawl_delay": r_delay, "disallow": r_dis,
         "allow": r_alw},
        schema=ROBOTS_SCHEMA,
    )

    return {"pages": pages, "seeds": seeds, "robots": robots}


def generate_web_fast(cfg: SynthConfig) -> dict[str, pa.Table]:
    """Vectorized generator for BENCH-scale webs (10^6+ pages).

    Same schema and crawl shape as :func:`generate_web` (profile →
    list → title levels, relative profile hrefs, arity-skip section,
    robots delay/disallow fixtures) but built with Arrow ``take`` over
    string pools and numpy index arithmetic — no per-span Python
    objects, so a ~10M-span web generates in seconds.  A different
    (simpler) fixture instance than generate_web: list pages interleave
    an ``image`` span every 4th rank and carry no offsite links.
    """
    import pyarrow.compute as _pc

    rng = np.random.Generator(np.random.PCG64(cfg.seed))
    H, L, T = cfg.num_hosts, cfg.lists_per_profile, cfg.titles_per_list
    hosts_np = np.array([_host(i) for i in range(H)], dtype=object)

    slots = H * L * T
    n_unique = max(1, int(slots * (1.0 - cfg.dup_link_frac)))
    title_ids = 200_000 + np.arange(n_unique, dtype=np.int64)
    id_str = _pc.cast(pa.array(title_ids), pa.string())
    if cfg.hot_host_frac > 0 and H > 1:
        p = np.full(H, (1.0 - cfg.hot_host_frac) / (H - 1))
        p[0] = cfg.hot_host_frac
    else:
        p = np.full(H, 1.0 / H)
    home = rng.choice(H, size=n_unique, p=p)

    j = _pc.binary_join_element_wise
    host_arr = pa.array(hosts_np[home], pa.string())
    title_url = j("https://", host_arr, "/comics/t_", id_str, "")
    title_name = j("title ", id_str, "")
    cover = j("https://cdn.example/covers/", id_str, ".jpg", "")
    synopsis = j("Synopsis ", id_str, "")
    empty1 = pa.array([""], pa.string())

    all_doc_ids: list[pa.Array] = []
    all_offsets: list[np.ndarray] = []   # list-boundary offsets per block
    all_kind: list[pa.Array] = []
    all_text: list[pa.Array] = []
    all_media: list[pa.Array] = []
    kind_pool = pa.array(["heading", "text", "link", "image"], pa.string())

    def take_kind(codes: np.ndarray) -> pa.Array:
        return kind_pool.take(pa.array(codes, pa.int64()))

    # ---- profile pages (small: python loop over H, as in generate_web)
    prof_doc, prof_spans_kind, prof_text, prof_media = [], [], [], []
    prof_bounds = [0]
    list_id0 = 100_000
    list_host = np.repeat(np.arange(H), L)
    list_ids = list_id0 + np.arange(H * L, dtype=np.int64)
    lid_str = _pc.cast(pa.array(list_ids), pa.string())
    prof_of_host = [f"user{h}_0" for h in range(H)]
    lrel = j(
        "/", pa.array(np.array(prof_of_host, dtype=object)[list_host]),
        "/lists/l_", lid_str, "",
    )
    lrel_np = lrel.to_numpy(zero_copy_only=False)
    lname = j("list ", lid_str, "")
    lname_np = lname.to_numpy(zero_copy_only=False)
    for h in range(H):
        profile = prof_of_host[h]
        prof_doc.append(f"https://{hosts_np[h]}/{profile}/lists")
        kinds = [1]
        texts = [f"Lists curated by {profile}"]
        media = [""]
        for li in range(L):
            gi = h * L + li
            kinds += [0, 2, 2]
            texts += [f"Section {li}", "★", f"  {lname_np[gi]}  "]
            media += ["", f"/{profile}", lrel_np[gi]]
        kinds += [0, 2]  # single-link section: must be arity-skipped
        texts += ["About", "profile settings"]
        media += ["", f"/{profile}/settings"]
        prof_spans_kind.extend(kinds)
        prof_text.extend(texts)
        prof_media.extend(media)
        prof_bounds.append(len(prof_spans_kind))
    all_doc_ids.append(pa.array(prof_doc, pa.string()))
    all_offsets.append(np.array(prof_bounds, dtype=np.int64))
    all_kind.append(take_kind(np.array(prof_spans_kind)))
    all_text.append(pa.array(prof_text, pa.string()))
    all_media.append(pa.array(prof_media, pa.string()))

    # ---- list pages: vectorized template (heading, then per rank:
    #      [image every 4th] link)
    P = H * L
    chosen = rng.integers(0, n_unique, size=(P, T))
    slot_kind: list[int] = [0]          # heading
    slot_rank: list[int] = [-1]
    for r in range(T):
        if r % 4 == 0:
            slot_kind.append(3)          # image
            slot_rank.append(r)
        slot_kind.append(2)              # link
        slot_rank.append(r)
    S = len(slot_kind)
    slot_kind_np = np.array(slot_kind, dtype=np.int64)
    slot_rank_np = np.array(slot_rank, dtype=np.int64)

    # text pool: [title_name (U), "Titles in this list", ""]
    text_pool = pa.concat_arrays(
        [title_name.combine_chunks() if isinstance(title_name, pa.ChunkedArray)
         else title_name,
         pa.array(["Titles in this list", ""], pa.string())]
    )
    U = n_unique
    tidx = np.empty((P, S), dtype=np.int64)
    tidx[:, 0] = U                       # heading text
    media_pool = pa.concat_arrays(
        [title_url.combine_chunks() if isinstance(title_url, pa.ChunkedArray)
         else title_url,
         cover.combine_chunks() if isinstance(cover, pa.ChunkedArray)
         else cover,
         empty1]
    )
    midx = np.empty((P, S), dtype=np.int64)
    midx[:, 0] = 2 * U                   # heading media = ""
    for s in range(1, S):
        r = slot_rank_np[s]
        if slot_kind_np[s] == 2:         # link: text=name, media=url
            tidx[:, s] = chosen[:, r]
            midx[:, s] = chosen[:, r]
        else:                            # image: text="", media=cover
            tidx[:, s] = U + 1
            midx[:, s] = U + chosen[:, r]
    lurl_abs = j("https://", pa.array(hosts_np[list_host], pa.string()),
                 lrel, "")
    all_doc_ids.append(
        lurl_abs.combine_chunks()
        if isinstance(lurl_abs, pa.ChunkedArray) else lurl_abs
    )
    all_offsets.append(np.arange(P + 1, dtype=np.int64) * S)
    all_kind.append(take_kind(np.tile(slot_kind_np, P)))
    all_text.append(text_pool.take(pa.array(tidx.ravel(), pa.int64())))
    all_media.append(media_pool.take(pa.array(midx.ravel(), pa.int64())))

    # ---- leaf title pages: template (heading name, image cover,
    #      text synopsis)
    leaf_text_pool = pa.concat_arrays(
        [title_name.combine_chunks() if isinstance(title_name, pa.ChunkedArray)
         else title_name,
         synopsis.combine_chunks() if isinstance(synopsis, pa.ChunkedArray)
         else synopsis,
         empty1]
    )
    leaf_media_pool = pa.concat_arrays(
        [cover.combine_chunks() if isinstance(cover, pa.ChunkedArray)
         else cover, empty1]
    )
    lt = np.empty(3 * U, dtype=np.int64)
    lt[0::3] = np.arange(U)              # heading: name
    lt[1::3] = 2 * U                     # image: ""
    lt[2::3] = U + np.arange(U)          # text: synopsis
    lm = np.empty(3 * U, dtype=np.int64)
    lm[0::3] = U                         # heading media ""
    lm[1::3] = np.arange(U)              # image: cover
    lm[2::3] = U
    all_doc_ids.append(
        title_url.combine_chunks()
        if isinstance(title_url, pa.ChunkedArray) else title_url
    )
    all_offsets.append(np.arange(U + 1, dtype=np.int64) * 3)
    all_kind.append(take_kind(np.tile(np.array([0, 3, 1]), U)))
    all_text.append(leaf_text_pool.take(pa.array(lt, pa.int64())))
    all_media.append(leaf_media_pool.take(pa.array(lm, pa.int64())))

    # ---- assemble pages table (one ListArray per level, concatenated)
    page_chunks = []
    for doc_ids, bounds, kinds, texts, media in zip(
        all_doc_ids, all_offsets, all_kind, all_text, all_media
    ):
        n_spans = bounds[-1]
        offs_col = np.empty(n_spans, dtype=np.int32)
        # per-span offset within its page: position - page_start
        page_start = np.repeat(bounds[:-1], np.diff(bounds))
        offs_col = (np.arange(n_spans) - page_start).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [kinds, texts, media, pa.array(offs_col, pa.int32())],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()), struct
        )
        page_chunks.append(
            pa.table({"doc_id": doc_ids, "spans": spans},
                     schema=PAGES_SCHEMA)
        )
    pages = pa.concat_tables(page_chunks).combine_chunks()

    # ---- seeds + robots (identical layout to generate_web)
    seed_urls = [
        f"https://{_host(h)}/user{h}_0/lists" for h in range(H)
    ]
    dup = seed_urls[0].replace("https://", "HTTPS://").replace(
        ".example/", ".EXAMPLE:443/"
    )
    seeds = pa.Table.from_pydict(
        {
            "seed_index": list(range(H + 1)),
            "url": seed_urls + [dup],
            "priority": [0] * (H + 1),
        },
        schema=SEEDS_SCHEMA,
    )
    r_host, r_delay, r_dis, r_alw = [], [], [], []
    for hi in range(H):
        delay = 2.0 if 1 <= hi <= cfg.delayed_hosts else 0.0
        dis, alw = [], []
        if cfg.disallow_hosts and hi == H - 1:
            dis, alw = ["/comics/"], ["/comics/*0$"]
        if cfg.disallow_hosts and hi == H - 2:
            dis = ["/user*/settings$"]
        r_host.append(str(hosts_np[hi]))
        r_delay.append(delay)
        r_dis.append(dis)
        r_alw.append(alw)
    robots = pa.Table.from_pydict(
        {"host": r_host, "crawl_delay": r_delay, "disallow": r_dis,
         "allow": r_alw},
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


def paginate_pages(pages: pa.Table, chunk: int = 4, every: int = 2,
                   terminal_repeat_every: int = 3) -> pa.Table:
    """Explode a pages table into dynamic page STATES — the S3 "Load
    more" fixture (reference publications.py:74-93: one logical page,
    successive states accumulate list items until a click loads
    nothing new or the button disappears).

    Deterministic: every ``every``-th page with more than ``chunk``
    spans becomes a dynamic page whose state s carries its first
    ``chunk``·(s+1) spans (cumulative prefixes, like a real "Load
    more" page); every ``terminal_repeat_every``-th such page ALSO
    repeats its full content as one extra state (the
    click-loads-nothing stop), while the others end by state absence
    (the button-gone ``TimeoutException`` stop) — both reference
    termination paths are represented.  Static pages keep one row at
    state 0.  The terminal state of every URL equals its original
    spans, so a conforming engine produces the SAME crawl as from the
    stateless table.
    """
    doc_ids = pages["doc_id"].to_pylist()
    spans = pages["spans"].to_pylist()
    out_d: list[str] = []
    out_st: list[int] = []
    out_sp: list[list] = []
    pag_i = 0
    for i, (d, sp) in enumerate(zip(doc_ids, spans)):
        if i % every == 0 and len(sp) > chunk:
            nstates = -(-len(sp) // chunk)
            for s in range(nstates):
                out_d.append(d)
                out_st.append(s)
                out_sp.append(sp[: min(len(sp), (s + 1) * chunk)])
            if pag_i % terminal_repeat_every == 0:
                out_d.append(d)
                out_st.append(nstates)
                out_sp.append(sp)
            pag_i += 1
        else:
            out_d.append(d)
            out_st.append(0)
            out_sp.append(sp)
    return pa.table({
        "doc_id": pa.array(out_d, pa.string()),
        "state": pa.array(out_st, pa.int64()),
        "spans": pa.array(out_sp, pages["spans"].type),
    })
