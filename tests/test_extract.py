"""Extractor unit tests on hand-written span rows (SURVEY.md §5.2.4)."""

from __future__ import annotations

import pyarrow as pa

from whakoom_webscrapper_ray.schemas import PAGES_SCHEMA
from whakoom_webscrapper_ray.stages.extract import (
    classify_pages,
    extract_links,
    extract_profile_sections,
    extract_sections,
    extract_title_links,
    ids_from_url_tail,
    rank_positions,
)


def _page(doc_id: str, spans: list[tuple[str, str, str]]) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ],
    }


def _tbl(pages: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(pages, schema=PAGES_SCHEMA)


def test_extract_links_document_order():
    t = _tbl(
        [
            _page(
                "https://h/a",
                [
                    ("text", "x", ""),
                    ("link", "L1", "/l1"),
                    ("image", "", "img.jpg"),
                    ("link", "L2", "/l2"),
                ],
            ),
            _page("https://h/b", [("link", "L3", "/l3")]),
        ]
    )
    out = extract_links(t)
    assert out.column("href").to_pylist() == ["/l1", "/l2", "/l3"]
    assert out.column("anchor_text").to_pylist() == ["L1", "L2", "L3"]
    assert out.column("src_doc_id").to_pylist() == [
        "https://h/a", "https://h/a", "https://h/b",
    ]
    assert out.column("offset").to_pylist() == [1, 3, 0]


def test_sections_arity_and_second_link():
    # lists.py:45-47 — sections need >1 link; the SECOND anchor wins.
    t = _tbl(
        [
            _page(
                "https://h/u/lists",
                [
                    ("heading", "S0", ""),
                    ("link", "icon", "/u"),
                    ("link", "  My List  ", "/u/lists/my_list_42"),
                    ("heading", "S1", ""),
                    ("link", "only one", "/solo_7"),  # skipped: arity 1
                    ("heading", "S2", ""),
                    ("link", "a", "/x"),
                    ("link", "no id", "/u/profile"),  # non-numeric tail
                ],
            )
        ]
    )
    out = extract_sections(t)
    assert out.num_rows == 1
    assert out.column("list_id").to_pylist() == [42]
    assert out.column("title").to_pylist() == ["My List"]  # stripped
    assert out.column("url").to_pylist() == ["/u/lists/my_list_42"]  # verbatim


def test_sections_ignore_preheading_links():
    t = _tbl(
        [
            _page(
                "https://h/u/lists",
                [
                    ("link", "nav", "/nav_1"),
                    ("link", "nav2", "/nav_2"),
                    ("heading", "S0", ""),
                    ("link", "a", "/a_1"),
                    ("link", "b", "/b_2"),
                ],
            )
        ]
    )
    out = extract_sections(t)
    assert out.column("list_id").to_pylist() == [2]


def test_classify_and_title_links():
    pages = [
        _page("https://h/u/lists", [("heading", "s", "")]),
        _page(
            "https://h/u/lists/slug_10",
            [
                ("heading", "Titles", ""),
                ("link", "T1", "https://h/comics/t_100"),
                ("text", "mid", ""),
                ("link", "T2", "https://h/comics/t_200"),
            ],
        ),
        _page("https://h/comics/t_100", [("text", "leaf", "")]),
    ]
    t = _tbl(pages)
    masks = classify_pages(t.column("doc_id").combine_chunks())
    assert masks["profile"].tolist() == [True, False, False]
    assert masks["list"].tolist() == [False, True, False]

    out = extract_title_links(t)
    assert out.column("list_id").to_pylist() == [10, 10]
    assert out.column("anchor_text").to_pylist() == ["T1", "T2"]
    assert out.column("offset").to_pylist() == [1, 3]


def test_ids_from_url_tail():
    arr = pa.array(["/a_12", "/b_x", "https://h/c_9/", "/plain"])
    assert ids_from_url_tail(arr).to_pylist() == [12, None, 9, None]


def test_rank_positions():
    t = pa.table(
        {"list_id": [1, 1, 1, 2, 2], "offset": [3, 5, 9, 0, 4]}
    )
    out = rank_positions(t)
    assert out.column("position").to_pylist() == [0, 1, 2, 0, 1]


def test_profile_scope():
    pages = [
        _page(
            "https://h/u/lists/slug_10",  # list page: no section output
            [
                ("heading", "x", ""),
                ("link", "a", "/a_1"),
                ("link", "b", "/b_2"),
            ],
        ),
    ]
    out = extract_profile_sections(_tbl(pages))
    assert out.num_rows == 0
