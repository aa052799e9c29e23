"""S7 named-query loader/executor (reference sqlmanager.py:36-67
block grammar; queries/lists.sql surface) over an exported table dir."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from whakoom_webscrapper_ray.namedq import (
    NamedQueryStore,
    load_query_dir,
    parse_named_queries,
)


def test_parse_block_grammar():
    content = (
        "# get_a\nSELECT 1;\n"
        "#  GET_B  \nSELECT\n  2;\n"
        "# c\nSELECT 3;"
    )
    q = parse_named_queries(content)
    # names upper-cased, bodies stripped
    assert q == {"GET_A": "SELECT 1;", "GET_B": "SELECT\n  2;",
                 "C": "SELECT 3;"}


def test_load_query_dir_unions_files(tmp_path):
    (tmp_path / "a.sql").write_text("# Q1\nSELECT 1;\n")
    (tmp_path / "b.sql").write_text("# Q2\nSELECT 2;\n# Q1\nSELECT 9;\n")
    (tmp_path / "notes.txt").write_text("# NOT_SQL\nignored")
    q = load_query_dir(str(tmp_path))
    assert set(q) == {"Q1", "Q2"}
    assert q["Q1"] == "SELECT 9;"  # later file wins


@pytest.fixture()
def export_dir(tmp_path):
    """Minimal cli-export-shaped directory: table subdirs with parquet
    fragments plus a top-level crawl_order.parquet."""
    root = tmp_path / "export"
    for name, tbl in {
        "lists": pa.table({
            "list_id": [1, 2, 3],
            "title": ["a", "b", "c"],
            "url": ["/u1/lists/a_1", "/u1/lists/b_2", "/u2/lists/c_3"],
            "user_profile": ["u1", "u1", "u2"],
            "scrape_status": ["completed", "pending", "completed"],
            "scraped_at": ["t1", "t2", "t3"],
        }),
        "titles": pa.table({
            "title_id": [10, 11],
            "title": ["x", "y"],
            "url": ["hx", "hy"],
            "scrape_status": ["completed", "completed"],
        }),
        "junction": pa.table({
            "list_id": [1, 1, 2],
            "title_id": [11, 10, 10],
            "position": [0, 1, 0],
        }),
    }.items():
        d = root / name
        os.makedirs(d)
        # two fragments to prove the glob spans partitioned output
        pq.write_table(tbl.slice(0, 1), d / "part-0.parquet")
        pq.write_table(tbl.slice(1), d / "part-1.parquet")
    pq.write_table(
        pa.table({"seq": [0, 1], "url": ["s", "t"],
                  "host": ["h", "h"], "round": [0, 1]}),
        root / "crawl_order.parquet",
    )
    return str(root)


def test_run_by_name_with_params(export_dir):
    store = NamedQueryStore(export_dir)
    one = store.run("get_list_by_id", 2)
    assert one.to_pylist() == [{
        "list_id": 2, "title": "b", "url": "/u1/lists/b_2",
        "user_profile": "u1", "scrape_status": "pending",
        "scraped_at": "t2",
    }]
    by_status = store.run("GET_LISTS_BY_STATUS", "completed")
    assert by_status.column("list_id").to_pylist() == [1, 3]
    # join across exported tables, ordered by junction position
    fl = store.run("GET_TITLES_FOR_LIST", 1)
    assert fl.column("title_id").to_pylist() == [11, 10]
    assert fl.column("position").to_pylist() == [0, 1]
    store.close()


def test_top_level_parquet_registers_as_view(export_dir):
    store = NamedQueryStore(export_dir, queries={
        "ORDER_HEAD": "SELECT seq, url FROM crawl_order ORDER BY seq",
    })
    assert store.run("ORDER_HEAD").column("url").to_pylist() == ["s", "t"]


def test_insert_or_update_list_by_name(export_dir):
    """S7 mutating parity (sqlmanager.py:119-139): the named INSERT..ON
    CONFLICT runs as a keyed upsert and the change reads back by name."""
    store = NamedQueryStore(export_dir)
    r = store.run("INSERT_OR_UPDATE_LIST", 4, "d", "/u3/lists/d_4",
                  "u3", "pending", "t4")
    assert r.to_pylist() == [{"rows_affected": 1}]
    got = store.run("GET_LIST_BY_ID", 4).to_pylist()
    assert got == [{
        "list_id": 4, "title": "d", "url": "/u3/lists/d_4",
        "user_profile": "u3", "scrape_status": "pending",
        "scraped_at": "t4",
    }]
    # conflict path: SET updates only the listed columns — the stored
    # user_profile survives (reference queries/lists.sql:4-9)
    store.run("INSERT_OR_UPDATE_LIST", 4, "d2", "/u3/lists/d_4",
              "SOMEONE_ELSE", "completed", "t5")
    got = store.run("GET_LIST_BY_ID", 4).to_pylist()[0]
    assert got["title"] == "d2"
    assert got["scrape_status"] == "completed"
    assert got["scraped_at"] == "t5"
    assert got["user_profile"] == "u3"   # NOT updated on conflict
    assert store.run("GET_ALL_LISTS").num_rows == 4
    store.close()


def test_update_list_status_by_name(export_dir):
    store = NamedQueryStore(export_dir)
    r = store.run("UPDATE_LIST_STATUS", "completed", 2)
    assert r.to_pylist() == [{"rows_affected": 1}]
    got = store.run("GET_LIST_BY_ID", 2).to_pylist()[0]
    assert got["scrape_status"] == "completed"
    assert got["scraped_at"] != "t2"    # CURRENT_TIMESTAMP applied
    assert got["title"] == "b"          # untouched columns survive
    # absent key: 0 rows affected, nothing written
    assert store.run("UPDATE_LIST_STATUS", "x", 999).to_pylist() == [
        {"rows_affected": 0}
    ]
    assert store.run("GET_ALL_LISTS").num_rows == 3
    store.close()


def test_unsupported_mutation_refused(export_dir):
    store = NamedQueryStore(export_dir, queries={
        "DELETE_ALL": "DELETE FROM lists;",
    })
    with pytest.raises(ValueError, match="write_tables"):
        store.run("DELETE_ALL")


def test_unknown_name_and_add_file(export_dir, tmp_path):
    store = NamedQueryStore(export_dir)
    with pytest.raises(KeyError):
        store.run("NO_SUCH_QUERY")
    extra = tmp_path / "extra.sql"
    extra.write_text("# N_LISTS\nSELECT COUNT(*) AS n FROM lists;\n")
    store.add_file(str(extra))
    assert store.run("N_LISTS").to_pylist() == [{"n": 3}]


def test_shipped_pack_covers_reference_read_surface():
    """Every read query of the reference's queries/lists.sql has a
    same-named entry in the shipped pack (schema-adapted)."""
    q = load_query_dir(
        os.path.join(os.path.dirname(__file__), "..",
                     "whakoom_webscrapper_ray", "queries")
    )
    for name in ("GET_LISTS_BY_STATUS", "GET_LISTS_BY_USER_PROFILE",
                 "GET_LIST_BY_ID", "GET_ALL_LISTS",
                 "INSERT_OR_UPDATE_LIST"):
        assert name in q


def test_plain_insert_existing_key_raises(export_dir, tmp_path):
    """SQLite IntegrityError parity: an INSERT with NO ON CONFLICT
    clause hitting a live key must raise, not silently replace the
    stored row (which would clobber columns the reference preserves)."""
    store = NamedQueryStore(export_dir)
    extra = tmp_path / "plain_insert.sql"
    extra.write_text(
        "# PLAIN_INSERT\n"
        "INSERT INTO lists (list_id, title, url, user_profile, "
        "scrape_status, scraped_at) VALUES (?, ?, ?, ?, ?, ?);\n"
    )
    store.add_file(str(extra))
    r = store.run("PLAIN_INSERT", 7, "g", "/u9/lists/g_7", "u9",
                  "pending", "t7")
    assert r.to_pylist() == [{"rows_affected": 1}]
    with pytest.raises(ValueError, match="UNIQUE constraint failed"):
        store.run("PLAIN_INSERT", 7, "CLOBBER", "/x", "X",
                  "completed", "t8")
    got = store.run("GET_LIST_BY_ID", 7).to_pylist()[0]
    assert got["title"] == "g" and got["user_profile"] == "u9"
    store.close()


def test_mutation_unknown_table_raises_valueerror(export_dir):
    """A mutation against an exported table with no registered natural
    key gets run()'s descriptive ValueError, not a raw KeyError."""
    d = os.path.join(export_dir, "scraping_log")
    os.makedirs(d)
    pq.write_table(
        pa.table({"entity_id": [1], "operation": ["insert"]}),
        os.path.join(d, "part-0.parquet"),
    )
    store = NamedQueryStore(export_dir, queries={
        "LOG_INSERT": (
            "INSERT INTO scraping_log (entity_id, operation) "
            "VALUES (?, ?);"
        ),
    })
    with pytest.raises(ValueError, match="no registered natural key"):
        store.run("LOG_INSERT", 2, "update")
    store.close()
