"""Named-query loader + executor over exported tables (S7 parity).

The reference keeps its operational SQL in ``queries/*.sql`` files as
``# NAME`` + statement blocks, loads them into a name→SQL dict at
startup, and executes them by name against SQLite
(/root/reference/whakoom_webscrapper/sqlmanager.py:36-67, 69-139;
queries/lists.sql).  Round 1 mapped the *logical* operations to Python
pipeline functions; this module restores the missing surface itself:
the same on-disk file format, loaded into a registry, runnable by name
against a crawl export.

Execution model (Ray-Data-first, not a port):

- **Read queries** (``SELECT``/``WITH``) run through DuckDB over the
  partitioned parquet directories that ``CrawlEngine.write_tables`` /
  ``cli export`` produce — each table directory registers as a view, so
  the reference's ``GET_*`` queries work against the export with only
  schema-level edits (our tables have no SQLite surrogate ``id``; keys
  are the natural ids).  Positional ``?`` parameters bind through
  DuckDB's prepared-statement path.  These finalized relational tables
  are the *small* output of a crawl (one row per list/title, not per
  page), so a driver-side DuckDB scan is the right tool; corpus-scale
  scans (docs) belong in Ray Data pipelines, and the docstring of each
  shipped query says which side it is on.
- **Mutating statements** (``INSERT``/``UPDATE``/``DELETE``/...) are
  parsed and listed for parity, but ``run`` refuses them: the engine's
  write path is ``CrawlEngine.write_tables(mode="upsert")`` (the S4
  keyed LWW sink), which already subsumes the reference's
  ``INSERT_OR_UPDATE_*``/``UPDATE_*_STATUS`` statements idempotently.

CLI: ``python -m whakoom_webscrapper_ray.cli query --export-dir OUT
--name GET_LIST_BY_ID --param 100000``.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

# Same block grammar as the reference loader (sqlmanager.py:64): a line
# starting with ``#`` names the statement that follows, up to the next
# ``#`` header.  Names are case-insensitive (stored upper).
_BLOCK_RE = re.compile(r"#\s*(\w+)\s*\n(.*?)(?=\n#|$)", re.DOTALL)

_READ_PREFIXES = ("select", "with", "describe", "show")

# Default query pack shipped next to this module.
_DEFAULT_SQL_DIR = os.path.join(os.path.dirname(__file__), "queries")


def parse_named_queries(sql_content: str) -> dict[str, str]:
    """``# NAME\\nSQL`` blocks → {NAME: sql} (reference grammar)."""
    return {
        name.strip().upper(): body.strip()
        for name, body in _BLOCK_RE.findall(sql_content)
        if body.strip()
    }


def load_query_dir(sql_dir: str) -> dict[str, str]:
    """Union of all ``*.sql`` files in a directory (later files win)."""
    queries: dict[str, str] = {}
    if sql_dir and os.path.isdir(sql_dir):
        for fname in sorted(os.listdir(sql_dir)):
            if fname.endswith(".sql"):
                with open(os.path.join(sql_dir, fname),
                          encoding="utf-8") as f:
                    queries.update(parse_named_queries(f.read()))
    return queries


def _is_read_query(sql: str) -> bool:
    head = sql.lstrip().split(None, 1)
    return bool(head) and head[0].lower() in _READ_PREFIXES


class NamedQueryStore:
    """Registry of named queries runnable against a crawl export.

    ``table_root`` is a ``cli export`` / ``write_tables`` output
    directory: every subdirectory containing parquet fragments becomes
    a DuckDB view of the same name, and every top-level ``*.parquet``
    file becomes a view named after the file stem (``crawl_order``).
    """

    def __init__(self, table_root: str,
                 sql_dir: str | None = None,
                 queries: dict[str, str] | None = None) -> None:
        self.table_root = table_root
        self.queries = dict(
            queries if queries is not None
            else load_query_dir(sql_dir or _DEFAULT_SQL_DIR)
        )
        self._con = None

    # -- registry ---------------------------------------------------------
    def names(self) -> list[str]:
        return sorted(self.queries)

    def sql(self, name: str) -> str:
        return self.queries[name.strip().upper()]

    def add_file(self, path: str) -> None:
        with open(path, encoding="utf-8") as f:
            self.queries.update(parse_named_queries(f.read()))

    # -- execution --------------------------------------------------------
    def _connect(self):
        if self._con is None:
            import duckdb

            con = duckdb.connect()
            for entry in sorted(os.listdir(self.table_root)):
                full = os.path.join(self.table_root, entry)
                if os.path.isdir(full):
                    view, glob = entry, os.path.join(full, "**", "*.parquet")
                elif entry.endswith(".parquet"):
                    view, glob = entry[: -len(".parquet")], full
                else:
                    continue
                if not view.isidentifier():
                    continue
                lit = glob.replace("'", "''")
                con.execute(
                    f'CREATE VIEW "{view}" AS '
                    f"SELECT * FROM read_parquet('{lit}')"
                )
            self._con = con
        return self._con

    def run(self, name: str, *params) -> pa.Table:
        key = name.strip().upper()
        if key not in self.queries:
            raise KeyError(
                f"unknown named query {key!r}; have {self.names()}"
            )
        sql = self.queries[key]
        if not _is_read_query(sql):
            raise ValueError(
                f"{key} is a mutating statement; writes go through "
                "CrawlEngine.write_tables(mode='upsert') — the keyed "
                "LWW sink already provides INSERT_OR_UPDATE semantics"
            )
        return self._connect().execute(sql, list(params)).arrow()

    def close(self) -> None:
        if self._con is not None:
            self._con.close()
            self._con = None
