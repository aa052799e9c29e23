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
- **Mutating statements** run by name too (S7 parity with
  sqlmanager.py:119-139): ``INSERT INTO t (...) VALUES (?...) ON
  CONFLICT (k) DO UPDATE SET ...`` and ``UPDATE t SET ... WHERE k = ?``
  are parsed into keyed-upsert calls against the export's storage
  backend — the same S4 LWW sink ``CrawlEngine.write_tables`` uses —
  so ``INSERT_OR_UPDATE_LIST`` / ``UPDATE_LIST_STATUS`` behave like
  the reference's SQLite statements (conflict updates only the listed
  columns; UPDATE of an absent key affects 0 rows).  ``excluded.col``
  and scalar SQL expressions (``CURRENT_TIMESTAMP``) in SET clauses
  are honored; anything outside that grammar (``DELETE``, joins in
  mutations) is still refused.

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

# Mutation grammars the upsert shim accepts — exactly the shapes the
# reference's operational pack uses (queries/lists.sql:1-9, 37-40).
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>\w+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?"
    r"VALUES\s*\((?P<values>[^)]*)\)\s*"
    r"(?:ON\s+CONFLICT\s*\((?P<conflict>[^)]*)\)\s*"
    r"DO\s+UPDATE\s+SET\s+(?P<set>.*?))?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>\w+)\s+SET\s+(?P<set>.*?)\s+"
    r"WHERE\s+(?P<wherecol>\w+)\s*=\s*\?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# Natural keys of the exported tables (the engine has no SQLite
# surrogate ``id``; see the GET_* schema adaptation note above).
_TABLE_KEYS = {
    "lists": ["list_id"],
    "titles": ["title_id"],
    "junction": ["list_id", "title_id"],
    "volumes": ["volume_id"],
    "title_metadata": ["title_id"],
    "title_enriched": ["title_id"],
}

def _table_keys(table: str) -> list[str]:
    """Natural key of ``table`` or a descriptive ValueError (the raw
    ``_TABLE_KEYS[table]`` KeyError broke run()'s rejection contract)."""
    try:
        return _TABLE_KEYS[table]
    except KeyError:
        raise ValueError(
            f"table {table!r} has no registered natural key; mutating "
            f"named queries support {sorted(_TABLE_KEYS)}"
        ) from None


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


def _parse_assignments(set_clause: str) -> list[tuple[str, str]]:
    """``col = rhs, col2 = rhs2`` → [(col, rhs), ...].  Top-level comma
    split is exact for the shipped grammar (scalar rhs, no calls with
    commas)."""
    out = []
    for part in set_clause.strip().rstrip(";").split(","):
        col, _, rhs = part.partition("=")
        if not _:
            raise ValueError(f"bad SET assignment: {part!r}")
        out.append((col.strip(), rhs.strip()))
    return out


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
            return self._run_mutation(key, sql, list(params))
        return self._connect().execute(sql, list(params)).arrow()

    # -- mutation shim ------------------------------------------------------
    def _eval_expr(self, expr: str):
        """Scalar SQL expression (CURRENT_TIMESTAMP, literals) →
        python value, via DuckDB so SQL semantics are exact."""
        val = self._connect().execute(f"SELECT {expr}").fetchone()[0]
        import datetime as _dt

        if isinstance(val, _dt.datetime) and val.tzinfo is not None:
            val = val.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return val

    def _table_dir(self, table: str) -> str:
        d = os.path.join(self.table_root, table)
        if not os.path.isdir(d):
            raise ValueError(f"no exported table directory {d!r}")
        return d

    def _lookup_rows(self, table: str, keys: list[str],
                     keyvals: list) -> pa.Table:
        """Matched stored row(s) by natural key (J2 point lookup —
        row-group statistics prune untouched fragments)."""
        from .storage import backend

        t = backend().point_lookup(self._table_dir(table), keys[0],
                                   keyvals[0])
        import pyarrow.compute as pc

        for k, v in zip(keys[1:], keyvals[1:]):
            t = t.filter(pc.equal(t.column(k), v))
        return t

    def _upsert(self, table: str, rows: pa.Table,
                keys: list[str]) -> None:
        from .storage import backend

        backend().upsert(rows, self._table_dir(table), keys)

    @staticmethod
    def _cast_cell(value, typ: pa.DataType) -> pa.Array:
        try:
            return pa.array([value], type=typ)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                return pa.array([str(value)], type=typ)
            raise

    def _run_mutation(self, name: str, sql: str, params: list
                      ) -> pa.Table:
        """Name-driven write (reference sqlmanager.py:119-139): the
        statement's grammar is mapped onto the storage seam's keyed
        LWW upsert.  Returns a one-row ``{"rows_affected": n}``."""
        m = _INSERT_RE.match(sql)
        if m:
            n = self._run_insert(m, params)
        else:
            m = _UPDATE_RE.match(sql)
            if not m:
                raise ValueError(
                    f"{name} is a mutating statement outside the "
                    "supported INSERT..ON CONFLICT / UPDATE..WHERE "
                    "key grammar; use CrawlEngine.write_tables("
                    "mode='upsert') for free-form writes"
                )
            n = self._run_update(m, params)
        return pa.table({"rows_affected": pa.array([n], pa.int64())})

    def _stored_schema(self, table: str) -> pa.Schema:
        import pyarrow.parquet as pq

        from .storage import backend

        frags = backend().list_fragments(self._table_dir(table))
        if not frags:
            raise ValueError(f"exported table {table!r} has no fragments")
        return pq.read_schema(frags[0])

    def _run_insert(self, m: re.Match, params: list) -> int:
        table = m["table"].lower()
        schema = self._stored_schema(table)
        cols = (
            [c.strip() for c in m["cols"].split(",")]
            if m["cols"] else list(schema.names)
        )
        tokens = [v.strip() for v in m["values"].split(",")]
        if len(tokens) != len(cols):
            raise ValueError("INSERT arity mismatch")
        it = iter(params)
        incoming = {
            c: (next(it) if tok == "?" else self._eval_expr(tok))
            for c, tok in zip(cols, tokens)
        }
        leftovers = list(it)
        if leftovers:
            raise ValueError(f"{len(leftovers)} unused parameters")
        keys = (
            [k.strip() for k in m["conflict"].split(",")]
            if m["conflict"] else _table_keys(table)
        )
        existing = self._lookup_rows(table, keys,
                                     [incoming[k] for k in keys])
        if existing.num_rows and not m["set"]:
            # conflict-less INSERT on a live key: SQLite raises
            # IntegrityError (UNIQUE constraint); silently replacing
            # the stored row would clobber columns the reference
            # preserves
            raise ValueError(
                f"UNIQUE constraint failed: {table}"
                f"({', '.join(keys)}) — INSERT without ON CONFLICT "
                "on an existing key"
            )
        if existing.num_rows and m["set"]:
            # conflict: update ONLY the SET-listed columns of the
            # stored row (reference keeps e.g. user_profile untouched,
            # queries/lists.sql:4-9)
            row = {c: existing.column(c)[0].as_py()
                   for c in existing.column_names}
            for col, rhs in _parse_assignments(m["set"]):
                if rhs == "?":
                    raise ValueError("? in ON CONFLICT SET unsupported")
                low = rhs.lower()
                if low.startswith("excluded."):
                    row[col] = incoming[rhs.split(".", 1)[1]]
                elif col in schema.names:
                    row[col] = self._eval_expr(rhs)
        else:
            row = {c: incoming.get(c) for c in schema.names}
        out = pa.table(
            {c: self._cast_cell(row.get(c), schema.field(c).type)
             for c in schema.names}
        )
        self._upsert(table, out, keys)
        return 1

    def _run_update(self, m: re.Match, params: list) -> int:
        table = m["table"].lower()
        assigns = _parse_assignments(m["set"])
        it = iter(params)
        values = []
        for col, rhs in assigns:
            values.append(next(it) if rhs == "?"
                          else self._eval_expr(rhs))
        rest = list(it)
        if len(rest) != 1:
            raise ValueError("UPDATE expects exactly one WHERE parameter")
        existing = self._lookup_rows(table, [m["wherecol"]], [rest[0]])
        if existing.num_rows == 0:
            return 0   # SQLite UPDATE of an absent key: 0 rows
        schema = existing.schema
        out = existing
        for (col, _), v in zip(assigns, values):
            i = schema.get_field_index(col)
            cell = self._cast_cell(v, schema.field(i).type)
            out = out.set_column(
                i, col, pa.concat_arrays([cell] * existing.num_rows)
            )
        self._upsert(table, out, _table_keys(table))
        return existing.num_rows

    def close(self) -> None:
        if self._con is not None:
            self._con.close()
            self._con = None
