"""Database source: a SQL table/query as a ``ray.data.Dataset``.

Reference: every pack accepts ``type: "database"`` sources and calls
``pack.load_data(..., table_or_query=...)`` (e.g.
referential_integrity_pack/main.py:83-86) — a single driver-side
``read_sql`` into pandas.  The Ray-Data-first shape instead plans one
range partition per task and opens a DB connection inside each task, so
a large table streams into the object store in parallel and never
lands on the driver:

- ``partition_column`` (an orderable numeric column, ideally the PK):
  one cheap ``min/max`` bounds query on the driver, then
  ``num_partitions`` range-sliced queries fan out via ``map_batches``
  (one spec per block), plus one ``IS NULL`` partition so rows with a
  null partition key are never silently dropped (Spark's JDBC
  partitionColumn drops them).  At cluster scale this is otherwise the
  same design as a Spark JDBC partitioned read.
- without it: a single off-driver task runs the whole query (small
  dimension tables).

``connection_factory`` must be picklable — a top-level function,
functools.partial, or a closure that imports the driver inside (some
drivers' ``connect`` itself is a PyCapsule and cannot be pickled, e.g.
duckdb's) — each task calls it to get a fresh DBAPI connection; DuckDB connections (``.arrow()``) fetch zero-copy, plain
DBAPI cursors (sqlite3, psycopg, ...) fetch via rows+description.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa


def _is_query(table_or_query: str) -> bool:
    head = table_or_query.lstrip().split(None, 1)
    return bool(head) and head[0].lower() in ("select", "with")


def _base_query(table_or_query: str, columns: list[str] | None) -> str:
    cols = ", ".join(columns) if columns else "*"
    if _is_query(table_or_query):
        return f"SELECT {cols} FROM ({table_or_query}) AS __q" \
            if columns else table_or_query
    return f"SELECT {cols} FROM {table_or_query}"


def _column_array(vals: list) -> pa.Array:
    """Python DBAPI values -> a typed Arrow array.

    ``pa.array`` inference alone mishandles the common driver types:
    - ``decimal.Decimal`` rows with heterogeneous scales fail inference;
      they are quantized to the column's max scale and land as
      ``decimal128(precision, scale)`` — exact, no float round-trip.
    - ``bytes``/``bytearray`` normalize to ``binary``.
    - timezone-aware datetimes convert to UTC ``timestamp[us, tz=UTC]``
      (mixed-offset columns are the norm from tz-naive servers plus DST;
      naive values in an otherwise aware column are read as UTC —
      documented convention, matching most JDBC ingests).
    - an all-null column stays null-typed; Ray's schema unification
      promotes it against typed blocks from other partitions."""
    import datetime as _dt
    import decimal as _dec

    nn = [v for v in vals if v is not None]
    if not nn:
        return pa.array(vals)
    if all(isinstance(v, _dec.Decimal) for v in nn):
        scale = max(max(-v.as_tuple().exponent, 0) for v in nn)
        q = _dec.Decimal(1).scaleb(-scale)
        vals = [None if v is None else v.quantize(q) for v in vals]
        int_digits = max(len(str(abs(int(v)))) for v in nn)
        prec = min(38, max(int_digits + scale, scale + 1))
        return pa.array(vals, type=pa.decimal128(prec, scale))
    if all(isinstance(v, (bytes, bytearray)) for v in nn):
        return pa.array([None if v is None else bytes(v) for v in vals],
                        type=pa.binary())
    if all(isinstance(v, _dt.datetime) for v in nn):
        if any(v.tzinfo is not None for v in nn):
            vals = [None if v is None else
                    (v if v.tzinfo is not None
                     else v.replace(tzinfo=_dt.timezone.utc))
                    .astimezone(_dt.timezone.utc) for v in vals]
            return pa.array(vals, type=pa.timestamp("us", tz="UTC"))
        return pa.array(vals, type=pa.timestamp("us"))
    return pa.array(vals)


def _cursor_to_table(cur) -> pa.Table:
    """DBAPI cursor -> Arrow table (duckdb exposes .arrow(); generic
    cursors go through fetchall + description + _column_array)."""
    if hasattr(cur, "arrow"):
        return cur.arrow()
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return pa.table({n: _column_array(list(c))
                     for n, c in zip(names, cols)})


def _run(con, sql: str) -> pa.Table:
    cur = con.execute(sql) if hasattr(con, "execute") else None
    if cur is None:  # pragma: no cover - DBAPI drivers without con.execute
        cur = con.cursor()
        cur.execute(sql)
    return _cursor_to_table(cur)


def read_database(connection_factory: Callable, table_or_query: str, *,
                  columns: list[str] | None = None,
                  partition_column: str | None = None,
                  num_partitions: int = 8):
    """Read a table or query into a Dataset (see module docstring)."""
    import ray.data

    base = _base_query(table_or_query, columns)
    if partition_column is None:
        specs = [base]
    else:
        con = connection_factory()
        try:
            lo, hi = _run(
                con, f"SELECT min({partition_column}), "
                     f"max({partition_column}) FROM ({base}) AS __b"
            ).to_pylist()[0].values()
        finally:
            con.close()
        if lo is None:  # empty table (or all partition keys null)
            specs = [base]
        else:
            lo, hi = float(lo), float(hi)
            n = max(1, int(num_partitions))
            step = (hi - lo) / n or 1.0
            edges = [lo + i * step for i in range(n)] + [hi]
            specs = []
            for i in range(n):
                op = "<=" if i == n - 1 else "<"
                specs.append(
                    f"SELECT * FROM ({base}) AS __p WHERE "
                    f"{partition_column} >= {edges[i]!r} "
                    f"AND {partition_column} {op} {edges[i + 1]!r}")
            # rows with a NULL partition key fall outside every range
            # predicate; Spark's JDBC reader silently DROPS them — this
            # reader fetches them in one extra partition so a nullable
            # partition column never loses rows
            specs.append(f"SELECT * FROM ({base}) AS __p WHERE "
                         f"{partition_column} IS NULL")

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for sql in batch.column("sql").to_pylist():
            con = connection_factory()
            try:
                out.append(_run(con, sql))
            finally:
                con.close()
        if not out:
            return pa.table({})
        # permissive: a 0-row partition infers null-typed columns that
        # must promote against its siblings' real types
        return pa.concat_tables(out, promote_options="permissive")

    spec_ds = ray.data.from_items(
        [{"sql": s} for s in specs], override_num_blocks=len(specs))
    return spec_ds.map_batches(load, batch_format="pyarrow", batch_size=1)


def duckdb_connection_factory(path: str, read_only: bool = True) -> Callable:
    """Picklable connection factory for a DuckDB database file (the
    driver's ``connect`` is a PyCapsule and cannot ride in a closure
    pickle directly; importing inside the returned function can)."""
    def factory():
        import duckdb

        return duckdb.connect(path, read_only=read_only)
    return factory


def sqlite_connection_factory(path: str) -> Callable:
    """Picklable connection factory for a sqlite3 database file."""
    def factory():
        import sqlite3

        return sqlite3.connect(path)
    return factory
