"""DB-source hardening: DBAPI type matrix + null partition keys.

The range-partitioned reader (packs_ray/sources/database.py) must
round-trip the awkward driver types — Decimal (mixed scales), bytes,
tz-aware datetimes — and must never lose rows whose partition key is
NULL (Spark's JDBC partitionColumn silently drops those; this reader
fetches them in a dedicated IS NULL partition).
"""

import datetime
import decimal
import sqlite3

import pyarrow as pa
import pytest

from packs_ray.sources.database import (_column_array, _cursor_to_table,
                                        duckdb_connection_factory,
                                        read_database,
                                        sqlite_connection_factory)


# ------------------------------------------------------- _column_array

def test_column_array_decimals_mixed_scale():
    vals = [decimal.Decimal("1.5"), None, decimal.Decimal("22.125"),
            decimal.Decimal("3")]
    arr = _column_array(vals)
    assert pa.types.is_decimal(arr.type) and arr.type.scale == 3
    assert arr.to_pylist() == [decimal.Decimal("1.500"), None,
                               decimal.Decimal("22.125"),
                               decimal.Decimal("3.000")]


def test_column_array_bytes():
    arr = _column_array([b"ab", bytearray(b"cd"), None])
    assert arr.type == pa.binary()
    assert arr.to_pylist() == [b"ab", b"cd", None]


def test_column_array_tz_datetimes():
    est = datetime.timezone(datetime.timedelta(hours=-5))
    aware = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=est)
    naive = datetime.datetime(2024, 1, 1, 6, 0)   # read as UTC
    arr = _column_array([aware, naive, None])
    assert arr.type == pa.timestamp("us", tz="UTC")
    got = arr.to_pylist()
    assert got[0] == datetime.datetime(2024, 1, 1, 17, 0,
                                       tzinfo=datetime.timezone.utc)
    assert got[1] == datetime.datetime(2024, 1, 1, 6, 0,
                                       tzinfo=datetime.timezone.utc)
    assert got[2] is None


def test_column_array_all_null_stays_null_typed():
    arr = _column_array([None, None])
    assert pa.types.is_null(arr.type)


class _FakeCursor:
    description = [("d",), ("b",), ("t",)]

    def fetchall(self):
        utc = datetime.timezone.utc
        return [(decimal.Decimal("9.75"), b"\x00\x01",
                 datetime.datetime(2024, 5, 1, tzinfo=utc)),
                (None, None, None)]


def test_cursor_to_table_generic_types():
    t = _cursor_to_table(_FakeCursor())
    assert pa.types.is_decimal(t.column("d").type)
    assert t.column("b").type == pa.binary()
    assert t.column("t").type == pa.timestamp("us", tz="UTC")


# --------------------------------------------- sqlite + duckdb matrix

@pytest.fixture()
def sqlite_mixed(tmp_path):
    p = str(tmp_path / "mix.sqlite")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (pid INTEGER, name TEXT, x REAL, "
                "payload BLOB)")
    rows = [(i if i % 4 else None, f"r{i}", i * 1.5, bytes([i]))
            for i in range(1, 21)]
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()
    return p


def test_sqlite_partitioned_keeps_null_pid_rows(ray_session, sqlite_mixed):
    ds = read_database(sqlite_connection_factory(sqlite_mixed), "t",
                       partition_column="pid", num_partitions=3)
    df = ds.to_pandas().sort_values("name").reset_index(drop=True)
    assert len(df) == 20                       # null-pid rows included
    assert df["pid"].isna().sum() == 5         # i % 4 == 0 for 4..20
    assert set(df["payload"]) == {bytes([i]) for i in range(1, 21)}


@pytest.fixture()
def duckdb_mixed(tmp_path):
    duckdb = pytest.importorskip("duckdb")
    p = str(tmp_path / "mix.duckdb")
    con = duckdb.connect(p)
    con.execute("SET TimeZone='UTC'")
    con.execute("""
        CREATE TABLE t AS SELECT
          CASE WHEN i % 5 = 0 THEN NULL ELSE i END AS pid,
          i AS id,
          CAST(i AS DECIMAL(10,2)) / 4 AS d,
          encode('v' || i) AS payload,
          CAST(TIMESTAMP '2024-01-01' + i * INTERVAL 1 HOUR
               AS TIMESTAMPTZ) AS tsz
        FROM range(1, 31) r(i)""")
    con.close()
    return p


def test_duckdb_partitioned_mixed_types(ray_session, duckdb_mixed):
    ds = read_database(duckdb_connection_factory(duckdb_mixed), "t",
                       partition_column="pid", num_partitions=4)
    t = pa.Table.from_pandas(ds.to_pandas())
    assert t.num_rows == 30
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["pid"].isna().sum() == 6         # i % 5 == 0
    # decimal survives exactly (no float round-trip): 7/4 = 1.75
    assert str(df.loc[6, "d"]) == "1.75"
    assert df.loc[0, "payload"] == b"v1"
    # tz-aware instants intact
    assert str(df["tsz"].dt.tz) in ("UTC", "Etc/UTC")


def test_empty_partitions_promote(ray_session, duckdb_mixed):
    # num_partitions far above the key span: many 0-row specs whose
    # null-typed columns must promote against the typed siblings
    ds = read_database(duckdb_connection_factory(duckdb_mixed), "t",
                       partition_column="id", num_partitions=16)
    assert len(ds.to_pandas()) == 30
