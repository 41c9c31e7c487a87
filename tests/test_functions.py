"""Function-layer checks vs the DuckDB oracle at sf0.001 (the same
comparison the driver runs at sf0.01)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# every oracle-backed query is parity-tested (oracle_sql() is importable
# without a Ray session)
import __ray_entry__ as _entry

SQL_CHECKED = sorted(_entry.oracle_sql().keys())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as m

    return m.queries(), m.oracle_sql()


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(name, con, contract, ray_session):
    from scripts.check_correctness import compare, to_pandas

    qs, sqls = contract
    eng = to_pandas(qs[name](SF))
    ora = con.sql(sqls[name]).df()
    problems = compare(name, eng, ora)
    assert not problems, problems


def test_rows_only_queries_run(contract, ray_session):
    qs, sqls = contract
    rows_only = [n for n in qs if n not in sqls
                 and n not in ("knn_outliers_lineitem", "transcripts_filter_summary")]
    for name in rows_only:
        res = qs[name](SF)
        from scripts.check_correctness import to_pandas

        df = to_pandas(res)
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    ds = m.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "keep", "drop_reasons", "text_scrubbed"} <= set(df.columns)


def test_fk_orphans_bucketed_matches_broadcast(ray_session):
    """The large-parent bucketed anti-join must agree with the broadcast
    path (here forced on small data)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions import integrity

    rng = np.random.default_rng(5)
    parent = ray.data.from_arrow(pa.table({"pk": np.arange(0, 500, dtype=np.int64)}))
    child_keys = rng.integers(0, 700, size=3000).astype(np.int64)  # ~29% orphans
    child = ray.data.from_arrow(pa.table({"fk": child_keys}))

    bc = integrity._orphans_broadcast(child, ["fk"], parent, ["pk"])
    bk = integrity._orphans_bucketed(child, ["fk"], parent, ["pk"], num_partitions=4)
    assert bc == bk, (bc, bk)
    assert bc["orphans"] == int((child_keys >= 500).sum())


def test_rank_select_edges(ray_session):
    """Distributed rank selection: constant columns, extreme ranks,
    duplicate-heavy data, tiny n — vs np.percentile."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import numeric_column_stats

    cases = {
        "constant": np.full(5000, 3.14),
        "two_values": np.repeat([1.0, 2.0], [4900, 100]),
        "tiny": np.array([5.0, 1.0, 9.0]),
        "skewed": np.random.default_rng(3).exponential(1.0, 20000),
    }
    for name, vals in cases.items():
        ds = ray.data.from_arrow(pa.table({"x": vals}))
        row = numeric_column_stats(ds, "x").iloc[0]
        for p in (10, 25, 75, 90):
            exp = round(float(np.percentile(vals, p)), 4)
            got = row[f"p{p}"]
            assert abs(got - exp) < 1e-9, (name, p, got, exp)
