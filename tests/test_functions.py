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


def test_knn_univariate_boundary_exact():
    """Out-of-range candidate slots must be masked, not clipped — clipping
    duplicates boundary train points and underestimates tail scores."""
    import numpy as np

    from packs_ray.functions.outliers import _knn_univariate

    train = np.sort(np.array([0.0, 1.0, 2.0, 3.0]))
    # query far right of the range: true 3-NN are {3,2,1} -> mean 8.0
    got = _knn_univariate(np.array([10.0]), train, k=3)
    assert abs(got[0] - 8.0) < 1e-12, got
    # brute-force cross-check on random data incl. both tails
    rng = np.random.default_rng(7)
    tr = np.sort(rng.normal(size=50))
    x = np.concatenate([rng.normal(size=20), [-10.0, 10.0, tr[0], tr[-1]]])
    for k in (1, 3, 5):
        got = _knn_univariate(x, tr, k)
        exp = np.sort(np.abs(x[:, None] - tr[None, :]), axis=1)[:, :k].mean(axis=1)
        assert np.allclose(got, exp), k


def test_pattern_validation_alternation_anchored(ray_session):
    """A custom pattern with a top-level alternation must be anchored as a
    whole on the RE2 fast path ('foo|bar' must NOT accept 'xbar')."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.validation import pattern_validation

    ds = ray.data.from_arrow(pa.table({"v": ["foo", "bar", "xbar", "barx", ""]}))
    out = pattern_validation(ds, [{"column": "v", "regex": "foo|bar"}])
    # Python re.match semantics: foo, bar, barx match; xbar does not;
    # '' is valid by the reference quirk -> exactly 1 invalid
    assert int(out["invalid_count"].iloc[0]) == 1, out


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
