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


def test_knn_outliers_matches_bruteforce(ray_session):
    """Full-algorithm pin: with sample_rows >= n the train set is the whole
    (deterministic) input, so the metrics row must equal a local numpy
    re-computation (guards the streaming roll-up refactor)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.outliers import knn_outliers

    rng = np.random.default_rng(13)
    x = np.concatenate([rng.normal(0, 1, 400), [8.0, -9.0, 12.0]])
    y = np.concatenate([rng.normal(5, 2, 400), [50.0, -40.0, 60.0]])
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y}))
    got = knn_outliers(ds, ["x", "y"], k=5, sample_rows=10_000).iloc[0]

    m = np.stack([x, y], axis=1)
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    score = np.sort(np.sqrt(d2), axis=1)[:, :5].mean(axis=1)
    mx = score.max()
    inlier = 1.0 - score / (mx + 1e-9)
    n_out = int((inlier < 0.5).sum())
    assert got["rows"] == len(x)
    assert got["outliers"] == n_out, (got["outliers"], n_out)
    assert got["outlier_percent"] == round(n_out / len(x), 4)


def test_compare_bucketed_matches_broadcast(ray_session):
    """The large-large co-partition compare must agree with the broadcast
    path (forced here by a zero broadcast cap), mismatches included."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.drift import compare_datasets

    rng = np.random.default_rng(17)
    ids = np.arange(5000, dtype=np.int64)
    vals = rng.normal(size=5000)
    src = ray.data.from_arrow(pa.table({"id": ids, "v": vals}))
    # target: drop 10%, perturb 5% beyond tolerance, add 100 extra rows
    keep = rng.random(5000) > 0.1
    tv = vals.copy()
    bump = rng.random(5000) < 0.05
    tv[bump] += 1.0
    tgt_tbl = pa.table({"id": np.concatenate([ids[keep], np.arange(9000, 9100)]),
                        "v": np.concatenate([tv[keep], np.zeros(100)])})
    tgt = ray.data.from_arrow(tgt_tbl)

    bc = compare_datasets(src, tgt, ["id"], ["v"])
    bk = compare_datasets(src, tgt, ["id"], ["v"], broadcast_cap=0,
                          num_partitions=4)
    import pandas as pd
    pd.testing.assert_frame_equal(bc, bk)
    assert bc["rows_mismatched"].iloc[0] == int((bump & keep).sum())
    assert bc["rows_in_common"].iloc[0] == int(keep.sum())


def test_pattern_autodetect_ip_quirk(ray_session):
    """The reference's IP-branch precedence quirk
    (pattern_validation_pack/main.py:230): a column named 'ship_address'
    (contains both 'ip' and 'address') triggers the ipv4 check, while
    'shipping_code' and 'address' alone do not."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.validation import pattern_autodetect

    ds = ray.data.from_arrow(pa.table({
        "ship_address": ["10.0.0.1", "not-an-ip", ""],
        "shipping_code": ["x", "y", "z"],
        "address": ["a", "b", "c"],
        "ip": ["10.0.0.2", "bad", "10.0.0.3"],
    }))
    out = pattern_autodetect(ds)
    checked = set(zip(out["column"], out["pattern"]))
    assert ("ship_address", "ipv4") in checked       # the quirk
    assert ("ip", "ipv4") in checked                 # explicit name list
    assert not any(c in ("shipping_code", "address")
                   for c, _ in checked if c != "__dataset__")
    row = out[(out["column"] == "ship_address")].iloc[0]
    assert row["invalid_count"] == 1                 # '' is valid (quirk)


def test_read_csv_sized(ray_session, tmp_path):
    """CSV opener (the reference's default input format) with the
    skiprows knob and column projection; operators run on it unchanged."""
    from packs_ray.functions.profiling import completeness
    from packs_ray.sources.csv import read_csv_sized

    p = tmp_path / "in.csv"
    p.write_text("junk line 1\njunk line 2\n"
                 "a,b,c\n1,x,\n2,,z\n3,y,w\n")
    ds = read_csv_sized(str(p), skiprows=2)
    assert ds.count() == 3
    out = completeness(ds, ["a", "b", "c"]).set_index("column")
    assert out.loc["a", "non_null"] == 3
    assert out.loc["b", "non_null"] == 2
    assert out.loc["c", "non_null"] == 2
    proj = read_csv_sized(str(p), skiprows=2, columns=["a", "b"])
    assert set(proj.schema().names) == {"a", "b"}


def test_sniff_date_type():
    import datetime

    from packs_ray.functions.timeliness import sniff_date_type

    now = datetime.datetime(2026, 8, 1)
    assert sniff_date_type(["2024-03-01", "2025-12-31"], now) == "date"
    assert sniff_date_type(["2020", "1999"], now) == "year_only"
    assert sniff_date_type(["2120"], now) is None          # year out of range
    assert sniff_date_type(["hello", "world"], now) is None
    assert sniff_date_type(["2024-13-45"], now) is None    # regex ok, parse fails
    assert sniff_date_type(["2024.05.06", "x"], now) == "date"  # any True wins


def test_fk_orphans_multicolumn(ray_session):
    """Multi-column broadcast anti-join (vectorized hash-combined keys)
    must agree with the bucketed path and a pandas merge ground truth."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions import integrity

    rng = np.random.default_rng(9)
    pk = pd.DataFrame({"a": rng.integers(0, 40, 300),
                       "b": rng.choice(list("uvwxyz"), 300)}).drop_duplicates()
    ck = pd.DataFrame({"a": rng.integers(0, 60, 2000),
                       "b": rng.choice(list("uvwxyz"), 2000)})
    parent = ray.data.from_arrow(pa.Table.from_pandas(pk, preserve_index=False))
    child = ray.data.from_arrow(pa.Table.from_pandas(ck, preserve_index=False))

    bc = integrity._orphans_broadcast(child, ["a", "b"], parent, ["a", "b"])
    bk = integrity._orphans_bucketed(child, ["a", "b"], parent, ["a", "b"],
                                     num_partitions=4)
    truth = int(ck.merge(pk.assign(__hit=1), how="left",
                         on=["a", "b"])["__hit"].isna().sum())
    assert bc == bk == {"total": 2000, "orphans": truth}


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
