"""Function-layer checks vs the DuckDB oracle at sf0.001 (the same
comparison the driver runs at sf0.01)."""

import duckdb
import pytest

import os

SF = "/root/testdata/sf0.001"
os.environ["GRAFT_ORACLE_SF"] = SF  # data-dependent oracle constants
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


def test_pattern_autodetect_skips_allnull_columns(ray_session):
    """All-null detected columns are skipped entirely (no metrics row,
    excluded from the __dataset__ score mean), mirroring the reference's
    dropna()-empty skip (pattern_validation_pack/main.py:191-193)."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.validation import pattern_autodetect

    ds = ray.data.from_arrow(pa.table({
        "contact_mail": pa.array(["a@b.co", "bad", None], type=pa.string()),
        "backup_email": pa.array([None, None, None], type=pa.string()),
    }))
    out = pattern_autodetect(ds)
    assert "backup_email" not in set(out["column"])
    # score = mean over the ONE surviving rule (2 valid / 3 non-null... 1
    # invalid of 2 non-null -> valid 0.5), not dragged up by an empty rule
    mail = out[out["column"] == "contact_mail"].iloc[0]
    assert mail["invalid_count"] == 1 and mail["valid_percent"] == 0.5
    score = out[out["column"] == "__dataset__"].iloc[0]["valid_percent"]
    assert score == 0.5

    # all detected columns empty -> empty frame (no spurious score row)
    ds2 = ray.data.from_arrow(pa.table({
        "backup_email": pa.array([None, None], type=pa.string())}))
    assert pattern_autodetect(ds2).empty


def test_fk_orphans_null_keys_bucketed_matches_broadcast(ray_session):
    """SQL null semantics in BOTH paths: null parent keys never match,
    null child keys always count as orphans."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions import integrity

    parent = ray.data.from_pandas(pd.DataFrame(
        {"pk": pd.array([1, 2, 3, None], dtype="Int64")}))
    child = ray.data.from_pandas(pd.DataFrame(
        {"fk": pd.array([1, 1, 2, 4, None, None], dtype="Int64")}))

    bc = integrity._orphans_broadcast(child, ["fk"], parent, ["pk"])
    bk = integrity._orphans_bucketed(child, ["fk"], parent, ["pk"],
                                     num_partitions=3)
    # orphans: 4 (absent) + two null child keys = 3
    assert bc == bk == {"total": 6, "orphans": 3}, (bc, bk)


def test_compare_duplicate_ids_no_crash(ray_session):
    """Duplicate join keys must not crash (datacompy tolerates them):
    duplicate target ids resolve keep-first; duplicate source rows each
    count and compare against the representative."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.drift import compare_datasets, compare_mismatch_rows

    src = ray.data.from_pandas(pd.DataFrame(
        {"id": [1, 1, 2, 3], "v": [10.0, 99.0, 20.0, 30.0]}))
    tgt = ray.data.from_pandas(pd.DataFrame(
        {"id": [1, 1, 2], "v": [10.0, 55.0, 20.5]}))

    out = compare_datasets(src, tgt, ["id"], ["v"]).iloc[0]
    assert out["source_rows"] == 4
    assert out["target_rows"] == 2          # deduped keep-first
    assert out["rows_in_common"] == 3       # both id=1 source rows + id=2
    # id=1 first source row matches rep 10.0; second (99.0) and id=2 differ
    assert out["rows_mismatched"] == 2

    rows = compare_mismatch_rows(src, tgt, ["id"], ["v"])
    assert list(rows["id"]) == [1, 2]
    assert list(rows["source_value"]) == [99.0, 20.0]


def test_compare_reltol(ray_session):
    """datacompy relative tolerance: match iff |a-b| <= abs_tol +
    rel_tol*|b| (data_compare_pack/main.py:151,224)."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.drift import compare_datasets

    src = ray.data.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3], "v": [100.0, 100.0, 1.0]}))
    tgt = ray.data.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3], "v": [100.9, 102.0, 1.009]}))

    # rel_tol 1%: id=1 (0.9 <= 1.009) and id=3 (0.009 <= 0.01009) match,
    # id=2 (2.0 > 1.02) mismatches
    out = compare_datasets(src, tgt, ["id"], ["v"], abs_tol=0.0, rel_tol=0.01)
    assert out["rows_mismatched"].iloc[0] == 1
    # abs only: all three mismatch
    out0 = compare_datasets(src, tgt, ["id"], ["v"], abs_tol=1e-4)
    assert out0["rows_mismatched"].iloc[0] == 3
    # bucketed path agrees
    outb = compare_datasets(src, tgt, ["id"], ["v"], abs_tol=0.0,
                            rel_tol=0.01, broadcast_cap=0, num_partitions=2)
    assert outb["rows_mismatched"].iloc[0] == 1


def test_mismatch_rows_bucketed_matches_broadcast(ray_session):
    """Row-level mismatch export above the broadcast cap must equal the
    broadcast path's result (same rows, same deterministic head order)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.drift import compare_mismatch_rows

    rng = np.random.default_rng(23)
    ids = np.arange(4000, dtype=np.int64)
    vals = rng.normal(size=4000)
    keep = rng.random(4000) > 0.1
    tv = vals.copy()
    bump = rng.random(4000) < 0.2
    tv[bump] += 1.0
    src = ray.data.from_arrow(__import__("pyarrow").table({"id": ids, "v": vals}))
    tgt = ray.data.from_arrow(__import__("pyarrow").table(
        {"id": ids[keep], "v": tv[keep]}))

    bc = compare_mismatch_rows(src, tgt, ["id"], ["v"], export_cap=300)
    bk = compare_mismatch_rows(src, tgt, ["id"], ["v"], export_cap=300,
                               broadcast_cap=0)
    pd.testing.assert_frame_equal(bc.reset_index(drop=True),
                                  bk.reset_index(drop=True))
    assert len(bc) == 300
    truth_ids = ids[bump & keep]
    assert list(bc["id"]) == sorted(truth_ids)[:300]


def test_re2_ascii_semantics_pinned(ray_session):
    """Pin the documented ASCII divergence: vectorized RE2 paths treat
    \\d/\\b as ASCII-only, so Unicode digits do NOT match — the engine
    standardises on RE2 semantics (see validation._re2_safe)."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.validation import _re2_safe, pattern_validation

    assert _re2_safe(r"^\d{3}$")            # stays on the vectorized path
    ds = ray.data.from_arrow(pa.table({
        "code": ["123", "٠١٢", "12x"]}))  # Arabic-Indic digits
    out = pattern_validation(ds, [{"column": "code", "type": "regex",
                                   "regex": r"^\d{3}$"}])
    # ASCII semantics: the Unicode-digit row is INVALID (Python re would
    # accept it); '12x' invalid; '123' valid
    assert out["invalid_count"].iloc[0] == 2


def test_sodacl_ingestion_matches_native_suite(ray_session):
    """A SodaCL YAML covering the supported grammar must parse into the
    exact native rules and give the same pass/fail set as the
    directly-configured checks_suite_orders rules."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.checks import checks_from_sodacl, run_checks

    yaml_text = """
checks for orders:
  - row_count >= 1000
  - missing_count(o_custkey) = 0
  - invalid_count(o_totalprice) = 0:
      valid min: 0.0
      valid max: 600000.0
  - invalid_count(o_orderstatus) = 0:
      valid values: [O, F, P]
  - duplicate_count(o_orderkey) = 0:
      name: "no duplicate order keys"
"""
    rules = checks_from_sodacl(yaml_text)
    assert rules == [
        {"type": "row_count_min", "min": 1000},
        {"type": "not_null", "column": "o_custkey"},
        {"type": "values_between", "column": "o_totalprice",
         "min": 0.0, "max": 600000.0},
        {"type": "values_in_set", "column": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"type": "unique", "column": "o_orderkey"},
    ]
    ds = ray.data.read_parquet(f"{SF}/orders.parquet")
    native = run_checks(ds, rules)
    direct = run_checks(ds, [
        {"type": "row_count_min", "min": 1000},
        {"type": "not_null", "column": "o_custkey"},
        {"type": "values_between", "column": "o_totalprice",
         "min": 0.0, "max": 600_000.0},
        {"type": "values_in_set", "column": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"type": "unique", "column": "o_orderkey"},
    ])
    pd.testing.assert_frame_equal(native, direct)


def test_sodacl_reference_shape_and_errors():
    """The reference's own checks.yaml shape (soda_pack/checks.yaml: a
    'row_count > 0' entry with a name attribute) parses; unsupported
    lines raise instead of silently passing."""
    import pytest as _pytest

    from packs_ray.functions.checks import checks_from_sodacl

    ref_shape = """
checks for dataset:
  - row_count > 0:
      name: "Dataset vide"
"""
    assert checks_from_sodacl(ref_shape) == [
        {"type": "row_count_min", "min": 1}]
    with _pytest.raises(ValueError):
        checks_from_sodacl("checks for t:\n  - freshness(ts) < 1d\n")
    with _pytest.raises(ValueError):
        checks_from_sodacl("checks for t:\n  - invalid_count(x) = 0\n")


def test_ge_expectations_ingestion(ray_session):
    """A GE expectation suite maps onto the same native rules; unknown
    expectation types are skipped like the reference's hasattr
    dispatch."""
    from packs_ray.functions.checks import checks_from_expectations

    suite = [
        {"expectation_type": "expect_table_row_count_to_be_between",
         "kwargs": {"min_value": 1000, "max_value": 10_000_000}},
        {"expectation_type": "expect_column_values_to_not_be_null",
         "kwargs": {"column": "o_custkey"}},
        {"expectation_type": "expect_column_values_to_be_between",
         "kwargs": {"column": "o_totalprice", "min_value": 0.0,
                    "max_value": 600000.0}},
        {"expectation_type": "expect_column_values_to_be_in_set",
         "kwargs": {"column": "o_orderstatus", "value_set": ["O", "F", "P"]}},
        {"expectation_type": "expect_column_values_to_be_unique",
         "kwargs": {"column": "o_orderkey"}},
        {"expectation_type": "expect_column_kl_divergence_to_be_less_than",
         "kwargs": {"column": "o_totalprice"}},  # unsupported -> skipped
    ]
    rules = checks_from_expectations(suite)
    assert [r["type"] for r in rules] == [
        "row_count_between", "not_null", "values_between", "values_in_set",
        "unique", "skipped"]
    assert rules[0]["min"] == 1000 and rules[0]["max"] == 10_000_000
    assert rules[-1]["name"] == "expect_column_kl_divergence_to_be_less_than"


def test_record_validate_planted_fixture(ray_session):
    """Hand-computed fixture for records.record_validate: required /
    enum / pattern / date / boolean checks, a mapped-but-absent column,
    and Arrow nulls counted as missing."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.records import record_validate

    df = pd.DataFrame({
        "pid": ["1", "2", "", None, "x5", "6"],
        "sex": ["m", "f", "m", "f", "m", "zz"],
        "dob": ["2020-01-02", "bad", None, "2021-12-31", "2022-02-02",
                "2023-03-03"],
        "act": ["true", "no", "1", "maybe", None, "YES"],
    })
    out = record_validate(
        ray.data.from_pandas(df),
        field_mappings={"patient_id": "pid", "gender": "sex",
                        "birth_date": "dob", "active": "act",
                        "language": "lang"},  # absent column
        required_fields=["patient_id"],
        enums={"gender": ["m", "f"]},
        patterns={"patient_id": r"^[0-9]+$"},
        date_fields=["birth_date"], boolean_fields=["active"])
    # per row: r0 valid; r1 bad date; r2 empty required id; r3 null
    # required id; r4 pattern fail; r5 enum fail
    # (booleans: 'maybe' is row3 — already invalid; null/empty skip)
    assert out["records"].iloc[0] == 6
    assert out["valid_records"].iloc[0] == 1
    # completeness: nonempty mapped cells / (5 fields * 6 rows)
    # pid 4, sex 6, dob 5, act 5, lang 0 => 20/30
    assert out["completeness"].iloc[0] == round(20 / 30, 4)
    assert out["score"].iloc[0] == round(1 / 6, 2)
    assert out["validity_ratio"].iloc[0] == round(1 / 6, 4)


def test_record_validate_boolean_and_empty(ray_session):
    """Boolean rule rejects non-boolean text; empty dataset returns a
    zero summary row instead of crashing."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.records import record_validate

    df = pd.DataFrame({"flag": ["TRUE", "0", "nope"]})
    out = record_validate(ray.data.from_pandas(df),
                          field_mappings={"active": "flag"},
                          boolean_fields=["active"])
    assert out["valid_records"].iloc[0] == 2

    empty = record_validate(ray.data.from_pandas(df.iloc[:0]),
                            field_mappings={"active": "flag"},
                            boolean_fields=["active"])
    assert empty["records"].iloc[0] == 0
    assert empty["score"].iloc[0] == 0.0


def test_media_codec_roundtrips():
    """Real codec-free decoders: encode -> decode is the identity on the
    ground-truth arrays (BMP incl. odd-width row padding, WAV chunk
    walking, Y4M multi-frame), and malformed payloads raise."""
    import numpy as np
    import pytest

    from packs_ray.functions import multimodal as mm

    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (5, 7), (16, 3), (9, 24)):   # odd widths: padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (mm.decode_bmp(mm.encode_bmp(px)) == px).all()

    s = rng.integers(-32768, 32768, size=777).astype(np.int16)
    back, rate = mm.decode_wav(mm.encode_wav(s))
    assert rate == mm.AUDIO_RATE and (back == s).all()
    # tolerate an extra chunk before data (real-world WAVs have LIST etc.)
    wav = mm.encode_wav(s)
    extra = wav[:12] + b"LIST\x04\x00\x00\x00INFO" + wav[12:]
    back2, _ = mm.decode_wav(extra)
    assert (back2 == s).all()

    fr = rng.integers(0, 256, size=(6, 3, 11, 13), dtype=np.uint8)
    assert (mm.decode_y4m(mm.encode_y4m(fr)) == fr).all()

    with pytest.raises(ValueError):
        mm.decode_bmp(b"nope")
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        mm.decode_y4m(b"MPEG4\n")


def test_media_features_match_truth(ray_session):
    """End-to-end: stages decode REAL payloads; features equal the same
    math applied to the ground-truth arrays the fixture encoded."""
    import numpy as np
    import ray.data

    from packs_ray.functions import multimodal as mm
    from packs_ray.stages.util import round_half_away as _r

    t = mm.synth_media_table(24)
    kinds = dict(zip(t.column("media_id").to_pylist(),
                     t.column("kind").to_pylist()))
    img = mm.image_features(ray.data.from_arrow(t)).to_pandas() \
        .set_index("media_id")
    for mid, k in kinds.items():
        if k != "image":
            continue
        px = mm.truth_image(mid).reshape(-1, 3).astype(np.int64)
        exp = _r(px.sum(axis=0) / px.shape[0], 4)
        assert (img.loc[mid, ["mean_r", "mean_g", "mean_b"]]
                .to_numpy() == exp).all()

    aud = mm.audio_features(ray.data.from_arrow(t)).to_pandas() \
        .set_index("media_id")
    for mid, k in kinds.items():
        if k != "audio":
            continue
        w = mm.truth_audio(mid).astype(np.float64) / 32768.0
        assert aud.loc[mid, "rms"] == _r(
            np.asarray([np.sqrt((w * w).sum() / len(w))]), 4)[0]
        assert aud.loc[mid, "zero_crossings"] == \
            (np.diff(np.signbit(w)) != 0).sum()

    vid = mm.video_frames(ray.data.from_arrow(t)).to_pandas() \
        .set_index(["media_id", "frame_idx"])
    for mid, k in kinds.items():
        if k != "video":
            continue
        frames = mm.truth_video(mid)
        f = frames.shape[0]
        for fi in range(4):
            fr = frames[(f * fi) // 4].astype(np.int64)
            assert vid.loc[(mid, fi), "frame_mean"] == _r(
                np.asarray([fr.sum() / fr.size]), 4)[0]


def test_read_database_duckdb_and_partitions(ray_session, tmp_path):
    """read_database over a DuckDB file: partitioned read returns
    exactly the source rows (half-open ranges, inclusive tail); the
    single-task path and an empty table also work."""
    import duckdb
    import pandas as pd

    from packs_ray.sources.database import read_database

    db = str(tmp_path / "t.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t AS SELECT i AS id, i * 1.5 AS v, "
                "'k' || (i % 3) AS k FROM range(0, 997) r(i)")
    con.execute("CREATE TABLE empty AS SELECT * FROM t WHERE id < 0")
    con.close()

    def fac():  # duckdb.connect itself is unpicklable (PyCapsule) —
        import duckdb as d  # a closure importing in-task is the pattern

        return d.connect(db, read_only=True)
    part = read_database(fac, "t", partition_column="id",
                         num_partitions=5).to_pandas()
    single = read_database(fac, "SELECT * FROM t").to_pandas()
    assert len(part) == 997 and len(single) == 997
    canon = lambda d: d.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(canon(part), canon(single))
    assert sorted(part.columns) == ["id", "k", "v"]

    cols = read_database(fac, "t", columns=["id", "k"],
                         partition_column="id").to_pandas()
    assert sorted(cols.columns) == ["id", "k"] and len(cols) == 997

    assert len(read_database(fac, "empty",
                             partition_column="id").to_pandas()) == 0


def test_slugify_columns(ray_session):
    """Whitespace -> underscore, slug->original association, collision
    suffixes, and the identity fast path (same object when no rename)."""
    import ray.data

    from packs_ray.functions.slugify import slugify_columns, slugify_name

    assert slugify_name("a b\tc") == "a_b_c"
    ds = ray.data.from_items([{"plain": 1, "a b": 2, "a\tb": 3,
                               " lead": 4}])
    out, assoc = slugify_columns(ds)
    assert sorted(out.schema().names) == ["_lead", "a_b", "a_b__2", "plain"]
    assert assoc == {"plain": "plain", "a_b": "a b", "a_b__2": "a\tb",
                     "_lead": " lead"}
    row = out.take(1)[0]
    assert (row["a_b"], row["a_b__2"], row["_lead"]) == (2, 3, 4)

    clean = ray.data.from_items([{"x": 1}])
    same, assoc2 = slugify_columns(clean)
    assert same is clean and assoc2 == {"x": "x"}


def test_report_sinks(ray_session, tmp_path):
    """HTML report renders metrics/recommendations/exports; tabular sink
    falls back to CSV when no Excel writer is importable."""
    import pandas as pd
    import ray.data

    from packs_ray.state.metrics import pipeline_metrics
    from packs_ray.state.report import write_html_report, write_tabular

    mc = pipeline_metrics({"too_short": 7, "bad_role": 1}, total=100,
                          kept=92, scrubbed=3, dataset="transcripts")
    dup = ray.data.from_items(
        [{"doc_id": i, "text": "<b>x</b>"} for i in range(25)])
    path = write_html_report(mc, str(tmp_path / "report.html"),
                             tables={"duplicate rows": dup}, cap=10)
    doc = open(path).read()
    assert "Quality report — transcripts" in doc
    assert "rule_hits_too_short" in doc and "kept_ratio" in doc
    assert "duplicate rows (10 rows)" in doc      # cap applied
    assert "transcripts.text" in doc              # column scope label
    assert "&lt;b&gt;x&lt;/b&gt;" in doc          # escaped cell content

    out = write_tabular(pd.DataFrame({"a": range(3)}),
                        str(tmp_path / "export"))
    assert out.endswith(".xlsx")              # always a real workbook now
    assert list(_read_xlsx_col(out, 0))[1:] == ["0", "1", "2"]


def _read_xlsx_col(path, j):
    """Tiny OOXML reader (zip + ElementTree): column j cell texts in row
    order — validates the native writer without openpyxl."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out = []
    for row in root.iter(f"{ns}row"):
        cells = list(row.iter(f"{ns}c"))
        if j < len(cells):
            c = cells[j]
            t = c.find(f"{ns}is/{ns}t")
            v = c.find(f"{ns}v")
            out.append(t.text if t is not None else
                       (v.text if v is not None else None))
    return out


def test_write_xlsx_native_types(tmp_path):
    """The minimal OOXML writer round-trips numbers, strings (escaped),
    booleans and nulls through a structurally valid workbook."""
    import numpy as np
    import pandas as pd

    from packs_ray.state.report import write_tabular

    df = pd.DataFrame({
        "n": [1, 2, 3],
        "f": [1.5, np.nan, -2.25],
        "s": ["plain", "<&>\"quoted\"", "uni\u00e9"],
        "b": [True, False, True]})
    out = write_tabular(df, str(tmp_path / "typed"))
    assert _read_xlsx_col(out, 0) == ["n", "1", "2", "3"]
    fs = _read_xlsx_col(out, 1)
    assert fs[0] == "f" and fs[1] == "1.5" and fs[3] == "-2.25"
    ss = _read_xlsx_col(out, 2)
    assert ss == ["s", "plain", '<&>"quoted"', "uni\u00e9"]
    assert _read_xlsx_col(out, 3) == ["b", "1", "0", "1"]


def test_dbt_adapter(tmp_path):
    """run_results.json parsing matches the reference's tallies (any
    non-'pass' status fails; score 1.0 on zero tests; 2dp string)."""
    import json

    import pytest

    from packs_ray.functions.dbt_adapter import (dbt_checks,
                                                 parse_run_results,
                                                 run_dbt_tests)

    proj = tmp_path / "proj"
    (proj / "target").mkdir(parents=True)
    artifact = {"results": [
        {"resource_type": "test", "status": "pass"},
        {"resource_type": "test", "status": "fail"},
        {"resource_type": "test", "status": "error"},
        {"resource_type": "model", "status": "success"},  # not a test
    ]}
    (proj / "target" / "run_results.json").write_text(json.dumps(artifact))

    mc = dbt_checks(str(proj))
    vals = {m["key"]: m["value"] for m in mc.metrics}
    assert vals == {"tests_total": 3, "tests_passed": 1,
                    "tests_failed": 2, "score": "0.33"}

    assert parse_run_results({"results": []})["score"] == 1.0
    assert parse_run_results(str(tmp_path / "missing.json"))["tests_total"] == 0

    with pytest.raises(RuntimeError, match="dbt binary not found"):
        run_dbt_tests(str(proj))


def test_approx_distinct_hll(ray_session):
    """HLL sketch: estimate within the ~1.6% design error band (allow
    5%), block-split invariance (registers merge associatively), nulls
    excluded, empty input -> 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sketches import approx_distinct

    vals = [str(i * 37) for i in range(20_000)] + [None] * 500
    one = ray.data.from_arrow(pa.table({"v": vals}))
    many = one.repartition(17)
    r1 = approx_distinct(one, ["v"]).iloc[0]
    r17 = approx_distinct(many, ["v"]).iloc[0]
    assert r1["approx_distinct"] == r17["approx_distinct"]  # merge-invariant
    assert r1["harmonic_scaled"] == r17["harmonic_scaled"]
    assert abs(r1["approx_distinct"] - 20_000) / 20_000 < 0.05

    small = ray.data.from_items([{"v": x} for x in ["a", "b", "c", None]])
    assert approx_distinct(small, ["v"]).iloc[0]["approx_distinct"] == 3

    empty = ray.data.from_arrow(pa.table({"v": pa.array([], type=pa.string())}))
    assert approx_distinct(empty, ["v"]).iloc[0]["approx_distinct"] == 0


def test_count_min_sketch(ray_session):
    """CMS: estimates never underestimate, are exact when width >>
    distinct keys, and are invariant to block split (sum-merge)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sketches import count_min_counts

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=30_000)
    one = ray.data.from_arrow(pa.table({"k": keys}))
    many = one.repartition(13)
    probes = list(range(50))
    r1 = count_min_counts(one, "k", probes)
    r13 = count_min_counts(many, "k", probes)
    assert (r1["est_count"].to_numpy() == r13["est_count"].to_numpy()).all()
    exact = {str(k): int(c) for k, c in
             zip(*np.unique(keys, return_counts=True))}
    est = dict(zip(r1["key"], r1["est_count"]))
    assert all(est[k] >= exact.get(k, 0) for k in est)          # upper bound
    # 50 distinct keys over 4096-wide rows: collisions are rare enough
    # that at least 45 of 50 estimates are exact
    assert sum(est[k] == exact.get(k, 0) for k in est) >= 45

    empty = ray.data.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    r0 = count_min_counts(empty, "k", [1, 2])
    assert list(r0["est_count"]) == [0, 0]


def test_image_resize_stage(ray_session):
    """Nearest-neighbor resize: BMP roundtrip thumbnails equal the numpy
    index-sampled truth, and the output composes with ImageFeatureStage."""
    import numpy as np
    import ray.data

    from packs_ray.functions import multimodal as mm

    t = mm.synth_media_table(16)
    out = mm.image_resize(ray.data.from_arrow(t), 3, 5).to_pandas() \
        .set_index("media_id")
    for mid, kind in zip(t.column("media_id").to_pylist(),
                         t.column("kind").to_pylist()):
        if kind != "image":
            continue
        px = mm.truth_image(mid)
        h, w, _ = px.shape
        rows = (np.arange(3) * h) // 3
        cols = (np.arange(5) * w) // 5
        exp = px[rows][:, cols]
        got = mm.decode_bmp(out.loc[mid, "payload"])
        assert (got == exp).all() and got.shape == (3, 5, 3)
        assert (out.loc[mid, "height"], out.loc[mid, "width"]) == (3, 5)


def test_chunk_documents(ray_session):
    """Sliding-window chunking: overlap honored, tail chunk short but
    never empty, null/empty docs skipped, chunks reassemble the doc."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import chunk_documents

    toks = [f"t{i}" for i in range(25)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [" ".join(toks),       # 25 tokens -> 3 chunks (10/4)
                 "one two three",      # short -> 1 chunk
                 None, "", "   \t "],  # skipped
    }))
    out = chunk_documents(ds, "doc_id", "text", max_tokens=10, overlap=4) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    d1 = out[out.doc_id == 1]
    # step=6: starts 0,6,12,18 -> but 25<=10? no; nc = 1+ceil(15/6)=4
    assert list(d1.chunk_idx) == [0, 1, 2, 3]
    assert list(d1.n_tokens) == [10, 10, 10, 7]
    assert d1.chunk_text.iloc[0].split() == toks[0:10]
    assert d1.chunk_text.iloc[3].split() == toks[18:25]
    # consecutive chunks overlap by exactly `overlap` tokens
    assert d1.chunk_text.iloc[0].split()[-4:] == d1.chunk_text.iloc[1].split()[:4]
    assert set(out.doc_id) == {1, 2}
    assert list(out[out.doc_id == 2].n_tokens) == [3]


def test_deterministic_sampling_and_mixture(ray_session):
    """Hash-gated sampling: block-split invariant, ~rate fraction kept,
    monotone in rate (0.2-sample is a subset of the 0.5-sample), and
    per-source salts decorrelate decisions."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import (deterministic_sample,
                                              mixture_sample, sample_mask)

    ids = np.arange(20_000, dtype=np.int64)
    one = ray.data.from_arrow(pa.table({"id": ids}))
    s1 = set(deterministic_sample(one, "id", 0.3).to_pandas()["id"])
    s17 = set(deterministic_sample(one.repartition(17), "id", 0.3)
              .to_pandas()["id"])
    assert s1 == s17
    assert abs(len(s1) / 20_000 - 0.3) < 0.02
    s_small = set(deterministic_sample(one, "id", 0.1).to_pandas()["id"])
    assert s_small <= s1                               # monotone gate
    m_a = sample_mask(pa.array(ids), 0.3, "a")
    m_b = sample_mask(pa.array(ids), 0.3, "b")
    assert 0.05 < (m_a & m_b).mean() < 0.15            # ~independent (0.09)

    mix = mixture_sample([
        ("x", one, "id", 0.5),
        ("y", ray.data.from_arrow(pa.table({"k": ids[:1000]})), "k", 1.0),
    ]).to_pandas()
    counts = mix.groupby("source").size()
    assert counts["y"] == 1000
    assert abs(counts["x"] / 20_000 - 0.5) < 0.02


def test_hash_split(ray_session):
    """Leakage-safe splits: same key -> same split everywhere, fractions
    approximately honored, all rows assigned, bad fractions rejected."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from packs_ray.functions.sampling import hash_split

    ids = np.repeat(np.arange(5000, dtype=np.int64), 3)   # 3 rows per key
    ds = ray.data.from_arrow(pa.table({"k": ids, "v": np.arange(15000)}))
    out = hash_split(ds, "k", {"train": 0.8, "val": 0.2}).to_pandas()
    assert out["split"].notna().all()
    per_key = out.groupby("k")["split"].nunique()
    assert (per_key == 1).all()                            # no leakage
    frac = (out["split"] == "train").mean()
    assert abs(frac - 0.8) < 0.03
    out17 = hash_split(ds.repartition(17), "k",
                       {"train": 0.8, "val": 0.2}).to_pandas()
    m1 = out.sort_values("v")["split"].to_numpy()
    m17 = out17.sort_values("v")["split"].to_numpy()
    assert (m1 == m17).all()

    with pytest.raises(ValueError, match="fractions sum"):
        hash_split(ds, "k", {"a": 0.5, "b": 0.2})


def test_keyed_window_functions(ray_session):
    """Per-key analytics vs a straight pandas window oracle: row_number,
    lag diff (null at key starts), cumsum, trailing rolling sum/mean
    clipped at the key boundary; invariant under input block splits."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import keyed_window_functions

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "o": rng.permutation(n),
        "val": np.round(rng.uniform(-50, 50, n), 2),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (keyed_window_functions(ds, "k", ["o"], "val", rolling=3)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))

    ora = df.sort_values(["k", "o"]).reset_index(drop=True)
    cents = np.round(ora["val"] * 100).astype(np.int64)
    g = ora.groupby("k", sort=False)
    exp_rownum = g.cumcount() + 1
    exp_lag = cents - cents.groupby(ora["k"]).shift(1)
    exp_cumsum = cents.groupby(ora["k"]).cumsum()
    exp_roll = (cents.groupby(ora["k"])
                .rolling(3, min_periods=1).sum().reset_index(drop=True))
    exp_cnt = (cents.groupby(ora["k"])
               .rolling(3, min_periods=1).count().reset_index(drop=True))

    assert (out["cents"].to_numpy() == cents.to_numpy()).all()
    assert (out["row_number"].to_numpy() == exp_rownum.to_numpy()).all()
    eng_lag = out["lag_diff_cents"]
    assert eng_lag.isna().equals(exp_lag.isna())
    assert (eng_lag.dropna().to_numpy()
            == exp_lag.dropna().to_numpy()).all()
    assert (out["cumsum_cents"].to_numpy() == exp_cumsum.to_numpy()).all()
    assert (out["roll_sum_cents"].to_numpy()
            == exp_roll.to_numpy().astype(np.int64)).all()
    assert np.allclose(out["roll_mean_cents"].to_numpy(),
                       exp_roll.to_numpy() / exp_cnt.to_numpy())

    # block-split invariance: same result from a 13-block input
    out13 = (keyed_window_functions(ds.repartition(13), "k", ["o"], "val",
                                    rolling=3)
             .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out13)


def test_approx_quantiles(ray_session):
    """Log-bucket quantile sketch: relative error bounded by the bucket
    width (2^-5), exact on singleton small-value buckets, handles
    negatives, and is invariant under input block splits (mergeable
    partials)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sketches import approx_quantiles

    rng = np.random.default_rng(11)
    vals = np.round(np.concatenate([
        rng.lognormal(4, 1, 20_000),          # heavy positive tail
        -rng.lognormal(2, 0.5, 5_000),        # negative mass
        rng.integers(0, 30, 5_000) / 100.0,   # small-cents singletons
    ]), 2)
    ds = ray.data.from_arrow(pa.table({"x": vals}))
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    out = approx_quantiles(ds, "x", qs)
    cents = np.sort(np.round(vals * 100).astype(np.int64))
    for _, row in out.iterrows():
        exact = cents[int(row["rank"]) - 1]
        assert row["lo_cents"] <= exact <= row["hi_cents"]
        rel = abs(row["est_cents"] - exact) / max(abs(exact), 1)
        assert rel <= 2 ** -5 + 1e-12, (row["q"], rel)

    out29 = approx_quantiles(ds.repartition(29), "x", qs)
    assert out.equals(out29)

    # 0-row input: null bounds, zero n
    empty = approx_quantiles(
        ray.data.from_arrow(pa.table({"x": pa.array([], type=pa.float64())})),
        "x", [0.5])
    assert empty["n"].iloc[0] == 0 and empty["est_cents"].isna().all()


def test_url_canonicalize(ray_session):
    """Canonicalization rules: case, www., default ports (kept when
    non-default), fragment, tracking params, param sort, trailing slash,
    schemeless input, null/empty, domain extraction under subdomains;
    blocklist filter drops by registered domain."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.urls import (canonicalize_urls,
                                          filter_blocked_domains)

    urls_in = [
        "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "http://ex.com:8080/a",             # non-default port kept
        "ex.com/a/",                        # schemeless -> http
        "https://cdn.news.site.org/x?gclid=1&fbclid=2&z=1&z=0",
        None, "",
        "http://sub.deep.example.net:80",
    ]
    ds = ray.data.from_arrow(pa.table({"id": list(range(len(urls_in))),
                                       "url": urls_in}))
    out = (canonicalize_urls(ds, "url", keep_cols=["id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out.url_canon[0] == "https://ex.com/a/b?a=1&b=2"
    assert out.url_canon[1] == "http://ex.com:8080/a"
    assert out.url_canon[2] == "http://ex.com/a"
    assert out.url_canon[3] == "https://cdn.news.site.org/x?z=0&z=1"
    assert out.url_canon[4] == "" and out.url_canon[5] == ""
    assert out.url_canon[6] == "http://sub.deep.example.net"
    assert out.domain[0] == "ex.com"
    assert out.domain[3] == "site.org"
    assert out.domain[6] == "example.net"

    kept = (filter_blocked_domains(ds, "url", {"ex.com"}, keep_cols=["id"])
            .to_pandas())
    assert sorted(kept["id"]) == [3, 4, 5, 6]


def test_keyed_time_window_agg(ray_session):
    """Trailing time-window aggregate: RANGE-frame semantics (window
    defined on ts VALUES — peers at equal ts all see the same window,
    including each other), inclusive lower bound, block-split
    invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import keyed_time_window_agg

    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [
        # key 1: ts offsets in seconds, window = 10s
        (1, 0, 1.0), (1, 5, 2.0), (1, 10, 4.0),   # 10s window incl. t-10
        (1, 10, 8.0),                             # peer at equal ts
        (1, 21, 16.0),                            # 21-10=11 > 10: alone
        (2, 0, 1.0),
    ]
    df = pd.DataFrame(rows, columns=["k", "off", "val"])
    df["ts"] = base + df["off"].to_numpy() * np.timedelta64(1_000_000, "us")
    df["eid"] = np.arange(len(df))
    ds = ray.data.from_arrow(pa.Table.from_pandas(
        df[["k", "ts", "eid", "val"]], preserve_index=False))
    out = (keyed_time_window_agg(ds, "k", "ts", "val", 10,
                                 keep_cols=["eid"])
           .to_pandas().sort_values("eid").reset_index(drop=True))
    # expected: [0,5] -> 100+200; [0,10] peers: both rows at t=10 see
    # all four rows (incl. each other)
    assert list(out.n_window) == [1, 2, 4, 4, 1, 1]
    assert list(out.sum_cents_window) == [100, 300, 1500, 1500, 1600, 100]

    out5 = (keyed_time_window_agg(ds.repartition(5), "k", "ts", "val", 10,
                                  keep_cols=["eid"])
            .to_pandas().sort_values("eid").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out5)


def test_stratified_sample(ray_session):
    """Deterministic per-group head-n by hashed id: cap respected,
    small groups kept whole, identical across block splits and salts
    stable; different salt -> different subset."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import stratified_sample

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    grp = np.where(ids % 17 == 0, "rare", np.where(ids % 2 == 0, "a", "b"))
    small_ids = np.array([100000, 100001], dtype=np.int64)
    ids = np.concatenate([ids, small_ids])
    grp = np.concatenate([grp, ["tiny", "tiny"]])
    ds = ray.data.from_arrow(pa.table({"id": ids, "g": grp}))

    out = stratified_sample(ds, "g", "id", 50, salt="s1").to_pandas()
    sizes = out.groupby("g").size()
    assert sizes["a"] == 50 and sizes["b"] == 50 and sizes["rare"] == 50
    assert sizes["tiny"] == 2                      # group smaller than n
    out9 = stratified_sample(ds.repartition(9), "g", "id", 50,
                             salt="s1").to_pandas()
    key = lambda d: sorted(map(tuple, d[["g", "id"]].to_numpy()))
    assert key(out) == key(out9)
    out_s2 = stratified_sample(ds, "g", "id", 50, salt="s2").to_pandas()
    assert key(out) != key(out_s2)


def test_top_terms(ray_session):
    """Per-doc top-k by (tf desc, corpus df asc, token): rare terms
    outrank common ones at equal tf; df counts docs not occurrences;
    block-split invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import top_terms

    docs = {
        1: "apple apple banana zebra",
        2: "apple banana banana",
        3: "zebra  cherry\tcherry cherry",
        4: "",
        5: None,
    }
    ds = ray.data.from_arrow(pa.table({"doc_id": list(docs),
                                       "text": list(docs.values())}))
    out = (top_terms(ds, "doc_id", "text", k=2)
           .to_pandas().sort_values(["doc_id", "rank"])
           .reset_index(drop=True))
    assert set(out.doc_id) == {1, 2, 3}            # empty/null emit nothing
    d1 = out[out.doc_id == 1]
    # apple tf=2 first; then banana vs zebra (both tf=1, df=2): token asc
    assert list(d1.token) == ["apple", "banana"]
    assert list(d1.tf) == [2, 1] and list(d1.df) == [2, 2]
    d3 = out[out.doc_id == 3]
    assert list(d3.token) == ["cherry", "zebra"]
    assert list(d3.df) == [1, 2]

    out7 = (top_terms(ds.repartition(7), "doc_id", "text", k=2)
            .to_pandas().sort_values(["doc_id", "rank"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out7)


def test_rollup_counts(ray_session):
    """ROLLUP levels: finest, per-prefix, grand total; null-key groups
    counted; levels sum-consistent; single scan of the input."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import rollup_counts

    a = ["x"] * 6 + ["y"] * 3 + [None]
    b = ["p", "p", "q", "q", "q", None, "p", "p", "q", "p"]
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b}))
    out = rollup_counts(ds, ["a", "b"]).to_pandas()
    lv2 = out[out.a.notna() & out.b.notna()]
    lv1 = out[out.a.notna() & out.b.isna()]
    lv0 = out[out.a.isna() & out.b.isna()]
    # null-key fine rows: (None,'p') is a real group at the finest level
    fine_null = out[out.a.isna() & out.b.notna()]
    assert len(fine_null) == 1 and fine_null.cnt.iloc[0] == 1
    assert dict(zip(zip(lv2.a, lv2.b), lv2.cnt))[("x", "p")] == 2
    # ('x', None) appears twice: the real null-b group (1) and the
    # rolled-up x subtotal (6) — disambiguate by count
    assert sorted(lv1[lv1.a == "x"].cnt) == [1, 6]
    assert set(lv1[lv1.a == "y"].cnt) == {3}
    # grand total row: the (None,None) level-0 row holds all 10; the
    # rolled-up subtotal of the null-a group (1) is also (None,None)
    assert sorted(lv0.cnt) == [1, 10]
    assert lv2.cnt.sum() + fine_null.cnt.sum() + lv1[lv1.cnt == 1].cnt.sum() == 10


def test_keyed_windows_null_rows_dropped(ray_session):
    """Null key/ts/value rows are filtered, never NaN->INT64_MIN poisoned:
    a 3-row input with one null value must yield the same analytics as the
    2-row clean input (the ADVICE r03 repro)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import (keyed_time_window_agg,
                                             keyed_window_functions)

    df = pd.DataFrame({
        "k": [1, 1, 1],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:05",
                              "2024-01-01 00:00:09"]).astype("datetime64[us]"),
        "val": [1.25, None, 2.5],
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    clean = ray.data.from_arrow(pa.Table.from_pandas(
        df[df.val.notna()], preserve_index=False))

    out = (keyed_window_functions(ds, "k", ["ts"], "val", rolling=3)
           .to_pandas().sort_values("ts").reset_index(drop=True))
    exp = (keyed_window_functions(clean, "k", ["ts"], "val", rolling=3)
           .to_pandas().sort_values("ts").reset_index(drop=True))
    assert len(out) == 2
    pd.testing.assert_frame_equal(out, exp)
    assert out["cumsum_cents"].tolist() == [125, 375]
    assert not (out["cumsum_cents"] < -10**15).any()  # no INT64_MIN garbage

    out2 = (keyed_time_window_agg(ds, "k", "ts", "val", 10)
            .to_pandas().sort_values("ts").reset_index(drop=True))
    exp2 = (keyed_time_window_agg(clean, "k", "ts", "val", 10)
            .to_pandas().sort_values("ts").reset_index(drop=True))
    assert len(out2) == 2
    pd.testing.assert_frame_equal(out2, exp2)
    assert out2["sum_cents_window"].tolist() == [125, 375]


def test_sodacl_threshold_forms(ray_session):
    """warn:/fail: blocks and percent one-liners (the production SodaCL
    shapes) parse onto max_violations / percent rules with readable
    labels; a warn outcome is not a pass (reference roll-up
    soda_pack/main.py:103-107)."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.checks import checks_from_sodacl, run_checks

    yaml_text = """
checks for t:
  - row_count between 2 and 100
  - missing_percent(v) < 50%
  - duplicate_percent(k) < 40%
  - invalid_count(s):
      valid values: [a, b]
      warn: when > 0
      fail: when > 2
"""
    rules = checks_from_sodacl(yaml_text)
    assert [r["type"] for r in rules] == [
        "row_count_between", "not_null_percent", "duplicate_percent_max",
        "values_in_set", "values_in_set"]
    assert rules[1]["min_percent"] == 0.5 and rules[1]["strict"]
    assert rules[3]["max_violations"] == 2      # fail: when > 2
    assert rules[4]["max_violations"] == 0      # warn: when > 0
    assert "fail" in rules[3]["label"] and "warn" in rules[4]["label"]

    ds = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2, 3],                      # 1 duplicate row / 4 = 25%
        "v": [1.0, None, 2.0, 3.0],             # 25% missing < 50%
        "s": ["a", "b", "x", "y"],              # 2 invalid values
    }))
    out = run_checks(ds, rules).set_index("check_id")
    assert bool(out.loc[0, "passed"])           # 4 rows in [2, 100]
    assert out.loc[1, "observed"] == 0.75 and bool(out.loc[1, "passed"])
    assert out.loc[2, "observed"] == 0.25 and bool(out.loc[2, "passed"])
    assert out.loc[3, "observed"] == 2 and bool(out.loc[3, "passed"])
    assert not bool(out.loc[4, "passed"])       # warn threshold breached
    assert out.loc[-1, "observed"] == 4.0       # 4 of 5 checks passed

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported warn threshold"):
        checks_from_sodacl(
            "checks for t:\n  - missing_count(v):\n      warn: when < 5\n")


def test_ge_extended_forms(ray_session):
    """regex-search (str.contains) vs full-match, mostly thresholds,
    column-exists, length-between, min/max bounds — and the skipped row
    is visible, passed=False, and excluded from the score denominator."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.checks import (checks_from_expectations,
                                            run_checks)

    ds = ray.data.from_arrow(pa.table({
        "name": ["id-001", "id-002", "xx-003", "id-004"],
        "x": [1.0, 5.0, None, 9.0],
    }))
    suite = [
        {"expectation_type": "expect_column_to_exist",
         "kwargs": {"column": "name"}},
        {"expectation_type": "expect_column_to_exist",
         "kwargs": {"column": "missing_col"}},
        {"expectation_type": "expect_column_values_to_match_regex",
         "kwargs": {"column": "name", "regex": "id-", "mostly": 0.7}},
        {"expectation_type": "expect_column_value_lengths_to_be_between",
         "kwargs": {"column": "name", "min_value": 6, "max_value": 6}},
        {"expectation_type": "expect_column_values_to_not_be_null",
         "kwargs": {"column": "x", "mostly": 0.7}},
        {"expectation_type": "expect_column_min_to_be_between",
         "kwargs": {"column": "x", "min_value": 0.0, "max_value": 2.0}},
        {"expectation_type": "expect_column_max_to_be_between",
         "kwargs": {"column": "x", "min_value": 10.0, "max_value": 20.0}},
        {"expectation_type": "expect_some_future_thing",
         "kwargs": {"column": "x"}},
    ]
    out = run_checks(ds, checks_from_expectations(suite)) \
        .set_index("check_id")
    assert bool(out.loc[0, "passed"]) and not bool(out.loc[1, "passed"])
    # regex SEARCH: 'id-' hits 3/4 = 0.75 >= 0.7 (full-match would be 0)
    assert out.loc[2, "observed"] == 0.75 and bool(out.loc[2, "passed"])
    assert bool(out.loc[3, "passed"])           # all lengths exactly 6
    assert out.loc[4, "observed"] == 0.75       # non-null of ALL rows
    assert bool(out.loc[5, "passed"]) and out.loc[5, "observed"] == 1.0
    assert not bool(out.loc[6, "passed"]) and out.loc[6, "observed"] == 9.0
    skipped = out[out["type"].str.startswith("skipped:")]
    assert len(skipped) == 1 and not skipped["passed"].iloc[0]
    # score: 5 passed of 7 scored (skip excluded from the denominator)
    assert out.loc[-1, "observed"] == 5.0 and not bool(out.loc[-1, "passed"])


def test_profile_variables_matches_pandas_moments(ray_session):
    """profile_variables' power-sum skewness/kurtosis must equal pandas
    skew()/kurt() (the ydata estimators the reference emits), and the
    catalog fractions must match direct computation."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import profile_variables

    rng = np.random.default_rng(29)
    v = np.round(np.exp(rng.normal(3, 0.8, 4000)), 2)  # right-skewed
    v[::50] = np.nan                                   # 2% missing
    v[1::100] = 0.0
    # from_pandas=True converts NaN -> Arrow null (parquet semantics);
    # a raw numpy NaN would be a float VALUE, not a missing cell
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v, from_pandas=True)}))
    got = profile_variables(ds, "v").iloc[0]

    s = pd.Series(v)
    assert got["n"] == int(s.notna().sum())
    assert got["n_missing"] == int(s.isna().sum())
    assert got["p_missing"] == round(s.isna().mean(), 6)
    assert got["n_distinct"] == s.dropna().nunique()
    assert abs(got["skewness"] - round(s.skew(), 6)) <= 1e-6
    assert abs(got["kurtosis"] - round(s.kurt(), 6)) <= 1e-6
    assert abs(got["cv"] - round(s.std() / s.mean(), 6)) <= 1e-6
    assert got["iqr"] == round(round(s.quantile(0.75), 4)
                               - round(s.quantile(0.25), 4), 4)
    assert got["n_zeros"] == int((s == 0).sum())
    assert got["sum_value"] == np.round(s.dropna() * 100).astype(
        np.int64).sum() / 100.0


def test_rollup_counts_integer_keys(ray_session):
    """Rolled-up levels must emit nulls of the column's OWN type — an
    int64 group column survives the level union as int64 (ADVICE r03:
    string-typed nulls used to break any non-string key)."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import rollup_counts

    ds = ray.data.from_arrow(pa.table({
        "a": [1, 1, 1, 2, 2, 3],
        "b": [10, 10, 20, 10, 10, 30],
    }))
    out = rollup_counts(ds, ["a", "b"]).to_pandas()
    # keys stay numeric through the union (never string-coerced)
    assert all(not isinstance(x, str) for x in out["a"].dropna())
    fine = out[out.a.notna() & out.b.notna()]
    assert dict(zip(zip(fine.a, fine.b), fine.cnt))[(1, 10)] == 2
    sub = out[out.a.notna() & out.b.isna()]
    assert dict(zip(sub.a, sub.cnt)) == {1: 3, 2: 2, 3: 1}
    grand = out[out.a.isna() & out.b.isna()]
    assert grand.cnt.tolist() == [6]


def test_span_dedup_prefilter_exact(ray_session):
    """The saturating-CMS singleton prefilter must change NOTHING: a CMS
    upper bound of 1 is a provable singleton, so prefilter on/off give
    identical marks and identical rebuilt text — while the gram exchange
    shrinks on a mostly-unique corpus."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.spandedup import dedup_spans, duplicate_spans

    rng = np.random.default_rng(31)
    words = [f"w{i}" for i in range(500)]
    boiler = "the quick brown fox jumps over the lazy dog again"
    texts, ids = [], []
    for i in range(120):
        body = " ".join(rng.choice(words, 40))
        texts.append(body if i % 4 else body + " " + boiler)
        ids.append(i)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))

    m_on = (duplicate_spans(ds, "doc_id", "text", k=8, prefilter=True,
                            prefilter_width=1 << 16)
            .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True))
    m_off = (duplicate_spans(ds, "doc_id", "text", k=8, prefilter=False)
             .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(m_on, m_off)
    assert len(m_on) > 0  # the planted boilerplate span is found

    d_on = (dedup_spans(ds, "doc_id", "text", k=8, prefilter=True,
                        prefilter_width=1 << 16)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    d_off = (dedup_spans(ds, "doc_id", "text", k=8, prefilter=False)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(d_on, d_off)


def test_dsir_importance_weights_selects_target_like(ray_session):
    """DSIR log importance weights: documents drawn from the target
    word distribution must outscore off-distribution documents, empty
    docs are excluded, and the score equals a local numpy replica."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.dsir import (_count_features, _doc_features,
                                          importance_weights)

    rng = np.random.default_rng(37)
    tech = "model data training token corpus dedup shuffle batch".split()
    chat = "hello thanks maybe tomorrow dinner weather friend movie".split()
    docs, ids = [], []
    for i in range(60):
        pool = tech if i % 2 == 0 else chat
        docs.append(" ".join(rng.choice(pool, 30)))
        ids.append(i)
    docs.append("   ")  # whitespace-only: excluded
    ids.append(999)
    src = ray.data.from_arrow(pa.table({"doc_id": ids, "text": docs}))
    tgt = ray.data.from_arrow(pa.table(
        {"doc_id": [0], "text": [" ".join(rng.choice(tech, 400))]}))

    out = importance_weights(src, "doc_id", "text", tgt, n_bits=12) \
        .to_pandas().set_index("doc_id")
    assert 999 not in out.index and len(out) == 60
    tech_scores = out.loc[[i for i in range(60) if i % 2 == 0], "logratio"]
    chat_scores = out.loc[[i for i in range(60) if i % 2 == 1], "logratio"]
    assert tech_scores.min() > chat_scores.max()

    # exact numpy replica of one document's score
    width = 1 << 12
    sc = _count_features(src, "text", 12)
    tc = _count_features(tgt, "text", 12)
    w = (np.log((tc + 1.0) / (tc.sum() + width))
         - np.log((sc + 1.0) / (sc.sum() + width)))
    b, counts = _doc_features(pa.array([docs[0]]), 12)
    assert abs(out.loc[0, "logratio"] - round(float(w[b].sum()), 6)) < 1e-9
    assert out.loc[0, "n_features"] == counts[0]


def test_corpus_perplexity_trained_lm(ray_session):
    """Corpus-trained byte-bigram LM: bigram counts never cross row
    boundaries, in-distribution text scores fewer bits/byte than random
    bytes, short/null rows score 0.0, and the counts match a local
    numpy replica."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.lm import (corpus_perplexity,
                                        train_byte_bigram_counts)

    rng = np.random.default_rng(41)
    english = ["the model trains on the corpus and scores the corpus"
               for _ in range(50)]
    noise = ["".join(chr(c) for c in rng.integers(33, 127, 60))
             for _ in range(5)]
    rows = english + noise + [None, "x"]
    ids = list(range(len(rows)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": rows}))

    counts = train_byte_bigram_counts(ds, "text")
    # local replica: within-row pairs only
    exp = np.zeros((256, 256), dtype=np.int64)
    for t in rows:
        if t is None:
            continue
        bs = t.encode()
        for a, b in zip(bs[:-1], bs[1:]):
            exp[a, b] += 1
    assert (counts == exp).all()

    out = corpus_perplexity(ds, "doc_id", "text").to_pandas() \
        .set_index("doc_id")
    en = out.loc[range(50), "bits_per_byte"]
    nz = out.loc[range(50, 55), "bits_per_byte"]
    assert en.max() < nz.min()          # corpus-typical text scores lower
    assert out.loc[55, "bits_per_byte"] == 0.0   # null text
    assert out.loc[55, "n_bytes"] == 0
    assert out.loc[56, "bits_per_byte"] == 0.0   # single byte


def test_token_bigram_perplexity_parity(ray_session):
    """Word-level bigram LM: trained counts match a local replica
    (within-doc pairs only, UNK folding at the vocab cutoff), scores
    match a hand-rolled add-one-smoothed scorer, corpus-typical docs
    score below shuffled-token docs, and <2-token docs score 0.0."""
    import collections
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.lm import (token_bigram_perplexity,
                                        train_token_bigram_counts)
    from packs_ray.functions.textstats import build_vocab

    rng = np.random.default_rng(7)
    vocab_words = [f"w{i}" for i in range(30)]
    typical = ["the cat sat on the mat and the cat slept"
               for _ in range(40)]
    shuffled = [" ".join(rng.permutation(vocab_words).tolist())
                for _ in range(5)]
    rows = typical + shuffled + [None, "", "solo", "  "]
    ids = list(range(len(rows)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": rows})).repartition(3)

    v = 16      # small cutoff so shuffled docs hit UNK
    vocab = build_vocab(ds, "text", k=v)
    bg = train_token_bigram_counts(ds, "text", vocab)

    # local replica
    lut = dict(zip(vocab["token"], vocab["token_id"].astype(int)))
    exp = collections.Counter()
    for t in rows:
        toks = (t or "").split()
        idseq = [lut.get(w, 0) for w in toks]
        for a, b in zip(idseq[:-1], idseq[1:]):
            exp[(a, b)] += 1
    got = {(r.w1, r.w2): r.cnt for r in bg.itertuples()}
    assert got == dict(exp)

    out = token_bigram_perplexity(
        ds, "doc_id", "text", vocab_size=v).to_pandas() \
        .set_index("doc_id")
    # hand-rolled scorer parity on one typical and one shuffled doc
    ctx = collections.Counter()
    for (a, _), c in exp.items():
        ctx[a] += c
    v_sm = len(vocab) + 1
    for probe in (0, 40):
        toks = rows[probe].split()
        idseq = [lut.get(w, 0) for w in toks]
        lps = [math.log2((exp[(a, b)] + 1) / (ctx[a] + v_sm))
               for a, b in zip(idseq[:-1], idseq[1:])]
        want = round(-sum(lps) / len(lps), 6)
        assert abs(out.loc[probe, "bits_per_token"] - want) < 1e-9
        assert out.loc[probe, "n_bigrams"] == len(lps)
    typ = out.loc[range(40), "bits_per_token"]
    shf = out.loc[range(40, 45), "bits_per_token"]
    assert typ.max() < shf.min()
    for i in (45, 46, 47, 48):          # null / empty / 1-token / ws
        assert out.loc[i, "bits_per_token"] == 0.0
        assert out.loc[i, "n_bigrams"] == 0
    assert out.loc[47, "n_tokens"] == 1
    assert out.loc[48, "n_tokens"] == 0


def test_cluster_balanced_sample_flattens_mixture(ray_session):
    """cluster_balanced_sample: a dominant topic cluster contributes the
    same row budget as a rare one, assignment matches a local Lloyd
    replica, and the per-cluster pick is the deterministic lowest-hash
    head (stable under repartitioning)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.similarity import (_fit_dim, _lloyd,
                                                _sq_dist_seq, _batch_matrix,
                                                cluster_balanced_sample)

    rng = np.random.default_rng(43)
    # two well-separated topics, 10:1 imbalance
    big = rng.normal(0, 0.1, (400, 8)) + np.array([5.0] * 8)
    small = rng.normal(0, 0.1, (40, 8)) + np.array([-5.0] * 8)
    m = np.vstack([big, small])
    ids = list(range(len(m)))
    ds = ray.data.from_arrow(pa.table(
        {"vec_id": ids, "embedding": [r.tolist() for r in m]}))

    out = cluster_balanced_sample(ds, "vec_id", "embedding",
                                  n_per_cluster=15, n_clusters=2,
                                  sample_rows=2048, seed=42).to_pandas()
    counts = out.groupby("cluster").size()
    assert set(counts) == {15}          # both topics capped at 15
    # assignment parity with a local replica
    cent = _lloyd(m[:2048], 2, 42)
    local_assign = _sq_dist_seq(m, cent).argmin(1)
    got = out.set_index("vec_id")["cluster"]
    for vid, cl in got.items():
        assert local_assign[vid] == cl
    # repartition stability
    out7 = cluster_balanced_sample(ds.repartition(7), "vec_id", "embedding",
                                   n_per_cluster=15, n_clusters=2,
                                   sample_rows=2048, seed=42).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["cluster", "vec_id"]).reset_index(drop=True),
        out7.sort_values(["cluster", "vec_id"]).reset_index(drop=True))


def test_weighted_sample_proportional_and_stable(ray_session):
    """weighted_sample: heavier rows win more often (statistical check
    over disjoint salts), selection is invariant under repartitioning,
    and zero/null weights never get drawn."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import weighted_sample

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    # first half weight 9, second half weight 1 -> ~90% of draws heavy
    w = np.where(ids < n // 2, 9.0, 1.0)
    w[0] = 0.0                         # never drawn
    tbl = pa.table({"k": ids, "w": w})
    ds = ray.data.from_arrow(tbl)

    heavy = 0
    for s in ("a", "b", "c", "d"):
        out = weighted_sample(ds, "k", "w", 100, salt=s).to_pandas()
        assert len(out) == 100
        assert 0 not in set(out["k"])
        heavy += int((out["k"] < n // 2).sum())
    assert 310 <= heavy <= 390         # E=360, sd~6 per 400 draws

    one = weighted_sample(ds, "k", "w", 50).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    many = weighted_sample(ds.repartition(9), "k", "w", 50).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_pivot_counts_domain_and_nulls(ray_session):
    """pivot_counts: explicit domain (off-domain values dropped), null
    keys dropped, counts exact and repartition-stable."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import pivot_counts

    tbl = pa.table({
        "k": pa.array([1, 1, 2, 2, 2, None, 3], type=pa.int64()),
        "v": pa.array(["a", "b", "a", "zz", "a", "a", "b"]),
    })
    ds = ray.data.from_arrow(tbl)
    out = pivot_counts(ds, "k", "v", ["a", "b"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2, 3]          # null key dropped
    assert list(out["n_a"]) == [1, 2, 0]        # 'zz' counted nowhere
    assert list(out["n_b"]) == [1, 0, 1]
    out9 = pivot_counts(ds.repartition(9), "k", "v", ["a", "b"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out9)


def test_ntile_by_value_ties_and_nulls(ray_session):
    """ntile_by_value: boundary values go UP a tier, nulls dropped, a
    constant column lands everything in the top tier, and assignment is
    repartition-stable."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import ntile_by_value

    v = np.arange(100, dtype=np.float64)
    tbl = pa.table({"id": np.arange(100, dtype=np.int64), "x": v})
    ds = ray.data.from_arrow(tbl)
    out = ntile_by_value(ds, "x", 4).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # exact quartiles of 0..99 are 24.75/49.5/74.25; tier populations
    # are the searchsorted counts
    assert out["tier"].min() == 1 and out["tier"].max() == 4
    assert list(out.groupby("tier").size()) == [25, 25, 25, 25]
    # ties at the boundary: v == threshold goes up
    t2 = out.loc[out["id"] == 50, "tier"].iloc[0]
    assert t2 == 3                               # 50 >= 49.5

    # nulls dropped
    tbl2 = pa.table({"id": pa.array([0, 1, 2], type=pa.int64()),
                     "x": pa.array([1.0, None, 2.0])})
    out2 = ntile_by_value(ray.data.from_arrow(tbl2), "x", 2).to_pandas()
    assert sorted(out2["id"]) == [0, 2]

    # constant column: every threshold equals the value -> top tier
    tbl3 = pa.table({"id": pa.array([0, 1], type=pa.int64()),
                     "x": pa.array([5.0, 5.0])})
    out3 = ntile_by_value(ray.data.from_arrow(tbl3), "x", 4).to_pandas()
    assert set(out3["tier"]) == {4}

    out9 = ntile_by_value(ds.repartition(9), "x", 4).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out9)


def test_dedup_against_snapshot(ray_session):
    """dedup_against: cross-side content hits dropped, internal new-side
    dups kept, int64 ids survive the bucket reduce, repartition-stable."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.duplicates import dedup_against

    new = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "t": ["dup-a", "fresh-1", "fresh-1", "dup-b"]}))
    snap = ray.data.from_arrow(pa.table({
        "id": pa.array([100, 101], type=pa.int64()),
        "t": ["dup-a", "dup-b"]}))
    out = dedup_against(new, snap, ["t"], "id").to_pandas()
    assert sorted(out["id"]) == [2, 3]      # internal dup kept twice
    assert out["id"].dtype == "int64"

    out9 = dedup_against(new.repartition(5), snap.repartition(3),
                         ["t"], "id").to_pandas()
    assert sorted(out9["id"]) == [2, 3]

    # empty snapshot: everything is new
    empty = ray.data.from_arrow(pa.table({
        "id": pa.array([], type=pa.int64()),
        "t": pa.array([], type=pa.string())}))
    out0 = dedup_against(new, empty, ["t"], "id").to_pandas()
    assert sorted(out0["id"]) == [1, 2, 3, 4]


def test_semantic_dedup_leader_rule(ray_session):
    """semantic_dedup: within a cluster the smallest id of each
    cosine-tau group survives, the leader set includes dropped rows,
    nulls are excluded, oversize clusters skip the quadratic pass."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.similarity import semantic_dedup

    # two well-separated directions; ids 0,1,2 ~ +x (dups), 10 ~ +y
    vecs = [[1.0, 0.0], [0.99, 0.14], [0.98, 0.2], [0.0, 1.0], None]
    ids = [0, 1, 2, 10, 99]
    cent = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float64)
    tbl = pa.table({"id": pa.array(ids, type=pa.int64()),
                    "v": pa.array(vecs, type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    out = semantic_dedup(ds, "id", "v", tau=0.95, centroids=cent) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    # 0 survives; 1,2 within tau of 0 -> dropped; 10 other cluster; 99 null
    assert list(out["id"]) == [0, 10]

    # chain case: cos(0,1)>=tau, cos(1,2)>=tau but cos(0,2)<tau ->
    # 2 still dropped because dropped row 1 stays a leader
    v2 = [[1.0, 0.0], [0.9239, 0.3827], [0.7071, 0.7071]]  # 0/22.5/45 deg
    t2 = pa.table({"id": pa.array([0, 1, 2], type=pa.int64()),
                   "v": pa.array(v2, type=pa.list_(pa.float32()))})
    out2 = semantic_dedup(ray.data.from_arrow(t2), "id", "v",
                          tau=0.92, centroids=np.array([[1.0, 0.0]])) \
        .to_pandas()
    assert list(sorted(out2["id"])) == [0]

    # group_cap: oversize cluster keeps everything
    out3 = semantic_dedup(ray.data.from_arrow(t2), "id", "v",
                          tau=0.92, centroids=np.array([[1.0, 0.0]]),
                          group_cap=2).to_pandas()
    assert sorted(out3["id"]) == [0, 1, 2]

    out9 = semantic_dedup(ds.repartition(4), "id", "v", tau=0.95,
                          centroids=cent).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out9)


def test_budget_sample_fills_per_source(ray_session):
    """budget_sample: each source's kept token total reaches its budget
    with at most one overshooting doc; unbudgeted sources drop; order
    is the deterministic hash order (repartition-stable)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import budget_sample

    n = 300
    tbl = pa.table({
        "id": pa.array(np.arange(n), type=pa.int64()),
        "src": pa.array(["a" if i % 3 else "b" for i in range(n)]),
        "tok": pa.array(np.full(n, 10), type=pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    out = budget_sample(ds, "id", "src", "tok", {"a": 95}).to_pandas()
    assert set(out["src"]) == {"a"}          # 'b' unbudgeted
    total = out["tok"].sum()
    assert 95 <= total < 95 + 10             # fills budget, <=1 doc over
    out9 = budget_sample(ds.repartition(7), "id", "src", "tok",
                         {"a": 95}).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("id").reset_index(drop=True),
        out9.sort_values("id").reset_index(drop=True))

    # budget smaller than any doc still takes the first doc
    out1 = budget_sample(ds, "id", "src", "tok", {"b": 1}).to_pandas()
    assert len(out1) == 1 and out1["src"].iloc[0] == "b"


def test_uniform_sample_n_exact_and_partition_invariant(ray_session):
    """uniform_sample_n: exactly n rows, equal to the pandas-computed
    n-smallest-hash subset, invariant under repartitioning, and
    disjoint salts draw visibly different subsets."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import (_salt_constant,
                                              uniform_sample_n)
    from packs_ray.functions.sketches import _finalize, _fnv1a_str

    n = 1500
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": ids}))

    out = uniform_sample_n(ds, "k", 60, salt="s").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert len(out) == 60

    # oracle: full hash order computed locally
    h, _ = _fnv1a_str(pa.array(ids))
    hv = (_finalize(h * _salt_constant("s")) >> np.uint64(1)) \
        .astype(np.int64)
    exp = (pd.DataFrame({"k": ids, "hv": hv})
           .sort_values(["hv", "k"]).head(60)
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)

    many = uniform_sample_n(ds.repartition(11), "k", 60, salt="s") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, many)

    other = uniform_sample_n(ds, "k", 60, salt="t").to_pandas()
    assert set(out["k"]) != set(other["k"])


def test_winsorize_clips_and_keeps_nulls(ray_session):
    """winsorize: values clip into the exact [q_lo, q_hi] band, interior
    values pass through (6dp), null values stay null, rows never drop."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import winsorize

    v = np.arange(101, dtype=np.float64)       # p5 = 5.0, p95 = 95.0
    tbl = pa.table({"id": np.arange(102, dtype=np.int64),
                    "x": pa.array(list(v) + [None], type=pa.float64())})
    out = winsorize(ray.data.from_arrow(tbl).repartition(7),
                    ["id"], "x", 0.05, 0.95).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert len(out) == 102
    w = out["winsorized"]
    assert w.iloc[0] == 5.0 and w.iloc[3] == 5.0      # low tail clipped
    assert w.iloc[100] == 95.0 and w.iloc[97] == 95.0  # high tail clipped
    assert (w.iloc[5:96].to_numpy() == v[5:96]).all()  # interior intact
    assert pd.isna(w.iloc[101]) and pd.isna(out["x"].iloc[101])


def test_psi_drift_detects_shift(ray_session):
    """psi_drift: ~0 for identically-distributed halves, large for a
    shifted distribution; out-of-range comparison values clamp into the
    edge bins instead of vanishing."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.drift import psi_drift

    rng = np.random.default_rng(7)
    base = rng.normal(0.0, 1.0, 4000)
    same = rng.normal(0.0, 1.0, 4000)
    shifted = rng.normal(2.5, 1.0, 4000)

    mk = lambda a: ray.data.from_arrow(pa.table({"x": a})).repartition(5)
    near = psi_drift(mk(base), mk(same), "x")
    far = psi_drift(mk(base), mk(shifted), "x")
    assert near["psi"].iloc[0] < 0.05 and not near["drifted"].iloc[0]
    assert far["psi"].iloc[0] > 1.0 and far["drifted"].iloc[0]

    # every comparison value beyond the baseline max -> all mass in the
    # top edge bin, PSI finite (epsilon floor) and huge
    out = psi_drift(mk(base), mk(base + 100.0), "x")
    assert np.isfinite(out["psi"].iloc[0]) and out["drifted"].iloc[0]


def test_grouped_approx_distinct_accuracy_and_invariance(ray_session):
    """grouped_approx_distinct: per-key estimates within HLL error
    (~1.6% at p=12) of the exact counts, invariant under
    repartitioning, null keys/values excluded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sketches import grouped_approx_distinct

    rng = np.random.default_rng(3)
    k = rng.integers(0, 3, 30_000)
    # distinct cardinality differs per key: 0 -> ~100, 1 -> ~2000, 2 -> ~20k
    v = np.where(k == 0, rng.integers(0, 100, 30_000),
                 np.where(k == 1, rng.integers(0, 2000, 30_000),
                          rng.integers(0, 40_000, 30_000)))
    tbl = pa.table({"k": pa.array(k, type=pa.int64()),
                    "v": pa.array(v, type=pa.int64())})
    ds = ray.data.from_arrow(tbl)

    out = grouped_approx_distinct(ds, "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exact = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].nunique()
    assert len(out) == 3
    for _, r in out.iterrows():
        rel = abs(r["approx_distinct"] - exact[r["k"]]) / exact[r["k"]]
        assert rel < 0.06, (r["k"], r["approx_distinct"], exact[r["k"]])

    again = grouped_approx_distinct(ds.repartition(13), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)

    # null key rows and all-null-value keys never appear
    tbl2 = pa.table({"k": pa.array([1, 1, None, 2], type=pa.int64()),
                     "v": pa.array([5, 6, 7, None], type=pa.int64())})
    small = grouped_approx_distinct(ray.data.from_arrow(tbl2), "k", "v") \
        .to_pandas()
    assert set(small["k"]) == {1}
    assert small["approx_distinct"].iloc[0] == 2


def test_keyed_count_distinct_exact(ray_session):
    """keyed_count_distinct: exact per-key nunique, cross-batch dedup
    (the same value repeated in different blocks counts once),
    partition-invariant, null keys/values excluded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import keyed_count_distinct

    rng = np.random.default_rng(7)
    k = rng.integers(0, 5, 20_000)
    v = rng.integers(0, 300, 20_000)
    tbl = pa.table({"k": pa.array(k, type=pa.int64()),
                    "v": pa.array(v, type=pa.int64())})
    # many blocks so every value repeats across blocks
    ds = ray.data.from_arrow(tbl).repartition(17)

    out = keyed_count_distinct(ds, "k", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exact = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].nunique()
    assert list(out["k"]) == sorted(exact.index)
    for _, r in out.iterrows():
        assert r["n_distinct"] == exact[r["k"]]

    again = keyed_count_distinct(ds.repartition(3), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)

    # null key rows and all-null-value keys never appear; string keys work
    tbl2 = pa.table({"k": pa.array(["a", "a", None, "b"]),
                     "v": pa.array([5, 5, 7, None], type=pa.int64())})
    small = keyed_count_distinct(
        ray.data.from_arrow(tbl2), "k", "v").to_pandas()
    assert set(small["k"]) == {"a"}
    assert small["n_distinct"].iloc[0] == 1


def test_sequence_validity_edges(ray_session):
    """sequence_validity: regressions counted vs RUNNING MAX (a late
    re-emit after a jump counts even if above its neighbor), duplicate
    timestamps counted, single-row keys get gap 0, null rows excluded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import sequence_validity

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = lambda n: base + np.timedelta64(n, "s")
    tbl = pa.table({
        # key a: seq 1,5,3,4 by ts -> 3 and 4 are both < runmax 5 (2 regs);
        # ts dup between rows 2 and 3
        "k": pa.array(["a", "a", "a", "a", "b", None, "c"]),
        "seq": pa.array([1, 5, 3, 4, 9, 1, None], type=pa.int64()),
        "ts": pa.array([s(0), s(10), s(20), s(20), s(0), s(0), s(0)],
                       type=pa.timestamp("us")),
    })
    out = sequence_validity(ray.data.from_arrow(tbl), "k", "seq", "ts") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == ["a", "b"]
    a = out.iloc[0]
    assert a["n_rows"] == 4 and a["n_dup_ts"] == 1
    assert a["n_seq_regressions"] == 2 and not a["is_monotonic"]
    assert a["max_gap_us"] == 10_000_000
    b = out.iloc[1]
    assert b["n_rows"] == 1 and b["max_gap_us"] == 0 and b["is_monotonic"]

    again = sequence_validity(
        ray.data.from_arrow(tbl).repartition(4), "k", "seq", "ts") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_activity_streaks_islands(ray_session):
    """activity_streaks: consecutive days form one streak, gaps split
    them, multiple events on one day count once; partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import activity_streaks

    base = np.datetime64("2024-05-01T09:00:00", "us")
    day = np.timedelta64(86400, "s")
    # user a: days 0,1,2, 5,6, 10 -> 3 streaks, longest 3, max gap 3
    a_days = [0, 1, 1, 2, 5, 6, 10]     # day 1 twice
    # user b: single day
    ts = [base + d * day for d in a_days] + [base]
    tbl = pa.table({"u": pa.array(["a"] * 7 + ["b"]),
                    "ts": pa.array(np.array(ts, dtype="datetime64[us]"),
                                   type=pa.timestamp("us"))})
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = activity_streaks(ds, "u", "ts").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    a, b = out.iloc[0], out.iloc[1]
    assert a["n_active_days"] == 6 and a["n_streaks"] == 3
    assert a["longest_streak"] == 3 and a["max_gap_days"] == 3
    assert b["n_active_days"] == 1 and b["n_streaks"] == 1
    assert b["longest_streak"] == 1 and b["max_gap_days"] == 0

    again = activity_streaks(ds.repartition(1), "u", "ts").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_minmax_scale_per_key_bounds(ray_session):
    """minmax_scale_per_key: per-group bounds (0 at min, 1 at max),
    constant groups scale to 0.0, null rows dropped;
    partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.repair import minmax_scale_per_key

    tbl = pa.table({
        "id": pa.array(range(7), type=pa.int64()),
        "g": pa.array(["a", "a", "a", "b", "b", None, "a"]),
        "v": pa.array([10.0, 20.0, 30.0, 5.0, 5.0, 1.0, None])})
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = minmax_scale_per_key(ds, "g", "v", ["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == [0, 1, 2, 3, 4]
    assert list(out["scaled"][:3]) == [0.0, 0.5, 1.0]
    assert list(out["scaled"][3:5]) == [0.0, 0.0]  # constant group

    again = minmax_scale_per_key(ds.repartition(1), "g", "v", ["id"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_collapse_rare_frequent_gate(ray_session):
    """collapse_rare: values below min_count become the sentinel,
    frequent values pass through, nulls stay null;
    partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.repair import collapse_rare

    vals = ["big"] * 20 + ["mid"] * 5 + ["tiny", "tiny", None]
    tbl = pa.table({"id": pa.array(range(len(vals)), type=pa.int64()),
                    "c": pa.array(vals)})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = collapse_rare(ds, "id", "c", min_count=5).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert (out.loc[out["id"] < 20, "c"] == "big").all()
    assert (out.loc[(out["id"] >= 20) & (out["id"] < 25), "c"]
            == "mid").all()
    assert (out.loc[(out["id"] >= 25) & (out["id"] < 27), "c"]
            == "__other__").all()
    assert pd.isna(out["c"].iloc[27])
    assert out["was_collapsed"].sum() == 2

    again = collapse_rare(ds.repartition(2), "id", "c", min_count=5) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_pmi_pairs_positive_and_negative_association(ray_session):
    """pmi_pairs: items that always co-occur get positive PMI, items
    that never do are absent; independent-ish pairs near 0; exact
    count semantics; partition-invariant."""
    import math

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import pmi_pairs

    # 8 users: a+b always together (4 users), c alone (4 users)
    rows_k, rows_i = [], []
    for u in range(4):
        rows_k += [u, u]
        rows_i += ["a", "b"]
    for u in range(4, 8):
        rows_k.append(u)
        rows_i.append("c")
    ds = ray.data.from_arrow(pa.table(
        {"k": pa.array(rows_k, type=pa.int64()),
         "i": pa.array(rows_i)})).repartition(3)
    out = pmi_pairs(ds, "k", "i")
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["item_a"], r["item_b"]) == ("a", "b") and r["n_ab"] == 4
    # pmi = ln(4*8 / (4*4)) = ln 2
    assert abs(r["pmi"] - round(math.log(2.0), 6)) < 1e-12

    again = pmi_pairs(ds.repartition(1), "k", "i")
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  again.reset_index(drop=True))


def test_fd_violations_and_truncate_tokens(ray_session):
    """fd_violations: counts lhs values mapping to >1 distinct rhs,
    string-ordered examples; truncate_tokens: exact head-n tokens,
    pass-through below budget, nulls stay null."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import truncate_tokens
    from packs_ray.functions.validation import fd_violations

    tbl = pa.table({
        "a": pa.array([1, 1, 2, 2, 3, 10, None], type=pa.int64()),
        "b": pa.array(["x", "y", "z", "z", "w", "v", "q"])})
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = fd_violations(ds, "a", "b")
    r = out.iloc[0]
    # lhs 1 -> {x, y} violates; 2 -> {z}; 3 -> {w}; 10 -> {v}
    assert r["n_lhs_values"] == 4 and r["n_violating"] == 1
    assert r["violation_ratio"] == 0.25 and r["example_lhs"] == "1"
    pd.testing.assert_frame_equal(out, fd_violations(ds.repartition(1),
                                                     "a", "b"))

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["one two three four", "short", None])})
    t = truncate_tokens(ray.data.from_arrow(docs), "doc_id", "text", 2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert t["text_truncated"].iloc[0] == "one two"
    assert bool(t["truncated"].iloc[0]) and t["n_tokens"].iloc[0] == 2
    assert t["text_truncated"].iloc[1] == "short"
    assert not t["truncated"].iloc[1]
    assert t["text_truncated"].iloc[2] is None or pd.isna(
        t["text_truncated"].iloc[2])
    assert t["n_tokens"].iloc[2] == 0


def test_zipf_fit_recovers_power_law(ray_session):
    """zipf_fit: a corpus built with counts = C / rank recovers slope
    ≈ -1; partition-invariant; a near-empty corpus emits null slope."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import zipf_fit

    # token t{r} appears round(1000/r) times, r = 1..50
    words = []
    for r in range(1, 51):
        words += [f"t{r:03d}"] * round(1000 / r)
    rng = np.random.default_rng(3)
    rng.shuffle(words)
    docs = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)})) \
        .repartition(4)
    out = zipf_fit(ds, "text", k=50, min_count=1)
    assert out["n_tokens"].iloc[0] == 50
    assert abs(out["slope"].iloc[0] + 1.0) < 0.02

    again = zipf_fit(ds.repartition(2), "text", k=50, min_count=1)
    pd.testing.assert_frame_equal(out, again)

    tiny = ray.data.from_arrow(pa.table({"text": pa.array(["one"])}))
    t = zipf_fit(tiny, "text", k=50, min_count=1)
    assert t["n_tokens"].iloc[0] == 1 and pd.isna(t["slope"].iloc[0])


def test_pii_density_per_group(ray_session):
    """pii_density: rows with any PII pattern count once per row; null
    texts count in n_rows but never hit; null keys excluded;
    partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.pii import pii_density

    tbl = pa.table({
        "conv": pa.array(["a", "a", "a", "b", "b", None]),
        "text": pa.array(["mail me at bob@example.com",
                          "ip 10.1.2.3 and mail x@y.io",  # 1 row, 2 kinds
                          None,
                          "clean text here",
                          "ssn 123-45-6789",
                          "anything"])})
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = pii_density(ds, "conv", "text").to_pandas() \
        .sort_values("conv").reset_index(drop=True)
    assert list(out["conv"]) == ["a", "b"]
    a, b = out.iloc[0], out.iloc[1]
    assert a["n_rows"] == 3 and a["n_pii"] == 2
    assert abs(a["pii_ratio"] - round(2 / 3, 6)) < 1e-12
    assert b["n_rows"] == 2 and b["n_pii"] == 1 and b["pii_ratio"] == 0.5

    again = pii_density(ds.repartition(1), "conv", "text").to_pandas() \
        .sort_values("conv").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_iqr_outliers_per_key_group_relative(ray_session):
    """iqr_outliers_per_key: a value normal in one group is an outlier
    in another (fences are per-group); null rows excluded;
    partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.outliers import iqr_outliers_per_key

    # group A around 100 with one spike; group B around 10000 where
    # the SAME spike value (500) would be a LOW outlier
    rng = np.random.default_rng(5)
    va = np.r_[rng.uniform(90, 110, 200), [500.0]]
    vb = np.r_[rng.uniform(9000, 11000, 200), [500.0]]
    tbl = pa.table({
        "id": pa.array(np.arange(402), type=pa.int64()),
        "g": pa.array(["a"] * 201 + ["b"] * 201),
        "v": pa.array(np.r_[va, vb])})
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = iqr_outliers_per_key(ds, "g", "v", ["id"]).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert len(out) == 402
    assert bool(out.loc[out["id"] == 200, "is_outlier"].iloc[0])
    assert bool(out.loc[out["id"] == 401, "is_outlier"].iloc[0])
    # in-band rows aren't flagged (uniform data has no Tukey outliers)
    assert out.loc[(out["id"] < 200), "is_outlier"].sum() == 0

    again = iqr_outliers_per_key(ds.repartition(2), "g", "v", ["id"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_key_overlap_counts_and_ratios(ray_session):
    """key_overlap: exact distinct/intersection counts, jaccard and
    containments; duplicates within a side count once; null keys
    excluded; partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.integrity import key_overlap

    a = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 1, 2, 3, 4, None], type=pa.int64())})) \
        .repartition(3)
    b = ray.data.from_arrow(pa.table(
        {"k": pa.array([3, 4, 4, 5, None], type=pa.int64())})) \
        .repartition(2)
    out = key_overlap(a, b, "k")
    r = out.iloc[0]
    assert r["n_keys_a"] == 4 and r["n_keys_b"] == 3
    assert r["n_common"] == 2
    assert abs(r["jaccard"] - 2 / 5) < 1e-9
    assert r["containment_a"] == 0.5
    assert abs(r["containment_b"] - round(2 / 3, 6)) < 1e-12

    again = key_overlap(a.repartition(1), b.repartition(4), "k")
    pd.testing.assert_frame_equal(out, again)


def test_response_latency_role_boundaries(ray_session):
    """response_latency: only role turns directly after an OTHER-role
    turn count; consecutive assistant turns don't; conversations with
    no responses emit no row; exact us deltas; partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.stages.conversation import response_latency

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = lambda n: base + np.timedelta64(n, "s")
    tbl = pa.table({
        "conv_id": pa.array(["c1"] * 5 + ["c2"] * 2),
        "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1], type=pa.int32()),
        "role": pa.array(["user", "assistant", "assistant", "user",
                          "assistant", "assistant", "assistant"]),
        "ts": pa.array([s(0), s(3), s(5), s(10), s(17), s(0), s(1)],
                       type=pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = response_latency(ds).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    # c1: responses at turn 1 (3s) and turn 4 (7s); turn 2 follows an
    # assistant turn so it does NOT count.  c2 has no boundary at all
    # (its first turn has no predecessor).
    assert list(out["conv_id"]) == ["c1"]
    assert out["n_responses"].iloc[0] == 2
    assert out["max_latency_us"].iloc[0] == 7_000_000
    assert out["mean_latency_us"].iloc[0] == 5_000_000.0

    again = response_latency(ds.repartition(2)).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_dup_size_histogram_mixed_groups(ray_session):
    """dup_size_histogram: 10 singletons + 3 pairs + 1 group of 5 →
    {1: 10, 2: 3, 5: 1}; nulls form one group; int keys work;
    partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.duplicates import dup_size_histogram

    texts = [f"unique {i}" for i in range(10)] \
        + ["pair a"] * 2 + ["pair b"] * 2 + ["pair c"] * 2 \
        + ["five"] * 5 + [None] * 3
    ds = ray.data.from_arrow(pa.table({"t": pa.array(texts)})) \
        .repartition(4)
    out = dup_size_histogram(ds, ["t"]).to_pandas() \
        .sort_values("group_size").reset_index(drop=True)
    got = dict(zip(out["group_size"], out["n_groups"]))
    assert got == {1: 10, 2: 3, 3: 1, 5: 1}

    again = dup_size_histogram(ds.repartition(2), ["t"]).to_pandas() \
        .sort_values("group_size").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_missingness_phi_structured_vs_independent(ray_session):
    """missingness_phi: columns that go missing together score phi 1.0,
    complementary missing score -1.0, a never-null column emits null
    phi; exact joint counts; partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import missingness_phi

    n = 400
    together = np.arange(n) % 4 == 0
    a = np.where(together, None, 1.0)
    b = np.where(together, None, 2.0)   # identical mask -> phi 1
    c = np.where(together, 3.0, None)   # complement -> phi -1
    d = np.full(n, 4.0)                 # never null -> phi null
    tbl = pa.table({"a": pa.array(a, type=pa.float64()),
                    "b": pa.array(b, type=pa.float64()),
                    "c": pa.array(c, type=pa.float64()),
                    "d": pa.array(d, type=pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = missingness_phi(ds, ["a", "b", "c", "d"])
    r = {(x, y): p for x, y, p in
         zip(out["col_a"], out["col_b"], out["phi"])}
    assert r[("a", "b")] == 1.0
    assert r[("a", "c")] == -1.0
    assert pd.isna(r[("a", "d")])
    assert out["n"].iloc[0] == n and out["n_ab"].iloc[0] == 100

    again = missingness_phi(ds.repartition(2), ["a", "b", "c", "d"])
    pd.testing.assert_frame_equal(out, again)


def test_trend_per_key_exact_slope(ray_session):
    """trend_per_key: a perfectly linear series recovers its slope
    exactly (units/day), a constant series slopes 0, single-point and
    zero-time-variance keys emit null; partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import trend_per_key

    base = np.datetime64("2024-01-01T00:00:00", "us")
    minute = np.timedelta64(60, "s")
    # key a: +2.5 units per minute over 100 minutes -> 3600 units/day
    ts_a = base + np.arange(100) * minute
    v_a = 7.0 + 2.5 * np.arange(100)
    # key b: constant
    ts_b = base + np.arange(50) * minute
    v_b = np.full(50, 3.25)
    # key c: one point; key d: two points at the SAME minute
    tbl = pa.table({
        "k": pa.array(["a"] * 100 + ["b"] * 50 + ["c", "d", "d"]),
        "ts": pa.array(np.r_[ts_a, ts_b, [base, base, base]],
                       type=pa.timestamp("us")),
        "v": pa.array(np.r_[v_a, v_b, [1.0, 1.0, 2.0]])})
    ds = ray.data.from_arrow(tbl).repartition(6)
    out = trend_per_key(ds, "k", "ts", "v").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == ["a", "b", "c", "d"]
    assert abs(out["slope_per_day"].iloc[0] - 2.5 * 1440) < 1e-6
    assert out["slope_per_day"].iloc[1] == 0.0
    assert pd.isna(out["slope_per_day"].iloc[2])
    assert pd.isna(out["slope_per_day"].iloc[3])

    again = trend_per_key(ds.repartition(2), "k", "ts", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_ngram_novelty_shared_vs_unique(ray_session):
    """ngram_novelty: a doc duplicating another's text scores
    common_frac 1.0, a unique doc scores 0.0, partial overlap lands in
    between; short/null docs emit no row; partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.webquality import ngram_novelty

    shared = "the quick brown fox jumps over the lazy dog"
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": pa.array([shared, shared,
                          "completely novel words here never repeated",
                          shared + " with an extra unique tail clause",
                          "xy", None])})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = ngram_novelty(ds, "doc_id", "text", n=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 5 ("xy": < 3 words) and doc 6 (null) have no grams -> no row
    assert list(out["doc_id"]) == [1, 2, 3, 4]
    assert out["common_frac"].iloc[0] == 1.0
    assert out["common_frac"].iloc[1] == 1.0
    assert out["common_frac"].iloc[2] == 0.0
    assert 0.0 < out["common_frac"].iloc[3] < 1.0
    # doc 1: 7 distinct 3-grams of a 9-word sentence
    assert out["n_grams"].iloc[0] == 7

    again = ngram_novelty(ds.repartition(2), "doc_id", "text", n=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_grouped_sample_n_caps_and_determinism(ray_session):
    """grouped_sample_n: exactly min(n, group size) rows per key, the
    SAME ids under any partitioning (pure function of ids), keys with
    fewer than n rows keep them all, null keys/ids never sampled."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import grouped_sample_n

    k = np.r_[np.repeat(0, 500), np.repeat(1, 500), np.repeat(2, 3)]
    ids = np.arange(len(k))
    tbl = pa.table({"k": pa.array(k, type=pa.int64()),
                    "id": pa.array(ids, type=pa.int64())})
    ds = ray.data.from_arrow(tbl).repartition(9)
    out = grouped_sample_n(ds, "k", "id", 10).to_pandas() \
        .sort_values(["k", "id"]).reset_index(drop=True)
    sizes = out.groupby("k").size()
    assert sizes[0] == 10 and sizes[1] == 10 and sizes[2] == 3
    # the small group kept ALL its rows
    assert set(out[out["k"] == 2]["id"]) == {1000, 1001, 1002}

    again = grouped_sample_n(ds.repartition(2), "k", "id", 10) \
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)

    nulls = pa.table({"k": pa.array([None, 5], type=pa.int64()),
                      "id": pa.array([7, None], type=pa.int64())})
    empty = grouped_sample_n(ray.data.from_arrow(nulls), "k", "id", 10) \
        .to_pandas()
    assert len(empty) == 0


def test_key_skew_even_vs_hot_key(ray_session):
    """key_skew: an even distribution scores Gini ≈ 0 / low top1_share;
    one hot key owning 90% of rows scores high on both; values match
    the closed-form Gini; partition-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import key_skew

    even = ray.data.from_arrow(pa.table(
        {"k": pa.array(np.repeat(np.arange(100), 50))})).repartition(6)
    e = key_skew(even, "k")
    assert e["n_rows"].iloc[0] == 5000 and e["n_keys"].iloc[0] == 100
    assert e["gini"].iloc[0] == 0.0
    assert abs(e["top1_share"].iloc[0] - 0.01) < 1e-9

    hot = ray.data.from_arrow(pa.table(
        {"k": pa.array(np.r_[np.zeros(900, np.int64),
                             np.arange(1, 101)])})).repartition(6)
    h = key_skew(hot, "k")
    assert h["n_rows"].iloc[0] == 1000 and h["n_keys"].iloc[0] == 101
    assert h["max_count"].iloc[0] == 900
    assert h["top1_share"].iloc[0] == 0.9
    # closed form: counts = [1]*100 + [900], k=101, S=1000
    # S1 = sum(i*1 for i=1..100) + 101*900 = 5050 + 90900 = 95950
    exp = round(2.0 * 95950 / (101 * 1000) - 102.0 / 101, 6)
    assert abs(h["gini"].iloc[0] - exp) < 1e-9
    assert h["gini"].iloc[0] > 0.8

    again = key_skew(hot.repartition(2), "k")
    pd.testing.assert_frame_equal(h, again)


def test_target_encode_shrinkage(ray_session):
    """target_encode: a rare category shrinks toward the global mean, a
    frequent one stays near its own mean; exact m-estimate formula;
    partition-invariant; null rows excluded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import target_encode

    # frequent 'a' mean 10 (1000 rows), rare 'b' mean 1000 (2 rows)
    cat = ["a"] * 1000 + ["b", "b", None, "a"]
    val = [10.0] * 1000 + [1000.0, 1000.0, 5.0, None]
    ds = ray.data.from_arrow(pa.table({"c": cat, "v": val})).repartition(5)
    out = target_encode(ds, "c", "v", m=10.0).to_pandas() \
        .sort_values("c").reset_index(drop=True)

    gmean = (1000 * 10.0 + 2 * 1000.0) / 1002
    exp_a = (1000 * 10.0 + 10.0 * gmean) / (1000 + 10.0)
    exp_b = (2 * 1000.0 + 10.0 * gmean) / (2 + 10.0)
    assert list(out["c"]) == ["a", "b"]
    assert abs(out["encoded"].iloc[0] - exp_a) < 1e-6
    assert abs(out["encoded"].iloc[1] - exp_b) < 1e-6
    # shrinkage: 'b' lands far from its raw mean, toward the global
    assert out["encoded"].iloc[1] < 500.0
    assert out["n"].iloc[0] == 1000 and out["n"].iloc[1] == 2

    again = target_encode(ds.repartition(2), "c", "v", m=10.0) \
        .to_pandas().sort_values("c").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_rolling_psi_detects_shifted_period(ray_session):
    """rolling_psi: a period whose distribution is shifted far outside
    the others gets a large PSI and drifted=True; stable periods stay
    below threshold; result is partition-invariant; null ts/value rows
    are excluded from baseline and bins alike."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.drift import rolling_psi

    rng = np.random.default_rng(11)
    base = np.datetime64("2024-03-01T12:00:00", "us")
    day = np.timedelta64(86400, "s")
    ts, vals = [], []
    for d in range(4):
        v = rng.normal(100.0 if d != 2 else 100000.0, 5.0, 500)
        ts.append(np.full(500, base + d * day))
        vals.append(v)
    tbl = pa.table({"ts": pa.array(np.concatenate(ts),
                                   type=pa.timestamp("us")),
                    "value": pa.array(np.concatenate(vals))})
    # plant null rows: never counted anywhere
    nulls = pa.table({"ts": pa.array([None, base], type=pa.timestamp("us")),
                      "value": pa.array([1.0, None])})
    tbl = pa.concat_tables([tbl, nulls])
    ds = ray.data.from_arrow(tbl).repartition(7)

    out = rolling_psi(ds, "ts", "value", period="day")
    assert len(out) == 4 and out["n"].sum() == 2000
    # the shifted day dominates: every day drifts vs the pooled
    # baseline (its mass warps the bin range), but the shifted day's
    # PSI is far above the stable days'
    assert bool(out["drifted"].iloc[2])
    assert out["psi"].iloc[2] > 2 * out["psi"].iloc[0]

    again = rolling_psi(ds.repartition(2), "ts", "value", period="day")
    pd.testing.assert_frame_equal(out, again)


def test_column_pair_checks_nulls_and_ops(ray_session):
    """column_pair_percent: denominator counts rows where BOTH sides are
    present; each comparison op works; GE pair expectations map onto it
    (or_equal toggles >= vs >)."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.checks import (checks_from_expectations,
                                            run_checks)

    tbl = pa.table({
        "a": pa.array([3.0, 2.0, 1.0, None, 5.0], type=pa.float64()),
        "b": pa.array([1.0, 2.0, 4.0, 9.0, None], type=pa.float64())})
    ds = ray.data.from_arrow(tbl)
    out = run_checks(ds, [
        {"type": "column_pair_percent", "column": "a", "other": "b",
         "op": ">", "min_percent": 0.5},
        {"type": "column_pair_percent", "column": "a", "other": "b",
         "op": ">=", "min_percent": 0.5},
        {"type": "column_pair_percent", "column": "a", "other": "b",
         "op": "==", "min_percent": 0.5},
    ]).set_index("check_id")
    # 3 rows have both sides: (3,1) (2,2) (1,4)
    assert out.loc[0, "observed"] == round(1 / 3, 6)   # a > b
    assert not out.loc[0, "passed"]
    assert out.loc[1, "observed"] == round(2 / 3, 6)   # a >= b
    assert out.loc[1, "passed"]
    assert out.loc[2, "observed"] == round(1 / 3, 6)   # a == b

    suite = checks_from_expectations([
        {"expectation_type":
            "expect_column_pair_values_a_to_be_greater_than_b",
         "kwargs": {"column_A": "a", "column_B": "b", "or_equal": True,
                    "mostly": 0.6}}])
    assert suite == [{"type": "column_pair_percent", "column": "a",
                      "other": "b", "op": ">=", "min_percent": 0.6}]
    got = run_checks(ds, suite).set_index("check_id")
    assert got.loc[0, "passed"]


def test_categorical_drift_shift_and_identical(ray_session):
    """categorical_drift: near-zero PSI/chi2 on identically distributed
    sides, large on a shifted category mix; one-side-only categories
    contribute through the epsilon floor instead of vanishing."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.drift import categorical_drift

    rng = np.random.default_rng(11)
    cats = np.array(["a", "b", "c", "d"])
    mk = lambda p, n: ray.data.from_arrow(
        pa.table({"c": cats[rng.choice(4, n, p=p)]})).repartition(4)

    p0 = [0.4, 0.3, 0.2, 0.1]
    near = categorical_drift(mk(p0, 5000), mk(p0, 5000), "c")
    far = categorical_drift(mk(p0, 5000), mk([0.1, 0.2, 0.3, 0.4], 5000),
                            "c")
    assert near["psi"].iloc[0] < 0.02 and not near["drifted"].iloc[0]
    assert far["psi"].iloc[0] > 0.3 and far["drifted"].iloc[0]
    assert far["chi2"].iloc[0] > near["chi2"].iloc[0]
    assert 0.0 <= far["cramers_v"].iloc[0] <= 1.0

    # category present on one side only
    a = ray.data.from_arrow(pa.table({"c": ["x"] * 50 + ["y"] * 50}))
    b = ray.data.from_arrow(pa.table({"c": ["x"] * 100}))
    out = categorical_drift(a, b, "c")
    assert out["n_categories"].iloc[0] == 2
    assert np.isfinite(out["psi"].iloc[0]) and out["drifted"].iloc[0]


def test_benford_profile_digits_and_exclusions(ray_session):
    """benford_profile: first digits counted from exact cents, zeros
    and nulls excluded, negatives use |value|, expected column is the
    Benford law, proportions sum to ~1."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import benford_profile

    vals = [1.23, 19.99, 0.31, -9.5, 0.0, None, 0.004, 8.88]
    # cents: 123, 1999, 31, -950, 0(excl), null(excl), 0(round->excl), 888
    ds = ray.data.from_arrow(pa.table(
        {"x": pa.array(vals, type=pa.float64())})).repartition(3)
    out = benford_profile(ds, "x").set_index("digit")
    assert out.loc[1, "n"] == 2          # 123, 1999
    assert out.loc[3, "n"] == 1          # 31
    assert out.loc[9, "n"] == 1          # |-950|
    assert out.loc[8, "n"] == 1          # 888
    assert out["n"].sum() == 5
    assert abs(out["p_observed"].sum() - 1.0) < 1e-5
    assert abs(out["p_expected"].sum() - 1.0) < 1e-5
    assert out.loc[1, "p_expected"] == 0.30103


def test_correlation_matrix_known_values(ray_session):
    """correlation_matrix: matches numpy corrcoef on cents-quantized
    data, perfect +/-1 on linear columns, null on constant columns,
    pairwise-complete row selection."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import correlation_matrix

    rng = np.random.default_rng(5)
    x = np.round(rng.normal(50, 10, 4000), 2)
    noise = np.round(x * 2 + rng.normal(0, 5, 4000), 2)
    tbl = pa.table({
        "x": x, "lin": np.round(3.0 * x + 1.0, 2),
        "neg": np.round(-x, 2), "noisy": noise,
        "const": np.full(4000, 7.5),
    })
    cols = ["x", "lin", "neg", "noisy", "const"]
    out = correlation_matrix(
        ray.data.from_arrow(tbl).repartition(6), cols) \
        .set_index(["col_a", "col_b"])
    assert out.loc[("x", "lin"), "pearson"] == 1.0
    assert out.loc[("x", "neg"), "pearson"] == -1.0
    assert pd.isna(out.loc[("x", "const"), "pearson"])
    expect = np.corrcoef(np.rint(x * 100), np.rint(noise * 100))[0, 1]
    assert abs(out.loc[("x", "noisy"), "pearson"] - expect) < 1e-6

    # pairwise-complete: the null row drops from (a,b) but that pair
    # still correlates the remaining rows
    t2 = pa.table({"a": pa.array([1.0, 2.0, 3.0, None]),
                   "b": pa.array([2.0, 4.0, 6.0, 8.0]),
                   "c": pa.array([1.0, 1.0, 2.0, 2.0])})
    o2 = correlation_matrix(ray.data.from_arrow(t2), ["a", "b", "c"]) \
        .set_index(["col_a", "col_b"])
    assert o2.loc[("a", "b"), "n"] == 3
    assert o2.loc[("a", "b"), "pearson"] == 1.0
    assert o2.loc[("b", "c"), "n"] == 4


def test_cohort_retention_matrix(ray_session):
    """cohort_retention: users land in their first-activity period,
    each (cohort, offset) counts a user once regardless of event count,
    nulls excluded, invariant under repartitioning."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import cohort_retention

    W = 7 * 24 * 3600
    epoch = dt.datetime(1970, 1, 1)
    t = lambda wk, s=0: epoch + dt.timedelta(seconds=wk * W + s)
    rows = [
        (1, t(100)), (1, t(100, 5)), (1, t(101)),   # cohort 100, wk 0+1
        (2, t(100, 9)), (2, t(102)),                # cohort 100, wk 0+2
        (3, t(101)),                                # cohort 101, wk 0
        (None, t(100)), (4, None),                  # excluded
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us"))})
    out = cohort_retention(ray.data.from_arrow(tbl).repartition(3),
                           "user_id", "ts").to_pandas() \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "cohort_week": [100, 100, 100, 101],
        "week_offset": [0, 1, 2, 0],
        "n_users": [2, 1, 1, 1]})
    pd.testing.assert_frame_equal(
        out.astype({"cohort_week": "int64", "week_offset": "int64",
                    "n_users": "int64"}), exp)


def test_funnel_counts_ordering_semantics(ray_session):
    """funnel_counts: conversion requires steps in timestamp order
    (greedy minimal chain, inclusive ties); out-of-order users count
    only for the prefix they completed; monotone non-increasing."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import funnel_counts

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: full funnel in order
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # u2: click BEFORE the first view, never re-clicks -> view only
        (2, "click", t(0)), (2, "view", t(1)),
        # u3: view+click, purchase before click -> stops at click
        (3, "purchase", t(0)), (3, "view", t(1)), (3, "click", t(2)),
        # u4: simultaneous view/click (inclusive tie) then purchase
        (4, "view", t(5)), (4, "click", t(5)), (4, "purchase", t(6)),
        # u5: purchase only -> counts nowhere
        (5, "purchase", t(0)),
    ]
    tbl = pa.table({
        "u": pa.array([r[0] for r in rows], type=pa.int64()),
        "et": pa.array([r[1] for r in rows], type=pa.string()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us"))})
    out = funnel_counts(ray.data.from_arrow(tbl).repartition(3),
                        "u", "et", "ts", ["view", "click", "purchase"]) \
        .set_index("step")
    assert out.loc["view", "n_users"] == 4       # u1 u2 u3 u4
    assert out.loc["click", "n_users"] == 3      # u1 u3 u4
    assert out.loc["purchase", "n_users"] == 2   # u1 u4


def test_value_counts_catalog_topk_and_ties(ray_session):
    """value_counts_catalog: per-column top-k by (n desc, value asc),
    nulls excluded, p sums to <=1, int columns cataloged as strings."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import value_counts_catalog

    tbl = pa.table({
        "s": pa.array(["b"] * 3 + ["a"] * 3 + ["c"] * 2 + [None, None],
                      type=pa.string()),
        "i": pa.array([7] * 5 + [9] * 3 + [None, None], type=pa.int64())})
    out = value_counts_catalog(
        ray.data.from_arrow(tbl).repartition(3), ["s", "i"], k=2) \
        .to_pandas().sort_values(["column", "value"]).reset_index(drop=True)
    s = out[out["column"] == "s"]
    # tie between a(3) and b(3) -> value-asc keeps a then b, c dropped
    assert list(s["value"]) == ["a", "b"]
    assert list(s["n"]) == [3, 3]
    assert s["p"].iloc[0] == round(3 / 8, 6)
    i = out[out["column"] == "i"]
    assert list(i["value"]) == ["7", "9"]
    assert list(i["n"]) == [5, 3]


def test_ge_negate_lengths_equal_and_null_percent(ray_session):
    """New GE mappings: not_match_regex (negated search), value lengths
    to EQUAL, values_to_be_null fraction."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.checks import (checks_from_expectations,
                                            run_checks)

    tbl = pa.table({
        "t": pa.array(["abc", "a12", "xyz", None], type=pa.string()),
        "v": pa.array([None, None, None, 5.0], type=pa.float64())})
    suite = checks_from_expectations([
        {"expectation_type": "expect_column_values_to_not_match_regex",
         "kwargs": {"column": "t", "regex": "[0-9]", "mostly": 0.6}},
        {"expectation_type": "expect_column_value_lengths_to_equal",
         "kwargs": {"column": "t", "value": 3}},
        {"expectation_type": "expect_column_values_to_be_null",
         "kwargs": {"column": "v", "mostly": 0.7}},
    ])
    out = run_checks(ray.data.from_arrow(tbl), suite).set_index("check_id")
    # 2 of 3 non-null t values lack digits
    assert out.loc[0, "observed"] == round(2 / 3, 6)
    assert out.loc[0, "passed"]
    assert out.loc[1, "observed"] == 1.0 and out.loc[1, "passed"]
    assert out.loc[2, "observed"] == 0.75 and out.loc[2, "passed"]


def test_funnel_and_cohort_hot_user_skew(ray_session):
    """Skew stress: one mega-user with 60k events (every other user
    tiny) — both event ops stay correct; the hot key cannot split
    across buckets (single-bucket-per-user contract)."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import cohort_retention, funnel_counts

    n_hot = 60_000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    hot_ts = base + (np.arange(n_hot) * 1_000_000).astype("timedelta64[us]")
    hot_types = np.where(np.arange(n_hot) % 3 == 0, "view",
                         np.where(np.arange(n_hot) % 3 == 1, "click",
                                  "purchase"))
    cold_ts = base + (np.arange(50) * 86_400_000_000) \
        .astype("timedelta64[us]")
    tbl = pa.table({
        "u": pa.array(np.concatenate([np.full(n_hot, 1),
                                      np.arange(2, 52)]), type=pa.int64()),
        "et": pa.array(list(hot_types) + ["view"] * 50, type=pa.string()),
        "ts": pa.array(np.concatenate([hot_ts, cold_ts]),
                       type=pa.timestamp("us"))})
    ds = ray.data.from_arrow(tbl).repartition(16)

    fun = funnel_counts(ds, "u", "et", "ts",
                        ["view", "click", "purchase"]).set_index("step")
    # hot user converts fully; 50 cold users stop at view
    assert fun.loc["view", "n_users"] == 51
    assert fun.loc["click", "n_users"] == 1
    assert fun.loc["purchase", "n_users"] == 1

    coh = cohort_retention(ds, "u", "ts").to_pandas()
    # hot user: weeks 2817..2816+ceil; every user appears exactly once
    # per (cohort, offset); totals = sum of distinct user-weeks
    assert int(coh["n_users"].sum()) == len(
        {(1, int(t.astype("int64") // (604800 * 1_000_000)))
         for t in hot_ts}
        | {(int(u), int(t.astype("int64") // (604800 * 1_000_000)))
           for u, t in zip(range(2, 52), cold_ts)})


def test_jsonl_roundtrip_write_read(ray_session, tmp_path):
    """write_jsonl -> read_jsonl_sized round-trips rows, types and
    nulls (JSON null), and reads a multi-file directory in parallel."""
    import pyarrow as pa
    import ray.data

    from packs_ray.sources.jsonl import read_jsonl_sized, write_jsonl

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "txt": pa.array(["a", None, "c", 'quo"te\nline'],
                        type=pa.string()),
        "v": pa.array([1.5, None, -2.25, 0.0], type=pa.float64())})
    out = str(tmp_path / "jl")
    write_jsonl(ray.data.from_arrow(tbl).repartition(2), out)
    back = read_jsonl_sized(out).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    exp = tbl.to_pandas().sort_values("id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(back[["id", "txt", "v"]], exp)


def test_bm25_topk_scores_and_edges(ray_session):
    """bm25_topk ranks the doc saturated with the query term first,
    matches a hand-computed score, ignores empty/null docs, and returns
    empty frames for an empty query."""
    import math

    import pyarrow as pa
    import ray.data

    from packs_ray.functions.search import bm25_topk

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array(["spark spark spark", "spark row", "row row",
                          None, "   "], type=pa.string())})
    ds = ray.data.from_arrow(tbl)
    out = bm25_topk(ds, "id", "text", "spark", k=10)
    assert out["id"].tolist() == [1, 2]          # only matching docs
    # hand-computed: N=5, dl=[3,2,2,0,0], avgdl=7/5, df(spark)=2
    idf = math.log(1 + (5 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def score(tf, dl):
        norm = (1 - b) + b * (dl / (7 / 5))
        return idf * ((tf * (k1 + 1)) / (tf + k1 * norm))

    assert abs(out["bm25"].iloc[0] - round(score(3, 3), 6)) < 1e-9
    assert abs(out["bm25"].iloc[1] - round(score(1, 2), 6)) < 1e-9

    empty = bm25_topk(ds, "id", "text", "   ", k=5)
    assert empty.empty and list(empty.columns) == ["id", "bm25"]

    # ties (identical docs) break by ascending id, k truncates
    tie = pa.table({"id": pa.array([9, 7, 8], type=pa.int64()),
                    "text": pa.array(["x y", "x y", "x y"])})
    t = bm25_topk(ray.data.from_arrow(tie), "id", "text", "x", k=2)
    assert t["id"].tolist() == [7, 8]


def test_fuzzy_join_exact_vs_bruteforce(ray_session):
    """fuzzy_join (prefix-filtered, distributed) equals the brute-force
    all-pairs gram Jaccard on a small dirty-names fixture, including
    threshold boundary and null handling."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.linkage import fuzzy_join
    from packs_ray.functions.neardup import _shingle_hashes

    left = pa.table({"lid": pa.array([0, 1, 2, 3], type=pa.int64()),
                     "lname": pa.array(["acme corp", "globex inc",
                                        "initech llc", None])})
    right = pa.table({"rid": pa.array([0, 1, 2], type=pa.int64()),
                      "rname": pa.array(["acme corp.", "globex, inc",
                                         "umbrella co"])})
    out = fuzzy_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                     left_id="lid", left_text="lname",
                     right_id="rid", right_text="rname",
                     threshold=0.5, gram=3).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(out["lid"], out["rid"], out["jaccard"])}

    import numpy as np
    exp = {}
    for li, lt in enumerate(left.column("lname").to_pylist()):
        if lt is None:
            continue
        A = _shingle_hashes(lt, 3)
        for ri, rt in enumerate(right.column("rname").to_pylist()):
            B = _shingle_hashes(rt, 3)
            inter = len(np.intersect1d(A, B, assume_unique=True))
            jac = inter / (len(A) + len(B) - inter)
            if jac >= 0.5:
                exp[(li, ri)] = round(jac, 4)
    assert got == exp and len(exp) >= 2       # acme & globex both link


def test_dedup_latest_recency_and_nulls(ray_session):
    """dedup_latest keeps max-ts per key (ties -> min id); null ts loses
    to any real ts; a null key forms its own group."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.duplicates import dedup_latest

    ts = pd.to_datetime(["2026-01-02", "2026-01-03", "2026-01-03",
                         None, "2026-01-01", None]).astype("datetime64[us]")
    tbl = pa.table({"k": pa.array([1, 1, 1, 2, 2, None],
                                  type=pa.int64()),
                    "ts": pa.array(ts),
                    "id": pa.array([10, 12, 11, 20, 21, 30],
                                   type=pa.int64())})
    out = (dedup_latest(ray.data.from_arrow(tbl), ["k"], "ts", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    # k=1: two rows tie at 01-03 -> min id 11; k=2: null ts loses -> 21
    assert out["id"].tolist() == [11, 21, 30]
    assert out["k"].dtype == "int64" or out["k"].isna().any()


def test_cube_counts_lattice(ray_session):
    """cube_counts emits every subset level with typed nulls and counts
    that reconcile across the lattice (including null key values)."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import cube_counts

    tbl = pa.table({"a": pa.array(["x", "x", "y", None], type=pa.string()),
                    "b": pa.array([1, 2, 1, 1], type=pa.int64())})
    out = cube_counts(ray.data.from_arrow(tbl), ["a", "b"]).to_pandas()
    assert len(out) == 4 + 3 + 2 + 1           # ab, a, b, total
    assert out["b"].dtype == "float64" or str(out["b"].dtype) == "Int64" \
        or out["b"].isna().any()               # typed nulls survive union
    total = out[out["a"].isna() & out["b"].isna()]
    # the ({}, {a}) and ({}, {b}) marginals each sum to 4; grand total
    # row(s): one pure-total row plus the a=None finest rows share the
    # null pattern, so reconcile by sums instead of row identity
    assert int(out["cnt"].sum()) == 4 * 4      # each of 4 rows counted at 4 levels
    assert int(total["cnt"].sum()) >= 4

    import pytest

    with pytest.raises(ValueError):
        cube_counts(ray.data.from_arrow(tbl), ["a", "b", "a", "b", "a"])


def test_melt_roundtrip_nulls(ray_session):
    """melt emits one long row per (row, value col), keeps nulls, and
    preserves id dtypes."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import melt

    tbl = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                    "a": pa.array([1.5, None], type=pa.float64()),
                    "b": pa.array([10, 20], type=pa.int64())})
    out = (melt(ray.data.from_arrow(tbl), ["id"], ["a", "b"])
           .to_pandas().sort_values(["variable", "id"])
           .reset_index(drop=True))
    assert len(out) == 4
    assert out["value"].tolist()[0] == 1.5
    assert out["value"].isna().tolist() == [False, True, False, False]
    assert out["value"].tolist()[2:] == [10.0, 20.0]
    assert out["id"].dtype == "int64"


def test_grouped_stats_null_handling(ray_session):
    """grouped_stats: exact per-key stats; null values drop; all-null
    keys vanish; n==1 group has null std; null key groups together."""
    import math

    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import grouped_stats

    tbl = pa.table({
        "k": pa.array(["a", "a", "b", "c", None, None],
                      type=pa.string()),
        "v": pa.array([1.0, 3.0, 5.0, None, 2.0, 4.0],
                      type=pa.float64())})
    out = (grouped_stats(ray.data.from_arrow(tbl), "k", "v")
           .to_pandas().sort_values("k", na_position="last")
           .reset_index(drop=True))
    assert out["k"].tolist()[:2] == ["a", "b"] and pd_isna(out["k"][2])
    assert out["n"].tolist() == [2, 1, 2]
    assert out["mean"].tolist() == [2.0, 5.0, 3.0]
    assert math.isnan(out["std_samp"][1])        # n == 1
    assert round(out["std_samp"][0], 6) == round((2.0) ** 0.5, 6)
    assert out["min_v"].tolist() == [1.0, 5.0, 2.0]
    assert out["max_v"].tolist() == [3.0, 5.0, 4.0]


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_orc_roundtrip_write_read(ray_session, tmp_path):
    """write_orc -> read_orc_sized round-trips rows, types and nulls,
    one file per block, stripe-parallel read with column pruning."""
    import pyarrow as pa
    import pyarrow.orc as paorc
    import ray.data

    from packs_ray.sources.orc import read_orc_sized, write_orc

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "txt": pa.array(["a", None, "c", "d"], type=pa.string()),
        "v": pa.array([1.5, None, -2.25, 0.0], type=pa.float64())})
    out = str(tmp_path / "orc")
    paths = write_orc(ray.data.from_arrow(tbl).repartition(2), out)
    assert len(paths) == 2 and all(p.endswith(".orc") for p in paths)
    back = read_orc_sized(out).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(back[["id", "txt", "v"]],
                                  tbl.to_pandas())
    pruned = read_orc_sized(out, columns=["id"]).to_pandas()
    assert list(pruned.columns) == ["id"] and len(pruned) == 4

    # multi-stripe file splits into multiple read tasks
    big = pa.table({"id": pa.array(range(20_000), type=pa.int64()),
                    "v": pa.array([0.5] * 20_000, type=pa.float64())})
    p = str(tmp_path / "big.orc")
    paorc.write_table(big, p, stripe_size=4096)
    ds = read_orc_sized(p, stripes_per_block=2)
    assert ds.count() == 20_000


def test_temperature_sample_budgets_and_determinism(ray_session):
    """alpha<1 flattens the mixture (tail groups overrepresented vs
    proportional); budgets never exceed group sizes; two runs agree."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import (temperature_budgets,
                                              temperature_sample)

    b = temperature_budgets({"big": 900, "small": 100}, 0.5, 100)
    # sqrt weights: 30 vs 10 -> 75/25 split instead of 90/10
    assert b == {"big": 75, "small": 25}
    assert temperature_budgets({"a": 3}, 0.5, 100) == {"a": 3}  # capped

    tbl = pa.table({
        "id": pa.array(range(200), type=pa.int64()),
        "g": pa.array(["big"] * 180 + ["small"] * 20,
                      type=pa.string())})
    ds = ray.data.from_arrow(tbl)
    s1 = (temperature_sample(ds, "g", "id", alpha=0.5, total_n=50)
          .to_pandas().sort_values("id").reset_index(drop=True))
    s2 = (temperature_sample(ds.repartition(5), "g", "id", alpha=0.5,
                             total_n=50)
          .to_pandas().sort_values("id").reset_index(drop=True))
    assert s1.equals(s2)                      # partition-invariant
    vc = s1["g"].value_counts()
    exp = temperature_budgets({"big": 180, "small": 20}, 0.5, 50)
    assert vc["big"] == exp["big"] and vc["small"] == exp["small"]
    assert vc["small"] / len(s1) > 20 / 200   # tail upsampled


def test_quantize_embeddings_int8(ray_session):
    """int8 quantization: values in [-127,127], scale restores the max
    component exactly, zero vectors quantize to zeros with scale 0,
    reconstruction stays close."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.similarity import quantize_embeddings

    vecs = [[0.5, -1.0, 0.25, 0.0], [0.0, 0.0, 0.0, 0.0],
            [2.0, 2.0, 2.0, 2.0]]
    tbl = pa.table({"vec_id": pa.array([1, 2, 3], type=pa.int64()),
                    "embedding": pa.array(vecs,
                                          type=pa.list_(pa.float32()))})
    out = (quantize_embeddings(ray.data.from_arrow(tbl), "vec_id",
                               "embedding")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    q1 = [int(x) for x in out["q8"][0].split(",")]
    assert q1 == [64, -127, 32, 0]            # 0.5/ (1/127) = 63.5 -> 64
    assert abs(out["scale"][0] - 1.0 / 127) < 1e-12
    assert out["q8"][1] == "0,0,0,0" and out["scale"][1] == 0.0
    assert out["q8"][2] == "127,127,127,127"
    assert (out["mse"] >= 0).all() and out["mse"][1] == 0.0
    recon = np.array(q1) * out["scale"][0]
    assert np.allclose(recon, vecs[0], atol=out["scale"][0] / 2 + 1e-12)


def test_explode_null_and_empty_lists(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import explode

    t = pa.table({"id": [1, 2, 3, 4],
                  "xs": pa.array([[10, 20], [], None, [30]],
                                 type=pa.list_(pa.int64()))})
    out = (explode(ray.data.from_arrow(t), "xs", ["id"])
           .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True))
    assert out["id"].tolist() == [1, 1, 4]
    assert out["pos"].tolist() == [0, 1, 0]
    assert out["value"].tolist() == [10, 20, 30]


def test_collect_strings_order_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import collect_strings

    t = pa.table({"k": [1, 1, 1, 2, 2, 3],
                  "o": [3, 1, 2, 2, 1, 1],
                  "v": ["c", "a", None, "y", "x", None]})
    out = (collect_strings(ray.data.from_arrow(t), "k", "v", ["o"],
                           sep="|")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["collected"].tolist()[:2] == ["a|c", "x|y"]
    assert out["collected"].isna().tolist() == [False, False, True]
    assert out["n_values"].tolist() == [2, 2, 0]


def test_impute_mode_and_constant(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.repair import impute

    t = pa.table({"c": ["b", "a", "b", None, "a", None, "b"]})
    out = impute(ray.data.from_arrow(t), "c",
                 strategy="mode").to_pandas()
    assert out["c_filled"].tolist() == ["b", "a", "b", "b", "a", "b", "b"]
    t2 = pa.table({"x": pa.array([1.5, None, 2.5], type=pa.float64())})
    out2 = impute(ray.data.from_arrow(t2), "x", strategy="constant",
                  constant=0.0).to_pandas()
    assert out2["x_filled"].tolist() == [1.5, 0.0, 2.5]


def test_impute_mode_tie_breaks_smallest(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.repair import impute

    t = pa.table({"c": ["z", "a", None]})
    out = impute(ray.data.from_arrow(t), "c", strategy="mode").to_pandas()
    assert out["c_filled"].tolist() == ["z", "a", "a"]


def test_ipc_roundtrip_write_read(ray_session, tmp_path):
    """write_ipc -> read_ipc_sized round-trips rows, types and nulls,
    one Feather file per block, batch-range-parallel read with column
    pruning."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.sources.ipc import read_ipc_sized, write_ipc

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "txt": pa.array(["a", None, "c", "d"], type=pa.string()),
        "ts": pa.array([pd.Timestamp("2026-01-01"), None,
                        pd.Timestamp("2026-03-05"),
                        pd.Timestamp("2026-07-09")],
                       type=pa.timestamp("us")),
        "v": pa.array([1.5, None, -2.25, 0.0], type=pa.float64())})
    out = str(tmp_path / "ipc")
    paths = write_ipc(ray.data.from_arrow(tbl).repartition(2), out)
    assert len(paths) == 2 and all(p.endswith(".arrow") for p in paths)
    back = read_ipc_sized(out).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["id", "txt", "ts", "v"]],
                                  tbl.to_pandas())
    pruned = read_ipc_sized(out, columns=["id"]).to_pandas()
    assert list(pruned.columns) == ["id"] and len(pruned) == 4

    # multi-batch file splits into multiple read tasks
    big = pa.table({"id": pa.array(range(20_000), type=pa.int64())})
    p = str(tmp_path / "big.arrow")
    with pa.OSFile(p, "wb") as sink:
        with pa.ipc.new_file(sink, big.schema) as w:
            for b in big.to_batches(max_chunksize=512):
                w.write_batch(b)
    ds = read_ipc_sized(p, batches_per_block=4)
    assert ds.count() == 20_000


def test_keyed_ntile_matches_sql_semantics(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import keyed_ntile

    rows = []
    # keys with 1..7 rows to hit every c%n / c<n branch at n=3
    rid = 0
    for k, c in [("a", 1), ("b", 2), ("c", 3), ("d", 5), ("e", 7)]:
        for i in range(c):
            rows.append({"k": k, "o": rid})
            rid += 1
    rows.append({"k": None, "o": 999})       # dropped by convention
    t = pa.Table.from_pylist(rows)
    got = (keyed_ntile(ray.data.from_arrow(t), "k", ["o"], 3)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, o, CAST(ntile(3) OVER w AS BIGINT) AS tile,
               CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank
        FROM t WHERE k IS NOT NULL
        WINDOW w AS (PARTITION BY k ORDER BY o) ORDER BY k, o
    """).df().reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, exp)


def test_build_vocab_ranking_and_min_count(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import build_vocab

    rows = [{"text": "b b b a a c"}, {"text": "a  b"}, {"text": None},
            {"text": "  "}, {"text": "c"}]
    v = build_vocab(ray.data.from_arrow(pa.Table.from_pylist(rows)),
                    "text", min_count=2, k=2)
    # counts: a=3, b=4, c=2 -> top2 = b(4), a(3)
    assert v["token"].tolist() == ["b", "a"]
    assert v["cnt"].tolist() == [4, 3]
    assert v["token_id"].tolist() == [1, 2]


def test_char_entropy_unicode_and_empty(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import char_entropy

    rows = [{"doc_id": 0, "text": "aabb"}, {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": None}, {"doc_id": 3, "text": "☃☃аz"}]
    out = (char_entropy(ray.data.from_arrow(pa.Table.from_pylist(rows)),
                        "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 3]      # empty/null emit no row
    assert out["n_chars"].tolist() == [4, 4]
    assert out["n_distinct"].tolist() == [2, 3]
    assert out["entropy"][0] == 1.0              # two equally likely chars
    exp = round(-(0.5 * math.log2(0.5)) + -(0.25 * math.log2(0.25)) * 2, 6)
    assert abs(out["entropy"][1] - exp) < 1e-9


def test_snapshot_diff_statuses(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.drift import snapshot_diff

    old = pa.table({"k": [1, 2, 3, 4], "v": [1.0, 2.0, None, 4.0],
                    "s": ["a", "b", "c", "d"]})
    new = pa.table({"k": [2, 3, 4, 5], "v": [2.5, None, 4.0, 5.0],
                    "s": ["b", "c", "x", "e"]})
    out = (snapshot_diff(ray.data.from_arrow(old),
                         ray.data.from_arrow(new), ["k"], ["v", "s"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3, 4, 5]
    # 3: null v == null v AND s equal -> unchanged; 4: s differs
    assert out["status"].tolist() == [
        "removed", "changed", "unchanged", "changed", "added"]


def test_multi_window_matches_single(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import (keyed_multi_window_agg,
                                             keyed_time_window_agg)

    rows = []
    for u in range(3):
        for i in range(40):
            rows.append({"u": u, "ts": pd.Timestamp("2026-01-01")
                         + pd.Timedelta(seconds=i * 700 * (u + 1)),
                         "v": float(i % 7) - 2.0})
    t = pa.Table.from_pylist(rows)
    multi = (keyed_multi_window_agg(ray.data.from_arrow(t), "u", "ts",
                                    "v", [3600, 86400])
             .to_pandas().sort_values(["u", "ts", "cents"])
             .reset_index(drop=True))
    for w in (3600, 86400):
        single = (keyed_time_window_agg(ray.data.from_arrow(t), "u",
                                        "ts", "v", w)
                  .to_pandas().sort_values(["u", "ts", "cents"])
                  .reset_index(drop=True))
        assert multi[f"n_{w}s"].tolist() == single["n_window"].tolist()
        assert (multi[f"sum_cents_{w}s"].tolist()
                == single["sum_cents_window"].tolist())


def test_grouped_correlation_matches_duckdb_with_nulls(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import grouped_correlation

    rng = np.random.RandomState(7)
    n = 500
    g = rng.choice(["a", "b", "c"], n).astype(object)
    x = np.round(rng.uniform(0, 100, n), 2)
    y = np.round(x * 2 + rng.normal(0, 5, n), 2)
    x[rng.rand(n) < 0.1] = np.nan
    y[rng.rand(n) < 0.1] = np.nan
    g[rng.rand(n) < 0.05] = None
    # one group whose every pair has a null side -> absent from output
    g2 = np.append(g, ["only_null"] * 3)
    x2 = np.append(x, [1.0, np.nan, 2.0])
    y2 = np.append(y, [np.nan, 5.0, np.nan])
    t = pa.table({"g": pa.array(g2),
                  "x": pa.array(x2, from_pandas=True),
                  "y": pa.array(y2, from_pandas=True)})
    got = (grouped_correlation(ray.data.from_arrow(t), "g", "x", "y")
           .to_pandas().sort_values("g", na_position="last")
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT g, n::BIGINT AS n,
            CASE WHEN n >= 2 AND (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
                 THEN round(CAST(n*sxy - sx*sy AS DOUBLE)
                      / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                             * CAST(n*syy - sy*sy AS DOUBLE)), 6)
            END AS pearson
        FROM (SELECT g, count(*)::HUGEINT AS n, sum(cx) AS sx, sum(cy) AS sy,
                     sum(cx*cx) AS sxx, sum(cy*cy) AS syy, sum(cx*cy) AS sxy
              FROM (SELECT g, CAST(round(x*100,0) AS HUGEINT) AS cx,
                           CAST(round(y*100,0) AS HUGEINT) AS cy
                    FROM t WHERE x IS NOT NULL AND y IS NOT NULL) v
              GROUP BY g) s
        ORDER BY g NULLS LAST
    """).df().reset_index(drop=True)
    assert "only_null" not in set(got["g"].dropna())
    import pandas as pd
    pd.testing.assert_frame_equal(got, exp)


def test_cooccurrence_pairs_basic(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import cooccurrence_pairs

    rows = [{"u": 1, "t": "a"}, {"u": 1, "t": "b"}, {"u": 1, "t": "a"},
            {"u": 2, "t": "a"}, {"u": 2, "t": "b"}, {"u": 2, "t": "c"},
            {"u": 3, "t": "b"}, {"u": None, "t": "a"},
            {"u": 4, "t": None}]
    out = (cooccurrence_pairs(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), "u", "t")
        .to_pandas().sort_values(["item_a", "item_b"])
        .reset_index(drop=True))
    got = list(zip(out["item_a"], out["item_b"], out["n_keys"]))
    assert got == [("a", "b", 2), ("a", "c", 1), ("b", "c", 1)]


def test_json_extract_types_and_errors(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.json_ops import json_extract

    rows = [{"id": 0, "j": '{"k": 1, "s": "x", "b": true, "f": 2.5}'},
            {"id": 1, "j": '{"k": "not int", "nested": {"d": 7}}'},
            {"id": 2, "j": "not json"},
            {"id": 3, "j": None},
            {"id": 4, "j": '{"k": 3.0}'}]
    out = (json_extract(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), "j",
        {"k": ("k", "int64"), "s": ("s", "string"),
         "b": ("b", "bool"), "f": ("f", "float64"),
         "d": ("nested.d", "int64")}, keep_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["k"].tolist()[0] == 1
    assert out["k"].isna().tolist() == [False, True, True, True, False]
    assert out["k"].tolist()[4] == 3          # 3.0 is integral
    assert out["s"][0] == "x" and out["b"][0] == True  # noqa: E712
    assert out["f"][0] == 2.5 and out["d"][1] == 7


def test_transition_counts_order_and_nulls(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import transition_counts

    base = pd.Timestamp("2026-01-01")
    rows = [
        {"u": 1, "ts": base, "i": 1, "t": "a"},
        {"u": 1, "ts": base + pd.Timedelta(seconds=1), "i": 2, "t": "b"},
        {"u": 1, "ts": base + pd.Timedelta(seconds=2), "i": 3, "t": "a"},
        {"u": 2, "ts": base, "i": 4, "t": "a"},
        {"u": 2, "ts": base + pd.Timedelta(seconds=5), "i": 5, "t": "b"},
        {"u": 3, "ts": base, "i": 6, "t": "c"},      # singleton: no pair
        {"u": None, "ts": base, "i": 7, "t": "a"},
        {"u": 4, "ts": None, "i": 8, "t": "a"},
    ]
    out = (transition_counts(
        ray.data.from_arrow(pa.Table.from_pylist(rows)), "u", "t",
        ["ts", "i"])
        .to_pandas().sort_values(["from_type", "to_type"])
        .reset_index(drop=True))
    got = list(zip(out["from_type"], out["to_type"], out["n"]))
    assert got == [("a", "b", 2), ("b", "a", 1)]


def test_global_rank_ties_across_buckets(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import global_rank

    # heavy tie groups + a null, forced into many buckets so tie groups
    # must not straddle a range-bucket boundary
    vals = [1.0, 1.0, 1.0, 2.5, 2.5, 7.0, 7.0, 7.0, 7.0, 9.0, None, 3.0]
    t = pa.table({"i": list(range(len(vals))), "v": vals})
    got = (global_rank(ray.data.from_arrow(t), ["i"], "v", num_buckets=5)
           .to_pandas().sort_values("i").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT i, v, rank() OVER (ORDER BY v)::BIGINT AS rnk,
               percent_rank() OVER (ORDER BY v)::DOUBLE AS pct_rank
        FROM t WHERE v IS NOT NULL ORDER BY i
    """).df().reset_index(drop=True)
    got["i"] = got["i"].astype(exp["i"].dtype)
    pd.testing.assert_frame_equal(got, exp)


def test_global_rank_constant_column(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import global_rank

    t = pa.table({"i": [0, 1, 2], "v": [4.0, 4.0, 4.0]})
    got = (global_rank(ray.data.from_arrow(t), ["i"], "v", num_buckets=3)
           .to_pandas())
    assert sorted(got["rnk"]) == [1, 1, 1]
    assert set(got["pct_rank"]) == {0.0}


def test_try_cast_int64_and_date_semantics(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.repair import try_cast_columns

    t = pa.table({
        "si": ["42", " 7 ", "1.5", "abc", "", None, "9007199254740993"],
        "sd": ["2024-02-29", "2023-02-29", "2024-13-01", "x", None,
               "2020-01-01", ""],
    })
    out = try_cast_columns(
        ray.data.from_arrow(t), {"si": "int64", "sd": "date"}).to_pandas()
    # strict int: decimals fail (no DuckDB-style rounding); > 2^53 fails
    assert out["si_cast"].tolist()[:2] == [42, 7]
    assert out["si_cast"].isna().tolist() == [
        False, False, True, True, True, True, True]
    assert out["si_cast_failed"].tolist() == [
        False, False, True, True, True, False, True]
    # date: impossible calendar dates fail, leap day parses
    ok = out["sd_cast"].notna().tolist()
    assert ok == [True, False, False, False, False, True, False]
    assert out["sd_cast_failed"].tolist() == [
        False, True, True, True, False, False, True]


def test_encoding_anomalies_counts(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.webquality import encoding_anomalies

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["clean text",
                           "bad �� and \x85",
                           "mojibake Ã© â€™",
                           None]})
    out = (encoding_anomalies(ray.data.from_arrow(t), "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3]      # null text dropped
    assert out["n_replacement"].tolist() == [0, 2, 0]
    assert out["n_c1"].tolist() == [0, 1, 0]
    assert out["n_mojibake"].tolist() == [0, 0, 2]
    assert out["suspect"].tolist() == [False, True, True]


def test_global_row_number_uint64_keys(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import global_row_number

    # huge uint64 keys that collide after float64 quantization: the
    # in-bucket sort must still order them exactly
    base = np.uint64(2**63)
    keys = [base + np.uint64(i) for i in [5, 3, 9, 1, 7, 0, 2]]
    t = pa.table({"k": pa.array(keys, type=pa.uint64()),
                  "tag": [str(i) for i in range(7)]})
    out = (global_row_number(ray.data.from_arrow(t), "k", ["tag"],
                             num_buckets=3)
           .to_pandas().sort_values("order_idx"))
    assert out["order_idx"].tolist() == list(range(1, 8))
    assert out["k"].tolist() == sorted(int(k) for k in keys)


def test_interleave_sources_ratio_and_determinism(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sampling import interleave_sources

    a = pa.table({"id": [f"a{i}" for i in range(900)]})
    b = pa.table({"id": [f"b{i}" for i in range(900)]})
    out = interleave_sources([
        ("heavy", ray.data.from_arrow(a), "id", 3),
        ("light", ray.data.from_arrow(b), "id", 1),
    ]).to_pandas().sort_values("order_idx").reset_index(drop=True)
    assert len(out) == 1800
    assert out["order_idx"].tolist() == list(range(1, 1801))
    # 3:1 statistical mix: heavy share of the first quarter ~ 0.75
    head = out.head(450)
    share = (head["source"] == "heavy").mean()
    assert 0.6 < share < 0.9
    # rerun reproduces the identical order (pure function of the rows)
    again = interleave_sources([
        ("heavy", ray.data.from_arrow(a), "id", 3),
        ("light", ray.data.from_arrow(b), "id", 1),
    ]).to_pandas().sort_values("order_idx").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_edit_distance_join_exact_vs_bruteforce(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.linkage import edit_distance_join

    # adversarial mix: typos at every position, insertions, deletions,
    # transposed digits, short strings (<= k and <= 2k), exact dupes
    left = ["alpha", "bravo", "charlie", "delta", "ab", "x", "",
            "kilo123", "lima456", "golf"]
    right = ["alpna", "brravo", "charlie", "dela", "ba", "xy", "z",
             "kilo132", "lima4556", "golfing", "unrelatedstring"]
    lt = pa.table({"lid": list(range(len(left))), "ltext": left})
    rt = pa.table({"rid": list(range(len(right))), "rtext": right})
    got = edit_distance_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        left_id="lid", left_text="ltext", right_id="rid",
        right_text="rtext", max_dist=2,
    ).to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
    exp = duckdb.sql("""
        SELECT lid, rid, levenshtein(ltext, rtext)::BIGINT AS dist
        FROM lt, rt WHERE levenshtein(ltext, rtext) <= 2
        ORDER BY lid, rid
    """).df().reset_index(drop=True)
    got = got.astype(exp.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, exp)


def test_nfc_normalize_composition(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import nfc_normalize

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["éclair",      # decomposed -> composed
                           "éclair",        # already composed
                           None]})
    out = (nfc_normalize(ray.data.from_arrow(t), "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["text_nfc"][0] == "éclair"
    assert bool(out["changed"][0]) is True
    assert out["text_nfc"][1] == "éclair"
    assert bool(out["changed"][1]) is False
    assert out["text_nfc"][2] is None or out["text_nfc"].isna()[2]


def test_compression_ratio_repetition_signal(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import compression_ratio

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["spam " * 200,
                           "The quick brown fox jumps over the lazy dog. "
                           "Pack my box with five dozen liquor jugs. "
                           "Sphinx of black quartz, judge my vow.",
                           None]})
    out = (compression_ratio(ray.data.from_arrow(t), "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2]          # null text dropped
    # repetitive text compresses far below natural prose
    assert out["ratio"][0] < 0.1 < out["ratio"][1]
    assert (out["n_compressed"] <= out["n_bytes"] + 16).all()


def test_encode_tokens_oov_and_empty(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import encode_tokens

    vocab = pd.DataFrame({"token_id": [1, 2, 3],
                          "token": ["the", "cat", "sat"]})
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["the cat sat", "the dog sat  ", "", None]})
    out = (encode_tokens(ray.data.from_arrow(t), "doc_id", "text", vocab)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["ids_csv"].tolist() == ["1,2,3", "1,-1,3", "", ""]
    assert out["n_tokens"].tolist() == [3, 3, 0, 0]
    assert out["n_oov"].tolist() == [0, 1, 0, 0]


def test_resample_ffill_gaps_and_ties(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.windows import resample_ffill

    ts = pd.to_datetime(["2024-01-01 06:00", "2024-01-01 06:00",
                         "2024-01-03 12:00", "2024-01-06 00:00",
                         "2024-01-02 00:00"])
    t = pa.table({"k": ["a", "a", "a", "a", "b"],
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "v": [1.0, 5.0, 2.0, 3.0, 9.0]})
    out = (resample_ffill(ray.data.from_arrow(t), "k", "ts", "v",
                          every_seconds=86_400)
           .to_pandas().sort_values(["k", "grid_ts"])
           .reset_index(drop=True))
    a = out[out["k"] == "a"]
    # grid from the day floor of the first event through the last event
    assert len(a) == 6                       # Jan 1 .. Jan 6
    # first grid point precedes the first event -> null, not filled
    assert np.isnan(a["v"].iloc[0]) and not a["filled"].iloc[0]
    # tie at 06:00 resolves to the max value, carried through Jan 2-3
    assert a["v"].iloc[1] == 5.0 and a["filled"].iloc[1]
    assert a["v"].iloc[3] == 2.0             # Jan 4: last event Jan 3
    # exact-on-grid event is not marked filled
    assert a["v"].iloc[5] == 3.0 and not bool(a["filled"].iloc[5])
    b = out[out["k"] == "b"]
    assert len(b) == 1 and b["v"].iloc[0] == 9.0
    assert not bool(b["filled"].iloc[0])


def test_equi_depth_histogram_tile_sizes(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import equi_depth_histogram

    # 10 rows into 4 tiles: sizes 3,3,2,2 (first N%n tiles get +1)
    t = pa.table({"i": list(range(10)),
                  "v": [5.0, 1.0, 9.0, 2.0, 7.0, 3.0, 8.0, 4.0, 6.0, 0.0]})
    out = (equi_depth_histogram(ray.data.from_arrow(t), "v", ["i"], 4)
           .to_pandas().sort_values("tile").reset_index(drop=True))
    assert out["n"].tolist() == [3, 3, 2, 2]
    assert out["lo"].tolist() == [0.0, 3.0, 6.0, 8.0]
    assert out["hi"].tolist() == [2.0, 5.0, 7.0, 9.0]


def test_pivot_sum_explicit_domain(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import pivot_sum

    t = pa.table({"k": ["a", "a", "b", "b", None],
                  "p": ["x", "y", "x", "z", "x"],
                  "v": [1.25, 2.0, 3.0, 9.0, 100.0]})
    out = (pivot_sum(ray.data.from_arrow(t), "k", "p", "v", ["x", "y"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    # 'z' outside the domain and the null key are dropped
    assert out["sum_x"].tolist() == [1.25, 3.0]
    assert out["sum_y"].tolist() == [2.0, 0.0]


def test_pii_spans_offsets(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.pii import pii_spans

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["mail me at bob@example.com thanks",
                           "no pii in this clean prose",
                           None]})
    out = (pii_spans(ray.data.from_arrow(t), "doc_id", "text")
           .to_pandas())
    em = out[(out["doc_id"] == 1) & (out["kind"] == "email")]
    assert len(em) == 1
    s, e = int(em["start"].iloc[0]), int(em["end"].iloc[0])
    assert "mail me at bob@example.com thanks"[s:e] == "bob@example.com"
    assert (out["doc_id"] != 2).all() and (out["doc_id"] != 3).all()


def test_regex_extract_named_groups(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import regex_extract

    t = pa.table({"i": [1, 2, 3],
                  "s": ["k=42;s=F", "nope", None]})
    out = (regex_extract(ray.data.from_arrow(t), "i", "s",
                         r"k=(?P<key>\d+);s=(?P<status>\w)",
                         ["key", "status"])
           .to_pandas().sort_values("i").reset_index(drop=True))
    assert out["key"].tolist()[0] == "42"
    assert out["status"].tolist()[0] == "F"
    assert out["matched"].tolist() == [True, False, False]
    assert out["key"].isna().tolist() == [False, True, True]


def test_unigram_divergence_exact(ray_session):
    """unigram_divergence: exact counts + smoothed log-ratio vs a
    hand-computed pandas oracle; partition-invariant; empty corpora
    return the typed empty frame."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import unigram_divergence

    src_docs = ["a a b c", "b c c d", "  ", None, "a d d"]
    tgt_docs = ["a b", "d", ""]
    src = ray.data.from_arrow(pa.table({"text": pa.array(
        src_docs, type=pa.string())})).repartition(3)
    tgt = ray.data.from_arrow(pa.table({"text": pa.array(
        tgt_docs, type=pa.string())})).repartition(2)
    out = unigram_divergence(src, tgt, "text", k=10)

    # oracle: src counts a=3 b=2 c=3 d=3 (N=11), tgt a=1 b=1 d=1 (N=3),
    # joint vocab V=4
    exp = {"a": (3, 1), "b": (2, 1), "c": (3, 0), "d": (3, 1)}
    ns, nt, v = 11, 3, 4
    rows = sorted(exp.items(),
                  key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0]))
    assert list(out["token"]) == [t for t, _ in rows]
    assert list(out["rank"]) == [1, 2, 3, 4]
    for _, r in out.iterrows():
        es, et = exp[r["token"]]
        assert r["n_src"] == es and r["n_tgt"] == et
        want = round(math.log(((es + 1) * (nt + v))
                              / ((ns + v) * (et + 1))), 6)
        assert abs(r["log_ratio"] - want) < 1e-12

    again = unigram_divergence(src.repartition(1), tgt.repartition(4),
                               "text", k=10, num_partitions=7)
    pd.testing.assert_frame_equal(out, again)

    empty = ray.data.from_arrow(pa.table({"text": pa.array(
        [], type=pa.string())}))
    e = unigram_divergence(empty, empty, "text")
    assert len(e) == 0 and list(e.columns) == [
        "rank", "token", "n_src", "n_tgt", "log_ratio"]
    assert str(e["n_src"].dtype) == "int64"


def test_cohens_kappa_exact(ray_session):
    """cohens_kappa: hand-computed kappa, null exclusion, degenerate
    single-category null kappa, partition invariance, empty input."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import cohens_kappa

    a = ["x", "x", "y", "y", "x", None, "y"]
    b = ["x", "y", "y", "y", "x", "x", None]
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a, type=pa.string()),
        "b": pa.array(b, type=pa.string())})).repartition(3)
    out = cohens_kappa(ds, "a", "b")
    # pairs: (x,x),(x,y),(y,y),(y,y),(x,x) -> n=5, agree=4
    # marginals a: x=3 y=2; b: x=2 y=3 -> s = 3*2 + 2*3 = 12
    assert out["n"].iloc[0] == 5 and out["n_agree"].iloc[0] == 4
    assert out["s_chance"].iloc[0] == 12
    assert out["kappa"].iloc[0] == round((4 * 5 - 12) / (25 - 12), 6)

    again = cohens_kappa(ds.repartition(1), "a", "b", num_partitions=5)
    pd.testing.assert_frame_equal(out, again)

    const = ray.data.from_arrow(pa.table({
        "a": pa.array(["k", "k"]), "b": pa.array(["k", "k"])}))
    deg = cohens_kappa(const, "a", "b")
    assert deg["p_observed"].iloc[0] == 1.0
    assert np.isnan(deg["kappa"].iloc[0])   # n^2 == s -> null kappa

    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string())}))
    e = cohens_kappa(empty, "a", "b")
    assert e["n"].iloc[0] == 0 and np.isnan(e["kappa"].iloc[0])


def test_grouped_completeness_exact(ray_session):
    """grouped_completeness: per-segment null counts incl. the None
    segment; partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.profiling import grouped_completeness

    t = pa.table({
        "seg": pa.array(["a", "a", "b", None, "b", "a"]),
        "x": pa.array([1, None, 3, 4, None, 6], type=pa.int64()),
        "y": pa.array([None, None, "u", "v", "w", None])})
    ds = ray.data.from_arrow(t).repartition(3)
    out = grouped_completeness(ds, "seg", ["x", "y"]).to_pandas()
    out = out.sort_values(["seg", "column"]).reset_index(drop=True)

    def row(seg, col):
        m = out["seg"].isna() if seg is None else (out["seg"] == seg)
        return out[m & (out["column"] == col)]

    r = row("a", "x")
    assert r["non_null"].iloc[0] == 2 and r["total"].iloc[0] == 3
    assert r["completeness"].iloc[0] == round(2 / 3, 6)
    r = row("a", "y")
    assert r["non_null"].iloc[0] == 0
    r = row(None, "x")
    assert r["total"].iloc[0] == 1 and r["non_null"].iloc[0] == 1

    again = grouped_completeness(ds.repartition(1), "seg", ["x", "y"],
                                 num_partitions=4).to_pandas()
    again = again.sort_values(["seg", "column"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)


def test_bigram_collocations_exact(ray_session):
    """bigram_collocations: no cross-document pairs, exact counts,
    hand-checked PMI, partition-invariant, empty corpus."""
    import math

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.textstats import bigram_collocations

    docs = ["a b a b", "b a", "", None, "c"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(
        docs, type=pa.string())})).repartition(3)
    out = bigram_collocations(ds, "text", k=10)
    # pairs: doc1 (a,b),(b,a),(a,b); doc2 (b,a) -> ab=2, ba=2; N_pairs=4
    # unigrams: a=3, b=3, c=1; N_tok=7
    assert list(zip(out["w1"], out["w2"])) == [("a", "b"), ("b", "a")]
    assert list(out["n_pair"]) == [2, 2]
    assert list(out["n_w1"]) == [3, 3] and list(out["n_w2"]) == [3, 3]
    want = round(math.log((2 * 7 * 7) / (4 * 3 * 3)), 6)
    assert all(abs(p - want) < 1e-12 for p in out["pmi"])

    again = bigram_collocations(ds.repartition(1), "text", k=10,
                                num_partitions=5)
    pd.testing.assert_frame_equal(out, again)

    empty = ray.data.from_arrow(pa.table({"text": pa.array(
        [], type=pa.string())}))
    e = bigram_collocations(empty, "text")
    assert len(e) == 0 and str(e["n_pair"].dtype) == "int64"


def test_contingency_profile_exact(ray_session):
    """contingency_profile: hand-checked 2x2 table, null exclusion,
    partition invariance, empty input."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import contingency_profile

    a = ["x", "x", "x", "y", "y", None]
    b = ["u", "u", "v", "u", "v", "u"]
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a, type=pa.string()),
        "b": pa.array(b, type=pa.string())})).repartition(3)
    out = contingency_profile(ds, "a", "b")
    # cells: xu=2 xv=1 yu=1 yv=1; n=5; n_x=3 n_y=2 n_u=3 n_v=2
    assert list(zip(out["a"], out["b"])) == [
        ("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")]
    assert list(out["obs"]) == [2, 1, 1, 1]
    r = out.iloc[0]
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["expected"] == round(3 * 3 / 5, 6)
    x = 2 * 5 - 3 * 3
    assert r["contrib"] == round((x * x) / (5 * 3 * 3), 6)

    again = contingency_profile(ds.repartition(1), "a", "b",
                                num_partitions=4)
    pd.testing.assert_frame_equal(out, again)

    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string())}))
    e = contingency_profile(empty, "a", "b")
    assert len(e) == 0 and str(e["obs"].dtype) == "int64"


def test_run_checks_when_row_condition(ray_session):
    """A scan check with a ``when`` row condition evaluates only over
    rows satisfying the condition (GE row_condition / dqops WHERE
    semantics); null condition rows are excluded; ``in`` op works;
    NOSCAN checks reject ``when``."""
    import pandas as pd
    import pytest as _pytest
    import ray.data

    from packs_ray.functions.checks import run_checks

    df = pd.DataFrame({"seg": ["A", "A", "B", "B", None],
                       "v": [1, 50, 2, 60, 99]})
    ds = ray.data.from_pandas(df)
    out = run_checks(ds, [
        {"type": "values_between", "column": "v", "min": 0, "max": 10,
         "when": {"column": "seg", "op": "==", "value": "A"}},
        {"type": "values_between", "column": "v", "min": 0, "max": 10,
         "when": {"column": "seg", "op": "in", "values": ["A", "B"]}},
        {"type": "values_between", "column": "v", "min": 0, "max": 10,
         "when": {"column": "seg", "op": "!=", "value": "A"}},
        {"type": "values_between", "column": "v", "min": 0, "max": 10},
    ]).set_index("check_id")
    assert out.loc[0, "observed"] == 1      # only v=50 in seg A
    assert out.loc[1, "observed"] == 2      # 50, 60; null-seg row excluded
    assert out.loc[2, "observed"] == 1      # 60 (B only; null excluded)
    assert out.loc[3, "observed"] == 3      # 50, 60, 99

    again = run_checks(ds.repartition(3), [
        {"type": "values_between", "column": "v", "min": 0, "max": 10,
         "when": {"column": "seg", "op": "==", "value": "A"}}])
    assert again.set_index("check_id").loc[0, "observed"] == 1

    with _pytest.raises(ValueError, match="when-condition unsupported"):
        run_checks(ds, [{"type": "row_count_min", "min": 1,
                         "when": {"column": "seg", "op": "==",
                                  "value": "A"}}])


def test_association_summary_planted(ray_session):
    """association_summary: independent columns give ~0 chi2/MI/NMI;
    a deterministic (identical) pairing gives NMI == 1 and MI == H;
    nulls excluded; empty input yields the NaN summary row."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.agg import association_summary

    # perfectly dependent: b == a, uniform over 4 symbols
    df = pd.DataFrame({"a": ["w", "x", "y", "z"] * 100})
    df["b"] = df["a"]
    out = association_summary(ray.data.from_pandas(df), "a", "b")
    assert out.loc[0, "n"] == 400 and out.loc[0, "n_cells"] == 4
    assert out.loc[0, "nmi"] == 1.0
    assert out.loc[0, "mi"] == out.loc[0, "h_a"] == round(np.log(4), 6)
    assert out.loc[0, "cramers_v"] == 1.0

    # exactly independent: full product table with equal cell counts
    ind = pd.DataFrame([(x, y) for x in "pq" for y in "rst"] * 50,
                       columns=["a", "b"])
    out2 = association_summary(ray.data.from_pandas(ind), "a", "b")
    assert out2.loc[0, "chi2"] == 0.0 and out2.loc[0, "mi"] == 0.0
    assert out2.loc[0, "nmi"] == 0.0

    # nulls excluded; repartition-stable
    withnull = pd.concat([df, pd.DataFrame({"a": [None, "w"],
                                            "b": ["w", None]})],
                         ignore_index=True)
    out3 = association_summary(
        ray.data.from_pandas(withnull).repartition(3), "a", "b")
    pd.testing.assert_frame_equal(out3, out)

    empty = association_summary(
        ray.data.from_pandas(pd.DataFrame({"a": pd.Series([], dtype=object),
                                           "b": pd.Series([], dtype=object)})),
        "a", "b")
    assert empty.loc[0, "n"] == 0 and np.isnan(empty.loc[0, "chi2"])


def test_keyed_burstiness_planted(ray_session):
    """keyed_burstiness: a one-day burst vs a perfectly regular key
    over the same global span; zero-activity days inside the span count
    as zeros; null rows excluded; repartition-stable."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.windows import keyed_burstiness

    six = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03",
                          "2024-01-04", "2024-01-05", "2024-01-06"])
    df = pd.DataFrame({
        "user_id": ["a"] * 6 + ["b"] * 6 + [None],
        "ts": (pd.to_datetime(["2024-01-01"] * 6).tolist()
               + six.tolist() + [pd.Timestamp("2024-01-01")])})
    out = keyed_burstiness(ray.data.from_pandas(df).repartition(3),
                           "user_id", "ts").to_pandas()
    a, b = out.set_index("user_id").loc["a"], out.set_index("user_id").loc["b"]
    # a: counts (6,0,0,0,0,0) over span 6 -> mean 1, var 5, sigma sqrt5
    assert a["n_active_days"] == 1 and a["span_days"] == 6
    assert a["vmr"] == 5.0
    assert a["burstiness"] == round((np.sqrt(5) - 1) / (np.sqrt(5) + 1), 6)
    # b: one event every day -> var 0
    assert b["vmr"] == 0.0 and b["burstiness"] == -1.0

    again = keyed_burstiness(ray.data.from_pandas(df).repartition(5),
                             "user_id", "ts").to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_cross_source_overlap_planted(ray_session):
    """cross_source_overlap: planted shared/unique docs give exact
    jaccard/containment; 0-common pairs appear; distinct-per-source
    semantics (a doc repeated within one source counts once); null
    text/source rows excluded; repartition-stable."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.duplicates import cross_source_overlap

    df = pd.DataFrame({
        "text": ["shared1", "shared2", "only_a", "shared1",   # a
                 "shared1", "shared2", "only_b1", "only_b2",  # b
                 "only_c", "only_c",                          # c (dup within)
                 None, "x"],
        "source": ["a", "a", "a", "a",
                   "b", "b", "b", "b",
                   "c", "c",
                   "a", None]})
    out = cross_source_overlap(ray.data.from_pandas(df).repartition(3),
                               "text", "source")
    out = out.set_index(["source_a", "source_b"])
    ab = out.loc[("a", "b")]
    # a: {shared1, shared2, only_a} (3 distinct), b: 4 distinct, common 2
    assert ab["n_a"] == 3 and ab["n_b"] == 4 and ab["n_common"] == 2
    assert ab["jaccard"] == round(2 / 5, 6)
    assert ab["containment"] == round(2 / 3, 6)
    ac = out.loc[("a", "c")]
    assert ac["n_common"] == 0 and ac["jaccard"] == 0.0
    assert out.loc[("b", "c")]["n_b"] == 1   # c deduped within source

    again = cross_source_overlap(ray.data.from_pandas(df).repartition(5),
                                 "text", "source")
    pd.testing.assert_frame_equal(out.reset_index(), again)


def test_keyed_label_entropy_planted(ray_session):
    """keyed_label_entropy: uniform 4-label key has entropy ln(4),
    norm 1; single-label key has 0/0; skewed key matches the closed
    form; null rows excluded; repartition-stable."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.agg import keyed_label_entropy

    df = pd.DataFrame({
        "k": ["u"] * 8 + ["s"] * 4 + ["m"] * 4 + [None, "u"],
        "lab": (["a", "b", "c", "d"] * 2          # u: uniform over 4
                + ["a"] * 4                       # s: single label
                + ["a", "a", "a", "b"]            # m: 3/4 vs 1/4
                + ["a", None])})
    out = keyed_label_entropy(ray.data.from_pandas(df).repartition(3),
                              "k", "lab").to_pandas().set_index("k")
    assert out.loc["u", "entropy"] == round(np.log(4), 6)
    assert out.loc["u", "norm_entropy"] == 1.0
    assert out.loc["s", "entropy"] == 0.0
    assert out.loc["s", "norm_entropy"] == 0.0
    want = -(0.75 * np.log(0.75) + 0.25 * np.log(0.25))
    assert out.loc["m", "entropy"] == round(want, 6)
    assert out.loc["m", "norm_entropy"] == round(want / np.log(2), 6)
    assert out.loc["u", "n"] == 8 and out.loc["u", "n_labels"] == 4

    again = keyed_label_entropy(ray.data.from_pandas(df).repartition(5),
                                "k", "lab").to_pandas().set_index("k")
    pd.testing.assert_frame_equal(out, again)


def test_robust_scale_per_key_planted(ray_session):
    """robust_scale_per_key: a planted group scales by its own
    median/IQR; an extreme outlier barely moves the scale (vs minmax);
    constant-IQR groups emit 0.0; null rows excluded."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.repair import robust_scale_per_key

    df = pd.DataFrame({
        "id": range(8),
        "k": ["a"] * 5 + ["c"] * 3,
        "v": [1.0, 2.0, 3.0, 4.0, 1000.0,   # a: med 3, IQR q3-q1 = 4-2 = 2
              7.0, 7.0, 7.0]})              # c: constant -> IQR 0
    out = robust_scale_per_key(ray.data.from_pandas(df).repartition(3),
                               "k", "v", ["id"]).to_pandas() \
        .set_index("id").sort_index()
    assert out.loc[0, "scaled"] == -1.0       # (1-3)/2
    assert out.loc[2, "scaled"] == 0.0        # (3-3)/2
    assert out.loc[4, "scaled"] == round((1000 - 3) / 2, 6)
    assert (out.loc[out["k"] == "c", "scaled"] == 0.0).all()


def test_context_fit_planted(ray_session):
    """context_fit: suffix token totals count from the conversation
    END in pinned turn order; fits_tail flips exactly at the budget;
    null text counts 0 tokens; null role rows excluded."""
    import pandas as pd
    import ray.data

    from packs_ray.stages.conversation import context_fit

    ts = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "conv_id": ["c"] * 4 + ["d", "d"],
        "turn_idx": pd.array([0, 1, 2, 3, 0, 1], dtype="int32"),
        "role": ["user", "assistant", "user", None, "user", "assistant"],
        "ts": [ts] * 6,
        "text": ["one two three", "four five", None, "dropped row",
                 "a b c d e", "f"]})
    out = context_fit(ray.data.from_pandas(df).repartition(3), 5) \
        .to_pandas().set_index(["conv_id", "turn_idx"])
    # c kept turns: 3, 2, 0 tokens -> suffixes 5, 2, 0
    assert out.loc[("c", 0), "suffix_tokens"] == 5
    assert out.loc[("c", 1), "suffix_tokens"] == 2
    assert out.loc[("c", 2), "suffix_tokens"] == 0
    assert ("c", 3) not in out.index          # null role excluded
    assert bool(out.loc[("c", 0), "fits_tail"])     # 5 <= 5
    # d: suffixes 6, 1 -> first turn does not fit
    assert out.loc[("d", 0), "suffix_tokens"] == 6
    assert not bool(out.loc[("d", 0), "fits_tail"])
    assert bool(out.loc[("d", 1), "fits_tail"])


def test_weighted_quantiles_planted(ray_session):
    """weighted_quantiles: hand-computable weighted CDF (smallest value
    whose cum weight reaches q*W); deep refinement (tiny bins/cap)
    agrees with the single-gather path; null/zero-weight rows excluded;
    degenerate single-value input returns that value at every q."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.profiling import weighted_quantiles

    df = pd.DataFrame({"v": [10.0, 20.0, 30.0, 40.0, None, 5.0],
                       "w": [1, 2, 3, 4, 7, 0]})
    # W=10, cum: 10->1, 20->3, 30->6, 40->10
    out = weighted_quantiles(ray.data.from_pandas(df).repartition(3),
                             "v", "w", (0.1, 0.3, 0.31, 0.6, 1.0)) \
        .set_index("q")
    assert out.loc[0.1, "value"] == 10.0     # cw 1 >= 1
    assert out.loc[0.3, "value"] == 20.0     # cw 3 >= 3
    assert out.loc[0.31, "value"] == 30.0
    assert out.loc[0.6, "value"] == 30.0
    assert out.loc[1.0, "value"] == 40.0
    assert (out["total_weight"] == 10).all()

    deep = weighted_quantiles(ray.data.from_pandas(df).repartition(3),
                              "v", "w", (0.1, 0.3, 0.31, 0.6, 1.0),
                              n_bins=4, gather_cap=1).set_index("q")
    pd.testing.assert_frame_equal(out, deep)

    one = weighted_quantiles(
        ray.data.from_pandas(pd.DataFrame({"v": [7.0] * 5,
                                           "w": [2] * 5})),
        "v", "w", (0.25, 0.75))
    assert (one["value"] == 7.0).all()


def test_spearman_corr_planted(ray_session):
    """spearman_corr: perfectly monotone (nonlinear) data gives rho 1,
    reversed gives -1; agrees with scipy-free closed form on a tied
    fixture (hand-checked vs pandas corr(method='spearman')); constant
    column yields null; null rows pairwise-deleted."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.profiling import spearman_corr

    a = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 5.0],
                      "y": [1.0, 8.0, 27.0, 64.0, 125.0]})
    up = spearman_corr(ray.data.from_pandas(a), "x", "y")
    assert up.loc[0, "spearman_rho"] == 1.0 and up.loc[0, "n"] == 5
    a["y"] = -a["y"]
    dn = spearman_corr(ray.data.from_pandas(a), "x", "y")
    assert dn.loc[0, "spearman_rho"] == -1.0

    tied = pd.DataFrame({"x": [1, 1, 2, 2, 3, 3, 4, None],
                         "y": [2, 1, 2, 2, 3, 5, 5, 9]})
    got = spearman_corr(ray.data.from_pandas(tied).repartition(3),
                        "x", "y")
    want = tied.dropna()[["x", "y"]].corr(method="spearman").iloc[0, 1]
    assert got.loc[0, "spearman_rho"] == round(want, 6)
    assert got.loc[0, "n"] == 7

    const = pd.DataFrame({"x": [5.0] * 4, "y": [1.0, 2.0, 3.0, 4.0]})
    c = spearman_corr(ray.data.from_pandas(const), "x", "y")
    assert c.loc[0, "spearman_rho"] is None or pd.isna(
        c.loc[0, "spearman_rho"])


def test_kendall_tau_planted(ray_session):
    """kendall_tau: monotone data gives 1/-1; a tied fixture matches
    pandas corr(method='kendall') (tau-b); constant column yields
    null."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.profiling import kendall_tau

    a = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0],
                      "y": [10.0, 20.0, 30.0, 40.0]})
    assert kendall_tau(ray.data.from_pandas(a), "x", "y") \
        .loc[0, "kendall_tau"] == 1.0
    a["y"] = -a["y"]
    assert kendall_tau(ray.data.from_pandas(a), "x", "y") \
        .loc[0, "kendall_tau"] == -1.0

    tied = pd.DataFrame({"x": [1, 1, 2, 2, 3, 3, 4, None],
                         "y": [2, 1, 2, 2, 3, 5, 5, 9]})
    got = kendall_tau(ray.data.from_pandas(tied).repartition(3), "x", "y")
    # hand count (scipy absent here): C=15, D=0, n0=21, tie terms
    # n1=3 (x: 2,2,2,1), n2=4 (y: 1,3,1,2) -> 15/sqrt(18*17)
    import numpy as np
    want = 15.0 / (np.sqrt(21 - 3) * np.sqrt(21 - 4))
    assert got.loc[0, "kendall_tau"] == round(want, 6)
    assert got.loc[0, "n"] == 7

    const = pd.DataFrame({"x": [5.0] * 4, "y": [1.0, 2.0, 3.0, 4.0]})
    c = kendall_tau(ray.data.from_pandas(const), "x", "y")
    assert pd.isna(c.loc[0, "kendall_tau"])


def test_mannwhitney_planted(ray_session):
    """mannwhitney_u: identical sides give U = n_a*n_b/2, z 0, auc 0.5;
    a fully separated side gives U = n_a*n_b, auc 1; a tied hand
    fixture matches the closed form; nulls excluded."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.drift import mannwhitney_u

    same = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]})
    out = mannwhitney_u(ray.data.from_pandas(same),
                        ray.data.from_pandas(same.copy()), "v")
    assert out.loc[0, "u"] == 8.0 and out.loc[0, "auc"] == 0.5
    assert out.loc[0, "z"] == 0.0

    hi = pd.DataFrame({"v": [10.0, 11.0, 12.0]})
    lo = pd.DataFrame({"v": [1.0, 2.0]})
    sep = mannwhitney_u(ray.data.from_pandas(hi),
                        ray.data.from_pandas(lo), "v")
    assert sep.loc[0, "u"] == 6.0 and sep.loc[0, "auc"] == 1.0

    # ties across sides: A=[1,2,2], B=[2,3,None] -> pairs vs B=[2,3]:
    # 1:(0,0) 2:(.5,0) 2:(.5,0) -> U=1.0
    a = pd.DataFrame({"v": [1.0, 2.0, 2.0]})
    b = pd.DataFrame({"v": [2.0, 3.0, None]})
    t = mannwhitney_u(ray.data.from_pandas(a).repartition(2),
                      ray.data.from_pandas(b), "v")
    assert t.loc[0, "u"] == 1.0 and t.loc[0, "n_b"] == 2
    assert t.loc[0, "auc"] == round(1 / 6, 6)


def test_cusum_changepoint_planted(ray_session):
    """cusum_changepoint: a planted level shift is located at the last
    low day; before/after means are exact; a constant series (sd 0)
    yields a null stat; a single-day series yields nulls;
    repartition-stable."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.outliers import cusum_changepoint

    days = pd.date_range("2024-03-01", periods=10, freq="D")
    rows = []
    for i, d in enumerate(days):
        rows.append({"ts": d, "value": 10.0 if i < 6 else 50.0})
    df = pd.DataFrame(rows)
    out = cusum_changepoint(ray.data.from_pandas(df).repartition(3),
                            "ts", "value")
    assert out.loc[0, "n_days"] == 10
    assert out.loc[0, "change_day"] == pd.Timestamp("2024-03-06")
    assert out.loc[0, "mean_before"] == 10.0
    assert out.loc[0, "mean_after"] == 50.0
    assert out.loc[0, "stat"] > 0.5

    again = cusum_changepoint(ray.data.from_pandas(df).repartition(5),
                              "ts", "value")
    pd.testing.assert_frame_equal(out, again)

    const = cusum_changepoint(
        ray.data.from_pandas(pd.DataFrame(
            {"ts": days, "value": [7.0] * 10})), "ts", "value")
    assert pd.isna(const.loc[0, "stat"])

    one = cusum_changepoint(
        ray.data.from_pandas(pd.DataFrame(
            {"ts": [days[0]], "value": [1.0]})), "ts", "value")
    assert one.loc[0, "n_days"] == 1 and pd.isna(one.loc[0, "change_day"])


def test_weekday_profile_planted(ray_session):
    """weekday_profile: ISO weekday fold (1=Mon) of exact daily sums;
    a two-week fixture with doubled Sundays shows share/mean exactly;
    absent weekdays are omitted."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.outliers import weekday_profile

    rows = []
    for d in pd.date_range("2024-03-04", periods=14, freq="D"):  # Mon start
        v = 20.0 if d.dayofweek == 6 else 10.0
        rows.append({"ts": d, "value": v})
    out = weekday_profile(ray.data.from_pandas(pd.DataFrame(rows))
                          .repartition(3), "ts", "value") \
        .set_index("weekday")
    assert list(out.index) == [1, 2, 3, 4, 5, 6, 7]
    assert (out["n_days"] == 2).all()
    assert out.loc[7, "mean_daily"] == 20.0
    assert out.loc[1, "mean_daily"] == 10.0
    # total mass: 12 weekdays*10 + 2 sundays*20 = 160
    assert out.loc[7, "share"] == round(40 / 160, 6)

    gap = weekday_profile(ray.data.from_pandas(pd.DataFrame(
        {"ts": [pd.Timestamp("2024-03-04")], "value": [5.0]})),
        "ts", "value")
    assert list(gap["weekday"]) == [1] and gap.loc[0, "share"] == 1.0


def test_daily_autocorr_planted(ray_session):
    """daily_autocorr: a period-2 alternating series has ACF ~ -1 at
    lag 1 and ~ +1 at lag 2; a calendar gap drops pairs (calendar lag,
    not index lag); zero-variance series yields null acf."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.outliers import daily_autocorr

    days = pd.date_range("2024-03-01", periods=12, freq="D")
    df = pd.DataFrame({"ts": days,
                       "value": [10.0, 30.0] * 6})
    out = daily_autocorr(ray.data.from_pandas(df).repartition(3),
                         "ts", "value", lags=(1, 2)).set_index("lag")
    assert out.loc[1, "n_pairs"] == 11 and out.loc[2, "n_pairs"] == 10
    assert out.loc[1, "acf"] < -0.8
    assert out.loc[2, "acf"] > 0.8

    # drop one middle day: lag-1 pairs fall by 2 (both sides of gap)
    gap = df[df["ts"] != pd.Timestamp("2024-03-06")]
    g = daily_autocorr(ray.data.from_pandas(gap), "ts", "value",
                       lags=(1,)).set_index("lag")
    assert g.loc[1, "n_pairs"] == 9

    flat = daily_autocorr(
        ray.data.from_pandas(pd.DataFrame({"ts": days,
                                           "value": [5.0] * 12})),
        "ts", "value", lags=(1,))
    assert pd.isna(flat.loc[0, "acf"])


def test_repeated_responses_planted(ray_session):
    """repeated_responses: a planted A-A-A assistant loop counts 2
    repeats with max run 2; interleaved user turns don't break
    assistant adjacency; different-text turns don't count; convs with
    no assistant turn are absent."""
    import pandas as pd
    import ray.data

    from packs_ray.stages.conversation import repeated_responses

    ts = pd.Timestamp("2024-01-01")
    rows = []
    for i, (role, text) in enumerate([
            ("user", "hi"), ("assistant", "LOOP"), ("user", "again"),
            ("assistant", "LOOP"), ("assistant", "LOOP"),
            ("assistant", "fresh")]):
        rows.append({"conv_id": "c", "turn_idx": i, "role": role,
                     "ts": ts, "text": text})
    rows.append({"conv_id": "d", "turn_idx": 0, "role": "user",
                 "ts": ts, "text": "no assistant here"})
    rows.append({"conv_id": "e", "turn_idx": 0, "role": "assistant",
                 "ts": ts, "text": "solo"})
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    out = repeated_responses(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("conv_id")
    assert out.loc["c", "n_role_turns"] == 4
    assert out.loc["c", "n_repeats"] == 2
    assert out.loc["c", "max_repeat_run"] == 2
    assert "d" not in out.index
    assert out.loc["e", "n_repeats"] == 0


def test_ewma_anomaly_planted(ray_session):
    """ewma_anomaly: a flat series with one spike flags exactly the
    spike day; day 1 has null prediction/flag; the recursion matches
    the hand-rolled recurrence; repartition-stable."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.outliers import ewma_anomaly

    days = pd.date_range("2024-03-01", periods=15, freq="D")
    vals = [10.0] * 15
    vals[10] = 200.0
    df = pd.DataFrame({"ts": days, "value": vals})
    out = ewma_anomaly(ray.data.from_pandas(df).repartition(3),
                       "ts", "value", alpha=0.3, k=3.0)
    assert pd.isna(out.loc[0, "ewma_prev"]) and out.loc[0, "is_anomaly"] is None
    flagged = out[out["is_anomaly"] == True]  # noqa: E712
    assert list(flagged["day"]) == [pd.Timestamp("2024-03-11")]
    # hand recurrence for ewma_prev on the spike day: flat at 1000 cents
    assert out.loc[10, "ewma_prev"] == 1000.0
    assert out.loc[10, "resid"] == 19000.0

    again = ewma_anomaly(ray.data.from_pandas(df).repartition(5),
                         "ts", "value", alpha=0.3, k=3.0)
    pd.testing.assert_frame_equal(out, again)


def test_compact_parquet_roundtrip(ray_session, tmp_path):
    """compact_parquet: many tiny files become few target-sized files
    with every row preserved (order-insensitive content equality)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from packs_ray.sources.parquet import compact_parquet

    src = tmp_path / "tiny"
    os.makedirs(src)
    for i in range(20):
        pq.write_table(pa.table({
            "id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64()),
            "v": pa.array([float(i)] * 10)}),
            str(src / f"part_{i:03d}.parquet"))
    out = tmp_path / "compacted"
    res = compact_parquet(str(src), str(out))
    assert res["rows"] == 200 and res["in_files"] == 20
    assert res["out_files"] < res["in_files"]
    a = pq.read_table(str(src)).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    b = pq.read_table(str(out)).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_histogram2d_planted(ray_session):
    """histogram2d: a planted 2x2 point cloud lands in the corner
    cells with exact counts; a constant axis collapses to bin 0 with
    width 1.0; empty cells omitted; null rows excluded."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.profiling import histogram2d

    df = pd.DataFrame({
        "x": [0.0] * 3 + [10.0] * 2 + [0.0, None],
        "y": [0.0] * 3 + [10.0] * 2 + [10.0, 5.0]})
    out = histogram2d(ray.data.from_pandas(df).repartition(3),
                      "x", "y", n_bins=20) \
        .set_index(["bin_x", "bin_y"])
    assert out.loc[(0, 0), "n"] == 3       # cluster at origin
    assert out.loc[(19, 19), "n"] == 2     # max corner (clipped to last bin)
    assert out.loc[(0, 19), "n"] == 1
    assert len(out) == 3                   # empty cells omitted

    const = histogram2d(ray.data.from_pandas(
        pd.DataFrame({"x": [5.0] * 4, "y": [1.0, 2.0, 3.0, 4.0]})),
        "x", "y", n_bins=20)
    assert (const["bin_x"] == 0).all()
    assert (const["hi_x"] - const["lo_x"]).iloc[0] == 1.0


def test_completeness_ci_planted(ray_session):
    """completeness_ci: Wilson bounds bracket the point estimate, stay
    inside [0,1] at p==1, and tighten with sample size (the
    sample-size-awareness the point estimate lacks)."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.profiling import completeness_ci

    small = pd.DataFrame({"a": [1.0, None, 3.0, 4.0]})         # p=0.75
    s = completeness_ci(ray.data.from_pandas(small), ["a"]).iloc[0]
    assert s["ci_low"] < 0.75 < s["ci_high"]
    assert 0.0 <= s["ci_low"] and s["ci_high"] <= 1.0

    big = pd.DataFrame({"a": ([1.0] * 300 + [None] * 100)})    # p=0.75
    b = completeness_ci(ray.data.from_pandas(big).repartition(3),
                        ["a"]).iloc[0]
    assert (b["ci_high"] - b["ci_low"]) < (s["ci_high"] - s["ci_low"])

    full = completeness_ci(
        ray.data.from_pandas(pd.DataFrame({"a": [1.0] * 10})), ["a"]) \
        .iloc[0]
    assert full["completeness"] == 1.0 and full["ci_high"] == 1.0
    assert full["ci_low"] < 1.0     # Wilson does not collapse at p=1


def test_quantile_map_planted(ray_session):
    """quantile_map: a shifted source maps back onto the reference
    scale exactly (hand CDF); max source value maps to max reference;
    nulls excluded; empty reference maps to null."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.repair import quantile_map

    # src = {10:1, 20:2, 30:1} -> p = .25, .75, 1.0
    src = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                        "v": [10.0, 20.0, 20.0, 30.0, None]})
    # ref = {100:1, 200:1, 300:1, 400:1} -> crf .25 .5 .75 1.0
    ref = pd.DataFrame({"v": [100.0, 200.0, 300.0, 400.0]})
    out = quantile_map(ray.data.from_pandas(src).repartition(2),
                       ray.data.from_pandas(ref), "v", ["id"]) \
        .to_pandas().set_index("id")
    assert out.loc[1, "mapped"] == 100.0    # p .25 -> first crf >= .25
    assert out.loc[2, "mapped"] == 300.0    # p .75
    assert out.loc[4, "mapped"] == 400.0    # p 1.0 -> max ref
    assert 5 not in out.index               # null excluded

    none = quantile_map(
        ray.data.from_pandas(src),
        ray.data.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="float64")})),
        "v", ["id"]).to_pandas()
    assert none["mapped"].isna().all()


def test_conv_language_consistency_planted(ray_session):
    """conv_language_consistency: planted mono/mixed conversations get
    the right majority, agreement and is_mixed; majority ties break to
    the lexicographically smallest language."""
    import pandas as pd
    import ray.data

    from packs_ray.stages.conversation import conv_language_consistency

    en = "the quick and brown fox is with that have this for"
    fr = "le chat est dans les rues avec une pour que nous"
    df = pd.DataFrame({
        "conv_id": ["mono"] * 3 + ["mix"] * 4 + ["tie"] * 2 + [None],
        "text": [en, en, en,
                 en, en, en, fr,
                 en, fr, en]})
    out = conv_language_consistency(
        ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("conv_id")
    assert out.loc["mono", "majority_lang"] == "en"
    assert out.loc["mono", "agreement"] == 1.0
    assert not out.loc["mono", "is_mixed"]
    assert out.loc["mix", "majority_lang"] == "en"
    assert out.loc["mix", "agreement"] == 0.75
    assert out.loc["mix", "is_mixed"] and out.loc["mix", "n_langs"] == 2
    assert out.loc["tie", "majority_lang"] == "en"   # 1-1 tie -> lex asc
    assert None not in out.index


def test_label_noise_knn_planted(ray_session):
    """label_noise_knn: a planted mislabel inside a tight cluster is
    flagged (its neighbors all carry the other label); clean points
    are not; self is excluded from its own neighborhood."""
    import numpy as np
    import pandas as pd
    import ray.data

    rng = np.random.RandomState(0)
    a = rng.normal(0, 0.01, (6, 8)) + np.array([1.0] + [0.0] * 7)
    b = rng.normal(0, 0.01, (6, 8)) + np.array([0.0] * 7 + [1.0])
    emb = np.vstack([a, b])
    labels = [0] * 6 + [1] * 6
    labels[2] = 1            # planted mislabel inside cluster A
    df = pd.DataFrame({"vec_id": range(12),
                       "embedding": [list(map(float, r)) for r in emb],
                       "label": pd.array(labels, dtype="int32")})

    from packs_ray.functions.similarity import label_noise_knn

    out = label_noise_knn(ray.data.from_pandas(df).repartition(3),
                          "vec_id", "embedding", "label", k=5) \
        .set_index("vec_id")
    assert bool(out.loc[2, "is_suspect"]) and out.loc[2, "knn_label"] == 0
    clean = out.drop(index=2)
    assert not clean["is_suspect"].any()
    # the mislabel pollutes its neighbors' votes but not their majority
    assert out.loc[0, "n_agree"] >= 3


def test_kcenter_sample_planted(ray_session):
    """kcenter_sample: on three tight, well-separated clusters the
    first three picks land in three DIFFERENT clusters (the coverage
    property random sampling lacks); the seed is the smallest id;
    min_dist is non-increasing after the first gap pick;
    repartition-stable."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.similarity import kcenter_sample

    rng = np.random.RandomState(1)
    centers = np.eye(3)
    emb, cluster = [], []
    for ci in range(3):
        for _ in range(10):
            emb.append((centers[ci] + rng.normal(0, 0.01, 3)).tolist())
            cluster.append(ci)
    df = pd.DataFrame({"vec_id": range(30), "embedding": emb})
    out = kcenter_sample(ray.data.from_pandas(df).repartition(3),
                         "vec_id", "embedding", k=5)
    assert out.loc[0, "vec_id"] == 0 and pd.isna(out.loc[0, "min_dist"])
    first3 = [cluster[int(v)] for v in out["vec_id"][:3]]
    assert len(set(first3)) == 3
    d = out["min_dist"].dropna().to_numpy()
    assert (np.diff(d) <= 1e-12).all()      # maxmin distances shrink

    again = kcenter_sample(ray.data.from_pandas(df).repartition(7),
                           "vec_id", "embedding", k=5)
    pd.testing.assert_frame_equal(out, again)


def test_heavy_hitters_exact_with_mg_compression(ray_session):
    # Zipf-ish skew with cardinality >> k so the Misra-Gries compress
    # path actually fires (phi=0.05 -> k=40 counters, 500 distinct keys)
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from packs_ray.functions.sketches import heavy_hitters

    rng = np.random.default_rng(7)
    heavy = np.repeat(np.array([1, 2, 3]), [900, 700, 600])
    tail = rng.integers(100, 600, size=3000)
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    ds = ray.data.from_arrow(
        pa.table({"k": vals.astype(np.int64)})).repartition(16)

    out = heavy_hitters(ds, "k", phi=0.05)

    s = pd.Series(vals.astype(np.int64)).astype(str).value_counts()
    n = len(vals)
    expect = s[s > 0.05 * n]
    assert list(out["key"]) == list(expect.index)
    assert list(out["count"]) == list(expect.values)
    assert (out["n"] == n).all()


def test_heavy_hitters_nulls_and_empty(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.sketches import heavy_hitters

    ds = ray.data.from_arrow(pa.table(
        {"k": pa.array(["a", None, "a", "b", None], type=pa.string())}))
    out = heavy_hitters(ds, "k", phi=0.4)
    # n excludes nulls (3); only "a" (2/3) exceeds 0.4
    assert list(out["key"]) == ["a"] and list(out["count"]) == [2]
    assert list(out["n"]) == [3]

    empty = ray.data.from_arrow(pa.table(
        {"k": pa.array([], type=pa.string())}))
    out2 = heavy_hitters(empty, "k", phi=0.5)
    assert len(out2) == 0
    assert list(out2.columns) == ["key", "count", "n", "share"]


def test_heaps_curve_planted(ray_session):
    # 6 docs, step=ceil(6/3)=2 -> 3 checkpoints; vocabulary growth is
    # hand-checkable: new words pin to their min doc_id
    import pyarrow as pa
    import ray

    from packs_ray.functions.textstats import heaps_curve

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": ["a b", "a c", "", "b c d", None, "d e"]}))
    out = heaps_curve(ds, "doc_id", "text", n_checkpoints=3)
    assert list(out["checkpoint"]) == [2, 4, 6]
    # tokens: 2 + 2 + 0 + 3 + 0 + 2
    assert list(out["cum_tokens"]) == [4, 7, 9]
    # vocab first-seen: a,b@1 c@2 | d@4 | e@6
    assert list(out["cum_vocab"]) == [3, 4, 5]


def test_heaps_curve_empty(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.textstats import heaps_curve

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    out = heaps_curve(ds, "doc_id", "text")
    assert len(out) == 0
    assert list(out.columns) == ["checkpoint", "cum_tokens", "cum_vocab"]


def test_js_divergence_identical_and_disjoint(ray_session):
    import math

    import pyarrow as pa
    import ray

    from packs_ray.functions.drift import js_divergence

    a = ray.data.from_arrow(pa.table({"text": ["x y", "x z"] * 20}))
    # identical distributions -> 0
    out = js_divergence(a, a, "text")
    assert out["js_nats"][0] == 0.0
    assert out["n_a"][0] == 80 and out["vocab_union"][0] == 3
    # disjoint vocabularies -> ln 2
    b = ray.data.from_arrow(pa.table({"text": ["p q", "p r"] * 20}))
    out2 = js_divergence(a, b, "text")
    assert abs(out2["js_nats"][0] - math.log(2)) < 1e-6
    # one side empty -> defined 0 row with totals
    e = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out3 = js_divergence(a, e, "text")
    assert out3["n_b"][0] == 0 and out3["js_nats"][0] == 0.0


def test_pseudonymize_consistency_and_salt(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.pii import pseudonymize

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "k": pa.array([10, 20, 10, None], type=pa.int64())}))
    out = pseudonymize(ds, ["k"], salt="a").to_pandas()
    # equal values -> equal tokens; null stays null; original gone
    assert out["k"][0] == out["k"][2]
    assert out["k"][0] != out["k"][1]
    assert out["k"][0].startswith("anon_")
    assert out["k"][3] is None
    # different salt -> different token space
    out_b = pseudonymize(ds, ["k"], salt="b").to_pandas()
    assert out_b["k"][0] != out["k"][0]


def test_ngram_diversity_planted(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.textstats import ngram_diversity

    ds = ray.data.from_arrow(pa.table({
        "g": ["x", "x", "y", None],
        "text": ["a a a", "a b", "c", "dropped"]})).repartition(3)
    out = ngram_diversity(ds, "g", "text", max_n=2)
    got = {(r.g, r.n): (r.n_grams, r.n_distinct)
           for r in out.itertuples()}
    # x: unigrams 5 positions {a,b}=2; bigrams 3 positions {a a, a b}=2
    assert got[("x", 1)] == (5, 2)
    assert got[("x", 2)] == (3, 2)
    # y: one token, no bigram row (t=0 dropped)
    assert got[("y", 1)] == (1, 1)
    assert ("y", 2) not in got
    assert not any(g is None for g, _ in got)


def test_union_by_name_fill_cast_and_strict(ray_session):
    import pyarrow as pa
    import pytest
    import ray

    from packs_ray.functions.repair import union_by_name

    a = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "x": pa.array([1.5, 2.5], type=pa.float64())}))
    b = ray.data.from_arrow(pa.table({
        "y": pa.array(["p", "q"], type=pa.string()),
        "id": pa.array([3, 4], type=pa.int32())}))  # castable drift
    out = union_by_name([a, b]).to_pandas()
    assert list(out.columns) == ["id", "x", "y"]
    assert sorted(out["id"]) == [1, 2, 3, 4]
    assert out["x"].isna().sum() == 2 and out["y"].isna().sum() == 2
    with pytest.raises(ValueError, match="strict"):
        union_by_name([a, b], strict=True)


def test_dedup_within_window_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.duplicates import dedup_within_window

    base = np.datetime64("2024-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    # key A: t=0 keep, t=30 drop, t=31 drop (gap from t=30 is 1s),
    # t=100 keep (gap 69s > 60); key B independent; null ts dropped
    ts = [base, base + 30 * sec, base + 31 * sec, base + 100 * sec,
          base + 5 * sec, None]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "k": ["A", "A", "A", "A", "B", "B"],
        "ts": pa.array(ts, type=pa.timestamp("us"))}))
    out = dedup_within_window(ds, ["k"], "ts", "id", 60).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == [1, 2, 3, 4, 5]
    assert list(out["kept"]) == [True, False, False, True, True]


def test_echo_score_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.stages.conversation import echo_score

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = pa.array([base] * 7, type=pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c1", "c1", "c2", "c2", "c2"],
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1, 2], type=pa.int32()),
        "role": ["user", "assistant", "user", "assistant",
                 "assistant", "user", "assistant"],
        "text": ["hello world foo",
                 "hello there",          # 1/2 tokens echo -> 0.5
                 "bar",
                 "bar bar baz",          # 2/3 echo -> 0.666667
                 "no preceding user",    # not scored
                 "",                     # empty user turn
                 "anything here"],       # scored 0 vs empty user
        "ts": ts}))
    out = echo_score(ds).to_pandas()
    c1 = out[out["conv_id"] == "c1"].iloc[0]
    assert c1["n_scored"] == 2
    assert c1["max_echo"] == 0.666667
    from packs_ray.stages.util import round_half_away
    assert c1["mean_echo"] == round_half_away((500000 + 666667) / 2 / 1e6, 6)
    c2 = out[out["conv_id"] == "c2"].iloc[0]
    assert c2["n_scored"] == 1 and c2["mean_echo"] == 0.0


def test_refusal_profile_planted(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.stages.conversation import refusal_profile

    ds = ray.data.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c3", None],
        "role": ["user", "assistant", "assistant",
                 "assistant", "assistant", "user", "assistant"],
        "text": ["I cannot come to the phone",   # user turn: ignored
                 "I CANNOT help with that",       # refusal (case-folded)
                 "sure, here you go",             # not a refusal
                 None,                            # null text: counted, no hit
                 "well, i must decline today",    # refusal mid-string
                 "hi",                            # conv c3: no assistant turns
                 "i apologize"]}))                # null conv: dropped
    out = refusal_profile(ds).to_pandas().set_index("conv_id")
    assert list(out.index) == ["c1", "c2"]
    assert out.loc["c1", "n_assistant"] == 2
    assert out.loc["c1", "n_refusals"] == 1
    assert out.loc["c1", "refusal_rate"] == 0.5
    assert out.loc["c2", "n_assistant"] == 2
    assert out.loc["c2", "n_refusals"] == 1
    assert out.loc["c2", "refusal_rate"] == 0.5


def test_hll_state_merge_equals_single_pass(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.sketches import (approx_distinct,
                                              merged_distinct,
                                              save_distinct_state)

    vals = np.arange(5_000, dtype=np.int64)
    full = ray.data.from_arrow(pa.table({"v": vals}))
    a = ray.data.from_arrow(pa.table({"v": vals[: 3_000]}))
    b = ray.data.from_arrow(pa.table({"v": vals[2_000:]}))  # overlap
    pa_ = save_distinct_state(a, ["v"], str(tmp_path / "a.parquet"))
    pb_ = save_distinct_state(b, ["v"], str(tmp_path / "b.parquet"))
    merged = merged_distinct([pa_, pb_])
    single = approx_distinct(full, ["v"])
    assert merged["approx_distinct"][0] == single["approx_distinct"][0]
    assert merged["harmonic_scaled"][0] == single["harmonic_scaled"][0]


def test_grouped_quantile_filter_planted(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.profiling import grouped_quantile_filter

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(list(range(8)), type=pa.int64()),
        "g": ["a", "a", "a", "a", "b", "b", None, "b"],
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 99.0, None],
                      type=pa.float64())})).repartition(3)
    out = grouped_quantile_filter(ds, "g", "v", 0.5).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # group a median 2.5 -> keep 3,4; group b median 15 -> keep 20;
    # null g and null v rows drop
    assert list(out["id"]) == [2, 3, 5]


def test_grouped_linreg_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.agg import grouped_linreg

    # group a: y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    # group b: constant x -> null slope/intercept/r2; null rows drop
    ds = ray.data.from_arrow(pa.table({
        "g": ["a", "a", "a", "b", "b", None, "a"],
        "x": pa.array([1.0, 2.0, 3.0, 5.0, 5.0, 1.0, None],
                      type=pa.float64()),
        "y": pa.array([3.0, 5.0, 7.0, 9.0, 11.0, 1.0, 2.0],
                      type=pa.float64())})).repartition(3)
    out = grouped_linreg(ds, "g", "x", "y").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert list(out["g"]) == ["a", "b"]
    assert list(out["n"]) == [3, 2]
    a = out.iloc[0]
    assert a["slope"] == 2.0 and a["intercept"] == 1.0 and a["r2"] == 1.0
    b = out.iloc[1]
    assert np.isnan(b["slope"]) and np.isnan(b["r2"])


def test_grouped_linreg_no_int64_wraparound(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.agg import grouped_linreg

    # magnitudes chosen so n*sxy exceeds int64: a wraparound flips the
    # r2 sign (the bug this test pins); exact math keeps r2 in [0, 1]
    n = 20_000
    rng = __import__("numpy").random.default_rng(7)
    x = rng.uniform(1, 50, n).round(2)
    y = rng.uniform(900.0, 105_000.0, n).round(2)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["k"] * n), "x": pa.array(x), "y": pa.array(y)}))
    out = grouped_linreg(ds, "g", "x", "y").to_pandas()
    assert len(out) == 1 and 0.0 <= out["r2"][0] <= 1.0


def test_toxicity_profile_planted(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.stages.conversation import toxicity_profile

    ds = ray.data.from_arrow(pa.table({
        "conv_id": ["c1", "c1", "c1", "c2", None],
        "role": ["user", "assistant", None, "assistant", "user"],
        "text": ["you toxslur1!",          # toxic user turn
                 "ToxThreat1 indeed",       # toxic assistant (case-fold)
                 None,                      # null text: counted, no hit
                 "all calm",                # clean
                 "toxslur2"]}))             # null conv: dropped
    out = toxicity_profile(ds).to_pandas().set_index("conv_id")
    assert list(out.index) == ["c1", "c2"]
    assert out.loc["c1", "n_turns"] == 3
    assert out.loc["c1", "n_toxic"] == 2
    assert out.loc["c1", "n_toxic_assistant"] == 1
    assert out.loc["c1", "toxicity_rate"] == 0.666667
    assert out.loc["c2", "n_toxic"] == 0
    # word boundary: substring inside a longer token must NOT match
    ds2 = ray.data.from_arrow(pa.table({
        "conv_id": ["x"], "role": ["user"], "text": ["xtoxslur1y"]}))
    assert toxicity_profile(ds2).to_pandas()["n_toxic"][0] == 0


def test_turn_integrity_holes_and_dups(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.stages.conversation import turn_integrity

    ds = ray.data.from_arrow(pa.table({
        "conv_id": ["a", "a", "a", "b", "b", "c", None],
        "turn_idx": pa.array([0, 2, 2, 5, 6, None, 0], type=pa.int32())}))
    out = turn_integrity(ds).to_pandas().set_index("conv_id")
    # a: idx {0,2,2} -> span 3, distinct 2, 1 hole (idx 1), 1 dup
    assert list(out.index) == ["a", "b"]
    assert out.loc["a", "n_turns"] == 3
    assert out.loc["a", "n_distinct_idx"] == 2
    assert (out.loc["a", "min_idx"], out.loc["a", "max_idx"]) == (0, 2)
    assert out.loc["a", "n_missing"] == 1
    assert out.loc["a", "n_dup_idx"] == 1
    # b: contiguous but not zero-based -> no holes inside observed span
    assert out.loc["b", "n_missing"] == 0 and out.loc["b", "n_dup_idx"] == 0


def test_template_dedup_masks_entities(ray_session):
    """template_dedup: conversations differing only in numbers, emails,
    URLs or case/whitespace collapse onto one canonical id, while a
    real wording change stays distinct; normalizer masks as specified."""
    import pyarrow as pa
    import ray.data

    from packs_ray.stages.conversation import (template_dedup,
                                               template_normalize)

    norm = template_normalize(pa.array([
        "Order #1234 for bob@x.com at https://a.b/c?d=5  now",
        None])).to_pylist()
    assert norm[0] == "order #0 for <email> at <url> now"
    assert norm[1] is None

    rows = [
        ("a", 0, "user", "My id is 111 email a@b.co"),
        ("a", 1, "assistant", "Visit https://x.io/111 please"),
        ("b", 0, "user", "My ID is  999 email z@q.org"),     # template-equal to a
        ("b", 1, "assistant", "visit https://y.net/222 PLEASE"),
        ("c", 0, "user", "My id is 111 email a@b.co"),
        ("c", 1, "assistant", "Do NOT visit anything"),       # real difference
    ]
    ds = ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": [r[1] for r in rows],
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows]})).repartition(3)
    out = template_dedup(ds).to_pandas().set_index("conv_id")
    assert out.loc["a", "canonical_conv_id"] == "a"
    assert out.loc["b", "canonical_conv_id"] == "a"
    assert out.loc["b", "is_dup"] == 1
    assert out.loc["c", "canonical_conv_id"] == "c"
    assert out.loc["c", "is_dup"] == 0


def test_preference_pairs_mining(ray_session):
    """preference_pairs: adjacency requires user→assistant under the
    pinned order, only repeated prompts with distinct responses emit,
    chosen/rejected follow the quality formula with deterministic
    ties, and single-candidate prompts are dropped."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from packs_ray.stages.conversation import preference_pairs

    t0 = dt.datetime(2024, 1, 1)
    long_good = ("this is the kind of answer with many of the common "
                 "stopword rich words and it is quite long so that the "
                 "length score saturates toward its maximum value here "
                 "and the symbol cleanliness also stays high over all "
                 "of the characters included")
    short_bad = "#$%! no"
    rows = [
        # prompt P asked twice with different responses
        ("c1", 0, "user", "P"), ("c1", 1, "assistant", long_good),
        ("c2", 0, "user", "P"), ("c2", 1, "assistant", short_bad),
        # prompt Q asked once -> no pair
        ("c3", 0, "user", "Q"), ("c3", 1, "assistant", "whatever"),
        # prompt R repeated but identical responses -> no pair
        ("c4", 0, "user", "R"), ("c4", 1, "assistant", "same"),
        ("c5", 0, "user", "R"), ("c5", 1, "assistant", "same"),
        # assistant not adjacent to user -> not a candidate
        ("c6", 0, "user", "P"), ("c6", 1, "tool", "x"),
        ("c6", 2, "assistant", "tool-following answer"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": [r[1] for r in rows],
        "role": [r[2] for r in rows],
        "ts": [t0 + dt.timedelta(seconds=i) for i in range(len(rows))],
        "text": [r[3] for r in rows]})).repartition(4)
    out = preference_pairs(ds).to_pandas()
    assert list(out["prompt"]) == ["P"]
    assert out.loc[0, "chosen"] == long_good
    assert out.loc[0, "rejected"] == short_bad
    assert out.loc[0, "n_candidates"] == 2
    assert out.loc[0, "chosen_score"] > out.loc[0, "rejected_score"]


def test_dedup_conversations_multiset_semantics(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.stages.conversation import dedup_conversations

    ds = ray.data.from_arrow(pa.table({
        # b == a (same triples, different on-disk row order);
        # c differs from a only by turn positions (swapped idx);
        # d differs by one role; e has a null text matching f's null
        "conv_id": ["a", "a", "b", "b", "c", "c", "d", "d", "e", "f"],
        "turn_idx": pa.array([0, 1, 1, 0, 1, 0, 0, 1, 0, 0],
                             type=pa.int32()),
        "role": ["user", "assistant", "assistant", "user",
                 "user", "assistant", "user", "user", "user", "user"],
        "text": ["hi", "yo", "yo", "hi",
                 "hi", "yo", "hi", "yo", None, None]}))
    out = dedup_conversations(ds).to_pandas().set_index("conv_id")
    assert out.loc["a", "canonical_conv_id"] == "a"
    assert out.loc["b", "canonical_conv_id"] == "a"
    assert bool(out.loc["b", "is_dup"]) is True
    # c: (0,assistant,yo),(1,user,hi) != a's (0,user,hi),(1,assistant,yo)
    assert out.loc["c", "canonical_conv_id"] == "c"
    assert out.loc["d", "canonical_conv_id"] == "d"
    # null text is content and equal across conversations
    assert out.loc["f", "canonical_conv_id"] == "e"
    assert int(out["is_dup"].sum()) == 2


def test_readability_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.textstats import readability

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        # doc 1: 4 words, 2 sentence-runs, syllable groups: "the"(1)
        # "cat sat"(2) "down."(1+... ) -> count below; doc 2: no words
        # (null flesch, 0 sentences); doc 3: whitespace-only; doc 4:
        # no terminator -> sentence count clamps to 1
        "text": ["The cat sat down. Again!", None, "   \t ",
                 "word word word"]}))
    out = readability(ds, "doc_id", "text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_words"]) == [5, 0, 0, 3]
    assert list(out["n_sentences"]) == [2, 0, 0, 1]
    # vowel-group counts: The(1)+cat(1)+sat(1)+down(1)+Again(2)=6
    assert out.loc[0, "n_syllables"] == 6
    w, s, sy = 5.0, 2.0, 6.0
    exp = round(206.835 - 1.015 * (w / s) - 84.6 * (sy / w), 4)
    assert abs(out.loc[0, "flesch"] - exp) < 1e-12
    assert np.isnan(out.loc[1, "flesch"]) and np.isnan(out.loc[2, "flesch"])


def test_day_gaps_planted(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray

    from packs_ray.functions.timeliness import day_gaps

    day = 86_400_000_000  # us
    ts = pa.array([0, 1, day, 3 * day, 3 * day + 5,   # user 1: days 0,1,3
                   10 * day,                           # user 2: day 10
                   0, 7 * day,                         # user 3: days 0,7
                   None, 5 * day],                     # nulls drop
                  type=pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 3, 3, 1, None],
                            type=pa.int64()),
        "ts": ts})).repartition(3)
    out = day_gaps(ds, "user_id", "ts").to_pandas() \
        .set_index("user_id")
    assert out.loc[1, "n_days"] == 3 and out.loc[1, "span_days"] == 4
    assert out.loc[1, "n_missing_days"] == 1
    assert out.loc[1, "max_gap_days"] == 1          # hole at day 2
    assert out.loc[2, "span_days"] == 1 and out.loc[2, "max_gap_days"] == 0
    assert out.loc[3, "n_missing_days"] == 6        # days 1..6 absent
    assert out.loc[3, "max_gap_days"] == 6
    assert len(out) == 3


def test_embedding_quality_pathological(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.similarity import embedding_quality

    vecs = pa.array([
        [3.0, 4.0],                 # norm 5
        [0.0, 0.0],                 # zero vector
        None,                       # null row
        [float("nan"), 1.0],        # non-finite
        [1.0, 0.0, 0.0],            # ragged dim 3, norm 1
    ], type=pa.list_(pa.float32()))
    ds = ray.data.from_arrow(pa.table({"embedding": vecs})).repartition(2)
    out = embedding_quality(ds, "embedding").iloc[0]
    assert out["n_vecs"] == 5 and out["n_null"] == 1
    assert out["n_nonfinite"] == 1 and out["n_zero"] == 1
    assert out["min_dim"] == 2 and out["max_dim"] == 3
    assert out["n_norm"] == 3                       # finite non-null rows
    assert out["min_norm"] == 0.0 and out["max_norm"] == 5.0
    assert abs(out["mean_norm"] - 2.0) < 1e-9       # (5+0+1)/3


def test_json_schema_profile_nested_and_invalid(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.json_ops import json_schema_profile

    docs = ['{"a": 1, "b": {"c": "x", "d": [1]}}',
            '{"a": 2.5, "b": {"c": null}}',
            'not json', None, '[1, 2]']
    ds = ray.data.from_arrow(pa.table({"j": pa.array(docs)})).repartition(2)

    # depth 2: nested keys appear; frac over 3 parseable docs
    out = json_schema_profile(ds, "j", max_depth=2)
    rows = {(r.path, r.jtype): (r.n, r.frac) for r in out.itertuples()}
    assert rows[("$", "object")] == (2, round(2 / 3, 6))
    assert rows[("$", "array")][0] == 1            # [1,2] root
    assert rows[("$.a", "integer")][0] == 1
    assert rows[("$.a", "number")][0] == 1         # type flip surfaces
    assert rows[("$.b.c", "string")][0] == 1
    assert rows[("$.b.c", "null")][0] == 1
    assert rows[("$.b.d", "array")][0] == 1

    # depth 1: no nested descent
    shallow = json_schema_profile(ds, "j", max_depth=1)
    assert not any(p.startswith("$.b.") for p in shallow["path"])
    assert ("$.b", "object") in {(r.path, r.jtype)
                                 for r in shallow.itertuples()}


def test_candidate_keys_null_as_value(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.integrity import candidate_keys

    # a: unique except one null pair collision; b: nulls group together
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2, 3, None, None], type=pa.int64()),
        "b": pa.array(["x", "x", "y", "y", "y"], type=pa.string()),
    })).repartition(3)
    out = candidate_keys(ds, ["a", "b"], max_arity=2) \
        .set_index("combo")
    # DISTINCT semantics: null == null, so 'a' has 4 distinct (1,2,3,null)
    assert out.loc["a", "n_distinct"] == 4 and not out.loc["a", "is_key"]
    assert out.loc["b", "n_distinct"] == 2
    # (a,b): (null,'y') appears twice -> 4 distinct, not a key
    assert out.loc["a,b", "n_distinct"] == 4
    assert not out.loc["a,b", "is_key"]
    assert (out["n_rows"] == 5).all()


def test_candidate_keys_dtype_drift_across_blocks(ray_session):
    """An int column that is null-free in one block and has nulls in
    another must still count as ONE value domain (the Arrow-cast string
    hash guards against pandas int64/float64 block drift)."""
    import pyarrow as pa
    import ray

    from packs_ray.functions.integrity import candidate_keys

    b1 = pa.table({"a": pa.array([5, 6], type=pa.int64())})
    b2 = pa.table({"a": pa.array([5, None], type=pa.int64())})
    ds = ray.data.from_arrow(b1).union(ray.data.from_arrow(b2))
    out = candidate_keys(ds, ["a"], max_arity=1).set_index("combo")
    assert out.loc["a", "n_distinct"] == 3      # {5, 6, null}


def test_stratified_split_exact_proportions(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.sampling import stratified_split

    # strata of sizes 10 / 7 / 1 (and null rows that must drop)
    g = ["a"] * 10 + ["b"] * 7 + ["c"] + [None]
    ids = list(range(len(g)))
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(g, type=pa.string()),
        "id": pa.array(ids, type=pa.int64())})).repartition(3)
    out = stratified_split(ds, "g", "id",
                           {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .to_pandas()
    sizes = out.groupby(["g", "split"]).size()
    # n=10: floor(8+.5)=8 train, floor(9+.5)-8=1 val, 1 test
    assert sizes.get(("a", "train"), 0) == 8
    assert sizes.get(("a", "val"), 0) == 1
    assert sizes.get(("a", "test"), 0) == 1
    # n=7: floor(5.6+.5)=6 train, floor(6.3+.5)-6=0 val, 1 test
    assert sizes.get(("b", "train"), 0) == 6
    assert sizes.get(("b", "val"), 0) == 0
    assert sizes.get(("b", "test"), 0) == 1
    # n=1: train absorbs (floor(0.8+0.5)=1)
    assert sizes.get(("c", "train"), 0) == 1
    assert len(out) == 18                      # null stratum dropped

    # determinism: same input, fresh run, identical assignment
    out2 = stratified_split(ds, "g", "id",
                            {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .to_pandas()
    m1 = out.sort_values("id").reset_index(drop=True)
    m2 = out2.sort_values("id").reset_index(drop=True)
    assert (m1["split"] == m2["split"]).all()


def test_embedding_drift_pathological(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.similarity import embedding_drift

    typ = pa.list_(pa.float32())
    a = ray.data.from_arrow(pa.table({"embedding": pa.array(
        [[1.0, 0.0], [1.0, 0.0], None,             # null drops
         [1.0, 0.0, 0.0],                          # ragged drops
         [float("nan"), 1.0]], type=typ)}))        # non-finite drops
    b = ray.data.from_arrow(pa.table({"embedding": pa.array(
        [[0.0, 1.0], [0.0, 1.0]], type=typ)})).repartition(2)
    out = embedding_drift(a, b, "embedding").iloc[0]
    assert out["n_a"] == 2 and out["n_b"] == 2 and out["dim"] == 2
    assert out["n_excluded"] == 3
    assert out["centroid_cosine"] == 0.0          # orthogonal centroids

    # identical sides -> cosine exactly 1
    same = embedding_drift(a, a, "embedding").iloc[0]
    assert same["centroid_cosine"] == 1.0


def test_mutual_info_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.profiling import mutual_info

    # perfectly dependent: b = f(a) -> MI == H(a) == H(b), NMI == 1
    a = ["x"] * 4 + ["y"] * 4
    b = [1] * 4 + [2] * 4
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a), "b": pa.array(b, type=pa.int64())})) \
        .repartition(3)
    out = mutual_info(ds, "a", "b").iloc[0]
    assert out["n"] == 8 and out["card_a"] == 2 and out["card_b"] == 2
    assert abs(out["mi_nats"] - np.log(2)) < 1e-6
    assert out["nmi"] == 1.0

    # independent uniform: MI == 0 exactly (integer-pinned terms)
    a2 = ["x", "x", "y", "y"] * 2
    b2 = [1, 2, 1, 2] * 2
    ds2 = ray.data.from_arrow(pa.table({
        "a": pa.array(a2), "b": pa.array(b2, type=pa.int64())})) \
        .repartition(2)
    out2 = mutual_info(ds2, "a", "b").iloc[0]
    assert out2["mi_nats"] == 0.0 and out2["nmi"] == 0.0

    # null rows drop
    ds3 = ray.data.from_arrow(pa.table({
        "a": pa.array(["x", None, "y"]),
        "b": pa.array([1, 2, None], type=pa.int64())}))
    assert mutual_info(ds3, "a", "b").iloc[0]["n"] == 1


def test_contrastive_pairs_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions.similarity import contrastive_pairs

    typ = pa.list_(pa.float32())
    # anchor 0 (label 1): ids 2 and 4 are same-label exact ties at
    # cosine 1 -> positive = smaller id 2; id 3 (label 2) is the only
    # negative; anchor 50 (label 9) is a singleton class -> null pos
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 2, 4, 3, 50], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0],
                               [1.0, 1.0], [0.0, 1.0]], type=typ),
        "label": pa.array([1, 1, 1, 2, 9], type=pa.int32()),
    })).repartition(3)
    out = contrastive_pairs(ds, "vec_id", "embedding", "label",
                            anchor_mod=50).set_index("anchor_id")
    a0 = out.loc[0]
    assert a0["pos_id"] == 2.0 and a0["pos_cos"] == 1.0
    assert a0["neg_id"] == 3.0
    assert abs(a0["neg_cos"] - round(1 / np.sqrt(2), 6)) < 1e-12
    a50 = out.loc[50]
    assert np.isnan(a50["pos_id"])                 # singleton class
    assert a50["neg_id"] == 3.0                    # best different-label
    assert len(out) == 2


def test_key_collisions_planted(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.duplicates import key_collisions

    ds = ray.data.from_arrow(pa.table({"k": pa.array(
        ["Acme Corp", "acme  corp ", "ACME\tCORP", "Beta", "beta",
         "Solo", None, "  acme corp"])})).repartition(3)
    out = key_collisions(ds, "k").to_pandas().set_index("norm_key")
    assert list(out.index) == ["acme corp", "beta"]
    assert out.loc["acme corp", "n_rows"] == 4
    assert out.loc["acme corp", "n_raw_variants"] == 4
    assert out.loc["beta", "n_raw_variants"] == 2
    # 'Solo' normalizes uniquely -> excluded; null dropped


def test_id_gaps_cross_bucket_stitch(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.integrity import id_gaps

    # ids 0,1,2, 50,51, 99 with many range buckets -> the widest gap
    # (47, between 2 and 50) spans bucket BOUNDARIES and must stitch;
    # duplicates collapse, nulls drop
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 1, 2, 50, 51, 99, 2, None],
                       type=pa.int64())})).repartition(4)
    out = id_gaps(ds, "id", num_partitions=10).iloc[0]
    assert out["n_ids"] == 6 and out["min_id"] == 0 and out["max_id"] == 99
    assert out["span"] == 100 and out["n_missing"] == 94
    assert out["max_gap"] == 47
    assert out["n_gaps"] == 2                 # 3..49 and 52..98

    # empty input
    e = id_gaps(ray.data.from_arrow(pa.table({
        "id": pa.array([], type=pa.int64())})), "id").iloc[0]
    assert e["n_ids"] == 0 and e["max_gap"] == 0


def test_covariance_and_pca_numpy_parity(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from packs_ray.functions.similarity import covariance_matrix, pca_project

    rng = np.random.default_rng(7)
    dim = 5
    m = rng.normal(size=(60, dim)) * 0.3
    rows = [list(map(float, r)) for r in m]
    rows[3] = None                              # null row excluded
    rows[9] = [1.0, 2.0]                        # ragged row excluded
    rows[11] = [float("nan")] * dim             # non-finite excluded
    ds = ray.data.from_arrow(pa.table({
        "vid": pa.array(range(60), type=pa.int64()),
        "emb": pa.array(rows, type=pa.list_(pa.float32()))})).repartition(4)

    keep = np.ones(60, dtype=bool)
    keep[[3, 9, 11]] = False
    x = np.round(np.float64(m[keep].astype(np.float32)) * 1e6) / 1e6
    ref_cov = np.cov(x, rowvar=False, bias=True)

    out = covariance_matrix(ds, "emb", dim=dim)
    assert len(out) == dim * (dim + 1) // 2
    assert (out["n"] == keep.sum()).all()
    for _, r in out.iterrows():
        assert abs(r["cov"] - ref_cov[int(r["i"]) - 1, int(r["j"]) - 1]) \
            < 1e-8

    # projection: matches a full-precision numpy PCA up to quantization
    proj = pca_project(ds, "vid", "emb", k=2, dim=dim).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert len(proj) == keep.sum()
    w, v = np.linalg.eigh(ref_cov)
    comps = v[:, ::-1][:, :2].copy()
    for c in range(2):
        if comps[np.argmax(np.abs(comps[:, c])), c] < 0:
            comps[:, c] = -comps[:, c]
    z = (x - x.mean(axis=0)) @ comps
    assert np.abs(proj[["pc1", "pc2"]].to_numpy()
                  - z[np.argsort(np.arange(60)[keep])]).max() < 1e-4
    # variance ordering: pc1 carries at least as much variance as pc2
    assert proj["pc1"].var() >= proj["pc2"].var() - 1e-9

    # empty input keeps the schema
    empty = ray.data.from_arrow(pa.table({
        "vid": pa.array([], type=pa.int64()),
        "emb": pa.array([], type=pa.list_(pa.float32()))}))
    assert covariance_matrix(empty, "emb", dim=dim).empty
    assert pca_project(empty, "vid", "emb", k=2, dim=dim).count() == 0


def test_merge_consecutive_turns_planted(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from packs_ray.stages.conversation import merge_consecutive_turns

    ts = np.datetime64("2026-01-01T00:00:00", "us")
    us = np.timedelta64(1_000_000, "us")
    rows = pa.table({
        "conv_id": pa.array(["a"] * 5 + ["b"] * 3 + [None]),
        "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1, 2, 0],
                             type=pa.int32()),
        "role": pa.array(["user", "assistant", "assistant", "assistant",
                          "user", "user", "user", "assistant", "user"]),
        "ts": pa.array([ts + i * us for i in range(9)],
                       type=pa.timestamp("us")),
        "text": pa.array(["q1", "p1", None, "p3", "q2",
                          "x", "y", "z", "dropped"])})
    out = merge_consecutive_turns(
        ray.data.from_arrow(rows).repartition(3)).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    a = out[out.conv_id == "a"]
    assert list(a.role) == ["user", "assistant", "user"]
    assert list(a.turn_idx) == [0, 1, 2]
    assert a.iloc[1].text == "p1\n\n\n\np3"      # null text joins as ''
    assert a.iloc[1].n_merged == 3
    assert a.iloc[1].ts == ts + 1 * us           # run keeps earliest ts
    b = out[out.conv_id == "b"]
    assert list(b.text) == ["x\n\ny", "z"]
    assert len(out) == 5                         # null conv row dropped


def test_dedup_state_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray

    from packs_ray.functions.duplicates import (dedup_against_state,
                                                save_dedup_state)

    old = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["a", "b", None])})).repartition(2)
    run1 = save_dedup_state(old, ["text"], str(tmp_path), run_id="r1")

    new = ray.data.from_arrow(pa.table({
        "id": pa.array([10, 11, 12, 13], type=pa.int64()),
        "text": pa.array(["a", "c", None, "d"])})).repartition(3)
    kept = dedup_against_state(new, ["text"], "id", [run1]).to_pandas()
    # 'a' and the null text were seen; 'c'/'d' are new
    assert sorted(kept["id"]) == [11, 13]
    assert str(kept["id"].dtype) == "int64"

    # a second run's marks union in
    run2 = save_dedup_state(
        ray.data.from_arrow(pa.table({
            "id": pa.array([20], type=pa.int64()),
            "text": pa.array(["c"])})), ["text"], str(tmp_path),
        run_id="r2")
    kept2 = dedup_against_state(new, ["text"], "id",
                                [run1, run2]).to_pandas()
    assert sorted(kept2["id"]) == [13]

    # idempotent overwrite of the same run_id
    run1b = save_dedup_state(old, ["text"], str(tmp_path), run_id="r1")
    assert run1b == run1


def test_fd_repair_nulls_and_ties(ray_session):
    import pyarrow as pa
    import ray

    from packs_ray.functions.repair import fd_repair

    t = pa.table({
        "id": pa.array(range(10), type=pa.int64()),
        "k": pa.array([1, 1, 1, 2, 2, None, 3, 3, 4, 1],
                      type=pa.int64()),
        "v": pa.array(["a", "a", "b", "x", "y", "z", None, "q",
                       "solo", None])})
    out = fd_repair(ray.data.from_arrow(t).repartition(3), "k", "v") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    # k=1: majority 'a' (2 vs 1) -> row 2 repaired; null v untouched
    assert list(out.loc[[0, 1, 2], "v"]) == ["a", "a", "a"]
    assert bool(out.loc[2, "was_repaired"]) and not out.loc[1,
                                                            "was_repaired"]
    assert out.loc[9, "v"] is None or out.loc[9, "v"] != out.loc[9, "v"]
    # k=2: tie (1 vs 1) -> smallest rhs 'x' wins
    assert list(out.loc[[3, 4], "v"]) == ["x", "x"]
    # k=3: one null + one non-null -> NOT violating (nulls don't vote)
    assert out.loc[7, "v"] == "q" and not out.loc[7, "was_repaired"]
    # null lhs and singleton untouched
    assert out.loc[5, "v"] == "z" and out.loc[8, "v"] == "solo"
    assert not out["was_repaired"][[0, 1, 3, 5, 6, 8]].any()


def test_clustered_layout_prunes(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.sources.parquet import read_clustered, write_clustered

    vals = np.arange(1000, dtype=np.float64)
    vals[7] = np.nan
    t = pa.table({"id": pa.array(range(1000), type=pa.int64()),
                  "v": pa.array(vals)})
    layout = str(tmp_path / "lay")
    man = write_clustered(ray.data.from_arrow(t).repartition(5), "v",
                          layout, num_files=8)
    assert len(man["files"]) == 8
    assert sum(r["rows"] for r in man["files"]) == 1000
    assert sum(r["null_rows"] for r in man["files"]) == 1

    out, stats = read_clustered(layout, 100.0, 200.0)
    assert stats["files_read"] < stats["files_total"]   # pruning real
    df = out.to_pandas()
    assert sorted(df["v"]) == [float(x) for x in range(100, 201)]

    # no-overlap range prunes everything (typed empty result)
    none, st2 = read_clustered(layout, 5000.0, 6000.0)
    assert st2["files_read"] == 0 and len(none) == 0
    assert "v" in none.columns

    # idempotent re-write
    man2 = write_clustered(ray.data.from_arrow(t), "v", layout,
                           num_files=8)
    assert man2["cuts"] == man["cuts"]


def test_dup_weights_soft_dedup(ray_session):
    """dup_weights: exact group sizes under block-boundary splits, each
    group's total weight sums to ~1, nulls form one group, and the
    dtype-unstable-hash trap (int column with nulls in one block only)
    keeps one group."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.duplicates import dup_weights

    texts = ["a"] * 5 + ["b"] * 2 + ["c"] + [None, None, None]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
        .repartition(4)
    out = dup_weights(ds, "doc_id", ["text"]).to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "group_size"] == 5
    assert out.loc[0, "weight"] == round(1 / 5, 6)
    assert out.loc[5, "group_size"] == 2
    assert out.loc[7, "group_size"] == 1
    assert out.loc[8, "group_size"] == 3          # nulls are one group
    gw = out.groupby("group_size")["weight"].first()
    assert np.isclose((out["weight"]).sum(), 4.0, atol=1e-4)  # 4 groups


def test_ranking_metrics_recall_mrr(ray_session):
    """ranking_metrics: overlap recall, reciprocal first-relevant rank
    under the pinned (score desc, id asc) order, zero-overlap MRR=0."""
    import pandas as pd

    from packs_ray.functions.similarity import ranking_metrics

    truth = pd.DataFrame({"vec_id": [1, 2, 3], "cosine": [.9, .8, .7]})
    pred = pd.DataFrame({"vec_id": [9, 2, 8, 3],
                         "cosine": [.95, .9, .9, .5]})
    out = ranking_metrics(pred, truth, "vec_id", 3)
    row = out.iloc[0]
    # ranking: 9 (.95), 2 (.9, id 2 < 8), 8 (.9), 3 (.5)
    assert row["n_overlap"] == 2
    assert row["recall_at_k"] == round(2 / 3, 6)
    assert row["mrr"] == 0.5          # first relevant is rank 2
    none = ranking_metrics(
        pd.DataFrame({"vec_id": [9], "cosine": [1.0]}), truth, "vec_id", 3)
    assert none.iloc[0]["mrr"] == 0.0
    assert none.iloc[0]["n_overlap"] == 0


def test_scd2_intervals_change_runs(ray_session):
    """scd2_intervals: consecutive equal values merge, reappearing
    values open new runs, valid_to chains to the next run, versions
    are per-key ordinals, and null rows drop."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    t0 = dt.datetime(2024, 1, 1)
    from packs_ray.functions.windows import scd2_intervals

    rows = [
        (1, 0, "A"), (1, 1, "A"), (1, 2, "B"), (1, 3, "A"),
        (2, 0, "X"),
        (3, 0, None), (None, 1, "A"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "user_id": [r[0] for r in rows],
        "ts": [t0 + dt.timedelta(hours=r[1]) for r in rows],
        "event_type": [r[2] for r in rows]})).repartition(3)
    out = scd2_intervals(ds, "user_id", "ts", "event_type").to_pandas()
    u1 = out[out["user_id"] == 1].reset_index(drop=True)
    assert list(u1["value"]) == ["A", "B", "A"]
    assert list(u1["version"]) == [1, 2, 3]
    assert u1.loc[0, "valid_from"] == t0
    assert u1.loc[0, "valid_to"] == t0 + dt.timedelta(hours=2)
    assert u1.loc[1, "valid_to"] == t0 + dt.timedelta(hours=3)
    assert pd_isna(u1.loc[2, "valid_to"]) and u1.loc[2, "is_current"]
    assert not u1.loc[0, "is_current"]
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and u2.iloc[0]["is_current"]
    assert set(out["user_id"].unique()) == {1, 2}   # null rows dropped


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_conversation_windows_tiling(ray_session):
    """conversation_windows: window n covers pos [n*s, n*s+w); every
    turn appears in exactly its covering windows; short conversations
    produce a single window 0."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from packs_ray.stages.conversation import conversation_windows

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", i) for i in range(10)] + [("b", 0), ("b", 1)]
    ds = ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": [r[1] for r in rows],
        "role": ["user"] * len(rows),
        "ts": [t0 + dt.timedelta(minutes=i) for i in range(len(rows))],
    })).repartition(3)
    out = conversation_windows(ds, window=4, stride=2).to_pandas()
    a = out[out["conv_id"] == "a"]
    # pos p in window n iff n*2 <= p < n*2+4
    for _, r in a.iterrows():
        assert r["window_id"] * 2 <= r["pos"] < r["window_id"] * 2 + 4
    # every covering window is present for pos 5: windows 1 and 2
    w5 = sorted(a[a["pos"] == 5]["window_id"])
    assert w5 == [1, 2]
    # pos 0/1 only window 0
    assert sorted(a[a["pos"] == 0]["window_id"]) == [0]
    b = out[out["conv_id"] == "b"]
    assert sorted(b["window_id"].unique()) == [0] and len(b) == 2


def test_tpch_q1_exact_cents(ray_session):
    """tpch_q1: matches a local pandas replica on a crafted frame with
    ship-date cutoff, multiple groups and awkward decimals."""
    import datetime as dt

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import tpch_q1
    from packs_ray.stages.util import round_half_away

    def _r6(x):
        return float(round_half_away(np.float64(x), 6))

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["O", "F"], n),
        "l_shipdate": [dt.datetime(1998, 1, 1)
                       + dt.timedelta(days=int(x))
                       for x in rng.integers(0, 500, n)],
        "l_quantity": rng.integers(1, 50, n).astype(float),
        "l_extendedprice": np.round(rng.random(n) * 50_000, 2),
        "l_discount": np.round(rng.integers(0, 11, n) / 100, 2),
        "l_tax": np.round(rng.integers(0, 9, n) / 100, 2)})
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    out = tpch_q1(ds).to_pandas().set_index(
        ["l_returnflag", "l_linestatus"])

    cut = dt.datetime(1998, 9, 2, 23, 59, 59, 999999)
    f = df[df["l_shipdate"] <= cut].copy()
    f["q"] = (f["l_quantity"] * 100).round().astype(np.int64)
    f["p"] = (f["l_extendedprice"] * 100).round().astype(np.int64)
    f["d"] = (f["l_discount"] * 100).round().astype(np.int64)
    f["t"] = (f["l_tax"] * 100).round().astype(np.int64)
    for (rf, st), g in f.groupby(["l_returnflag", "l_linestatus"]):
        row = out.loc[(rf, st)]
        assert row["count_order"] == len(g)
        assert row["sum_qty"] == _r6(g["q"].sum() / 100.0)
        assert row["sum_disc_price"] == _r6(
            (g["p"] * (100 - g["d"])).sum() / 1e4)
        assert row["sum_charge"] == _r6(
            (g["p"] * (100 - g["d"]) * (100 + g["t"])).sum() / 1e6)
        assert row["avg_disc"] == _r6(
            g["d"].sum() / len(g) / 100.0)


def test_ge_long_tail_expectations(ray_session):
    """expect_table_row_count_to_equal / quantile_values_to_be_between /
    values_to_be_in_type_list — the round-5 long-tail mappings."""
    import numpy as np
    import pandas as pd
    import ray

    from packs_ray.functions.checks import (checks_from_expectations,
                                            run_checks)

    df = pd.DataFrame({"v": np.arange(101, dtype=np.float64),
                       "s": [f"x{i}" for i in range(101)]})
    ds = ray.data.from_pandas(df).repartition(4)
    suite = [
        {"expectation_type": "expect_table_row_count_to_equal",
         "kwargs": {"value": 101}},
        {"expectation_type": "expect_table_row_count_to_equal",
         "kwargs": {"value": 100}},
        {"expectation_type": "expect_column_quantile_values_to_be_between",
         "kwargs": {"column": "v", "quantile_ranges": {
             "quantiles": [0.25, 0.5, 0.75],
             # exact quantile_cont of 0..100: 25, 50, 75
             "value_ranges": [[25, 25], [None, 50], [80, None]]}}},
        {"expectation_type": "expect_column_values_to_be_in_type_list",
         "kwargs": {"column": "v", "type_list": ["DOUBLE", "int64"]}},
        {"expectation_type": "expect_column_values_to_be_in_type_list",
         "kwargs": {"column": "s", "type_list": ["int64"]}},
    ]
    out = run_checks(ds, checks_from_expectations(suite))
    by_id = out.set_index("check_id")
    assert bool(by_id.loc[0, "passed"]) and by_id.loc[0, "observed"] == 101
    assert not by_id.loc[1, "passed"]
    # q75 = 75 < 80 -> exactly one quantile violation
    assert by_id.loc[2, "observed"] == 1 and not by_id.loc[2, "passed"]
    assert bool(by_id.loc[3, "passed"])          # float64 in list
    assert not by_id.loc[4, "passed"]            # string is not int64
    score = out[out["check_id"] == -1].iloc[0]
    assert score["observed"] == 2 and not score["passed"]


def test_dtype_alias_matching():
    import pyarrow as pa

    from packs_ray.functions.checks import _dtype_matches

    assert _dtype_matches(pa.int64(), ["BIGINT"])
    assert _dtype_matches(pa.int32(), ["integer"])
    assert not _dtype_matches(pa.int32(), ["bigint"])
    assert _dtype_matches(pa.float64(), ["double precision"])
    assert _dtype_matches(pa.string(), ["object"])
    assert _dtype_matches(pa.timestamp("us"), ["datetime64[ns]"])
    assert not _dtype_matches(pa.bool_(), ["int", "float"])


def test_quantile_between_empty_column(ray_session):
    import pandas as pd
    import ray

    from packs_ray.functions.checks import run_checks

    ds = ray.data.from_pandas(
        pd.DataFrame({"v": pd.Series([None, None], dtype="float64")}))
    out = run_checks(ds, [{"type": "quantile_between", "column": "v",
                           "quantiles": [0.5], "ranges": [[0, 1]]}])
    r = out[out["check_id"] == 0].iloc[0]
    assert pd.isna(r["observed"]) and not r["passed"]


def test_ge_tier2_expectations(ray_session):
    """column-count / column-set / sum / stdev / median / distinct /
    compound-unique mappings (round-5 tier 2)."""
    import numpy as np
    import pandas as pd
    import ray

    from packs_ray.functions.checks import (checks_from_expectations,
                                            run_checks)

    df = pd.DataFrame({"a": [1, 1, 2, 2, 3],
                       "b": [1, 2, 1, 2, 1],
                       "v": [10.0, 20.0, 30.0, 40.0, None]})
    ds = ray.data.from_pandas(df).repartition(3)
    suite = [
        {"expectation_type": "expect_table_column_count_to_equal",
         "kwargs": {"value": 3}},
        {"expectation_type": "expect_table_columns_to_match_set",
         "kwargs": {"column_set": ["a", "b", "v"], "exact_match": True}},
        {"expectation_type": "expect_table_columns_to_match_set",
         "kwargs": {"column_set": ["a"], "exact_match": False}},
        {"expectation_type": "expect_column_sum_to_be_between",
         "kwargs": {"column": "v", "min_value": 100, "max_value": 100}},
        {"expectation_type": "expect_column_stdev_to_be_between",
         "kwargs": {"column": "v", "min_value": 12.9, "max_value": 12.91}},
        {"expectation_type": "expect_column_median_to_be_between",
         "kwargs": {"column": "v", "min_value": 25, "max_value": 25}},
        {"expectation_type":
         "expect_column_unique_value_count_to_be_between",
         "kwargs": {"column": "v", "min_value": 4, "max_value": 4}},
        {"expectation_type": "expect_compound_columns_to_be_unique",
         "kwargs": {"column_list": ["a", "b"]}},
        {"expectation_type": "expect_compound_columns_to_be_unique",
         "kwargs": {"column_list": ["a"]}},        # dup a values -> fail
    ]
    out = run_checks(ds, checks_from_expectations(suite))
    by = out.set_index("check_id")
    assert bool(by.loc[0, "passed"]) and by.loc[0, "observed"] == 3
    assert bool(by.loc[1, "passed"])
    assert bool(by.loc[2, "passed"])               # subset, exact=False
    assert bool(by.loc[3, "passed"])               # 10+20+30+40 = 100
    # sample stdev of [10,20,30,40] = 12.909944
    assert by.loc[4, "observed"] == 12.909944 and bool(by.loc[4, "passed"])
    assert bool(by.loc[5, "passed"])               # median 25
    assert by.loc[6, "observed"] == 4 and bool(by.loc[6, "passed"])
    assert bool(by.loc[7, "passed"])               # (a,b) unique
    assert by.loc[8, "observed"] == 2 and not by.loc[8, "passed"]  # sum(cnt-1)
    sc = out[out["check_id"] == -1].iloc[0]
    assert sc["observed"] == 8 and not sc["passed"]
