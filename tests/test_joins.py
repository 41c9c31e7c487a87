"""Tests for equi_join (broadcast == bucketed, SQL null semantics) and
asof_join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows, schema=None):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


L_ROWS = [{"id": 1, "k": 10, "x": "a"},
          {"id": 2, "k": 20, "x": "b"},
          {"id": 3, "k": None, "x": "c"},   # null key: no match, kept on left
          {"id": 4, "k": 30, "x": "d"},     # no right partner
          {"id": 5, "k": 10, "x": "e"}]     # dup left key
R_ROWS = [{"k": 10, "v": 1.0},
          {"k": 10, "v": 2.0},              # dup right key -> multiplication
          {"k": 20, "v": 3.0},
          {"k": None, "v": 9.0},            # null right key never matches
          {"k": 40, "v": 4.0}]


def _sql_left():
    out = []
    for l in L_ROWS:
        matches = [r for r in R_ROWS
                   if l["k"] is not None and r["k"] == l["k"]]
        if matches:
            out += [{**l, "k_r": r["k"], "v": r["v"]} for r in matches]
        else:
            out.append({**l, "k_r": None, "v": None})
    return pd.DataFrame(out)


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("cap", [10_000, 0], ids=["broadcast", "bucketed"])
def test_equi_join_left_sql_semantics(cap, ray_session):
    from packs_ray.functions.joins import equi_join

    out = equi_join(_ds(L_ROWS), _ds(R_ROWS), left_on=["k"], right_on=["k"],
                    how="left", broadcast_cap=cap).to_pandas()
    assert _canon(out).equals(_canon(_sql_left()))


@pytest.mark.parametrize("cap", [10_000, 0], ids=["broadcast", "bucketed"])
def test_equi_join_inner_sql_semantics(cap, ray_session):
    from packs_ray.functions.joins import equi_join

    exp = _sql_left()
    exp = exp[exp["v"].notna()]
    out = equi_join(_ds(L_ROWS), _ds(R_ROWS), left_on=["k"], right_on=["k"],
                    how="inner", broadcast_cap=cap).to_pandas()
    assert _canon(out).equals(_canon(exp))


def test_equi_join_collision_suffix(ray_session):
    from packs_ray.functions.joins import equi_join

    l = _ds([{"k": 1, "a": "l"}])
    r = _ds([{"k": 1, "a": "r"}])
    for cap in (10, 0):
        out = equi_join(l, r, left_on=["k"], right_on=["k"], how="inner",
                        broadcast_cap=cap).to_pandas()
        assert sorted(out.columns) == ["a", "a_r", "k", "k_r"]
        assert out.iloc[0]["a"] == "l" and out.iloc[0]["a_r"] == "r"


def test_asof_join_backward(ray_session):
    from packs_ray.functions.joins import asof_join

    left = [{"id": 1, "u": "a", "t": 10},
            {"id": 2, "u": "a", "t": 25},
            {"id": 3, "u": "b", "t": 5},     # before any right row
            {"id": 4, "u": "c", "t": 7},     # key absent on right
            {"id": 5, "u": None, "t": 7},    # null key -> null match
            {"id": 6, "u": "a", "t": None}]  # null ts -> null match
    right = [{"u": "a", "t": 8, "val": 100.0},
             {"u": "a", "t": 20, "val": 200.0},
             {"u": "b", "t": 50, "val": 300.0}]
    out = (asof_join(_ds(left), _ds(right), by="u", on="t",
                     right_cols=["val"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    vals = out["val"].tolist()
    assert vals[:2] == [100.0, 200.0]
    assert all(pd.isna(v) for v in vals[2:])
    assert len(out) == 6


def test_asof_join_exact_tie_matches(ray_session):
    from packs_ray.functions.joins import asof_join

    out = (asof_join(_ds([{"u": "a", "t": 20}]),
                     _ds([{"u": "a", "t": 20, "val": 7.0}]),
                     by="u", on="t", right_cols=["val"]).to_pandas())
    assert out.iloc[0]["val"] == 7.0  # backward includes equality


def test_equi_join_empty_right(ray_session):
    from packs_ray.functions.joins import equi_join

    schema = pa.schema([("k", pa.int64()), ("v", pa.float64())])
    r = _ds([], schema=schema)
    out = equi_join(_ds(L_ROWS), r, left_on=["k"], right_on=["k"],
                    how="left").to_pandas()
    assert len(out) == len(L_ROWS)
    assert out["v"].isna().all()


# ---- interval (range) join ----------------------------------------------

def _ts(s):
    return pd.Timestamp(s).to_datetime64()


def _ij_frames(intervals):
    import ray.data

    pts = pd.DataFrame({
        "eid": [1, 2, 3, 4, 5, 6],
        "key": [1, 1, 1, 2, None, 2],
        "ts": [_ts("2026-01-01 00:05"), _ts("2026-01-01 00:45"),
               _ts("2026-01-01 02:00"), _ts("2026-01-01 00:10"),
               _ts("2026-01-01 00:10"), pd.NaT],
    })
    iv = pd.DataFrame(intervals, columns=["key", "start", "end", "sid"])
    return (ray.data.from_pandas(pts), ray.data.from_pandas(iv))


def _expected(pts, intervals):
    out = []
    for _, p in pts.iterrows():
        if pd.isna(p["key"]) or pd.isna(p["ts"]):
            continue
        for key, start, end, sid in intervals:
            if key == p["key"] and start <= p["ts"] <= end:
                out.append((p["eid"], sid))
    return sorted(out)


def test_interval_join_nonoverlapping(ray_session):
    from packs_ray.functions.joins import interval_join

    intervals = [
        (1, _ts("2026-01-01 00:00"), _ts("2026-01-01 00:30"), 100),
        (1, _ts("2026-01-01 00:40"), _ts("2026-01-01 01:00"), 101),
        (2, _ts("2026-01-01 00:00"), _ts("2026-01-01 00:30"), 200),
    ]
    lds, rds = _ij_frames(intervals)
    out = interval_join(lds, rds, on="key", ts_col="ts",
                        start_col="start", end_col="end",
                        payload_cols=["sid"]).to_pandas()
    got = sorted(zip(out["eid"], out["sid"]))
    pts = lds.to_pandas()
    assert got == _expected(pts, intervals)
    assert set(out.columns) == {"eid", "key", "ts", "start", "end", "sid"}


def test_interval_join_overlapping_multimatch(ray_session):
    from packs_ray.functions.joins import interval_join

    intervals = [
        (1, _ts("2026-01-01 00:00"), _ts("2026-01-01 01:00"), 100),
        (1, _ts("2026-01-01 00:30"), _ts("2026-01-01 02:30"), 101),  # overlaps
        (2, _ts("2026-01-01 00:00"), _ts("2026-01-01 00:30"), 200),
    ]
    lds, rds = _ij_frames(intervals)
    out = interval_join(lds, rds, on="key", ts_col="ts",
                        start_col="start", end_col="end",
                        payload_cols=["sid"]).to_pandas()
    got = sorted(zip(out["eid"], out["sid"]))
    exp = _expected(lds.to_pandas(), intervals)
    assert got == exp
    # eid=2 (00:45) matches BOTH overlapping intervals
    assert [s for e, s in exp if e == 2] == [100, 101]


def test_interval_join_boundary_inclusive(ray_session):
    from packs_ray.functions.joins import interval_join

    intervals = [(1, _ts("2026-01-01 00:05"), _ts("2026-01-01 00:45"), 7)]
    lds, rds = _ij_frames(intervals)
    out = interval_join(lds, rds, on="key", ts_col="ts",
                        start_col="start", end_col="end",
                        payload_cols=["sid"]).to_pandas()
    # eids 1 (== start) and 2 (== end) both match
    assert sorted(out["eid"]) == [1, 2]


def test_interval_join_random_vs_duckdb(ray_session):
    """Randomized parity vs a DuckDB BETWEEN join (overlaps, duplicate
    starts, boundary hits, unmatched keys)."""
    import duckdb

    from packs_ray.functions.joins import interval_join

    rng = np.random.default_rng(42)
    n_pts, n_iv = 400, 60
    base = pd.Timestamp("2026-01-01").value // 1000
    pts = pd.DataFrame({
        "eid": np.arange(n_pts),
        "key": rng.integers(0, 10, n_pts),
        "ts": pd.to_datetime(base + rng.integers(0, 10_000, n_pts) * 1_000_000,
                             unit="us"),
    })
    starts = base + rng.integers(0, 9_000, n_iv) * 1_000_000
    iv = pd.DataFrame({
        "key": rng.integers(0, 12, n_iv),
        "start": pd.to_datetime(starts, unit="us"),
        "end": pd.to_datetime(starts + rng.integers(0, 2_000, n_iv) * 1_000_000,
                              unit="us"),
        "sid": np.arange(n_iv),
    })
    import ray

    out = interval_join(ray.data.from_pandas(pts), ray.data.from_pandas(iv),
                        on="key", ts_col="ts", start_col="start",
                        end_col="end", payload_cols=["sid"]).to_pandas()
    con = duckdb.connect()
    con.register("pts", pts)
    con.register("iv", iv)
    exp = con.execute("""
        SELECT p.eid, i.sid FROM pts p JOIN iv i ON p.key = i.key
        AND p.ts BETWEEN i.start AND i.end""").df()
    assert sorted(zip(out["eid"], out["sid"])) == \
        sorted(zip(exp["eid"], exp["sid"]))


def test_equi_join_right_and_outer_vs_pandas(ray_session):
    """right/outer joins match pandas merge, including null keys kept
    on outer-preserved sides and exactly-once unmatched rows."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.joins import equi_join

    l = pd.DataFrame({"k": [1, 2, 2, None, 5], "lv": [10, 20, 21, 30, 50]})
    r = pd.DataFrame({"k": [2, 3, None], "rv": ["b", "c", "z"]})
    lt = pa.table({"k": pa.array(l["k"], type=pa.int64()),
                   "lv": pa.array(l["lv"], type=pa.int64())})
    rt = pa.table({"k": pa.array(r["k"], type=pa.int64()),
                   "rv": pa.array(r["rv"], type=pa.string())})

    # SQL semantics: NULL keys never match (pandas merge would pair
    # NaN keys, so expectations are explicit row sets)
    matched = [(2, 20, 2, "b"), (2, 21, 2, "b")]
    right_dangling = [(None, None, 3, "c"), (None, None, None, "z")]
    left_dangling = [(1, 10, None, None), (None, 30, None, None),
                     (5, 50, None, None)]
    expected = {"right": matched + right_dangling,
                "outer": matched + right_dangling + left_dangling}
    for how, exp_rows in expected.items():
        got = (equi_join(ray.data.from_arrow(lt),
                         ray.data.from_arrow(rt).repartition(2),
                         left_on=["k"], right_on=["k"], how=how)
               .to_pandas())
        got_rows = sorted(
            (tuple(None if pd.isna(v) else (v if isinstance(v, str)
                                            else int(v)) for v in row)
             for row in got[["k", "lv", "k_r", "rv"]].itertuples(
                 index=False)),
            key=lambda t: tuple((x is None, x) for x in t))
        exp_sorted = sorted(exp_rows,
                            key=lambda t: tuple((x is None, x)
                                                for x in t))
        assert got_rows == exp_sorted, (how, got_rows)


def test_equi_join_semi_anti_both_paths(ray_session):
    """semi/anti joins match SQL EXISTS / NOT EXISTS on both the
    broadcast and the bucketed path; null left keys drop from semi and
    survive anti."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.joins import equi_join

    lt = pa.table({"k": pa.array([1, 2, 2, None, 5], type=pa.int64()),
                   "lv": pa.array([10, 20, 21, 30, 50], type=pa.int64())})
    rt = pa.table({"k": pa.array([2, 3, None], type=pa.int64())})

    for cap in (10_000, 0):                    # broadcast, then bucketed
        semi = (equi_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                          left_on=["k"], right_on=["k"], how="semi",
                          broadcast_cap=cap).to_pandas()
                .sort_values("lv").reset_index(drop=True))
        assert semi["lv"].tolist() == [20, 21], cap
        assert list(semi.columns) == ["k", "lv"], cap
        anti = (equi_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                          left_on=["k"], right_on=["k"], how="anti",
                          broadcast_cap=cap).to_pandas()
                .sort_values("lv").reset_index(drop=True))
        assert anti["lv"].tolist() == [10, 30, 50], cap
        assert anti["k"].isna().tolist() == [False, True, False], cap


def test_bloom_semi_join_exact_and_prefilters(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from packs_ray.functions.joins import bloom_semi_join

    rng = np.random.default_rng(3)
    lk = rng.integers(0, 10_000, size=5_000)
    left = ray.data.from_arrow(pa.table({
        "k": lk.astype(np.int64),
        "v": np.arange(5_000, dtype=np.int64)})).repartition(8)
    rk = np.unique(rng.integers(0, 10_000, size=400)).astype(np.int64)
    right = ray.data.from_arrow(pa.table({"rk": rk}))

    out = bloom_semi_join(left, right, left_on="k", right_on="rk",
                          broadcast_cap=0).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    expect = pd.DataFrame({"k": lk, "v": np.arange(5_000)})
    expect = expect[np.isin(lk, rk)].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out, expect.astype({"k": "int64", "v": "int64"}))


def test_bloom_semi_join_high_fpr_still_exact(ray_session):
    # bits_per_key=1 forces a saturated filter: false positives must be
    # settled by the exact join, null left keys never match
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from packs_ray.functions.joins import bloom_semi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 4, 5, 6, 7, 8] * 50,
                      type=pa.int64())}))
    right = ray.data.from_arrow(pa.table(
        {"rk": pa.array(list(range(0, 2000, 2)), type=pa.int64())}))
    out = bloom_semi_join(left, right, left_on="k", right_on="rk",
                          bits_per_key=1, broadcast_cap=0).to_pandas()
    assert sorted(out["k"].unique()) == [2, 4, 6, 8]
    assert len(out) == 200
