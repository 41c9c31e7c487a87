"""Property-based engine-vs-oracle parity on adversarial micro-frames.

Hypothesis generates transcript frames mixing nulls, unicode, placeholder
strings, PII fragments, broken turn indices and odd role sequences; the
Ray pipeline and the pandas oracle must agree on keep, drop_reasons and
scrubbed text for every row.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TEXTS = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.just("n/a"),
    st.just("NaN"),
    st.sampled_from([
        "the quick brown fox jumps over the lazy dog every day",
        "ok ok ok ok ok ok ok ok ok ok",
        "#$%^&* !!! @@@ ###",
        "mail me at a.b@example.com or call 555-123-4567 now please thanks",
        "こんにちは世界 これはテストです",
        "le chat est sur la table et nous sommes tres contents",
        "x",
        "word " * 30,
    ]),
    st.text(min_size=0, max_size=40),
)

ROLES = st.sampled_from(["user", "assistant", "system", "tool", "bot", ""])


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    n_convs = draw(st.integers(min_value=1, max_value=4))
    rows = []
    for i in range(n):
        conv = f"c{draw(st.integers(0, n_convs - 1))}"
        ti = draw(st.one_of(st.integers(-2, 30), st.none()))
        rows.append({
            "conv_id": conv,
            "turn_idx": ti,
            "role": draw(ROLES),
            "text": draw(TEXTS),
            "tool": None,
            "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
        })
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("Int32")
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


_AUTO_VALUES = st.one_of(
    st.none(),
    st.just(""),
    st.sampled_from([
        "john.doe@example.com", "not-an-email@", "plain text",
        "123e4567-e89b-12d3-a456-426614174000", "123e4567",
        "10.0.0.1", "999.0.0.1", "192.168.1.255", "nan",
    ]),
    st.text(min_size=0, max_size=20),
)


@st.composite
def autodetect_frames(draw):
    cols = draw(st.lists(st.sampled_from(
        ["user_email", "guid", "ship_address", "ip", "plain_col",
         "address", "mailbox", "shipping"]), min_size=1, max_size=4,
        unique=True))
    n = draw(st.integers(min_value=0, max_value=20))
    return pd.DataFrame({c: [draw(_AUTO_VALUES) for _ in range(n)]
                         for c in cols})


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(autodetect_frames())
def test_pattern_autodetect_vs_reference_replica(ray_session, df):
    """pattern_autodetect vs an independent pandas replica of the
    reference's auto-detection loop (pattern_validation_pack/main.py:
    179-243 incl. the :230 precedence quirk and :49 empty-valid quirk)."""
    import re

    import ray.data

    from packs_ray.functions.validation import pattern_autodetect
    from packs_ray.rules.patterns import BUILTIN_PATTERNS

    tbl = pa.Table.from_pandas(df, preserve_index=False)
    for i, f in enumerate(tbl.schema):  # all-null object cols -> string
        if pa.types.is_null(f.type):
            tbl = tbl.set_column(i, f.name, tbl.column(i).cast(pa.string()))
    got = pattern_autodetect(ray.data.from_arrow(tbl))

    # reference replica (straight pandas, per-value re); a column whose
    # dropna() leaves 0 values is skipped entirely (reference :191-193)
    exp_rows = []
    for c in df.columns:
        if len(df[c].dropna()) == 0:
            continue
        cl = c.lower()
        branches = []
        if "email" in cl or "mail" in cl:
            branches.append("email")
        if "uuid" in cl or "guid" in cl:
            branches.append("uuid")
        if "ip" in cl and "address" in cl or cl in ("ip", "ip_address",
                                                    "ipaddress"):
            branches.append("ipv4")
        for name in branches:
            vals = df[c].dropna()
            rx = re.compile(BUILTIN_PATTERNS[name])
            inv = sum(1 for v in vals.astype(str)
                      if v and not rx.match(v))
            exp_rows.append((c, name, inv, len(vals)))
    data_rows = got[got["column"] != "__dataset__"]
    assert len(data_rows) == len(exp_rows)
    for (_, row), (c, name, inv, tot) in zip(data_rows.iterrows(), exp_rows):
        assert (row["column"], row["pattern"]) == (c, name)
        assert row["invalid_count"] == inv, (c, name)
    if exp_rows:
        assert (got["column"] == "__dataset__").sum() == 1


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(frames())
def test_random_frames_parity(ray_session, df):
    import ray.data

    from packs_ray.oracle import oracle_labels
    from packs_ray.pipelines.filter_pipeline import build_filter_pipeline

    tbl = pa.Table.from_pandas(df, preserve_index=False)
    eng = (build_filter_pipeline(ray.data.from_arrow(tbl), num_buckets=4)
           .to_pandas())
    ora = oracle_labels(df)
    key = ["conv_id", "turn_idx", "role", "text", "ts"]
    eng = eng.sort_values(key, kind="stable").reset_index(drop=True)
    ora = ora.sort_values(key, kind="stable").reset_index(drop=True)
    assert len(eng) == len(ora)
    assert (eng["keep"].to_numpy() == ora["keep"].to_numpy()).all(), \
        list(zip(eng["drop_reasons"], ora["drop_reasons"]))
    for a, b in zip(eng["drop_reasons"], ora["drop_reasons"]):
        assert list(a) == list(b), (list(a), list(b))
    av = eng["text_scrubbed"].to_numpy(dtype=object)
    bv = ora["text_scrubbed"].to_numpy(dtype=object)
    assert all((x == y) or (x is None and y is None) for x, y in zip(av, bv))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-1e6, max_value=1e6,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=120))
def test_winsorize_matches_numpy_replica(ray_session, vals):
    """winsorize == clip at np.percentile(linear) of the non-null
    values, nulls preserved, on adversarial value lists."""
    import ray.data

    from packs_ray.functions.profiling import winsorize
    from packs_ray.stages.util import round_half_away

    tbl = pa.table({"id": np.arange(len(vals), dtype=np.int64),
                    "x": pa.array(vals, type=pa.float64())})
    out = winsorize(ray.data.from_arrow(tbl).repartition(3),
                    ["id"], "x", 0.1, 0.9).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    nn = np.array([v for v in vals if v is not None], dtype=np.float64)
    if len(nn) == 0:
        assert out["winsorized"].isna().all()
        return
    lo, hi = np.percentile(nn, [10, 90], method="linear")
    for i, v in enumerate(vals):
        w = out["winsorized"].iloc[i]
        if v is None:
            assert pd.isna(w)
        else:
            assert w == round_half_away(np.clip(v, lo, hi), 6)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=st.lists(st.floats(min_value=-100, max_value=100,
                            allow_nan=False), min_size=2, max_size=200),
       b=st.lists(st.floats(min_value=-100, max_value=100,
                            allow_nan=False), min_size=2, max_size=200))
def test_psi_drift_matches_local_replica(ray_session, a, b):
    """psi_drift == the plain-numpy PSI over baseline-min/max fixed
    bins with edge clamping and the 1e-6 floor."""
    import ray.data

    from packs_ray.functions.drift import psi_drift
    from packs_ray.stages.util import round_half_away

    mk = lambda v: ray.data.from_arrow(
        pa.table({"x": pa.array(v, type=pa.float64())})).repartition(2)
    out = psi_drift(mk(a), mk(b), "x", n_bins=5)
    av, bv = np.asarray(a), np.asarray(b)
    lo, hi = av.min(), av.max()
    w = (hi - lo) / 5
    if not w > 0:
        w = 1.0
    bins = lambda v: np.bincount(
        np.minimum(np.maximum(np.floor((v - lo) / w), 0), 4).astype(int),
        minlength=5)
    pa_ = np.maximum(bins(av) / len(av), 1e-6)
    pb_ = np.maximum(bins(bv) / len(bv), 1e-6)
    exp = float(round_half_away(np.sum((pa_ - pb_) * np.log(pa_ / pb_)), 6))
    assert out["psi"].iloc[0] == exp


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-1e10, max_value=1e10,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=150))
def test_benford_matches_string_replica(ray_session, vals):
    """benford_profile first digits == str(abs(round(v*100)))[0] over
    non-null, non-zero-cent values."""
    import ray.data

    from packs_ray.functions.profiling import benford_profile

    tbl = pa.table({"x": pa.array(vals, type=pa.float64())})
    out = benford_profile(ray.data.from_arrow(tbl).repartition(3), "x") \
        .set_index("digit")
    exp = np.zeros(10, dtype=np.int64)
    for v in vals:
        if v is None:
            continue
        c = int(np.rint(v * 100))
        if c != 0:
            exp[int(str(abs(c))[0])] += 1
    for d in range(1, 10):
        assert out.loc[d, "n"] == exp[d]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=st.lists(st.sampled_from(["x", "y", "z", "w"]),
                  min_size=1, max_size=100),
       b=st.lists(st.sampled_from(["x", "y", "z", "q"]),
                  min_size=1, max_size=100))
def test_categorical_drift_matches_local_replica(ray_session, a, b):
    """categorical_drift chi2/psi == the plain-numpy replica over the
    union of observed categories."""
    import ray.data

    from packs_ray.functions.drift import categorical_drift
    from packs_ray.stages.util import round_half_away

    mk = lambda v: ray.data.from_arrow(
        pa.table({"c": pa.array(v, type=pa.string())})).repartition(2)
    out = categorical_drift(mk(a), mk(b), "c")
    cats = sorted(set(a) | set(b))
    ca = np.array([a.count(c) for c in cats], dtype=np.float64)
    cb = np.array([b.count(c) for c in cats], dtype=np.float64)
    n_a, n_b = len(a), len(b)
    n = float(n_a + n_b)
    pool = (ca + cb) / n
    chi2 = float(np.sum((ca - n_a * pool) ** 2 / (n_a * pool))
                 + np.sum((cb - n_b * pool) ** 2 / (n_b * pool)))
    pa_ = np.maximum(ca / n_a, 1e-6)
    pb_ = np.maximum(cb / n_b, 1e-6)
    psi = float(round_half_away(
        np.sum((pa_ - pb_) * np.log(pa_ / pb_)), 6))
    assert out["n_categories"].iloc[0] == len(cats)
    assert out["chi2"].iloc[0] == float(round_half_away(chi2, 6))
    assert out["psi"].iloc[0] == psi


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lnames=st.lists(st.one_of(
        st.none(),
        st.text(alphabet="abco ", min_size=0, max_size=12),
        st.sampled_from(["acme corp", "acme inc", "globex", "co co co"])),
        min_size=1, max_size=12),
    rnames=st.lists(st.one_of(
        st.none(),
        st.text(alphabet="abco ", min_size=0, max_size=12),
        st.sampled_from(["acme corp.", "acme co", "globex co"])),
        min_size=1, max_size=8),
    tau=st.sampled_from([0.2, 0.4, 0.6, 0.9]))
def test_fuzzy_join_prefix_filter_lossless(ray_session, lnames, rnames, tau):
    """The SSJoin prefix filter provably loses no pair: the distributed
    fuzzy_join equals brute-force all-pairs gram Jaccard on random
    near-collision-heavy name pools at several thresholds."""
    import ray.data

    from packs_ray.functions.linkage import fuzzy_join
    from packs_ray.functions.neardup import _shingle_hashes

    lt = pa.table({"lid": pa.array(range(len(lnames)), type=pa.int64()),
                   "lname": pa.array(lnames, type=pa.string())})
    rt = pa.table({"rid": pa.array(range(len(rnames)), type=pa.int64()),
                   "rname": pa.array(rnames, type=pa.string())})
    out = fuzzy_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                     left_id="lid", left_text="lname",
                     right_id="rid", right_text="rname",
                     threshold=tau, gram=3).to_pandas()
    got = ({} if out.empty else
           {(a, b): j for a, b, j in
            zip(out["lid"], out["rid"], out["jaccard"])})

    exp = {}
    for li, ltx in enumerate(lnames):
        if ltx is None:
            continue
        A = _shingle_hashes(ltx, 3)
        for ri, rtx in enumerate(rnames):
            if rtx is None:
                continue
            B = _shingle_hashes(rtx, 3)
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            jac = inter / union if union else 0.0
            if jac >= tau:
                exp[(li, ri)] = round(jac, 4)
    assert got == exp


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
    ), min_size=1, max_size=40))
def test_dedup_latest_matches_pandas_replica(ray_session, rows):
    """dedup_latest == per-key argmax(ts) tie-min(id) computed in plain
    pandas, across random keys/ts with nulls and heavy ties."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.duplicates import dedup_latest

    ks = [r[0] for r in rows]
    ts = pd.to_datetime(
        [None if r[1] is None else f"2026-01-0{r[1] + 1}" for r in rows]
    ).astype("datetime64[us]")
    ids = list(range(len(rows)))
    tbl = pa.table({"k": pa.array(ks, type=pa.int64()),
                    "ts": pa.array(ts), "id": pa.array(ids,
                                                       type=pa.int64())})
    got = (dedup_latest(ray.data.from_arrow(tbl).repartition(3),
                        ["k"], "ts", "id")
           .to_pandas().sort_values("id")["id"].tolist())

    df = tbl.to_pandas()
    df = df.sort_values(["ts", "id"], ascending=[False, True],
                        kind="mergesort", na_position="last")
    exp = sorted(df.groupby("k", dropna=False).head(1)["id"].tolist())
    assert got == exp


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.tuples(
    st.integers(min_value=0, max_value=2),
    st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                   allow_nan=False, width=32))),
    min_size=1, max_size=50))
def test_grouped_stats_matches_pandas_replica(ray_session, vals):
    """grouped_stats == pandas describe on cents-fixed values, across
    random groups with nulls (all-null groups dropped)."""
    import math

    import pyarrow as pa
    import ray.data

    from packs_ray.functions.agg import grouped_stats

    tbl = pa.table({"k": pa.array([v[0] for v in vals], type=pa.int64()),
                    "v": pa.array([v[1] for v in vals],
                                  type=pa.float64())})
    got = grouped_stats(ray.data.from_arrow(tbl).repartition(3),
                        "k", "v").to_pandas()

    df = tbl.to_pandas().dropna(subset=["v"])
    if df.empty:
        # all-null input: every bucket returns an empty frame and the
        # empty Dataset surfaces schema-less (known Ray behavior)
        assert got.empty
        return
    got = got.sort_values("k").reset_index(drop=True)
    df["c"] = (df["v"] * 100).round().astype("int64")
    assert got["k"].tolist() == sorted(df["k"].unique().tolist())
    for _, row in got.iterrows():
        c = df.loc[df["k"] == row["k"], "c"]
        assert row["n"] == len(c)
        assert row["sum_cents"] == int(c.sum())
        assert abs(row["mean"] - round(c.sum() / len(c) / 100, 6)) < 1e-9
        assert row["min_v"] == c.min() / 100
        assert row["max_v"] == c.max() / 100
        if len(c) > 1:
            exp_sd = ((c.astype(float) ** 2).sum() / len(c)
                      - (c.sum() / len(c)) ** 2) * len(c) / (len(c) - 1)
            assert abs(row["std_samp"]
                       - round(math.sqrt(max(exp_sd, 0)) / 100, 6)) < 1e-6
        else:
            assert math.isnan(row["std_samp"])


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=st.lists(st.text(alphabet="abcx", min_size=0, max_size=8),
                     min_size=1, max_size=12),
       right=st.lists(st.text(alphabet="abcx", min_size=0, max_size=8),
                      min_size=1, max_size=12))
def test_edit_distance_join_property_vs_bruteforce(ray_session, left,
                                                   right):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.linkage import edit_distance_join

    lt = pa.table({"lid": list(range(len(left))), "lt": left})
    rt = pa.table({"rid": list(range(len(right))), "rt": right})
    got = edit_distance_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        left_id="lid", left_text="lt", right_id="rid", right_text="rt",
        max_dist=2, num_partitions=2,
    ).to_pandas()
    exp = duckdb.sql("""
        SELECT lid, rid, levenshtein(lt, rt)::BIGINT AS dist
        FROM lt, rt WHERE levenshtein(lt, rt) <= 2 ORDER BY lid, rid
    """).df().reset_index(drop=True)
    if len(got) == 0:
        assert len(exp) == 0
        return
    got = (got.sort_values(["lid", "rid"]).reset_index(drop=True)
           .astype(exp.dtypes.to_dict()))
    pd.testing.assert_frame_equal(got, exp)
