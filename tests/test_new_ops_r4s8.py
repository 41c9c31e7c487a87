"""Edge-semantics tests for the session-8 operators (the DuckDB-oracle
sweeps cover end-to-end parity; these pin the tricky local semantics)."""

import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df)


# -------------------------------------------------- calibration_profile

def test_calibration_perfectly_calibrated(ray_session):
    from packs_ray.functions.drift import calibration_profile

    # bin 2 (p=0.25): 1/4 positives; bin 7 (p=0.75): 3/4 positives —
    # both gaps are exactly 0 -> ECE 0
    df = pd.DataFrame({
        "p": [0.25, 0.25, 0.25, 0.25, 0.75, 0.75, 0.75, 0.75],
        "y": [1, 0, 0, 0, 1, 1, 1, 0]})
    out = calibration_profile(_ds(df), "p", "y", n_bins=10)
    assert list(out["bin"]) == [2, 7]
    assert list(out["n"]) == [4, 4]
    assert out["ece"].iloc[0] == 0.0
    exp = ((0.25 - 1) ** 2 + 3 * 0.25 ** 2
           + 3 * (0.75 - 1) ** 2 + 0.75 ** 2) / 8
    assert abs(out["brier"].iloc[0] - round(exp, 6)) < 1e-9


def test_calibration_clip_nulls_and_edge_bin(ray_session):
    from packs_ray.functions.drift import calibration_profile

    # p=1.0 lands in the TOP bin (clamped, not bin 10); p=-0.3 clips to
    # 0 -> bin 0; nulls in either column drop
    df = pd.DataFrame({
        "p": [1.0, -0.3, None, 0.5],
        "y": [1, 0, 1, None]})
    out = calibration_profile(_ds(df), "p", "y", n_bins=10)
    assert list(out["bin"]) == [0, 9]
    assert list(out["n"]) == [1, 1]
    # bin 9: pred 1.0, pos 1.0 -> gap 0; bin 0: pred 0.0, pos 0 -> 0
    assert out["ece"].iloc[0] == 0.0


def test_calibration_empty(ray_session):
    from packs_ray.functions.drift import calibration_profile

    df = pd.DataFrame({"p": pd.Series([None], dtype="float64"),
                       "y": pd.Series([None], dtype="float64")})
    out = calibration_profile(_ds(df), "p", "y")
    assert len(out) == 0
    assert list(out.columns) == ["bin", "n", "mean_pred", "frac_pos",
                                 "gap", "ece", "brier"]


def test_calibration_miscalibrated_ece(ray_session):
    from packs_ray.functions.drift import calibration_profile

    # all predictions 0.9, no positives: ECE = |0.9 - 0| = 0.9
    df = pd.DataFrame({"p": [0.9] * 5, "y": [0] * 5})
    out = calibration_profile(_ds(df), "p", "y", n_bins=10)
    assert len(out) == 1
    assert out["gap"].iloc[0] == 0.9
    assert out["ece"].iloc[0] == 0.9
    assert out["brier"].iloc[0] == round(0.81, 6)


# ------------------------------------------------------- novelty_rate

def test_novelty_first_seen_days(ray_session):
    from packs_ray.functions.timeliness import novelty_rate

    day = 86_400_000_000  # us
    df = pd.DataFrame({
        "k": ["a", "a", "b", "a", "c", None],
        "ts": pd.to_datetime(
            np.array([0, 0, day // 2, day, day, day], dtype="int64"),
            unit="us"),
    })
    out = novelty_rate(_ds(df), ["k"], "ts")
    # day 0: 3 events (a,a,b), 2 first-seen keys (a,b); day 1: 2 valid
    # events (a,c — null key drops), 1 first-seen (c)
    assert list(out["day"]) == [0, 1]
    assert list(out["n_events"]) == [3, 2]
    assert list(out["n_first"]) == [2, 1]
    assert list(out["novelty_ratio"]) == [round(2 / 3, 6), 0.5]


def test_novelty_all_repeat_second_day(ray_session):
    from packs_ray.functions.timeliness import novelty_rate

    day = 86_400_000_000
    df = pd.DataFrame({
        "k": ["x", "y", "x", "y"],
        "ts": pd.to_datetime(
            np.array([0, 1, day, day + 1], dtype="int64"), unit="us")})
    out = novelty_rate(_ds(df), ["k"], "ts")
    assert list(out["n_first"]) == [2, 0]
    assert list(out["novelty_ratio"]) == [1.0, 0.0]


def test_novelty_empty(ray_session):
    from packs_ray.functions.timeliness import novelty_rate

    df = pd.DataFrame({"k": pd.Series([None, None], dtype="object"),
                       "ts": pd.to_datetime(pd.Series([None, None]))})
    out = novelty_rate(_ds(df), ["k"], "ts")
    assert len(out) == 0
    assert list(out.columns) == ["day", "n_events", "n_first",
                                 "novelty_ratio"]


# ------------------------------------------------------- overlap_join

def _iv(rows, s="s", e="e"):
    df = pd.DataFrame(rows)
    for c in (s, e):
        df[c] = pd.to_datetime(df[c], unit="us")
    return _ds(df)


def test_overlap_join_spanning_interval_emitted_once(ray_session):
    from packs_ray.functions.joins import overlap_join

    day = 86_400_000_000
    # left interval spans 3 day-buckets; right sits inside day 1 -> the
    # pair must appear EXACTLY once despite tiling into 3 replicas
    l = _iv([{"lid": 1, "s": 0, "e": 3 * day - 1}])
    r = _iv([{"rid": 7, "s": day + 5, "e": day + 10}])
    out = overlap_join(l, r, left_start="s", left_end="e",
                       right_start="s", right_end="e").to_pandas()
    assert len(out) == 1
    assert out["overlap_us"].iloc[0] == 5
    assert out["r_rid"].iloc[0] == 7


def test_overlap_join_inclusive_touch_and_disjoint(ray_session):
    from packs_ray.functions.joins import overlap_join

    # touching endpoints (e_l == s_r) overlap with length 0; disjoint
    # intervals don't match
    l = _iv([{"lid": 1, "s": 0, "e": 100},
             {"lid": 2, "s": 0, "e": 10}])
    r = _iv([{"rid": 1, "s": 100, "e": 200},
             {"rid": 2, "s": 50, "e": 60}])
    out = overlap_join(l, r, left_start="s", left_end="e",
                       right_start="s", right_end="e").to_pandas()
    got = sorted(zip(out["lid"], out["r_rid"], out["overlap_us"]))
    assert got == [(1, 1, 0), (1, 2, 10)]


def test_overlap_join_null_and_inverted_drop(ray_session):
    from packs_ray.functions.joins import overlap_join

    l = pd.DataFrame({"lid": [1, 2, 3],
                      "s": pd.to_datetime([10, None, 100], unit="us"),
                      "e": pd.to_datetime([20, 30, 50], unit="us")})
    r = _iv([{"rid": 1, "s": 0, "e": 1000}])
    out = overlap_join(_ds(l), r, left_start="s", left_end="e",
                       right_start="s", right_end="e").to_pandas()
    # row 2: null start; row 3: end < start -> both drop
    assert list(out["lid"]) == [1]


def test_overlap_join_cross_product_within_bucket(ray_session):
    from packs_ray.functions.joins import overlap_join

    l = _iv([{"lid": i, "s": 0, "e": 50} for i in range(3)])
    r = _iv([{"rid": j, "s": 10, "e": 60} for j in range(2)])
    out = overlap_join(l, r, left_start="s", left_end="e",
                       right_start="s", right_end="e").to_pandas()
    assert len(out) == 6
    assert set(out["overlap_us"]) == {40}


# -------------------------------------------------------- setsim_join

def _brute_pairs(texts, t):
    import itertools
    sets = {i: set(x.split()) for i, x in texts.items()
            if x is not None and x.strip()}
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if u and i / u >= t:
            out.append((a, b))
    return sorted(out)


def test_setsim_matches_brute_force_random(ray_session):
    from packs_ray.functions.setsim import setsim_join

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = {}
    for i in range(80):
        n = rng.randint(3, 20)
        texts[i] = " ".join(rng.choice(vocab, size=n))
    # plant exact dups and near-dups
    texts[80] = texts[0]
    texts[81] = texts[1] + " extra"
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    for t in (0.5, 0.8, 0.95):
        out = setsim_join(_ds(df), "doc_id", "text", threshold=t,
                          collect=True)
        got = sorted(zip(out["id_a"], out["id_b"]))
        assert got == _brute_pairs(texts, t), f"threshold {t}"


def test_setsim_threshold_boundary_and_empty_docs(ray_session):
    from packs_ray.functions.setsim import setsim_join

    # J(0,1)=1.0 (identical), J(0,2)=3/4=0.75, J(3,*)=0; doc 4 empty,
    # doc 5 null -> both excluded
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["a b c", "c b a", "a b c d", "x y z", "   ", None]})
    out = setsim_join(_ds(df), "doc_id", "text", threshold=0.75,
                      collect=True)
    got = sorted(zip(out["id_a"], out["id_b"], out["jaccard"]))
    assert got == [(0, 1, 1.0), (0, 2, 0.75), (1, 2, 0.75)]
    out2 = setsim_join(_ds(df), "doc_id", "text", threshold=0.76,
                       collect=True)
    assert sorted(zip(out2["id_a"], out2["id_b"])) == [(0, 1)]


def test_setsim_max_group_skip_surfaced(ray_session):
    from packs_ray.functions.setsim import setsim_join

    # every doc identical -> one prefix-token group of 30 > max_group
    df = pd.DataFrame({"doc_id": range(30), "text": ["q r s"] * 30})
    out = setsim_join(_ds(df), "doc_id", "text", threshold=0.9,
                      max_group=10, collect=True)
    assert len(out) == 0
    assert out.attrs["skipped_buckets"] >= 1


# -------------------------------------------------------- t_closeness

def test_t_closeness_uniform_groups_zero(ray_session):
    from packs_ray.functions.pii import t_closeness

    # every group has the same 50/50 sensitive split as the global
    # distribution -> max TVD 0
    df = pd.DataFrame({"q": ["a", "a", "b", "b"],
                       "s": ["x", "y", "x", "y"]})
    out = t_closeness(_ds(df), ["q"], "s", t=0.2)
    assert out["max_t"].iloc[0] == 0.0
    assert out["n_groups_above"].iloc[0] == 0
    assert out["n_groups"].iloc[0] == 2


def test_t_closeness_skewed_group(ray_session):
    from packs_ray.functions.pii import t_closeness

    # global: x 3/4, y 1/4.  group a = {x,x}: TVD = 0.5*(|1-3/4| +
    # |0-1/4|) = 0.25; group b = {x,y}: 0.5*(|1/2-3/4|+|1/2-1/4|)=0.25
    df = pd.DataFrame({"q": ["a", "a", "b", "b"],
                       "s": ["x", "x", "x", "y"]})
    out = t_closeness(_ds(df), ["q"], "s", t=0.2)
    assert out["max_t"].iloc[0] == 0.25
    assert out["n_groups_above"].iloc[0] == 2
    # nulls drop entirely
    df2 = pd.concat([df, pd.DataFrame({"q": [None, "a"],
                                       "s": ["x", None]})])
    out2 = t_closeness(_ds(df2), ["q"], "s", t=0.2)
    assert out2["n_rows"].iloc[0] == 4
    assert out2["max_t"].iloc[0] == 0.25


def test_t_closeness_empty(ray_session):
    from packs_ray.functions.pii import t_closeness

    df = pd.DataFrame({"q": pd.Series([None], dtype="object"),
                       "s": pd.Series([None], dtype="object")})
    out = t_closeness(_ds(df), ["q"], "s")
    assert out["n_groups"].iloc[0] == 0 and out["max_t"].iloc[0] is None
