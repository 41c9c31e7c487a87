"""Edge-semantics tests for the session-12 operators (the DuckDB-oracle
sweeps cover end-to-end parity; these pin the tricky local semantics)."""

import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df)


# -------------------------------------------------- gini_profile

def test_gini_uniform_is_zero(ray_session):
    from packs_ray.functions.profiling import gini_profile

    df = pd.DataFrame({"v": [5.0] * 200})
    out = gini_profile(_ds(df).repartition(4), "v")
    assert out["n"].iloc[0] == 200
    assert out["total"].iloc[0] == 1000.0
    assert out["gini"].iloc[0] == 0.0


def test_gini_one_holder_approaches_one(ray_session):
    from packs_ray.functions.profiling import gini_profile

    # n-1 zeros + one holder: G = (n-1)/n exactly
    n = 100
    df = pd.DataFrame({"v": [0.0] * (n - 1) + [42.0]})
    out = gini_profile(_ds(df).repartition(5), "v")
    assert out["gini"].iloc[0] == round((n - 1) / n, 6)


def test_gini_closed_form_and_partition_invariance(ray_session):
    from packs_ray.functions.profiling import gini_profile

    # x = 1..10 ascending: G = (2*Σi*i - 11*55) / (10*55)
    vals = list(range(1, 11))
    sr = sum(i * x for i, x in enumerate(vals, start=1))
    t = sum(vals)
    exp = round((2 * sr - 11 * t) / (10 * t), 6)
    df = pd.DataFrame({"v": [float(x) for x in vals]})
    a = gini_profile(_ds(df).repartition(1), "v", num_buckets=2)
    b = gini_profile(_ds(df).repartition(7), "v", num_buckets=5)
    assert a["gini"].iloc[0] == exp
    pd.testing.assert_frame_equal(a, b)


def test_gini_nulls_drop_and_empty(ray_session):
    from packs_ray.functions.profiling import gini_profile

    df = pd.DataFrame({"v": [1.0, None, 3.0, None]})
    out = gini_profile(_ds(df), "v")
    assert out["n"].iloc[0] == 2
    assert out["total"].iloc[0] == 4.0

    empty = pd.DataFrame({"v": pd.Series([None, None], dtype="float64")})
    e = gini_profile(_ds(empty), "v")
    assert e["n"].iloc[0] == 0 and e["gini"].iloc[0] is None


def test_gini_zero_total_is_null(ray_session):
    from packs_ray.functions.profiling import gini_profile

    df = pd.DataFrame({"v": [0.0] * 50})
    out = gini_profile(_ds(df), "v")
    assert out["n"].iloc[0] == 50
    assert out["total"].iloc[0] == 0.0
    assert out["gini"].iloc[0] is None
