"""groupwise_zscore invariants (SQL parity runs in test_functions.py
via zscore_events)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.functions.agg import groupwise_zscore


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df)


def test_zscore_matches_pandas_transform(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": np.arange(500),
        "k": rng.integers(0, 20, 500),
        "v": np.round(rng.uniform(0, 100, 500), 2),
    })
    out = (groupwise_zscore(_ds(df), "k", "v").to_pandas()
           .sort_values("id").reset_index(drop=True))
    cents = np.rint(df["v"] * 100)
    exp = (cents - cents.groupby(df["k"]).transform("mean")) \
        / cents.groupby(df["k"]).transform(lambda s: np.sqrt(
            np.maximum((s * s).mean() - s.mean() ** 2, 0.0)))
    assert np.allclose(out["zscore"], np.round(exp, 6), atol=1e-9)


def test_zscore_degenerate_groups_null(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],
        "k": [1, 2, 2, 3, None, 3],
        "v": [5.0, 1.0, 2.0, 4.0, 4.0, None],
    })
    out = (groupwise_zscore(_ds(df), "k", "v").to_pandas()
           .set_index("id").sort_index())
    assert len(out) == 6                      # all rows preserved
    assert pd.isna(out.loc[1, "zscore"])      # singleton group
    assert pd.isna(out.loc[5, "zscore"])      # null key
    assert pd.isna(out.loc[6, "zscore"])      # null value
    assert not pd.isna(out.loc[2, "zscore"])
    # zero-variance group
    df2 = pd.DataFrame({"id": [1, 2], "k": [9, 9], "v": [3.0, 3.0]})
    out2 = groupwise_zscore(_ds(df2), "k", "v").to_pandas()
    assert out2["zscore"].isna().all()


def test_zscore_bucketed_matches_broadcast(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "id": np.arange(300),
        "k": rng.integers(0, 7, 300),
        "v": np.round(rng.uniform(0, 10, 300), 2),
    })
    a = (groupwise_zscore(_ds(df), "k", "v").to_pandas()
         .sort_values("id")["zscore"].to_numpy())
    b = (groupwise_zscore(_ds(df), "k", "v", broadcast_cap=0).to_pandas()
         .sort_values("id")["zscore"].to_numpy())
    assert np.array_equal(a, b, equal_nan=True)


# ---- MAD outliers ---------------------------------------------------------

def test_mad_outliers_matches_numpy(ray_session):
    from packs_ray.functions.outliers import mad_outliers

    rng = np.random.default_rng(9)
    v = np.round(rng.normal(100, 10, 801), 3)
    v[:5] = [500.0, -300.0, 100.0, 99.0, 101.0]   # planted extremes
    df = pd.DataFrame({"id": np.arange(801), "x": v})
    out = (mad_outliers(_ds(df), "x", k=3.0).to_pandas()
           .sort_values("id").reset_index(drop=True))
    med = np.median(v)
    mad = np.median(np.abs(v - med))
    z = np.round(np.abs(v - med) / (1.4826 * mad), 6)
    assert np.allclose(out["mad_z"], z, atol=1e-9)
    assert (out["is_outlier"].to_numpy() == (z > 3.0)).all()
    assert bool(out.loc[0, "is_outlier"]) and bool(out.loc[1, "is_outlier"])
    assert not out.loc[2, "is_outlier"]


def test_mad_outliers_nulls_and_zero_mad(ray_session):
    from packs_ray.functions.outliers import mad_outliers

    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "x": [5.0, None, 5.0, 5.0]})
    out = (mad_outliers(_ds(df), "x").to_pandas()
           .set_index("id").sort_index())
    assert len(out) == 4
    assert pd.isna(out.loc[2, "is_outlier"])      # null value
    # MAD == 0 (constant column): nothing flagged, scores null
    assert out.loc[[1, 3, 4], "mad_z"].isna().all()


def test_zscore_hot_key_completes(ray_session):
    """A single mega-key routes every row to one bucket: the reduce is
    one vectorized frame (documented partitioning contract) and results
    still match the pandas transform."""
    n = 200_000
    df = pd.DataFrame({"id": np.arange(n), "k": np.zeros(n, dtype=np.int64),
                       "v": np.round(np.random.default_rng(1)
                                     .uniform(0, 100, n), 2)})
    out = (groupwise_zscore(_ds(df), "k", "v").to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert len(out) == n
    c = np.rint(df["v"].to_numpy() * 100)
    z = np.round((c - c.mean()) / np.sqrt(((c * c).mean() - c.mean() ** 2)),
                 6)
    assert np.allclose(out["zscore"], z, atol=1e-9)


def test_sum_anomaly_flags_planted_spike(ray_session):
    from packs_ray.functions.outliers import sum_anomaly

    rng = np.random.default_rng(5)
    days = np.repeat(pd.date_range("2026-01-01", periods=30, freq="D"), 100)
    vals = np.round(rng.uniform(1, 10, len(days)), 2)
    spike = days == pd.Timestamp("2026-01-15")
    vals[spike] *= 50                              # planted anomalous day
    df = pd.DataFrame({"ts": days, "value": vals})
    out = sum_anomaly(_ds(df), "ts", "value", k=3.0).to_pandas()
    assert len(out) == 30
    flagged = set(pd.to_datetime(out[out["is_outlier"] == True]["day"]))  # noqa: E712
    assert pd.Timestamp("2026-01-15") in flagged
    assert len(flagged) <= 3                        # normal days stay quiet
