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


# -------------------------------------------------- binary_eval

def test_binary_eval_perfect_separation(ray_session):
    from packs_ray.functions.drift import binary_eval

    df = pd.DataFrame({"s": [0.9, 0.8, 0.7, 0.2, 0.1],
                       "y": [1, 1, 1, 0, 0]})
    out = binary_eval(_ds(df), "s", "y")
    assert out["n_pos"].iloc[0] == 3 and out["n_neg"].iloc[0] == 2
    assert out["roc_auc"].iloc[0] == 1.0
    assert out["avg_precision"].iloc[0] == 1.0
    assert out["best_f1"].iloc[0] == 1.0
    assert out["best_f1_threshold"].iloc[0] == 0.7


def test_binary_eval_ties_and_closed_form(ray_session):
    from packs_ray.functions.drift import binary_eval

    # one tied score holding 1 pos + 1 neg: the tie contributes 1/2
    # per cross pair.  scores desc: (0.9,P) (0.5,P+N tie) (0.1,N)
    # pairs: (0.9P vs 0.5N)=1, (0.9P vs 0.1N)=1, (0.5P vs 0.5N)=0.5,
    # (0.5P vs 0.1N)=1 -> U=3.5, AUC=3.5/4
    df = pd.DataFrame({"s": [0.9, 0.5, 0.5, 0.1],
                       "y": [1, 1, 0, 0]})
    out = binary_eval(_ds(df), "s", "y")
    assert out["roc_auc"].iloc[0] == round(3.5 / 4, 6)
    # AP groups desc: s=0.9 (p=1,ctp=1,cfp=0): (1/2)*(1/1)
    #                 s=0.5 (p=1,ctp=2,cfp=1): (1/2)*(2/3)
    exp_ap = round(0.5 * 1.0 + 0.5 * (2 / 3), 6)
    assert out["avg_precision"].iloc[0] == exp_ap
    # F1 cuts: @0.9: 2*1/(1+0+2)=2/3; @0.5: 2*2/(2+1+2)=0.8; @0.1: 2*2/6
    assert out["best_f1"].iloc[0] == 0.8
    assert out["best_f1_threshold"].iloc[0] == 0.5


def test_binary_eval_partition_invariance(ray_session):
    from packs_ray.functions.drift import binary_eval

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"s": rng.uniform(0, 5, 500).round(2),
                       "y": rng.randint(0, 2, 500)})
    a = binary_eval(_ds(df).repartition(1), "s", "y")
    b = binary_eval(_ds(df).repartition(9), "s", "y")
    pd.testing.assert_frame_equal(a, b)
    # sanity: random scores give AUC near 0.5
    assert 0.4 < a["roc_auc"].iloc[0] < 0.6


def test_binary_eval_single_class_and_empty(ray_session):
    from packs_ray.functions.drift import binary_eval

    pos_only = pd.DataFrame({"s": [0.3, 0.7], "y": [1, 1]})
    o = binary_eval(_ds(pos_only), "s", "y")
    assert o["roc_auc"].iloc[0] is None
    assert o["avg_precision"].iloc[0] == 1.0
    assert o["best_f1"].iloc[0] == 1.0

    neg_only = pd.DataFrame({"s": [0.3, 0.7], "y": [0, 0]})
    o2 = binary_eval(_ds(neg_only), "s", "y")
    assert o2["roc_auc"].iloc[0] is None
    assert o2["avg_precision"].iloc[0] is None

    empty = pd.DataFrame({"s": pd.Series([None], dtype="float64"),
                          "y": pd.Series([None], dtype="float64")})
    e = binary_eval(_ds(empty), "s", "y")
    assert e["n"].iloc[0] == 0 and e["roc_auc"].iloc[0] is None


# -------------------------------------------------- cluster_split

def test_cluster_split_no_leakage(ray_session):
    import ray.data

    from packs_ray.functions.sampling import cluster_split

    # 300 ids; chain-pair ids 3k..3k+2 into 100 clusters of 3
    ids = pd.DataFrame({"id": np.arange(300, dtype=np.int64)})
    pairs = pd.DataFrame({
        "id_a": [3 * k + i for k in range(100) for i in (0, 1)],
        "id_b": [3 * k + i + 1 for k in range(100) for i in (0, 1)]})
    out = cluster_split(_ds(ids), "id", _ds(pairs),
                        {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .to_pandas()
    assert len(out) == 300
    # every cluster is wholly in one split
    assert (out.groupby("cluster")["split"].nunique() == 1).all()
    # cluster label is the minimum member id
    assert (out["cluster"] == (out["id"] // 3) * 3).all()
    # and the decision matches hash_split on the canonical id
    from packs_ray.functions.sampling import hash_split
    ref = hash_split(_ds(out[["cluster"]].drop_duplicates()), "cluster",
                     {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    merged = out.merge(ref, on="cluster", suffixes=("", "_ref"))
    assert (merged["split"] == merged["split_ref"]).all()


def test_cluster_split_singletons_and_empty_pairs(ray_session):
    from packs_ray.functions.sampling import cluster_split

    ids = pd.DataFrame({"id": np.arange(50, dtype=np.int64)})
    empty_pairs = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                "id_b": pd.Series([], dtype="int64")})
    out = cluster_split(_ds(ids), "id", _ds(empty_pairs),
                        {"train": 0.5, "val": 0.5}).to_pandas()
    assert len(out) == 50
    # singleton clusters label themselves
    assert (out["cluster"] == out["id"]).all()
    from packs_ray.functions.sampling import hash_split
    ref = hash_split(_ds(ids), "id", {"train": 0.5, "val": 0.5}) \
        .to_pandas().rename(columns={"id": "cluster"})
    merged = out.merge(ref, on="cluster", suffixes=("", "_ref"))
    assert (merged["split"] == merged["split_ref"]).all()


def test_cluster_split_partition_invariance(ray_session):
    from packs_ray.functions.sampling import cluster_split

    ids = pd.DataFrame({"id": np.arange(120, dtype=np.int64)})
    pairs = pd.DataFrame({"id_a": np.arange(0, 60, 2, dtype=np.int64),
                          "id_b": np.arange(1, 61, 2, dtype=np.int64)})
    a = cluster_split(_ds(ids).repartition(1), "id", _ds(pairs),
                      {"train": 0.7, "test": 0.3}) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    b = cluster_split(_ds(ids).repartition(8), "id",
                      _ds(pairs).repartition(4),
                      {"train": 0.7, "test": 0.3}) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
