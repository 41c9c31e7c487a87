"""Outlier detection: two-phase fit/score (the reference's KNN template).

Reference: outlier_detection_pack/main.py:201-260 — fit on a (seeded
here; unseeded there) sample of <=100k rows, score every row, inlier
score = 1 - score/(max+eps), outlier if below threshold; univariate per
numeric column plus a multivariate variant (:264-325).

pyod is not in this container; the scorer is plain numpy exact kNN
(the same algorithm class), fit on the driver and broadcast to a
scoring actor pool — the template every fitted-model stage follows.

Scale notes:
- univariate (d=1): train sorted once per actor; per-row kNN found via
  ``searchsorted`` + a 2k-candidate window — exact, O(rows · k), no
  distance matrix.
- multivariate: O(rows · train) distance computation done per-dimension
  in float32 with in-place accumulation (no BLAS: tiny inner dims hit
  a pathological dgemm path here), train capped at ``sample_rows``
  (default 1024 — the scorer is O(rows × train) and memory-bound, and
  the reference itself fits on an unseeded random sample, i.e. the
  score is approximate by design; raise the knob for tighter scores).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _knn_univariate(x: np.ndarray, train_sorted: np.ndarray, k: int) -> np.ndarray:
    """Exact mean-distance-to-k-nearest for 1-d data via sorted window."""
    m = len(train_sorted)
    k = min(k, m)
    pos = np.searchsorted(train_sorted, x)
    # candidate window: k points on each side of the insertion point;
    # out-of-range slots are masked to +inf (clipping would duplicate the
    # boundary training point and underestimate tail scores).  The window
    # always holds >= k in-range slots, so no inf reaches the k smallest.
    offs = np.arange(-k, k)
    idx = pos[:, None] + offs[None, :]
    oob = (idx < 0) | (idx >= m)
    cand = train_sorted[np.clip(idx, 0, m - 1)]   # (n, 2k)
    d = np.abs(cand - x[:, None])
    d[oob] = np.inf
    d.partition(k - 1, axis=1)
    return d[:, :k].mean(axis=1)


def _knn_multivariate(m: np.ndarray, train: np.ndarray, k: int) -> np.ndarray:
    """Exact kNN mean distance; per-dimension accumulation, float32."""
    k = min(k, train.shape[0])
    d2 = np.zeros((m.shape[0], train.shape[0]), dtype=np.float32)
    for j in range(m.shape[1]):
        diff = m[:, j][:, None] - train[:, j][None, :]
        np.multiply(diff, diff, out=diff)
        d2 += diff
    d2.partition(k - 1, axis=1)
    return np.sqrt(d2[:, :k], out=d2[:, :k]).mean(axis=1)


def _encode(df: pd.DataFrame, num_cols: list[str], cat_maps: dict) -> np.ndarray:
    """Numeric columns + one-hot categoricals (≤100 categories/col like
    the reference cap, outlier_detection_pack/main.py:8,271; unknown
    categories encode as all-zeros) → float32 matrix."""
    parts = [df[c].to_numpy(dtype=np.float32)[:, None] for c in num_cols]
    for c, mapping in cat_maps.items():
        idx = df[c].map(mapping).fillna(-1).to_numpy(dtype=np.int64)
        parts.append((idx[:, None] == np.arange(len(mapping))[None, :])
                     .astype(np.float32))
    return np.concatenate(parts, axis=1) if parts else np.zeros((len(df), 0),
                                                                dtype=np.float32)


class KnnScorer:
    """Actor: holds the (broadcast) training sample + categorical
    encoders; scores batches by mean distance to the k nearest training
    points."""

    def __init__(self, state_ref, k: int):
        train, num_cols, cat_maps = ray.get(state_ref)  # loaded once per actor
        train = train.astype(np.float32)
        self.k = k
        self.num_cols = num_cols
        self.cat_maps = cat_maps
        self.univariate = train.shape[1] == 1
        self.train = np.sort(train[:, 0]) if self.univariate else train

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _encode(batch.to_pandas(), self.num_cols, self.cat_maps)
        if self.univariate:
            score = _knn_univariate(m[:, 0], self.train, self.k)
        else:
            score = _knn_multivariate(m, self.train, self.k)
        return batch.append_column(
            "knn_score", pa.array(score.astype(np.float64), type=pa.float64()))


def knn_outliers(ds, columns: list[str], categorical_columns: list[str] | None = None,
                 k: int = 5, sample_rows: int | None = None,
                 outlier_threshold: float = 0.5, seed: int = 42,
                 max_categories: int = 100) -> pd.DataFrame:
    """Univariate/multivariate kNN outlier metrics: normality score per
    the reference roll-up (fraction of inliers).  ``categorical_columns``
    are one-hot encoded with a sample-fitted ≤``max_categories`` map
    (the reference's multivariate path)."""
    cat_cols = categorical_columns or []
    if sample_rows is None:
        sample_rows = 65_536 if len(columns) == 1 and not cat_cols else 1_024
    proj = ds.select_columns(columns + cat_cols)
    total = proj.count()  # parquet metadata only
    if total == 0:
        return pd.DataFrame([{"rows": 0, "outliers": 0,
                              "outlier_percent": 0.0,
                              "normality_score": 1.0}])
    sample = proj.random_sample(min(1.0, sample_rows / max(1, total)), seed=seed)
    sample_df = sample.to_pandas().dropna()[:sample_rows]
    cat_maps = {
        c: {v: i for i, v in enumerate(
            sample_df[c].value_counts().index[:max_categories])}
        for c in cat_cols}
    train = _encode(sample_df, columns, cat_maps).astype(np.float64)
    sref = ray.put((train, columns, cat_maps))

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # fixed pool (one spawn wave), but never the whole cluster — a pool
    # demanding every CPU starves the upstream read and deadlocks
    pool = max(1, min(4, cpus - 1))
    scored = proj.map_batches(KnnScorer, fn_constructor_args=(sref, k),
                              batch_format="pyarrow", batch_size=4096,
                              concurrency=pool)
    # two streaming aggregate passes over the score COLUMN only (scoring
    # runs once — the 8-byte/row column materializes in the object store,
    # never on the driver): pass 1 n+max, pass 2 inlier count using the
    # exact same float expression as the reference roll-up
    from packs_ray.functions.agg import global_agg

    score_col = scored.select_columns(["knn_score"]).materialize()
    agg1 = global_agg(
        score_col,
        lambda b: {"n": b.num_rows,
                   "mx": pa.compute.max(b.column("knn_score")).as_py()},
        lambda p: {"n": int(p["n"].sum()),
                   "mx": float(p["mx"].max()) if p["mx"].notna().any() else 0.0})
    n, mx = agg1["n"], agg1["mx"]

    def count_outliers(b: pa.Table) -> dict:
        s = b.column("knn_score").to_numpy(zero_copy_only=False)
        inlier = 1.0 - s / (mx + 1e-9)
        return {"n_out": int((inlier < outlier_threshold).sum())}

    n_out = global_agg(score_col, count_outliers,
                       lambda p: {"n_out": int(p["n_out"].sum())})["n_out"] \
        if n else 0
    return pd.DataFrame([{
        "rows": n, "outliers": n_out,
        "outlier_percent": round(n_out / n, 4) if n else 0.0,
        "normality_score": round(1 - (n_out / n if n else 0.0), 2),
    }])
