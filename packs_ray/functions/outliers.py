"""Outlier detection: two-phase fit/score (the reference's KNN template).

Reference: outlier_detection_pack/main.py:201-260 — fit on a (seeded
here; unseeded there) sample of <=100k rows, score every row, inlier
score = 1 - score/(max+eps), outlier if below threshold.

pyod is not in this container; the scorer is a plain numpy exact-kNN
mean-distance score (the same algorithm class), fit on the driver and
broadcast to a scoring actor pool — the template every fitted-model
stage follows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


class KnnScorer:
    """Actor: holds the (broadcast) training sample; scores batches by
    mean distance to the k nearest training points."""

    def __init__(self, train_ref, k: int):
        self.train = ray.get(train_ref)  # (n, d) float64, loaded once
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = [c for c in batch.column_names if c != "__score"]
        m = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        # ||x-t||² = ||x||² + ||t||² - 2 x·t  (matmul, no (n,m,d) blow-up)
        d2 = ((m ** 2).sum(1)[:, None] + (self.train ** 2).sum(1)[None, :]
              - 2.0 * (m @ self.train.T))
        np.maximum(d2, 0.0, out=d2)
        k = min(self.k, d2.shape[1])
        knn = np.sqrt(np.partition(d2, k - 1, axis=1)[:, :k])
        score = knn.mean(axis=1)
        return batch.append_column("knn_score", pa.array(score, type=pa.float64()))


def knn_outliers(ds, columns: list[str], k: int = 5, sample_rows: int = 10_000,
                 outlier_threshold: float = 0.5, seed: int = 42) -> pd.DataFrame:
    """Univariate/multivariate kNN outlier metrics: normality score per
    the reference roll-up (fraction of inliers)."""
    proj = ds.select_columns(columns)
    sample = proj.random_sample(min(1.0, sample_rows / max(1, proj.count())), seed=seed)
    train = sample.to_pandas().dropna().to_numpy(dtype=np.float64)[:sample_rows]
    tref = ray.put(train)

    scored = proj.map_batches(KnnScorer, fn_constructor_args=(tref, k),
                              batch_format="pyarrow", concurrency=(1, 4))
    # max score (for normalization) then inlier ratio — two cheap passes
    # over the scored column only
    stats = scored.select_columns(["knn_score"]).to_pandas()["knn_score"].to_numpy()
    mx = float(stats.max()) if len(stats) else 0.0
    inlier = 1.0 - stats / (mx + 1e-9) if len(stats) else np.array([])
    n_out = int((inlier < outlier_threshold).sum())
    n = len(stats)
    return pd.DataFrame([{
        "rows": n, "outliers": n_out,
        "outlier_percent": round(n_out / n, 4) if n else 0.0,
        "normality_score": round(1 - (n_out / n if n else 0.0), 2),
    }])
