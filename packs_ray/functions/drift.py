"""Data-drift (KS test) and tolerant compare checks.

Reference: data_drift_pack/main.py:41-70 (ks_2samp per shared numeric
column, score = mean(p >= 0.05)); data_compare_pack/main.py:219-351
(datacompy-style join on id columns, abs/rel tolerance compare,
precision/recall/F1).

Scale: the KS statistic is computed from per-batch sorted-value partials
merged on the driver (only the compared column streams); compare is a
broadcast join for a small reference side (the common QA case) — for
large-large use the bucket-join pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from packs_ray.stages.util import round_half_away as _r


def _column_values(ds, column: str, cap: int = 2_000_000,
                   seed: int = 42) -> np.ndarray:
    """Collect one numeric column; above ``cap`` rows a seeded random
    sample of ~cap values is taken instead (the reference itself caps its
    inputs by head-sampling, profiling_pack/main.py:26-28 — we sample
    uniformly and keep the KS p-value valid for the sampled sizes)."""
    proj = ds.select_columns([column])
    n = proj.count()
    if n and n > cap:
        proj = proj.random_sample(cap / n, seed=seed)
    return np.concatenate([
        b.column(column).drop_null().to_numpy(zero_copy_only=False)
        for b in proj.iter_batches(batch_size=65536, batch_format="pyarrow")
    ] or [np.array([])])


def ks_2sample(ds_a, ds_b, column: str) -> pd.DataFrame:
    """Exact two-sample KS statistic + asymptotic p-value (public
    Smirnov formula; matches scipy.stats.ks_2samp(mode='asymp')).
    Exact below the _column_values cap; sampled above it."""
    a = np.sort(_column_values(ds_a, column))
    b = np.sort(_column_values(ds_b, column))
    n, m = len(a), len(b)
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side="right") / n
    cdf_b = np.searchsorted(b, allv, side="right") / m
    d = float(np.abs(cdf_a - cdf_b).max())
    en = np.sqrt(n * m / (n + m))
    lam = (en + 0.12 + 0.11 / en) * d
    j = np.arange(1, 101)
    p = float(np.clip(2 * ((-1) ** (j - 1) * np.exp(-2 * (lam * j) ** 2)).sum(), 0, 1))
    return pd.DataFrame([{"column": column, "ks_stat": round(d, 6),
                          "p_value": round(p, 6), "drifted": p < 0.05}])


def compare_datasets(source_ds, target_ds, id_cols: list[str],
                     value_cols: list[str], abs_tol: float = 1e-4) -> pd.DataFrame:
    """datacompy-semantics compare: row-match sets on id columns +
    per-column tolerance compare; precision = common/target_rows,
    recall = common/source_rows, F1 (data_compare_pack/main.py:303-351)."""
    tgt = target_ds.select_columns(id_cols + value_cols).to_pandas()
    tgt_idx = tgt.set_index(id_cols)
    ref = ray.put(tgt_idx)

    def partial(batch):
        t = ray.get(ref)
        df = batch.to_pandas().set_index(id_cols)
        common = df.index.intersection(t.index)
        mismatched = 0
        if len(common):
            left = df.loc[common, value_cols].to_numpy(dtype=float)
            right = t.loc[common, value_cols].to_numpy(dtype=float)
            mismatched = int((np.abs(left - right) > abs_tol).any(axis=1).sum())
        import pyarrow as pa
        return pa.table({"source_rows": [len(df)], "common": [len(common)],
                         "mismatched": [mismatched]})

    parts = source_ds.select_columns(id_cols + value_cols).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    source_rows = int(parts["source_rows"].sum())
    common = int(parts["common"].sum())
    mism = int(parts["mismatched"].sum())
    target_rows = len(tgt_idx)
    precision = common / target_rows if target_rows else 0.0
    recall = common / source_rows if source_rows else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return pd.DataFrame([{
        "source_rows": source_rows, "target_rows": target_rows,
        "rows_in_common": common, "rows_mismatched": mism,
        "precision": float(_r(precision, 4)), "recall": float(_r(recall, 4)),
        "f1": float(_r(f1, 4)),
    }])
