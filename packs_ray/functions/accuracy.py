"""Decimal-precision accuracy checks.

Reference: accuracy_pack/main.py:49-83 — per float column, count decimal
digits of each value via ``str(x).split(".")[1]``, take the mode, and
score the column as the proportion of values at the modal precision;
the dataset ``float_score`` is the row-weighted mean of column scores.
Python ``str(float)`` semantics (shortest round-trip repr) are kept
exactly via a Python-per-value kernel; the DuckDB oracle uses the VARCHAR
cast, whose shortest-roundtrip rendering matches ``str(float)`` on the
testdata domain (verified value-by-value; divergent reprs exist in corner
regimes, so the kernel stays Python).

Scale: per-batch partial histograms of (column, n_decimals) — tiny —
combined on the driver; the mode is exact, no row ever leaves its block.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import round_half_away as _r


def _decimals_of(v: float) -> int:
    s = str(v)
    if "e" in s or "E" in s:           # scientific repr: treat as max precision
        return 17
    return len(s.split(".")[1]) if "." in s else 0


def decimal_precision(ds, columns: list[str]) -> pd.DataFrame:
    """One row per column: n, mode_decimals, proportion_score (4dp), plus
    a final ``__dataset__`` row with the row-weighted float_score
    (accuracy_pack/main.py:76-83)."""

    def partial(batch: pa.Table) -> dict:
        d = {}
        for ci, col in enumerate(columns):
            vals = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
            cnt = Counter(_decimals_of(float(v)) for v in vals)
            # encode histogram as fixed columns dec_<ci>_<k> (k ≤ 17)
            d[f"n_{ci}"] = len(vals)
            for k, c in cnt.items():
                d[f"dec_{ci}_{k}"] = c
        return d

    def combine(p: pd.DataFrame) -> dict:
        out = {}
        for ci in range(len(columns)):
            out[f"n_{ci}"] = int(p[f"n_{ci}"].sum()) if f"n_{ci}" in p else 0
            hist = {}
            for c in p.columns:
                if c.startswith(f"dec_{ci}_"):
                    hist[int(c.rsplit("_", 1)[1])] = int(p[c].fillna(0).sum())
            out[f"hist_{ci}"] = hist
        return out

    agg = global_agg(ds, partial, combine)
    rows = []
    weighted = 0.0
    total_rows = 0
    for ci, col in enumerate(columns):
        n = agg[f"n_{ci}"]
        hist = agg[f"hist_{ci}"]
        if hist:
            mode_k = max(hist, key=lambda k: (hist[k], -k))
            prop = hist[mode_k] / n if n else 1.0
        else:
            mode_k, prop = 0, 1.0
        rows.append({"column": col, "n": n, "mode_decimals": mode_k,
                     "proportion_score": float(_r(prop, 4))})
        weighted += prop * n
        total_rows += n
    rows.append({"column": "__dataset__", "n": total_rows, "mode_decimals": -1,
                 "proportion_score": float(_r(weighted / total_rows, 4)) if total_rows else 1.0})
    return pd.DataFrame(rows)
