"""Timeliness checks (pinned-now; the reference's wall-clock dependence
is made deterministic via an explicit ``now`` parameter).

Reference: timeliness_pack/main.py:64-67 (score = max(0, 1 -
days_since_latest/365)), :224-250 (dataset = mean of column scores).
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import round_half_away as _r


def staleness(paths: list[str], now: _dt.datetime) -> pd.DataFrame:
    """Days since each input file was last modified
    (timeliness_pack/main.py:150-187 file/folder mtime semantics, with
    ``now`` pinned instead of wall-clock).  Pure input-manifest metadata —
    at scale this is one stat() per fragment, no data read."""
    import os

    rows = []
    for p in sorted(paths):
        mtime = _dt.datetime.fromtimestamp(os.path.getmtime(p))
        days = (now - mtime).days
        rows.append({"path": os.path.basename(p),
                     "days_since_modified": days,
                     "staleness_score": float(_r(max(0.0, 1 - days / 365), 2))})
    return pd.DataFrame(rows)


def timeliness(ds, ts_cols: list[str], now: _dt.datetime) -> pd.DataFrame:
    """Per ts column: latest value, whole days since, score (2dp)."""

    def partial(batch: pa.Table) -> dict:
        return {f"max_{c}": pc.max(batch.column(c)).as_py() for c in ts_cols}

    def combine(p: pd.DataFrame) -> dict:
        return {c: p[f"max_{c}"].max() for c in ts_cols}

    agg = global_agg(ds, partial, combine)
    rows = []
    for c in ts_cols:
        latest = agg[c]
        days = (now - latest).days if latest is not None else None
        score = max(0.0, 1 - days / 365) if days is not None else 0.0
        rows.append({"column": c, "latest_ts": latest, "days_since_latest": days,
                     "timeliness_score": float(_r(score, 2))})
    return pd.DataFrame(rows)
