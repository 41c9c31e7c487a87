"""Referential-integrity checks (FK anti-join orphan counting).

Reference: referential_integrity_pack/main.py:16-79 (anti-join orphan
count, multi-column keys).

Scale: broadcast anti-join — the parent key set is collected once
(distinct keys, usually small), shipped via ``ray.put`` and read in every
task's first use; the child table streams through ``map_batches`` and is
never shuffled.  For large-large anti-joins co-partition both sides on
key hash (see packs_ray.stages.dedup bucket pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import round_half_away as _r


def _key_tuples(batch: pa.Table, cols: list[str]) -> np.ndarray:
    if len(cols) == 1:
        return batch.column(cols[0]).to_numpy(zero_copy_only=False)
    arrays = [batch.column(c).to_numpy(zero_copy_only=False) for c in cols]
    return np.array(list(zip(*arrays)), dtype=object)


def fk_orphans(child_ds, child_keys: list[str], parent_ds,
               parent_keys: list[str]) -> pd.DataFrame:
    """Count child rows whose key is absent from the parent key set."""
    # distinct parent keys → driver set → broadcast
    uniq = parent_ds.select_columns(parent_keys).unique(parent_keys[0]) \
        if len(parent_keys) == 1 else None
    if uniq is not None:
        parent_set = set(uniq)
    else:
        rows = parent_ds.select_columns(parent_keys).to_pandas()
        parent_set = set(map(tuple, rows.itertuples(index=False, name=None)))
    ref = ray.put(parent_set)

    def partial(batch: pa.Table) -> dict:
        pset = ray.get(ref)
        if len(child_keys) == 1:
            keys = batch.column(child_keys[0]).to_numpy(zero_copy_only=False)
            ref_arr = np.array(sorted(pset))
            mask = ~np.isin(keys, ref_arr)
            orphans = int(mask.sum())
        else:
            keys = _key_tuples(batch, child_keys)
            orphans = sum(1 for k in keys if k not in pset)
        return {"total": batch.num_rows, "orphans": orphans}

    def combine(p: pd.DataFrame) -> dict:
        return {"total": int(p["total"].sum()), "orphans": int(p["orphans"].sum())}

    agg = global_agg(child_ds, partial, combine)
    total, orphans = agg["total"], agg["orphans"]
    return pd.DataFrame([{
        "child_rows": total, "orphan_rows": orphans,
        "orphan_percent": float(_r(orphans / total, 4)) if total else 0.0,
        "score": max(0.0, 1 - (orphans / total if total else 0.0)),
    }])
