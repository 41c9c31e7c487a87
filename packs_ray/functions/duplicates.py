"""Duplicates-finder checks + exact dedup as distributed operators.

Reference: duplicates_finder_pack/main.py:23-57 (grouped count,
``duplicates = Σ max(count-1, 0)``, distinct, score), :222-231 (the
2dp-round-before-subtract per-dataset score quirk).

Scale: per-batch partial value-counts first (combiner), then a groupby
over unique keys only — the full rows never shuffle for metrics; exact
dedup keeps min(order_col) per key group.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from packs_ray.functions.agg import global_agg, keyed_count


def duplicate_metrics(ds, key_cols: list[str]) -> pd.DataFrame:
    """One row: total_rows, duplicate_rows, distinct_count,
    duplicate_percent (4dp) and score (reference quirk: rate rounded to
    2dp BEFORE 1-x, duplicates_finder_pack/main.py:230-231)."""
    counts = keyed_count(ds, key_cols)

    def partial(batch: pa.Table) -> dict:
        import pyarrow.compute as pc
        c = batch.column("cnt")
        return {"groups": len(c), "rows": pc.sum(c).as_py() or 0,
                "dups": pc.sum(pc.subtract(c, 1)).as_py() or 0}

    def combine(p: pd.DataFrame) -> dict:
        return {k: int(p[k].sum()) for k in ("groups", "rows", "dups")}

    agg = global_agg(counts, partial, combine)
    rows, dups, groups = agg["rows"], agg["dups"], agg["groups"]
    rate = dups / rows if rows else 0.0
    return pd.DataFrame([{
        "total_rows": rows, "duplicate_rows": dups, "distinct_count": groups,
        "duplicate_percent": round(rate, 4),
        "score": max(0.0, 1 - round(rate, 2)),
    }])


def dedup_exact(ds, key_cols: list[str], order_col: str):
    """Exact dedup: keep the row with min(order_col) per key group.
    Returns a lazy Dataset of (key_cols..., order_col) survivors.

    (For full-row survivors join the result back on order_col, or use the
    pipeline-level dedup_stage which marks rows in place.)
    """
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [order_col]).to_pandas()
        out = df.groupby(key_cols, dropna=False, sort=False)[order_col].min().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(key_cols).aggregate(Min(order_col, alias_name=order_col))
