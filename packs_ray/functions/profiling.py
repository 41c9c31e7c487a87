"""Profiling-pack checks as streaming aggregates.

Reference: profiling_pack/main.py:262-400 (table/variable stats,
completeness per column, advanced numeric stats), schema_scanner_pack
(md5 schema hashes).  All partial+final over map_batches — no shuffle,
no full materialization; exact percentiles stream ONLY the one numeric
column to the driver (documented scale note: at 10^12 rows swap in a
t-digest sketch; the correctness path is exact).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import round_half_away as _r


def completeness(ds, columns: list[str]) -> pd.DataFrame:
    """Per-column non-null counts + completeness ratio
    (profiling_pack/main.py:305-323 semantics, unrounded ratio)."""

    def partial(batch: pa.Table) -> dict:
        d = {"total": batch.num_rows}
        for c in columns:
            d[f"nn_{c}"] = batch.num_rows - batch.column(c).null_count
        return d

    def combine(parts: pd.DataFrame) -> dict:
        total = int(parts["total"].sum())
        return {"total": total,
                **{c: int(parts[f"nn_{c}"].sum()) for c in columns}}

    agg = global_agg(ds, partial, combine)
    total = agg["total"]
    rows = [{"column": c, "non_null": agg[c], "total": total,
             "completeness": (agg[c] / total) if total else 1.0}
            for c in columns]
    return pd.DataFrame(rows)


def numeric_column_stats(ds, column: str, percentiles=(10, 25, 75, 90)) -> pd.DataFrame:
    """count / mean / sample+population std / min / max + exact
    percentiles (np.percentile linear == DuckDB quantile_cont), 4dp
    rounding per profiling_pack/main.py:373-400."""

    def partial(batch: pa.Table) -> dict:
        col = batch.column(column)
        v = col.drop_null()
        s = pc.sum(v).as_py() or 0.0
        s2 = pc.sum(pc.multiply(v, v)).as_py() or 0.0
        return {"n": len(v), "s": float(s), "s2": float(s2),
                "mn": pc.min(v).as_py() if len(v) else None,
                "mx": pc.max(v).as_py() if len(v) else None}

    def combine(parts: pd.DataFrame) -> dict:
        n = int(parts["n"].sum())
        s = float(parts["s"].sum())
        s2 = float(parts["s2"].sum())
        mean = s / n if n else 0.0
        var_pop = max(s2 / n - mean * mean, 0.0) if n else 0.0
        var_samp = var_pop * n / (n - 1) if n > 1 else 0.0
        return {"count_": n, "mean_": mean,
                "std_samp": float(np.sqrt(var_samp)),
                "std_pop": float(np.sqrt(var_pop)),
                "min_": float(parts["mn"].min()), "max_": float(parts["mx"].max())}

    agg = global_agg(ds, partial, combine)

    # exact percentiles: stream just this column to the driver
    vals = np.concatenate([
        b.column(column).drop_null().to_numpy(zero_copy_only=False)
        for b in ds.select_columns([column]).iter_batches(
            batch_size=65536, batch_format="pyarrow")
    ]) if agg["count_"] else np.array([])
    pcts = {f"p{p}": (float(_r(np.percentile(vals, p), 4)) if len(vals) else None)
            for p in percentiles}

    row = {"column": column, "n": agg["count_"],
           "mean_value": float(_r(agg["mean_"], 4)),
           "std_samp": float(_r(agg["std_samp"], 4)),
           "std_pop": float(_r(agg["std_pop"], 4)),
           "min_value": float(_r(agg["min_"], 4)), "max_value": float(_r(agg["max_"], 4)),
           **pcts}
    return pd.DataFrame([row])


def schema_hashes(ds) -> pd.DataFrame:
    """md5 drift hashes of column list / ordered list / dtypes
    (schema_scanner_pack/main.py:84-124 semantics)."""
    schema = ds.schema()
    names = list(schema.names)
    types = [str(t) for t in schema.types]
    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    return pd.DataFrame([{
        "columns_hash": h(",".join(sorted(names))),
        "order_hash": h(",".join(names)),
        "dtypes_hash": h(",".join(f"{n}:{t}" for n, t in zip(names, types))),
        "n_columns": len(names),
    }])
