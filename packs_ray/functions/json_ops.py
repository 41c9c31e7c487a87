"""Semi-structured (JSON string) column operators.

Event tables almost always carry a JSON ``props``/``payload`` column;
extracting typed fields out of it is the first transform of every
downstream pipeline.  There is no Arrow compute kernel for JSON, so the
parse is per-value by nature (exactly as it is inside any SQL engine) —
the loop below is the C-accelerated ``json.loads`` per value, applied
inside ``map_batches`` so it runs remotely and in parallel, never on
the driver.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa


def json_extract(ds, json_col: str, fields: dict[str, tuple[str, str]],
                 *, keep_cols: list[str] | None = None):
    """Extract scalar fields from a JSON-string column into typed
    top-level columns.

    ``fields`` maps output column -> (dotted path, arrow type name in
    {"int64", "float64", "string", "bool"}).  Null, non-JSON, missing
    paths and type-mismatched values all yield null (SQL
    ``json_extract`` semantics: objects/arrays at a scalar path -> null
    too).  Stateless per-batch, no shuffle."""
    keep = keep_cols

    def extract_one(obj, path: str):
        for part in path.split("."):
            if not isinstance(obj, dict) or part not in obj:
                return None
            obj = obj[part]
        return obj

    def coerce(v, typ: str):
        if v is None or isinstance(v, (dict, list)):
            return None
        try:
            if typ == "int64":
                # JSON numbers only (no "69" string -> 69 coercion
                # surprises; booleans are ints in Python — exclude)
                return int(v) if isinstance(v, (int, float)) \
                    and not isinstance(v, bool) and float(v) == int(v) \
                    else None
            if typ == "float64":
                return float(v) if isinstance(v, (int, float)) \
                    and not isinstance(v, bool) else None
            if typ == "string":
                return v if isinstance(v, str) else None
            if typ == "bool":
                return v if isinstance(v, bool) else None
        except (TypeError, ValueError, OverflowError):
            return None
        raise ValueError(f"unsupported extract type: {typ!r}")

    types = {"int64": pa.int64(), "float64": pa.float64(),
             "string": pa.string(), "bool": pa.bool_()}

    def fn(batch: pa.Table) -> pa.Table:
        raw = batch.column(json_col).to_pylist()
        parsed = []
        for s in raw:                      # per-value parse (see module doc)
            if s is None:
                parsed.append(None)
                continue
            try:
                parsed.append(json.loads(s))
            except (ValueError, TypeError):
                parsed.append(None)
        cols = {c: batch.column(c) for c in
                (keep if keep is not None else
                 [c for c in batch.column_names if c != json_col])}
        for out_col, (path, typ) in fields.items():
            vals = [coerce(extract_one(p, path), typ) for p in parsed]
            cols[out_col] = pa.array(vals, type=types[typ])
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def json_schema_profile(ds, json_col: str, *, max_depth: int = 1):
    """Discover the de-facto schema of a JSON-string column: for every
    key path down to ``max_depth`` (root = depth 0, path ``$``), the
    JSON type distribution and its document frequency — the first
    question anyone asks of a semi-structured feed (which keys exist?
    how often? does a key flip between number and string?), mirroring
    what the profiling pack answers for flat columns
    (/root/reference/profiling_pack/main.py:356-371).

    Types use the canonical JSON names (object / array / string /
    integer / number / boolean / null); ``frac`` is relative to the
    count of PARSEABLE documents (null and invalid JSON rows are
    excluded from the denominator).  Keys containing ``.`` would
    collide with path joining — fine for profiling, documented limit.

    Scale: per-block counting (C-speed json.loads inside map_batches),
    one tiny (path, type) groupby — output is bounded by schema
    vocabulary, never by corpus size."""

    def jtype(v) -> str:
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "integer"
        if isinstance(v, float):
            return "number"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            return "array"
        return "object"

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        n_valid = 0
        for s in batch.column(json_col).to_pylist():
            if s is None:
                continue
            try:
                obj = json.loads(s)
            except (ValueError, TypeError):
                continue
            n_valid += 1
            stack = [("$", obj, 0)]
            while stack:
                path, v, d = stack.pop()
                k = (path, jtype(v))
                counts[k] = counts.get(k, 0) + 1
                if isinstance(v, dict) and d < max_depth:
                    for key, sub in v.items():
                        stack.append((f"{path}.{key}", sub, d + 1))
        paths = [p for p, _ in counts] + ["__docs__"]
        types = [t for _, t in counts] + ["__docs__"]
        ns = list(counts.values()) + [n_valid]
        return pa.table({"path": pa.array(paths, type=pa.string()),
                         "jtype": pa.array(types, type=pa.string()),
                         "n": pa.array(np.asarray(ns, dtype=np.int64))})

    from packs_ray.stages.util import round_half_away as _rr

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["path", "jtype"]).sum("n").to_pandas())
    agg = agg.rename(columns={"sum(n)": "n"})
    if "path" not in agg.columns:  # all blocks empty: schema-less groupby
        return pd.DataFrame({"path": pd.Series(dtype="object"),
                             "jtype": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "frac": pd.Series(dtype="float64")})
    docs = agg[agg["path"] == "__docs__"]
    n_valid = int(docs["n"].iloc[0]) if len(docs) else 0
    out = agg[agg["path"] != "__docs__"].copy()
    out["n"] = out["n"].astype("int64")
    out["frac"] = _rr(out["n"].to_numpy(np.float64) / max(n_valid, 1), 6)
    return (out[["path", "jtype", "n", "frac"]]
            .sort_values(["path", "jtype"]).reset_index(drop=True))
