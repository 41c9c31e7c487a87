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
