"""Pattern + numeric validation checks as streaming aggregates.

Reference: pattern_validation_pack/main.py:38-56 (anchored Python-re
match; empty string counts VALID — the :49 quirk), numeric_validation_pack
/main.py:19-61 (range bounds, negative counts, min/max/mean).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg
from packs_ray.rules.patterns import BUILTIN_PATTERNS
from packs_ray.stages.util import str_column
from packs_ray.stages.util import round_half_away as _r


def pattern_validation(ds, rules: list[dict]) -> pd.DataFrame:
    """rules: [{column, type (builtin name) | regex}].  Returns one row per
    rule: invalid_count / invalid_percent / valid_percent (4dp, reference
    rounding pattern_validation_pack/main.py:56).  NaN→"nan" via astype(str)
    and the empty-string-is-valid quirk are reproduced exactly."""
    resolved = []
    for r in rules:
        if r.get("regex"):
            resolved.append((r["column"], "custom_regex", r["regex"]))
        else:
            resolved.append((r["column"], r["type"], BUILTIN_PATTERNS[r["type"]]))

    def _re2_safe(pattern: str) -> bool:
        """Patterns whose Python-re and RE2 semantics coincide (no lazy
        quantifiers, no backreferences, no lookaround) can use the
        vectorized Arrow kernel; others keep the per-value Python loop
        for byte-parity (SURVEY.md §7.4)."""
        return re.search(r"(?:[*+}?]\?)|\\[0-9]|\(\?[=!<]", pattern) is None

    def partial(batch: pa.Table) -> dict:
        import numpy as np
        import pyarrow.compute as pc

        d = {"total": batch.num_rows}
        for i, (col, _name, pattern) in enumerate(resolved):
            # reference: series.astype(str) → NaN becomes "nan"; then
            # bool(match) if value else True (empty string is VALID)
            arr = str_column(batch, col)
            if _re2_safe(pattern):
                s = pc.fill_null(arr, "nan")
                # anchor the WHOLE pattern: a bare '^'+pattern leaves the
                # later branches of a top-level alternation unanchored
                # ('foo|bar' -> '^foo|bar'), diverging from re.match
                anchored = "^(?:" + pattern + ")"
                ok = pc.or_(pc.equal(s, ""),
                            pc.match_substring_regex(s, anchored))
                inv = batch.num_rows - (pc.sum(pc.cast(ok, "int64")).as_py() or 0)
            else:
                compiled = re.compile(pattern)
                vals = arr.to_numpy(zero_copy_only=False)
                inv = 0
                for v in vals:
                    s = "nan" if v is None else str(v)
                    if s and not compiled.match(s):
                        inv += 1
            d[f"inv_{i}"] = inv
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {"total": int(p["total"].sum()),
                **{f"inv_{i}": int(p[f"inv_{i}"].sum()) for i in range(len(resolved))}}

    agg = global_agg(ds, partial, combine)
    total = agg["total"]
    rows = []
    for i, (col, name, _pattern) in enumerate(resolved):
        inv = agg[f"inv_{i}"]
        inv_pct = inv / total if total else 0.0
        rows.append({"column": col, "pattern": name, "invalid_count": inv,
                     "invalid_percent": float(_r(inv_pct, 4)),
                     "valid_percent": float(_r(1 - inv_pct, 4))})
    return pd.DataFrame(rows)


def numeric_range(ds, rules: list[dict]) -> pd.DataFrame:
    """rules: [{column, min?, max?}].  Per rule: below/above/negative
    counts + in-range percent + min/max (numeric_validation semantics;
    mean/sum omitted from the SQL-facing result to keep values
    order-independent — see module scale note)."""

    def partial(batch: pa.Table) -> dict:
        d = {}
        for i, r in enumerate(rules):
            col = batch.column(r["column"]).drop_null()
            n = len(col)
            d[f"n_{i}"] = n
            d[f"below_{i}"] = (pc.sum(pc.cast(pc.less(col, r["min"]), "int64")).as_py() or 0) \
                if r.get("min") is not None else 0
            d[f"above_{i}"] = (pc.sum(pc.cast(pc.greater(col, r["max"]), "int64")).as_py() or 0) \
                if r.get("max") is not None else 0
            d[f"neg_{i}"] = pc.sum(pc.cast(pc.less(col, 0), "int64")).as_py() or 0
            d[f"min_{i}"] = pc.min(col).as_py() if n else None
            d[f"max_{i}"] = pc.max(col).as_py() if n else None
        return d

    def combine(p: pd.DataFrame) -> dict:
        out = {}
        for i in range(len(rules)):
            out[f"n_{i}"] = int(p[f"n_{i}"].sum())
            out[f"below_{i}"] = int(p[f"below_{i}"].sum())
            out[f"above_{i}"] = int(p[f"above_{i}"].sum())
            out[f"neg_{i}"] = int(p[f"neg_{i}"].sum())
            out[f"min_{i}"] = float(p[f"min_{i}"].min())
            out[f"max_{i}"] = float(p[f"max_{i}"].max())
        return out

    agg = global_agg(ds, partial, combine)
    rows = []
    for i, r in enumerate(rules):
        n = agg[f"n_{i}"]
        oob = agg[f"below_{i}"] + agg[f"above_{i}"]
        rows.append({"column": r["column"], "n": n,
                     "below_min": agg[f"below_{i}"], "above_max": agg[f"above_{i}"],
                     "negative_count": agg[f"neg_{i}"],
                     "in_range_percent": float(_r((n - oob) / n, 4)) if n else 1.0,
                     "min_value": agg[f"min_{i}"], "max_value": agg[f"max_{i}"]})
    return pd.DataFrame(rows)
