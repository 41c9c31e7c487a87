"""Generic config-driven record validator (FHIR-compliance semantics).

Reference: fhir_compliance_pack/main.py:43-117 — a field-mapping config
names logical fields and their source columns; per record each mapped
field is checked (required / enum / regex pattern / ISO-date /
boolean-like) and a completeness ratio (non-empty mapped fields over
mapped-field count) is accumulated; outputs are the dataset-level
completeness (4dp), validity score (2dp) and validity ratio (4dp).

Ray-Data-first shape: one vectorized ``map_batches`` pass emits integer
partials (rows, valid rows, complete-field count) that reduce through
``global_agg`` — no per-row Python in the reference's nested-loop
style, no driver-side materialization, and integer partials make the
final ratios independent of batch boundaries (bit-identical to a SQL
replica).

Deliberate divergences from the reference, documented:
- Arrow nulls are "missing" everywhere.  The reference iterates pandas
  rows, so a numeric null becomes NaN and ``str(nan) == "nan"`` counts
  as a PRESENT value (passing required checks and failing enum checks);
  that quirk is not reproduced.
- a mapped-but-absent column behaves like the reference: every value
  missing (fails required, contributes 0 completeness).
- half-away-from-zero rounding (SQL ROUND) instead of Python banker's.
"""

from __future__ import annotations

import re
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.stages.util import round_half_away as _r

BOOLEAN_LIKE = {"true", "false", "1", "0", "yes", "no"}


def _is_iso_date(v: str) -> bool:
    try:
        datetime.fromisoformat(v)
        return True
    except (ValueError, TypeError):
        return False


def record_validate(ds, field_mappings: dict[str, str],
                    required_fields: list[str] | None = None,
                    enums: dict[str, list] | None = None,
                    patterns: dict[str, str] | None = None,
                    date_fields: list[str] | None = None,
                    boolean_fields: list[str] | None = None) -> pd.DataFrame:
    """Validate every record against the declarative field config; one
    summary row (records, valid_records, completeness, score,
    validity_ratio)."""
    required = set(required_fields or ())
    enums = {f: {str(x) for x in vs} for f, vs in (enums or {}).items()}
    pats = {f: re.compile(p) for f, p in (patterns or {}).items()}
    dates = set(date_fields or ())
    bools = set(boolean_fields or ())
    n_fields = len(field_mappings)

    def partial(df: pd.DataFrame) -> dict:
        n = len(df)
        valid = np.ones(n, dtype=bool)
        complete = np.zeros(n, dtype=np.int64)
        for f, col in field_mappings.items():
            if col in df.columns:
                s = df[col]
                notna = s.notna().to_numpy()
                sv = s.astype(str)
                nonempty = notna & (sv.str.strip() != "").to_numpy()
            else:
                nonempty = np.zeros(n, dtype=bool)
                sv = pd.Series([""] * n, index=df.index)
            if f in required:
                valid &= nonempty
            if f in enums:
                valid &= ~nonempty | sv.isin(enums[f]).to_numpy()
            if f in pats:
                valid &= ~nonempty | sv.str.match(pats[f]) \
                    .fillna(False).to_numpy(dtype=bool)
            if f in dates:
                uniq = {u: _is_iso_date(u) for u in pd.unique(sv)}
                valid &= ~nonempty | sv.map(uniq).to_numpy(dtype=bool)
            if f in bools:
                valid &= ~nonempty | sv.str.lower().isin(BOOLEAN_LIKE) \
                    .to_numpy()
            complete += nonempty
        return {"n": n, "valid": int(valid.sum()),
                "complete": int(complete.sum())}

    from packs_ray.functions.agg import global_agg

    cols = [c for c in field_mappings.values()
            if c in (ds.schema().names if ds.schema() else [])]
    agg = global_agg(ds.select_columns(cols) if cols else ds,
                     lambda b: partial(b.to_pandas()),
                     lambda p: {"n": int(p["n"].sum()),
                                "valid": int(p["valid"].sum()),
                                "complete": int(p["complete"].sum())},
                     empty_schema=pa.schema(
                         [(c, pa.string()) for c in cols] or
                         [("__none__", pa.string())]))
    n, valid, complete = agg["n"], agg["valid"], agg["complete"]
    ratio = valid / n if n else 0.0
    return pd.DataFrame([{
        "records": n, "valid_records": valid,
        "completeness": float(_r(complete / (n_fields * n), 4))
        if n and n_fields else 0.0,
        "score": float(_r(ratio, 2)),
        "validity_ratio": float(_r(ratio, 4)),
    }])
