"""Declarative check suite — the engine's plugin surface for the
reference's Great Expectations / Soda / dbt adapters.

Reference: great_expectations_pack/main.py:35-62 (expectation list
dispatched by name, score = passed/total), soda_pack/main.py:54-116
(SodaCL checks on an in-memory frame), dbt_checks_pack/main.py:43-62
(pass/fail roll-up).  Instead of embedding those engines, the same
config shape — a list of named checks with parameters — runs as ONE
streaming pass of partial aggregates (plus one hash-partitioned count
per ``unique`` check, the only type that needs co-location), so a suite
over 10^12 rows costs one scan.

Check types:
- row_count_min:   {type, min}
- not_null:        {type, column}                (all values non-null)
- values_between:  {type, column, min, max}      (all non-null in range)
- values_in_set:   {type, column, values}        (all non-null in set)
- unique:          {type, column}                (no duplicate values)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg


def run_checks(ds, checks: list[dict]) -> pd.DataFrame:
    """One row per check: check_id, type, column, observed (violations,
    or row count for row_count_min), passed — plus a final ``__score__``
    row (checks passed, per the reference roll-up
    great_expectations_pack/main.py:57-62)."""
    scan_checks = [(i, c) for i, c in enumerate(checks)
                   if c["type"] not in ("row_count_min", "unique")]

    def partial(batch: pa.Table) -> dict:
        d = {"rows": batch.num_rows}
        for i, c in scan_checks:
            t = c["type"]
            col = batch.column(c["column"])
            if t == "not_null":
                d[f"viol_{i}"] = col.null_count
            elif t == "values_between":
                v = col.drop_null()
                bad = pc.or_(pc.less(v, c["min"]), pc.greater(v, c["max"]))
                d[f"viol_{i}"] = pc.sum(pc.cast(bad, "int64")).as_py() or 0
            elif t == "values_in_set":
                v = col.drop_null()
                ok = pc.is_in(v, value_set=pa.array(c["values"], type=v.type))
                d[f"viol_{i}"] = len(v) - (pc.sum(pc.cast(ok, "int64")).as_py() or 0)
            else:
                raise ValueError(f"unknown check type {t!r}")
        return d

    def combine(p: pd.DataFrame) -> dict:
        out = {"rows": int(p["rows"].sum())}
        for i, _c in scan_checks:
            out[f"viol_{i}"] = int(p[f"viol_{i}"].fillna(0).sum())
        return out

    agg = global_agg(ds, partial, combine)

    # unique checks: exact cross-block duplicate count via the
    # hash-partitioned grouped count (duplicates_finder semantics)
    for i, c in enumerate(checks):
        if c["type"] == "unique":
            from packs_ray.functions.duplicates import duplicate_metrics

            m = duplicate_metrics(ds, [c["column"]])
            agg[f"viol_{i}"] = int(m["duplicate_rows"].iloc[0])

    rows = []
    n_pass = 0
    for i, c in enumerate(checks):
        if c["type"] == "row_count_min":
            observed = agg["rows"]
            passed = observed >= c["min"]
        else:
            observed = agg[f"viol_{i}"]
            passed = observed == 0
        n_pass += bool(passed)
        rows.append({"check_id": i, "type": c["type"],
                     "column": c.get("column", "__table__"),
                     "observed": int(observed), "passed": bool(passed)})
    rows.append({"check_id": -1, "type": "__score__", "column": "__dataset__",
                 "observed": n_pass, "passed": n_pass == len(checks)})
    return pd.DataFrame(rows)
