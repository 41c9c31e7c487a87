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


def _re2_safe(pattern: str) -> bool:
    """Patterns whose Python-re and RE2 semantics coincide (no lazy
    quantifiers, no backreferences, no lookaround) can use the
    vectorized Arrow kernel; others keep the per-value Python loop
    for byte-parity (SURVEY.md §7.4).

    Documented divergence: ``\\d``/``\\s``/``\\w``/``\\b`` are
    Unicode-aware in Python ``re`` but ASCII-only in RE2, so vectorized
    paths treat them as ASCII classes.  This engine standardises on the
    ASCII (RE2) semantics everywhere — pattern/PII rules target ASCII
    identifiers (emails, SSNs, phones) by construction; behaviour on
    non-ASCII digits/boundaries is pinned by
    tests/test_functions.py::test_re2_ascii_semantics_pinned."""
    return re.search(r"(?:[*+}?]\?)|\\[0-9]|\(\?[=!<]", pattern) is None


def pattern_validation(ds, rules: list[dict],
                       skip_nulls: bool = False) -> pd.DataFrame:
    """rules: [{column, type (builtin name) | regex}].  Returns one row per
    rule: invalid_count / invalid_percent / valid_percent (4dp, reference
    rounding pattern_validation_pack/main.py:56).  NaN→"nan" via astype(str)
    and the empty-string-is-valid quirk are reproduced exactly.

    ``skip_nulls=True`` validates non-null values only and divides by the
    per-column non-null count — the reference's auto-detection path
    (pattern_validation_pack/main.py:193, col_data = dropna())."""
    resolved = []
    for r in rules:
        if r.get("regex"):
            resolved.append((r["column"], "custom_regex", r["regex"]))
        else:
            resolved.append((r["column"], r["type"], BUILTIN_PATTERNS[r["type"]]))

    def partial(batch: pa.Table) -> dict:
        import numpy as np
        import pyarrow.compute as pc

        d = {"total": batch.num_rows}
        for i, (col, _name, pattern) in enumerate(resolved):
            # reference: series.astype(str) → NaN becomes "nan"; then
            # bool(match) if value else True (empty string is VALID)
            arr = str_column(batch, col)
            if skip_nulls:
                arr = arr.drop_null()
                d[f"tot_{i}"] = len(arr)
            if _re2_safe(pattern):
                s = pc.fill_null(arr, "nan")
                # anchor the WHOLE pattern: a bare '^'+pattern leaves the
                # later branches of a top-level alternation unanchored
                # ('foo|bar' -> '^foo|bar'), diverging from re.match
                anchored = "^(?:" + pattern + ")"
                ok = pc.or_(pc.equal(s, ""),
                            pc.match_substring_regex(s, anchored))
                inv = len(s) - (pc.sum(pc.cast(ok, "int64")).as_py() or 0)
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
        out = {"total": int(p["total"].sum()),
               **{f"inv_{i}": int(p[f"inv_{i}"].sum()) for i in range(len(resolved))}}
        if skip_nulls:
            out.update({f"tot_{i}": int(p[f"tot_{i}"].sum())
                        for i in range(len(resolved))})
        return out

    agg = global_agg(ds, partial, combine)
    rows, totals = [], []
    for i, (col, name, _pattern) in enumerate(resolved):
        inv = agg[f"inv_{i}"]
        total = agg[f"tot_{i}"] if skip_nulls else agg["total"]
        totals.append(int(total))
        inv_pct = inv / total if total else 0.0
        rows.append({"column": col, "pattern": name, "invalid_count": inv,
                     "invalid_percent": float(_r(inv_pct, 4)),
                     "valid_percent": float(_r(1 - inv_pct, 4))})
    out = pd.DataFrame(rows)
    # per-rule non-null totals for callers that must skip empty columns
    # (the reference's autodetect drops dropna()-empty columns entirely,
    # pattern_validation_pack/main.py:191-193)
    out.attrs["rule_totals"] = totals
    return out


#: name-sniffing branches of the reference's pattern auto-detection
#: (pattern_validation_pack/main.py:196-243) — (predicate, builtin name).
#: The ipv4 predicate keeps the documented precedence quirk at :230:
#: `'ip' in c and 'address' in c or c in [...]` binds as
#: `('ip' in c and 'address' in c) or c in [...]`, so a column such as
#: 'ship_address' (contains both 'ip' and 'address') triggers the check.
_AUTODETECT_BRANCHES = (
    (lambda c: "email" in c or "mail" in c, "email"),
    (lambda c: "uuid" in c or "guid" in c, "uuid"),
    (lambda c: ("ip" in c and "address" in c)
     or c in ("ip", "ip_address", "ipaddress"), "ipv4"),
)


def pattern_autodetect(ds) -> pd.DataFrame:
    """Pattern checks auto-detected from COLUMN NAMES, reference semantics
    (pattern_validation_pack/main.py:179-243): email/mail → email pattern,
    uuid/guid → uuid, and the quirky ipv4 branch (see
    _AUTODETECT_BRANCHES).  Validates non-null values only (:193) and
    appends a ``__dataset__``/'score' row = mean of the 4dp-rounded
    valid_percents, 2dp (:245-249); its invalid_count/invalid_percent are
    0 by construction."""
    empty = pd.DataFrame({"column": pd.Series([], dtype="object"),
                          "pattern": pd.Series([], dtype="object"),
                          "invalid_count": pd.Series([], dtype="int64"),
                          "invalid_percent": pd.Series([], dtype="float64"),
                          "valid_percent": pd.Series([], dtype="float64")})
    sch = ds.schema()
    if sch is None:  # 0-row transformed input: columns unknowable
        return empty
    rules = []
    for c in sch.names:
        cl = c.lower()
        for pred, name in _AUTODETECT_BRANCHES:
            if pred(cl):
                rules.append({"column": c, "type": name})
    if not rules:
        return empty
    out = pattern_validation(ds, rules, skip_nulls=True)
    # reference skips a column whose dropna() leaves 0 values — no metrics
    # row, excluded from the score denominator (:191-193); mirrors
    # latlon_autodetect's n==0 continue
    nonempty = [t > 0 for t in out.attrs["rule_totals"]]
    out = out.loc[nonempty].reset_index(drop=True)
    if out.empty:
        return empty
    score = float(out["valid_percent"].mean())  # mean of ROUNDED values (:56)
    score_row = pd.DataFrame([{
        "column": "__dataset__", "pattern": "score", "invalid_count": 0,
        "invalid_percent": 0.0, "valid_percent": float(_r(score, 2))}])
    return pd.concat([out, score_row], ignore_index=True)


def latlon_autodetect(ds) -> pd.DataFrame:
    """Name-sniffed latitude/longitude range validation over numeric
    columns (accuracy_pack/main.py:85-129): 'lat' → ±90, 'lon'/'lng' →
    ±180; non-null values only; all-null/non-numeric columns skipped."""
    schema = ds.schema()
    empty_cols = ["column", "kind", "n", "invalid_count", "valid_percent"]
    if schema is None:  # 0-row transformed input: columns unknowable
        return pd.DataFrame(columns=empty_cols)
    checks = []
    for c, t in zip(schema.names, schema.types):
        if not (pa.types.is_floating(t) or pa.types.is_integer(t)):
            continue
        cl = c.lower()
        if "lat" in cl:
            checks.append((c, "latitude", -90.0, 90.0))
        if "lon" in cl or "lng" in cl:
            checks.append((c, "longitude", -180.0, 180.0))

    def partial(batch: pa.Table) -> dict:
        d = {}
        for i, (c, _kind, lo, hi) in enumerate(checks):
            col = batch.column(c).drop_null()
            d[f"n_{i}"] = len(col)
            d[f"inv_{i}"] = (pc.sum(pc.cast(
                pc.or_(pc.less(col, lo), pc.greater(col, hi)),
                "int64")).as_py() or 0)
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {c: int(p[c].sum()) for c in p.columns}

    agg = global_agg(ds, partial, combine) if checks else {}
    rows = []
    for i, (c, kind, _lo, _hi) in enumerate(checks):
        n = agg.get(f"n_{i}", 0)
        if n == 0:  # reference skips empty columns (:93, :115)
            continue
        inv = agg[f"inv_{i}"]
        rows.append({"column": c, "kind": kind, "n": n, "invalid_count": inv,
                     "valid_percent": float(_r(1 - inv / n, 4))})
    return pd.DataFrame(rows, columns=["column", "kind", "n", "invalid_count",
                                       "valid_percent"])


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


def fd_violations(ds, lhs: str, rhs: str, *, examples: int = 5,
                  num_partitions: int | None = None):
    """Functional-dependency check ``lhs -> rhs``: a lhs value violates
    the dependency when it maps to more than one distinct rhs value —
    the cross-column consistency rule the per-column checks can't see
    (one customer id with two names, one zip with two cities).

    Returns a one-row summary Dataset: (lhs, rhs, n_lhs_values,
    n_violating, violation_ratio 6dp, example_lhs — up to ``examples``
    violating lhs values as a comma-joined string, smallest first, for
    the report).

    Scale shape: per-batch distinct (lhs, rhs) marks ride one bucketed
    shuffle on lhs; each bucket counts distinct rhs per lhs and emits
    one bounded partial row (+ its own smallest violating examples);
    the driver folds the per-bucket partials.  Rows with null lhs or
    rhs are excluded (SQL COUNT(DISTINCT) semantics)."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([lhs, rhs]).filter(pc.and_(
            batch.column(lhs).is_valid(), batch.column(rhs).is_valid()))
        return batch.group_by([lhs, rhs]).aggregate([])

    parts = ds.map_batches(marks, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        nd = d.groupby(lhs, sort=False)[rhs].nunique()
        bad = nd[nd > 1]
        # examples ordered by STRING representation on both sides
        ex = sorted(str(x) for x in bad.index)[:examples]
        return pd.DataFrame([{
            "n_lhs": len(nd), "n_bad": len(bad),
            "ex": ",".join(ex)}])

    per = bucketed_group_reduce(parts, [lhs], per_bucket,
                                num_partitions).to_pandas()
    if per.empty:
        per = pd.DataFrame([{"n_lhs": 0, "n_bad": 0, "ex": ""}])
    n_lhs = int(per["n_lhs"].sum())
    n_bad = int(per["n_bad"].sum())
    all_ex = sorted((x for s in per["ex"] for x in s.split(",") if x))
    return pd.DataFrame([{
        "lhs": lhs, "rhs": rhs,
        "n_lhs_values": np.int64(n_lhs), "n_violating": np.int64(n_bad),
        "violation_ratio": float(_r(n_bad / n_lhs, 6)) if n_lhs else None,
        "example_lhs": ",".join(all_ex[:examples])}])


_CONTRACT_WIDENINGS = {
    ("int8", "int16"), ("int8", "int32"), ("int8", "int64"),
    ("int16", "int32"), ("int16", "int64"), ("int32", "int64"),
    ("uint8", "uint16"), ("uint16", "uint32"), ("uint32", "uint64"),
    ("float32", "double"), ("float", "double"),
    ("date32", "timestamp[us]"), ("date32[day]", "timestamp[us]"),
    ("string", "large_string"),
}


def schema_contract(ds, contract: list[tuple[str, str, bool]]) -> "pd.DataFrame":
    """Data-contract check of a Dataset's schema against an expected
    column list — the ingestion gate between
    :func:`type_inference` (discovers types) and
    :func:`drift.schema_drift` (diffs two feeds): a producer promised
    (name, type, required) columns; classify each as ok / widened
    (lossless type promotion per the fixed widening table) / mismatch
    / missing, and flag unexpected columns as extra.  Metadata-only —
    no data rows are read.

    ``contract`` entries are (column, arrow-type-string, required);
    optional missing columns report 'missing_optional' (non-fatal).

    Output: one row per contract-or-actual column —
    (column, expected, actual, verdict), sorted by column."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.joins import _arrow_schema

    actual = {f.name: str(f.type) for f in _arrow_schema(ds)}
    rows = []
    seen = set()
    for name, exp, required in contract:
        seen.add(name)
        act = actual.get(name)
        if act is None:
            verdict = "missing" if required else "missing_optional"
        elif act == exp:
            verdict = "ok"
        elif (exp, act) in _CONTRACT_WIDENINGS:
            verdict = "widened"
        else:
            verdict = "mismatch"
        rows.append({"column": name, "expected": exp, "actual": act,
                     "verdict": verdict})
    for name, act in actual.items():
        if name not in seen:
            rows.append({"column": name, "expected": None,
                         "actual": act, "verdict": "extra"})
    return (pd.DataFrame(rows).sort_values("column")
            .reset_index(drop=True))
