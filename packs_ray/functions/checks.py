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
- row_count_between: {type, min, max}
- not_null:        {type, column}                (all values non-null)
- values_between:  {type, column, min, max}      (all non-null in range)
- values_in_set:   {type, column, values}        (all non-null in set)
- unique:          {type, column}                (no duplicate values)
- column_exists:   {type, column}                (schema-level)
- quantile_between: {type, column, quantiles, ranges}  (GE
  expect_column_quantile_values_to_be_between: every exact
  quantile_cont value inside its [lo, hi]; null bound = unbounded;
  observed = out-of-range count; distributed rank selection, never a
  column materialize)
- dtype_in_list:   {type, column, types}         (GE
  expect_column_values_to_be_in_type_list — schema-level, Arrow type
  matched case-insensitively against conventional alias sets)
- column_count_equal / columns_match_set (schema-level table shape:
  GE expect_table_column_count_to_equal / columns_to_match_set with
  ``exact``; observed = mismatch count)
- sum_between / stdev_between: {type, column, min, max} — exact
  integer-cents sums (Σc² rides as a decimal string, the welch_ttest
  convention, so the sample stdev stays exact at any magnitude)
- distinct_count_between: {type, column, min, max} (GE
  unique_value_count — NON-null distinct, one keyed-count shuffle)
- unique with ``columns`` (compound): GE
  expect_compound_columns_to_be_unique
- skipped:         {type, name}                  (surfaced no-op: an
  unmapped upstream check — reported as a row with passed=False and
  excluded from the score denominator, never silently dropped)
Absolute checks accept ``max_violations`` (default 0): the SodaCL
``fail: when > N`` threshold form.

Percent-threshold types (the dqops taxonomy's dominant shape,
dqops-checks-reference.md "ACCEPTED VALUES"/"PATTERNS"/"TEXT": pass when
the satisfied fraction of NON-NULL values ≥ min_percent; a column with
zero non-null values passes — the reference's empty-valid quirk):
- values_in_set_percent:       {type, column, values, min_percent}
- pattern_match_percent:       {type, column, pattern, min_percent}
                               (whole-value RE2 match, ASCII classes)
- pattern_search_percent:      {type, column, pattern, min_percent}
                               (unanchored RE2 search — the GE
                               match_regex / str.contains semantics)
- text_length_between_percent: {type, column, min_len, max_len,
                                min_percent}
- not_null_percent:            {type, column, min_percent} (non-null
                               fraction of ALL rows — the GE ``mostly``
                               form of not-null / SodaCL missing_percent)
- duplicate_percent_max:       {type, column, max_percent} (SodaCL
                               duplicate_percent; duplicate rows /
                               total rows)
- mean_between:                {type, column, min, max}  (dqops
  total_average_match shape; exact int64 cents sum, mean = s/n/100)
- min_between / max_between:   {type, column, min, max}  (GE
  expect_column_min/max_to_be_between; observed = the extremum)
Percent checks accept ``strict=True`` to pass only when the fraction
is STRICTLY above ``min_percent`` (SodaCL ``< P%`` boundary).

``observed`` is the violation count for absolute checks, the satisfied
fraction (6dp) for percent checks, the cents-mean (6dp) for
mean_between — all carried in one float64 column.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg


def _when_mask(batch: pa.Table, w: dict) -> pa.Array:
    """Row-condition mask for a check's ``when`` clause:
    {"column", "op": "=="|"!="|"in", "value"/"values"}.  Rows where the
    condition column is null are excluded (condition not established) —
    the GE row_condition / dqops WHERE-filter convention."""
    col = batch.column(w["column"])
    op = w.get("op", "==")
    if op == "==":
        m = pc.equal(col, w["value"])
    elif op == "!=":
        m = pc.not_equal(col, w["value"])
    elif op == "in":
        m = pc.is_in(col, value_set=pa.array(
            w["values"], type=col.type if not isinstance(
                col, pa.ChunkedArray) else col.type))
    else:
        raise ValueError(f"unknown when-op {op!r}")
    return pc.fill_null(m, False)


def run_checks(ds, checks: list[dict]) -> pd.DataFrame:
    """One row per check: check_id, type, column, observed (violations,
    or row count for row_count_min), passed — plus a final ``__score__``
    row (checks passed, per the reference roll-up
    great_expectations_pack/main.py:57-62).

    Any SCAN check may carry a ``when`` row condition
    (``{"column", "op": ==|!=|in, "value"/"values"}``): the check then
    evaluates only over rows satisfying the condition (GE
    ``row_condition`` / dqops table filter semantics); rows with a null
    condition column are excluded."""
    NOSCAN = ("row_count_min", "row_count_between", "unique",
              "duplicate_percent_max", "column_exists", "skipped",
              "quantile_between", "dtype_in_list", "column_count_equal",
              "columns_match_set", "distinct_count_between")
    for c in checks:
        if c.get("when") is not None and c["type"] in NOSCAN:
            raise ValueError(
                f"when-condition unsupported for {c['type']!r}")
    scan_checks = [(i, c) for i, c in enumerate(checks)
                   if c["type"] not in NOSCAN]
    PCT = ("values_in_set_percent", "pattern_match_percent",
           "pattern_search_percent", "text_length_between_percent",
           "not_null_percent", "column_pair_percent", "null_percent")
    EXT = ("min_between", "max_between")

    def partial(batch: pa.Table) -> dict:
        d = {"rows": batch.num_rows}
        for i, c in scan_checks:
            t = c["type"]
            sub = batch
            if c.get("when") is not None:
                sub = batch.filter(_when_mask(batch, c["when"]))
            col = sub.column(c["column"])
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
            elif t == "not_null_percent":
                # denominator = ALL rows (missing fraction semantics)
                d[f"n_{i}"] = len(col)
                d[f"k_{i}"] = len(col) - col.null_count
            elif t == "null_percent":
                # GE expect_column_values_to_be_null: fraction null
                d[f"n_{i}"] = len(col)
                d[f"k_{i}"] = col.null_count
            elif t == "column_pair_percent":
                # cross-column comparison (GE expect_column_pair_*):
                # denominator = rows where BOTH sides are present
                other = sub.column(c["other"])
                both = pc.and_(pc.is_valid(col), pc.is_valid(other))
                opf = {">": pc.greater, ">=": pc.greater_equal,
                       "<": pc.less, "<=": pc.less_equal,
                       "==": pc.equal}[c.get("op", ">=")]
                ok = pc.and_(opf(col, other), both)
                d[f"n_{i}"] = pc.sum(pc.cast(both, "int64")).as_py() or 0
                d[f"k_{i}"] = pc.sum(pc.cast(ok, "int64")).as_py() or 0
            elif t in PCT:
                v = col.drop_null()
                if t == "values_in_set_percent":
                    ok = pc.is_in(v, value_set=pa.array(c["values"],
                                                        type=v.type))
                elif t == "pattern_match_percent":
                    ok = pc.match_substring_regex(
                        v.cast(pa.string()), f"^(?:{c['pattern']})$")
                elif t == "pattern_search_percent":
                    ok = pc.match_substring_regex(
                        v.cast(pa.string()), c["pattern"])
                    if c.get("negate"):   # GE ..._to_not_match_regex
                        ok = pc.invert(ok)
                else:
                    ln = pc.utf8_length(v.cast(pa.string()))
                    ok = pc.and_(pc.greater_equal(ln, c["min_len"]),
                                 pc.less_equal(ln, c["max_len"]))
                d[f"n_{i}"] = len(v)
                d[f"k_{i}"] = pc.sum(pc.cast(ok, "int64")).as_py() or 0
            elif t in EXT:
                v = col.drop_null()
                if len(v) == 0:
                    d[f"x_{i}"] = None
                elif t == "min_between":
                    d[f"x_{i}"] = pc.min(v).as_py()
                else:
                    d[f"x_{i}"] = pc.max(v).as_py()
            elif t in ("mean_between", "sum_between"):
                v = col.drop_null()
                cents = pc.cast(pc.round(pc.multiply(
                    pc.cast(v, pa.float64()), 100.0), 0), "int64")
                d[f"n_{i}"] = len(v)
                d[f"s_{i}"] = pc.sum(cents).as_py() or 0
            elif t == "stdev_between":
                import numpy as np

                from packs_ray.functions.agg import (_exact_int_sum,
                                                     _exact_prod_sum)

                v = col.drop_null()
                cents = pc.cast(pc.round(pc.multiply(
                    pc.cast(v, pa.float64()), 100.0), 0), "int64") \
                    .to_numpy(zero_copy_only=False)
                d[f"n_{i}"] = len(cents)
                d[f"s_{i}"] = _exact_int_sum(cents)
                # Σc² rides as a decimal string (welch_ttest convention:
                # the exact sum can exceed int64)
                d[f"q_{i}"] = str(_exact_prod_sum(cents, cents))
            else:
                raise ValueError(f"unknown check type {t!r}")
        return d

    def combine(p: pd.DataFrame) -> dict:
        out = {"rows": int(p["rows"].sum())}
        for i, c in scan_checks:
            if c["type"] == "stdev_between":
                out[f"n_{i}"] = int(p[f"n_{i}"].fillna(0).sum())
                out[f"s_{i}"] = int(p[f"s_{i}"].fillna(0).sum())
                out[f"q_{i}"] = sum(int(x) for x in p[f"q_{i}"].dropna())
            elif c["type"] in PCT or c["type"] in ("mean_between",
                                                   "sum_between"):
                out[f"n_{i}"] = int(p[f"n_{i}"].fillna(0).sum())
                key = f"k_{i}" if c["type"] in PCT else f"s_{i}"
                out[key] = int(p[key].fillna(0).sum())
            elif c["type"] in EXT:
                x = p[f"x_{i}"].dropna()
                out[f"x_{i}"] = None if x.empty else (
                    x.min() if c["type"] == "min_between" else x.max())
            else:
                out[f"viol_{i}"] = int(p[f"viol_{i}"].fillna(0).sum())
        return out

    agg = global_agg(ds, partial, combine)

    # unique / duplicate_percent checks: exact cross-block duplicate
    # count via the hash-partitioned grouped count (duplicates_finder
    # semantics)
    for i, c in enumerate(checks):
        if c["type"] in ("unique", "duplicate_percent_max"):
            from packs_ray.functions.duplicates import duplicate_metrics

            # "columns" (compound uniqueness, GE
            # expect_compound_columns_to_be_unique) or single "column"
            m = duplicate_metrics(ds, c.get("columns", [c["column"]]))
            agg[f"viol_{i}"] = int(m["duplicate_rows"].iloc[0])
        elif c["type"] == "distinct_count_between":
            from packs_ray.functions.duplicates import duplicate_metrics

            def _nn(batch: pa.Table, col=c["column"]) -> pa.Table:
                return batch.filter(batch.column(col).is_valid())

            # GE counts NON-NULL unique values (pandas nunique)
            m = duplicate_metrics(
                ds.select_columns([c["column"]]).map_batches(
                    _nn, batch_format="pyarrow"), [c["column"]])
            agg[f"d_{i}"] = int(m["distinct_count"].iloc[0])
        elif c["type"] == "quantile_between":
            # exact quantile_cont via the distributed rank selection
            # (≤2 scans at any row count — never a column materialize)
            from packs_ray.functions.profiling import quantile_thresholds

            agg[f"q_{i}"] = quantile_thresholds(
                ds, c["column"], list(c["quantiles"]))

    schema_names = None
    rows = []
    n_pass = 0
    n_scored = 0
    for i, c in enumerate(checks):
        t = c["type"]
        if t == "skipped":
            rows.append({"check_id": i, "type": f"skipped:{c['name']}",
                         "column": c.get("column", "__unknown__"),
                         "observed": None, "passed": False})
            continue
        if t == "row_count_min":
            observed = agg["rows"]
            passed = observed >= c["min"]
        elif t == "row_count_between":
            observed = agg["rows"]
            passed = c["min"] <= observed <= c["max"]
        elif t == "column_exists":
            if schema_names is None:
                schema_names = set(ds.schema().names)
            observed = int(c["column"] in schema_names)
            passed = bool(observed)
        elif t == "quantile_between":
            qv = agg[f"q_{i}"]
            if qv is None:                      # no non-null values
                observed, passed = None, False
            else:
                viol = sum(
                    1 for v, (qlo, qhi) in zip(qv, c["ranges"])
                    if (qlo is not None and v < qlo)
                    or (qhi is not None and v > qhi))
                observed, passed = viol, viol == 0
        elif t == "dtype_in_list":
            sch = ds.schema()
            tmap = dict(zip(sch.names, sch.types))
            at = tmap.get(c["column"])
            observed = int(at is not None
                           and _dtype_matches(at, c["types"]))
            passed = bool(observed)
        elif t == "column_count_equal":
            observed = len(ds.schema().names)
            passed = observed == c["value"]
        elif t == "columns_match_set":
            have = set(ds.schema().names)
            want = set(c["columns"])
            missing = want - have
            extra = (have - want) if c.get("exact", True) else set()
            observed = len(missing) + len(extra)
            passed = observed == 0
        elif t == "distinct_count_between":
            observed = agg[f"d_{i}"]
            passed = c.get("min", 0) <= observed <= c.get(
                "max", float("inf"))
        elif t == "sum_between":
            n, s = agg[f"n_{i}"], agg[f"s_{i}"]
            observed = round(s / 100.0, 6)
            passed = c["min"] <= observed <= c["max"]
        elif t == "stdev_between":
            n, s, q = agg[f"n_{i}"], agg[f"s_{i}"], agg[f"q_{i}"]
            if n < 2:
                observed, passed = None, False
            else:
                var = (float(q) - float(s) * float(s) / n) / (n - 1)
                observed = round((var ** 0.5) / 100.0, 6)
                passed = c["min"] <= observed <= c["max"]
        elif t == "duplicate_percent_max":
            pct = agg[f"viol_{i}"] / agg["rows"] if agg["rows"] else 0.0
            observed = round(pct, 6)
            passed = (observed < c["max_percent"] if c.get("strict")
                      else observed <= c["max_percent"])
        elif t in PCT:
            n, k = agg[f"n_{i}"], agg[f"k_{i}"]
            pct = (k / n) if n else 1.0        # empty-valid quirk
            observed = round(pct, 6)
            passed = (observed > c["min_percent"] if c.get("strict")
                      else observed >= c["min_percent"])
        elif t == "mean_between":
            n, s = agg[f"n_{i}"], agg[f"s_{i}"]
            mean = (s / n) / 100.0 if n else None
            observed = round(mean, 6) if n else None
            passed = n > 0 and c["min"] <= observed <= c["max"]
        elif t in EXT:
            x = agg[f"x_{i}"]
            observed = None if x is None else float(x)
            passed = x is not None and c["min"] <= x <= c["max"]
        else:
            observed = agg[f"viol_{i}"]
            passed = observed <= c.get("max_violations", 0)
        n_pass += bool(passed)
        n_scored += 1
        rows.append({"check_id": i, "type": c.get("label", t),
                     "column": c.get("column", "__table__"),
                     "observed": observed, "passed": bool(passed)})
    # int observed for absolute checks, float for percent/mean ones —
    # pandas upcasts the column to float64 only when a float is present,
    # so all-absolute suites keep their historical int64 schema.
    # Skipped rows never count toward the score denominator (the
    # reference's hasattr dispatch doesn't count undispatched
    # expectations, great_expectations_pack/main.py:45-49) — but they
    # are visible, passed=False rows, never silent.
    rows.append({"check_id": -1, "type": "__score__", "column": "__dataset__",
                 "observed": n_pass, "passed": n_pass == n_scored})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Declarative ingestion: the reference feeds its check engines from
# config files — a SodaCL YAML (soda_pack/checks.yaml, parsed by the
# soda library in soda_pack/main.py:64) and a Great Expectations
# expectation list (great_expectations_pack/main.py:35-55, dispatched by
# expectation_type).  These parsers map the common subset of both
# grammars onto run_checks rules so existing configs run unchanged.

_SODA_ROW_COUNT = re.compile(
    r"^row_count\s*(>=|>)\s*(\d+)$")
_SODA_ROW_BETWEEN = re.compile(
    r"^row_count\s+between\s+(\d+)\s+and\s+(\d+)$")
_SODA_METRIC = re.compile(
    r"^(missing_count|duplicate_count|invalid_count)\s*\(\s*([^)]+?)\s*\)"
    r"\s*(=|<=|<)\s*0$")
_SODA_METRIC_HEAD = re.compile(
    r"^(missing_count|duplicate_count|invalid_count)\s*\(\s*([^)]+?)\s*\)$")
_SODA_PCT = re.compile(
    r"^(missing_percent|duplicate_percent|invalid_percent)"
    r"\s*\(\s*([^)]+?)\s*\)\s*(<=|<)\s*([0-9.]+)\s*%?$")
_SODA_WHEN = re.compile(r"^when\s*(>|>=)\s*(\d+)$")


def checks_from_sodacl(text: str) -> list[dict]:
    """Parse a SodaCL YAML document into run_checks rules.

    Supported check lines:
      - ``row_count > N`` / ``row_count >= N``       -> row_count_min
      - ``row_count between A and B``                -> row_count_between
      - ``missing_count(col) = 0``                   -> not_null
      - ``duplicate_count(col) = 0``                 -> unique
      - ``invalid_count(col) = 0`` + ``valid values: [...]``
                                                     -> values_in_set
      - ``invalid_count(col) = 0`` + ``valid min/valid max``
                                                     -> values_between
      - ``missing_percent(col) < P%``                -> not_null_percent
      - ``duplicate_percent(col) < P%``              -> duplicate_percent_max
      - ``invalid_percent(col) < P%`` + validity     -> values_in_set_percent
        (denominator convention: non-null values, the engine's percent
        family; Soda divides by total rows — documented divergence)
      - ``metric(col):`` with ``warn: when > N`` / ``fail: when > N``
        attribute blocks (the production SodaCL threshold shape,
        soda_pack/main.py:54-67) -> one rule per level with
        ``max_violations=N``; both levels count toward the score exactly
        as the reference's outcome=="pass" roll-up does
        (soda_pack/main.py:103-107 — a warn outcome is not a pass).
    Check entries may be bare strings or single-key mappings whose value
    holds attributes (name, valid values, valid min/max, warn, fail),
    matching the shapes the soda scanner accepts.  Unsupported lines
    raise — silent skips would report a passing suite that never ran
    the check."""
    import yaml

    doc = yaml.safe_load(text) or {}
    out: list[dict] = []
    for section, body in doc.items():
        checks = body if isinstance(body, list) else \
            (body or {}).get("checks", [])
        for entry in checks:
            if isinstance(entry, dict):
                (line, attrs), = entry.items()
                attrs = attrs or {}
            else:
                line, attrs = str(entry), {}
            line = line.strip()
            m = _SODA_ROW_COUNT.match(line)
            if m:
                op, n = m.group(1), int(m.group(2))
                out.append({"type": "row_count_min",
                            "min": n + (1 if op == ">" else 0)})
                continue
            m = _SODA_ROW_BETWEEN.match(line)
            if m:
                out.append({"type": "row_count_between",
                            "min": int(m.group(1)), "max": int(m.group(2))})
                continue
            m = _SODA_PCT.match(line)
            if m:
                metric, col, op, pct = (m.group(1), m.group(2), m.group(3),
                                        float(m.group(4)) / 100.0)
                strict = op == "<"
                if metric == "missing_percent":
                    out.append({"type": "not_null_percent", "column": col,
                                "min_percent": 1.0 - pct, "strict": strict,
                                "label": f"not_null_percent[{line}]"})
                elif metric == "duplicate_percent":
                    out.append({"type": "duplicate_percent_max",
                                "column": col, "max_percent": pct,
                                "strict": strict,
                                "label": f"duplicate_percent_max[{line}]"})
                else:  # invalid_percent: needs a validity definition
                    if "valid values" not in attrs:
                        raise ValueError(
                            f"invalid_percent check needs 'valid values': "
                            f"{line!r}")
                    out.append({"type": "values_in_set_percent",
                                "column": col,
                                "values": list(attrs["valid values"]),
                                "min_percent": 1.0 - pct, "strict": strict,
                                "label": f"values_in_set_percent[{line}]"})
                continue
            m = _SODA_METRIC_HEAD.match(line)
            if m and ("warn" in attrs or "fail" in attrs):
                metric, col = m.group(1), m.group(2)
                base = {"missing_count": {"type": "not_null", "column": col},
                        "duplicate_count": {"type": "unique", "column": col}}
                if metric == "invalid_count":
                    if "valid values" in attrs:
                        proto = {"type": "values_in_set", "column": col,
                                 "values": list(attrs["valid values"])}
                    elif "valid min" in attrs or "valid max" in attrs:
                        proto = {"type": "values_between", "column": col,
                                 "min": attrs.get("valid min", float("-inf")),
                                 "max": attrs.get("valid max", float("inf"))}
                    else:
                        raise ValueError(
                            f"invalid_count check needs 'valid values' or "
                            f"'valid min'/'valid max': {line!r}")
                else:
                    proto = base[metric]
                for level in ("fail", "warn"):
                    if level not in attrs:
                        continue
                    w = _SODA_WHEN.match(str(attrs[level]).strip())
                    if not w:
                        raise ValueError(
                            f"unsupported {level} threshold "
                            f"{attrs[level]!r} for {line!r} "
                            "(expected 'when > N' / 'when >= N')")
                    n = int(w.group(2)) - (1 if w.group(1) == ">=" else 0)
                    rule = dict(proto)
                    rule["max_violations"] = n
                    rule["label"] = f"{proto['type']}[{line} {level} " \
                                    f"{attrs[level]}]"
                    out.append(rule)
                continue
            m = _SODA_METRIC.match(line)
            if m:
                metric, col = m.group(1), m.group(2)
                if metric == "missing_count":
                    out.append({"type": "not_null", "column": col})
                elif metric == "duplicate_count":
                    out.append({"type": "unique", "column": col})
                else:  # invalid_count: needs a validity definition
                    if "valid values" in attrs:
                        out.append({"type": "values_in_set", "column": col,
                                    "values": list(attrs["valid values"])})
                    elif "valid min" in attrs or "valid max" in attrs:
                        out.append({
                            "type": "values_between", "column": col,
                            "min": attrs.get("valid min", float("-inf")),
                            "max": attrs.get("valid max", float("inf"))})
                    else:
                        raise ValueError(
                            f"invalid_count check needs 'valid values' or "
                            f"'valid min'/'valid max': {line!r}")
                continue
            raise ValueError(f"unsupported SodaCL check: {line!r}")
    return out


def _dtype_matches(arrow_type, names: list[str]) -> bool:
    """True when an Arrow column type answers to any of the given GE
    type-list names (GE suites name pandas/numpy/SQL types loosely —
    'int64', 'INTEGER', 'object', 'DOUBLE' — so each Arrow type accepts
    its conventional alias set, case-insensitively)."""
    import pyarrow.types as pt

    t = arrow_type
    if not isinstance(t, pa.DataType):
        # pandas-block datasets surface plain Python types in
        # ray.data.Schema (e.g. `object` for string columns)
        name = getattr(t, "__name__", str(t)).lower()
        aliases = {name}
        if name == "object":
            aliases |= {"str", "string", "varchar", "text"}
        elif name == "str":
            aliases |= {"object", "string", "varchar", "text"}
        return bool(aliases & {str(n).lower() for n in names})
    aliases: set[str] = {str(t).lower()}
    if pt.is_integer(t):
        aliases |= {"int", "integer"}
        if pt.is_int64(t) or pt.is_uint64(t):
            aliases |= {"bigint", "long", "int64"}
        if t.bit_width <= 32:
            aliases |= {"int32"}
    elif pt.is_floating(t):
        aliases |= {"float", "double", "float64",
                    "double precision", "numeric"}
        if pt.is_float32(t):
            aliases |= {"real", "float32"}
    elif pt.is_string(t) or pt.is_large_string(t):
        aliases |= {"str", "string", "varchar", "text", "object"}
    elif pt.is_boolean(t):
        aliases |= {"bool", "boolean"}
    elif pt.is_timestamp(t):
        aliases |= {"timestamp", "datetime", "datetime64",
                    "datetime64[ns]", "datetime64[us]"}
    elif pt.is_date(t):
        aliases |= {"date"}
    elif pt.is_decimal(t):
        aliases |= {"decimal", "numeric"}
    want = {str(n).lower() for n in names}
    return bool(aliases & want)


def _ge_not_null(kw):
    if kw.get("mostly", 1) < 1:
        return {"type": "not_null_percent", "column": kw["column"],
                "min_percent": kw["mostly"]}
    return {"type": "not_null", "column": kw["column"]}


def _ge_in_set(kw):
    if kw.get("mostly", 1) < 1:
        return {"type": "values_in_set_percent", "column": kw["column"],
                "values": list(kw["value_set"]),
                "min_percent": kw["mostly"]}
    return {"type": "values_in_set", "column": kw["column"],
            "values": list(kw["value_set"])}


_GE_MAP = {
    "expect_column_values_to_not_be_null": _ge_not_null,
    "expect_column_values_to_be_unique":
        lambda kw: {"type": "unique", "column": kw["column"]},
    "expect_column_values_to_be_in_set": _ge_in_set,
    "expect_column_distinct_values_to_be_in_set":
        # distinct-set containment == every non-null value in the set
        lambda kw: {"type": "values_in_set", "column": kw["column"],
                    "values": list(kw["value_set"])},
    "expect_column_values_to_be_between":
        lambda kw: {"type": "values_between", "column": kw["column"],
                    "min": kw.get("min_value", float("-inf")),
                    "max": kw.get("max_value", float("inf"))},
    "expect_column_values_to_match_regex":
        # GE's pandas map metric is str.contains — an unanchored search
        lambda kw: {"type": "pattern_search_percent", "column": kw["column"],
                    "pattern": kw["regex"],
                    "min_percent": kw.get("mostly", 1.0)},
    "expect_column_value_lengths_to_be_between":
        lambda kw: {"type": "text_length_between_percent",
                    "column": kw["column"],
                    "min_len": kw.get("min_value", 0),
                    "max_len": kw.get("max_value", 1 << 62),
                    "min_percent": kw.get("mostly", 1.0)},
    "expect_column_to_exist":
        lambda kw: {"type": "column_exists", "column": kw["column"]},
    "expect_column_mean_to_be_between":
        lambda kw: {"type": "mean_between", "column": kw["column"],
                    "min": kw.get("min_value", float("-inf")),
                    "max": kw.get("max_value", float("inf"))},
    "expect_column_min_to_be_between":
        lambda kw: {"type": "min_between", "column": kw["column"],
                    "min": kw.get("min_value", float("-inf")),
                    "max": kw.get("max_value", float("inf"))},
    "expect_column_max_to_be_between":
        lambda kw: {"type": "max_between", "column": kw["column"],
                    "min": kw.get("min_value", float("-inf")),
                    "max": kw.get("max_value", float("inf"))},
    "expect_column_values_to_not_match_regex":
        lambda kw: {"type": "pattern_search_percent", "column": kw["column"],
                    "pattern": kw["regex"], "negate": True,
                    "min_percent": kw.get("mostly", 1.0)},
    "expect_column_value_lengths_to_equal":
        lambda kw: {"type": "text_length_between_percent",
                    "column": kw["column"],
                    "min_len": kw["value"], "max_len": kw["value"],
                    "min_percent": kw.get("mostly", 1.0)},
    "expect_column_values_to_be_null":
        lambda kw: {"type": "null_percent", "column": kw["column"],
                    "min_percent": kw.get("mostly", 1.0)},
    "expect_column_pair_values_a_to_be_greater_than_b":
        lambda kw: {"type": "column_pair_percent",
                    "column": kw["column_A"], "other": kw["column_B"],
                    "op": ">=" if kw.get("or_equal") else ">",
                    "min_percent": kw.get("mostly", 1.0)},
    "expect_column_pair_values_to_be_equal":
        lambda kw: {"type": "column_pair_percent",
                    "column": kw["column_A"], "other": kw["column_B"],
                    "op": "==", "min_percent": kw.get("mostly", 1.0)},
    "expect_table_row_count_to_be_between":
        lambda kw: ({"type": "row_count_between",
                     "min": kw.get("min_value", 0), "max": kw["max_value"]}
                    if kw.get("max_value") is not None
                    else {"type": "row_count_min",
                          "min": kw.get("min_value", 0)}),
    "expect_table_row_count_to_equal":
        lambda kw: {"type": "row_count_between",
                    "min": kw["value"], "max": kw["value"]},
    "expect_column_quantile_values_to_be_between":
        # quantile semantics pinned to quantile_cont / np.percentile
        # 'linear' (exact, SQL-replicable, distributed rank-select);
        # GE's pandas engine uses 'nearest' interpolation — divergence
        # only where a quantile falls strictly between two distinct
        # order statistics (GE itself allows engine-dependent
        # approximation via allow_relative_error)
        lambda kw: {"type": "quantile_between", "column": kw["column"],
                    "quantiles": [float(q) for q in
                                  kw["quantile_ranges"]["quantiles"]],
                    "ranges": [[None if lo is None else float(lo),
                                None if hi is None else float(hi)]
                               for lo, hi in
                               kw["quantile_ranges"]["value_ranges"]]},
    "expect_column_values_to_be_in_type_list":
        lambda kw: {"type": "dtype_in_list", "column": kw["column"],
                    "types": [str(t) for t in kw["type_list"]]},
    "expect_table_column_count_to_equal":
        lambda kw: {"type": "column_count_equal", "value": kw["value"]},
    "expect_table_columns_to_match_set":
        lambda kw: {"type": "columns_match_set",
                    "columns": list(kw["column_set"]),
                    "exact": bool(kw.get("exact_match", True))},
    "expect_column_sum_to_be_between":
        lambda kw: {"type": "sum_between", "column": kw["column"],
                    "min": kw.get("min_value", float("-inf")),
                    "max": kw.get("max_value", float("inf"))},
    "expect_column_stdev_to_be_between":
        lambda kw: {"type": "stdev_between", "column": kw["column"],
                    "min": kw.get("min_value", float("-inf")),
                    "max": kw.get("max_value", float("inf"))},
    "expect_column_median_to_be_between":
        lambda kw: {"type": "quantile_between", "column": kw["column"],
                    "quantiles": [0.5],
                    "ranges": [[kw.get("min_value"), kw.get("max_value")]]},
    "expect_column_unique_value_count_to_be_between":
        lambda kw: {"type": "distinct_count_between",
                    "column": kw["column"],
                    "min": kw.get("min_value", 0),
                    "max": (kw.get("max_value")
                            if kw.get("max_value") is not None
                            else float("inf"))},
    "expect_compound_columns_to_be_unique":
        lambda kw: {"type": "unique",
                    "columns": list(kw["column_list"]),
                    "column": ",".join(kw["column_list"])},
}


def checks_from_expectations(expectations: list[dict]) -> list[dict]:
    """Map a Great Expectations suite (list of {expectation_type,
    kwargs}) onto run_checks rules.  Unknown expectation types become
    explicit ``skipped`` rules — run_checks surfaces each as a
    passed=False row excluded from the score denominator, mirroring the
    reference's ``hasattr`` dispatch (great_expectations_pack/
    main.py:45-46) while never dropping a check silently."""
    out = []
    for exp in expectations:
        et = exp.get("expectation_type")
        kw = exp.get("kwargs", {})
        fn = _GE_MAP.get(et)
        if fn is not None:
            out.append(fn(kw))
        else:
            out.append({"type": "skipped", "name": str(et),
                        "column": kw.get("column", "__unknown__")})
    return out
