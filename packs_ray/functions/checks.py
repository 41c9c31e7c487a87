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

Percent-threshold types (the dqops taxonomy's dominant shape,
dqops-checks-reference.md "ACCEPTED VALUES"/"PATTERNS"/"TEXT": pass when
the satisfied fraction of NON-NULL values ≥ min_percent; a column with
zero non-null values passes — the reference's empty-valid quirk):
- values_in_set_percent:       {type, column, values, min_percent}
- pattern_match_percent:       {type, column, pattern, min_percent}
                               (whole-value RE2 match, ASCII classes)
- text_length_between_percent: {type, column, min_len, max_len,
                                min_percent}
- mean_between:                {type, column, min, max}  (dqops
  total_average_match shape; exact int64 cents sum, mean = s/n/100)

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


def run_checks(ds, checks: list[dict]) -> pd.DataFrame:
    """One row per check: check_id, type, column, observed (violations,
    or row count for row_count_min), passed — plus a final ``__score__``
    row (checks passed, per the reference roll-up
    great_expectations_pack/main.py:57-62)."""
    scan_checks = [(i, c) for i, c in enumerate(checks)
                   if c["type"] not in ("row_count_min", "unique")]
    PCT = ("values_in_set_percent", "pattern_match_percent",
           "text_length_between_percent")

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
            elif t in PCT:
                v = col.drop_null()
                if t == "values_in_set_percent":
                    ok = pc.is_in(v, value_set=pa.array(c["values"],
                                                        type=v.type))
                elif t == "pattern_match_percent":
                    ok = pc.match_substring_regex(
                        v.cast(pa.string()), f"^(?:{c['pattern']})$")
                else:
                    ln = pc.utf8_length(v.cast(pa.string()))
                    ok = pc.and_(pc.greater_equal(ln, c["min_len"]),
                                 pc.less_equal(ln, c["max_len"]))
                d[f"n_{i}"] = len(v)
                d[f"k_{i}"] = pc.sum(pc.cast(ok, "int64")).as_py() or 0
            elif t == "mean_between":
                v = col.drop_null()
                cents = pc.cast(pc.round(pc.multiply(
                    pc.cast(v, pa.float64()), 100.0), 0), "int64")
                d[f"n_{i}"] = len(v)
                d[f"s_{i}"] = pc.sum(cents).as_py() or 0
            else:
                raise ValueError(f"unknown check type {t!r}")
        return d

    def combine(p: pd.DataFrame) -> dict:
        out = {"rows": int(p["rows"].sum())}
        for i, c in scan_checks:
            if c["type"] in PCT or c["type"] == "mean_between":
                out[f"n_{i}"] = int(p[f"n_{i}"].fillna(0).sum())
                key = f"k_{i}" if c["type"] in PCT else f"s_{i}"
                out[key] = int(p[key].fillna(0).sum())
            else:
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
        t = c["type"]
        if t == "row_count_min":
            observed = agg["rows"]
            passed = observed >= c["min"]
        elif t in PCT:
            n, k = agg[f"n_{i}"], agg[f"k_{i}"]
            pct = (k / n) if n else 1.0        # empty-valid quirk
            observed = round(pct, 6)
            passed = observed >= c["min_percent"]
        elif t == "mean_between":
            n, s = agg[f"n_{i}"], agg[f"s_{i}"]
            mean = (s / n) / 100.0 if n else None
            observed = round(mean, 6) if n else None
            passed = n > 0 and c["min"] <= observed <= c["max"]
        else:
            observed = agg[f"viol_{i}"]
            passed = observed == 0
        n_pass += bool(passed)
        rows.append({"check_id": i, "type": t,
                     "column": c.get("column", "__table__"),
                     "observed": observed, "passed": bool(passed)})
    # int observed for absolute checks, float for percent/mean ones —
    # pandas upcasts the column to float64 only when a float is present,
    # so all-absolute suites keep their historical int64 schema
    rows.append({"check_id": -1, "type": "__score__", "column": "__dataset__",
                 "observed": n_pass, "passed": n_pass == len(checks)})
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
_SODA_METRIC = re.compile(
    r"^(missing_count|duplicate_count|invalid_count)\s*\(\s*([^)]+?)\s*\)"
    r"\s*(=|<=|<)\s*0$")


def checks_from_sodacl(text: str) -> list[dict]:
    """Parse a SodaCL YAML document into run_checks rules.

    Supported check lines (the zero-tolerance forms, which are the only
    ones expressible as exact pass/fail without a threshold model):
      - ``row_count > N`` / ``row_count >= N``       -> row_count_min
      - ``missing_count(col) = 0``                   -> not_null
      - ``duplicate_count(col) = 0``                 -> unique
      - ``invalid_count(col) = 0`` + ``valid values: [...]``
                                                     -> values_in_set
      - ``invalid_count(col) = 0`` + ``valid min/valid max``
                                                     -> values_between
    Check entries may be bare strings or single-key mappings whose value
    holds attributes (name, valid values, valid min/max), matching the
    shapes the soda scanner accepts.  Unsupported lines raise — silent
    skips would report a passing suite that never ran the check."""
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


_GE_MAP = {
    "expect_column_values_to_not_be_null":
        lambda kw: {"type": "not_null", "column": kw["column"]},
    "expect_column_values_to_be_unique":
        lambda kw: {"type": "unique", "column": kw["column"]},
    "expect_column_values_to_be_in_set":
        lambda kw: {"type": "values_in_set", "column": kw["column"],
                    "values": list(kw["value_set"])},
    "expect_column_values_to_be_between":
        lambda kw: {"type": "values_between", "column": kw["column"],
                    "min": kw.get("min_value", float("-inf")),
                    "max": kw.get("max_value", float("inf"))},
    "expect_table_row_count_to_be_between":
        lambda kw: {"type": "row_count_min", "min": kw.get("min_value", 0)},
}


def checks_from_expectations(expectations: list[dict]) -> list[dict]:
    """Map a Great Expectations suite (list of {expectation_type,
    kwargs}) onto run_checks rules.  Unknown expectation types are
    SKIPPED, mirroring the reference's ``hasattr`` dispatch
    (great_expectations_pack/main.py:45-46), so a suite written for a
    richer GE build still runs its supported subset."""
    out = []
    for exp in expectations:
        fn = _GE_MAP.get(exp.get("expectation_type"))
        if fn is not None:
            out.append(fn(exp.get("kwargs", {})))
    return out
