"""PII scan as a streaming aggregate (detection-only variant of the
pipeline scrub stage).

Reference: pii_scanner_pack/main.py:29-68 — per (column × pattern) hit
counts via Python-re search, plus the row-union ``pii_records_ratio``.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.config import DEFAULT_CONFIG, FilterConfig
from packs_ray.rules.patterns import PII_PREFILTER_CHARS
from packs_ray.stages.util import str_column

from packs_ray.functions.agg import global_agg


def pii_scan(ds, columns: list[str], cfg: FilterConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Rows: per (column, pattern) hit counts; plus a __dataset__ row with
    rows_with_pii / total / pii_records_ratio (4dp)."""
    from packs_ray.functions.validation import _re2_safe

    bank = [(k, p) for k, p in cfg.pii_patterns]
    # RE2-safe patterns run as ONE vectorized Arrow kernel per batch; the
    # Python re loop survives only for lazy-quantifier patterns (the
    # credit-card regex) where RE2 and Python semantics diverge — and only
    # over prefiltered candidate rows
    safe = {k for k, p in bank if _re2_safe(p)}

    def partial(batch: pa.Table) -> dict:
        import numpy as np

        compiled = [(k, re.compile(p)) for k, p in bank if k not in safe]
        d = {"total": batch.num_rows, "rows_with_pii": 0}
        any_hit = np.zeros(batch.num_rows, dtype=bool)
        for col in columns:
            text = str_column(batch, col)
            for key, pat in bank:
                if key in safe:
                    m = pc.match_substring_regex(text, pat).fill_null(False) \
                        .to_numpy(zero_copy_only=False)
                    any_hit |= m
                    d[f"hits_{col}_{key}"] = d.get(f"hits_{col}_{key}", 0) \
                        + int(m.sum())
            if compiled:
                cand = pc.match_substring_regex(
                    text, PII_PREFILTER_CHARS).fill_null(False) \
                    .to_numpy(zero_copy_only=False)
                vals = text.to_numpy(zero_copy_only=False)
                for key, rx in compiled:
                    hits = 0
                    for i in np.flatnonzero(cand):
                        if vals[i] is not None and rx.search(vals[i]):
                            hits += 1
                            any_hit[i] = True
                    d[f"hits_{col}_{key}"] = d.get(f"hits_{col}_{key}", 0) + hits
        d["rows_with_pii"] = int(any_hit.sum())
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {c: int(p[c].fillna(0).sum()) for c in p.columns}

    agg = global_agg(ds, partial, combine)
    rows = []
    for col in columns:
        for key, _ in bank:
            rows.append({"column": col, "pattern": key,
                         "pii_hits": agg.get(f"hits_{col}_{key}", 0)})
    out = pd.DataFrame(rows)
    total = agg["total"]
    out_ds = pd.DataFrame([{
        "column": "__dataset__", "pattern": "pii_records_ratio",
        "pii_hits": agg["rows_with_pii"],
    }])
    return pd.concat([out, out_ds], ignore_index=True)
