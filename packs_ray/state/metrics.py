"""{key, value, scope} metric records + score roll-ups (reference output
data model: profiling_pack/main.py:311-323 metric shape, stringified
values / 2dp scores / 4dp ratios; recommendation levels per
outlier_detection_pack/main.py:22-28).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


def scope_column(column: str, dataset: str) -> dict:
    return {"perimeter": "column", "value": column,
            "parent_scope": {"perimeter": "dataset", "value": dataset}}


def scope_dataset(dataset: str) -> dict:
    return {"perimeter": "dataset", "value": dataset}


def recommendation_level(rate: float) -> str:
    """>0.5 high, >0.3 warning, else info
    (outlier_detection_pack/main.py:22-28 ladder)."""
    if rate > 0.5:
        return "high"
    if rate > 0.3:
        return "warning"
    return "info"


@dataclass
class MetricsCollector:
    """Accumulates metric / recommendation records and writes the
    reference's three JSON artifacts."""

    dataset: str
    metrics: list[dict] = field(default_factory=list)
    recommendations: list[dict] = field(default_factory=list)
    schemas: list[dict] = field(default_factory=list)

    def add_metric(self, key: str, value: Any, column: str | None = None) -> None:
        scope = scope_column(column, self.dataset) if column else scope_dataset(self.dataset)
        self.metrics.append({"key": key, "value": value, "scope": scope})

    def add_ratio(self, key: str, ratio: float, column: str | None = None) -> None:
        self.add_metric(key, str(round(ratio, 4)), column)

    def add_score(self, score: float) -> None:
        self.add_metric("score", str(round(score, 2)))

    def add_recommendation(self, content: str, rtype: str, rate: float,
                           column: str | None = None) -> None:
        scope = scope_column(column, self.dataset) if column else scope_dataset(self.dataset)
        self.recommendations.append({"content": content, "type": rtype,
                                     "scope": scope,
                                     "level": recommendation_level(rate)})

    def save(self, out_dir: str) -> None:
        import os

        os.makedirs(out_dir, exist_ok=True)
        for name, data in (("metrics.json", self.metrics),
                           ("recommendations.json", self.recommendations),
                           ("schemas.json", self.schemas)):
            with open(os.path.join(out_dir, name), "w") as f:
                json.dump(data, f, indent=1, default=str)


def rule_ablation(ds, bits_col: str = "rule_bits"):
    """Per-rule ablation diagnostic over the filter pipeline's rule-bit
    column — the quality-filter tuning table: for every rule,
    ``n_hit`` (turns it fired on), ``n_unique`` (turns ONLY it fired on
    — its marginal contribution; a rule with 0 unique hits is fully
    shadowed by the others), and ``n_kept_if_removed`` (turns that
    would survive with the rule ablated: already-kept turns plus its
    unique drops).  Pure bit arithmetic over exact integers — ONE
    streaming scan of fixed ``n_rules × 3`` int64 partials, no shuffle,
    bit-deterministic under any partitioning.

    Returns a pandas frame (rule, n_hit, n_unique, n_kept_if_removed)
    in rule-bit order plus a final ``__none__`` row carrying the
    baseline (total, kept, kept) for reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from packs_ray.config import RULE_NAMES
    from packs_ray.functions.agg import global_agg

    def partial(batch: pa.Table) -> dict:
        bits = batch.column(bits_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = {"total": len(bits), "kept": int((bits == 0).sum())}
        for i, name in enumerate(RULE_NAMES):
            bit = np.int64(1 << i)
            d[f"hit_{name}"] = int(((bits & bit) != 0).sum())
            d[f"uniq_{name}"] = int((bits == bit).sum())
        return d

    agg = global_agg(ds, partial,
                     lambda p: {c: int(p[c].sum()) for c in p.columns})
    rows = [{"rule": name,
             "n_hit": agg.get(f"hit_{name}", 0),
             "n_unique": agg.get(f"uniq_{name}", 0),
             "n_kept_if_removed": (agg.get("kept", 0)
                                   + agg.get(f"uniq_{name}", 0))}
            for name in RULE_NAMES]
    rows.append({"rule": "__none__", "n_hit": agg.get("total", 0),
                 "n_unique": agg.get("kept", 0),
                 "n_kept_if_removed": agg.get("kept", 0)})
    return pd.DataFrame(rows).astype(
        {"n_hit": "int64", "n_unique": "int64",
         "n_kept_if_removed": "int64"})


def pipeline_metrics(rule_counts: dict[str, int], total: int, kept: int,
                     scrubbed: int, dataset: str) -> MetricsCollector:
    """Roll the flagship pipeline's rule-hit histogram into the
    reference's metric shapes (score = kept fraction, 2dp)."""
    mc = MetricsCollector(dataset)
    mc.add_metric("total_turns", total)
    mc.add_metric("kept_turns", kept)
    mc.add_metric("dropped_turns", total - kept)
    mc.add_metric("scrubbed_turns", scrubbed)
    for rule, n in sorted(rule_counts.items()):
        mc.add_metric(f"rule_hits_{rule}", n, column="text")
        if n and total:
            mc.add_recommendation(
                f"{n} turns dropped by rule '{rule}'.", f"Rule {rule}",
                n / total, column="text")
    if total:
        mc.add_ratio("kept_ratio", kept / total)
        mc.add_score(kept / total)
    return mc
