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
