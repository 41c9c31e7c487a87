"""Stateless heuristic-rule stage: `map_batches` fn adding ``rule_bits``.

Zero-copy Arrow in/out; all rule math in packs_ray.rules.turn_rules.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from packs_ray.config import DEFAULT_CONFIG, FilterConfig
from packs_ray.rules.turn_rules import evaluate_turn_rules


def make_heuristics_fn(cfg: FilterConfig = DEFAULT_CONFIG):
    """Returns a batch fn: Table -> Table with an added/updated int64
    ``rule_bits`` column (ORed into any existing one)."""

    def apply_rules(batch: pa.Table) -> pa.Table:
        bits = evaluate_turn_rules(batch, cfg)
        if "rule_bits" in batch.column_names:
            prev = batch.column("rule_bits").to_numpy(zero_copy_only=False)
            bits = bits | prev
            batch = batch.drop_columns(["rule_bits"])
        return batch.append_column("rule_bits", pa.array(bits, type=pa.int64()))

    return apply_rules
