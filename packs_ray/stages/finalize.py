"""Finalize stage: derive ``keep`` / ``drop_reasons`` from ``rule_bits``.

Vectorized over unique bit values (a batch has few distinct bit
combinations, so list-of-reasons construction is O(unique) Python +
O(n) numpy take).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from packs_ray.config import RULE_NAMES
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def bits_to_reasons(unique_bits: np.ndarray) -> list[list[str]]:
    out = []
    for b in unique_bits:
        b = int(b)
        out.append([name for i, name in enumerate(RULE_NAMES) if b >> i & 1])
    return out


def finalize_batch(batch: pa.Table) -> pa.Table:
    bits = batch.column("rule_bits").to_numpy(zero_copy_only=False)
    keep = bits == 0
    uniq, inv = np.unique(bits, return_inverse=True)
    reason_lists = bits_to_reasons(uniq)
    reasons = pa.array([reason_lists[i] for i in inv], type=pa.list_(pa.string()))
    batch = batch.append_column("keep", pa.array(keep))
    return batch.append_column("drop_reasons", reasons)


def drop_helper_columns(batch: pa.Table) -> pa.Table:
    helpers = [c for c in ("bucket", "dbucket") if c in batch.column_names]
    return batch.drop_columns(helpers) if helpers else batch


def conversation_summary(out_ds, num_partitions: int | None = None):
    """Per-conversation aggregates over pipeline output: n_turns, n_kept,
    n_scrubbed, n_roles, span seconds — the north star's per-conversation
    metrics, as a bucketed vectorized reduce (no per-conv Python)."""
    import pandas as pd

    from packs_ray.functions.agg import bucketed_group_reduce, reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(out_ds)

    cols = ["conv_id", "turn_idx", "role", "ts", "keep", "pii_bits"]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        # per (conv, role) partials so the distinct-role count stays exact
        # even when a conversation spans partial batches
        g = (df.assign(scrubbed=df["pii_bits"] > 0)
             .groupby(["conv_id", "role"], sort=False, dropna=False)
             .agg(n_turns=("turn_idx", "size"), n_kept=("keep", "sum"),
                  n_scrubbed=("scrubbed", "sum"),
                  ts_min=("ts", "min"), ts_max=("ts", "max"))
             .reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("conv_id", sort=False)
               .agg(n_turns=("n_turns", "sum"), n_kept=("n_kept", "sum"),
                    n_scrubbed=("n_scrubbed", "sum"), n_roles=("role", "nunique"),
                    ts_min=("ts_min", "min"), ts_max=("ts_max", "max"))
               .reset_index())
        span = (out["ts_max"] - out["ts_min"]).dt.total_seconds()
        out["span_seconds"] = span.fillna(0.0)
        return out.drop(columns=["ts_min", "ts_max"])

    parts = out_ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_reduce(parts, ["conv_id"], reduce_fn, num_partitions)
