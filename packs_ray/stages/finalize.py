"""Finalize stage: derive ``keep`` / ``drop_reasons`` from ``rule_bits``.

Vectorized over unique bit values (a batch has few distinct bit
combinations, so list-of-reasons construction is O(unique) Python +
O(n) numpy take).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from packs_ray.config import RULE_NAMES


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
