"""Exact-duplicate detection stage for the transcript pipeline.

Duplicate semantics follow duplicates_finder_pack (main.py:54-57 —
``duplicates = Σ max(count-1, 0)`` over (role, text) groups); unlike the
reference (metrics only), the pipeline also *marks* every non-first
occurrence with the ``exact_duplicate`` rule bit.  "First" = minimum
(conv_id, turn_idx) lexicographic — a total, deterministic order.

Scale design: rows shuffle on ``bucket = hash64(role, text) %
num_buckets`` so all candidate duplicates co-locate; each bucket is ONE
vectorized pandas frame (sort + ``duplicated(keep="first")`` on the real
columns, so 64-bit hash collisions cannot cause false positives).  Null
texts are never duplicates (they are dropped by null_text anyway).

The broader dedup family (MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine) lives in packs_ray.functions.dedup as standalone
dataset operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.config import RULE_BIT


def add_content_bucket(num_buckets: int):
    """Batch fn adding ``dbucket`` = hash64(role, text) % num_buckets."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_numpy(zero_copy_only=False).astype(object)
        role = batch.column("role").to_numpy(zero_copy_only=False).astype(object)
        h = pd.util.hash_array(text) ^ (pd.util.hash_array(role) >> np.uint64(1))
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        # null text → its own bucket stream, never marked duplicate
        return batch.append_column("dbucket", pa.array(bucket, type=pa.int64()))

    return fn


def process_dedup_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["conv_id", "turn_idx"], kind="stable")
    dup = g.duplicated(subset=["role", "text"], keep="first").to_numpy()
    dup &= g["text"].notna().to_numpy()
    g["rule_bits"] = g["rule_bits"].to_numpy() | dup.astype(np.int64) * RULE_BIT["exact_duplicate"]
    return g


def dedup_stage(ds, num_buckets: int):
    """groupby(content bucket) → mark non-first (role, text) occurrences."""
    ds = ds.map_batches(add_content_bucket(num_buckets), batch_format="pyarrow")
    return ds.groupby("dbucket").map_groups(process_dedup_bucket, batch_format="pandas")
