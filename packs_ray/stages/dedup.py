"""Exact-duplicate detection for the transcript pipeline.

Duplicate semantics follow duplicates_finder_pack (main.py:54-57 —
``duplicates = Σ max(count-1, 0)`` over (role, text) groups); unlike the
reference (metrics only), the pipeline also *marks* every non-first
occurrence with the ``exact_duplicate`` rule bit.  "First" = minimum
(conv_id, turn_idx) lexicographic — a total, deterministic order.

Scale design (narrow-shuffle): full transcript rows NEVER shuffle for
dedup.  A projection of (conv_id, turn_idx, h1, h2) — two vectorized
64-bit content hashes of (role, text), 128 bits total so collisions are
negligible at 10^12 rows — is hash-partitioned on content, each bucket
finds its non-first occurrences vectorized, and the resulting *marks*
(conv_id, turn_idx, h1, h2, k) ride the conversation shuffle (union with
the main rows, same conv bucket) where the ``exact_duplicate`` bit is
OR-ed in.  Exchange volume: ~40 B/row instead of the full text payload.

``k`` is the number of marked occurrences per exact key — needed when
fully identical rows share (conv_id, turn_idx): exactly ``k`` of the
matching rows get the bit (the keep-one-of-identical-twins case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def content_hash128(role: np.ndarray, text: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized 64-bit hashes of (role, text), as int64."""
    P = np.uint64(1099511628211)
    h1 = (pd.util.hash_array(role, hash_key="0123456789123456") * P) ^ \
        pd.util.hash_array(text, hash_key="0123456789123456")
    h2 = (pd.util.hash_array(role, hash_key="6543216543210987") * P) ^ \
        pd.util.hash_array(text, hash_key="6543216543210987")
    return h1.view(np.int64), h2.view(np.int64)


def dedup_marks(raw_ds, num_partitions: int):
    """Dataset of duplicate marks (conv_id, turn_idx, h1, h2, k) from the
    raw transcript table; only the narrow projection shuffles."""
    from packs_ray.functions.agg import bucketed_group_reduce

    def project(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_numpy(zero_copy_only=False).astype(object)
        role = batch.column("role").to_numpy(zero_copy_only=False).astype(object)
        h1, h2 = content_hash128(role, text)
        keep = pd.notna(text)  # null text is never a duplicate
        return pa.table({
            "conv_id": pa.array(batch.column("conv_id").to_numpy(zero_copy_only=False)[keep]),
            "turn_idx": batch.column("turn_idx").filter(pa.array(keep)),
            "h1": pa.array(h1[keep], type=pa.int64()),
            "h2": pa.array(h2[keep], type=pa.int64()),
        })

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        dup = g.duplicated(["h1", "h2"], keep="first")
        d = g[dup]
        if d.empty:
            return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                                 "turn_idx": pd.Series([], dtype="int32"),
                                 "h1": pd.Series([], dtype="int64"),
                                 "h2": pd.Series([], dtype="int64"),
                                 "k": pd.Series([], dtype="int64")})
        return (d.groupby(["conv_id", "turn_idx", "h1", "h2"], sort=False,
                          dropna=False)  # null turn_idx rows still dedup
                .size().reset_index(name="k"))

    proj = raw_ds.map_batches(project, batch_format="pyarrow")
    return bucketed_group_reduce(proj, ["h1", "h2"], reduce_fn, num_partitions)


# ---------------------------------------------------------------------------
# wide variant (kept for comparison/tests): full rows shuffle on content
# ---------------------------------------------------------------------------

def add_content_bucket(num_buckets: int):
    """Batch fn adding ``dbucket`` = hash64(role, text) % num_buckets."""
    from packs_ray.config import RULE_BIT  # noqa: F401  (parity import)

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_numpy(zero_copy_only=False).astype(object)
        role = batch.column("role").to_numpy(zero_copy_only=False).astype(object)
        h = pd.util.hash_array(text) ^ (pd.util.hash_array(role) >> np.uint64(1))
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("dbucket", pa.array(bucket, type=pa.int64()))

    return fn


def process_dedup_bucket(group: pd.DataFrame) -> pd.DataFrame:
    from packs_ray.config import RULE_BIT

    g = group.sort_values(["conv_id", "turn_idx"], kind="stable")
    dup = g.duplicated(subset=["role", "text"], keep="first").to_numpy()
    dup &= g["text"].notna().to_numpy()
    g["rule_bits"] = g["rule_bits"].to_numpy() | dup.astype(np.int64) * RULE_BIT["exact_duplicate"]
    return g


def dedup_stage(ds, num_buckets: int):
    """groupby(content bucket) → mark non-first (role, text) occurrences.
    (Wide variant; the pipeline uses dedup_marks + the conversation
    shuffle instead so full rows shuffle only once.)"""
    ds = ds.map_batches(add_content_bucket(num_buckets), batch_format="pyarrow")
    return ds.groupby("dbucket").map_groups(process_dedup_bucket, batch_format="pandas")
