"""Conversation shuffle stage: restore (conv_id, turn_idx) order and apply
role-sequence validity.

Scale design (SURVEY.md §7.3): instead of one reducer per conversation
(per-tiny-group Python overhead; a mega-conversation = one hot reducer),
rows are shuffled on a *uniform synthetic key* ``bucket =
hash64(conv_id) % num_buckets`` and each bucket is processed as ONE
vectorized pandas frame: sort by (conv_id, turn_idx) (stable), lag the
role column once, and mask cross-conversation boundaries.  Semantics are
exact for every conversation regardless of gaps/duplicate turn_idx; skew
is bounded by ``max_conv_turns + n/num_buckets`` rows per bucket.

Skew salting for pathological mega-conversations (north rule): rows with
``turn_idx >= cfg.salt_segment_size`` are salted into per-segment buckets
``hash64(conv_id, turn_idx // K)``; the first row of such a non-initial
segment has an unknown predecessor and the role-sequence rule FAILS OPEN
there (documented approximation, only at multi-million-turn boundaries
with the default K).

Role-sequence rule (enum/required semantics per
fhir_compliance_pack/main.py:67-98 applied to transcripts): a ``tool``
turn is valid iff the immediately preceding turn of the same conversation
(by stable turn_idx order) has role ``assistant`` or ``tool``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.config import DEFAULT_CONFIG, RULE_BIT, FilterConfig

_PREV_OK = frozenset({"assistant", "tool"})


def add_conv_bucket(num_buckets: int, cfg: FilterConfig = DEFAULT_CONFIG):
    """Batch fn adding the shuffle key ``bucket`` (int64)."""
    K = cfg.salt_segment_size

    def fn(batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False).astype(object)
        h = pd.util.hash_array(conv)
        ti = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        ti = np.nan_to_num(ti.astype(np.float64), nan=0.0).astype(np.int64)
        seg = np.maximum(ti, 0) // K
        salted = h ^ (seg.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        bucket = (salted % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    return fn


def process_conv_bucket(group: pd.DataFrame, salt_k: int = DEFAULT_CONFIG.salt_segment_size) -> pd.DataFrame:
    """Vectorized per-bucket: stable (conv_id, turn_idx) sort + role lag."""
    g = group.sort_values(["conv_id", "turn_idx"], kind="stable")
    n = len(g)
    if n == 0:
        return g
    role = g["role"].to_numpy(dtype=object)
    conv = g["conv_id"].to_numpy(dtype=object)
    prev_role = np.roll(role, 1)
    same_conv = np.empty(n, dtype=bool)
    same_conv[0] = False
    same_conv[1:] = conv[1:] == conv[:-1]
    is_tool = role == "tool"
    prev_ok = (prev_role == "assistant") | (prev_role == "tool")
    violation = is_tool & ~(same_conv & prev_ok)
    # fail-open for the first row of a salted (non-initial) mega-conv segment:
    # its true predecessor normally lives in another bucket.  Applied at
    # every (conv, seg>0) head — even when hash collisions co-locate
    # adjacent segments — so the result is deterministic and the oracle
    # can replicate it exactly (stage docstring).
    ti = np.nan_to_num(g["turn_idx"].to_numpy(dtype=np.float64), nan=0.0).astype(np.int64)
    seg = np.maximum(ti, 0) // salt_k
    seg_head = ~same_conv | (seg != np.roll(seg, 1))
    violation &= ~(seg_head & (seg > 0))
    bits = g["rule_bits"].to_numpy()
    g["rule_bits"] = bits | violation.astype(np.int64) * RULE_BIT["tool_without_assistant"]
    return g


def conversation_stage(ds, num_buckets: int, cfg: FilterConfig = DEFAULT_CONFIG):
    """groupby(bucket) → vectorized per-bucket role-sequence + ordering."""
    ds = ds.map_batches(add_conv_bucket(num_buckets, cfg), batch_format="pyarrow")
    salt_k = cfg.salt_segment_size
    return ds.groupby("bucket").map_groups(
        lambda g: process_conv_bucket(g, salt_k), batch_format="pandas")
