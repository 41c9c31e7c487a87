"""Skew-salting parity: conversations longer than salt_segment_size are
split across buckets; the role-sequence rule fails open exactly at
non-initial segment heads, identically in engine and oracle."""

import dataclasses

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SALT_K = 64


@pytest.fixture(scope="module")
def salted_cfg():
    from packs_ray.config import DEFAULT_CONFIG

    return dataclasses.replace(DEFAULT_CONFIG, salt_segment_size=SALT_K)


@pytest.fixture(scope="module")
def long_convs():
    """6 conversations x 300 turns: tool turns planted at segment heads
    (64, 128, 192, 256), just after heads, and at violating positions."""
    rng = np.random.default_rng(7)
    rows = []
    base = pd.Timestamp("2026-01-01")
    for c in range(6):
        conv = f"conv{c:03d}"
        for t in range(300):
            if t in (64, 128, 192):
                role = "tool"            # segment head: fail-open expected
            elif t in (65, 130):
                role = "tool"            # after head; validity depends on prev
            elif t % 7 == 3:
                role = "tool"            # mid-segment tool turns (mixed valid)
            else:
                role = ["user", "assistant"][t % 2]
            rows.append({
                "conv_id": conv, "turn_idx": np.int32(t), "role": role,
                "text": f"turn {t} of {conv} " + " ".join(
                    rng.choice(list("the and of a to in is it that this ok".split()), 8)),
                "tool": "search" if role == "tool" else None,
                "ts": base + pd.Timedelta(seconds=int(t)),
            })
    # duplicated turns across segments of the same conv (dedup marks must
    # land in the right salted bucket)
    for k in range(5):
        rows.append({"conv_id": "conv000", "turn_idx": np.int32(290 + k),
                     "role": "user", "text": "turn 10 duplicate payload",
                     "tool": None, "ts": base})
        rows.append({"conv_id": "conv005", "turn_idx": np.int32(10 + k),
                     "role": "user", "text": "turn 10 duplicate payload",
                     "tool": None, "ts": base})
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def test_salted_parity(ray_session, salted_cfg, long_convs):
    import ray.data

    from packs_ray.oracle import oracle_labels
    from packs_ray.pipelines.filter_pipeline import build_filter_pipeline

    tbl = pa.Table.from_pandas(long_convs, preserve_index=False)
    eng = (build_filter_pipeline(ray.data.from_arrow(tbl), salted_cfg,
                                 num_buckets=8)
           .to_pandas()
           .sort_values(["conv_id", "turn_idx", "role", "text"], kind="stable")
           .reset_index(drop=True))
    ora = (oracle_labels(long_convs, salted_cfg)
           .sort_values(["conv_id", "turn_idx", "role", "text"], kind="stable")
           .reset_index(drop=True))

    assert len(eng) == len(ora)
    assert (eng["keep"].to_numpy() == ora["keep"].to_numpy()).all()
    for i, (a, b) in enumerate(zip(eng["drop_reasons"], ora["drop_reasons"])):
        assert list(a) == list(b), f"row {i}: {list(a)} != {list(b)}"
    # the planted segment-head tool turns must NOT be flagged (fail-open)
    heads = eng[eng["turn_idx"].isin([64, 128, 192])]
    assert not heads["drop_reasons"].apply(
        lambda r: "tool_without_assistant" in list(r)).any()
    # duplicates across salted segments are still marked (exactly 9 of the
    # 10 planted identical rows are non-first)
    dup_marked = eng["drop_reasons"].apply(
        lambda r: "exact_duplicate" in list(r)).sum()
    assert dup_marked == 9, dup_marked
