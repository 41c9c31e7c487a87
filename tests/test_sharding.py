"""Sharding / sequence-packing invariants (beyond the SQL parity test
in test_functions.py, which already covers shard_assign_orders and
pack_sequences_documents hash-for-hash)."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from packs_ray.functions.sharding import (assign_shards, pack_sequences,
                                          write_training_shards)


def _docs(n=200):
    rng = np.random.default_rng(7)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": [" ".join(f"w{j}" for j in range(int(rng.integers(0, 40))))
                 for _ in range(n)],
    }))


def test_assign_shards_deterministic_and_in_range(ray_session):
    ds = _docs()
    a = assign_shards(ds, "doc_id", 16).to_pandas().sort_values("doc_id")
    b = assign_shards(_docs(), "doc_id", 16).to_pandas().sort_values("doc_id")
    assert (a["shard"].to_numpy() == b["shard"].to_numpy()).all()
    assert (a["sort_key"].to_numpy() == b["sort_key"].to_numpy()).all()
    assert a["shard"].between(0, 15).all()
    assert a["sort_key"].ge(0).all()          # >>1 keeps int64 positive
    # hash actually spreads: every shard non-empty at n=200, k=16
    assert a["shard"].nunique() == 16


def test_assign_shards_null_ids_masked(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, None, 3], type=pa.int64())}))
    out = assign_shards(ds, "doc_id", 4).to_pandas()
    nulls = out[out["doc_id"].isna()]
    assert nulls["shard"].isna().all() and nulls["sort_key"].isna().all()
    assert out[out["doc_id"].notna()]["shard"].notna().all()


def test_pack_sequences_token_stream_is_gapless(ray_session):
    """Within each partition the docs tile the token stream exactly:
    sorted start offsets are the running sum of token counts, and bins
    follow the integer-division formula (crossing docs span >1 bin)."""
    out = pack_sequences(_docs(300), "doc_id", "text", budget=64,
                         num_partitions=4).to_pandas()
    assert len(out) == 300
    for _, g in out.groupby("part"):
        g = g.sort_values("start_tok")
        starts = g["start_tok"].to_numpy()
        ntok = g["n_tokens"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == (starts + ntok)[:-1]).all()
        width = np.maximum(ntok, 1)
        assert (g["bin_first"].to_numpy() == starts // 64).all()
        assert (g["bin_last"].to_numpy() == (starts + width - 1) // 64).all()
    # some doc actually crosses a bin boundary at this budget
    assert (out["bin_last"] > out["bin_first"]).any()


def test_pack_sequences_empty_doc_pinned(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["a b c", "", "d"]}))
    out = pack_sequences(ds, "doc_id", "text", budget=2,
                         num_partitions=1).to_pandas()
    empty = out[out["n_tokens"] == 0]
    assert (empty["bin_first"] == empty["bin_last"]).all()


def test_write_training_shards_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(_docs(120), "doc_id", 8, out)
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 120
    assert sorted(back["doc_id"]) == list(range(120))
    # partition layout: one directory per non-empty shard
    import os
    dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(dirs) == back["shard"].astype(int).nunique()
    # re-run is the identical permutation
    out2 = str(tmp_path / "shards2")
    write_training_shards(_docs(120), "doc_id", 8, out2)
    back2 = ray.data.read_parquet(out2).to_pandas()
    a = back.sort_values("doc_id")[["shard", "sort_key"]].to_numpy(dtype="int64")
    b = back2.sort_values("doc_id")[["shard", "sort_key"]].to_numpy(dtype="int64")
    assert (a == b).all()


def test_quantile_filter_matches_numpy(ray_session):
    """quantile_threshold == np.percentile(linear) exactly, and the gate
    keeps precisely the >= threshold rows (keep='below' mirrors it)."""
    import ray
    from packs_ray.functions.profiling import (quantile_filter,
                                               quantile_threshold)

    rng = np.random.default_rng(3)
    vals = np.round(rng.uniform(0, 1, 1000), 4)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(range(1000), type=pa.int64()),
        "score": pa.array(vals)}))
    for q in (0.1, 0.5, 0.9):
        thr = quantile_threshold(ds, "score", q)
        assert thr == float(np.percentile(vals, q * 100))
    thr = quantile_threshold(ds, "score", 0.75)
    kept = quantile_filter(ds, "score", 0.75).to_pandas()
    assert set(kept["id"]) == set(np.flatnonzero(vals >= thr))
    low = quantile_filter(ds, "score", 0.75, keep="below").to_pandas()
    assert set(low["id"]) == set(np.flatnonzero(vals <= thr))


def test_quantile_filter_drops_null_scores(ray_session):
    import ray
    from packs_ray.functions.profiling import quantile_filter

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "score": pa.array([0.1, None, 0.9, 0.5])}))
    kept = quantile_filter(ds, "score", 0.5).to_pandas()
    assert 2 not in set(kept["id"])


def test_sft_context_examples_window(ray_session):
    """Context = previous <=k turns in pinned order, conversation-scoped
    (no bleed between adjacent conversations in one bucket), empty for
    a conversation-opening target turn."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sharding import sft_context_examples

    rows = [
        ("c1", 0, "system", "sys prompt"),
        ("c1", 1, "user", "hi"),
        ("c1", 2, "assistant", "hello"),
        ("c1", 3, "user", "more"),
        ("c1", 4, "assistant", "sure"),
        ("c2", 0, "assistant", "opener"),      # no context
        ("c2", 1, "user", None),               # null text -> ''
        ("c2", 2, "assistant", "ans"),
    ]
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int64()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows], type=pa.string())})
    out = (sft_context_examples(ray.data.from_arrow(tbl), "conv_id",
                                "turn_idx", "role", "text", k=2)
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    assert out["target"].tolist() == ["hello", "sure", "opener", "ans"]
    assert out["context"].tolist() == [
        "system: sys prompt\nuser: hi",
        "assistant: hello\nuser: more",
        "",
        "assistant: opener\nuser: ",
    ]


def test_padding_waste_exact(ray_session):
    """padding_waste: hand-computed buckets incl. clip+truncate branch,
    empty buckets omitted, partition-invariant, typed empty output."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sharding import padding_waste

    docs = ["a b c",                 # 3 tokens  -> cap 4
            "a b c d",               # 4         -> cap 4
            " ".join(["x"] * 7),     # 7         -> cap 8
            " ".join(["x"] * 12),    # 12 > 8    -> clipped to 8, trunc
            None, ""]                # both 0 tokens -> cap 4
    ds = ray.data.from_arrow(pa.table({"text": pa.array(
        docs, type=pa.string())})).repartition(3)
    out = padding_waste(ds, "text", capacities=(4, 8)) \
        .sort_values("capacity").reset_index(drop=True)
    # cap 4: docs {3,4,0,0}: sum=7, pad=16-7=9; cap 8: {7,8}: pad=1
    exp = pd.DataFrame({
        "capacity": np.array([4, 8], dtype=np.int64),
        "n_docs": np.array([4, 2], dtype=np.int64),
        "sum_tokens": np.array([7, 15], dtype=np.int64),
        "n_pad": np.array([9, 1], dtype=np.int64),
        "pad_ratio": [round(9 / 16, 6), round(1 / 16, 6)],
        "n_truncated": np.array([0, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(out, exp)

    again = padding_waste(ds.repartition(1), "text", capacities=(4, 8)) \
        .sort_values("capacity").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, again)

    empty = ray.data.from_arrow(pa.table({"text": pa.array(
        [], type=pa.string())}))
    e = padding_waste(empty, "text", capacities=(4, 8))
    assert len(e) == 0 and str(e["n_docs"].dtype) == "int64"


def test_shuffle_plan_counts_and_null_route(ray_session):
    """shuffle_plan: per-partition counts equal a local replica of the
    route hash, null keys land in partition -1, totals preserved."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.sharding import _hash_cols, shuffle_plan

    ids = list(range(200)) + [None] * 7
    ds = ray.data.from_arrow(pa.table({"k": pa.array(ids,
                                                     type=pa.int64())}))
    out = shuffle_plan(ds.repartition(5), "k", 8).to_pandas() \
        .set_index("partition")
    t = pa.table({"k": pa.array(ids, type=pa.int64())})
    h, valid = _hash_cols(t, "k", "plan")
    p = np.where(valid, (h % np.uint64(8)).astype(np.int64), -1)
    exp = {int(x): int((p == x).sum()) for x in np.unique(p)}
    assert out["n_rows"].to_dict() == exp
    assert out.loc[-1, "n_rows"] == 7
    assert out["n_rows"].sum() == len(ids)
