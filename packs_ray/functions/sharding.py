"""Training-output sharding and sequence packing.

Two operators a pretraining-data pipeline needs downstream of
filtering, neither present in the reference (whose outputs are metric
JSON + xlsx exports — profiling_pack/main.py:272-289):

* ``assign_shards`` — the "global shuffle before writing training
  shards" step.  Instead of ``ds.random_shuffle()`` (RNG + order
  dependent, so a retried task or a resumed run produces a DIFFERENT
  shuffle), shard and order are pure functions of the row id:
  ``shard = finalize(fnv(id) * salt) % n_shards`` and the within-shard
  sort key is the remaining hash bits.  Any worker, any retry, any
  cluster size reproduces the identical permutation — which also makes
  the result oracle-checkable.  Scale shape: the hash columns are
  embarrassingly parallel; routing rows to shard files is the ONE
  full-row exchange any global shuffle must pay (``write_training_shards``
  pays it via a partitioned write, not a driver sort).

* ``pack_sequences`` — GPT-style "concat and chunk" sequence packing:
  documents are laid end-to-end in a deterministic order and cut every
  ``budget`` tokens; a document crossing a cut spans two bins.  Packing
  is partition-local (partition = hash(id) % num_partitions): each
  partition is an independent token stream, so partitions pack in
  parallel and a partition is the unit of resume.  The within-partition
  running offset is the one inherently sequential scan — it runs as a
  vectorized cumsum over a single bucket, never row-at-a-time.
  Token counts use the engine's whitespace convention
  (textstats.token_counts: ``\\S+`` runs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.sampling import _salt_constant
from packs_ray.functions.sketches import _finalize, _fnv1a_str


def _hash_cols(batch: pa.Table, id_col: str, salt: str):
    """(finalized uint64 hash, valid mask) for the id column."""
    h, valid = _fnv1a_str(batch.column(id_col))
    return _finalize(h * _salt_constant(salt)), valid


def assign_shards(ds, id_col: str, n_shards: int, *, salt: str = "shard"):
    """Append ``shard`` (int32) and ``sort_key`` (int64) columns.

    shard = finalize(fnv1a(str(id)) * salt_const) % n_shards;
    sort_key = the same hash >> 1 (kept positive for int64).  Rows with
    a null id get null shard/sort_key (they cannot be routed
    deterministically — surface them instead of guessing).
    """
    ns = np.uint64(n_shards)

    def fn(batch: pa.Table) -> pa.Table:
        h, valid = _hash_cols(batch, id_col, salt)
        shard = (h % ns).astype(np.int32)
        key = (h >> np.uint64(1)).astype(np.int64)
        return (batch
                .append_column("shard", pa.array(shard, type=pa.int32(),
                                                 mask=~valid))
                .append_column("sort_key", pa.array(key, type=pa.int64(),
                                                    mask=~valid)))

    return ds.map_batches(fn, batch_format="pyarrow")


def write_training_shards(ds, id_col: str, n_shards: int, out_dir: str, *,
                          salt: str = "shard"):
    """Deterministically shuffle + write one parquet directory per shard
    (resumable unit).  One full-row exchange (the partitioned write)
    plus a within-shard sort by the hash key — this IS the global
    shuffle, expressed so a re-run writes byte-identical shards."""
    with_cols = assign_shards(ds, id_col, n_shards, salt=salt)
    (with_cols
     .sort(["shard", "sort_key"])
     .write_parquet(out_dir, partition_cols=["shard"]))


def pack_sequences(ds, id_col: str, text_col: str, budget: int, *,
                   num_partitions: int = 32, salt: str = "pack"):
    """Concat-and-chunk packing plan: lazy Dataset of
    ``(id, part, start_tok, n_tokens, bin_first, bin_last)``.

    Within each hash partition documents are ordered by
    ``(sort_key, id)`` and laid end-to-end; ``start_tok`` is the
    running token offset, and the document occupies training bins
    ``start_tok // budget .. (start_tok + max(n_tokens,1) - 1) // budget``
    (an empty document is pinned to the bin at its offset).  Documents
    with a null id are dropped (cannot be ordered deterministically).

    ``num_partitions`` bounds the size of the sequential scan: size it
    so one partition ≈ one block (at 100 TB that means ~1e6 partitions,
    still a single int32 column to shuffle — the full text never moves,
    only (id, hash, n_tokens) triples).
    """
    import pandas as pd

    from packs_ray.stages.util import str_column

    np_u = np.uint64(num_partitions)

    def prep(batch: pa.Table) -> pa.Table:
        h, valid = _hash_cols(batch, id_col, salt)
        text = str_column(batch, text_col)
        ntok = pc.count_substring_regex(text, r"\S+").fill_null(0) \
            .cast(pa.int64())
        t = pa.table({
            "id": batch.column(id_col),
            "part": pa.array((h % np_u).astype(np.int32)),
            "sort_key": pa.array((h >> np.uint64(1)).astype(np.int64)),
            "n_tokens": ntok,
        })
        return t.filter(pa.array(valid))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sort_key", "id"], kind="stable")
        width = np.maximum(df["n_tokens"].to_numpy(), 1)
        start = np.cumsum(df["n_tokens"].to_numpy()) - df["n_tokens"].to_numpy()
        return pd.DataFrame({
            "id": df["id"].to_numpy(),
            "part": df["part"].to_numpy(),
            "start_tok": start,
            "n_tokens": df["n_tokens"].to_numpy(),
            "bin_first": start // budget,
            "bin_last": (start + width - 1) // budget,
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return pack(g)

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_part, batch_format="pandas"))


def sft_context_examples(ds, conv_col: str, turn_col: str, role_col: str,
                         text_col: str, *, target_role: str = "assistant",
                         k: int = 3, num_partitions: int | None = None):
    """SFT training-example assembly from conversation transcripts: one
    row per ``target_role`` turn with ``context`` = the previous <=k
    turns rendered ``role: text`` and newline-joined, and ``target`` =
    the turn's own text — the (prompt, completion) pair builder.

    Turn order is pinned to (turn_idx, role, coalesce(text, '')) so
    duplicate turn indices (dirty transcripts) order identically here
    and in the SQL-window oracle.  One conversation-bucketed shuffle;
    context assembly is k vectorized shift-concats per bucket, no
    Python row loop."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    cols = [conv_col, turn_col, role_col, text_col]

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["__t"] = g[text_col].fillna("")
        g = g.sort_values([conv_col, turn_col, role_col, "__t"],
                          kind="mergesort")
        fmt = (g[role_col].fillna("") + ": " + g["__t"]).to_numpy(object)
        conv = g[conv_col].to_numpy(object)
        n = len(g)
        ctx = np.full(n, "", dtype=object)
        have = np.zeros(n, dtype=bool)
        for j in range(k, 0, -1):            # oldest context line first
            prev = np.roll(fmt, j)
            pconv = np.roll(conv, j)
            ok = np.zeros(n, dtype=bool)
            ok[j:] = pconv[j:] == conv[j:]   # same conversation only
            ctx = np.where(ok, np.where(have, ctx + "\n", "") + prev, ctx)
            have = have | ok
        out = g.loc[:, [conv_col, turn_col]].copy()
        out["context"] = ctx
        out["target"] = g["__t"].to_numpy(object)
        return out[g[role_col].to_numpy(object) == target_role]

    proj = ds.select_columns(cols)
    return bucketed_group_reduce(proj, [conv_col], per_conv,
                                 num_partitions)


def padding_waste(ds, text_col: str, capacities: tuple[int, ...] = (
        64, 128, 256, 512, 1024), *, id_col: str | None = None):
    """Length-bucket batching profile: assign every document to the
    smallest training-batch capacity that fits its whitespace token
    count (``\\S+`` runs, the engine-wide convention) and report, per
    bucket, the padding a fixed-length batcher would waste — the
    trainer-efficiency diagnostic that decides bucket boundaries before
    ``pack_sequences`` / SFT batching.  Documents longer than the
    largest capacity are clipped to it and counted as truncated.

    Exactness: all counts are exact integers summed via fixed-width
    per-batch partials (one row per capacity per batch); ``pad_ratio``
    is ONE pinned division per output row (6dp).  No full-row shuffle —
    only len(capacities)-row partials leave each batch.

    Output: (capacity, n_docs, sum_tokens, n_pad, pad_ratio,
    n_truncated) ordered by capacity; buckets no document hits are
    omitted (SQL GROUP BY semantics)."""
    import pandas as pd

    from packs_ray.functions.agg import global_agg
    from packs_ray.stages.util import round_half_away as _r, str_column

    caps = np.asarray(sorted(set(int(c) for c in capacities)),
                      dtype=np.int64)
    if len(caps) == 0 or caps[0] <= 0:
        raise ValueError("capacities must be positive ints")

    def partial(batch: pa.Table) -> dict:
        text = str_column(batch, text_col)
        n = pc.count_substring_regex(text, r"\S+").fill_null(0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        trunc = n > caps[-1]
        clipped = np.minimum(n, caps[-1])
        # smallest capacity >= clipped token count
        bi = np.searchsorted(caps, clipped, side="left")
        out: dict = {}
        for i, c in enumerate(caps):
            m = bi == i
            out[f"n_{c}"] = int(m.sum())
            out[f"t_{c}"] = int(clipped[m].sum())
            out[f"x_{c}"] = int((m & trunc).sum())
        return out

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in caps:
            n = int(parts[f"n_{c}"].sum())
            if n == 0:
                continue
            t = int(parts[f"t_{c}"].sum())
            x = int(parts[f"x_{c}"].sum())
            pad = int(c) * n - t
            rows.append({
                "capacity": np.int64(c), "n_docs": np.int64(n),
                "sum_tokens": np.int64(t), "n_pad": np.int64(pad),
                "pad_ratio": float(_r(pad / (int(c) * n), 6)),
                "n_truncated": np.int64(x)})
        if not rows:
            return pd.DataFrame({
                "capacity": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
                "sum_tokens": pd.Series([], dtype="int64"),
                "n_pad": pd.Series([], dtype="int64"),
                "pad_ratio": pd.Series([], dtype="float64"),
                "n_truncated": pd.Series([], dtype="int64")})
        return pd.DataFrame(rows)

    cols = [text_col] if id_col is None else [id_col, text_col]
    return global_agg(ds.select_columns(cols), partial, combine,
                      empty_schema=pa.schema(
                          [(c, pa.string()) for c in cols]))


def shuffle_plan(ds, key_col: str, num_partitions: int, *,
                 salt: str = "plan"):
    """Pre-shuffle partition-balance diagnostic: row counts per target
    partition under the engine's deterministic route hash
    (finalize(fnv1a(str(key)) · salt) % P) — run it BEFORE committing a
    partition count for a keyed shuffle to see whether hot keys
    concentrate load (pair with ``profiling.key_skew`` for the per-key
    view; this is the per-PARTITION view after hashing).

    One streaming scan of per-batch bincount partials (bounded P ints
    per batch), one partition-bucketed sum reduce.  Rows with a null
    key are counted under partition -1 (they cannot be routed).

    Returns a lazy Dataset (partition, n_rows), empty partitions
    omitted, sorted by partition."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    np_u = np.uint64(num_partitions)
    nparts = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        h, valid = _hash_cols(batch, key_col, salt)
        p = np.where(valid, (h % np_u).astype(np.int64), -1)
        vc = pd.Series(p).value_counts(sort=False)
        return pa.table({
            "partition": pa.array(vc.index.to_numpy(dtype=np.int64)),
            "n_rows": pa.array(vc.to_numpy(dtype=np.int64))})

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("partition", sort=False)["n_rows"].sum()
        return out.reset_index().astype("int64")

    parts = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_group_reduce(parts, ["partition"], reduce_fn,
                                 nparts).sort("partition")
