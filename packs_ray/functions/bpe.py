"""BPE merge induction — tokenizer training as a Ray Data pipeline.

Byte-pair-encoding training (Sennrich et al. 2016) over a corpus is the
canonical "iterative reduce over a bounded artifact" shape: the corpus
collapses ONCE into a distinct-word count table (the only
corpus-proportional pass), and every merge round then runs over that
narrow word table — weighted adjacent-pair counts (one bucketed
reduce), pick the argmax pair, apply the merge, repeat.

Determinism contract (shared bit-for-bit with the SQL oracle):

- words are the whitespace tokens of the shared trim/split contract;
- a word's symbol state is a STRING with two-space boundaries
  (``"  h  e  y  "``): applying merge (l, r) is one literal
  ``replace(" l  r ", " lr ")`` — both Python ``str.replace`` and SQL
  ``replace`` scan left-to-right and continue AFTER each replacement,
  which is exactly BPE's greedy non-overlapping merge order, and the
  double-space boundaries keep adjacent matches intact
  (``a a a a -> (aa)(aa)``, not ``(aa) a a``);
- pair counts are exact int64 (weighted by word count), so the argmax
  pair is order-free; ties break (count desc, left asc, right asc).

Symbols never contain whitespace (words are whitespace tokens), so the
separator encoding is collision-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def _pair_counts(words: pd.Series, cnts: np.ndarray) -> pd.DataFrame:
    """Exact weighted adjacent-symbol-pair counts of one batch of word
    states (two-space boundary encoding)."""
    sym_lists = words.str.strip().str.split("  ")
    lens = sym_lists.str.len().to_numpy(dtype=np.int64)
    n_pairs = np.maximum(lens - 1, 0)
    if int(n_pairs.sum()) == 0:
        return pd.DataFrame({"l": pd.Series(dtype="object"),
                             "r": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    flat = np.asarray([s for lst in sym_lists for s in lst], dtype=object)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    row = np.repeat(np.arange(len(lens)), n_pairs)
    first = np.concatenate([offs[i] + np.arange(n_pairs[i])
                            for i in range(len(lens)) if n_pairs[i]])
    g = (pd.DataFrame({"l": flat[first], "r": flat[first + 1],
                       "w": cnts[row]})
         .groupby(["l", "r"], sort=False)["w"].sum()
         .rename("cnt").reset_index())
    g["cnt"] = g["cnt"].astype("int64")
    return g


def bpe_merges(ds, text_col: str, *, n_merges: int = 6,
               num_partitions: int | None = None) -> pd.DataFrame:
    """Train ``n_merges`` BPE merges over a text column.

    Pass 1 (corpus-proportional, once): distinct-word counts via one
    bucketed reduce — the artifact every later round streams over
    (materialized; ~vocabulary-sized, the standard BPE precompute).
    Each round: weighted pair counts (per-batch combiners + one
    (l, r)-bucketed exact reduce), per-bucket argmax candidates merged
    on the driver (exact — a pair's total lives in one bucket), then a
    stateless vectorized ``str.replace`` applies the merge to the word
    table.  Rounds stop early when no pair remains.

    Returns a pandas frame (rank, left, right, pair_count) — the merge
    table, bounded by ``n_merges`` rows."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import str_column

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def word_partial(batch: pa.Table) -> pa.Table:
        col = str_column(batch, text_col)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, "[ \t\n\r\f\v]+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten().to_pandas()
        flat = flat[flat != ""]
        g = flat.value_counts().rename("cnt").rename_axis("word") \
            .reset_index()
        g["cnt"] = g["cnt"].astype("int64")
        return _table_from_pandas(g, preserve_index=False)

    def word_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", sort=False)["cnt"].sum().reset_index()

    words = bucketed_group_reduce(
        ds.select_columns([text_col]).map_batches(
            word_partial, batch_format="pyarrow"),
        ["word"], word_reduce, num_partitions)

    def to_state(batch: pa.Table) -> pa.Table:
        w = batch.column("word").to_pandas()
        state = "  " + w.map(lambda x: "  ".join(x)) + "  "
        return pa.table({"state": pa.array(state, type=pa.string()),
                         "cnt": batch.column("cnt")})

    state = words.map_batches(to_state, batch_format="pyarrow") \
        .materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = _pair_counts(batch.column("state").to_pandas(),
                         batch.column("cnt").to_numpy(
                             zero_copy_only=False).astype(np.int64))
        return _table_from_pandas(g, preserve_index=False)

    def pair_reduce(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["l", "r"], sort=False)["cnt"].sum().reset_index()
        # per-bucket argmax candidate (exact: a pair's global total is
        # confined to its bucket)
        t = t.sort_values(["cnt", "l", "r"],
                          ascending=[False, True, True], kind="stable")
        return t.head(1)

    merges = []
    for rank in range(1, n_merges + 1):
        cand = bucketed_group_reduce(
            state.map_batches(pair_partial, batch_format="pyarrow"),
            ["l", "r"], pair_reduce, num_partitions).to_pandas()
        if cand.empty or "cnt" not in cand.columns or not len(cand):
            break
        cand = cand.sort_values(["cnt", "l", "r"],
                                ascending=[False, True, True],
                                kind="stable")
        left, right, cnt = (str(cand.iloc[0]["l"]), str(cand.iloc[0]["r"]),
                            int(cand.iloc[0]["cnt"]))
        merges.append({"rank": np.int64(rank), "left": left,
                       "right": right, "pair_count": np.int64(cnt)})
        pat, rep = f" {left}  {right} ", f" {left}{right} "

        def apply_merge(batch: pa.Table, _p=pat, _r=rep) -> pa.Table:
            s = batch.column("state").to_pandas() \
                .str.replace(_p, _r, regex=False)
            return pa.table({"state": pa.array(s, type=pa.string()),
                             "cnt": batch.column("cnt")})

        state = state.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()
    if not merges:
        return pd.DataFrame({"rank": pd.Series(dtype="int64"),
                             "left": pd.Series(dtype="object"),
                             "right": pd.Series(dtype="object"),
                             "pair_count": pd.Series(dtype="int64")})
    return pd.DataFrame(merges)
