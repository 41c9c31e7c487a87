"""Fuzzy record linkage: set-similarity join between TWO tables.

``fuzzy_join`` links rows of a left and a right table whose text keys
have character-n-gram Jaccard >= a threshold — the record-linkage /
entity-resolution operator (dirty catalog matching, crawl-to-crawl URL
title linkage) that ``neardup.minhash_lsh_pairs`` (single-corpus,
probabilistic) does not cover.  The result is EXACT:

1. gram rows (gram_hash, uid) per side, distinct per record
   (``neardup._shingle_hashes`` — the same FNV-1a byte shingles the SQL
   oracle reproduces bit-for-bit);
2. one bucketed shuffle attaches global gram document frequency;
3. per-record PREFIX FILTER (Chaudhuri et al. 2006, SSJoin): grams are
   ordered by (df asc, gram asc) and only the first
   ``|x| - ceil(t*|x|) + 1`` grams of each record are emitted as join
   keys — any pair with Jaccard >= t provably shares a prefix gram, so
   no true pair is lost, while hot grams (low selectivity, high df)
   land in suffixes and never form candidate buckets;
4. candidate (left, right) pairs form inside per-gram buckets (sizes
   capped + surfaced — a cap can only fire on adversarial key
   distributions because of the df ordering);
5. exact verification via the shared ``_bucketed_pair_verify``
   exchange: per-pair Jaccard over the full gram sets, neither side
   ever landing on the driver.

Left/right ids are encoded into one uid space (left 2*id, right
2*id+1) so the single-corpus pair machinery applies unchanged; the
output restores the original ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.functions.neardup import (_bucketed_pair_verify, _ibucket,
                                         _shingle_hashes)
from packs_ray.stages.util import round_half_away as _r


def _gram_rows(ds, id_col: str, text_col: str, gram: int, side: int):
    """(uid, gram h, record gram-set size) rows, distinct grams per
    record; uid = 2*id + side keeps the two tables' ids disjoint."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        hs = [_shingle_hashes(t, gram) for t in texts]
        lens = np.array([len(h) for h in hs], dtype=np.int64)
        uid = (ids.astype(np.int64) * 2 + side)
        return pa.table({
            "uid": np.repeat(uid, lens),
            "h": np.concatenate(hs).view(np.int64) if lens.sum()
                 else np.empty(0, dtype=np.int64),
            "sz": np.repeat(lens, lens)})

    return ds.map_batches(fn, batch_format="pyarrow")


def _payload_rows(ds, id_col: str, text_col: str, gram: int, side: int):
    """(k=uid, v=sorted gram list) payload rows for the verify exchange."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        hs = [np.sort(_shingle_hashes(t, gram)) for t in texts]
        return pa.table({
            "k": pa.array(ids.astype(np.int64) * 2 + side),
            "v": pa.array([h.tolist() for h in hs],
                          type=pa.list_(pa.uint64()))})

    return ds.map_batches(fn, batch_format="pyarrow")


def fuzzy_join(left_ds, right_ds, *, left_id: str, left_text: str,
               right_id: str, right_text: str, threshold: float = 0.5,
               gram: int = 3, num_partitions: int | None = None,
               max_bucket: int = 20_000):
    """Exact character-``gram`` Jaccard >= ``threshold`` join.  Returns
    a lazy Dataset (left_id, right_id, jaccard) with ``jaccard`` the
    4dp-rounded exact value (thresholded on the unrounded value).
    ``max_bucket`` caps one gram's candidate bucket, skips surfaced via
    a printed notice — the skew guard for boilerplate-gram pile-ups.
    The join is exact while no bucket trips the cap; a skipped bucket
    can only lose a pair whose EVERY shared prefix gram is capped
    (redundant gram coverage usually saves it — pass a large
    ``max_bucket`` when a guaranteed-exact result matters more than
    skew protection)."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)

    if num_partitions is None:
        num_partitions = max(row_shuffle_partitions(left_ds),
                             row_shuffle_partitions(right_ds))
    grams = (_gram_rows(left_ds, left_id, left_text, gram, 0)
             .union(_gram_rows(right_ds, right_id, right_text, gram, 1)))

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("h")["h"].transform("size")
        return g

    with_df = bucketed_group_reduce(grams, ["h"], attach_df,
                                    num_partitions)

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        """Keep each record's first |x| - ceil(t|x|) + 1 grams in the
        global (df asc, gram asc) order."""
        g = g.sort_values(["df", "h"], kind="mergesort")
        sz = g["sz"].to_numpy()
        keep_n = sz - np.ceil(threshold * sz).astype(np.int64) + 1
        rank = g.groupby("uid", sort=False).cumcount().to_numpy()
        return g.loc[rank < keep_n, ["uid", "h"]]

    prefixes = bucketed_group_reduce(with_df, ["uid"], prefix,
                                     num_partitions)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Cross-side candidate pairs within each gram bucket."""
        out_a, out_b = [], []
        skipped = 0
        for _, grp in g.groupby("h", sort=False):
            uid = grp["uid"].to_numpy()
            left = np.unique(uid[uid % 2 == 0])
            right = np.unique(uid[uid % 2 == 1])
            if not len(left) or not len(right):
                continue
            if len(left) * len(right) > max_bucket:
                skipped += 1
                continue
            out_a.append(np.repeat(left, len(right)))
            out_b.append(np.tile(right, len(left)))
        if skipped:
            print(f"fuzzy_join: skipped {skipped} gram buckets over "
                  f"max_bucket={max_bucket} candidate pairs")
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b)}).drop_duplicates()

    pairs_ds = bucketed_group_reduce(prefixes, ["h"], emit_pairs,
                                     num_partitions)
    payloads = (_payload_rows(left_ds, left_id, left_text, gram, 0)
                .union(_payload_rows(right_ds, right_id, right_text,
                                     gram, 1)))

    def verify(lookup: dict, pr: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for a, b in zip(pr["id_a"], pr["id_b"]):
            A, B = lookup.get(int(a)), lookup.get(int(b))
            if A is None or B is None:
                continue
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(float(_r(jac, 4)))
        return pd.DataFrame({
            left_id: pd.Series(out_a, dtype="int64") // 2,
            right_id: pd.Series(out_b, dtype="int64") // 2,
            "jaccard": pd.Series(out_j, dtype="float64")})

    def as_arr(v) -> np.ndarray:
        return np.asarray(v, dtype=np.uint64)

    return _bucketed_pair_verify(pairs_ds, payloads, pa.list_(pa.uint64()),
                                 as_arr, verify, num_partitions)
