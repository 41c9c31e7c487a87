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


def _even_segments(length: int, k: int):
    """Split range(length) into k+1 contiguous spans, first
    ``length % (k+1)`` spans one char longer.  Returns (starts, lens)."""
    q, r = divmod(length, k + 1)
    lens = np.array([q + 1] * r + [q] * (k + 1 - r), dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return starts, lens


def _lev(a: str, b: str) -> int:
    """Exact Levenshtein distance (classic DP; linkage keys are short
    strings, so the O(|a||b|) inner loop is bounded and only runs on
    pigeonhole-filtered candidates)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def edit_distance_join(left_ds, right_ds, *, left_id: str, left_text: str,
                       right_id: str, right_text: str, max_dist: int = 2,
                       num_partitions: int | None = None,
                       max_bucket: int = 20_000):
    """EXACT Levenshtein-distance <= ``max_dist`` join (PassJoin-style
    segment pigeonhole — Li, Deng, Feng 2011): every left string is
    split into ``k+1`` contiguous segments; if ed(a, b) <= k then at
    most k segments are touched by edits, so at least one appears in b
    VERBATIM at a position shifted by at most k.  Candidates therefore
    come from equality buckets on (|a|, segment_index, segment_text):
    the left side emits its k+1 segments, the right side emits every
    substring that could BE such a segment (for each plausible left
    length in [|b|-k, |b|+k] and shift in [-k, k]) — a provable
    candidate superset, so no true pair is ever lost.  Strings shorter
    than k+1 chars can't host a full segment split and route through a
    dedicated short-string bucket (left |a| <= k joins right
    |b| <= 2k — the length filter makes anything longer impossible).

    Verification is the exact DP distance per candidate inside the
    shared pair-verify exchange (pairs never land on the driver);
    per-bucket candidate counts are capped at ``max_bucket`` and skips
    surfaced, the same skew guard as ``fuzzy_join``.  Output:
    (left_id, right_id, dist) with dist <= max_dist.
    """
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)

    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be >= 1")
    if num_partitions is None:
        num_partitions = max(row_shuffle_partitions(left_ds),
                             row_shuffle_partitions(right_ds))

    def left_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column(left_id).to_numpy(zero_copy_only=False)
        texts = batch.column(left_text).to_numpy(zero_copy_only=False)
        uids, keys = [], []
        for rid, s in zip(ids, texts):
            if s is None:
                continue
            uid = int(rid) * 2
            if len(s) <= k:
                uids.append(uid)
                keys.append("S")
                continue
            starts, lens = _even_segments(len(s), k)
            for i in range(k + 1):
                uids.append(uid)
                keys.append(f"{len(s)}|{i}|"
                            f"{s[starts[i]:starts[i] + lens[i]]}")
        return pa.table({"uid": pa.array(uids, type=pa.int64()),
                         "key": pa.array(keys, type=pa.string())})

    def right_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column(right_id).to_numpy(zero_copy_only=False)
        texts = batch.column(right_text).to_numpy(zero_copy_only=False)
        uids, keys = [], []
        for rid, s in zip(ids, texts):
            if s is None:
                continue
            uid = int(rid) * 2 + 1
            seen = set()
            if len(s) <= 2 * k:
                seen.add("S")
            for la in range(max(len(s) - k, k + 1), len(s) + k + 1):
                starts, lens = _even_segments(la, k)
                for i in range(k + 1):
                    sl = int(lens[i])
                    for p in range(max(0, int(starts[i]) - k),
                                   min(len(s) - sl,
                                       int(starts[i]) + k) + 1):
                        seen.add(f"{la}|{i}|{s[p:p + sl]}")
            uids.extend([uid] * len(seen))
            keys.extend(seen)
        return pa.table({"uid": pa.array(uids, type=pa.int64()),
                         "key": pa.array(keys, type=pa.string())})

    grams = (left_ds.select_columns([left_id, left_text])
             .map_batches(left_keys, batch_format="pyarrow")
             .union(right_ds.select_columns([right_id, right_text])
                    .map_batches(right_keys, batch_format="pyarrow")))

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        skipped = 0
        for _, grp in g.groupby("key", sort=False):
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
            print(f"edit_distance_join: skipped {skipped} buckets over "
                  f"max_bucket={max_bucket} candidate pairs")
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b)}).drop_duplicates()

    pairs_ds = bucketed_group_reduce(grams, ["key"], emit_pairs,
                                     num_partitions)

    def payload(ds, id_col, text_col, side):
        # strings ride the verify exchange as codepoint arrays so the
        # shared replicate/lookup machinery (ndarray payloads) applies
        def fn(batch: pa.Table) -> pa.Table:
            b = batch.filter(pa.compute.is_valid(batch.column(text_col)))
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            texts = b.column(text_col).to_numpy(zero_copy_only=False)
            cps = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                   for s in texts]
            return pa.table({
                "k": pa.array(ids.astype(np.int64) * 2 + side),
                "v": pa.array([c.tolist() for c in cps],
                              type=pa.list_(pa.uint32()))})
        return ds.select_columns([id_col, text_col]).map_batches(
            fn, batch_format="pyarrow")

    payloads = (payload(left_ds, left_id, left_text, 0)
                .union(payload(right_ds, right_id, right_text, 1)))

    def verify(lookup: dict, pr: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for a, b in zip(pr["id_a"], pr["id_b"]):
            A, B = lookup.get(int(a)), lookup.get(int(b))
            if A is None or B is None or abs(len(A) - len(B)) > k:
                continue
            d = _lev(A, B)
            if d <= k:
                out_a.append(int(a))
                out_b.append(int(b))
                out_d.append(d)
        return pd.DataFrame({
            left_id: pd.Series(out_a, dtype="int64") // 2,
            right_id: pd.Series(out_b, dtype="int64") // 2,
            "dist": pd.Series(out_d, dtype="int64")})

    def as_cp(v) -> np.ndarray:
        return np.asarray(v, dtype=np.uint32)

    return _bucketed_pair_verify(pairs_ds, payloads,
                                 pa.list_(pa.uint32()),
                                 as_cp, verify, num_partitions)
