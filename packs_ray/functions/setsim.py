"""EXACT set-similarity self-join via prefix filtering (the AllPairs /
PPJoin family — Bayardo, Ma & Srikant 2007; Xiao, Wang, Lin & Yu 2008;
public algorithms): every document pair whose DISTINCT whitespace-token
sets have Jaccard >= threshold, with no LSH approximation anywhere —
the exact counterpart of ``neardup.minhash_lsh_pairs`` (which trades
recall for speed) and the scalable counterpart of
``neardup.ngram_jaccard_pairs`` (the capped all-pairs baseline).

Soundness of the pruning (so the output equals the brute-force truth):
tokens are totally ordered by (document frequency asc, token asc) —
rare first.  For J(x,y) >= t the required overlap is
a = ceil(t/(1+t) * (|x|+|y|)) and any admissible partner of x has size
>= t*|x|, hence a >= ceil(t*|x|); by the prefix-filtering lemma the
SMALLEST shared token then lies inside BOTH docs' first
``s - ceil(t*s) + 1`` tokens, so grouping prefix tokens finds every
true pair.  Verification computes exact Jaccard, so engine-side
filters only need soundness, not SQL mirroring.

Scale shape: tokenize once (vectorized Arrow split); token df is one
``keyed_count``; df attaches back via the tiered ``equi_join``
(broadcast below the cap, token-bucketed above); per-doc prefix
selection rides one doc-bucketed reduce; candidate pairs are emitted
per token bucket with over-sized groups skipped-and-surfaced (the
``max_group`` contract of the LSH path — prefix tokens are the RAREST
by construction, so capped groups mean adversarial near-constant
corpora); verification reuses the request-join pair-verify exchange
(payload = sorted uint64 token hashes, shipped at most once per
(doc, partition)).  Nothing lands on the driver but the bloom bitmap
and the skip counter.

Reference anchor: the packs detect duplicates only via full-row
equality (duplicates_finder_pack/main.py:39-52); this is the
content-similarity generalization a curation engine needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from packs_ray.functions.neardup import (_EMPTY_U64, _as_u64,
                                         _bloom_build, _bloom_contains,
                                         _bloom_nbits,
                                         _bucketed_pair_verify,
                                         _emit_capped_pairs,
                                         _empty_pairs, _pairs_result)
from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

_WS = " \t\n\r\f\v"


def _distinct_token_frame(batch: pa.Table, id_col: str,
                          text_col: str) -> pd.DataFrame:
    """(id, tok) rows, distinct per doc, under the house trim/split
    contract (lm.build_vocab): trim + split on the explicit ASCII
    whitespace class (NOT ``\\s`` — the SQL twin's class), empty/null
    docs contribute nothing.  Assumes one row per doc (house contract:
    the documents table keys on doc_id)."""
    from packs_ray.stages.util import str_column

    col = str_column(batch, text_col)
    trimmed = pc.utf8_trim(pc.fill_null(col, ""), _WS)
    lists = pc.split_pattern_regex(trimmed, "[ \t\n\r\f\v]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    off = lists.offsets.to_numpy().astype(np.int64)
    lens = np.diff(off - off[0])
    flat = lists.flatten().to_pandas().to_numpy()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    doc = np.repeat(ids, lens)
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    keep = np.ones(len(flat), dtype=bool)
    keep[(off[:-1] - off[0])[empty]] = False   # the [""] token
    df = pd.DataFrame({id_col: doc[keep], "tok": flat[keep]})
    return df.drop_duplicates()


def setsim_join(ds, id_col: str, text_col: str, *,
                threshold: float = 0.9,
                num_partitions: int | None = None,
                verify_partitions: int | None = None,
                max_group: int = 10_000, collect: bool = False):
    """All (id_a < id_b, jaccard) pairs with exact token-set Jaccard
    >= ``threshold``.  Returns a LAZY Dataset (``collect=True`` for the
    sorted pandas convenience frame with ``attrs['skipped_buckets']``)."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         keyed_count,
                                         reduce_partition_count)
    from packs_ray.functions.joins import equi_join
    from packs_ray.functions.neardup import _ibucket  # noqa: F401

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def tok_rows(batch: pa.Table) -> pa.Table:
        df = _distinct_token_frame(batch, id_col, text_col)
        if df.empty:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "tok": pa.array([], type=pa.string()),
                             "s": pa.array([], type=pa.int64())})
        df["s"] = (df.groupby(id_col, sort=False)["tok"]
                   .transform("size").astype("int64"))
        df[id_col] = df[id_col].astype("int64")
        return _table_from_pandas(df, preserve_index=False)

    toks = ds.select_columns([id_col, text_col]).map_batches(
        tok_rows, batch_format="pyarrow").materialize()

    dfs = keyed_count(toks.select_columns(["tok"]), ["tok"],
                      count_col="df")
    joined = equi_join(toks, dfs, left_on=["tok"], right_on=["tok"],
                       how="inner")

    def prefix_rows(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["tok", id_col, "s"]
        if len(g) == 0:
            return pd.DataFrame({"tok": pd.Series([], dtype="object"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        g = g.sort_values([id_col, "df", "tok"], kind="stable")
        cc = g.groupby(id_col, sort=False).cumcount().to_numpy()
        s = g["s"].to_numpy(np.int64)
        p = s - np.ceil(threshold * s) + 1
        return g.loc[cc < p, out_cols]

    prefixes = bucketed_group_reduce(
        joined.select_columns([id_col, "tok", "s", "df"]), [id_col],
        prefix_rows, num_partitions)

    def add_p(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(
            batch.column("tok").to_numpy(zero_copy_only=False)))
        return batch.append_column("__p", pa.array(
            (h % np.uint64(num_partitions)).astype(np.int64)))

    def emit_pairs(part: pd.DataFrame) -> pd.DataFrame:
        return _emit_capped_pairs(part, ["tok"], id_col,
                                  max_group=max_group)

    pairs_ds = (prefixes.map_batches(add_p, batch_format="pyarrow")
                .groupby("__p").map_groups(emit_pairs,
                                           batch_format="pandas")
                .materialize())
    skipped_total = int(pairs_ds.sum("skipped_buckets") or 0)
    if pairs_ds.count() == 0:
        return _empty_pairs("jaccard", skipped_total, collect)

    def drop_summary(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("id_a")))
        return t.select(["id_a", "id_b"])

    pairs_ds = pairs_ds.map_batches(drop_summary,
                                    batch_format="pyarrow").materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return _empty_pairs("jaccard", skipped_total, collect)

    nbits = _bloom_nbits(2 * n_pairs)
    bloom_ref = ray.put(_bloom_build(pairs_ds, nbits))
    vparts = verify_partitions or int(
        max(1, min(num_partitions, np.ceil(2 * n_pairs / 4000))))

    def extract(batch: pa.Table) -> pa.Table:
        """Sorted distinct uint64 token hashes of (bloom-probable)
        candidate docs — exact sizes ride as the array lengths."""
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bm = ray.get(bloom_ref)
        hit = _bloom_contains(bm, ids.astype(np.int64), nbits)
        sub = batch.filter(pa.array(hit))
        df = _distinct_token_frame(sub, id_col, text_col)
        if df.empty:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.list_(pa.uint64()))})
        df["h"] = pd.util.hash_array(df["tok"].to_numpy())
        df = (df[[id_col, "h"]].drop_duplicates()
              .sort_values([id_col, "h"], kind="stable"))
        ids2 = df[id_col].to_numpy(np.int64)
        hs = df["h"].to_numpy(np.uint64)
        change = np.flatnonzero(np.concatenate(
            ([True], ids2[1:] != ids2[:-1])))
        return pa.table({"k": pa.array(ids2[change]),
                         "v": pa.array([s.tolist() for s in
                                        np.split(hs, change[1:])],
                                       type=pa.list_(pa.uint64()))})

    payloads = ds.select_columns([id_col, text_col]).map_batches(
        extract, batch_format="pyarrow").materialize()

    def verify_fn(lookup: dict, pr: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
        if len(pr) == 0:
            return empty
        out_a, out_b, out_j = [], [], []
        for ida, grp in pr.groupby("id_a", sort=False):
            A = lookup.get(int(ida), _EMPTY_U64)
            ibs = grp["id_b"].to_numpy(dtype=np.int64)
            blists = [lookup.get(int(b), _EMPTY_U64) for b in ibs]
            lens = np.array([len(x) for x in blists], dtype=np.int64)
            if len(A) == 0 or lens.sum() == 0:
                inter = np.zeros(len(ibs), dtype=np.int64)
            else:
                concat = np.concatenate(blists)
                idx = np.searchsorted(A, concat)
                hitv = (A[np.minimum(idx, len(A) - 1)]
                        == concat).astype(np.int64)
                offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
                inter = np.zeros(len(ibs), dtype=np.int64)
                nz = lens > 0
                if nz.any():
                    inter[nz] = np.add.reduceat(hitv, offs[nz])[:]
            union = lens + len(A) - inter
            # unrounded threshold compare — the SQL twin's
            # c/(un*1.0) >= t — then 6dp at the emit boundary only
            jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
            keep = jac >= threshold
            out_a.append(np.full(int(keep.sum()), int(ida),
                                 dtype=np.int64))
            out_b.append(ibs[keep])
            out_j.append(_r(jac[keep], 6))
        return pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a
            else np.zeros(0, np.int64),
            "id_b": np.concatenate(out_b) if out_b
            else np.zeros(0, np.int64),
            "jaccard": np.concatenate(out_j) if out_j
            else np.zeros(0, np.float64)})

    verified = _bucketed_pair_verify(pairs_ds, payloads,
                                     pa.list_(pa.uint64()), _as_u64,
                                     verify_fn, vparts)
    return _pairs_result(verified, skipped_total, "jaccard", collect,
                         "setsim_join")
