"""Near-duplicate detection family (training-data dedup operators).

The reference has no near-dedup (SURVEY.md §2.7); these are the standard
public algorithms, expressed Ray-Data-first:

- minhash_lsh_pairs: shingle → minhash → band → groupby(band, hash) →
  verified candidate pairs (the guide's canonical LSH shape)
- simhash_buckets: 64-bit simhash; near-dups = identical value on any of
  4 16-bit sub-bands (Hamming ≤ 3-ish heuristic)
- ngram_jaccard_verify: exact Jaccard verification used on LSH candidates
- embedding_cosine_pairs: near-dup pairs by embedding cosine ≥ threshold
  within LSH (random-hyperplane) buckets

Determinism: all hashing is seeded/fixed (md5-derived), no wall-clock.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def _shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Character n-gram 64-bit hashes (FNV-1a over utf-8)."""
    if text is None:
        return np.zeros(0, dtype=np.uint64)
    b = text.encode("utf-8")
    if len(b) < n:
        b = b + b"\x00" * (n - len(b))
    # vectorized rolling FNV over byte windows
    arr = np.frombuffer(b, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, min(n, len(arr)))
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
    P = np.uint64(1099511628211)
    h = np.full(len(win), np.uint64(14695981039346656037))
    for j in range(win.shape[1]):
        h = ((h ^ win[:, j].astype(np.uint64)) * P) & MASK
    return np.unique(h)


def _shingle_hashes_flat(texts: "pa.Array", n: int = 5
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Char n-gram FNV hashes for a whole string column in ONE
    vectorized pass: one sliding window over the concatenated utf-8
    buffer, 5 vector rounds total, windows crossing row boundaries
    masked out.  Returns (flat uint64 window hashes in row order, per-
    row window counts).  Hashes are NOT per-row deduplicated — minhash
    takes a min, which is multiplicity-blind, so signatures are
    identical to the per-row ``_shingle_hashes`` path (whose np.unique
    exists for the exact-Jaccard verify, not the signature).  Null rows
    emit 0 windows; rows shorter than n take the per-row padded path
    (exact parity, rare)."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    valid = texts.is_valid().to_numpy(zero_copy_only=False)
    filled = pc.fill_null(texts, "")
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    bin_ = filled.cast(pa.binary())
    off = np.frombuffer(bin_.buffers()[1], dtype=np.int32)
    offsets = off[bin_.offset: bin_.offset + len(bin_) + 1].astype(np.int64)
    buf = bin_.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8)
            if buf is not None else np.zeros(0, dtype=np.uint8))
    data = data[offsets[0]: offsets[-1]]
    offsets = offsets - offsets[0]
    nr = len(bin_)
    blens = np.diff(offsets)
    long_mask = valid & (blens >= n)
    short_mask = valid & (blens < n)
    lens = np.zeros(nr, dtype=np.int64)
    lens[long_mask] = blens[long_mask] - n + 1
    lens[short_mask] = 1                       # padded single window
    total = int(lens.sum())
    flat = np.empty(total, dtype=np.uint64)
    out_off = np.concatenate(([0], np.cumsum(lens)))
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
    P = np.uint64(1099511628211)
    if len(data) >= n and long_mask.any():
        win = np.lib.stride_tricks.sliding_window_view(data, n)
        h = np.full(len(win), np.uint64(14695981039346656037))
        for j in range(n):
            h = ((h ^ win[:, j].astype(np.uint64)) * P) & MASK
        w = lens[long_mask]
        rel = np.arange(int(w.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(w)[:-1])), w)
        src = np.repeat(offsets[:-1][long_mask], w) + rel
        dst = np.repeat(out_off[:-1][long_mask], w) + rel
        flat[dst] = h[src]
    for i in np.flatnonzero(short_mask):
        b = bytes(data[offsets[i]:offsets[i + 1]])
        b = b + b"\x00" * (n - len(b))
        hh = np.uint64(14695981039346656037)
        for byte in b:
            hh = ((hh ^ np.uint64(byte)) * P) & MASK
        flat[out_off[i]] = hh
    return flat, lens


def _shingle_hashes_flat_unique(texts: "pa.Array", n: int = 5
                                ) -> tuple[np.ndarray, np.ndarray]:
    """``_shingle_hashes_flat`` + per-row dedup in ONE lexsort (sorted
    unique hashes per row, exactly ``np.unique`` of the per-row path)
    for the multiplicity-SENSITIVE consumers (simhash's bit majority)."""
    flat, lens = _shingle_hashes_flat(texts, n)
    if not len(flat):
        return flat, lens
    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    order = np.lexsort((flat, row_idx))
    f2, r2 = flat[order], row_idx[order]
    keep = np.empty(len(f2), dtype=bool)
    keep[0] = True
    keep[1:] = (r2[1:] != r2[:-1]) | (f2[1:] != f2[:-1])
    return f2[keep], np.bincount(r2[keep],
                                 minlength=len(lens)).astype(np.int64)


_PRIME = np.uint64(0xFFFFFFFB)


def _minhash_sig(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhash values via universal hashing (a*x+b mod p)."""
    if len(shingles) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    x = (shingles & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    vals = (a[:, None] * x[None, :] + b[:, None]) % _PRIME
    return vals.min(axis=1)


def minhash_signatures(ds, id_col: str, text_col: str, num_perm: int = 64,
                       shingle: int = 5, seed: int = 42):
    """Lazy Dataset of (id, band_0..band_{B-1}) band hashes (B = num_perm/4)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_PRIME), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_PRIME), size=num_perm, dtype=np.uint64)
    rows_per_band = 4
    n_bands = num_perm // rows_per_band
    aref = ray.put((a, b))

    def fn(batch: pa.Table) -> pa.Table:
        av, bv = ray.get(aref)
        n = batch.num_rows
        sigs = np.zeros((n, num_perm), dtype=np.uint64)
        # one vectorized shingling pass for the whole batch (window
        # hashes in row order; multiplicity doesn't affect the min)
        flat, lens = _shingle_hashes_flat(batch.column(text_col), shingle)
        row_off = np.concatenate(([0], np.cumsum(lens)))
        nz = np.flatnonzero(lens)
        # permute whole row-chunks at once: one (num_perm, chunk_shingles)
        # universal-hash matrix + min.reduceat per row — no per-row loop,
        # bounded temporary regardless of batch size
        start = 0
        while start < len(nz):
            end, tot = start, 0
            while end < len(nz) and tot < 32_768:
                tot += lens[nz[end]]
                end += 1
            rows = nz[start:end]
            x = np.concatenate([flat[row_off[i]:row_off[i + 1]]
                                for i in rows]) & np.uint64(0xFFFFFFFF)
            vals = (av[:, None] * x[None, :] + bv[:, None]) % _PRIME
            offs = np.concatenate(([0], np.cumsum(lens[rows])[:-1]))
            sigs[rows] = np.minimum.reduceat(vals, offs, axis=1).T
            start = end
        cols = {id_col: batch.column(id_col)}
        for bi in range(n_bands):
            band = sigs[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            # hash the band rows to one value
            bh = (band * np.uint64(0x9E3779B97F4A7C15)).sum(axis=1, dtype=np.uint64)
            cols[f"band_{bi}"] = pa.array(bh.view(np.int64), type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _pairs_within_sorted_groups(ids: np.ndarray, sizes: np.ndarray,
                                max_group: int = 200):
    """All within-group (a, b) index pairs for contiguous groups of the
    given sizes over ``ids``.  Vectorized over groups of equal size (one
    triu template per distinct size, tiled).  Groups larger than
    ``max_group`` are skipped (pathological buckets: identical boilerplate)
    and the skip count is returned so callers can surface it in metrics
    rather than grind O(g²).  Returns (ids_a, ids_b, n_skipped_groups)."""
    offs = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    keep = (sizes >= 2) & (sizes <= max_group)
    n_skipped = int((sizes > max_group).sum())
    out_a, out_b = [], []
    for g in np.unique(sizes[keep]):
        sel = offs[keep][sizes[keep] == g]
        ia, ib = np.triu_indices(int(g), k=1)             # one template
        out_a.append((sel[:, None] + ia[None, :]).ravel())
        out_b.append((sel[:, None] + ib[None, :]).ravel())
    if not out_a:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64), n_skipped
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    return ids[a], ids[b], n_skipped


def _ibucket(ids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition of int64 ids (golden-ratio mix so
    structured id spaces don't skew)."""
    mixed = ids.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (mixed % np.uint64(num_partitions)).view(np.int64)


_EMPTY_U64 = np.zeros(0, dtype=np.uint64)
_EMPTY_F64 = np.zeros(0, dtype=np.float64)


def _as_u64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64) if x is not None and not (
        isinstance(x, float) and np.isnan(x)) else _EMPTY_U64


def _as_f64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float64) if x is not None and not (
        isinstance(x, float) and np.isnan(x)) else _EMPTY_F64


# ---------------------------------------------------------------------------
# Bloom-filtered candidate membership: the payload-extraction prefilter
# needs "is this doc id an endpoint of some candidate pair?" in every
# extraction task WITHOUT collecting the candidate-id set on the driver.
# Per-block bitmap partials OR-reduce into one fixed-size bitmap, so
# driver memory is O(bloom bits) — independent of candidate count.  False
# positives only extract a few extra payload rows; no verify partition
# ever requests them, so results are exactly unchanged.

_BLOOM_K = 4


def _bloom_nbits(n_ids: int) -> int:
    """Power-of-two bitmap size: ~20 bits/id -> <1% FP at k=4, clamped to
    [2^16, 2^30] bits (8 KB – 128 MB on the driver)."""
    bits = 1 << int(np.ceil(np.log2(max(20 * max(n_ids, 1), 1 << 16))))
    return min(bits, 1 << 30)


def _bloom_positions(ids: np.ndarray, nbits: int) -> np.ndarray:
    """(k, n) bit positions via double hashing of the golden-mixed id."""
    x = np.ascontiguousarray(ids, dtype=np.int64).view(np.uint64)
    h1 = x * np.uint64(0x9E3779B97F4A7C15)
    h2 = ((x ^ (x >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F)) \
        | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(nbits)).astype(np.int64)


def _bloom_build(pairs_ds, nbits: int) -> np.ndarray:
    """OR-reduce per-block bitmaps of pair-endpoint ids into one packed
    uint64 bitmap.  Partials stream block-by-block through the driver
    (the OR is associative — a tree reduce is the drop-in upgrade if
    block-count x bitmap-size bandwidth ever matters)."""
    words = nbits // 64

    def block_bloom(batch: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            batch.column("id_a").to_numpy(zero_copy_only=False),
            batch.column("id_b").to_numpy(zero_copy_only=False)]))
        bm = np.zeros(words, dtype=np.uint64)
        pos = _bloom_positions(ids, nbits).ravel()
        np.bitwise_or.at(bm, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"bm": pa.array([bm.view(np.int64)],
                                        type=pa.list_(pa.int64()))})

    out = np.zeros(words, dtype=np.uint64)
    for b in pairs_ds.map_batches(block_bloom, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        if not b.num_rows or "bm" not in b.column_names:
            continue
        flat = b.column("bm").combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).view(np.uint64)
        out |= np.bitwise_or.reduce(flat.reshape(-1, words), axis=0)
    return out


def _bloom_contains(bm: np.ndarray, ids: np.ndarray, nbits: int) -> np.ndarray:
    pos = _bloom_positions(ids, nbits)
    hit = (bm[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=0)


def _emit_capped_pairs(part: pd.DataFrame, key_cols: list[str], id_col: str,
                       max_group: int) -> pd.DataFrame:
    """Within-bucket candidate pairs for one shuffle partition: sort by
    bucket key then id, emit all (a<b) pairs per bucket with groups over
    ``max_group`` skipped; the partition's skip count rides out as one
    null-id summary row in ``skipped_buckets``."""
    g = part.sort_values(key_cols + [id_col], kind="stable")
    ids = g[id_col].to_numpy()
    n = len(g)
    new = np.empty(n, dtype=bool)
    new[0] = True
    if n > 1:
        acc = np.zeros(n - 1, dtype=bool)
        for c in key_cols:
            v = g[c].to_numpy()
            acc |= v[1:] != v[:-1]
        new[1:] = acc
    sizes = np.diff(np.append(np.flatnonzero(new), n))
    a, b, n_skipped = _pairs_within_sorted_groups(ids, sizes, max_group)
    out = (pd.DataFrame({"id_a": pd.array(a, dtype="Int64"),
                         "id_b": pd.array(b, dtype="Int64")})
           .drop_duplicates())
    out["skipped_buckets"] = np.int64(0)
    if n_skipped:
        out = pd.concat([out, pd.DataFrame(
            {"id_a": pd.array([None], dtype="Int64"),
             "id_b": pd.array([None], dtype="Int64"),
             "skipped_buckets": np.array([n_skipped], dtype=np.int64)})],
            ignore_index=True)
    return out


def _bucketed_pair_verify(pairs_ds, payload_ds, payload_type, as_arr,
                          verify_fn, vparts: int):
    """Verify candidate pairs against per-doc payloads with neither side
    ever landing on the driver — returns the verified pairs as a LAZY
    Dataset (the thresholded pair set is unbounded on a boilerplate-heavy
    corpus; collecting it is the caller's opt-in).

    ``pairs_ds``: Dataset[id_a, id_b] (int64) candidate pairs.
    ``payload_ds``: Dataset[k:int64, v:``payload_type``] — one row per
    candidate doc (its sketch / vector).
    Pairs partition on ``_ibucket(id_a)``; each partition receives the
    payloads of its id_a docs directly (a doc's own bucket IS
    ``_ibucket(k)``) and of its id_b partners via a distinct
    (requesting-partition, id_b) request join — payload bytes ship at
    most once per (doc, partition), never per pair.
    ``verify_fn(lookup: dict[id -> ndarray], pairs: DataFrame)`` runs
    once per partition on globally-deduplicated pairs.

    Small-side gate: when the candidate set is provably tiny (both
    inputs are already materialized by every caller, so ``count()`` /
    ``size_bytes()`` are metadata-cheap), the sort exchange costs more
    than the work it distributes — ~3 s of all-to-all scheduling to
    route a few thousand rows at 32 CPUs.  Below the gate the verify
    runs as one driver call over the same verify_fn and returns
    ``from_pandas`` (identical pairs, same lazy return type); above it
    the distributed bucketed exchange runs unchanged.  The gate is a
    deterministic function of the data, so cross-parallelism
    determinism holds."""
    GATE_PAIRS, GATE_BYTES = 500_000, 64 << 20
    try:
        small = (pairs_ds.count() <= GATE_PAIRS
                 and payload_ds.size_bytes() <= GATE_BYTES)
    except Exception:
        small = False
    if small:
        import ray.data as _rd

        pay = payload_ds.to_pandas()
        # an empty Dataset collects to a COLUMNLESS frame — normalize
        # both sides so verify_fn sees its usual typed shape
        lookup = ({int(k): as_arr(v) for k, v in zip(pay["k"], pay["v"])}
                  if "k" in pay.columns else {})
        pr = pairs_ds.to_pandas()
        if "id_a" not in pr.columns:
            pr = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                               "id_b": pd.Series([], dtype="int64")})
        return _rd.from_pandas(verify_fn(lookup, pr.drop_duplicates()))

    def _vtable(__p, id_a, id_b, k, v, kind) -> pa.Table:
        n = len(__p)
        return pa.table({
            "__p": pa.array(np.asarray(__p, dtype=np.int64)),
            "id_a": (pa.nulls(n, pa.int64()) if id_a is None
                     else pa.array(np.asarray(id_a, dtype=np.int64))),
            "id_b": (pa.nulls(n, pa.int64()) if id_b is None
                     else pa.array(np.asarray(id_b, dtype=np.int64))),
            "k": (pa.nulls(n, pa.int64()) if k is None
                  else pa.array(np.asarray(k, dtype=np.int64))),
            "v": (pa.nulls(n, payload_type) if v is None else v),
            "kind": pa.array(np.full(n, kind, dtype=np.int8))})

    def pair_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return _vtable(_ibucket(a, vparts), a, b, None, None, 1)

    def request_rows(batch: pa.Table) -> pa.Table:
        """Distinct (requesting partition, id_b) rows, keyed for the
        payload exchange on _ibucket(id_b)."""
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([_ibucket(a, vparts), b], axis=1), axis=0)
        return _vtable(_ibucket(uniq[:, 1], vparts), uniq[:, 0], None,
                       uniq[:, 1], None, 1)

    def payload_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        return _vtable(_ibucket(k, vparts), None, None, k,
                       batch.column("v"), 0)

    def replicate(g: pd.DataFrame) -> pa.Table:
        """Join payload rows to the distinct partitions requesting them."""
        kind = g["kind"].to_numpy()
        pay = g.loc[kind == 0, ["k", "v"]]
        req = g.loc[kind == 1, ["id_a", "k"]].drop_duplicates()
        merged = req.merge(pay, on="k", how="inner")
        v = pa.array([as_arr(x).tolist() for x in merged["v"]],
                     type=payload_type)
        return _vtable(merged["id_a"].to_numpy(dtype=np.int64), None, None,
                       merged["k"].to_numpy(dtype=np.int64), v, 0)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy()
        pay = g.loc[kind == 0]
        lookup = {int(k): as_arr(s) for k, s in zip(pay["k"], pay["v"])}
        pr = g.loc[kind == 1, ["id_a", "id_b"]].drop_duplicates()
        return verify_fn(lookup, pr)

    # with a single verify partition every payload lands in partition 0
    # via the direct route — the request-join exchange would be overhead
    replicas = None
    if vparts > 1:
        replicas = (pairs_ds.map_batches(request_rows, batch_format="pyarrow")
                    .union(payload_ds.map_batches(payload_rows,
                                                  batch_format="pyarrow"))
                    .groupby("__p").map_groups(replicate,
                                               batch_format="pandas"))
    inputs = pairs_ds.map_batches(pair_rows, batch_format="pyarrow")
    others = [payload_ds.map_batches(payload_rows, batch_format="pyarrow")]
    if replicas is not None:
        others.append(replicas)
    return (inputs.union(*others)
            .groupby("__p").map_groups(verify, batch_format="pandas"))


def _pairs_result(verified_ds, skipped_total: int, value_col: str,
                  collect: bool, op: str):
    """Shared tail for the pair finders: lazy Dataset by default (the
    100-TB path — verified pairs stream straight into
    connected_components / a parquet sink), pandas with
    ``attrs['skipped_buckets']`` when ``collect=True`` (the small-scale
    convenience collector)."""
    if not collect:
        if skipped_total:
            print(f"{op}: {skipped_total} over-sized LSH buckets skipped "
                  "during pair emission (boilerplate pile-ups)")
        return verified_ds
    out = verified_ds.to_pandas()
    if out.empty:
        out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64"),
                            value_col: pd.Series([], dtype="float64")})
    else:
        out = (out.astype({"id_a": "int64", "id_b": "int64",
                           value_col: "float64"})
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    out.attrs["skipped_buckets"] = skipped_total
    return out


def _empty_pairs(value_col: str, skipped_total: int, collect: bool):
    """Zero-pair result in the caller's requested shape."""
    if collect:
        out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                            "id_b": pd.Series([], dtype="int64"),
                            value_col: pd.Series([], dtype="float64")})
        out.attrs["skipped_buckets"] = skipped_total
        return out
    import ray.data

    if skipped_total:
        print(f"pair emission skipped {skipped_total} over-sized buckets")
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        value_col: pa.array([], type=pa.float64())}))


def minhash_lsh_pairs(ds, id_col: str, text_col: str, num_perm: int = 64,
                      shingle: int = 5, jaccard_threshold: float = 0.8,
                      seed: int = 42, num_partitions: int | None = None,
                      verify_partitions: int | None = None,
                      collect: bool = False):
    """Candidate pairs via band-bucket LSH, verified with exact
    character-shingle Jaccard.  Returns a LAZY Dataset of
    (id_a, id_b, jaccard) with id_a < id_b — the verified pair set is
    O(corpus) on a boilerplate-heavy crawl, so it stays in the object
    store and feeds ``connected_components`` / a sink without touching
    the driver.  ``collect=True`` instead returns a sorted pandas frame
    whose ``attrs["skipped_buckets"]`` reports how many over-sized LSH
    buckets (> max_group docs of identical band hash, i.e. boilerplate
    pile-ups) were skipped during pair emission.

    Scale shape — every heavy step is partition-parallel, nothing large
    lands on the driver:
      1. explode (id, band) rows → shuffle on ``band_hash % P`` → ONE
         vectorized pair-emission per partition (candidate pairs stay a
         Dataset in the object store);
      2. candidate *ids* (ids only, the one driver-side set — 8 B/doc;
         use a Bloom filter here if candidates ever outgrow the driver)
         broadcast to prefilter a distributed shingle extraction;
      3. verify in two bucketed shuffles: partition pairs on
         ``_ibucket(id_a)``; B-side shingles are replicated to requesting
         partitions via a (partition, id_b) request join so shingle
         payload ships at most once per (doc, partition) — never per
         pair — and exact Jaccard runs inside ``map_groups``; the driver
         only ever sees the final thresholded pairs."""
    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        # floor of 4: the input-bytes heuristic collapses small corpora
        # to ONE partition, serializing the band sort AND the pair
        # emission into a single task (measured 3× slower than 4-way on
        # this host); big inputs keep the bytes-derived count
        num_partitions = max(4, reduce_partition_count(ds))
    sigs = minhash_signatures(ds, id_col, text_col, num_perm, shingle, seed)
    n_bands = num_perm // 4

    # explode to (part, band_id, band_hash, id) rows → groupby partition
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_band, out_hash, out_id = [], [], []
        for bi in range(n_bands):
            bh = batch.column(f"band_{bi}").to_numpy(zero_copy_only=False)
            out_band.append(np.full(len(ids), bi, dtype=np.int64))
            out_hash.append(bh)
            out_id.append(ids)
        bh_all = np.concatenate(out_hash)
        part = (bh_all.view(np.uint64) % np.uint64(num_partitions)).view(np.int64)
        return pa.table({
            "__p": part,
            "band_id": np.concatenate(out_band),
            "band_hash": bh_all,
            id_col: np.concatenate(out_id),
        })

    buckets = sigs.map_batches(explode, batch_format="pyarrow")

    def emit_pairs(part: pd.DataFrame) -> pd.DataFrame:
        return _emit_capped_pairs(part, ["band_id", "band_hash"], id_col,
                                  max_group=200)

    pairs_ds = (buckets.groupby("__p")
                .map_groups(emit_pairs, batch_format="pandas").materialize())
    skipped_total = int(pairs_ds.sum("skipped_buckets") or 0)
    if pairs_ds.count() == 0:
        return _empty_pairs("jaccard", skipped_total, collect)

    def drop_summary(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.is_valid(batch.column("id_a")))
        return t.select(["id_a", "id_b"])

    pairs_ds = pairs_ds.map_batches(drop_summary, batch_format="pyarrow") \
        .materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return _empty_pairs("jaccard", skipped_total, collect)

    # Bloom-filtered extraction prefilter: candidate membership reaches
    # every extraction task as one fixed-size bitmap — NO driver-side id
    # set, so driver memory stays flat on boilerplate-heavy corpora
    nbits = _bloom_nbits(2 * n_pairs)
    bloom_ref = ray.put(_bloom_build(pairs_ds, nbits))
    # verify-stage partition count sized to the CANDIDATE set and the
    # CPUs, not the input bytes: capping by the input-derived partition
    # count collapsed verify to one task on small corpora (the whole
    # 192k-pair verify then ran serially), while P≫pairs/20k is all
    # mesh overhead
    cpus = int(ray.cluster_resources().get("CPU", 8))
    vparts = verify_partitions or int(
        max(2, min(cpus, np.ceil(2 * n_pairs / 20_000))))

    # distributed shingle extraction of (bloom-probable) candidate docs
    def extract(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bm = ray.get(bloom_ref)
        idx = np.flatnonzero(_bloom_contains(bm, ids, nbits))
        sh = [_shingle_hashes(batch.column(text_col)[int(i)].as_py(), shingle)
              for i in idx]
        return pa.table({"k": pa.array(ids[idx], type=pa.int64()),
                         "v": pa.array([s.tolist() for s in sh],
                                       type=pa.list_(pa.uint64()))})

    sh_ds = ds.map_batches(extract, batch_format="pyarrow").materialize()

    def verify_jaccard(lookup: dict, pr: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
        if len(pr) == 0:
            return empty
        out_a, out_b, out_j = [], [], []
        # vectorized per id_a: ONE searchsorted of all partners' shingles
        # against the doc's sorted set + reduceat per partner
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
                hit = (A[np.minimum(idx, len(A) - 1)] == concat).astype(np.int64)
                offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
                inter = np.zeros(len(ibs), dtype=np.int64)
                nz = lens > 0
                if nz.any():
                    inter[nz] = np.add.reduceat(hit, offs[nz])[:]
            union = lens + len(A) - inter
            jac = _r(np.where(union > 0, inter / np.maximum(union, 1), 0.0), 4)
            keep = jac >= jaccard_threshold
            out_a.append(np.full(int(keep.sum()), int(ida), dtype=np.int64))
            out_b.append(ibs[keep])
            out_j.append(jac[keep])
        return pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a else np.zeros(0, np.int64),
            "id_b": np.concatenate(out_b) if out_b else np.zeros(0, np.int64),
            "jaccard": np.concatenate(out_j) if out_j else np.zeros(0, np.float64)})

    verified = _bucketed_pair_verify(pairs_ds, sh_ds, pa.list_(pa.uint64()),
                                     _as_u64, verify_jaccard, vparts)
    return _pairs_result(verified, skipped_total, "jaccard", collect,
                         "minhash_lsh_pairs")


def ngram_jaccard_pairs(ds, id_col: str, text_col: str, shingle: int = 5,
                        threshold: float = 0.5, max_rows: int = 20_000) -> pd.DataFrame:
    """EXACT all-pairs character-n-gram Jaccard ≥ threshold (the
    brute-force baseline the LSH variant approximates).  Shingling is
    distributed; the pairwise intersection runs on the driver over the
    collected (id, sorted-shingle-array) sketches and is O(n²) — capped
    at ``max_rows`` rows (excess is dropped WITH a printed notice; use
    minhash_lsh_pairs as the scale path)."""

    def sketch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        sh = [_shingle_hashes(t, shingle) for t in texts]
        return pa.table({id_col: batch.column(id_col),
                         "sh": pa.array([s.tolist() for s in sh],
                                        type=pa.list_(pa.uint64()))})

    rows = ds.map_batches(sketch, batch_format="pyarrow").take(max_rows + 1)
    if len(rows) > max_rows:
        print(f"ngram_jaccard_pairs: input exceeds max_rows={max_rows}; "
              f"truncated (use minhash_lsh_pairs at scale)")
        rows = rows[:max_rows]
    ids = [r[id_col] for r in rows]
    shs = [np.asarray(r["sh"], dtype=np.uint64) for r in rows]
    out_a, out_b, out_j = [], [], []
    for i in range(len(ids)):
        A = shs[i]
        for j in range(i + 1, len(ids)):
            B = shs[j]
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out_a.append(a)
                out_b.append(b)
                out_j.append(float(_r(jac, 4)))
    return (pd.DataFrame({"id_a": pd.Series(out_a, dtype="int64"),
                          "id_b": pd.Series(out_b, dtype="int64"),
                          "jaccard": pd.Series(out_j, dtype="float64")})
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def simhash64(ds, id_col: str, text_col: str, shingle: int = 4):
    """Lazy Dataset of (id, simhash:int64, bucket sub-bands b0..b3)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = np.zeros(n, dtype=np.uint64)
        # one vectorized shingle pass + one lexsort dedup (the bit vote
        # IS multiplicity-sensitive, so per-row UNIQUE sets — identical
        # to the old per-row np.unique path)
        flat, lens = _shingle_hashes_flat_unique(batch.column(text_col),
                                                 shingle)
        row_off = np.concatenate(([0], np.cumsum(lens)))
        nz = np.flatnonzero(lens)
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        pw = np.uint64(1) << np.arange(64, dtype=np.uint64)
        # bit-vote via segment sums of the shingle-bit matrix (majority
        # per row ⇔ 2·ones > len); rows chunked so the 64-wide expansion
        # stays ~16 MB regardless of batch size
        start = 0
        while start < len(nz):
            end, tot = start, 0
            while end < len(nz) and tot < 32_768:
                tot += lens[nz[end]]
                end += 1
            rows = nz[start:end]
            all_h = np.concatenate([flat[row_off[i]:row_off[i + 1]]
                                    for i in rows])
            bits = ((all_h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens[rows])[:-1]))
            ones = np.add.reduceat(bits, offs, axis=0)
            maj = (2 * ones) > lens[rows][:, None]
            out[rows] = (maj * pw[None, :]).sum(axis=1, dtype=np.uint64)
            start = end
        cols = {id_col: batch.column(id_col),
                "simhash": pa.array(out.view(np.int64), type=pa.int64())}
        for k in range(4):
            cols[f"b{k}"] = pa.array(
                ((out >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64),
                type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def embedding_cosine_pairs(ds, id_col: str, emb_col: str,
                           threshold: float = 0.95, n_planes: int | None = None,
                           n_bands: int = 1, seed: int = 42,
                           max_group: int = 200, max_exact_rows: int = 200_000,
                           num_partitions: int | None = None,
                           verify_partitions: int | None = None,
                           collect: bool = False):
    """Near-dup pairs by embedding cosine ≥ threshold.  LSH paths return
    a LAZY Dataset of (id_a, id_b, cosine) by default; ``collect=True``
    returns a sorted pandas frame with ``attrs["skipped_buckets"]``.
    The ``n_planes == 0`` exact baseline computes on the driver either
    way (that is its documented nature) and wraps the frame in a Dataset
    unless ``collect=True``.

    ``n_planes == 0`` is the EXACT all-pairs baseline: the collected
    (id, normalized-vector) matrix is compared blockwise on the driver —
    O(n²) compute, hard-capped at ``max_exact_rows`` rows with a printed
    notice (the LSH path is the scale route, mirroring
    ``ngram_jaccard_pairs`` vs ``minhash_lsh_pairs``).

    Otherwise: banded random-hyperplane LSH.  ``n_bands`` independent
    bands of ``n_planes`` hyperplanes each; a pair is a candidate when
    its sign code matches in ANY band (recall grows with bands, like
    minhash band-LSH), then every candidate is verified with the exact
    cosine.  ``n_planes=None`` auto-sizes the per-band code space to the
    input (≈100 docs/bucket) so bucket count grows with data instead of
    being fixed.  Scale shape — identical to ``minhash_lsh_pairs``:
      1. narrow (band, code, id) rows shuffle on ``hash(band,code) % P``;
         ONE vectorized pair emission per partition with groups over
         ``max_group`` skipped and the skip count surfaced in
         ``result.attrs["skipped_buckets"]`` (boilerplate pile-ups never
         grind O(g²));
      2. a Bloom bitmap of candidate ids (no driver-side id set)
         prefilters a distributed vector extraction;
      3. pairs verify in bucketed partitions via the shared
         request-join payload exchange (vector bytes ship at most once
         per (doc, partition), never per pair) and stream out as a lazy
         Dataset — the driver never holds the pair set."""
    from packs_ray.functions.agg import reduce_partition_count
    from packs_ray.functions.similarity import _batch_matrix, _fit_dim

    try:
        first = next(iter(ds.select_columns([emb_col]).iter_batches(
            batch_size=1, batch_format="pyarrow")))
    except StopIteration:
        return _empty_pairs("cosine", 0, collect)
    import pyarrow.compute as pc
    dim = int(pc.max(pc.list_value_length(first.column(emb_col)))
              .as_py() or 0)
    if dim == 0:  # first block all-null: no usable vectors
        return _empty_pairs("cosine", 0, collect)

    if n_planes == 0:
        # exact baseline: driver blockwise all-pairs over the collected
        # normalized matrix (cos matrix never fully materialized)
        rows = ds.select_columns([id_col, emb_col]).take(max_exact_rows + 1)
        if len(rows) > max_exact_rows:
            print(f"embedding_cosine_pairs: exact path exceeds "
                  f"max_exact_rows={max_exact_rows}; truncated "
                  f"(use the LSH path at scale)")
            rows = rows[:max_exact_rows]
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        m = np.zeros((len(rows), dim))
        for i, r in enumerate(rows):
            v = _as_f64(r[emb_col])
            m[i, :min(dim, len(v))] = v[:dim]
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        mn = m / np.where(norms > 0, norms, 1.0)
        out_a, out_b, out_c = [], [], []
        step = 2048
        for s in range(0, len(mn), step):
            cos = mn[s:s + step] @ mn.T                   # (chunk, n)
            ia, ib = np.nonzero(cos >= threshold)
            keep = (ia + s) < ib                          # upper triangle
            ia, ib = ia[keep] + s, ib[keep]
            lo = np.minimum(ids[ia], ids[ib])
            hi = np.maximum(ids[ia], ids[ib])
            out_a.append(lo)
            out_b.append(hi)
            out_c.append(np.round(cos[ia - s, ib], 4))
        out = pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a else np.zeros(0, np.int64),
            "id_b": np.concatenate(out_b) if out_b else np.zeros(0, np.int64),
            "cosine": np.concatenate(out_c) if out_c else np.zeros(0)})
        out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        if collect:
            out.attrs["skipped_buckets"] = 0
            return out
        if out.empty:
            return _empty_pairs("cosine", 0, collect)
        import ray.data as _rd

        return _rd.from_arrow(
            _table_from_pandas(out, preserve_index=False))

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    if n_planes is None:
        # ≈100 docs per bucket per band, 4..20 planes (16 .. 1M buckets)
        n = ds.count()
        n_planes = int(np.clip(np.ceil(np.log2(max(n, 1) / 100 + 1)), 4, 20))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes * n_bands))
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        """Narrow (partition, band, code, id) bucket rows — the embedding
        payload does NOT ride the bucket shuffle."""
        pl = ray.get(pref)
        m = _fit_dim(_batch_matrix(batch, emb_col), pl.shape[0])
        signs = (m @ pl) > 0
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = 1 << np.arange(n_planes)
        out_band, out_code, out_id = [], [], []
        for bi in range(n_bands):
            code = (signs[:, bi * n_planes:(bi + 1) * n_planes] * w) \
                .sum(axis=1).astype(np.int64)
            out_band.append(np.full(len(ids), bi, dtype=np.int64))
            out_code.append(code)
            out_id.append(ids)
        band = np.concatenate(out_band)
        code = np.concatenate(out_code)
        mixed = ((code.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                 ^ band.view(np.uint64))
        return pa.table({
            "__p": (mixed % np.uint64(num_partitions)).view(np.int64),
            "band_id": band, "code": code,
            id_col: np.concatenate(out_id)})

    def emit_pairs(part: pd.DataFrame) -> pd.DataFrame:
        return _emit_capped_pairs(part, ["band_id", "code"], id_col,
                                  max_group=max_group)

    pairs_ds = (ds.map_batches(bucketize, batch_format="pyarrow")
                .groupby("__p").map_groups(emit_pairs, batch_format="pandas")
                .materialize())
    skipped_total = int(pairs_ds.sum("skipped_buckets") or 0)

    def drop_summary(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.is_valid(batch.column("id_a")))
        return t.select(["id_a", "id_b"])

    pairs_ds = pairs_ds.map_batches(drop_summary, batch_format="pyarrow") \
        .materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return _empty_pairs("cosine", skipped_total, collect)

    nbits = _bloom_nbits(2 * n_pairs)
    bloom_ref = ray.put(_bloom_build(pairs_ds, nbits))
    # candidate+CPU-sized, never input-bytes-capped (the minhash lesson:
    # small inputs collapsed verify to one serial task)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    vparts = verify_partitions or int(
        max(2, min(cpus, np.ceil(2 * n_pairs / 20_000))))

    def extract(batch: pa.Table) -> pa.Table:
        """Float64 vectors of (bloom-probable) candidate docs only."""
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bm = ray.get(bloom_ref)
        idx = np.flatnonzero(_bloom_contains(bm, ids, nbits))
        sub = batch.take(pa.array(idx, type=pa.int64()))
        m = _fit_dim(_batch_matrix(sub, emb_col), dim)
        return pa.table({"k": pa.array(ids[idx], type=pa.int64()),
                         "v": pa.array([r.tolist() for r in m],
                                       type=pa.list_(pa.float64()))})

    vec_ds = ds.map_batches(extract, batch_format="pyarrow").materialize()

    def verify_cosine(lookup: dict, pr: pd.DataFrame) -> pd.DataFrame:
        empty_g = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                "id_b": pd.Series([], dtype="int64"),
                                "cosine": pd.Series([], dtype="float64")})
        if len(pr) == 0:
            return empty_g
        out_a, out_b, out_c = [], [], []
        for ida, grp in pr.groupby("id_a", sort=False):
            A = lookup.get(int(ida), _EMPTY_F64)
            if len(A) == 0:
                continue
            na = np.linalg.norm(A)
            An = A / na if na > 0 else A
            ibs = grp["id_b"].to_numpy(dtype=np.int64)
            M = np.zeros((len(ibs), len(A)))
            for i, b in enumerate(ibs):
                v = lookup.get(int(b), _EMPTY_F64)
                M[i, :min(len(A), len(v))] = v[:len(A)]
            norms = np.linalg.norm(M, axis=1)
            cos = (M @ An) / np.where(norms > 0, norms, 1.0)
            keep = cos >= threshold
            out_a.append(np.full(int(keep.sum()), int(ida), dtype=np.int64))
            out_b.append(ibs[keep])
            out_c.append(np.round(cos[keep], 4))
        if not out_a:
            return empty_g
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    verified = _bucketed_pair_verify(pairs_ds, vec_ds, pa.list_(pa.float64()),
                                     _as_f64, verify_cosine, vparts)
    return _pairs_result(verified, skipped_total, "cosine", collect,
                         "embedding_cosine_pairs")


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (byte-table lookup; numpy<2 has no
    bitwise_count)."""
    b = np.ascontiguousarray(x.view(np.uint64)).view(np.uint8)
    return _POP8[b].reshape(-1, 8).sum(axis=1)


def simhash_pairs(ds, id_col: str, text_col: str, shingle: int = 4,
                  max_hamming: int = 3, num_partitions: int | None = None,
                  max_group: int = 1000, collect: bool = False):
    """Near-duplicate PAIRS by simhash Hamming distance — the third
    pair finder next to minhash (Jaccard) and embedding cosine.
    EXACT for ``max_hamming <= 3``: the 64-bit signature splits into 4
    disjoint 16-bit bands, and <=3 differing bits can touch at most 3
    bands, so every qualifying pair collides on at least one band
    (pigeonhole — no probabilistic recall gap).  Returns a lazy Dataset
    (id_a, id_b, hamming); ``collect`` mirrors minhash_lsh_pairs.

    Scale shape: band-bucket shuffle -> capped vectorized pair emission
    (skips surfaced) -> the shared bucketed verify exchange with the
    8-byte signature as payload (popcount of XOR per pair)."""
    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    sigs = simhash64(ds, id_col, text_col, shingle)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_band, out_val, out_id = [], [], []
        for k in range(4):
            bv = batch.column(f"b{k}").to_numpy(zero_copy_only=False)
            out_band.append(np.full(len(ids), k, dtype=np.int64))
            out_val.append(bv)
            out_id.append(ids)
        bv_all = np.concatenate(out_val)
        band_all = np.concatenate(out_band)
        mix = (bv_all.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               + band_all.view(np.uint64))
        return pa.table({
            "__p": pa.array((mix % np.uint64(num_partitions))
                            .view(np.int64)),
            "band_id": band_all, "band_val": bv_all,
            id_col: np.concatenate(out_id)})

    def emit(part: pd.DataFrame) -> pd.DataFrame:
        return _emit_capped_pairs(part, ["band_id", "band_val"], id_col,
                                  max_group=max_group)

    buckets = sigs.map_batches(explode, batch_format="pyarrow")
    pairs_raw = (buckets.groupby("__p")
                 .map_groups(emit, batch_format="pandas").materialize())
    skipped_total = int(pairs_raw.sum("skipped_buckets") or 0)
    if pairs_raw.count() == 0:
        return _empty_pairs("hamming", skipped_total, collect)
    pairs_ds = pairs_raw.map_batches(
        lambda t: t.filter(pa.compute.is_valid(t.column("id_a")))
                   .select(["id_a", "id_b"]),
        batch_format="pyarrow").materialize()
    if pairs_ds.count() == 0:
        return _empty_pairs("hamming", skipped_total, collect)

    def sig_payload(batch: pa.Table) -> pa.Table:
        sv = batch.column("simhash").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": batch.column(id_col),
            "v": pa.array([[int(np.uint64(x & 0xFFFFFFFFFFFFFFFF))]
                           for x in sv.view(np.uint64)],
                          type=pa.list_(pa.uint64()))})

    payloads = sigs.map_batches(sig_payload, batch_format="pyarrow")
    vparts = max(1, min(num_partitions,
                        int(np.ceil(pairs_ds.count() / 4000))))

    def verify_hamming(lookup: dict, pr: pd.DataFrame) -> pd.DataFrame:
        if len(pr) == 0:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64")})
        a = pr["id_a"].to_numpy(dtype=np.int64)
        b = pr["id_b"].to_numpy(dtype=np.int64)
        sa = np.array([lookup.get(int(x), _EMPTY_U64)[:1] or [0]
                       for x in a], dtype=np.uint64).ravel()
        sb = np.array([lookup.get(int(x), _EMPTY_U64)[:1] or [0]
                       for x in b], dtype=np.uint64).ravel()
        ham = _popcount64(np.bitwise_xor(sa, sb))
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep],
                             "hamming": ham[keep].astype(np.int64)})

    verified = _bucketed_pair_verify(pairs_ds, payloads,
                                     pa.list_(pa.uint64()), _as_u64,
                                     verify_hamming, vparts)
    return _pairs_result(verified, skipped_total, "hamming", collect,
                         "simhash_pairs")


def save_neardup_state(ds, id_col: str, text_col: str, state_dir: str,
                       run_id: str = "run0", *, num_perm: int = 64,
                       shingle: int = 5, seed: int = 42) -> str:
    """Persist the distinct LSH band buckets (band_id, band_hash) of a
    corpus snapshot — 16 bands x 8 B per doc before local dedup — so a
    later crawl can suppress near-duplicates of EVERYTHING seen so far
    without rescanning history (the minhash sibling of
    ``duplicates.save_dedup_state``).  Null-text rows contribute no
    bands (the SQL-replica convention).  Atomic tmp rename, idempotent
    per run_id."""
    import os
    import shutil

    import pyarrow.compute as pc

    n_bands = num_perm // 4
    sigs = minhash_signatures(
        ds.map_batches(
            lambda t: t.filter(pc.and_(t.column(id_col).is_valid(),
                                       t.column(text_col).is_valid())),
            batch_format="pyarrow"),
        id_col, text_col, num_perm, shingle, seed)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bids = np.concatenate([np.full(n, bi, dtype=np.int64)
                               for bi in range(n_bands)]) if n else \
            np.zeros(0, dtype=np.int64)
        bhs = (np.concatenate(
            [batch.column(f"band_{bi}").to_numpy(zero_copy_only=False)
             for bi in range(n_bands)]) if n else
            np.zeros(0, dtype=np.int64))
        out = pd.DataFrame({"band_id": bids, "band_hash": bhs}) \
            .drop_duplicates()
        return _table_from_pandas(out, preserve_index=False)

    tmp = os.path.join(state_dir, f".tmp_{run_id}")
    final = os.path.join(state_dir, run_id)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(state_dir, exist_ok=True)
    sigs.map_batches(explode, batch_format="pyarrow").write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)     # 0-row write emits no files
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    return final


def suppress_against_state(ds, id_col: str, text_col: str,
                           state_dirs: list[str], *, num_perm: int = 64,
                           shingle: int = 5, seed: int = 42,
                           num_partitions: int | None = None):
    """Incremental near-dup SUPPRESSION: ids of ``ds`` docs that share
    at least one LSH band bucket with the persisted history
    (``save_neardup_state``) — the continuous-crawl policy "drop
    anything that looks like something we already have" (pure-LSH
    recall semantics: two docs collide when any 4-row minhash band
    agrees, the same candidate rule ``minhash_lsh_pairs`` verifies;
    suppression deliberately skips the verify step because history
    payloads are gone — only their 16 B band marks remain).

    Scale: new-side (id, band_id, band_hash) rows and state marks
    co-partition on band_hash; per bucket one vectorized semi-join;
    output = distinct suppressed ids."""
    import glob
    import os

    import pyarrow.compute as pc

    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    n_bands = num_perm // 4

    paths: list[str] = []
    for d in state_dirs:
        if os.path.isdir(d):
            paths.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        elif os.path.exists(d):
            paths.append(d)
    filtered = ds.map_batches(
        lambda t: t.filter(pc.and_(t.column(id_col).is_valid(),
                                   t.column(text_col).is_valid())),
        batch_format="pyarrow")
    if not paths:
        return filtered.select_columns([id_col]).limit(0)

    sigs = minhash_signatures(filtered, id_col, text_col, num_perm,
                              shingle, seed)

    def explode_new(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        bids = np.concatenate([np.full(n, bi, dtype=np.int64)
                               for bi in range(n_bands)]) if n else \
            np.zeros(0, dtype=np.int64)
        bhs = (np.concatenate(
            [batch.column(f"band_{bi}").to_numpy(zero_copy_only=False)
             for bi in range(n_bands)]) if n else
            np.zeros(0, dtype=np.int64))
        out_ids = np.tile(ids, n_bands) if n else ids[:0]
        p = (bhs.view(np.uint64)
             % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({id_col: pa.array(out_ids),
                         "band_id": pa.array(bids),
                         "band_hash": pa.array(bhs),
                         "__p": pa.array(p),
                         "__side": pa.array(
                             np.zeros(len(bids), dtype=np.int8))})

    def mark_state(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        p = (bh.view(np.uint64)
             % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({id_col: pa.array(
            np.full(len(bh), _STATE_ID_SENTINEL, dtype=np.int64)),
            "band_id": batch.column("band_id"),
            "band_hash": batch.column("band_hash"),
            "__p": pa.array(p),
            "__side": pa.array(np.ones(len(bh), dtype=np.int8))})

    import ray as _ray
    state = _ray.data.read_parquet(paths) \
        .map_batches(mark_state, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["__side"] == 0]
        seen = g[g["__side"] == 1]
        if seen.empty or new.empty:
            return new.head(0)[[id_col]]
        mi_new = pd.MultiIndex.from_arrays(
            [new["band_id"], new["band_hash"]])
        mi_seen = pd.MultiIndex.from_arrays(
            [seen["band_id"], seen["band_hash"]])
        hit = new[mi_new.isin(mi_seen)]
        return hit[[id_col]].drop_duplicates()

    sup = (sigs.map_batches(explode_new, batch_format="pyarrow")
           .union(state).groupby("__p")
           .map_groups(per_bucket, batch_format="pandas"))

    def final_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g[[id_col]].drop_duplicates()

    # a doc can hit in several band partitions: one tiny id-bucketed
    # distinct pass bounds the duplicates
    def id_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(ids))
        return batch.append_column("__q", pa.array(
            (h % np.uint64(num_partitions)).astype(np.int64)))

    return (sup.map_batches(id_bucket, batch_format="pyarrow")
            .groupby("__q").map_groups(
                lambda g: final_distinct(g.drop(columns="__q")),
                batch_format="pandas"))


_STATE_ID_SENTINEL = -1


def pair_set_eval(truth: "pd.DataFrame", pred: "pd.DataFrame",
                  id_a: str = "id_a", id_b: str = "id_b") -> "pd.DataFrame":
    """Dedup-QA eval: precision/recall/F1 of a predicted near-dup pair
    set against an exact ground-truth pair set (both bounded driver
    artifacts — the contract of `ngram_jaccard_pairs` (truth, capped
    exact baseline) and `minhash_lsh_pairs(collect=True)` (prediction)).
    Run it on a sampled shard before trusting LSH parameters
    (num_perm / bands / threshold) at corpus scale — the standard
    tuning loop for MinHash dedup.

    Output: one row (n_truth, n_pred, n_common, precision, recall,
    f1), 6dp; precision/recall null when the respective side is empty."""
    import numpy as np
    import pandas as pd

    from packs_ray.stages.util import round_half_away as _r6

    t = set(zip(truth[id_a].tolist(), truth[id_b].tolist())) \
        if len(truth) else set()
    p = set(zip(pred[id_a].tolist(), pred[id_b].tolist())) \
        if len(pred) else set()
    c = len(t & p)
    prec = c / (len(p) * 1.0) if p else None
    rec = c / (len(t) * 1.0) if t else None
    f1 = None
    if prec is not None and rec is not None and (prec + rec) > 0:
        f1 = 2.0 * prec * rec / (prec + rec)
    elif prec is not None and rec is not None:
        f1 = 0.0
    return pd.DataFrame([{
        "n_truth": np.int64(len(t)), "n_pred": np.int64(len(p)),
        "n_common": np.int64(c),
        "precision": None if prec is None else float(_r6(prec, 6)),
        "recall": None if rec is None else float(_r6(rec, 6)),
        "f1": None if f1 is None else float(_r6(f1, 6))}])
