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
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.zeros((n, num_perm), dtype=np.uint64)
        hs_list = [_shingle_hashes(t, shingle) for t in texts]
        lens = np.array([len(h) for h in hs_list], dtype=np.int64)
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
            x = np.concatenate([hs_list[i] for i in rows]) & np.uint64(0xFFFFFFFF)
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


def _as_u64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64) if x is not None and not (
        isinstance(x, float) and np.isnan(x)) else _EMPTY_U64


def minhash_lsh_pairs(ds, id_col: str, text_col: str, num_perm: int = 64,
                      shingle: int = 5, jaccard_threshold: float = 0.8,
                      seed: int = 42, num_partitions: int | None = None,
                      verify_partitions: int | None = None) -> pd.DataFrame:
    """Candidate pairs via band-bucket LSH, verified with exact
    character-shingle Jaccard.  Returns (id_a, id_b, jaccard) with
    id_a < id_b, sorted.  ``result.attrs["skipped_buckets"]`` reports how
    many over-sized LSH buckets (> max_group docs of identical band hash,
    i.e. boilerplate pile-ups) were skipped during pair emission.

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
        num_partitions = reduce_partition_count(ds)
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
        g = part.sort_values(["band_id", "band_hash", id_col], kind="stable")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        sizes = np.diff(np.append(np.flatnonzero(new), len(g)))
        a, b, n_skipped = _pairs_within_sorted_groups(ids, sizes)
        out = (pd.DataFrame({"id_a": pd.array(a, dtype="Int64"),
                             "id_b": pd.array(b, dtype="Int64")})
               .drop_duplicates())
        out["skipped_buckets"] = np.int64(0)
        if n_skipped:
            # one null-id summary row carries the partition's skip count
            out = pd.concat([out, pd.DataFrame(
                {"id_a": pd.array([None], dtype="Int64"),
                 "id_b": pd.array([None], dtype="Int64"),
                 "skipped_buckets": np.array([n_skipped], dtype=np.int64)})],
                ignore_index=True)
        return out

    empty_out = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
    empty_out.attrs["skipped_buckets"] = 0

    pairs_ds = (buckets.groupby("__p")
                .map_groups(emit_pairs, batch_format="pandas").materialize())
    skipped_total = int(pairs_ds.sum("skipped_buckets") or 0)
    empty_out.attrs["skipped_buckets"] = skipped_total
    if pairs_ds.count() == 0:
        return empty_out

    def drop_summary(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.is_valid(batch.column("id_a")))
        return t.select(["id_a", "id_b"])

    pairs_ds = pairs_ds.map_batches(drop_summary, batch_format="pyarrow")

    # candidate id set (ids only) for the extraction prefilter
    def batch_ids(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            batch.column("id_a").to_numpy(zero_copy_only=False),
            batch.column("id_b").to_numpy(zero_copy_only=False)]))
        return pa.table({"id": pa.array(u, type=pa.int64())})

    need_parts = pairs_ds.map_batches(batch_ids, batch_format="pyarrow") \
        .to_arrow_refs()
    # zero-row blocks bypass the UDF and keep the upstream schema — skip
    chunks = [t.column("id").to_numpy(zero_copy_only=False)
              for t in map(ray.get, need_parts)
              if t.num_rows and "id" in t.column_names]
    need = np.unique(np.concatenate(chunks or [np.zeros(0, np.int64)]))
    if len(need) == 0:
        return empty_out
    need_ref = ray.put(need)
    # verify-stage partition count sized to the CANDIDATE set, not the
    # input: a sort-exchange with P≫rows/1000 is all mesh overhead
    vparts = verify_partitions or int(
        max(1, min(num_partitions, np.ceil(len(need) / 4000))))

    # distributed shingle extraction of candidate docs only
    def extract(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        nd = ray.get(need_ref)  # sorted
        pos = np.searchsorted(nd, ids)
        mask = nd[np.minimum(pos, len(nd) - 1)] == ids
        idx = np.flatnonzero(mask)
        sh = [_shingle_hashes(batch.column(text_col)[int(i)].as_py(), shingle)
              for i in idx]
        return pa.table({"k": pa.array(ids[idx], type=pa.int64()),
                         "other": pa.nulls(len(idx), pa.int64()),
                         "sh": pa.array([s.tolist() for s in sh],
                                        type=pa.list_(pa.uint64())),
                         "kind": pa.array(np.zeros(len(idx), dtype=np.int8)),
                         "__p": pa.array(_ibucket(ids[idx], vparts))})

    sh_ds = ds.map_batches(extract, batch_format="pyarrow").materialize()

    # ---- verify: pairs are partitioned by _ibucket(id_a); each partition
    # needs the shingles of its id_a docs (routed directly — a doc's own
    # bucket IS _ibucket(id)) and of its id_b partners (replicated via a
    # (partition, id_b) request join).  Shingle payload thus ships at most
    # once per (doc, partition) — NOT once per candidate pair, which blows
    # up ~pairs/doc× on boilerplate-heavy corpora.
    def _vtable(__p, id_a, id_b, k, sh, kind) -> pa.Table:
        n = len(__p)
        return pa.table({
            "__p": pa.array(np.asarray(__p, dtype=np.int64)),
            "id_a": (pa.nulls(n, pa.int64()) if id_a is None
                     else pa.array(np.asarray(id_a, dtype=np.int64))),
            "id_b": (pa.nulls(n, pa.int64()) if id_b is None
                     else pa.array(np.asarray(id_b, dtype=np.int64))),
            "k": (pa.nulls(n, pa.int64()) if k is None
                  else pa.array(np.asarray(k, dtype=np.int64))),
            "sh": (pa.nulls(n, pa.list_(pa.uint64())) if sh is None else sh),
            "kind": pa.array(np.full(n, kind, dtype=np.int8))})

    def pair_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return _vtable(_ibucket(a, vparts), a, b, None, None, 1)

    def request_rows(batch: pa.Table) -> pa.Table:
        """Distinct (requesting partition, id_b) rows, keyed for the
        shingle exchange on _ibucket(id_b)."""
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([_ibucket(a, vparts), b], axis=1), axis=0)
        return _vtable(_ibucket(uniq[:, 1], vparts), uniq[:, 0], None,
                       uniq[:, 1], None, 1)

    def sh_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        return _vtable(_ibucket(k, vparts), None, None, k,
                       batch.column("sh"), 0)

    def replicate(g: pd.DataFrame) -> pa.Table:
        """Join shingle rows to the distinct partitions requesting them."""
        kind = g["kind"].to_numpy()
        shr = g.loc[kind == 0, ["k", "sh"]]
        req = g.loc[kind == 1, ["id_a", "k"]].drop_duplicates()
        merged = req.merge(shr, on="k", how="inner")
        sh = pa.array([_as_u64(x).tolist() for x in merged["sh"]],
                      type=pa.list_(pa.uint64()))
        return _vtable(merged["id_a"].to_numpy(dtype=np.int64), None, None,
                       merged["k"].to_numpy(dtype=np.int64), sh, 0)

    # with a single verify partition every candidate's shingles land in
    # partition 0 via the direct route — the request-join exchange would
    # be pure overhead
    replicas = None
    if vparts > 1:
        replicas = (pairs_ds.map_batches(request_rows, batch_format="pyarrow")
                    .union(sh_ds.map_batches(sh_rows, batch_format="pyarrow"))
                    .groupby("__p").map_groups(replicate, batch_format="pandas"))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy()
        shr = g.loc[kind == 0]
        lookup = {int(k): _as_u64(s) for k, s in zip(shr["k"], shr["sh"])}
        pr = g.loc[kind == 1, ["id_a", "id_b"]].drop_duplicates()  # global dedup
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

    inputs = pairs_ds.map_batches(pair_rows, batch_format="pyarrow")
    others = [sh_ds.map_batches(sh_rows, batch_format="pyarrow")]
    if replicas is not None:
        others.append(replicas)
    out = (inputs.union(*others)
           .groupby("__p").map_groups(verify, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return empty_out
    out = (out.astype({"id_a": "int64", "id_b": "int64", "jaccard": "float64"})
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    out.attrs["skipped_buckets"] = skipped_total
    return out


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
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        hs_list = [_shingle_hashes(t, shingle) for t in texts]
        lens = np.array([len(h) for h in hs_list], dtype=np.int64)
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
            all_h = np.concatenate([hs_list[i] for i in rows])
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
                           threshold: float = 0.95, n_planes: int = 8,
                           seed: int = 42) -> pd.DataFrame:
    """Near-dup pairs by cosine ≥ threshold, bucketed by random-hyperplane
    LSH signs so only same-bucket pairs are compared (scale path; exact
    within bucket)."""
    from packs_ray.functions.similarity import _batch_matrix

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
    try:
        first = next(iter(ds.select_columns([emb_col]).iter_batches(
            batch_size=1, batch_format="pyarrow")))
    except StopIteration:
        return empty
    import pyarrow.compute as pc
    dim = int(pc.max(pc.list_value_length(first.column(emb_col)))
              .as_py() or 0)
    if dim == 0:  # first block all-null: no usable vectors
        return empty
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        from packs_ray.functions.similarity import _fit_dim
        pl = ray.get(pref)
        m = _fit_dim(_batch_matrix(batch, emb_col), pl.shape[0])
        signs = (m @ pl) > 0
        code = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table({id_col: batch.column(id_col), emb_col: batch.column(emb_col),
                         "lsh_bucket": pa.array(code, type=pa.int64())})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        m = np.stack(g[emb_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        mn = m / np.where(norms > 0, norms, 1.0)
        cos = mn @ mn.T
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(len(g), k=1)
        sel = cos[ia, ib] >= threshold
        return pd.DataFrame({"id_a": np.minimum(ids[ia[sel]], ids[ib[sel]]),
                             "id_b": np.maximum(ids[ia[sel]], ids[ib[sel]]),
                             "cosine": np.round(cos[ia[sel], ib[sel]], 4)})

    out = (ds.map_batches(bucketize, batch_format="pyarrow")
           .groupby("lsh_bucket").map_groups(pairs_in_bucket, batch_format="pandas")
           .to_pandas())
    if out.empty or "id_a" not in out.columns:
        return empty
    out = out.astype({"id_a": "int64", "id_b": "int64"})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
