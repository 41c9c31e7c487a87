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
        sigs = np.stack([
            _minhash_sig(_shingle_hashes(t, shingle), av, bv) for t in texts
        ]) if len(texts) else np.zeros((0, num_perm), dtype=np.uint64)
        cols = {id_col: batch.column(id_col)}
        for bi in range(n_bands):
            band = sigs[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            # hash the band rows to one value
            bh = (band * np.uint64(0x9E3779B97F4A7C15)).sum(axis=1, dtype=np.uint64)
            cols[f"band_{bi}"] = pa.array(bh.view(np.int64), type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_pairs(ds, id_col: str, text_col: str, num_perm: int = 64,
                      shingle: int = 5, jaccard_threshold: float = 0.8,
                      seed: int = 42) -> pd.DataFrame:
    """Candidate pairs via band-bucket groupby, verified with exact
    character-shingle Jaccard.  Returns (id_a, id_b, jaccard) with
    id_a < id_b, sorted."""
    sigs = minhash_signatures(ds, id_col, text_col, num_perm, shingle, seed)
    n_bands = num_perm // 4
    # explode to (band_id, band_hash, id) rows → groupby bucket
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_band, out_hash, out_id = [], [], []
        for bi in range(n_bands):
            bh = batch.column(f"band_{bi}").to_numpy(zero_copy_only=False)
            out_band.append(np.full(len(ids), bi, dtype=np.int64))
            out_hash.append(bh)
            out_id.append(ids)
        return pa.table({
            "band_id": np.concatenate(out_band),
            "band_hash": np.concatenate(out_hash),
            id_col: np.concatenate(out_id),
        })

    buckets = sigs.map_batches(explode, batch_format="pyarrow")

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group[id_col].to_numpy())
        if len(ids) < 2 or len(ids) > 200:  # cap pathological buckets
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    pairs = (buckets.groupby(["band_id", "band_hash"])
             .map_groups(emit_pairs, batch_format="pandas").to_pandas()
             .drop_duplicates().reset_index(drop=True))
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})

    # verify with exact shingle Jaccard (texts of candidate ids only)
    need = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    texts = {}
    for b in ds.map_batches(lambda t: t.select([id_col, text_col]),
                            batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, need)
        for i in np.flatnonzero(mask):
            texts[ids[i]] = b.column(text_col)[i].as_py()
    sh = {i: _shingle_hashes(texts.get(i), shingle) for i in need}
    jac = []
    for ia, ib in zip(pairs["id_a"], pairs["id_b"]):
        A, B = sh[ia], sh[ib]
        inter = len(np.intersect1d(A, B, assume_unique=True))
        union = len(A) + len(B) - inter
        jac.append(inter / union if union else 0.0)
    pairs["jaccard"] = np.round(jac, 4)
    out = pairs[pairs["jaccard"] >= jaccard_threshold]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash64(ds, id_col: str, text_col: str, shingle: int = 4):
    """Lazy Dataset of (id, simhash:int64, bucket sub-bands b0..b3)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            hs = _shingle_hashes(t, shingle)
            if len(hs) == 0:
                continue
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((vote > 0)[::-1]).view(">u8")[0]
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

    first = next(iter(ds.select_columns([emb_col]).iter_batches(
        batch_size=1, batch_format="pyarrow")))
    dim = len(first.column(emb_col)[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        m = _batch_matrix(batch, emb_col)
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
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out = out.astype({"id_a": "int64", "id_b": "int64"})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
