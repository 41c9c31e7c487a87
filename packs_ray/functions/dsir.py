"""DSIR-style importance weights for training-data selection.

Re-expresses the hashed n-gram importance-resampling score of Xie et
al. 2023 ("Data Selection for Language Models via Importance
Resampling", public method) as two streaming Ray Data passes:

1. **feature distributions** — every document's unigram + bigram
   feature hashes bucket into a fixed ``2**n_bits`` space (the hashing
   trick); per-batch ``bincount`` partials (one int64 vector, 512 KB at
   the 16-bit default) tree-fold to exact global counts for the SOURCE
   corpus, and the same pass over the (much smaller) TARGET corpus
   yields the target counts.  Counts are exact integers, so the
   log-ratio weight vector ``w[b] = log p_target(b) - log q_source(b)``
   (add-``smoothing`` estimates) is bit-deterministic.
2. **scoring** — one more scan: each document's score is
   ``sum(w[bucket(f)] for f in features(doc))``, vectorized as a take
   from the broadcast weight vector.  High scores = looks like the
   target distribution; resample/filter on them.

Hashing is the repo-wide scheme (FNV-1a per token + mul-rot-mul
finalize, sketches.py; bigram fold ``g = h1*B + h2`` wrapping uint64,
spandedup.py; bucket = top ``n_bits`` of a golden-ratio multiply), so a
DuckDB oracle replicates every bucket id exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.functions.sketches import _finalize, _fnv1a_str
from packs_ray.functions.spandedup import GRAM_B, _flat_tokens, _grouped_arange
from packs_ray.stages.util import round_half_away as _r

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bucketize(h: np.ndarray, n_bits: int) -> np.ndarray:
    """Top ``n_bits`` of a golden-ratio multiply — int64 bucket ids."""
    return ((h * _GOLD) >> np.uint64(64 - n_bits)).astype(np.int64)


def _doc_features(col: pa.Array, n_bits: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(bucket ids of every unigram+bigram feature, features per row)."""
    flat, lens = _flat_tokens(col)
    h = _finalize(_fnv1a_str(flat)[0])
    uni = _bucketize(h, n_bits)
    nbi = np.maximum(lens - 1, 0)
    pos = _grouped_arange(nbi)
    flat_off = np.cumsum(lens) - lens
    start = np.repeat(flat_off, nbi) + pos
    g = h[start] * GRAM_B + h[start + 1]
    bi = _bucketize(g, n_bits)
    # features row-major: each row's unigrams then its bigrams
    counts = lens + nbi
    out = np.empty(int(counts.sum()), dtype=np.int64)
    u_at = np.repeat(np.cumsum(counts) - counts, lens) + _grouped_arange(lens)
    b_at = np.repeat(np.cumsum(counts) - counts + lens, nbi) + pos
    out[u_at] = uni
    out[b_at] = bi
    return out, counts


def _count_features(ds, text_col: str, n_bits: int) -> np.ndarray:
    """Exact global feature-bucket counts: fixed-size int64 partials,
    tree-folded (the count_min_counts pattern)."""
    width = 1 << n_bits

    def partial(batch: pa.Table) -> pa.Table:
        b, _ = _doc_features(batch.column(text_col), n_bits)
        cnt = np.bincount(b, minlength=width) if len(b) else \
            np.zeros(width, dtype=np.int64)
        return pa.table({"c": pa.array([cnt.astype(np.int64).tobytes()],
                                       type=pa.binary())})

    def fold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(width, dtype=np.int64)
        for r in batch.column("c").to_pylist():
            acc += np.frombuffer(r, dtype=np.int64)
        return pa.table({"c": pa.array([acc.tobytes()], type=pa.binary())})

    rows = (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(fold, batch_format="pyarrow", batch_size=64)
            .take_all())
    acc = np.zeros(width, dtype=np.int64)
    for r in rows:
        acc += np.frombuffer(r["c"], dtype=np.int64)
    return acc


def importance_weights(ds, id_col: str, text_col: str, target_ds, *,
                       n_bits: int = 16, smoothing: float = 1.0):
    """Lazy Dataset of (id_col, n_features, logratio) — the DSIR
    log importance weight of every source document against the target
    corpus.  ``target_ds`` is a Dataset holding the target documents'
    ``text_col`` (typically a small high-quality slice; it broadcasts
    as exact counts, never as text).  Documents with zero tokens (null
    or whitespace-only text) are excluded, matching the feature model.
    ``logratio`` is rounded to 6dp."""
    import ray

    width = 1 << n_bits
    src_cnt = _count_features(ds, text_col, n_bits)
    tgt_cnt = _count_features(target_ds, text_col, n_bits)
    s_tot, t_tot = int(src_cnt.sum()), int(tgt_cnt.sum())
    w = (np.log((tgt_cnt + smoothing) / (t_tot + smoothing * width))
         - np.log((src_cnt + smoothing) / (s_tot + smoothing * width)))
    wref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(wref)
        ids = batch.column(id_col)
        b, counts = _doc_features(batch.column(text_col), n_bits)
        keep = counts > 0
        vals = wv[b]
        ends = np.cumsum(counts)
        starts = ends - counts
        sums = np.add.reduceat(vals, starts[keep]) if keep.any() else \
            np.zeros(0)
        return pa.table({
            id_col: ids.filter(pa.array(keep)),
            "n_features": pa.array(counts[keep], type=pa.int64()),
            "logratio": pa.array(_r(sums, 6), type=pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
