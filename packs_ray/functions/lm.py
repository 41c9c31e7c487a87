"""Corpus-trained byte-bigram language model + perplexity scoring.

The pipeline's :class:`packs_ray.models.PerplexityModel` ships with an
embedded English training corpus (the KenLM stand-in).  This module
adds the other half of the KenLM story: TRAIN the n-gram model on the
corpus itself with one streaming Ray Data pass, then score every
document against it — the self-perplexity signal CCNet/Gopher-style
pipelines use to rank documents by "how typical of the corpus is this
text".

Training is a fixed-size exact count: each batch bincounts its
within-row byte bigrams into a 256x256 int64 matrix (512 KB partial),
partials tree-fold, and the add-one-smoothed log2 table broadcasts to
the scoring pass.  Everything is exact integers until the final
division, so a DuckDB oracle reproduces the table cell-for-cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from packs_ray.models import _utf8_buffers, bits_per_byte_from_logp
from packs_ray.stages.util import round_half_away as _r


def _batch_bigram_counts(text: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Flat 65536-cell int64 bigram counts of a batch's rows — pairs
    never cross row boundaries."""
    data, offsets = _utf8_buffers(text)
    if len(data) < 2:
        return np.zeros(256 * 256, dtype=np.int64)
    idx = (data[:-1].astype(np.uint16) << np.uint16(8)) | data[1:]
    mask = np.ones(len(idx), dtype=bool)
    # a pair starting at a row's last byte crosses the boundary; guard
    # the edges (leading/trailing empty rows put boundaries at 0 / end)
    ends = offsets[1:-1]
    ends = ends[(ends > 0) & (ends < len(data))]
    mask[ends - 1] = False
    return np.bincount(idx[mask].astype(np.int64), minlength=256 * 256)


def train_byte_bigram_counts(ds, text_col: str) -> np.ndarray:
    """(256, 256) exact corpus bigram counts — one streaming scan of
    fixed 512 KB partials, tree-folded (the dsir/count-min pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        cnt = _batch_bigram_counts(batch.column(text_col))
        return pa.table({"c": pa.array([cnt.tobytes()], type=pa.binary())})

    def fold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(256 * 256, dtype=np.int64)
        for r in batch.column("c").to_pylist():
            acc += np.frombuffer(r, dtype=np.int64)
        return pa.table({"c": pa.array([acc.tobytes()], type=pa.binary())})

    rows = (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(fold, batch_format="pyarrow", batch_size=64)
            .take_all())
    acc = np.zeros(256 * 256, dtype=np.int64)
    for r in rows:
        acc += np.frombuffer(r["c"], dtype=np.int64)
    return acc.reshape(256, 256)


def logp_from_counts(counts: np.ndarray) -> np.ndarray:
    """Add-one smoothed log2 conditional table from exact counts."""
    c = counts.astype(np.float64) + 1.0
    return np.log2(c / c.sum(axis=1, keepdims=True))


def corpus_perplexity(ds, id_col: str, text_col: str, *,
                      counts: np.ndarray | None = None):
    """Lazy Dataset of (id_col, n_bytes, bits_per_byte): every row's
    mean negative bigram log2-prob under the byte-bigram LM trained on
    the corpus itself (or on ``counts`` from another corpus — pass the
    reference-corpus counts to score drift against a known-good
    distribution).  Rows with < 2 bytes (null/empty) score 0.0.
    ``bits_per_byte`` is rounded to 6dp."""
    import ray

    if counts is None:
        counts = train_byte_bigram_counts(ds, text_col)
    logp_ref = ray.put(logp_from_counts(counts))

    def score(batch: pa.Table) -> pa.Table:
        logp = ray.get(logp_ref)
        text = batch.column(text_col)
        _, offsets = _utf8_buffers(text)
        bpb = bits_per_byte_from_logp(logp, text)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bytes": pa.array(offsets[1:] - offsets[:-1], type=pa.int64()),
            "bits_per_byte": pa.array(_r(bpb, 6), type=pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
