"""Duplicate-substring (span-level) deduplication.

Removes every repeated ``k``-token span from the corpus, keeping only
its first occurrence (ordered by ``(doc_id, position)``) — the
distributed re-expression of exact-substring training-data dedup
(publicly described in Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better"; implemented there with a single-machine
suffix array).  Document-level dedup (stages/dedup.py, neardup.py)
cannot catch a boilerplate paragraph pasted into millions of otherwise
distinct pages; span dedup does.

Distributed shape (two shuffles, both narrow):
1. ``map_batches``: tokenize (ASCII whitespace, the repo-wide RE2
   convention shared with textstats.chunk_documents), hash every token
   (FNV-1a + finalize, sketches.py scheme), fold each ``k``-window of
   token hashes into a gram hash ``g = fold(g*B + h)`` (wrapping
   uint64) — emits ``(g, doc_id, pos)`` rows, ~20 B per token.
2. bucketed reduce on ``g``: within each gram group sorted by
   ``(doc_id, pos)`` every row after the first is a duplicate
   occurrence -> emit ``(doc_id, pos)`` marks (tiny).
3. co-partition marks with the docs on ``hash(doc_id)`` and rebuild per
   bucket: coverage via a +1/-1 diff array over token positions, kept
   tokens re-joined with single spaces.

All arithmetic is integer/wrapping and the tokenizer is RE2-exact, so a
DuckDB replica (list_reduce HUGEINT fold) reproduces results
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.sketches import _finalize, _fnv1a_str

_WS = " \t\n\r\f\v"
_WS_RE = "[ \t\n\r\f\v]+"
GRAM_B = np.uint64(1099511628211)          # fold multiplier (FNV prime)


def _flat_tokens(col: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """(flattened token array, per-row token counts); null/empty rows
    count 0 tokens."""
    trimmed = pc.utf8_trim(pc.fill_null(col, ""), _WS)
    lists = pc.split_pattern_regex(trimmed, _WS_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy().astype(np.int64)
    lens = off[1:] - off[:-1]
    # a zero-token document splits to [""] — mask it out
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    keep = np.ones(len(flat), dtype=bool)
    keep[(off[:-1] - off[0])[empty]] = False
    lens = np.where(empty, 0, lens)
    return flat.filter(pa.array(keep)), lens


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for non-negative counts."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return np.arange(total, dtype=np.int64) - starts


def _gram_rows(ids: np.ndarray, col: pa.Array, k: int
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(g, doc_id, pos) arrays for every k-token window of the batch."""
    flat, lens = _flat_tokens(col)
    h = _finalize(_fnv1a_str(flat)[0])
    nwin = np.maximum(lens - k + 1, 0)
    pos = _grouped_arange(nwin)
    doc = np.repeat(ids, nwin)
    flat_off = np.cumsum(lens) - lens
    start = np.repeat(flat_off, nwin) + pos
    g = np.zeros(len(pos), dtype=np.uint64)
    for j in range(k):
        g = g * GRAM_B + h[start + j]
    return g, doc, pos


SKETCH_D = 2                      # prefilter rows (double hashing)
_SK_C3 = np.uint64(0xC2B2AE3D27D4EB4F)


def _sketch_pos(g: np.ndarray, width: int) -> np.ndarray:
    """(SKETCH_D, n) cell positions for gram hashes (the
    sketches._cms_positions double-hashing scheme)."""
    h2 = (g * _SK_C3) | np.uint64(1)
    a = (g % np.uint64(width)).astype(np.int64)
    b = (h2 % np.uint64(width)).astype(np.int64)
    j = np.arange(SKETCH_D, dtype=np.int64)[:, None]
    return (a[None, :] + j * b[None, :]) % width


def _build_gram_sketch(ds, id_col: str, text_col: str, k: int, width: int):
    """Saturating (cap 2) count-min sketch over every gram hash in the
    corpus: one tokenize+hash scan, fixed SKETCH_D x width uint8
    partials tree-folded to a single bitmap.  min-over-rows == 1 is an
    UPPER bound of 1, i.e. a provable singleton — CMS never
    undercounts, so the prefilter is exact."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        g, _, _ = _gram_rows(ids, batch.column(text_col), k)
        cnt = np.zeros((SKETCH_D, width), dtype=np.uint8)
        if len(g):
            pos = _sketch_pos(g, width)
            for j in range(SKETCH_D):
                bc = np.bincount(pos[j], minlength=width)
                cnt[j] = np.minimum(bc, 2).astype(np.uint8)
        return pa.table({"sk": pa.array([cnt.tobytes()], type=pa.binary())})

    def fold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(SKETCH_D * width, dtype=np.uint8)
        for b in batch.column("sk").to_pylist():
            # saturate at 2 each step: 2+2 never overflows uint8
            acc = np.minimum(
                acc.astype(np.int16)
                + np.frombuffer(b, dtype=np.uint8).astype(np.int16),
                2).astype(np.uint8)
        return pa.table({"sk": pa.array([acc.tobytes()], type=pa.binary())})

    parts = (ds.select_columns([id_col, text_col])
             .map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow", batch_size=32)
             .take_all())
    acc = np.zeros(SKETCH_D * width, dtype=np.uint8)
    for r in parts:
        acc = np.minimum(acc.astype(np.int16)
                         + np.frombuffer(r["sk"], dtype=np.uint8)
                         .astype(np.int16), 2).astype(np.uint8)
    return acc.reshape(SKETCH_D, width)


def duplicate_spans(ds, id_col: str, text_col: str, k: int = 8,
                    num_partitions: int | None = None,
                    prefilter: "bool | str" = "auto",
                    prefilter_width: int = 1 << 22,
                    prefilter_min_rows: int = 2_000_000):
    """Lazy Dataset of duplicate-occurrence marks ``(id_col, pos)`` —
    every k-token window that repeats an earlier ``(doc, pos)``
    occurrence of the same gram anywhere in the corpus.

    ``prefilter`` runs a saturating count-min pass first and drops
    grams whose CMS upper bound is 1 — provable singletons that cannot
    participate in a duplicate — before the (g, doc, pos) shuffle,
    cutting the dominant exchange ~86% on a mostly-unique corpus while
    keeping results EXACT (over-counts only ever keep extra grams).
    The pass costs one extra tokenize+hash scan, which only pays once
    the exchange is the bottleneck, so ``"auto"`` (default) enables it
    above ``prefilter_min_rows`` input rows (a cheap parquet-metadata
    count) and skips it on small single-node inputs.  Size
    ``prefilter_width`` to ≥4x the expected distinct-gram count for a
    ~95% singleton drop rate (at the 8 MB default the sketch stops
    discriminating around ~10M grams; raise it beyond that)."""
    import ray

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    if prefilter == "auto":
        prefilter = ds.count() >= prefilter_min_rows
    sketch_ref = (ray.put(_build_gram_sketch(ds, id_col, text_col, k,
                                             prefilter_width))
                  if prefilter else None)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        g, doc, pos = _gram_rows(ids, batch.column(text_col), k)
        if sketch_ref is not None and len(g):
            sk = ray.get(sketch_ref)
            p = _sketch_pos(g, prefilter_width)
            ub = sk[np.arange(SKETCH_D)[:, None], p].min(axis=0)
            keep = ub >= 2
            g, doc, pos = g[keep], doc[keep], pos[keep]
        return pa.table({"g": pa.array(g, type=pa.uint64()),
                         id_col: pa.array(doc, type=pa.int64()),
                         "pos": pa.array(pos, type=pa.int64())})

    grams = ds.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow")

    def dups_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["g", id_col, "pos"], kind="stable")
        dup = df["g"].to_numpy()[1:] == df["g"].to_numpy()[:-1]
        mask = np.concatenate([[False], dup]) if len(df) else np.zeros(0, bool)
        return df.loc[mask, [id_col, "pos"]]

    return bucketed_group_reduce(grams, ["g"], dups_in_bucket,
                                 num_partitions)


def dedup_spans(ds, id_col: str, text_col: str, k: int = 8,
                num_partitions: int | None = None,
                prefilter: "bool | str" = "auto",
                prefilter_width: int = 1 << 22):
    """Span-level dedup of the corpus: rebuild every document with all
    duplicated k-token spans removed (first corpus occurrence kept).

    Returns a lazy Dataset: (id_col, n_tokens, n_dup_tokens,
    text_deduped) — text re-joined with single spaces (whitespace is
    normalized, as in chunk_documents).
    """
    from packs_ray.functions.agg import row_shuffle_partitions

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)

    marks = duplicate_spans(ds, id_col, text_col, k, num_partitions,
                            prefilter=prefilter,
                            prefilter_width=prefilter_width)

    def mark_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            "pos": batch.column("pos"),
            text_col: pa.nulls(len(batch), type=pa.string())})

    def doc_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            "pos": pa.array(np.full(len(batch), -1, dtype=np.int64)),
            text_col: pc.cast(batch.column(text_col), pa.string())})

    both = (ds.select_columns([id_col, text_col])
            .map_batches(doc_side, batch_format="pyarrow")
            .union(marks.map_batches(mark_side, batch_format="pyarrow")))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(ids))
        return batch.append_column(
            "bucket",
            pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def rebuild(gdf: pd.DataFrame) -> pd.DataFrame:
        docs = (gdf[gdf["pos"] < 0].sort_values(id_col)
                .reset_index(drop=True))
        dups = gdf[gdf["pos"] >= 0]
        if len(docs) == 0:
            return pd.DataFrame({id_col: [], "n_tokens": [],
                                 "n_dup_tokens": [], "text_deduped": []})
        flat, lens = _flat_tokens(pa.array(docs[text_col], type=pa.string()))
        flat_off = np.cumsum(lens) - lens
        total = int(lens.sum())
        diff = np.zeros(total + 1, dtype=np.int64)
        if len(dups):
            di = docs[id_col].searchsorted(dups[id_col].to_numpy())
            p = dups["pos"].to_numpy()
            np.add.at(diff, flat_off[di] + p, 1)
            np.add.at(diff, np.minimum(flat_off[di] + p + k,
                                       flat_off[di] + lens[di]), -1)
        covered = np.cumsum(diff[:-1]) > 0
        toks = pd.Series(flat.to_pandas().to_numpy())
        row_of = np.repeat(np.arange(len(docs), dtype=np.int64), lens)
        kept = toks[~covered]
        joined = kept.groupby(row_of[~covered]).agg(" ".join)
        text_out = pd.Series("", index=np.arange(len(docs)), dtype="object")
        text_out.loc[joined.index] = joined
        kept_counts = np.bincount(row_of[~covered], minlength=len(docs))
        return pd.DataFrame({
            id_col: docs[id_col].to_numpy(),
            "n_tokens": lens.astype(np.int64),
            "n_dup_tokens": (lens - kept_counts).astype(np.int64),
            "text_deduped": text_out.to_numpy()})

    return (both.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(rebuild, batch_format="pandas"))
