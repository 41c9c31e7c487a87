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
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


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


def _doc_token_ids(batch: pa.Table, text_col: str, lut: dict,
                   unk_id: int = 0):
    """Shared whitespace-tokenize → vocabulary-id step: returns
    (doc_idx, ids) flat arrays for a batch under the build_vocab
    trim/split contract (empty/null docs contribute nothing)."""
    import pandas as pd
    import pyarrow.compute as pc

    from packs_ray.stages.util import str_column

    col = str_column(batch, text_col)
    trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
    lists = pc.split_pattern_regex(trimmed, "[ \t\n\r\f\v]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    off = lists.offsets.to_numpy().astype(np.int64)
    lens = np.diff(off - off[0])
    flat = lists.flatten().to_pandas().to_numpy()
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    keep = np.ones(len(flat), dtype=bool)
    keep[(off[:-1] - off[0])[empty]] = False   # drop the [""] token
    flat, doc_idx = flat[keep], doc_idx[keep]
    ids = (pd.Series(flat).map(lut).fillna(unk_id)
           .astype("int64").to_numpy())
    return doc_idx, ids


def train_token_bigram_counts(ds, text_col: str, vocab,
                              *, num_partitions: int | None = None):
    """Exact corpus (w1, w2) adjacent-token-bigram counts over
    vocabulary ids (UNK folded to id 0; pairs never cross documents).

    Scale shape: per-batch pair-count combiners (bounded by the batch,
    emitted as (w1, w2, cnt) partials), ONE pair-bucketed sum reduce —
    the result is bounded by (len(vocab)+1)² rows regardless of corpus
    size, so collecting it as the model artifact is the honest landing
    spot (the unigram_divergence / build_vocab convention).

    Returns a pandas frame (w1, w2, cnt) sorted by (w1, w2)."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    lut = dict(zip(vocab["token"], vocab["token_id"].astype(int)))

    def pair_counts(batch: pa.Table) -> pa.Table:
        doc_idx, ids = _doc_token_ids(batch, text_col, lut)
        if len(ids) < 2:
            return pa.table({"w1": pa.array([], type=pa.int64()),
                             "w2": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        same = doc_idx[1:] == doc_idx[:-1]
        w1, w2 = ids[:-1][same], ids[1:][same]
        g = (pd.DataFrame({"w1": w1, "w2": w2})
             .groupby(["w1", "w2"], sort=False).size()
             .rename("cnt").reset_index())
        return _table_from_pandas(g.astype("int64"),
                                    preserve_index=False)

    parts = ds.select_columns([text_col]).map_batches(
        pair_counts, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["w1", "w2"], sort=False)["cnt"].sum()
        return out.reset_index().astype("int64")

    bg = bucketed_group_reduce(parts, ["w1", "w2"], reduce_fn,
                               num_partitions).to_pandas()
    if "cnt" not in bg.columns:       # 0-row input: no block ever ran
        bg = pd.DataFrame({"w1": pd.Series([], dtype="int64"),
                           "w2": pd.Series([], dtype="int64"),
                           "cnt": pd.Series([], dtype="int64")})
    return bg.sort_values(["w1", "w2"]).reset_index(drop=True)


def token_bigram_perplexity(ds, id_col: str, text_col: str, *,
                            vocab_size: int = 1024,
                            num_partitions: int | None = None):
    """Word-level KenLM-style self-perplexity: train an add-one-smoothed
    token-bigram LM on the corpus itself (top-``vocab_size`` vocabulary,
    OOV folded to UNK), then score every document's
    ``bits_per_token = -(1/n)·Σ log2 P(w_i | w_{i-1})`` — the CCNet
    perplexity-ranking signal, trained distributively instead of
    shipped as a fixed model (reference scores quality per-column only,
    e.g. completeness_pack/main.py:34-68; this is the corpus-LM
    generalization a training-data pipeline needs).

    Three streaming passes, all bounded exchanges: (1) ``build_vocab``
    (token-bucketed count reduce, bounded k-row artifact), (2)
    ``train_token_bigram_counts`` (pair-bucketed reduce, bounded
    (V+1)² artifact), (3) a stateless scoring map with the model in the
    task closure (Ray serializes it once per task; ``ray.put`` it
    explicitly for vocabularies far above tens of MB).  Per-bigram
    log-probs are ONE pinned float64 expression of exact integer counts
    (``log2((c+1)/(cw1+V_sm))``, V_sm = len(vocab)+1); the per-doc mean
    is 6dp-rounded — the perplexity_corpus oracle convention.

    Output: lazy Dataset (id, n_tokens, n_bigrams, bits_per_token);
    docs with < 2 tokens (incl. null/empty) score 0.0."""
    from packs_ray.functions.textstats import build_vocab

    vocab = build_vocab(ds, text_col, k=vocab_size,
                        num_partitions=num_partitions)
    bg = train_token_bigram_counts(ds, text_col, vocab,
                                   num_partitions=num_partitions)
    lut = dict(zip(vocab["token"], vocab["token_id"].astype(int)))
    mult = np.int64(vocab_size + 1)          # pinned: requested V + 1
    v_sm = float(len(vocab) + 1)             # actual vocab incl. UNK
    keys = (bg["w1"].to_numpy(dtype=np.int64) * mult
            + bg["w2"].to_numpy(dtype=np.int64))
    cnts = bg["cnt"].to_numpy(dtype=np.int64)
    ctx = bg.groupby("w1", sort=True)["cnt"].sum()
    ctx_ids = ctx.index.to_numpy(dtype=np.int64)
    ctx_cnts = ctx.to_numpy(dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        doc_idx, ids = _doc_token_ids(batch, text_col, lut)
        n = len(batch)
        n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(ids) >= 2:
            same = doc_idx[1:] == doc_idx[:-1]
            w1, w2 = ids[:-1][same], ids[1:][same]
            didx = doc_idx[:-1][same]
        else:
            w1 = w2 = didx = np.array([], dtype=np.int64)
        k = w1 * mult + w2
        if len(keys):
            pos = np.clip(np.searchsorted(keys, k), 0, len(keys) - 1)
            c = np.where(keys[pos] == k, cnts[pos], 0).astype(np.float64)
        else:
            c = np.zeros(len(k), dtype=np.float64)
        if len(ctx_ids):
            cpos = np.clip(np.searchsorted(ctx_ids, w1), 0,
                           len(ctx_ids) - 1)
            cw = np.where(ctx_ids[cpos] == w1, ctx_cnts[cpos],
                          0).astype(np.float64)
        else:
            cw = np.zeros(len(w1), dtype=np.float64)
        lp = np.log2((c + 1.0) / (cw + v_sm))
        slp = np.bincount(didx, weights=lp, minlength=n)
        nb = np.bincount(didx, minlength=n).astype(np.int64)
        bits = np.where(nb > 0, -slp / np.maximum(nb, 1), 0.0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "n_bigrams": pa.array(nb),
            "bits_per_token": pa.array(_r(bits, 6), type=pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def naive_bayes_classify(ds, id_col: str, text_col: str, label_col: str,
                         *, vocab_size: int = 512,
                         num_partitions: int | None = None):
    """Multinomial Naive Bayes text classifier — train on the corpus's
    own labels, score every document back: the fastText-style
    supervised source/language/quality classifier of large-scale
    curation stacks, expressed as two bounded-exchange streaming
    passes (the reference has no supervised models at all; this is the
    natural next step after the unsupervised LMs above).

    Train: (1) :func:`~packs_ray.functions.textstats.build_vocab`
    (top-``vocab_size`` whitespace tokens, UNK id 0 — the token-LM
    contract); (2) one bucketed reduce of per-(class, token-id) exact
    counts plus per-class doc counts (id -1 rows) — the model artifact
    is bounded by ``C * (V + 2)`` rows regardless of corpus size.

    Score (stateless map, model in the task closure): per class,
    ``ln(n_c / n_docs) + sum_runs cnt * ln((c_{t,c} + 1) / (tot_c +
    V_sm))`` with the run terms accumulated in ascending token-id
    order (np.add.reduceat == the oracle's list_sum over an
    id-ordered list), ``V_sm = len(vocab) + 1``; prediction = argmax,
    ties to the lexicographically smallest class; per-class log-probs
    from exact integer counts via libm ``math.log`` (the bm25
    convention).  Docs with a null label still score (they just don't
    train).  Returns a lazy Dataset (id, pred, logp 6dp); if no
    labeled docs exist the output is empty.
    """
    import math

    import pandas as pd
    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.functions.textstats import build_vocab
    from packs_ray.stages.util import str_column

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    vocab = build_vocab(ds, text_col, k=vocab_size,
                        num_partitions=num_partitions)
    lut = dict(zip(vocab["token"], vocab["token_id"].astype(int)))
    n_ids = len(vocab) + 1                       # + UNK id 0

    def train_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(label_col)))
        empty = pa.table({"label": pa.array([], type=pa.string()),
                          "id": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        if len(batch) == 0:
            return empty
        labels = str_column(batch, label_col).to_pandas().to_numpy()
        doc_idx, ids = _doc_token_ids(batch, text_col, lut)
        tok_lab = labels[doc_idx]
        g = (pd.DataFrame({"label": tok_lab, "id": ids})
             .groupby(["label", "id"], sort=False).size()
             .rename("cnt").reset_index())
        dc = (pd.Series(labels).value_counts().rename("cnt")
              .rename_axis("label").reset_index())
        dc["id"] = np.int64(-1)
        out = pd.concat([g, dc[["label", "id", "cnt"]]],
                        ignore_index=True)
        out["id"] = out["id"].astype("int64")
        out["cnt"] = out["cnt"].astype("int64")
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["label", "id"], sort=False)["cnt"].sum()
        return out.reset_index()

    art = bucketed_group_reduce(
        ds.select_columns([text_col, label_col]).map_batches(
            train_partial, batch_format="pyarrow"),
        ["label", "id"], reduce_fn, num_partitions).to_pandas()
    empty_out = pa.table({id_col: pa.array([], type=pa.int64()),
                          "pred": pa.array([], type=pa.string()),
                          "logp": pa.array([], type=pa.float64())})
    if art.empty or "label" not in art.columns:
        return ds.map_batches(lambda b: empty_out,
                              batch_format="pyarrow")
    classes = sorted(art["label"].unique().tolist())
    cidx = {c: i for i, c in enumerate(classes)}
    v_sm = float(n_ids)                          # vocab incl. UNK
    nc = np.zeros(len(classes), dtype=np.int64)
    tot = np.zeros(len(classes), dtype=np.int64)
    cnt_mat = np.zeros((len(classes), n_ids), dtype=np.int64)
    for lab, i, c in art[["label", "id", "cnt"]].itertuples(index=False):
        ci = cidx[lab]
        if i == -1:
            nc[ci] = c
        else:
            cnt_mat[ci, int(i)] = c
            tot[ci] += c
    n_docs = int(nc.sum())
    prior = np.array([math.log(int(nc[ci]) / n_docs)
                      for ci in range(len(classes))])
    lnp = np.empty((len(classes), n_ids), dtype=np.float64)
    for ci in range(len(classes)):
        denom = float(tot[ci]) + v_sm
        for i in range(n_ids):
            lnp[ci, i] = math.log((int(cnt_mat[ci, i]) + 1.0) / denom)
    class_arr = np.asarray(classes, dtype=object)

    def score(batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc_idx, ids = _doc_token_ids(batch, text_col, lut)
        scores = np.tile(prior, (n, 1))
        if len(ids):
            order = np.lexsort((ids, doc_idx))
            d2, i2 = doc_idx[order], ids[order]
            run = np.r_[True, (d2[1:] != d2[:-1]) | (i2[1:] != i2[:-1])]
            starts = np.flatnonzero(run)
            cnts = np.diff(np.r_[starts, len(d2)]).astype(np.float64)
            rd, ri = d2[starts], i2[starts]
            dstarts = np.flatnonzero(np.r_[True, rd[1:] != rd[:-1]])
            present = rd[dstarts]
            for ci in range(len(classes)):
                terms = cnts * lnp[ci][ri]
                scores[present, ci] = scores[present, ci] \
                    + np.add.reduceat(terms, dstarts)
        pred = scores.argmax(axis=1)
        logp = _r(scores[np.arange(n), pred], 6)
        return pa.table({id_col: batch.column(id_col),
                         "pred": pa.array(class_arr[pred],
                                          type=pa.string()),
                         "logp": pa.array(logp, type=pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")
