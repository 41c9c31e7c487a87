"""Lexical (BM25) top-k search over a text column.

Complements the embedding-side similarity search
(``packs_ray/functions/similarity.py``) with the classic sparse
retrieval baseline a training-data pipeline needs for corpus triage
("find the documents most about X"): Okapi BM25 with the Lucene
non-negative idf, computed in three streaming passes —

1. corpus-stats scan: per-batch partials (doc count, token-length sum,
   per-query-term document frequency) as ONE tiny row per block; only
   these fixed-size partials reach the driver;
2. scoring scan: the (few) query terms + their idf ride the closure,
   per-batch vectorized tf counts and a sequential per-term float fold
   (word-for-word the SQL oracle's left-associative ``+`` chain, so
   scores are bit-identical);
3. per-batch local top-k partials, driver merge of blocks x k rows —
   the ``brute_force_topk`` shape: no shuffle, no materialization.

Tokenization matches ``textstats.top_terms``: whitespace-regex split of
the trimmed, null-filled text; an all-whitespace or null document has
length 0 and matches nothing.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import str_column
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

_WS_RE = "[ \t\n\r\f\v]+"
_WS_CHARS = " \t\n\r\f\v"


def _term_counts(batch: pa.Table, text_col: str, terms: list[str]):
    """(dl, tf) for one batch: dl = token count per row (0 for empty /
    null text), tf = (n_rows, n_terms) exact term-frequency matrix."""
    col = str_column(batch, text_col)
    trimmed = pc.utf8_trim(pc.fill_null(col, ""), _WS_CHARS)
    lists = pc.split_pattern_regex(trimmed, _WS_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    off = lists.offsets.to_numpy().astype(np.int64)
    raw_lens = off[1:] - off[:-1]              # [""] slots still length 1
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    dl = np.where(empty, 0, raw_lens).astype(np.int64)
    flat = lists.flatten()
    n = len(dl)
    row_idx = np.repeat(np.arange(n), raw_lens)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    for i, t in enumerate(terms):
        eq = pc.equal(flat, t).to_numpy(zero_copy_only=False)
        hits = row_idx[eq]
        if hits.size:
            tf[:, i] = np.bincount(hits, minlength=n)
    return dl, tf


def bm25_topk(ds, id_col: str, text_col: str, query: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Top-``k`` documents by Okapi BM25 against ``query``.

    Query terms are the distinct whitespace tokens of ``query``, sorted
    lexicographically (the fold order — pinned so the float sum is
    deterministic and oracle-reproducible).  idf is the Lucene
    non-negative form ``ln(1 + (N - df + 0.5) / (df + 0.5))`` computed
    with ``math.log`` (libm, the same code path as the SQL oracle's
    ``ln``).  Only documents matching at least one term score; ties on
    the 6dp-rounded score break by ascending id.  Returns
    (id_col, bm25) sorted (bm25 desc, id asc), at most ``k`` rows."""
    terms = sorted({t for t in query.split() if t})
    if not terms:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "bm25": pd.Series([], dtype="float64")})

    # pass 1: corpus stats — one fixed-size partial row per block
    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tf = _term_counts(batch, text_col, terms)
        cols = {"n": np.array([len(dl)], dtype=np.int64),
                "len_sum": np.array([dl.sum()], dtype=np.int64)}
        for i in range(len(terms)):
            cols[f"df_{i}"] = np.array([(tf[:, i] > 0).sum()],
                                       dtype=np.int64)
        return pa.table(cols)

    parts = ds.select_columns([id_col, text_col]).map_batches(
        stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum()) if len(parts) else 0
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "bm25": pd.Series([], dtype="float64")})
    len_sum = int(parts["len_sum"].sum())
    dfs = [int(parts[f"df_{i}"].sum()) for i in range(len(terms))]
    avgdl = len_sum / n_docs                     # float64, = SQL sum/count
    idf = [math.log(1.0 + ((n_docs - d) + 0.5) / (d + 0.5)) for d in dfs]

    # pass 2+3: score + local top-k partials (closure state is tiny —
    # a handful of floats — so no ray.put broadcast is needed)
    def score_partial(batch: pa.Table) -> pa.Table:
        dl, tf = _term_counts(batch, text_col, terms)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        norm = (1.0 - b) + b * (dl.astype(np.float64) / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        for i in range(len(terms)):              # sequential fold, term order
            tfi = tf[:, i].astype(np.float64)
            score = score + idf[i] * ((tfi * (k1 + 1)) / (tfi + k1 * norm))
        hit = tf.sum(axis=1) > 0
        score = _r(score, 6)
        order = np.lexsort((ids, -score))        # score desc, id asc
        order = order[hit[order]][:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "bm25": pa.array(score[order], type=pa.float64())})

    out = ds.select_columns([id_col, text_col]).map_batches(
        score_partial, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "bm25": pd.Series([], dtype="float64")})
    out = out.sort_values(["bm25", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


def build_postings(ds, id_col: str, text_col: str, *, min_df: int = 1,
                   max_docs_per_token: int = 1000,
                   num_partitions: int | None = None):
    """Inverted-index construction: per token — document frequency and
    the first ``max_docs_per_token`` doc ids in ascending order
    (comma-joined string, so the artifact is one flat scannable table;
    ``df`` always carries the TRUE count, the posting list is the
    capped head — cap + surfaced, like every other bounded export).

    Same whitespace tokenization contract as ``top_terms``/``bm25``.
    Shape: per-batch distinct (doc, token) marks (a doc is one row, so
    the marks are globally distinct already), ONE token-bucketed
    reduce.  The postings artifact is what a boolean/BM25 serving layer
    loads; building it is a batch job, and this is that job."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)
    from packs_ray.stages.util import str_column

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    ws_re = "[ \t\n\r\f\v]+"

    def marks(batch: pa.Table) -> pa.Table:
        col = str_column(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        off = lists.offsets.to_numpy().astype(np.int64)
        raw_lens = off[1:] - off[:-1]
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_pandas().to_numpy()
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[empty]] = False
        df = pd.DataFrame({id_col: np.repeat(ids, raw_lens)[keep],
                           "token": flat[keep]}).drop_duplicates()
        return _table_from_pandas(df, preserve_index=False)

    parts = ds.select_columns([id_col, text_col]).map_batches(
        marks, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="stable")
        grp = g.groupby("token", sort=False)[id_col]
        df_counts = grp.size().astype("int64")
        heads = (g.groupby("token", sort=False).head(max_docs_per_token)
                 .groupby("token", sort=False)[id_col]
                 .agg(lambda s: ",".join(s.astype(str))))
        out = pd.DataFrame({"token": df_counts.index,
                            "df": df_counts.values,
                            "postings": heads.reindex(
                                df_counts.index).values})
        out = out[out["df"] >= min_df]
        return out.reset_index(drop=True)

    return bucketed_group_reduce(parts, ["token"], reduce_fn,
                                 num_partitions)


def hybrid_rrf(doc_ds, emb_ds, *, id_col: str, text_col: str,
               emb_id_col: str, emb_col: str, query_text: str,
               query_vec, k: int = 10, k_each: int = 20,
               c: int = 60) -> pd.DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a lexical BM25
    top-``k_each`` (:func:`bm25_topk`) and a cosine embedding
    top-``k_each`` (`similarity.brute_force_topk` — swap in the IVF
    variant at corpus scale) over the SAME id space (the documents /
    embeddings tables are row-aligned corpora).

    RRF score = 1/(c + bm25_rank) + 1/(c + cos_rank), each term 0 when
    the id is absent from that list (Cormack et al. 2009, c = 60).
    Ranks are 1-based positions under each list's pinned
    (score desc, id asc) order.  Returns the fused top-``k``:
    (id, rrf 6dp, bm25_rank, cos_rank) — ranks as float64 with NaN for
    misses, the SQL-client convention for nullable BIGINT.

    Scale: both retrievers are bounded-driver-artifact operators
    (per-block local top-k partials, no shuffle); the fusion itself
    touches <= 2 * k_each rows."""
    from packs_ray.functions.similarity import brute_force_topk
    from packs_ray.stages.util import round_half_away as _r6

    lex = bm25_topk(doc_ds, id_col, text_col, query_text, k=k_each)
    sem = brute_force_topk(emb_ds, emb_id_col, emb_col, query_vec,
                           k=k_each)
    # null-id rows (degenerate corpora) cannot be fused — rank after
    # dropping them (real corpora have non-null ids, so this is a
    # no-op under the oracle)
    lex = lex[lex[id_col].notna()].reset_index(drop=True)
    sem = sem[sem[emb_id_col].notna()].reset_index(drop=True)
    lex = lex.reset_index(drop=True)
    lex["bm25_rank"] = np.arange(1, len(lex) + 1, dtype=np.int64)
    sem = sem.reset_index(drop=True)
    sem["cos_rank"] = np.arange(1, len(sem) + 1, dtype=np.int64)
    sem = sem.rename(columns={emb_id_col: id_col})
    m = lex[[id_col, "bm25_rank"]].merge(
        sem[[id_col, "cos_rank"]], on=id_col, how="outer")
    rb = m["bm25_rank"].to_numpy(dtype=np.float64)
    rc = m["cos_rank"].to_numpy(dtype=np.float64)
    tb = np.where(np.isnan(rb), 0.0, 1.0 / (c + rb))
    tc = np.where(np.isnan(rc), 0.0, 1.0 / (c + rc))
    m["rrf"] = _r6(tb + tc, 6)
    m = m.sort_values(["rrf", id_col], ascending=[False, True],
                      kind="stable").head(k).reset_index(drop=True)
    return m[[id_col, "rrf", "bm25_rank", "cos_rank"]].astype(
        {id_col: "int64", "rrf": "float64",
         "bm25_rank": "float64", "cos_rank": "float64"})


def rbo(rank_a, rank_b, *, p: float = 0.9) -> pd.DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated form) between
    two ranked id lists — the ranking-comparison eval
    :func:`similarity.ranking_metrics` (set recall@k + MRR) can't
    give: RBO weights agreement at the TOP of the lists (persistence
    p), so swapping ranks 1 and 2 costs more than swapping 9 and 10 —
    the right metric for "did the hybrid fusion actually change what
    users see first vs plain BM25".

    rbo = Σ_{d=1..k} (1-p)·p^(d-1) · |A_:d ∩ B_:d| / d with
    k = min(|A|, |B|) (truncated, no extrapolation — reported as-is).
    Overlap counts are exact ints; the fold runs ascending d (==
    the oracle's list_sum), pow is libm.

    Inputs are bounded driver artifacts (top-k outputs).  Output: one
    row (k, overlap_at_k, rbo 6dp)."""
    import math

    import numpy as np

    from packs_ray.stages.util import round_half_away as _rh

    a = list(rank_a)
    b = list(rank_b)
    k = min(len(a), len(b))
    if k == 0:
        return pd.DataFrame([{"k": np.int64(0),
                              "overlap_at_k": np.int64(0),
                              "rbo": None}])
    sa: set = set()
    sb: set = set()
    val = 0.0
    ov = 0
    for d in range(1, k + 1):                  # left fold == list_sum
        sa.add(a[d - 1])
        sb.add(b[d - 1])
        ov = len(sa & sb)
        w = (1.0 - p) * math.pow(p, d - 1)
        val += w * (ov / (d * 1.0))
    return pd.DataFrame([{"k": np.int64(k),
                          "overlap_at_k": np.int64(ov),
                          "rbo": float(_rh(val, 6))}])
