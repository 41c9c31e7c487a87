"""Text-validation / text-analysis checks as streaming aggregates and
per-row vectorized transforms.

Reference: text_validation_pack/main.py:36-114 (length/word/whitespace/
placeholder stats); the per-row operators (token counts, quality score,
language-ID counts, fingerprints) are the training-data additions the
engine provides as first-class batch transforms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg
from packs_ray.models import LangIdModel
from packs_ray.rules.patterns import NULL_PLACEHOLDERS_LOWER
from packs_ray.stages.util import round_half_away as _r, str_column
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

_PLACEHOLDERS = pa.array(sorted(NULL_PLACEHOLDERS_LOWER), type=pa.string())

# small English stopword list for the quality score (public, generic)
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "that", "this", "for", "on", "with", "as", "at", "by")


def text_validation_stats(ds, column: str, min_length: int | None = None,
                          max_length: int | None = None) -> pd.DataFrame:
    """One-row summary with the reference's metric keys
    (text_validation_pack/main.py:101-114; lengths on non-null values)."""

    def partial(batch: pa.Table) -> dict:
        text = str_column(batch, column).drop_null()
        n = len(text)
        if n == 0:
            return {"n": 0, "len_min": None, "len_max": None, "len_sum": 0,
                    "below": 0, "above": 0, "empty": 0, "ws": 0, "ph": 0,
                    "padded": 0, "wc_min": None, "wc_max": None}
        lengths = pc.utf8_length(text)
        trimmed = pc.utf8_trim_whitespace(text)
        empty = pc.sum(pc.cast(pc.equal(text, ""), "int64")).as_py() or 0
        ws_all = pc.sum(pc.cast(pc.equal(trimmed, ""), "int64")).as_py() or 0
        wc = pc.count_substring_regex(text, r"\S+")
        return {
            "n": n,
            "len_min": pc.min(lengths).as_py(),
            "len_max": pc.max(lengths).as_py(),
            "len_sum": pc.sum(lengths).as_py() or 0,
            "below": (pc.sum(pc.cast(pc.less(lengths, min_length), "int64")).as_py() or 0)
                     if min_length is not None else 0,
            "above": (pc.sum(pc.cast(pc.greater(lengths, max_length), "int64")).as_py() or 0)
                     if max_length is not None else 0,
            "empty": empty,
            "ws": ws_all - empty,
            "ph": pc.sum(pc.cast(pc.is_in(pc.utf8_lower(text), value_set=_PLACEHOLDERS),
                                 "int64")).as_py() or 0,
            "padded": pc.sum(pc.cast(pc.not_equal(text, trimmed), "int64")).as_py() or 0,
            "wc_min": pc.min(wc).as_py(),
            "wc_max": pc.max(wc).as_py(),
        }

    def combine(p: pd.DataFrame) -> dict:
        n = int(p["n"].sum())
        below = int(p["below"].sum())
        above = int(p["above"].sum())
        in_range = n - below - above
        return {
            "non_null_count": n,
            "text_min_length": int(p["len_min"].min()) if n else 0,
            "text_max_length": int(p["len_max"].max()) if n else 0,
            "text_mean_length": (float(p["len_sum"].sum()) / n) if n else 0.0,
            "text_length_below_min_length": below,
            "text_length_above_max_length": above,
            "text_length_in_range_percent": float(_r(in_range / n, 4)) if n else 1.0,
            "empty_text_found": int(p["empty"].sum()),
            "whitespace_text_found": int(p["ws"].sum()),
            "null_placeholder_text_found": int(p["ph"].sum()),
            "text_surrounded_by_whitespace_found": int(p["padded"].sum()),
            "min_word_count": int(p["wc_min"].min()) if n else 0,
            "max_word_count": int(p["wc_max"].max()) if n else 0,
        }

    return pd.DataFrame([global_agg(ds, partial, combine)])


def token_counts(ds, id_col: str, column: str):
    """Per-row token/char counts (whitespace tokenization + a BPE-ish
    word-piece regex count) — lazy Dataset of (id, n_chars, n_tokens,
    n_wordpieces)."""
    wp_re = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, column)
        return pa.table({
            id_col: batch.column(id_col),
            "n_chars": pc.utf8_length(text).fill_null(0).cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(text, r"\S+").fill_null(0).cast(pa.int64()),
            "n_wordpieces": pc.count_substring_regex(text, wp_re).fill_null(0).cast(pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score_array(text: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """The heuristic quality formula as a batch kernel: mean of (length
    score, stopword-ratio score, symbol cleanliness) in [0,1], 4dp —
    shared by ``quality_scores``, ``preference_pairs`` and the curation
    pipeline so all three stay SQL-replicable with ONE expression."""
    stop_re = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"
    n_chars = pc.utf8_length(text).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_tok = pc.count_substring_regex(text, r"\S+").fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_stop = pc.count_substring_regex(text, stop_re).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_sym = pc.count_substring_regex(text, r"[^A-Za-z0-9\s]").fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    len_score = np.minimum(n_chars / 200.0, 1.0)
    stop_score = np.minimum((n_stop / np.maximum(n_tok, 1.0)) / 0.4, 1.0)
    sym_score = 1.0 - np.minimum(n_sym / np.maximum(n_chars, 1.0) / 0.5, 1.0)
    return _r((len_score + stop_score + sym_score) / 3.0, 4)


def quality_scores(ds, id_col: str, column: str):
    """Per-row heuristic quality score in [0,1]:
    mean of (length score, stopword-ratio score, symbol cleanliness).
    Deterministic double arithmetic, 4dp — SQL-replicable."""

    def fn(batch: pa.Table) -> pa.Table:
        score = quality_score_array(str_column(batch, column))
        return pa.table({id_col: batch.column(id_col),
                         "quality_score": pa.array(score, type=pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def langid_counts(ds, column: str) -> pd.DataFrame:
    """Predicted-language histogram over a text column (langid heuristic
    as a dataset-level operator)."""
    model_holder: dict = {}

    def partial(batch: pa.Table) -> dict:
        model = model_holder.setdefault("m", LangIdModel())
        pred, _ = model.predict_batch(str_column(batch, column))
        vals, counts = np.unique(pred.astype(str), return_counts=True)
        return {f"lang_{v}": int(c) for v, c in zip(vals, counts)}

    def combine(p: pd.DataFrame) -> dict:
        return {c[5:]: int(p[c].fillna(0).sum()) for c in p.columns}

    agg = global_agg(ds, partial, combine,
                     empty_schema=pa.schema([(column, pa.string())]))
    return (pd.DataFrame([{"predicted_lang": k, "n": v} for k, v in agg.items()],
                         columns=["predicted_lang", "n"])
            .sort_values("predicted_lang").reset_index(drop=True)
            .astype({"n": "int64"}))


def normalize_text(ds, id_col: str, column: str):
    """Training-data text normalization as a zero-copy Arrow map:
    lowercase, collapse all whitespace runs to single spaces, trim.
    (RE2 semantics identical to SQL regexp_replace(…, 'g').)"""

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, column)
        norm = pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " ")
        # explicit ' ' trim (collapse leaves only plain spaces at edges);
        # utf8_trim_whitespace would also eat unicode spaces SQL trim keeps
        norm = pc.utf8_trim(norm, " ")
        return pa.table({id_col: batch.column(id_col), "text_norm": norm})

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprints(ds, id_col: str, column: str):
    """Per-row 64-bit document fingerprint: polynomial rolling hash of the
    normalized (lowercased, whitespace-collapsed) text — deterministic
    across workers/runs."""

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, column)
        norm = pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " ")
        # plain-space trim, same normalization as normalize_text (collapse
        # leaves only plain spaces at edges; SQL trim(x, ' ') equivalent)
        norm = pc.utf8_trim(norm, " ")
        arr = pc.fill_null(norm, "").cast(pa.binary())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        raw_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)
        offsets = raw_off[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        buf = arr.buffers()[2]
        data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
                else np.zeros(0, dtype=np.uint8))
        lens = offsets[1:] - offsets[:-1]
        n = len(arr)
        P = np.uint64(1099511628211)
        out = np.full(n, np.uint64(14695981039346656037))  # FNV-1a offset
        # rows advance in lockstep over byte positions: the chain
        # h = (h ^ byte) * P is sequential per row, but each position step
        # is one vectorized gather+xor+mul across all still-active rows
        starts = offsets[:-1]
        order = np.argsort(-lens, kind="stable")   # longest first → active
        so, sl = starts[order], lens[order]        # prefix stays contiguous
        h = out[order].copy()
        for j in range(int(lens.max()) if n else 0):
            na = int(np.searchsorted(-sl, -j, side="left"))  # rows with len>j
            if na == 0:
                break
            b = data[so[:na] + j].astype(np.uint64)
            h[:na] = (h[:na] ^ b) * P
        out[order] = h
        out[np.asarray(pc.is_null(norm).to_numpy(zero_copy_only=False))] = 0
        return pa.table({id_col: batch.column(id_col),
                         "fingerprint": pa.array(out.view(np.int64), type=pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(ds, id_col: str, column: str, *,
                    max_tokens: int = 64, overlap: int = 16):
    """Split documents into token-bounded sliding-window chunks — the
    context-length prep step of a training-data pipeline (not in the
    reference; standard public technique).

    Tokens are ASCII-whitespace-delimited (RE2 ``[ \\t\\n\\r\\f\\v]+`` on
    both the Arrow kernel and the DuckDB oracle, so semantics match
    exactly); chunk ``i`` covers tokens ``[i*step, i*step+max_tokens)``
    with ``step = max_tokens - overlap``, and the chunk count is the
    integer ``1 + ceil((n - max_tokens)/step)`` for ``n > max_tokens``
    (the tail chunk is shorter, never empty).  Null and zero-token
    documents emit no rows.  One output row per (doc, chunk):
    ``(id, chunk_idx, n_tokens, chunk_text)`` — embarrassingly parallel
    per batch, no shuffle."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    step = max_tokens - overlap
    ws = "[ \t\n\r\f\v]+"

    def fn(batch: pa.Table) -> pa.Table:
        col = str_column(batch, column)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        trimmed = pc.utf8_trim(col, " \t\n\r\f\v")
        lists = pc.split_pattern_regex(pc.fill_null(trimmed, ""), ws)
        out_id, out_ci, out_nt, out_tx = [], [], [], []
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        for i in range(len(col)):
            if not valid[i]:
                continue
            toks = lists[i].as_py()
            if toks == [""]:          # empty/whitespace-only document
                continue
            n = len(toks)
            nc = 1 if n <= max_tokens else 1 + (n - max_tokens + step - 1) // step
            for ci in range(nc):
                sl = toks[ci * step: ci * step + max_tokens]
                out_id.append(ids[i])
                out_ci.append(ci)
                out_nt.append(len(sl))
                out_tx.append(" ".join(sl))
        return pa.table({
            id_col: pa.array(out_id, type=pa.int64()),
            "chunk_idx": pa.array(out_ci, type=pa.int64()),
            "n_tokens": pa.array(out_nt, type=pa.int64()),
            "chunk_text": pa.array(out_tx, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def top_terms(ds, id_col: str, column: str, k: int = 5,
              num_partitions: int | None = None):
    """Per-document top-``k`` terms with corpus document frequency —
    the exact-integer core of TF-IDF (rank by tf desc, corpus df asc,
    token asc; ranking on integers/strings only, so results are
    bit-deterministic — a float idf would make top-k ties
    engine-dependent; idf = ln(N/df) is derivable from the outputs).

    Shape: per-batch (doc, token, tf) partials (a doc is one row, so tf
    is exact with no shuffle), ONE shuffle bucketed by token to attach
    df (all rows of a token land together), ONE shuffle bucketed by doc
    for the per-doc top-k.  Returns (id_col, rank, token, tf, df)."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    ws_re = "[ \t\n\r\f\v]+"

    def tf_rows(batch: pa.Table) -> pa.Table:
        col = str_column(batch, column)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        off = lists.offsets.to_numpy().astype(np.int64)
        raw_lens = off[1:] - off[:-1]          # [""] slots still length 1
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_pandas().to_numpy()
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[empty]] = False   # drop the [""] token
        df = pd.DataFrame({id_col: np.repeat(ids, raw_lens)[keep],
                           "token": flat[keep]})
        out = (df.groupby([id_col, "token"], sort=False).size()
               .reset_index(name="tf"))
        return _table_from_pandas(out, preserve_index=False)

    tf = ds.select_columns([id_col, column]).map_batches(
        tf_rows, batch_format="pyarrow")

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("token")["token"].transform("size")
        return g

    with_df = bucketed_group_reduce(tf, ["token"], attach_df,
                                    num_partitions)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tf", "df", "token"],
                          ascending=[False, True, True], kind="stable")
        g = g.groupby(id_col, sort=False).head(k)
        g["rank"] = g.groupby(id_col, sort=False).cumcount() + 1
        return g[[id_col, "rank", "token", "tf", "df"]]

    return bucketed_group_reduce(with_df, [id_col], topk, num_partitions)


def corpus_report(ds, group_col: str, text_col: str):
    """Dataset-card rollup: per group (language/source) — document
    count, null-text count, exact char and whitespace-token totals.
    One combiner pass (per-batch per-group integer partials), one tiny
    bucketed sum; nothing but aggregate rows ever moves."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    def partial(batch: pa.Table) -> pa.Table:
        text = str_column(batch, text_col)
        df = pd.DataFrame({
            group_col: batch.column(group_col).to_numpy(
                zero_copy_only=False),
            "n_docs": 1,
            "n_null_text": pc.is_null(batch.column(text_col)).to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_chars": pc.utf8_length(text).fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_tokens": pc.count_substring_regex(text, r"\S+").fill_null(0)
                .to_numpy(zero_copy_only=False).astype(np.int64)})
        out = (df.groupby(group_col, dropna=False, sort=False)
               .sum().reset_index())
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["n_docs", "n_null_text", "n_chars", "n_tokens"]
        out = (g.groupby(group_col, dropna=False, sort=False)[cols]
               .sum().reset_index())
        return out.astype({c: "int64" for c in cols})

    return bucketed_group_reduce(
        ds.select_columns([group_col, text_col]).map_batches(
            partial, batch_format="pyarrow"),
        [group_col], reduce_fn, reduce_partition_count(ds))


def build_vocab(ds, column: str, *, min_count: int = 1, k: int = 50_000,
                num_partitions: int | None = None) -> pd.DataFrame:
    """Tokenizer-vocabulary construction: the top-``k`` corpus tokens
    with ``count >= min_count``, ids assigned by rank
    ``(count desc, token asc)`` — integer/string ordering only, so the
    vocabulary is bit-deterministic on any cluster.

    Same whitespace tokenization contract as ``top_terms`` (trim, split
    on ASCII-whitespace runs, empty docs contribute nothing).  Shape:
    per-batch token-count combiner, ONE token-bucketed sum reduce that
    also applies ``min_count`` and caps each bucket at its own top-k
    (any global top-k token is top-k within its bucket, so the cap is
    lossless), then a bounded ``buckets x k`` driver merge for the
    final ranking.  A vocabulary is a bounded artifact (k rows), so the
    driver merge is the honest landing spot."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    ws_re = "[ \t\n\r\f\v]+"

    def counts(batch: pa.Table) -> pa.Table:
        col = str_column(batch, column)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        off = lists.offsets.to_numpy().astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_pandas().to_numpy()
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[empty]] = False   # drop the [""] token
        vc = pd.Series(flat[keep]).value_counts(sort=False)
        return pa.table({"token": pa.array(vc.index, type=pa.string()),
                         "cnt": pa.array(vc.to_numpy(),
                                         type=pa.int64())})

    parts = ds.select_columns([column]).map_batches(
        counts, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", sort=False)["cnt"].sum().reset_index()
        out = out[out["cnt"] >= min_count]
        out = out.sort_values(["cnt", "token"], ascending=[False, True],
                              kind="stable").head(k)
        return out.astype({"cnt": "int64"})

    tops = bucketed_group_reduce(parts, ["token"], reduce_fn,
                                 num_partitions).to_pandas()
    if "cnt" not in tops.columns:     # 0-row input: no block ever ran
        tops = pd.DataFrame({"token": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype="int64")})
    tops = tops.sort_values(["cnt", "token"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)
    tops.insert(0, "token_id",
                np.arange(1, len(tops) + 1, dtype=np.int64))
    return tops[["token_id", "token", "cnt"]]


def char_entropy(ds, id_col: str, text_col: str):
    """Per-document Shannon entropy over Unicode codepoints — the
    classic gibberish/compression-quality signal next to the length/
    punctuation heuristics of ``quality_scores`` (low entropy = runs and
    boilerplate, high = random bytes; both tails get dropped by web
    filters).

    Stateless per-batch, no shuffle (a document is one row).  Counting
    is fully vectorized: one ``str.join`` + utf-32 reinterpret per
    batch, one pandas groupby over (doc, codepoint).  The final
    ``-Σ p·log2 p`` is a strict left-associative fold over
    codepoint-ascending terms with a 0.0 seed — bit-identical to the
    DuckDB twin's ``list_reduce([0.0] || list(t ORDER BY cp), +)`` —
    and its cost is alphabet-bounded (≤ distinct codepoints per doc),
    not text-length-bounded.  Null/empty texts emit no row (SQL WHERE
    semantics).  Returns (id, n_chars, n_distinct, entropy@6dp)."""
    import math

    def fn(batch: pa.Table) -> pa.Table:
        col = str_column(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = col.to_pylist()
        lens = np.array([len(t) if t else 0 for t in texts],
                        dtype=np.int64)
        keep = lens > 0
        if not keep.any():
            return pa.table({id_col: pa.array([], batch.schema.field(
                                id_col).type),
                             "n_chars": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64()),
                             "entropy": pa.array([], pa.float64())})
        big = "".join(t for t in texts if t)
        codes = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        cnt = (pd.DataFrame({"d": doc_idx, "c": codes})
               .groupby(["d", "c"], sort=True).size())
        d_of_term = cnt.index.get_level_values(0).to_numpy()
        c_arr = cnt.to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, d_of_term[1:] != d_of_term[:-1]])
        ends = np.r_[starts[1:], len(c_arr)]
        out_id, out_n, out_k, out_e = [], [], [], []
        for s, e in zip(starts, ends):
            seg = c_arr[s:e]
            n = int(seg.sum())
            acc = 0.0
            for c in seg:                    # alphabet-bounded fold
                p = c / n
                acc = acc + (-p * math.log2(p))
            out_id.append(ids[d_of_term[s]])
            out_n.append(n)
            out_k.append(len(seg))
            out_e.append(round(acc, 6))
        return pa.table({id_col: pa.array(out_id, batch.schema.field(
                            id_col).type),
                         "n_chars": pa.array(out_n, pa.int64()),
                         "n_distinct": pa.array(out_k, pa.int64()),
                         "entropy": pa.array(out_e, pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def split_text(ds, id_col: str, text_col: str, pattern: str, *,
               piece_col: str = "piece", keep_empty: bool = False):
    """Split every document on an RE2 ``pattern`` and explode the pieces
    with their 0-based position — the paragraph/line/sentence-unit
    prep step before line-level dedup or per-paragraph quality scoring
    (C4 operates on lines; this is the operator that produces them).

    Stateless per-batch (``split_pattern_regex`` + ``list_flatten`` —
    the explode kernel specialized to strings), no shuffle.  Null texts
    emit no rows; empty pieces (leading/trailing/adjacent delimiters)
    are dropped unless ``keep_empty`` — dropping matches the common
    blank-line-stripping default.  Returns (id, pos, piece); ``pos``
    numbers the KEPT pieces consecutively."""
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        col = str_column(batch, text_col)
        ids = batch.column(id_col)
        lists = pc.split_pattern_regex(pc.coalesce(col, ""), pattern)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        flat = lists.flatten()
        parent = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = ~nulls[parent]
        if not keep_empty:
            keep &= pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        # renumber kept pieces consecutively per doc
        n = len(parent)
        pos = np.zeros(n, dtype=np.int64)
        if n:
            new_doc = np.r_[True, parent[1:] != parent[:-1]]
            starts = np.flatnonzero(new_doc)
            counts = np.diff(np.append(starts, n))
            pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        return pa.table({id_col: pc.take(ids, pa.array(parent)),
                         "pos": pa.array(pos, type=pa.int64()),
                         piece_col: flat})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def nfc_normalize(ds, id_col: str, column: str, *,
                  out_col: str = "text_nfc"):
    """Unicode NFC normalization (canonical composition): combining
    sequences ('e' + U+0301) fold to their precomposed forms, so
    visually identical strings hash/dedup/join identically -- the
    canonicalization step before any exact dedup or join over
    multilingual web text.  CPython's ``unicodedata.normalize`` and
    DuckDB's ``nfc_normalize`` implement the same Unicode canonical
    composition, so the SQL twin is hash-exact.  (This container's
    pyarrow ``utf8_normalize`` ignores its ``form`` option and always
    decomposes — verified empirically — so the kernel is the stdlib
    C routine per value; same per-value-C-call shape as
    ``json_extract``.)  Stateless map, no shuffle."""
    import unicodedata

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, column)
        vals = text.to_numpy(zero_copy_only=False)
        norm = pa.array([None if s is None
                         else unicodedata.normalize("NFC", s)
                         for s in vals], type=pa.string())
        return pa.table({id_col: batch.column(id_col),
                         out_col: norm,
                         "changed": pc.not_equal(norm, text)})

    return ds.map_batches(fn, batch_format="pyarrow")


def compression_ratio(ds, id_col: str, column: str, *, level: int = 6):
    """zlib compression ratio per document -- the cheap spam /
    repetition / low-entropy proxy (highly repetitive or templated
    text compresses far below natural prose; cf. the compression
    filters in large web-corpus curation pipelines).  Emits
    (id, n_bytes, n_compressed, ratio = compressed/raw as the pinned
    one-division double).  Deterministic for a fixed zlib version and
    level (both sides of any replica run this container's zlib), but
    not SQL-expressible -- correctness is gated by pytest properties
    and the driver's rows-only check.  Per-row C-speed zlib calls
    inside one stateless map_batches pass (same per-value-C-call shape
    as the JSON parse in ``json_extract``)."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(column)))
        texts = batch.column(column).to_numpy(zero_copy_only=False)
        raw = [t.encode("utf-8") for t in texts]
        n_b = np.array([len(b) for b in raw], dtype=np.int64)
        n_c = np.array([len(zlib.compress(b, level)) for b in raw],
                       dtype=np.int64)
        ratio = np.where(n_b > 0, n_c / np.maximum(n_b, 1), 1.0)
        return pa.table({id_col: batch.column(id_col),
                         "n_bytes": pa.array(n_b),
                         "n_compressed": pa.array(n_c),
                         "ratio": pa.array(ratio.astype(np.float64))})

    return ds.map_batches(fn, batch_format="pyarrow")


def encode_tokens(ds, id_col: str, column: str, vocab: pd.DataFrame, *,
                  unk_id: int = -1):
    """Apply a ``build_vocab`` vocabulary: whitespace-tokenize each doc
    (same trim/split contract as ``build_vocab``/``top_terms``) and map
    every token to its vocabulary id (``unk_id`` for OOV) — the
    text -> token-ids step that turns a curated corpus into trainer
    input.  Emits (id, ids_csv, n_tokens, n_oov); ids ride as a
    comma-joined string so the artifact round-trips any columnar sink
    and hash-compares exactly.

    The vocabulary is a bounded driver artifact (<= k rows); it rides
    into tasks as a plain dict in the function closure — serialized
    once per task by Ray (``ray.put`` explicitly if you pass a vocab
    far above the usual tens of MB).  One stateless vectorized pass:
    flat token array -> one pandas map -> per-doc joins via a grouped
    aggregate over the repeat-index, no shuffle."""
    lut = dict(zip(vocab["token"], vocab["token_id"].astype(int)))
    ws_re = "[ \t\n\r\f\v]+"

    def fn(batch: pa.Table) -> pa.Table:
        col = str_column(batch, column)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
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
        n_tokens = np.bincount(doc_idx, minlength=len(batch))
        n_oov = np.bincount(doc_idx[ids == unk_id], minlength=len(batch))
        joined = (pd.Series(ids.astype(str))
                  .groupby(doc_idx).agg(",".join)
                  .reindex(range(len(batch)), fill_value=""))
        return pa.table({
            id_col: batch.column(id_col),
            "ids_csv": pa.array(joined.to_numpy(), type=pa.string()),
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "n_oov": pa.array(n_oov.astype(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow")


def regex_extract(ds, id_col: str, column: str, pattern: str,
                  group_names: list[str]):
    """Named-group regex extraction to columns — the workhorse ETL
    primitive for semi-structured text (log lines, user agents,
    citation keys): ``pattern`` must use RE2 named groups
    ``(?P<name>...)``; each name becomes a string column (null when the
    row doesn't match), plus a ``matched`` flag.  First match wins
    (SQL ``regexp_extract`` semantics).  Both engines run RE2, so the
    DuckDB twin is hash-exact.  One stateless zero-copy Arrow kernel
    (``pc.extract_regex``), no shuffle; null text rows emit nulls."""

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, column)
        st = pc.extract_regex(text, pattern)
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        cols = {id_col: batch.column(id_col)}
        matched = pc.and_kleene(pc.is_valid(st), pc.is_valid(text))
        for g in group_names:
            cols[g] = pc.struct_field(st, g)
        cols["matched"] = pc.fill_null(matched, False)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def zipf_fit(ds, column: str, *, k: int = 200, min_count: int = 1,
             num_partitions: int | None = None) -> pd.DataFrame:
    """Zipf-law fit of the corpus token-frequency curve: least-squares
    slope/intercept of ``ln(count)`` against ``ln(rank)`` over the top
    ``k`` vocabulary tokens — the corpus-health screen (natural text
    slopes ≈ −1; templated/boilerplate corpora flatten, spam steepens;
    Zipf 1949, public result).

    Reuses ``build_vocab``'s distributed token counting (the only part
    that touches data); the fit itself runs over the bounded k-row
    vocabulary on the driver with STRICT rank-ascending left-associative
    float sums, bit-shared with the SQL ``list_reduce`` replica.
    Output: one row (n_tokens, slope, intercept)."""
    from packs_ray.stages.util import round_half_away as _r

    vocab = build_vocab(ds, column, min_count=min_count, k=k,
                        num_partitions=num_partitions)
    n = len(vocab)
    if n < 2:
        return pd.DataFrame([{"n_tokens": np.int64(n),
                              "slope": np.nan, "intercept": np.nan}])
    vocab = vocab.sort_values("token_id")
    import math

    sx = sy = sxy = sxx = 0.0
    for rank, cnt in zip(vocab["token_id"], vocab["cnt"]):
        x, y = math.log(float(rank)), math.log(float(cnt))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    nf = float(n)
    den = nf * sxx - sx * sx
    if den == 0.0:
        return pd.DataFrame([{"n_tokens": np.int64(n),
                              "slope": np.nan, "intercept": np.nan}])
    slope = (nf * sxy - sx * sy) / den
    return pd.DataFrame([{
        "n_tokens": np.int64(n),
        "slope": float(_r(slope, 6)),
        "intercept": float(_r((sy - slope * sx) / nf, 6))}])


def truncate_tokens(ds, id_col: str, column: str, max_tokens: int,
                    *, out_col: str = "text_truncated"):
    """Token-budget trim: cut each text to its first ``max_tokens``
    whitespace tokens (the context-window prep step before packing /
    SFT assembly; sequence semantics follow ``split_text``'s single
    ' ' join).  Stateless per-batch, no shuffle; null texts stay null,
    short texts pass through byte-identical.

    Output: (id_col, out_col, n_tokens, truncated)."""
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, column)
        nulls = pc.is_null(text).to_numpy(zero_copy_only=False)
        split = pc.split_pattern(
            pc.coalesce(text, pa.scalar("", type=pa.string())), " ")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lens = np.where(nulls, 0, lens)
        trunc = (~nulls) & (lens > max_tokens)
        head = pc.list_slice(split, 0, max_tokens)
        joined = pc.binary_join(pc.cast(head, pa.list_(pa.string())),
                                " ")
        out = pc.if_else(pa.array(trunc), joined, text)
        return pa.table({
            id_col: batch.column(id_col),
            out_col: out,
            "n_tokens": pa.array(np.minimum(lens, max_tokens)),
            "truncated": pa.array(trunc)})

    return ds.select_columns([id_col, column]) \
        .map_batches(fn, batch_format="pyarrow")


def _token_count_parts(ds, column: str, src_side: bool):
    """Per-batch (token, n_src, n_tgt) unigram-count combiner — the
    shared tokenization contract of ``build_vocab``/``top_terms`` (trim,
    split on ASCII-whitespace runs, empty/null docs contribute
    nothing), with the count landing in the side column selected by
    ``src_side``."""
    ws_re = "[ \t\n\r\f\v]+"

    def counts(batch: pa.Table) -> pa.Table:
        col = str_column(batch, column)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        off = lists.offsets.to_numpy().astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_pandas().to_numpy()
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[empty]] = False   # drop the [""] token
        vc = pd.Series(flat[keep]).value_counts(sort=False)
        n = vc.to_numpy().astype(np.int64)
        zero = np.zeros(len(vc), dtype=np.int64)
        return pa.table({"token": pa.array(vc.index, type=pa.string()),
                         "n_src": pa.array(n if src_side else zero),
                         "n_tgt": pa.array(zero if src_side else n)})

    return ds.select_columns([column]).map_batches(
        counts, batch_format="pyarrow")


def unigram_divergence(src, tgt, column: str, *, k: int = 100,
                       num_partitions: int | None = None) -> pd.DataFrame:
    """Top-``k`` unigram log-ratio profile between two corpora — the
    data-mixing / domain-shift diagnostic: for the ``k`` highest
    combined-count tokens, the add-one-smoothed log probability ratio
    ``ln(p_src(t) / p_tgt(t))`` with
    ``p_side(t) = (n_side(t)+1) / (N_side + V)`` over the joint vocab
    of size ``V`` (Laplace smoothing; the per-token summands of the
    smoothed KL divergence — public textbook construction).

    Exactness: every count is an exact integer; the log-ratio is ONE
    pinned float64 expression of exact ints per row
    (``ln(((n_s+1)(N_t+V)) / ((N_s+V)(n_t+1)))``, 6dp) shared with the
    SQL replica — no cross-row float accumulation anywhere, so the
    output is bit-deterministic under any partitioning.

    Scale shape: per-batch unigram combiners on each side, ONE
    token-bucketed sum reduce that caps each bucket at its own top-k by
    combined count (lossless: any global top-k token is top-k within
    its bucket) and emits one exact per-bucket summary row (bucket
    token totals + distinct-vocab count; buckets partition tokens, so
    the summaries sum to exact global N_src/N_tgt/V).  Only the bounded
    ``buckets x (k+1)`` artifact lands on the driver.

    Output: (rank, token, n_src, n_tgt, log_ratio) ordered by combined
    count desc, token asc."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(src)

    parts = _token_count_parts(src, column, True).union(
        _token_count_parts(tgt, column, False))

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)[["n_src", "n_tgt"]].sum()
        s = s.reset_index().astype({"n_src": "int64", "n_tgt": "int64"})
        summary = pd.DataFrame([{
            "token": None, "n_src": s["n_src"].sum(),
            "n_tgt": s["n_tgt"].sum(), "v": np.int64(len(s))}])
        s["v"] = np.int64(0)
        s["_c"] = s["n_src"] + s["n_tgt"]
        s = s.sort_values(["_c", "token"], ascending=[False, True],
                          kind="stable").head(k).drop(columns="_c")
        return pd.concat([s, summary], ignore_index=True) \
            .astype({"n_src": "int64", "n_tgt": "int64", "v": "int64"})

    rows = bucketed_group_reduce(parts, ["token"], reduce_fn,
                                 num_partitions).to_pandas()
    empty = pd.DataFrame({
        "rank": pd.Series([], dtype="int64"),
        "token": pd.Series([], dtype=object),
        "n_src": pd.Series([], dtype="int64"),
        "n_tgt": pd.Series([], dtype="int64"),
        "log_ratio": pd.Series([], dtype="float64")})
    if rows.empty or "token" not in rows.columns:
        return empty
    summ = rows[rows["token"].isna()]
    n_s, n_t = int(summ["n_src"].sum()), int(summ["n_tgt"].sum())
    v = int(summ["v"].sum())
    toks = rows[rows["token"].notna()].copy()
    if toks.empty:
        return empty
    toks["_c"] = toks["n_src"] + toks["n_tgt"]
    toks = toks.sort_values(["_c", "token"], ascending=[False, True],
                            kind="stable").head(k)
    ns = toks["n_src"].to_numpy(dtype=np.float64)
    nt = toks["n_tgt"].to_numpy(dtype=np.float64)
    toks["log_ratio"] = _r(np.log(((ns + 1.0) * float(n_t + v))
                                  / (float(n_s + v) * (nt + 1.0))), 6)
    toks["rank"] = np.arange(1, len(toks) + 1, dtype=np.int64)
    return toks[["rank", "token", "n_src", "n_tgt",
                 "log_ratio"]].reset_index(drop=True)


def bigram_collocations(src, column: str, *, k: int = 100,
                        min_count: int = 1,
                        num_partitions: int | None = None) -> pd.DataFrame:
    """Top-``k`` adjacent-bigram collocations with PMI (Church & Hanks
    1990, public measure): the corpus-analysis screen for templated /
    boilerplate phrases and multiword expressions.  Bigrams are
    adjacent token pairs WITHIN a document (the shared trim/split
    whitespace contract; no cross-document pairs).

    ``pmi = ln(n_pair · N_tok² / (N_pairs · n_w1 · n_w2))`` — every
    count an exact integer, pmi ONE pinned float64 expression per row
    (6dp), so the output is bit-deterministic under any partitioning.

    Scale shape: pass 1 — per-batch adjacent-pair combiners, one
    pair-bucketed sum reduce capped at each bucket's own top-k by
    ``(n_pair desc, w1, w2)`` (lossless for the global top-k) plus one
    exact per-bucket summary row (pair total); pass 2 — the <= 2k
    tokens of the winning pairs broadcast as a filter, one bounded
    unigram count reduce for their marginals + exact global token
    count.  Only bounded artifacts land on the driver.

    Output: (rank, w1, w2, n_pair, n_w1, n_w2, pmi)."""
    import ray

    from packs_ray.functions.agg import (bucketed_group_reduce, global_agg,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(src)
    ws_re = "[ \t\n\r\f\v]+"

    def _doc_tokens(batch: pa.Table):
        col = str_column(batch, column)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        off = lists.offsets.to_numpy().astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_pandas().to_numpy()
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[empty]] = False   # drop the [""] token
        lens = (off[1:] - off[:-1]).copy()
        lens[empty] = 0
        return flat[keep], lens                    # tokens, per-doc lens

    def pair_parts(batch: pa.Table) -> pa.Table:
        toks, lens = _doc_tokens(batch)
        if len(toks) == 0:
            return pa.table({"w1": pa.array([], type=pa.string()),
                             "w2": pa.array([], type=pa.string()),
                             "n_pair": pa.array([], type=pa.int64())})
        # adjacent within doc: drop the last token of every doc
        ends = np.cumsum(lens)
        last = ends[lens > 0] - 1
        m = np.ones(len(toks), dtype=bool)
        m[last] = False
        d = pd.DataFrame({"w1": toks[:-1][m[:-1]],
                          "w2": toks[1:][m[:-1]]})
        out = (d.groupby(["w1", "w2"], sort=False).size()
               .reset_index(name="n_pair"))
        out["n_pair"] = out["n_pair"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    parts = src.select_columns([column]).map_batches(
        pair_parts, batch_format="pyarrow")

    def pair_reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby(["w1", "w2"], sort=False)["n_pair"].sum()
             .reset_index().astype({"n_pair": "int64"}))
        summary = pd.DataFrame([{"w1": None, "w2": None,
                                 "n_pair": s["n_pair"].sum()}])
        s = s[s["n_pair"] >= min_count]
        s = s.sort_values(["n_pair", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="stable").head(k)
        return pd.concat([s, summary], ignore_index=True) \
            .astype({"n_pair": "int64"})

    rows = bucketed_group_reduce(parts, ["w1", "w2"], pair_reduce,
                                 num_partitions).to_pandas()
    empty = pd.DataFrame({
        "rank": pd.Series([], dtype="int64"),
        "w1": pd.Series([], dtype=object),
        "w2": pd.Series([], dtype=object),
        "n_pair": pd.Series([], dtype="int64"),
        "n_w1": pd.Series([], dtype="int64"),
        "n_w2": pd.Series([], dtype="int64"),
        "pmi": pd.Series([], dtype="float64")})
    if rows.empty or "w1" not in rows.columns:
        return empty
    n_pairs = int(rows[rows["w1"].isna()]["n_pair"].sum())
    top = rows[rows["w1"].notna()].copy()
    top = top.sort_values(["n_pair", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="stable").head(k)
    if top.empty or n_pairs == 0:
        return empty

    need = sorted(set(top["w1"]) | set(top["w2"]))
    need_ref = ray.put(np.array(need, dtype=object))

    def uni_parts(batch: pa.Table) -> dict:
        toks, _ = _doc_tokens(batch)
        d = {"_n_tok": int(len(toks))}
        want = ray.get(need_ref)
        if len(toks):
            vc = pd.Series(toks).value_counts(sort=False)
            vc = vc.reindex(want, fill_value=0)
        else:
            vc = pd.Series(0, index=want)
        for t, c in vc.items():
            d[f"u_{t}"] = int(c)
        return d

    def uni_combine(p: pd.DataFrame) -> dict:
        return {"n_tok": int(p["_n_tok"].sum()),
                **{t: int(p[f"u_{t}"].sum()) for t in need}}

    uni = global_agg(src.select_columns([column]), uni_parts, uni_combine)
    n_tok = uni["n_tok"]
    top["n_w1"] = top["w1"].map(uni).astype(np.int64)
    top["n_w2"] = top["w2"].map(uni).astype(np.int64)
    np_ = top["n_pair"].to_numpy(dtype=np.float64)
    pmi = np.log((np_ * float(n_tok) * float(n_tok))
                 / (float(n_pairs) * top["n_w1"].to_numpy(dtype=np.float64)
                    * top["n_w2"].to_numpy(dtype=np.float64)))
    top["pmi"] = _r(pmi, 6)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "w1", "w2", "n_pair", "n_w1", "n_w2",
                "pmi"]].reset_index(drop=True)


def heaps_curve(ds, id_col: str, column: str, *, n_checkpoints: int = 20,
                num_partitions: int | None = None) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve: reading the corpus in
    ``id_col`` order, the distinct-vocabulary count V and total token
    count T at ~``n_checkpoints`` evenly spaced document ranks — the
    diagnostic behind "is this crawl still adding new content or just
    re-crawling itself" (V ~ K*T^b with b ≈ 0.5 for natural text; a
    flattening curve means duplication).  Returns
    (checkpoint, cum_tokens, cum_vocab) with checkpoint = the doc rank
    each bucket ends at.

    Exactness: a token's contribution is pinned to the MINIMUM doc id
    containing it; both curve columns are exact integer sums.  Same
    whitespace tokenization contract as ``top_terms``.

    Scale shape: per-batch (token, min_id) partials local-dedup before
    ONE vocab-bounded token shuffle (min-reduce); doc ranks via the
    range-partitioned ``global_row_number``; first-ranks attach with an
    equi-join that buckets above the broadcast cap; everything after is
    <= n_checkpoints rows.  No text ever shuffles."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)
    from packs_ray.functions.joins import equi_join
    from packs_ray.functions.windows import global_row_number

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    ws_re = "[ \t\n\r\f\v]+"
    narrow = ds.select_columns([id_col, column]).map_batches(
        lambda b: b.filter(pc.is_valid(b.column(id_col))),
        batch_format="pyarrow")

    def doc_rows(batch: pa.Table) -> pa.Table:
        col = str_column(batch, column)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        n = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n[pc.equal(trimmed, "").to_numpy(zero_copy_only=False)] = 0
        return pa.table({id_col: batch.column(id_col),
                         "n_toks": pa.array(n, type=pa.int64())})

    docs = narrow.map_batches(doc_rows, batch_format="pyarrow") \
        .materialize()
    n_docs = docs.count()
    if n_docs == 0:
        return pd.DataFrame({"checkpoint": pd.Series([], dtype="int64"),
                             "cum_tokens": pd.Series([], dtype="int64"),
                             "cum_vocab": pd.Series([], dtype="int64")})
    step = -(-n_docs // n_checkpoints)
    # id_col is unique here, so "n_toks" as a tie column never orders
    # anything — it just rides along (global_row_number keeps only
    # key + tie columns)
    ranked = global_row_number(docs, id_col, ["n_toks"], out_col="rnk")

    def tok_min(batch: pa.Table) -> pa.Table:
        col = str_column(batch, column)
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
        df = pd.DataFrame({"token": flat[keep],
                           "fdoc": np.repeat(ids, raw_lens)[keep]})
        out = df.groupby("token", sort=False, as_index=False).agg(
            fdoc=("fdoc", "min"))
        return _table_from_pandas(out, preserve_index=False)

    def min_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", sort=False, as_index=False).agg(
            fdoc=("fdoc", "min"))

    firsts = bucketed_group_reduce(
        narrow.map_batches(tok_min, batch_format="pyarrow"),
        ["token"], min_reduce, num_partitions)
    fr = equi_join(firsts, ranked.select_columns([id_col, "rnk"]),
                   left_on=["fdoc"], right_on=[id_col], how="inner")

    def vb_partial(batch: pa.Table) -> pa.Table:
        rnk = batch.column("rnk").to_numpy(zero_copy_only=False)
        b = (rnk + step - 1) // step
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u, type=pa.int64()),
                         "v": pa.array(c.astype(np.int64))})

    vb = fr.map_batches(vb_partial, batch_format="pyarrow").to_pandas()
    vb = vb.groupby("b", as_index=False).agg(v=("v", "sum")) if len(vb) \
        else pd.DataFrame({"b": [], "v": []})

    def db_partial(batch: pa.Table) -> pa.Table:
        rnk = batch.column("rnk").to_numpy(zero_copy_only=False)
        nt = batch.column("n_toks").to_numpy(zero_copy_only=False)
        b = (rnk + step - 1) // step
        df = pd.DataFrame({"b": b, "t": nt, "cp": rnk})
        g = df.groupby("b", as_index=False).agg(t=("t", "sum"),
                                                cp=("cp", "max"))
        return _table_from_pandas(g, preserve_index=False)

    db = ranked.map_batches(db_partial, batch_format="pyarrow").to_pandas()
    db = db.groupby("b", as_index=False).agg(t=("t", "sum"),
                                             cp=("cp", "max"))
    out = db.merge(vb, on="b", how="left").sort_values("b")
    out["v"] = out["v"].fillna(0)
    return pd.DataFrame({
        "checkpoint": out["cp"].to_numpy(dtype=np.int64),
        "cum_tokens": out["t"].cumsum().to_numpy(dtype=np.int64),
        "cum_vocab": out["v"].cumsum().to_numpy(dtype=np.int64)})


def ngram_diversity(ds, group_col: str, text_col: str, *, max_n: int = 3,
                    num_partitions: int | None = None) -> pd.DataFrame:
    """Distinct-n diversity profile per corpus group (Li et al. 2016's
    distinct-1/2/3, the standard mode-collapse / templated-content
    screen): for each (group, n<=max_n) — total n-gram positions,
    distinct n-grams, and distinct_ratio (a ratio near 0 means the
    group keeps repeating the same phrases).  Same trim/split
    whitespace tokenizer as top_terms; n-grams are adjacent WITHIN a
    document.  Null group rows are dropped.

    Exactness: both counts are exact integers (distinct via one
    gram-bucketed mark shuffle with local dedup combiners — a gram's
    marks all land in one bucket, so the global distinct is a plain
    sum); the ratio is ONE pinned 6dp division.

    Scale shape: marks are (group, n, w1..wn) rows deduped per batch
    before the ONE bounded-by-vocab shuffle; position totals are tiny
    per-batch partials summed driver-side.  Text never shuffles."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)
    from packs_ray.stages.util import round_half_away

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    ws_re = "[ \t\n\r\f\v]+"
    wcols = [f"w{i + 1}" for i in range(max_n)]

    def _doc_tokens(batch: pa.Table):
        col = str_column(batch, text_col)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        off = lists.offsets.to_numpy().astype(np.int64)
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        flat = lists.flatten().to_pandas().to_numpy()
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[empty]] = False
        lens = (off[1:] - off[:-1]).copy()
        lens[empty] = 0
        return flat[keep], lens

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(group_col)))
        grp = batch.column(group_col).cast(pa.string()) \
            .to_pandas().to_numpy()
        toks, lens = _doc_tokens(batch)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        frames = []
        for n in range(1, max_n + 1):
            if len(toks) < n:
                continue
            tail = len(toks) - (n - 1)
            ok = doc_idx[:tail] == doc_idx[n - 1:] if n > 1 \
                else np.ones(tail, dtype=bool)
            d = {"grp": grp[doc_idx[:tail][ok]],
                 "n": np.int64(n)}
            for i in range(max_n):
                d[wcols[i]] = (toks[i: tail + i][ok] if i < n
                               else "")
            frames.append(pd.DataFrame(d))
        if not frames:
            return pa.table({"grp": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             **{w: pa.array([], type=pa.string())
                                for w in wcols}})
        out = pd.concat(frames).drop_duplicates()
        out = out[["grp", "n", *wcols]]
        return _table_from_pandas(out, preserve_index=False)

    def distinct_reduce(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates()
        s = (u.groupby(["grp", "n"], sort=False).size()
             .reset_index(name="n_distinct"))
        s["n_distinct"] = s["n_distinct"].astype(np.int64)
        return s

    dist_parts = bucketed_group_reduce(
        ds.select_columns([group_col, text_col])
        .map_batches(marks, batch_format="pyarrow"),
        wcols, distinct_reduce, num_partitions).to_pandas()
    dist = (dist_parts.groupby(["grp", "n"], as_index=False)
            .agg(n_distinct=("n_distinct", "sum"))
            if len(dist_parts) else
            pd.DataFrame({"grp": [], "n": [], "n_distinct": []}))

    def totals(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(group_col)))
        grp = batch.column(group_col).cast(pa.string()) \
            .to_pandas().to_numpy()
        _, lens = _doc_tokens(batch)
        frames = []
        for n in range(1, max_n + 1):
            pos = np.maximum(lens - (n - 1), 0)
            frames.append(pd.DataFrame(
                {"grp": grp, "n": np.int64(n), "t": pos}))
        g = (pd.concat(frames).groupby(["grp", "n"], as_index=False)
             .agg(t=("t", "sum")))
        return _table_from_pandas(g, preserve_index=False)

    tot = ds.select_columns([group_col, text_col]).map_batches(
        totals, batch_format="pyarrow").to_pandas()
    tot = (tot.groupby(["grp", "n"], as_index=False).agg(t=("t", "sum"))
           if len(tot) else pd.DataFrame({"grp": [], "n": [], "t": []}))
    out = tot.merge(dist, on=["grp", "n"], how="left")
    out = out[out["t"] > 0]
    if not len(out):
        return pd.DataFrame({
            group_col: pd.Series([], dtype="string"),
            "n": pd.Series([], dtype="int64"),
            "n_grams": pd.Series([], dtype="int64"),
            "n_distinct": pd.Series([], dtype="int64"),
            "distinct_ratio": pd.Series([], dtype="float64")})
    out["n_distinct"] = out["n_distinct"].fillna(0)
    out = out.sort_values(["grp", "n"]).reset_index(drop=True)
    return pd.DataFrame({
        group_col: out["grp"].astype(object),
        "n": out["n"].to_numpy(dtype=np.int64),
        "n_grams": out["t"].to_numpy(dtype=np.int64),
        "n_distinct": out["n_distinct"].to_numpy(dtype=np.int64),
        "distinct_ratio": round_half_away(
            out["n_distinct"].to_numpy(dtype=np.float64)
            / out["t"].to_numpy(dtype=np.float64), 6)})


def readability(ds, id_col: str, text_col: str):
    """Per-document Flesch reading-ease score (Flesch 1948) from three
    vectorized RE2 counts — the classic curriculum / audience screen
    (very low scores flag machine-generated or degenerate text; the
    text_validation_pack's length checks generalized to a readability
    axis, /root/reference/text_validation_pack/main.py:66-114).

    words = \\S+ runs; sentences = [.!?]+ runs (min 1 once any word
    exists); syllables = case-insensitive [aeiouy]+ vowel groups (the
    standard dictionary-free approximation).  flesch = round(206.835 -
    1.015*(w/s) - 84.6*(sy/w), 4) — ONE fixed left-to-right double
    expression shared with the SQL oracle.  Rows with zero words (null
    or whitespace-only text) emit null flesch.

    Scale: stateless vectorized map_batches, no exchange."""

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, text_col)
        w = pc.count_substring_regex(text, r"\S+").fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(text, r"[.!?]+").fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sy = pc.count_substring_regex(text, r"(?i)[aeiouy]+").fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.maximum(s, 1)
        ok = w > 0
        wf = w.astype(np.float64)
        flesch = np.where(
            ok,
            _r(206.835 - 1.015 * (wf / s.astype(np.float64))
               - 84.6 * (sy.astype(np.float64) / np.maximum(wf, 1.0)), 4),
            np.nan)
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(w),
            "n_sentences": pa.array(np.where(ok, s, 0).astype(np.int64)),
            "n_syllables": pa.array(sy),
            "flesch": pa.array(flesch, type=pa.float64(),
                               from_pandas=True)})  # NaN (no words) -> null

    return ds.map_batches(fn, batch_format="pyarrow")


def class_tfidf(ds, label_col: str, text_col: str, *, k: int = 10,
                num_partitions: int | None = None) -> pd.DataFrame:
    """c-TF-IDF class-distinguishing terms (the BERTopic topic-keyword
    formula, Grootendorst 2022): treating each label's documents as one
    meta-document, score every (class, term) with

        W(t, c) = tf(t, c) * ln(1 + A / f(t))

    where ``tf`` is the exact term count inside the class, ``f`` the
    exact corpus count, and ``A`` the average token count per class —
    the per-source / per-language "what makes this slice different"
    profile next to :func:`top_terms`' per-document ranking.

    Scale shape: per-batch (class, token, tf) combiners ride ONE
    token-bucketed reduce — every class row of a token lands in the
    same bucket, so ``f(t)`` and all class scores for that token are
    computed exactly inside the bucket; each bucket emits only its own
    per-class top-``k`` candidates (lossless for the global top-k) and
    the driver keeps k per class.  ``ln`` is libm ``math.log`` per
    surviving (class, token) row (the bm25 convention — bounded by the
    bucket's candidate rows, never the corpus).  Null labels are
    excluded; ties (score desc, token asc).  Returns
    (class, term, tf, score) with score unrounded inputs ordered, 6dp
    in the output."""
    import math

    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away, str_column

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    ws_re = "[ \t\n\r\f\v]+"

    def tf_rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(label_col)))
        empty = pa.table({"label": pa.array([], type=pa.string()),
                          "token": pa.array([], type=pa.string()),
                          "tf": pa.array([], type=pa.int64())})
        if len(batch) == 0:
            return empty
        labels = str_column(batch, label_col).to_pandas().to_numpy()
        col = str_column(batch, text_col)
        trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
        lists = pc.split_pattern_regex(trimmed, ws_re)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        off = lists.offsets.to_numpy().astype(np.int64)
        lens = np.diff(off - off[0])
        flat = lists.flatten().to_pandas().to_numpy()
        row = np.repeat(np.arange(len(batch)), lens)
        emp = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        keep = np.ones(len(flat), dtype=bool)
        keep[(off[:-1] - off[0])[emp]] = False
        flat, row = flat[keep], row[keep]
        if len(flat) == 0:
            return empty
        g = (pd.DataFrame({"label": labels[row], "token": flat})
             .groupby(["label", "token"], sort=False).size()
             .rename("tf").reset_index())
        g["tf"] = g["tf"].astype("int64")
        return _table_from_pandas(g, preserve_index=False)

    parts = ds.select_columns([label_col, text_col]).map_batches(
        tf_rows, batch_format="pyarrow")

    # global scalars: per-class token totals -> A = total / n_classes
    def cls_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("label", sort=False)["tf"].sum().reset_index()
        g["tf"] = g["tf"].astype("int64")
        return _table_from_pandas(g, preserve_index=False)

    mat = parts.materialize()
    cls = mat.map_batches(cls_partial, batch_format="pyarrow") \
        .to_pandas()
    empty_out = pd.DataFrame({"class": pd.Series(dtype="object"),
                              "term": pd.Series(dtype="object"),
                              "tf": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
    if cls.empty or "label" not in cls.columns:
        return empty_out
    totals = cls.groupby("label")["tf"].sum()
    a_const = float(int(totals.sum())) / len(totals)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["label", "token"], sort=False)["tf"].sum() \
            .reset_index()
        ft = t.groupby("token", sort=False)["tf"].transform("sum") \
            .to_numpy(dtype=np.int64)
        tf = t["tf"].to_numpy(dtype=np.int64)
        t["score"] = [tf[i] * math.log(1.0 + a_const / float(ft[i]))
                      for i in range(len(t))]
        t = t.sort_values(["label", "score", "token"],
                          ascending=[True, False, True], kind="stable")
        return t.groupby("label", sort=False).head(k)

    cand = bucketed_group_reduce(mat, ["token"], bucket_topk,
                                 num_partitions).to_pandas()
    if cand.empty or "label" not in cand.columns:
        return empty_out
    cand = cand.sort_values(["label", "score", "token"],
                            ascending=[True, False, True],
                            kind="stable")
    out = cand.groupby("label", sort=False).head(k).reset_index(drop=True)
    return pd.DataFrame({"class": out["label"].astype(object),
                         "term": out["token"].astype(object),
                         "tf": out["tf"].astype("int64"),
                         "score": round_half_away(
                             out["score"].to_numpy(dtype=np.float64), 6)})


def langid_eval(ds, text_col: str, label_col: str):
    """Confusion matrix of the langid heuristic against a true-label
    column — the eval harness for the quality_filter pipeline's
    language gate (one (label, predicted, n) row per observed cell).
    Rows with a null label drop (unlabeled docs can't score).

    Scale shape: the model is per-worker state; predictions ride the
    same one-pass keyed_count as every categorical histogram."""
    from packs_ray.functions.agg import keyed_count

    model_holder: dict = {}

    def add_pred(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch.column(label_col).is_valid())
        model = model_holder.setdefault("m", LangIdModel())
        pred, _ = model.predict_batch(str_column(batch, text_col))
        return pa.table({label_col: batch.column(label_col),
                         "predicted_lang": pa.array(pred.astype(str))})

    return keyed_count(
        ds.select_columns([label_col, text_col]).map_batches(
            add_pred, batch_format="pyarrow"),
        [label_col, "predicted_lang"], count_col="n") \
        .sort([label_col, "predicted_lang"])


def setcover_sample(ds, id_col: str, text_col: str, *, k: int = 4,
                    shingle: int = 5, universe_bits: int = 16,
                    num_partitions: int | None = None) -> "pd.DataFrame":
    """Greedy max-coverage (set-cover) corpus selection: pick k
    documents that together cover the most distinct character-shingle
    hash buckets — the submodular data-subset-selection baseline
    (facility-location family) beside :func:`similarity.kcenter_sample`
    (which maximizes embedding spread; this maximizes LEXICAL
    coverage, needing no embeddings).  Greedy is the classic (1-1/e)
    approximation, and marginal gains are computed over a bounded
    2^universe_bits bucket universe so the "covered" state broadcast
    per round is a fixed-size bitmask (8 KB at 16 bits), never a
    document set.

    Determinism: shingle hashes are the repo FNV chain
    (neardup._shingle_hashes) folded mod 2^universe_bits; each round's
    winner is (gain DESC, id ASC) — exact integer gains, so ties are
    stable at any parallelism.

    Scale shape: k rounds × (one corpus scan emitting per-batch
    winner partials — each partial carries its candidate's bucket
    list, so the driver never rescans); the only driver state is the
    bitmask + k winner rows.

    Output: (round, id, gain, covered_total) — gain = newly covered
    buckets, covered_total = running union size."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from packs_ray.functions.neardup import _shingle_hashes

    m = 1 << universe_bits
    mask_mod = np.uint64(m - 1)
    covered = np.zeros(m, dtype=bool)
    chosen: set = set()
    rows = []
    for rnd in range(1, k + 1):
        cov_ref = ray.put((covered, frozenset(chosen)))

        def partial(batch: pa.Table, _cov_ref=cov_ref) -> pa.Table:
            cov, done = ray.get(_cov_ref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            texts = batch.column(text_col).to_pylist()
            best_gain, best_id, best_b = -1, None, None
            for i, t in zip(ids, texts):
                if t is None or i is None or i in done:
                    continue
                b = np.unique(_shingle_hashes(t, shingle) & mask_mod) \
                    .astype(np.int64)
                gain = int((~cov[b]).sum())
                if gain > best_gain or (gain == best_gain
                                        and best_id is not None
                                        and i < best_id):
                    best_gain, best_id, best_b = gain, i, b
            if best_id is None:
                return pa.table({
                    "id": pa.array([], type=pa.int64()),
                    "gain": pa.array([], type=pa.int64()),
                    "buckets": pa.array([], type=pa.list_(pa.int64()))})
            return pa.table({
                "id": pa.array([best_id], type=pa.int64()),
                "gain": pa.array([best_gain], type=pa.int64()),
                "buckets": pa.array([best_b.tolist()],
                                    type=pa.list_(pa.int64()))})

        parts = ds.map_batches(partial,
                               batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        parts = parts.sort_values(["gain", "id"],
                                  ascending=[False, True], kind="stable")
        win = parts.iloc[0]
        wb = np.asarray(win["buckets"], dtype=np.int64)
        new = wb[~covered[wb]]
        covered[new] = True
        chosen.add(int(win["id"]))
        rows.append({"round": np.int64(rnd),
                     "id": np.int64(win["id"]),
                     "gain": np.int64(len(new)),
                     "covered_total": np.int64(int(covered.sum()))})
    if not rows:
        return pd.DataFrame({"round": pd.Series([], dtype="int64"),
                             "id": pd.Series([], dtype="int64"),
                             "gain": pd.Series([], dtype="int64"),
                             "covered_total": pd.Series([], dtype="int64")})
    return pd.DataFrame(rows)
