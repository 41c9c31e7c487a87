"""Web-scale corpus-quality operators: Gopher-style repetition stats,
C4/CCNet-style corpus-level boilerplate removal, and benchmark
decontamination.

These extend the reference's per-column quality checks (e.g.
text_validation_pack/main.py:36-114 length/word stats) to the
document- and corpus-level signals a 100-TB training-data pipeline
needs (Rae et al. 2021 "Scaling Language Models" App. A1.1 repetition
filters; Raffel et al. 2020 C4 §2.2 corpus-level line dedup; Brown et
al. 2020 GPT-3 App. C n-gram decontamination).  All three are
published-recipe re-expressions, vectorized over Arrow batches:

- ``repetition_stats``: per-document fraction of word n-gram positions
  occupied by the most frequent n-gram (``top_{n}gram_frac``) and by
  any n-gram occurring more than once (``dup_{n}gram_frac``).  We count
  n-gram *positions* rather than Gopher's character coverage: the
  signal is the same monotone repetition measure, but it is exactly
  SQL-expressible so the DuckDB oracle can verify it hash-exact.
- ``boilerplate_texts`` / ``drop_boilerplate``: normalized texts that
  appear in >= ``min_groups`` distinct groups (conversations) are
  boilerplate; find them with a bucketed distinct-count reduce, then
  drop matching rows via a broadcast membership filter.
- ``decontaminate``: mark corpus documents sharing any word n-gram
  with a (small, broadcast) benchmark set.

Tokenization contract shared with the oracles: split on a single
ASCII space (empty tokens kept), n-grams joined with a single space —
byte-identical to DuckDB ``string_split(text, ' ')`` +
``array_to_string(ws[i:i+n-1], ' ')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import bucketed_group_reduce, reduce_partition_count
from packs_ray.stages.util import str_column
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

# Python str.strip / Arrow trim default whitespace, pinned to the ASCII
# set so the DuckDB twin (trim(text, ' \t\n\r\x0b\x0c')) matches.
_WS = " \t\n\r\x0b\x0c"


def _flat_words(text: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split every text on ' ' and return (flat word values, per-doc word
    counts, flat doc index).  Null texts contribute 0 words."""
    nulls = pc.is_null(text).to_numpy(zero_copy_only=False)
    split = pc.split_pattern(pc.coalesce(text, pa.scalar("", type=text.type)), " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    # coalesce turned null -> "" -> [''] (one empty token); zero it back out
    if nulls.any():
        keep = split.filter(pa.array(~nulls))  # words of non-null docs only
        lens = np.where(nulls, 0, lens)
        flat = np.asarray(pc.list_flatten(keep).to_numpy(zero_copy_only=False),
                          dtype=object)
    else:
        flat = np.asarray(pc.list_flatten(split).to_numpy(zero_copy_only=False),
                          dtype=object)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return flat, lens, doc_idx


def _gram_starts(doc_idx: np.ndarray, n: int) -> np.ndarray:
    """Flat indices i such that words[i:i+n] lie inside one document."""
    if doc_idx.size < n:
        return np.empty(0, dtype=np.int64)
    valid = doc_idx[: doc_idx.size - n + 1] == doc_idx[n - 1:]
    return np.nonzero(valid)[0]


def repetition_stats(ds, id_col: str, column: str, ns: tuple[int, ...] = (2, 3)):
    """Per-document word n-gram repetition fractions (Gopher App. A1.1
    recipe, position-fraction variant; see module docstring).

    Output: one row per input row with ``id_col``, ``n_words`` and, for
    each n, ``top_{n}gram_frac`` / ``dup_{n}gram_frac`` (0.0 when the
    document has fewer than n words).  Fully per-batch (no shuffle).
    """
    ns = tuple(ns)

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, column)
        words, lens, doc_idx = _flat_words(text)
        ndocs = len(lens)
        # exact word ids at C speed; gram identity = tuple of word ids
        codes = (pd.factorize(words)[0].astype(np.int64) if words.size
                 else np.empty(0, dtype=np.int64))
        out: dict[str, pa.Array] = {
            id_col: batch.column(id_col),
            "n_words": pa.array(lens, type=pa.int64()),
        }
        for n in ns:
            starts = _gram_starts(doc_idx, n)
            top = np.zeros(ndocs, dtype=np.float64)
            dup = np.zeros(ndocs, dtype=np.float64)
            if starts.size:
                cols = [codes[starts + k] for k in range(n)]
                docs = doc_idx[starts]
                # sort gram occurrences by (doc, gram tuple); count runs
                order = np.lexsort(tuple(reversed(cols)) + (docs,))
                sd = docs[order]
                new_run = np.zeros(starts.size, dtype=bool)
                new_run[0] = True
                for c in cols:
                    cs = c[order]
                    new_run[1:] |= cs[1:] != cs[:-1]
                new_run[1:] |= sd[1:] != sd[:-1]
                run_ids = np.cumsum(new_run) - 1
                counts = np.bincount(run_ids)  # occurrences per (doc, gram)
                run_doc = sd[new_run]
                totals = np.bincount(docs, minlength=ndocs).astype(np.float64)
                max_c = np.zeros(ndocs, dtype=np.int64)
                np.maximum.at(max_c, run_doc, counts)
                dup_c = np.zeros(ndocs, dtype=np.int64)
                np.add.at(dup_c, run_doc, np.where(counts > 1, counts, 0))
                nz = totals > 0
                top[nz] = max_c[nz] / totals[nz]
                dup[nz] = dup_c[nz] / totals[nz]
            out[f"top_{n}gram_frac"] = pa.array(top, type=pa.float64())
            out[f"dup_{n}gram_frac"] = pa.array(dup, type=pa.float64())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def boilerplate_texts(ds, group_col: str, text_col: str, *, min_groups: int = 5):
    """Normalized texts (strip + lower) appearing in >= ``min_groups``
    distinct groups — the corpus-level "line appears in many documents"
    boilerplate test of C4 §2.2, with conversation as the document.

    Returns a Dataset of (text_norm, n_groups, n_rows).  Shuffle shape:
    per-batch (norm, group) distinct partials (tiny vs the input), then
    ONE bucketed reduce keyed by norm — all occurrences of one text
    land in one bucket, so the distinct-group count is exact.
    """

    def partial(batch: pa.Table) -> pa.Table:
        text = str_column(batch, text_col)
        norm = pc.utf8_lower(pc.utf8_trim(text, _WS))
        df = pd.DataFrame({
            "text_norm": norm.to_numpy(zero_copy_only=False),
            "g": batch.column(group_col).to_numpy(zero_copy_only=False),
        })
        df = df[df["text_norm"].notna() & (df["text_norm"] != "")]
        part = (df.groupby(["text_norm", "g"], sort=False).size()
                  .rename("n_rows").reset_index())
        return _table_from_pandas(part, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("text_norm", sort=False)
                .agg(n_groups=("g", "nunique"), n_rows=("n_rows", "sum"))
                .reset_index())
        agg = agg[agg["n_groups"] >= min_groups]
        return agg.astype({"n_groups": "int64", "n_rows": "int64"})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_reduce(parts, ["text_norm"], per_bucket,
                                 reduce_partition_count(ds))


def _pack128(norm_obj: np.ndarray) -> np.ndarray:
    """Two independent 64-bit hashes of each normalized text, packed
    big-endian into sortable 16-byte keys (S16 compares bytewise, so
    ``np.searchsorted`` gives exact 128-bit membership)."""
    h1 = pd.util.hash_array(norm_obj, hash_key="0123456789123456")
    h2 = pd.util.hash_array(norm_obj, hash_key="6543216543210987")
    b = np.empty((len(norm_obj), 2), dtype=">u8")
    b[:, 0] = h1
    b[:, 1] = h2
    return np.ascontiguousarray(b).view("S16").ravel()


def drop_boilerplate(ds, group_col: str, text_col: str, *, min_groups: int = 5,
                     max_broadcast: int = 4_000_000):
    """Remove rows whose normalized text is corpus-level boilerplate.

    The broadcast is the 128-bit HASH set of the boilerplate texts, not
    the strings themselves: the set is bounded by n_rows/min_groups
    entries, which is small in practice but each entry could be a whole
    document on an adversarial corpus — 16 B/entry keeps the driver and
    every worker flat regardless of text size (the ``content_hash128``
    convention of stages/dedup; collision odds are negligible at 10^12
    rows).  Entries beyond ``max_broadcast`` (64 MB of keys) are dropped
    from the filter with a printed notice — filtering then degrades to
    partial rather than failing.
    """
    import ray

    bp = boilerplate_texts(ds, group_col, text_col, min_groups=min_groups)

    def to_keys(batch: pa.Table) -> pa.Table:
        norm = np.asarray(batch.column("text_norm")
                          .to_numpy(zero_copy_only=False), dtype=object)
        return pa.table({"hk": pa.array(list(_pack128(norm)),
                                        type=pa.binary(16))})

    rows = bp.map_batches(to_keys, batch_format="pyarrow") \
        .take(max_broadcast + 1)
    if len(rows) > max_broadcast:
        print(f"drop_boilerplate: boilerplate set exceeds max_broadcast="
              f"{max_broadcast}; {len(rows) - max_broadcast}+ entries not "
              "filtered (raise max_broadcast or min_groups)")
        rows = rows[:max_broadcast]
    keys = np.sort(np.array([r["hk"] for r in rows], dtype="S16"))
    ref = ray.put(keys)

    def keep(batch: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        if bad.size == 0:
            return batch
        text = str_column(batch, text_col)
        norm = np.asarray(pc.utf8_lower(pc.utf8_trim(text, _WS))
                          .to_numpy(zero_copy_only=False), dtype=object)
        present = pd.notna(norm) & (norm != "")
        probe = _pack128(np.where(present, norm, ""))
        pos = np.searchsorted(bad, probe)
        pos[pos == bad.size] = 0
        hit = present & (bad[pos] == probe)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def build_bench_grams(bench_texts: list[str], n: int) -> dict:
    """Benchmark word-n-gram index for :func:`decontaminate`: a word
    vocabulary plus the packed int64 codes of every bench n-gram.
    Built once on the driver and broadcast (benchmark suites are tiny
    next to the corpus)."""
    vocab: dict[str, int] = {}
    grams: set[int] = set()
    texts = [t for t in bench_texts if t is not None]
    for t in texts:
        for w in t.split(" "):
            if w not in vocab:
                vocab[w] = len(vocab)
    base = len(vocab) + 2  # +2: id 0 reserved for "not in bench vocab"
    if base ** n >= 2 ** 63:
        raise ValueError(
            f"bench vocabulary too large to pack {n}-grams into int64 "
            f"({len(vocab)} words); shrink the benchmark or n")
    for t in texts:
        ws = t.split(" ")
        ids = [vocab[w] + 1 for w in ws]
        for i in range(len(ids) - n + 1):
            code = 0
            for k in range(n):
                code = code * base + ids[i + k]
            grams.add(code)
    return {
        "vocab": pd.Index(list(vocab.keys())),
        "grams": np.sort(np.fromiter(grams, dtype=np.int64, count=len(grams))),
        "base": base,
        "n": n,
    }


def decontaminate(ds, id_col: str, text_col: str, bench_texts: list[str],
                  *, n: int = 3):
    """Per-document benchmark-contamination counts (GPT-3 App. C style
    n-gram overlap): ``n_hits`` = number of word n-gram positions whose
    gram also occurs in the benchmark set, ``contaminated`` = any hit.

    Scale shape: the bench index is built once and broadcast with
    ``ray.put``; each batch maps its words onto the bench vocabulary
    (``pd.Index.get_indexer``, exact), packs candidate grams into int64
    and membership-tests with ``np.isin`` — no hashing, no collisions,
    no shuffle.
    """
    import ray

    ref = ray.put(build_bench_grams(bench_texts, n))

    def fn(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        text = str_column(batch, text_col)
        words, lens, doc_idx = _flat_words(text)
        ndocs = len(lens)
        hits = np.zeros(ndocs, dtype=np.int64)
        starts = _gram_starts(doc_idx, bench["n"])
        if starts.size and bench["grams"].size:
            ids = bench["vocab"].get_indexer(words) + 1  # 0 = out-of-vocab
            code = np.zeros(starts.size, dtype=np.int64)
            in_vocab = np.ones(starts.size, dtype=bool)
            for k in range(bench["n"]):
                w = ids[starts + k]
                in_vocab &= w > 0
                code = code * bench["base"] + w
            hit = in_vocab & np.isin(code, bench["grams"], assume_unique=False)
            np.add.at(hits, doc_idx[starts], hit.astype(np.int64))
        return pa.table({
            id_col: batch.column(id_col),
            "n_hits": pa.array(hits, type=pa.int64()),
            "contaminated": pa.array(hits > 0, type=pa.bool_()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_lines(ds, id_col: str, text_col: str, *, sep: str = "\n",
                num_partitions: int | None = None):
    """C4-style corpus-level line dedup (Raffel et al. 2020 §2.2):
    every distinct line survives only at its first occurrence — the
    minimal ``(doc, line_idx)`` lexicographically — and documents are
    rebuilt from their surviving lines.  Docs that lose every line
    disappear (SQL GROUP BY semantics, mirrored by the oracle).

    Scale shape (the dedup_spans layout): the winner election shuffles
    only ~24 B/line marks ``(h1, h2, doc, idx)`` bucketed by line hash;
    the line TEXT shuffles once, co-partitioned with the winner marks by
    doc hash for the rebuild.  All lines participate, empties included.

    Returns a lazy Dataset of ``(id_col, text_col)``."""
    if num_partitions is None:
        num_partitions = max(2, reduce_partition_count(ds))

    def explode(batch: pa.Table, with_text: bool) -> pd.DataFrame:
        # null id/text rows carry no lines (the dedup_spans convention;
        # a null text would NaN-poison the repeat counts below)
        df = batch.select([id_col, text_col]).to_pandas() \
            .dropna(subset=[id_col, text_col])
        lines = df[text_col].str.split(sep)
        n = lines.str.len().to_numpy()
        doc = np.repeat(df[id_col].to_numpy(), n)
        idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n]) \
            if len(n) else np.array([], dtype=np.int64)
        line = np.concatenate([np.asarray(v, dtype=object) for v in lines]) \
            if len(n) else np.array([], dtype=object)
        out = pd.DataFrame({id_col: doc, "__idx": idx})
        h1 = pd.util.hash_array(line, hash_key="0123456789123456")
        h2 = pd.util.hash_array(line, hash_key="6543216543210987")
        out["__h1"] = h1.view(np.int64)
        out["__h2"] = h2.view(np.int64)
        if with_text:
            out["__line"] = line
        return out

    # pass 1: winner election — marks only, bucketed by line hash
    def marks(batch: pa.Table) -> pa.Table:
        out = explode(batch, with_text=False)
        # local combiner: one candidate (min doc, idx) per line per batch
        out = (out.sort_values([id_col, "__idx"], kind="stable")
               .drop_duplicates(["__h1", "__h2"]))
        out["__p"] = (out["__h1"].to_numpy().view(np.uint64)
                      % np.uint64(num_partitions)).astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([id_col, "__idx"], kind="stable")
             .drop_duplicates(["__h1", "__h2"]))
        return g[[id_col, "__idx"]]

    winners = ds.map_batches(marks, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda g: elect(g.drop(columns="__p")), batch_format="pandas")

    # pass 2: rebuild — text rows co-partitioned with winner marks by doc
    def doc_bucket(df: pd.DataFrame) -> np.ndarray:
        h = pd.util.hash_array(df[id_col].to_numpy())
        return (h % np.uint64(num_partitions)).astype(np.int64)

    def text_side(batch: pa.Table) -> pa.Table:
        out = explode(batch, with_text=True)
        out = out.drop(columns=["__h1", "__h2"])
        out["__side"] = np.int8(0)
        out["__p"] = doc_bucket(out)
        return _table_from_pandas(out, preserve_index=False)

    def mark_side(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame({id_col: df[id_col], "__idx": df["__idx"]})
        out["__line"] = ""
        out["__side"] = np.int8(1)
        out["__p"] = doc_bucket(out)
        return _table_from_pandas(out, preserve_index=False)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        keep = g[g["__side"] == 1][[id_col, "__idx"]]
        text = g[g["__side"] == 0]
        mi_t = pd.MultiIndex.from_arrays([text[id_col], text["__idx"]])
        mi_k = pd.MultiIndex.from_arrays([keep[id_col], keep["__idx"]])
        kept = text[mi_t.isin(mi_k)]
        if kept.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype=g[id_col].dtype),
                                 text_col: pd.Series([], dtype=object)})
        kept = kept.sort_values([id_col, "__idx"], kind="stable")
        out = (kept.groupby(id_col, sort=False)["__line"]
               .agg(sep.join).reset_index())
        return out.rename(columns={"__line": text_col})

    texts = ds.map_batches(text_side, batch_format="pyarrow")
    marks_ds = winners.map_batches(mark_side, batch_format="pyarrow")
    return (texts.union(marks_ds).groupby("__p")
            .map_groups(lambda g: rebuild(g.drop(columns="__p")),
                        batch_format="pandas"))


def gopher_flags(ds, id_col: str, text_col: str, *,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stopwords: int = 2,
                 passthrough: tuple = ()):
    """Gopher quality-rule bundle (Rae et al. 2021 App. A1.1, adapted):
    per-document metrics + a combined keep verdict from the published
    thresholds — word-count bounds, mean word length, #/… symbol-to-word
    ratio, bullet-start and ellipsis-end line fractions, fraction of
    words containing a letter, and a stopword floor (occurrences of the
    shared STOPWORDS bank rather than Gopher's distinct-count — the
    SQL-exact adaptation).

    One streaming pass, every counter an RE2 kernel
    (``pc.count_substring_regex`` — the same regex engine DuckDB calls,
    so the oracle is replicable pattern-for-pattern).  Ratios are
    rounded half-away to 4dp BEFORE thresholding on both sides, so a
    boundary document cannot flip on float formatting.  Null text
    counts as empty."""
    from packs_ray.functions.textstats import STOPWORDS
    from packs_ray.stages.util import round_half_away as _r4

    stop_re = r"(?i)\b(?:" + "|".join(STOPWORDS) + r")\b"

    def fn(batch: pa.Table) -> pa.Table:
        text = str_column(batch, text_col)

        def cnt(pattern):
            return pc.count_substring_regex(text, pattern).fill_null(0) \
                .to_numpy(zero_copy_only=False).astype(np.float64)

        n_words = cnt(r"\S+")
        n_wchars = cnt(r"\S")
        n_sym = cnt(r"[#…]")
        n_alpha_w = cnt(r"\S*[A-Za-z]\S*")
        n_stop = cnt(stop_re)
        n_lines = pc.add(pc.count_substring(text, "\n").fill_null(0),
                         1).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n_bullet = cnt(r"(?m)^[ \t]*[-*•]")
        n_ellip = cnt(r"(?m)(?:\.\.\.|…)[ \t]*$")

        wdiv = np.maximum(n_words, 1.0)
        mean_wl = _r4(n_wchars / wdiv, 4)
        sym_ratio = _r4(n_sym / wdiv, 4)
        bullet_frac = _r4(n_bullet / n_lines, 4)
        ellip_frac = _r4(n_ellip / n_lines, 4)
        alpha_frac = _r4(n_alpha_w / wdiv, 4)

        keep = ((n_words >= min_words) & (n_words <= max_words)
                & (mean_wl >= min_mean_word_len)
                & (mean_wl <= max_mean_word_len)
                & (sym_ratio <= max_symbol_ratio)
                & (bullet_frac <= max_bullet_frac)
                & (ellip_frac <= max_ellipsis_frac)
                & (alpha_frac >= min_alpha_frac)
                & (n_stop >= min_stopwords))
        cols = {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words.astype(np.int64)),
            "mean_word_len": pa.array(mean_wl, type=pa.float64()),
            "symbol_ratio": pa.array(sym_ratio, type=pa.float64()),
            "bullet_frac": pa.array(bullet_frac, type=pa.float64()),
            "ellipsis_frac": pa.array(ellip_frac, type=pa.float64()),
            "alpha_frac": pa.array(alpha_frac, type=pa.float64()),
            "n_stopwords": pa.array(n_stop.astype(np.int64)),
            "keep_gopher": pa.array(keep.astype(np.int64)),
        }
        for c in passthrough:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def group_quality_gate(ds, group_col: str, value_col: str,
                       min_mean: float, *, scale: int = 100):
    """Domain-level quality filtering (the RefinedWeb-style aggregate
    gate): keep rows whose GROUP's mean value clears ``min_mean`` —
    low-quality sources/domains drop wholesale, whatever the individual
    row looks like.  The per-group means come from ``grouped_stats``'s
    exact integer partials (6dp-pinned mean, so the verdict boundary is
    oracle-reproducible); the surviving-group set is bounded
    (domains/sources), broadcast once, and applied in one stateless
    streaming filter — rows move zero times."""
    import numpy as np

    import ray

    from packs_ray.functions.agg import grouped_stats

    stats = grouped_stats(ds.select_columns([group_col, value_col]),
                          group_col, value_col, scale=scale)

    def passing(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(
            batch.column("mean"), min_mean)).select([group_col])

    blocks = [b.column(group_col).to_numpy(zero_copy_only=False)
              for b in ray.get(stats.map_batches(
                  passing, batch_format="pyarrow").to_arrow_refs())
              if len(b)]
    keep = np.sort(np.concatenate(blocks)) if blocks \
        else np.empty(0, dtype=object)
    ref = ray.put(keep)

    def keep_rows(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        if ks.size == 0:
            return batch.slice(0, 0)
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, g), 0, ks.size - 1)
        return batch.filter(pa.array(ks[pos] == g))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


# fixed unescape order (amp LAST, per the HTML spec's double-escaping
# convention: '&amp;lt;' must decode to the literal '&lt;', not '<')
_HTML_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                  ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def strip_html(ds, html_col: str, *, id_cols: list[str] | None = None,
               out_col: str = "text_extracted"):
    """HTML → text extraction (the step before every web-corpus quality
    filter; C4/Raffel et al. 2020 §2.2 start from WET text — this is the
    WARC→text half for pipelines that ingest raw HTML).

    Pinned, SQL-expressible semantics so a DuckDB twin verifies it
    hash-exact (both engines run RE2, so the patterns behave
    byte-identically):

    1. drop ``<script…>…</script>`` and ``<style…>…</style>`` blocks
       (non-greedy, case-insensitive, dot-matches-newline),
    2. every remaining tag ``<[^>]*>`` → one space (block tags must
       separate words, so a space — never ''),
    3. unescape the fixed entity list ``_HTML_ENTITIES`` in order
       (``&amp;`` last),
    4. collapse ASCII-whitespace runs to one space and trim.

    Stateless vectorized ``map_batches`` — no shuffle, nulls propagate.
    Comments/CDATA fall out of rule 2 per-tag (a multi-line comment's
    interior text survives — documented limit of the tag-level grammar;
    real-world extraction quality beyond this needs a DOM parser, which
    this container does not ship).
    """
    keep = id_cols

    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column(html_col)
        s = pc.replace_substring_regex(
            s, r"(?is)<script[^>]*>.*?</script>", " ")
        s = pc.replace_substring_regex(
            s, r"(?is)<style[^>]*>.*?</style>", " ")
        s = pc.replace_substring_regex(s, r"(?s)<[^>]*>", " ")
        for ent, rep in _HTML_ENTITIES:
            s = pc.replace_substring(s, ent, rep)
        s = pc.replace_substring_regex(s, r"[ \t\n\r\f\v]+", " ")
        s = pc.utf8_trim(s, " ")
        cols = {c: batch.column(c) for c in
                (keep if keep is not None else
                 [c for c in batch.column_names if c != html_col])}
        cols[out_col] = s
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def encoding_anomalies(ds, id_col: str, text_col: str):
    """Mojibake / encoding-damage detector: per document, counts of
    (a) U+FFFD replacement characters (a decoder already gave up),
    (b) C1 control codepoints U+0080-U+009F (cp1252 bytes decoded as
    latin-1 -- never legitimate in text), and (c) the classic
    UTF-8-read-as-latin-1 digraph artifacts ('A-tilde', 'A-circumflex',
    'a-circumflex + euro' -- the lead bytes of 2/3-byte UTF-8 sequences
    misdecoded).  ``suspect`` flags any hit; a web pipeline re-decodes
    or drops those docs (CCNet/Wenzek et al. 2020 discard undecodable
    content the same way).

    One stateless vectorized pass (Arrow count_substring +
    count_substring_regex -- both engines run RE2, so the C1-class
    count is twin-exact in DuckDB via length-difference arithmetic).
    Reference anchor: the packs' nearest signal is the printable-chars
    regex in pattern_validation_pack; it has no encoding audit at all.
    """

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(text_col)))
        s = batch.column(text_col)
        n_repl = pc.count_substring(s, "\ufffd")
        n_c1 = pc.count_substring_regex(s, "[\x80-\x9f]")
        n_moji = pc.add(
            pc.add(pc.count_substring(s, "\u00c3"),
                   pc.count_substring(s, "\u00c2")),
            pc.count_substring(s, "\u00e2\u20ac"))
        bad = pc.add(pc.add(n_repl, n_c1), n_moji)
        return pa.table({
            id_col: batch.column(id_col),
            "n_replacement": pc.cast(n_repl, "int64"),
            "n_c1": pc.cast(n_c1, "int64"),
            "n_mojibake": pc.cast(n_moji, "int64"),
            "suspect": pc.greater(bad, 0)})

    return ds.map_batches(fn, batch_format="pyarrow")


def ngram_novelty(ds, id_col: str, text_col: str, n: int = 3,
                  num_partitions: int | None = None):
    """Per-document corpus-level n-gram commonness: for every doc with
    at least one word n-gram, the fraction of its DISTINCT n-grams that
    also occur in at least one other document — the "how boilerplate is
    this page" score complementing ``repetition_stats`` (within-doc)
    and ``drop_boilerplate`` (group-level exact match).  High
    common_frac = template/mirror content; low = novel text.  Docs too
    short to form a gram (null text included) have no gram evidence and
    emit no row.

    Output: (id_col, n_grams, n_common, common_frac), 6dp-pinned.

    Scale shape: grams never shuffle as strings — each batch emits
    DISTINCT (gram_hash64, doc) marks (~16 B each); the gram-bucketed
    reduce counts document frequency and re-emits ONE
    (doc, n_grams, n_common) partial per (bucket, doc); those bounded
    partials ride a second narrow doc-bucketed sum.  One pass over the
    input, two mark-sized shuffles.  64-bit FNV gram identity: a
    collision merges two grams (odds ~k²/2⁶⁵ corpus-wide) — it can only
    nudge a score, and is the standard trade of this repo's dedup
    family."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.functions.sketches import _fnv1a_str

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        text = str_column(batch, text_col)
        words, lens, doc_idx = _flat_words(text)
        starts = _gram_starts(doc_idx, n)
        idv = ids.to_numpy(zero_copy_only=False)
        if not starts.size:
            return pa.table({"doc": pa.array([], type=ids.type),
                             "h": pa.array([], type=pa.int64())})
        gram = words[starts]
        for k in range(1, n):
            gram = gram + " "
            gram = gram + words[starts + k]
        h, _ = _fnv1a_str(pa.array(gram, type=pa.string()))
        m = pd.DataFrame({"doc": idv[doc_idx[starts]],
                          "h": h.view(np.int64)}).drop_duplicates()
        return _table_from_pandas(m, preserve_index=False)

    gram_marks = ds.select_columns([id_col, text_col]) \
        .map_batches(marks, batch_format="pyarrow")

    def df_reduce(g: pd.DataFrame) -> pd.DataFrame:
        # marks are already globally distinct (one doc = one input row
        # = one batch); df per gram, then per-doc totals in this bucket
        dfreq = g.groupby("h", sort=False)["doc"].transform("size")
        g = g.assign(_c=(dfreq >= 2).to_numpy().astype(np.int64))
        out = (g.groupby("doc", sort=False)
               .agg(n_grams=("_c", "size"), n_common=("_c", "sum"))
               .reset_index())
        for c in ("n_grams", "n_common"):
            out[c] = out[c].astype(np.int64)
        return out

    partials = bucketed_group_reduce(gram_marks, ["h"], df_reduce,
                                     num_partitions)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        from packs_ray.stages.util import round_half_away as _r

        out = (g.groupby("doc", sort=False)[["n_grams", "n_common"]]
               .sum().reset_index())
        out["common_frac"] = _r(
            out["n_common"].to_numpy(np.float64)
            / out["n_grams"].to_numpy(np.float64), 6)
        out = out.rename(columns={"doc": id_col})
        for c in ("n_grams", "n_common"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucketed_group_reduce(partials, ["doc"], final, num_partitions)


def fuzzy_decontam(ds, id_col: str, text_col: str, bench_ids: list,
                   bench_texts: list[str], *, shingle: int = 5,
                   threshold: float = 0.5):
    """Fuzzy benchmark decontamination: per-document MAX character-
    shingle Jaccard against a (small, by definition) benchmark set —
    catches paraphrased / lightly-edited eval leakage the exact n-gram
    screen (``decontaminate``) misses.  Output per doc:
    (id, n_shingles, bench_id of the best match — null when nothing
    intersects, max_jaccard 6dp, contaminated = max >= threshold).
    Ties break to the smallest bench id.  Jaccard is EXACT over
    distinct shingle hash sets (same ``_shingle_hashes`` fold the
    minhash SQL replicas reproduce).

    Scale shape: the bench shingle union is built once on the driver
    (benchmarks are KB-MB scale) and broadcast as ONE sorted uint64
    array + a packed per-shingle membership bitmap; each batch does a
    single searchsorted of all its docs' concatenated shingles, one
    bit-unpack, and one add.reduceat per doc — no shuffle, no pairs,
    text never leaves the worker."""
    import ray

    from packs_ray.functions.neardup import _shingle_hashes
    from packs_ray.stages.util import round_half_away

    order = np.argsort(np.asarray(bench_ids, dtype=np.int64),
                       kind="stable")
    bids = np.asarray(bench_ids, dtype=np.int64)[order]
    bsets = [_shingle_hashes(bench_texts[i], shingle) for i in order]
    B = len(bsets)
    nb = np.array([len(s) for s in bsets], dtype=np.int64)
    if B and sum(map(len, bsets)):
        all_h = np.concatenate(bsets)
        uni = np.unique(all_h)
        nwords = (B + 7) // 8
        mask = np.zeros((len(uni), nwords), dtype=np.uint8)
        for j, s in enumerate(bsets):
            idx = np.searchsorted(uni, s)
            mask[idx, j // 8] |= np.uint8(1 << (j % 8))
    else:
        uni = np.zeros(0, dtype=np.uint64)
        mask = np.zeros((0, max(1, (B + 7) // 8)), dtype=np.uint8)
    ref = ray.put((uni, mask, nb, bids))

    def fn(batch: pa.Table) -> pa.Table:
        u, m, nbv, bv = ray.get(ref)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        hs = [_shingle_hashes(t, shingle) for t in texts]
        lens = np.array([len(h) for h in hs], dtype=np.int64)
        n = len(texts)
        max_j = np.zeros(n, dtype=np.float64)
        best = np.full(n, -1, dtype=np.int64)
        if len(u) and lens.sum():
            cat = np.concatenate([h for h in hs if len(h)]) \
                if lens.sum() else np.zeros(0, dtype=np.uint64)
            doc_of = np.repeat(np.arange(n), lens)
            pos = np.searchsorted(u, cat)
            pos_c = np.minimum(pos, len(u) - 1)
            hit = u[pos_c] == cat
            # per-doc per-bench intersection counts: unpack membership
            # bits of the hit shingles, segment-sum per doc
            bits = np.unpackbits(m[pos_c[hit]], axis=1,
                                 bitorder="little")[:, :B] \
                if hit.any() else np.zeros((0, B), dtype=np.uint8)
            doc_hit = doc_of[hit]
            inter = np.zeros((n, B), dtype=np.int64)
            if len(doc_hit):
                np.add.at(inter, doc_hit, bits.astype(np.int64))
            union = lens[:, None] + nbv[None, :] - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            jac = round_half_away(jac, 6)
            max_j = jac.max(axis=1) if B else max_j
            # argmax with ties to the smallest bench id (bids sorted)
            best = np.where(max_j > 0, jac.argmax(axis=1), -1)
        bench_vals = pa.array(np.where(best >= 0, bv[np.maximum(best, 0)]
                                       if len(bv) else 0, 0),
                              type=pa.int64())
        bench_col = pc.if_else(pa.array(best >= 0), bench_vals,
                               pa.nulls(n, type=pa.int64()))
        return pa.table({
            id_col: batch.column(id_col),
            "n_shingles": pa.array(lens, type=pa.int64()),
            "bench_id": bench_col,
            "max_jaccard": pa.array(max_j, type=pa.float64()),
            "contaminated": pa.array(max_j >= threshold)})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def c4_clean(ds, id_col: str, text_col: str, *,
             min_line_words: int = 3):
    """C4-style per-document line cleaning (Raffel et al. 2020 §2.2,
    the in-doc half; ``dedup_lines`` is the cross-doc half): a line
    survives only if it ends in terminal punctuation (. ! ? \"), has at
    least ``min_line_words`` whitespace-separated words, and does not
    mention 'javascript' (case-insensitive).  A document is flagged
    ``dropped`` when its ORIGINAL text contains 'lorem ipsum'
    (case-insensitive) or a '{' (C4's page-level rules).

    Output: (id_col, text_clean, n_lines, n_kept, dropped) — one row
    per non-null input doc; consumers filter on ``dropped`` / empty
    ``text_clean``.

    Scale: stateless per-batch pandas-str kernel — lines never leave
    their block, nothing shuffles.  Word counting pins the whitespace
    class to [ \\t\\r\\f\\v] (no \\n inside a line) so the SQL replica
    is byte-identical."""
    ws = r"[^ \t\r\f\v]+"

    def fn(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col, text_col]).to_pandas() \
            .dropna(subset=[id_col, text_col])
        txt = df[text_col].astype(object)
        lines = txt.str.split("\n")
        n = lines.str.len().to_numpy(dtype=np.int64) if len(df) else \
            np.array([], dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(df)), n)
        flat = (np.concatenate([np.asarray(v, dtype=object)
                                for v in lines])
                if len(df) else np.array([], dtype=object))
        fl = pd.Series(flat, dtype=object)
        keep = (fl.str.endswith((".", "!", "?", '"')).to_numpy(dtype=bool)
                & (fl.str.count(ws).to_numpy(dtype=np.int64)
                   >= min_line_words)
                & ~fl.str.lower().str.contains("javascript", regex=False)
                .to_numpy(dtype=bool)) if len(fl) else \
            np.zeros(0, dtype=bool)
        n_kept = np.bincount(doc_idx[keep], minlength=len(df)) \
            .astype(np.int64)
        joined = (pd.Series(flat[keep])
                  .groupby(doc_idx[keep]).agg("\n".join)
                  if keep.any() else pd.Series(dtype=object))
        clean = np.full(len(df), "", dtype=object)
        if len(joined):
            clean[joined.index.to_numpy()] = joined.to_numpy()
        low = txt.str.lower()
        dropped = (low.str.contains("lorem ipsum", regex=False)
                   | txt.str.contains("{", regex=False)).to_numpy(
            dtype=bool) if len(df) else np.zeros(0, dtype=bool)
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy()),
            "text_clean": pa.array(clean, type=pa.string()),
            "n_lines": pa.array(n),
            "n_kept": pa.array(n_kept),
            "dropped": pa.array(dropped)})

    return ds.map_batches(fn, batch_format="pyarrow")
