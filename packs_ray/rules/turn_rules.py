"""Vectorized per-turn heuristic rules (the stateless hot path).

Re-expresses the reference packs' per-value checks as Arrow/numpy kernels
over a batch (reference semantics cited per rule in config.RULE_NAMES):

- completeness / empty / whitespace / placeholder / length bounds —
  text_validation_pack/main.py:66-99
- role enum — fhir_compliance_pack/main.py:77-79 enum semantics
- numeric range on turn_idx — numeric_validation_pack/main.py:44-60
- repetition / symbol ratios — built from the word/length primitives
  (text_validation_pack/main.py:97-99) as training-data quality rules

Everything here is a pyarrow.compute / numpy kernel; there is no Python
loop over rows.  The repetition ratio (max token frequency / token count)
uses a hash-explode trick: tokens are flattened once per batch, hashed,
combined with their row id, and counted with one ``np.unique`` — O(n log n)
in total token count, no per-row Counter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.config import RULE_BIT, FilterConfig
from packs_ray.rules.patterns import NULL_PLACEHOLDERS_LOWER, TOXICITY_REGEX

_PLACEHOLDER_SET = pa.array(sorted(NULL_PLACEHOLDERS_LOWER), type=pa.string())
# symbol = not ASCII-alphanumeric, not whitespace.  Identical semantics in
# RE2 (pyarrow) and Python re, so engine and oracle agree byte-for-byte.
_SYMBOL_RE = r"[^A-Za-z0-9\s]"
_TOKEN_RE = r"\S+"


def _np_bool(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow boolean (possibly with nulls) → numpy bool, null=False."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.fill_null(False).to_numpy(zero_copy_only=False)


def max_token_run(text: pa.Array, n_tokens: np.ndarray) -> np.ndarray:
    """Max frequency of any single whitespace token per row, vectorized.

    Explodes tokens once for the whole batch, hashes them, and counts
    (row, token_hash) pairs with a single sort — no per-row Python.
    """
    out = np.zeros(len(text), dtype=np.int64)
    has = n_tokens > 0
    if not has.any():
        return out
    # RE2 \s+ split (ASCII whitespace) so the token SPLIT agrees exactly
    # with the RE2 \S+ token COUNT — utf8_split_whitespace would split on
    # unicode spaces the count doesn't, skewing the repetition ratio
    tokens = pc.split_pattern_regex(text, r"\s+")
    lens = pc.list_value_length(tokens).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(tokens)
    row_ids = np.repeat(np.arange(len(text), dtype=np.int64), lens.astype(np.int64))
    # Arrow's split emits empty strings at string edges ("" → [""]); drop
    # them so counts match the \S+ token definition
    nonempty = _np_bool(pc.not_equal(flat, ""))
    flat = flat.filter(pa.array(nonempty))
    row_ids = row_ids[nonempty]
    if len(flat) == 0:
        return out
    h = pd.util.hash_array(flat.to_numpy(zero_copy_only=False).astype(object))
    # combine row and token-hash into one sortable key; row in high bits
    key = (row_ids.astype(np.uint64) << np.uint64(44)) ^ (h >> np.uint64(20))
    uniq, counts = np.unique(key, return_counts=True)
    rows_of_uniq = (uniq >> np.uint64(44)).astype(np.int64)
    # max count per row: counts are grouped by row (keys sorted, row in MSBs)
    df_max = np.zeros(len(text), dtype=np.int64)
    np.maximum.at(df_max, rows_of_uniq, counts)
    return df_max


def evaluate_turn_rules(batch: pa.Table, cfg: FilterConfig) -> np.ndarray:
    """Return an int64 rule-bit vector for each row of the batch.

    Only the stateless rules (no model, no cross-row state) are set here;
    langid / perplexity / conversation / dedup stages OR in their own bits.
    """
    from packs_ray.stages.util import str_column
    n = batch.num_rows
    bits = np.zeros(n, dtype=np.int64)
    text = str_column(batch, "text")

    null_text = _np_bool(pc.is_null(text))
    bits |= null_text * RULE_BIT["null_text"]

    # length primitives (null-safe: kernels propagate null, _np_bool→False)
    length = pc.utf8_length(text)
    trimmed = pc.utf8_trim_whitespace(text)

    empty = _np_bool(pc.equal(text, ""))
    bits |= empty * RULE_BIT["empty_text"]

    ws_only = _np_bool(pc.equal(trimmed, "")) & ~empty & ~null_text
    bits |= ws_only * RULE_BIT["whitespace_text"]

    placeholder = _np_bool(pc.is_in(pc.utf8_lower(text), value_set=_PLACEHOLDER_SET))
    bits |= placeholder * RULE_BIT["null_placeholder"]

    too_short = _np_bool(pc.less(length, cfg.min_length)) & ~null_text
    bits |= too_short * RULE_BIT["too_short"]
    too_long = _np_bool(pc.greater(length, cfg.max_length))
    bits |= too_long * RULE_BIT["too_long"]

    if "role" in batch.column_names:
        role = batch.column("role")
        valid_roles = pa.array(sorted(cfg.valid_roles), type=pa.string())
        role_ok = _np_bool(pc.is_in(role, value_set=valid_roles))
        bits |= (~role_ok) * RULE_BIT["invalid_role"]

    if "turn_idx" in batch.column_names:
        ti = batch.column("turn_idx")
        ti_bad = _np_bool(pc.less(ti, 0)) | _np_bool(pc.is_null(ti))
        bits |= ti_bad * RULE_BIT["negative_turn_idx"]

    if "ts" in batch.column_names:
        bits |= _np_bool(pc.is_null(batch.column("ts"))) * RULE_BIT["null_ts"]

    # ---- ratio rules (token / symbol), evaluated on non-null text only
    n_tokens = pc.count_substring_regex(text, _TOKEN_RE).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    eligible = n_tokens >= cfg.min_tokens_for_ratio

    if eligible.any():
        max_run = max_token_run(text, n_tokens)
        rep_ratio = np.divide(max_run, n_tokens, out=np.zeros(len(max_run)),
                              where=n_tokens > 0)
        bits |= (eligible & (rep_ratio > cfg.max_repetition_ratio)) * RULE_BIT["repetition"]

    n_chars = length.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    n_sym = pc.count_substring_regex(text, _SYMBOL_RE).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sym_ratio = np.divide(n_sym, n_chars, out=np.zeros(len(n_sym)), where=n_chars > 0)
    bits |= ((n_chars > 0) & (sym_ratio > cfg.max_symbol_ratio)) * RULE_BIT["symbol_spam"]

    # ---- toxicity keywords (word-boundary, case-insensitive; RE2 ≡ re here)
    tox = _np_bool(pc.match_substring_regex(text, TOXICITY_REGEX))
    bits |= tox * RULE_BIT["toxicity"]

    return bits
