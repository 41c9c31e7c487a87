"""PII scrub stage (Python-``re`` semantics, byte-parity critical).

The reference detects PII with pandas ``str.contains`` over Python-``re``
patterns (pii_scanner_pack/main.py:29-55); our engine *scrubs* with the
same bank via ``re.sub``, applied in config order (order is significant
for overlapping patterns — SURVEY.md §7.4).  Python ``re`` is mandatory:
the bank contains lazy quantifiers ((?:\\d[ -]*?){13,16}) whose semantics
differ under RE2, so Arrow's replace kernels cannot be used.

Scale design: a vectorized Arrow pre-filter (rows containing [0-9@:]; a
strict superset of every pattern's matches) selects candidate rows, and
the Python loop runs only over those; clean prose passes through
zero-copy.  Patterns are compiled once per worker via a module-level
cache (stateless task; no actor needed).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.config import DEFAULT_CONFIG, FilterConfig
from packs_ray.rules.patterns import PII_PREFILTER_CHARS
from packs_ray.stages.util import str_column

_COMPILED_CACHE: dict[tuple, list] = {}


def _compiled_bank(cfg: FilterConfig) -> list[tuple[str, re.Pattern, str]]:
    key = cfg.pii_patterns
    bank = _COMPILED_CACHE.get(key)
    if bank is None:
        repl = dict(cfg.pii_replacements)
        bank = [(k, re.compile(p), repl[k]) for k, p in cfg.pii_patterns]
        _COMPILED_CACHE[key] = bank
    return bank


def scrub_strings(values: np.ndarray, cfg: FilterConfig) -> tuple[np.ndarray, np.ndarray]:
    """Scrub an object array of strings; returns (scrubbed, pii_bits)."""
    bank = _compiled_bank(cfg)
    out = values.copy()
    bits = np.zeros(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        if v is None:
            continue
        b = 0
        for j, (_key, pat, repl) in enumerate(bank):
            v2, nsub = pat.subn(repl, v)
            if nsub:
                b |= 1 << j
                v = v2
        if b:
            out[i] = v
            bits[i] = b
    return out, bits


def make_scrub_fn(cfg: FilterConfig = DEFAULT_CONFIG):
    """Batch fn: adds ``text_scrubbed`` (string) + ``pii_bits`` (int64)."""
    prefilter = PII_PREFILTER_CHARS

    def scrub(batch: pa.Table) -> pa.Table:
        text = str_column(batch, "text")
        candidate = pc.match_substring_regex(text, prefilter).fill_null(False)
        cand_np = candidate.to_numpy(zero_copy_only=False)
        if "keep" in batch.column_names:
            # scrub only surviving rows; dropped rows get null text_scrubbed
            keep_np = batch.column("keep").combine_chunks().fill_null(False).to_numpy(
                zero_copy_only=False)
            cand_np = cand_np & keep_np
            base = pc.if_else(batch.column("keep").combine_chunks(), text,
                              pa.scalar(None, type=pa.string()))
            if isinstance(base, pa.ChunkedArray):
                base = base.combine_chunks()
        else:
            base = text
        bits = np.zeros(batch.num_rows, dtype=np.int64)
        scrubbed = base
        if cand_np.any():
            idx = np.flatnonzero(cand_np)
            vals = text.take(pa.array(idx)).to_numpy(zero_copy_only=False)
            scrubbed_vals, sub_bits = scrub_strings(vals.astype(object), cfg)
            changed = sub_bits != 0
            bits[idx] = sub_bits
            if changed.any():
                # replace only mutated rows; untouched rows stay zero-copy
                full = base.to_numpy(zero_copy_only=False).astype(object)
                full[idx[changed]] = scrubbed_vals[changed]
                scrubbed = pa.array(full, type=pa.string())
        batch = batch.append_column("text_scrubbed", scrubbed)
        return batch.append_column("pii_bits", pa.array(bits, type=pa.int64()))

    return scrub
