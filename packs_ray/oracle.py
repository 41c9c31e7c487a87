"""Straight-pandas oracle: reference-semantics keep/drop + scrub labels.

An INDEPENDENT re-implementation of the per-turn rules using pandas string
methods and plain Python loops — deliberately written the way the
reference packs compute (pandas Series ops, per-value ``re`` application:
text_validation_pack/main.py:66-99, pii_scanner_pack/main.py:29-55,
pattern_validation_pack/main.py:38-56, fhir_compliance_pack/main.py:67-98,
duplicates_finder_pack/main.py:54-57) — so the vectorized Arrow engine is
tested against a different code path with the same semantics.

The langid / perplexity models are shared artifacts (packs_ray.models),
like the pattern banks: the oracle applies their scores through its own
rule logic.

Produces, per input row (original order preserved):
    keep:bool, drop_reasons:list[str] (RULE_NAMES order), text_scrubbed
    (scrubbed for kept rows, None for dropped).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.config import DEFAULT_CONFIG, RULE_NAMES, FilterConfig
from packs_ray.models import LangIdModel, PerplexityModel
from packs_ray.rules.patterns import NULL_PLACEHOLDERS_LOWER, TOXICITY_KEYWORDS


def oracle_labels(df: pd.DataFrame, cfg: FilterConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Return df + keep/drop_reasons/text_scrubbed/lang/bits_per_byte."""
    df = df.reset_index(drop=True).copy()
    n = len(df)
    reasons: list[set[str]] = [set() for _ in range(n)]

    text = df["text"]
    is_null = text.isna()
    for i in np.flatnonzero(is_null):
        reasons[i].add("null_text")

    s = text.fillna("")
    lengths = s.str.len()
    stripped = s.str.strip()

    for i in np.flatnonzero((s == "") & ~is_null):
        reasons[i].add("empty_text")
    for i in np.flatnonzero((stripped == "") & (s != "") & ~is_null):
        reasons[i].add("whitespace_text")
    for i in np.flatnonzero(s.str.lower().isin(list(NULL_PLACEHOLDERS_LOWER)) & ~is_null):
        reasons[i].add("null_placeholder")
    for i in np.flatnonzero((lengths < cfg.min_length) & ~is_null):
        reasons[i].add("too_short")
    for i in np.flatnonzero((lengths > cfg.max_length) & ~is_null):
        reasons[i].add("too_long")

    if "role" in df:
        bad_role = ~df["role"].isin(sorted(cfg.valid_roles)) | df["role"].isna()
        for i in np.flatnonzero(bad_role):
            reasons[i].add("invalid_role")
    if "turn_idx" in df:
        ti = df["turn_idx"]
        for i in np.flatnonzero(ti.isna() | (ti < 0)):
            reasons[i].add("negative_turn_idx")
    if "ts" in df:
        for i in np.flatnonzero(df["ts"].isna()):
            reasons[i].add("null_ts")

    # ratio rules — per-row Python, reference style.  Token/symbol
    # character classes are spelled out in ASCII to mirror RE2 semantics
    # (RE2 \s = [\t\n\f\r ]; Python \s would also match unicode
    # spaces and \v, diverging from the engine's Arrow kernels).
    tok_lists = s.apply(lambda v: re.findall(r"[^ \t\n\f\r]+", v))
    for i in range(n):
        if is_null.iloc[i]:
            continue
        toks = tok_lists.iloc[i]
        ntok = len(toks)
        if ntok >= cfg.min_tokens_for_ratio:
            top = Counter(toks).most_common(1)[0][1]
            if top / ntok > cfg.max_repetition_ratio:
                reasons[i].add("repetition")
        v = s.iloc[i]
        if len(v) > 0:
            nsym = len(re.findall(r"[^A-Za-z0-9\t\n\f\r ]", v))
            if nsym / len(v) > cfg.max_symbol_ratio:
                reasons[i].add("symbol_spam")

    # ASCII word boundaries via lookarounds == RE2 \b (Python \b is
    # unicode-aware)
    tox_re = re.compile(r"(?<![A-Za-z0-9_])(?:"
                        + "|".join(map(re.escape, cfg.toxicity_keywords))
                        + r")(?![A-Za-z0-9_])", re.IGNORECASE)
    for i in np.flatnonzero(s.apply(lambda v: bool(tox_re.search(v)))):
        reasons[i].add("toxicity")

    # model rules (shared artifacts)
    arrow_text = pa.array(text.astype(object), type=pa.string())
    pred, margin = LangIdModel().predict_batch(arrow_text)
    keepset = set(cfg.keep_languages) | {"und"}
    for i in range(n):
        if pred[i] not in keepset and margin[i] > cfg.langid_min_margin:
            reasons[i].add("non_target_lang")
    bpb = PerplexityModel().bits_per_byte(arrow_text)
    for i in np.flatnonzero(bpb > cfg.max_bits_per_char):
        reasons[i].add("high_perplexity")

    # conversation rule: per conversation, stable turn_idx sort; tool turn
    # valid iff previous turn's role in {assistant, tool}; fail-open at the
    # head of a non-initial salt segment (engine's documented semantics)
    K = cfg.salt_segment_size
    for _conv, g in df.groupby("conv_id", sort=False):
        gs = g.sort_values("turn_idx", kind="stable")
        prev_role: str | None = None
        prev_seg: int | None = None
        for i, row in zip(gs.index, gs.itertuples()):
            seg = max(int(row.turn_idx) if pd.notna(row.turn_idx) else 0, 0) // K
            if row.role == "tool":
                seg_head = prev_seg is None or seg != prev_seg
                if seg_head and seg > 0:
                    pass  # fail-open at a non-initial salt-segment head
                elif prev_role not in ("assistant", "tool"):
                    reasons[i].add("tool_without_assistant")
            prev_role = row.role
            prev_seg = seg

    # exact duplicates: global (role, text) keep-first by (conv_id, turn_idx)
    if cfg.dedup_exact:
        order = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        dup = order.duplicated(subset=["role", "text"], keep="first")
        dup &= order["text"].notna()
        for i in order.index[dup]:
            reasons[i].add("exact_duplicate")

    drop_reasons = [[name for name in RULE_NAMES if name in r] for r in reasons]
    keep = np.array([len(r) == 0 for r in reasons], dtype=bool)

    # scrub kept rows (reference bank, config order, Python re.sub)
    bank = [(k, re.compile(p)) for k, p in cfg.pii_patterns]
    repl = dict(cfg.pii_replacements)
    scrubbed: list[str | None] = [None] * n
    for i in range(n):
        if not keep[i]:
            continue
        v = text.iloc[i]
        for key, pat in bank:
            v = pat.sub(repl[key], v)
        scrubbed[i] = v

    out = df.copy()
    out["lang"] = pred
    out["bits_per_byte"] = np.round(bpb, 4)
    out["keep"] = keep
    out["drop_reasons"] = drop_reasons
    out["text_scrubbed"] = scrubbed
    return out
