"""Pipeline configuration.

One dataclass holds every rule threshold so the Ray stages, the pandas
oracle and the tests share a single source of truth (mirrors the
reference's ``pack_conf.json`` ``job.*`` parameter surface, e.g.
/root/reference/text_validation_pack — job.rules min_length/max_length;
/root/reference/outlier_detection_pack/pack_conf.json — thresholds).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from packs_ray.rules.patterns import (
    PII_PATTERNS,
    PII_REPLACEMENTS,
    TOXICITY_KEYWORDS,
    VALID_ROLES,
)


@dataclass(frozen=True)
class FilterConfig:
    """Thresholds for the per-turn quality-filter rules.

    Defaults are the engine's reference configuration; every test and the
    oracle use the same instance, so keep/drop parity is by construction.
    """

    # text_validation semantics (reference text_validation_pack/main.py:74-99)
    min_length: int = 2
    max_length: int = 8192
    # repetition: drop if the most frequent token accounts for more than
    # this fraction of tokens (only evaluated when >= min_tokens_for_ratio)
    max_repetition_ratio: float = 0.5
    # symbol spam: drop if non-alphanumeric-non-space chars / total chars
    # exceeds this fraction
    max_symbol_ratio: float = 0.5
    min_tokens_for_ratio: int = 8

    # language filter (langid stage): keep only these languages
    keep_languages: tuple[str, ...] = ("en",)
    # minimum langid margin (winner score - runner-up score) to trust the
    # prediction; below it the turn is kept (fail-open)
    langid_min_margin: float = 0.0

    # perplexity filter: drop if bits-per-char above threshold
    max_bits_per_char: float = 6.0

    # role enum (fhir_compliance enum semantics)
    valid_roles: frozenset[str] = field(default_factory=lambda: frozenset(VALID_ROLES))

    # PII scrub bank: (key, regex) applied in order with re.sub
    pii_patterns: tuple[tuple[str, str], ...] = tuple(PII_PATTERNS)
    pii_replacements: tuple[tuple[str, str], ...] = tuple(PII_REPLACEMENTS.items())

    # toxicity keyword filter
    toxicity_keywords: tuple[str, ...] = tuple(TOXICITY_KEYWORDS)

    # conversation-level
    dedup_exact: bool = True  # exact (role, text) dedup, keep first occurrence
    # skew salting: conversations longer than this are split into
    # turn_idx // salt_segment_size segments for the conversation shuffle
    salt_segment_size: int = 8192


#: Stable rule order; bit i of the ``rule_bits`` column = rule i fired.
RULE_NAMES: tuple[str, ...] = (
    "null_text",            # text is null                        (completeness)
    "empty_text",           # text == ""                          (text_validation :86)
    "whitespace_text",      # strip(text)=="" and text!=""        (text_validation :87)
    "null_placeholder",     # lower(text) in placeholder list     (text_validation :90)
    "too_short",            # len(text) < min_length              (text_validation :78)
    "too_long",             # len(text) > max_length              (text_validation :80)
    "invalid_role",         # role not in enum / null             (fhir enum :77-79)
    "negative_turn_idx",    # turn_idx < 0 or null                (numeric_validation)
    "null_ts",              # ts is null                          (completeness)
    "repetition",           # top-token ratio > threshold         (word-count primitives)
    "symbol_spam",          # symbol ratio > threshold
    "toxicity",             # toxicity keyword present
    "non_target_lang",      # langid says not in keep_languages   (langid stage)
    "high_perplexity",      # bits/char above threshold           (perplexity stage)
    "tool_without_assistant",  # tool turn not preceded by assistant/tool (conversation stage)
    "exact_duplicate",      # non-first (role, text) occurrence   (duplicates semantics)
)

RULE_BIT: dict[str, int] = {name: 1 << i for i, name in enumerate(RULE_NAMES)}

DEFAULT_CONFIG = FilterConfig()
