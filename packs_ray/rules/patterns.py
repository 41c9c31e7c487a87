"""Pattern banks: anchored validation patterns, PII search patterns,
null-placeholder list, toxicity keywords.

Semantics follow the reference packs (cited per constant); the regexes are
standard/public formats (email, uuid, ipv4...).  All patterns are Python
``re`` patterns — the engine deliberately applies them with Python ``re``
inside ``map_batches`` (not Arrow/RE2 kernels) so match/scrub behavior is
byte-identical to a pandas implementation (see SURVEY.md §7.4).
"""

from __future__ import annotations

import re

# Anchored format-validation patterns (applied with re.match; the empty
# string counts as VALID — reference quirk, pattern_validation_pack/main.py:49).
# Bank mirrors /root/reference/pattern_validation_pack/main.py:19-35.
BUILTIN_PATTERNS: dict[str, str] = {
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ipv4": r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "ipv6": r"^(?:[0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$|^::(?:[0-9a-fA-F]{1,4}:){0,6}[0-9a-fA-F]{1,4}$",
    "url": r"^https?://[^\s/$.?#].[^\s]*$",
    "phone_international": r"^\+?[1-9]\d{1,14}$",
    "date_iso": r"^\d{4}-\d{2}-\d{2}$",
    "date_us": r"^\d{2}/\d{2}/\d{4}$",
    "date_eu": r"^\d{2}-\d{2}-\d{4}$",
    "datetime_iso": r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}",
    "credit_card": r"^(?:\d[ -]*?){13,16}$",
    "hex_color": r"^#(?:[0-9a-fA-F]{3}){1,2}$",
    "mac_address": r"^([0-9A-Fa-f]{2}[:-]){5}([0-9A-Fa-f]{2})$",
    "postal_code_us": r"^\d{5}(?:-\d{4})?$",
    "alphanumeric": r"^[A-Za-z0-9]+$",
}

# PII search patterns (unanchored, substring search / substitution).
# Bank + application order mirrors
# /root/reference/pii_scanner_pack/pack_conf.json:4-13; order is
# significant for scrubbing (patterns applied sequentially, first listed
# first — SURVEY.md §7.4 hard part 1).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"(?:\+?\d{1,3}[\s-]?)?(?:\(\d{2,4}\)[\s-]?)?\d{3,4}[\s-]?\d{3,4}"),
    ("credit_card", r"(?:\d[ -]*?){13,16}"),
    ("ipv4", r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"),
    ("ipv6", r"(?:[0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}|::(?:[0-9a-fA-F]{1,4}:){0,6}[0-9a-fA-F]{1,4}"),
    ("usa_zipcode", r"\b\d{5}(?:-\d{4})?\b"),
    ("usa_ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("iban", r"[A-Z]{2}\d{2}[A-Z0-9]{4,30}"),
]

#: Replacement token per PII key, e.g. "[EMAIL]".
PII_REPLACEMENTS: dict[str, str] = {key: f"[{key.upper()}]" for key, _ in PII_PATTERNS}

# Cheap vectorized pre-filter: every PII pattern above requires at least one
# of these characters, so a string containing none of them cannot match any
# pattern.  Used to skip the (relatively expensive) Python re.sub pass for
# clean prose rows.  MUST remain a superset of all PII_PATTERNS matches.
PII_PREFILTER_CHARS = r"[0-9@:]"

# Null-placeholder values (compared lowercase); mirrors
# /root/reference/text_validation_pack/main.py:20-33 (31 entries — the
# lowercase set collapses case variants).
NULL_PLACEHOLDERS: list[str] = [
    "null", "NULL", "Null",
    "none", "NONE", "None",
    "n/a", "N/A", "NA", "na",
    "nan", "NaN", "NAN",
    "-", "--", "---",
    ".", "..",
    "undefined", "UNDEFINED",
    "missing", "MISSING",
    "unknown", "UNKNOWN",
    "#N/A", "#NA", "#NULL!",
    "(blank)", "(empty)",
    "<null>", "<NULL>",
]

NULL_PLACEHOLDERS_LOWER: frozenset[str] = frozenset(p.lower() for p in NULL_PLACEHOLDERS)

# Toxicity keyword bank (engine-side config, analogous to the PII bank —
# FIXTURES.md defect class 8).  Deliberately synthetic tokens so fixtures
# and tests stay inoffensive; real deployments swap the list via config.
TOXICITY_KEYWORDS: list[str] = [
    "toxslur1", "toxslur2", "toxthreat1", "toxprofanity1", "toxprofanity2",
]

#: Word-boundary regex matching any toxicity keyword (case-insensitive).
TOXICITY_REGEX: str = r"(?i)\b(?:" + "|".join(re.escape(k) for k in TOXICITY_KEYWORDS) + r")\b"

#: Valid transcript roles (enum semantics per
#: /root/reference/fhir_compliance_pack/main.py:77-79 applied to the
#: transcript ``role`` column).
VALID_ROLES: frozenset[str] = frozenset({"system", "user", "assistant", "tool"})

#: Literal lowercase substrings that mark an assistant turn as a refusal
#: (the SFT-curation screen for refusal-heavy data; contains-semantics
#: like the PII search, /root/reference/pii_scanner_pack/main.py:29-55).
#: Kept literal (no regex) so the engine and the SQL oracle share exact
#: strpos semantics.
REFUSAL_PHRASES: list[str] = [
    "i cannot", "i can't", "i am unable", "i'm unable", "i won't",
    "i'm sorry", "i am sorry", "as an ai", "i apologize",
    "i must decline", "unable to provide", "cannot comply",
]

# prompt-injection / jailbreak markers (RE2-safe, shared verbatim with
# the DuckDB oracle's regexp_matches; (?i) per-alternative engine-wide)
INJECTION_REGEX: str = (
    r"(?i)(ignore (all |your |the )?(previous|prior|above) "
    r"(instructions|prompts?)"
    r"|disregard (all |your )?(previous|prior) instructions"
    r"|reveal (your |the )?(system )?prompt"
    r"|jailbreak"
    r"|do anything now"
    r"|DAN mode"
    r"|override (safety|your) (rules|guidelines))"
)
