"""Deterministic synthetic transcript generator (seeded, vectorized).

Produces the authoritative input table from ``BASELINE.json.input_hint``:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

with planted defects per FIXTURES.md §A (null/empty/placeholder text,
length violations, repetition, symbol spam, PII, toxicity keywords,
non-English text, invalid roles, broken turn_idx, null/out-of-order ts,
exact duplicates, mega-conversations for skew).  A hidden ``defect``
column carries the planted class for label bookkeeping; it is dropped
when writing pipeline input unless ``include_labels=True``.

Generation is numpy-vectorized; ~1M turns/sec single-core, so bench-scale
inputs are generated on the fly and cached as parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from packs_ray.rules.patterns import NULL_PLACEHOLDERS

# ---------------------------------------------------------------- word pools
_EN_WORDS = (
    "the quick brown fox jumps over a lazy dog while many people watch and "
    "wonder about the state of things in this small town where every day "
    "brings new stories of work life food music weather travel books ideas "
    "plans friends family numbers letters colors shapes houses rivers hills "
    "roads lights sounds voices questions answers reasons seasons moments"
).split()

_FR_WORDS = (
    "le la les un une des et dans pour avec sur est sont nous vous ils elles "
    "bonjour merci toujours jamais peut faire voir dire aller venir grand "
    "petit beaucoup tres bien mais alors donc chez entre sans sous apres"
).split()

_DE_WORDS = (
    "der die das ein eine und ist sind nicht mit auf für von haben werden "
    "können müssen machen sehen sagen gehen kommen groß klein sehr gut aber "
    "auch noch schon über unter zwischen ohne nach immer wieder heute morgen"
).split()

_CJK_CHARS = "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之过家学对可她里后小么心"

_PII_SNIPPETS = [
    "you can reach me at john.doe@example.com any time",
    "call my office at +1 555-123-4567 tomorrow",
    "my card number is 4111 1111 1111 1111 ok",
    "the server lives at 192.168.10.25 in the rack",
    "ipv6 endpoint 2001:0db8:85a3:0000:0000:8a2e:0370:7334 works",
    "ship it to zip 12345-6789 before friday",
    "my ssn is 123-45-6789 keep it safe",
    "wire funds to DE89370400440532013000 by monday",
]

_TOX_SNIPPETS = [
    "that guy is a total toxslur1 honestly",
    "stop being such a toxprofanity1 about it",
    "i will toxthreat1 you if this happens again",
]

# refusal openers planted on ~4% of clean assistant turns (NOT a defect
# class: refusals are kept by the filter; they exist so the refusal
# screen has real positives to find). Each contains >=1 of
# packs_ray.rules.patterns.REFUSAL_PHRASES.
_REFUSAL_SNIPPETS = [
    "i cannot help with that request",
    "i'm sorry but that is not something i can do",
    "i am unable to provide that information",
    "i won't be able to do that",
    "as an ai i cannot comply with this",
    "i apologize but i must decline",
]

DEFECT_CLASSES = (
    "clean",            # 0
    "null_text",        # 1
    "empty_text",       # 2
    "whitespace_text",  # 3
    "null_placeholder", # 4
    "too_short",        # 5
    "too_long",         # 6
    "padded",           # 7  leading/trailing whitespace (not a drop)
    "repetition",       # 8
    "symbol_spam",      # 9
    "pii",              # 10 (kept but scrubbed)
    "toxicity",         # 11
    "non_english",      # 12
    "invalid_role",     # 13
    "negative_turn_idx",# 14
    "null_ts",          # 15
    "ooo_ts",           # 16 out-of-order ts (not a drop)
    "duplicate",        # 17 exact copy of another (role, text)
)

_DEFECT_P = np.array(
    [0.80] + [0.2 / 17.0] * 17
)


def _b26(ids: np.ndarray, width: int = 6) -> np.ndarray:
    """Vectorized letters-only (a-z) encoding of int ids — digit-free row
    uniqueness suffixes (digits would trip the PII phone/zip patterns)."""
    out = np.full(ids.shape, "", dtype=f"U{width}")
    rem = ids.astype(np.int64).copy()
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for _ in range(width):
        out = np.char.add(letters[rem % 26], out)
        rem //= 26
    return out


def _sentence_pool(rng: np.random.Generator, n: int, words: list[str],
                   lo: int = 6, hi: int = 18) -> np.ndarray:
    lens = rng.integers(lo, hi, size=n)
    pool = np.empty(n, dtype=object)
    w = np.array(words)
    for i in range(n):
        pool[i] = " ".join(w[rng.integers(0, len(w), size=lens[i])])
    return pool


def generate_transcripts(
    n_turns: int = 5_000,
    seed: int = 42,
    mega_every: int = 100_000,
    mega_size: int = 20_000,
    include_labels: bool = True,
) -> pa.Table:
    """Generate ``~n_turns`` transcript turns (exact count varies with the
    zipf-ish conversation-size draw, then is trimmed to ``n_turns``)."""
    rng = np.random.default_rng(seed)

    # -- conversation sizes: zipf-ish, clipped; plus planted mega-convs (skew)
    avg = 12.0
    n_convs = max(1, int(n_turns / avg))
    sizes = np.clip(rng.zipf(1.7, size=n_convs), 2, 120).astype(np.int64)
    n_mega = n_convs // mega_every
    if n_mega:
        mega_ids = rng.choice(n_convs, size=n_mega, replace=False)
        sizes[mega_ids] = mega_size
    total = int(sizes.sum())
    while total < n_turns:  # top up to requested size
        extra = np.clip(rng.zipf(1.7, size=n_convs // 4 + 1), 2, 120).astype(np.int64)
        sizes = np.concatenate([sizes, extra])
        total = int(sizes.sum())
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    conv_ord = np.repeat(np.arange(len(sizes)), sizes)
    turn_idx = (np.arange(total) - np.repeat(starts, sizes)).astype(np.int64)

    # conv ids: shuffled mapping so lexicographic conv_id order != generation order
    perm = rng.permutation(len(sizes))
    conv_codes = _b26(perm, width=7)
    conv_id = np.array([f"conv_{c}" for c in conv_codes], dtype=object)[conv_ord]

    # -- roles: system first, then user/assistant alternating; tool turns where
    # the previous turn is an assistant (valid tool placement)
    role = np.where(turn_idx == 0, "system",
                    np.where(turn_idx % 2 == 1, "user", "assistant")).astype(object)
    # even idx >= 2 is assistant; make idx%10==3 (odd → previous is assistant) a tool turn
    tool_mask = (turn_idx % 10 == 3) & (turn_idx > 1)
    role[tool_mask] = "tool"

    # -- clean text: pooled sentence + unique letters suffix
    pool = _sentence_pool(rng, 512, _EN_WORDS)
    suffix = _b26(rng.permutation(total))
    pool_sel = pool[rng.integers(0, len(pool), size=total)]
    text = np.array([f"{p} {s}" for p, s in zip(pool_sel, suffix)], dtype=object)

    # -- timestamps: per-conv base + ~20-40s per turn
    base = np.datetime64("2026-01-01T00:00:00", "us")
    conv_base = rng.integers(0, 180 * 86_400, size=len(sizes))  # seconds over ~6 months
    step = rng.integers(20, 40, size=total).cumsum()
    step -= np.repeat(step[starts] - 20, sizes)  # restart the cumsum per conv
    ts = base + ((np.repeat(conv_base, sizes) + step) * 1_000_000).astype("timedelta64[us]")
    ts = ts.astype("datetime64[us]").astype(object)

    # -- defect assignment
    defect_idx = rng.choice(len(DEFECT_CLASSES), size=total, p=_DEFECT_P)
    defect = np.array(DEFECT_CLASSES, dtype=object)[defect_idx]

    def idx_of(name: str) -> np.ndarray:
        return np.flatnonzero(defect == name)

    text[idx_of("null_text")] = None
    text[idx_of("empty_text")] = ""
    ws = idx_of("whitespace_text")
    text[ws] = np.array(["   ", " \t ", "\n\n", "  \n"], dtype=object)[
        rng.integers(0, 4, size=len(ws))]
    ph = idx_of("null_placeholder")
    text[ph] = np.array(NULL_PLACEHOLDERS, dtype=object)[
        rng.integers(0, len(NULL_PLACEHOLDERS), size=len(ph))]
    sh = idx_of("too_short")
    text[sh] = np.array(list("xyzqk"), dtype=object)[rng.integers(0, 5, size=len(sh))]
    _long = "longword " * 1200  # > 8192 chars
    for i in idx_of("too_long"):
        text[i] = _long + suffix[i]
    for i in idx_of("padded"):
        text[i] = "  " + str(text[i]) + "  "
    _rep = "spam " * 24
    for i in idx_of("repetition"):
        text[i] = _rep + suffix[i]
    for i in idx_of("symbol_spam"):
        text[i] = "$#@! %^&* ()_+ <<<>>> !!! ??? ~~~ " + suffix[i]
    pii = idx_of("pii")
    text[pii] = np.array(
        [f"{_PII_SNIPPETS[int(k) % len(_PII_SNIPPETS)]} {suffix[i]}"
         for k, i in zip(rng.integers(0, 8, size=len(pii)), pii)],
        dtype=object) if len(pii) else text[pii]
    tox = idx_of("toxicity")
    text[tox] = np.array(
        [f"{_TOX_SNIPPETS[int(k) % len(_TOX_SNIPPETS)]} {suffix[i]}"
         for k, i in zip(rng.integers(0, 3, size=len(tox)), tox)],
        dtype=object) if len(tox) else text[tox]
    ne = idx_of("non_english")
    if len(ne):
        fr_pool = _sentence_pool(rng, 64, _FR_WORDS)
        de_pool = _sentence_pool(rng, 64, _DE_WORDS)
        cjk = np.array(list(_CJK_CHARS))
        which = rng.integers(0, 3, size=len(ne))
        vals = np.empty(len(ne), dtype=object)
        vals[which == 0] = fr_pool[rng.integers(0, 64, size=int((which == 0).sum()))]
        vals[which == 1] = de_pool[rng.integers(0, 64, size=int((which == 1).sum()))]
        for j in np.flatnonzero(which == 2):
            vals[j] = "".join(cjk[rng.integers(0, len(cjk), size=20)])
        text[ne] = vals
    ir = idx_of("invalid_role")
    role[ir] = np.array(["bot", "", "operator", None], dtype=object)[
        rng.integers(0, 4, size=len(ir))]
    turn_idx[idx_of("negative_turn_idx")] = -1
    ts[idx_of("null_ts")] = None
    ooo = idx_of("ooo_ts")
    ts[ooo[ooo > 0]] = base  # far before its conversation's window

    # plant refusal openers on ~4% of clean assistant turns (before the
    # duplicate copy so dup pairs stay exact)
    ref_cand = np.flatnonzero((defect == "clean")
                              & (np.asarray(role, dtype=object) == "assistant"))
    ref_sel = ref_cand[rng.random(len(ref_cand)) < 0.04]
    for k, i in zip(rng.integers(0, len(_REFUSAL_SNIPPETS),
                                 size=len(ref_sel)), ref_sel):
        text[i] = f"{_REFUSAL_SNIPPETS[int(k)]} {text[i]}"

    dup = idx_of("duplicate")
    clean = idx_of("clean")
    if len(dup) and len(clean):
        src = clean[rng.integers(0, len(clean), size=len(dup))]
        text[dup] = text[src]
        role[dup] = role[src]

    tool_col = np.full(total, None, dtype=object)
    tool_names = np.array(["search", "calculator", "browser", "python"], dtype=object)
    tmask = np.array([r == "tool" for r in role], dtype=bool)
    tool_col[tmask] = tool_names[rng.integers(0, 4, size=int(tmask.sum()))]

    # trim to requested size (keeps whole leading conversations' turns)
    sl = slice(0, n_turns)
    cols: dict[str, pa.Array] = {
        "conv_id": pa.array(conv_id[sl].astype(object), type=pa.string()),
        "turn_idx": pa.array(turn_idx[sl], type=pa.int32()),
        "role": pa.array(role[sl], type=pa.string()),
        "text": pa.array(text[sl], type=pa.string()),
        "tool": pa.array(tool_col[sl], type=pa.string()),
        "ts": pa.array(ts[sl], type=pa.timestamp("us")),
    }
    if include_labels:
        cols["defect"] = pa.array(defect[sl], type=pa.string())
    return pa.table(cols)


def transcripts_path(n_turns: int, seed: int = 42, cache_dir: str = "/tmp/packs_ray_data",
                     num_files: int = 0) -> str:
    """Generate-and-cache transcripts parquet; returns the file/dir path.

    ``num_files > 1`` writes a directory of that many row-group-aligned
    files (sharded input for the resumable pipeline); otherwise one file.
    """
    os.makedirs(cache_dir, exist_ok=True)
    # bump the generation tag whenever generate_transcripts changes:
    # cache files are keyed by (n, seed, g) so a stale pre-change cache
    # can never be served against post-change oracles (g2: refusals)
    tag = (f"transcripts_n{n_turns}_s{seed}_g2"
           + (f"_f{num_files}" if num_files > 1 else ""))
    path = os.path.join(cache_dir, tag if num_files > 1 else tag + ".parquet")
    done = path + ".done"
    if os.path.exists(done):
        return path
    tbl = generate_transcripts(n_turns, seed=seed, include_labels=False)
    if num_files > 1:
        os.makedirs(path, exist_ok=True)
        n = tbl.num_rows
        step = (n + num_files - 1) // num_files
        for i in range(num_files):
            pq.write_table(tbl.slice(i * step, step),
                           os.path.join(path, f"part-{i:05d}.parquet"))
    else:
        pq.write_table(tbl, path)
    with open(done, "w") as f:
        f.write("ok")
    return path
