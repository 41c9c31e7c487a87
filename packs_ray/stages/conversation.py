"""Conversation shuffle stage: restore (conv_id, turn_idx) order, apply
role-sequence validity, and absorb duplicate marks.

Scale design (SURVEY.md §7.3): instead of one reducer per conversation
(per-tiny-group Python overhead; a mega-conversation = one hot reducer),
rows are shuffled on a *uniform synthetic key* ``bucket =
hash64(conv_id) % num_buckets`` and each bucket is processed as ONE
vectorized pandas frame: sort by (conv_id, turn_idx) (stable), lag the
role column once, and mask cross-conversation boundaries.  Semantics are
exact for every conversation regardless of gaps/duplicate turn_idx; skew
is bounded by ``max_conv_turns + n/num_buckets`` rows per bucket.

Duplicate marks from :func:`packs_ray.stages.dedup.dedup_marks` ride the
same shuffle: mark rows (``__dup=1``) are unioned with the main rows
(``__dup=0``) under one normalized schema, land in the same conversation
bucket as the row they mark (same salted hash), and the
``exact_duplicate`` bit is OR-ed in with a vectorized merge — so the
full text payload shuffles exactly once in the whole pipeline.

Skew salting for pathological mega-conversations (north rule): rows with
``turn_idx >= cfg.salt_segment_size`` are salted into per-segment buckets
``hash64(conv_id, turn_idx // K)``; the first row of such a non-initial
segment has an unknown predecessor and the role-sequence rule FAILS OPEN
there (documented approximation, only at multi-million-turn boundaries
with the default K).

Role-sequence rule (enum/required semantics per
fhir_compliance_pack/main.py:67-98 applied to transcripts): a ``tool``
turn is valid iff the immediately preceding turn of the same conversation
(by stable turn_idx order) has role ``assistant`` or ``tool``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.config import DEFAULT_CONFIG, RULE_BIT, FilterConfig
from packs_ray.stages.dedup import content_hash128

_PREV_OK = frozenset({"assistant", "tool"})

#: base fields of the normalized exchange schema for the conversation
#: shuffle (input_hint columns + stage outputs + dedup-mark carriers);
#: extra user columns ride through between the stage outputs and helpers
_BASE_FIELDS = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
    ("rule_bits", pa.int64()),
    ("lang", pa.string()),
    ("bits_per_byte", pa.float64()),
]
_HELPER_FIELDS = [
    ("__mk", pa.int64()),
    ("__k", pa.int64()),
    ("__dup", pa.int8()),
    ("bucket", pa.int64()),
]


def conv_schema(extra_fields=()) -> pa.Schema:
    """Exchange schema: base + passthrough extras + shuffle helpers."""
    fields = list(_BASE_FIELDS)
    known = {n for n, _ in _BASE_FIELDS} | {n for n, _ in _HELPER_FIELDS}
    for f in extra_fields:
        if f.name not in known:
            fields.append((f.name, f.type))
    return pa.schema(fields + _HELPER_FIELDS)


def _salted_bucket(conv: np.ndarray, turn_idx, num_buckets: int, K: int) -> np.ndarray:
    h = pd.util.hash_array(conv)
    ti = np.asarray(turn_idx)
    ti = np.nan_to_num(ti.astype(np.float64), nan=0.0).astype(np.int64)
    seg = np.maximum(ti, 0) // K
    salted = h ^ (seg.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    return (salted % np.uint64(num_buckets)).astype(np.int64)


def _mark_key(conv: np.ndarray, turn_idx, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Single 64-bit row-identity key mixing conversation, turn index and
    the 128-bit content hash; marks match rows on this within one bucket
    (collision odds ~bucket_rows²/2^64, negligible)."""
    ch = pd.util.hash_array(conv)
    ti = np.asarray(turn_idx)
    # null sentinel OUTSIDE the int32 domain so it can never collide with
    # a real turn_idx value (e.g. -1)
    ti = np.nan_to_num(ti.astype(np.float64), nan=-(2.0 ** 40)).astype(np.int64)
    mk = (ch * np.uint64(0x9E3779B97F4A7C15)
          ^ ti.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
          ^ h1.view(np.uint64) ^ (h2.view(np.uint64) >> np.uint64(1)))
    return mk.view(np.int64)


def add_conv_bucket(num_buckets: int, cfg: FilterConfig = DEFAULT_CONFIG,
                    with_marks: bool = False, schema: pa.Schema | None = None):
    """Batch fn normalizing main rows to the exchange schema with the
    shuffle key."""
    K = cfg.salt_segment_size
    CONV_SCHEMA = schema if schema is not None else conv_schema()

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False).astype(object)
        bucket = _salted_bucket(conv, batch.column("turn_idx").to_numpy(
            zero_copy_only=False), num_buckets, K)
        cols = {}
        for f in CONV_SCHEMA:
            if f.name == "bucket":
                cols[f.name] = pa.array(bucket, type=pa.int64())
            elif f.name == "__dup":
                cols[f.name] = pa.array(np.zeros(n, dtype=np.int8), type=pa.int8())
            elif f.name == "__k":
                cols[f.name] = pa.nulls(n, pa.int64())
            elif f.name == "__mk":
                pass  # filled below
            elif f.name in batch.column_names:
                cols[f.name] = batch.column(f.name).cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        if with_marks:
            text = batch.column("text").to_numpy(zero_copy_only=False).astype(object)
            role = batch.column("role").to_numpy(zero_copy_only=False).astype(object)
            h1, h2 = content_hash128(role, text)
            ti = batch.column("turn_idx").to_numpy(zero_copy_only=False)
            cols["__mk"] = pa.array(_mark_key(conv, ti, h1, h2), type=pa.int64())
        else:
            cols["__mk"] = pa.nulls(n, pa.int64())
        return pa.table({f.name: cols[f.name] for f in CONV_SCHEMA})

    return fn


def align_marks(num_buckets: int, cfg: FilterConfig = DEFAULT_CONFIG,
                schema: pa.Schema | None = None):
    """Batch fn normalizing dedup-mark rows to the exchange schema."""
    K = cfg.salt_segment_size
    CONV_SCHEMA = schema if schema is not None else conv_schema()

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False).astype(object)
        bucket = _salted_bucket(conv, batch.column("turn_idx").to_numpy(
            zero_copy_only=False), num_buckets, K)
        h1 = batch.column("h1").to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").to_numpy(zero_copy_only=False)
        ti = batch.column("turn_idx").to_numpy(zero_copy_only=False)
        mk = _mark_key(conv, ti, h1, h2)
        cols = {}
        for f in CONV_SCHEMA:
            if f.name == "bucket":
                cols[f.name] = pa.array(bucket, type=pa.int64())
            elif f.name == "__dup":
                cols[f.name] = pa.array(np.ones(n, dtype=np.int8), type=pa.int8())
            elif f.name == "__k":
                cols[f.name] = batch.column("k").cast(pa.int64())
            elif f.name == "__mk":
                cols[f.name] = pa.array(mk, type=pa.int64())
            else:
                # mark rows carry ONLY (bucket, __mk, __k, __dup); their
                # conv_id/turn_idx served to compute those and stay null
                # (a null turn_idx would not survive the int32 cast anyway)
                cols[f.name] = pa.nulls(n, f.type)
        return pa.table({f.name: cols[f.name] for f in CONV_SCHEMA})

    return fn


def process_conv_bucket(group: pd.DataFrame,
                        salt_k: int = DEFAULT_CONFIG.salt_segment_size) -> pd.DataFrame:
    """Vectorized per-bucket: absorb dup marks, stable (conv_id, turn_idx)
    sort, role lag."""
    helper_cols = ("__mk", "__k", "__dup")
    if len(group) == 0:
        return group.drop(columns=[c for c in helper_cols if c in group.columns])
    marks = None
    if "__dup" in group.columns:
        is_mark = group["__dup"].to_numpy() == 1
        if is_mark.any():
            marks = group.loc[is_mark, ["__mk", "__k"]]
            group = group.loc[~is_mark].copy()
            # null-filled mark rows made int columns float; restore every
            # integer column of the exchange schema so block schemas match
            # the dedup=False path (turn_idx stays int32 end-to-end)
            group["rule_bits"] = group["rule_bits"].astype(np.int64)
            ti = group["turn_idx"]
            group["turn_idx"] = (ti.astype(np.int32) if not ti.isna().any()
                                 else ti.astype("Int32"))

    g = group
    if marks is not None and len(g):
        # collapse marks per key: a left-merge against duplicate keys would
        # multiply main rows (possible only via a 64-bit __mk collision of
        # two distinct marks; summing k keeps the mark count right anyway)
        marks = marks.groupby("__mk", sort=False, as_index=False)["__k"].sum()
        g = g.merge(marks.rename(columns={"__k": "__kk"}), how="left", on="__mk")
        kk = g["__kk"].fillna(0).to_numpy(dtype=np.int64)
        # mark the last k occurrences of each exact key (identical-twin rows)
        occ_desc = g.groupby("__mk", sort=False).cumcount(ascending=False).to_numpy()
        dup_mask = occ_desc < kk
        g = g.drop(columns="__kk")
        g["rule_bits"] = (g["rule_bits"].to_numpy()
                          | dup_mask.astype(np.int64) * RULE_BIT["exact_duplicate"])

    g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
    n = len(g)
    if n == 0:
        return g.drop(columns=[c for c in helper_cols if c in g.columns])
    role = g["role"].to_numpy(dtype=object)
    conv = g["conv_id"].to_numpy(dtype=object)
    prev_role = np.roll(role, 1)
    same_conv = np.empty(n, dtype=bool)
    same_conv[0] = False
    same_conv[1:] = conv[1:] == conv[:-1]
    is_tool = role == "tool"
    prev_ok = (prev_role == "assistant") | (prev_role == "tool")
    violation = is_tool & ~(same_conv & prev_ok)
    # fail-open for the first row of a salted (non-initial) mega-conv segment:
    # its true predecessor normally lives in another bucket.  Applied at
    # every (conv, seg>0) head — even when hash collisions co-locate
    # adjacent segments — so the result is deterministic and the oracle
    # can replicate it exactly (stage docstring).
    ti = np.nan_to_num(g["turn_idx"].to_numpy(dtype=np.float64), nan=0.0).astype(np.int64)
    seg = np.maximum(ti, 0) // salt_k
    seg_head = ~same_conv | (seg != np.roll(seg, 1))
    violation &= ~(seg_head & (seg > 0))
    bits = g["rule_bits"].to_numpy()
    g["rule_bits"] = bits | violation.astype(np.int64) * RULE_BIT["tool_without_assistant"]
    return g.drop(columns=[c for c in helper_cols if c in g.columns])


def conversation_stage(ds, num_buckets: int, cfg: FilterConfig = DEFAULT_CONFIG,
                       marks=None, extra_fields=()):
    """groupby(bucket) → vectorized per-bucket role-sequence + ordering,
    with optional dedup marks riding the same shuffle.  ``extra_fields``:
    pyarrow fields of passthrough user columns beyond the input_hint
    schema (they ride the shuffle unchanged)."""
    with_marks = marks is not None
    schema = conv_schema(extra_fields)
    ds = ds.map_batches(add_conv_bucket(num_buckets, cfg, with_marks, schema),
                        batch_format="pyarrow")
    if with_marks:
        ds = ds.union(marks.map_batches(align_marks(num_buckets, cfg, schema),
                                        batch_format="pyarrow"))
    salt_k = cfg.salt_segment_size
    # emit ARROW from the group fn: the downstream arrow stages would
    # run the identical pandas→arrow conversion per block anyway, but
    # Ray's own conversion keeps the pandas metadata dict that makes
    # block schemas unhashable (executor "Failed to hash the schemas"
    # spam); table_from_pandas is that conversion minus the metadata
    from packs_ray.stages.util import table_from_pandas

    return ds.groupby("bucket").map_groups(
        lambda g: table_from_pandas(process_conv_bucket(g, salt_k),
                                    preserve_index=False),
        batch_format="pandas")


def response_latency(ds, *, conv_col: str = "conv_id",
                     idx_col: str = "turn_idx", role_col: str = "role",
                     ts_col: str = "ts", role: str = "assistant",
                     num_buckets: int | None = None):
    """Per-conversation response-latency profile of an agent
    transcript: for every ``role`` turn that directly follows a turn of
    any OTHER role (under the stable (conv, turn_idx) order the whole
    pipeline pins; BASELINE.json input_hint), the latency is the ts
    delta to that previous turn.  Output one row per conversation that
    has at least one such response: (conv_id, n_responses,
    mean_latency_us, max_latency_us) — the ops-health view of a
    transcript corpus (is the agent slow, did tool loops stall).

    Exactness: latencies are exact integer microseconds; the mean is
    one pinned float64 division, 6dp.

    Scale shape: only the four narrow columns shuffle once on
    hash(conv); per-bucket work is one stable sort + shifted compares.
    Null conv/idx/role/ts rows are excluded."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    cols = [conv_col, idx_col, role_col, ts_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(conv_col).is_valid()
        for c in cols[1:]:
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({conv_col: [],
                          "n_responses": pd.Series([], dtype="int64"),
                          "mean_latency_us": pd.Series([], dtype="float64"),
                          "max_latency_us": pd.Series([], dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        # total order: the fixture (like real crawls) can contain
        # duplicate turn_idx rows, so ties are pinned by (ts, role)
        g = g.sort_values([conv_col, idx_col, ts_col, role_col],
                          kind="stable")
        conv = g[conv_col].to_numpy()
        roles = g[role_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = conv[1:] == conv[:-1]
        hit = np.zeros(len(g), dtype=bool)
        hit[1:] = same[1:] & (roles[1:] == role) & (roles[:-1] != role)
        lat = np.zeros(len(g), dtype=np.int64)
        lat[1:] = ts[1:] - ts[:-1]
        d = pd.DataFrame({conv_col: conv[hit], "_lat": lat[hit]})
        if len(d) == 0:
            return empty.copy()
        out = (d.groupby(conv_col, sort=False)["_lat"]
               .agg(n_responses="size", _sum="sum",
                    max_latency_us="max").reset_index())
        # NO rounding: latencies reach 1e10 us where a 6dp round is
        # below one float64 ulp and diverges across engines; the raw
        # quotient of exact ints is bit-identical instead
        out["mean_latency_us"] = (
            out["_sum"].to_numpy(np.float64)
            / out["n_responses"].to_numpy(np.float64))
        out = out.drop(columns="_sum")
        for c in ("n_responses", "max_latency_us"):
            out[c] = out[c].astype(np.int64)
        return out[[conv_col, "n_responses", "mean_latency_us",
                    "max_latency_us"]]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def context_fit(ds, context_tokens: int, *, conv_col: str = "conv_id",
                idx_col: str = "turn_idx", role_col: str = "role",
                ts_col: str = "ts", text_col: str = "text",
                num_buckets: int | None = None):
    """Context-window fit accounting per conversation: for every turn,
    the whitespace-token count, the suffix token total from this turn
    to the conversation's END (under the stable (conv, turn_idx, ts,
    role) order the whole pipeline pins), and whether the tail starting
    here fits a ``context_tokens`` budget — the keep-last-k-turns
    truncation planner run before SFT packing (the first row per conv
    with ``fits_tail`` is where a context-limited trainer would start
    reading).  Null conv/idx/ts/role rows are excluded; null text
    counts 0 tokens.

    Exactness: token counts and suffix sums are exact integers; no
    floats anywhere.

    Scale shape: token counts are computed BEFORE the exchange so only
    five narrow columns (~24 B/turn, never the text) shuffle once on
    hash(conv); per-bucket work is one stable sort + a vectorized
    grouped prefix sum.

    Output per turn: (conv_id, turn_idx, n_tokens, suffix_tokens,
    fits_tail)."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    cols = [conv_col, idx_col, role_col, ts_col, text_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(conv_col).is_valid()
        for c in (idx_col, role_col, ts_col):
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        ntok = pc.fill_null(pc.count_substring_regex(
            pc.cast(batch.column(text_col), pa.string()), r"\S+"), 0) \
            .cast(pa.int64())
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return pa.table({
            conv_col: batch.column(conv_col),
            idx_col: batch.column(idx_col),
            role_col: batch.column(role_col),
            ts_col: batch.column(ts_col), "ntok": ntok,
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64))})

    empty = pd.DataFrame({conv_col: [],
                          idx_col: pd.Series([], dtype="int32"),
                          "n_tokens": pd.Series([], dtype="int64"),
                          "suffix_tokens": pd.Series([], dtype="int64"),
                          "fits_tail": pd.Series([], dtype="bool")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        # ntok as the final tie key: fully tied rows then carry equal
        # counts, so the suffix multiset is order-independent
        g = g.sort_values([conv_col, idx_col, ts_col, role_col, "ntok"],
                          kind="stable")
        ntok = g["ntok"].to_numpy(dtype=np.int64)
        pre = g.groupby(conv_col, sort=False)["ntok"].cumsum() \
            .to_numpy(dtype=np.int64)
        tot = g.groupby(conv_col, sort=False)["ntok"].transform("sum") \
            .to_numpy(dtype=np.int64)
        suffix = tot - pre + ntok
        return pd.DataFrame({
            conv_col: g[conv_col].to_numpy(),
            idx_col: g[idx_col].to_numpy(),
            "n_tokens": ntok, "suffix_tokens": suffix,
            "fits_tail": suffix <= int(context_tokens)})

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort([conv_col, idx_col])


def repeated_responses(ds, *, conv_col: str = "conv_id",
                       idx_col: str = "turn_idx", role_col: str = "role",
                       ts_col: str = "ts", text_col: str = "text",
                       role: str = "assistant",
                       num_buckets: int | None = None):
    """Stuck-loop detector: per conversation, how often a ``role`` turn
    repeats the PREVIOUS ``role`` turn's text verbatim (under the
    stable (conv, turn_idx, ts, role) order) and the longest such
    repeat run — the agent-health sibling of
    :func:`~packs_ray.functions.webquality.drop_boilerplate` (that one
    finds cross-conversation boilerplate; this finds a single agent
    looping).  Null conv/idx/role/ts rows are excluded; null text
    counts as the empty string.

    Exactness: repeat decisions compare the engine-wide 128-bit
    content hash (== text equality, collision odds negligible), so the
    DuckDB oracle can compare raw text; counts are exact integers.

    Scale shape: text is hashed BEFORE the exchange — only five narrow
    columns (~32 B/turn) shuffle once on hash(conv); per-bucket work
    is one stable sort + shifted compares.

    Output: one row per conversation with ≥1 ``role`` turn —
    (conv_id, n_role_turns, n_repeats, max_repeat_run)."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions
    from packs_ray.stages.dedup import content_hash128

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    cols = [conv_col, idx_col, role_col, ts_col, text_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(conv_col).is_valid()
        for c in (idx_col, role_col, ts_col):
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()),
                            "").to_numpy(zero_copy_only=False)
        roles = batch.column(role_col).to_numpy(zero_copy_only=False)
        h1, h2 = content_hash128(roles, text)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        hb = pd.util.hash_array(np.asarray(conv))
        return pa.table({
            conv_col: batch.column(conv_col),
            idx_col: batch.column(idx_col),
            role_col: batch.column(role_col),
            ts_col: batch.column(ts_col),
            "h1": pa.array(h1), "h2": pa.array(h2),
            "bucket": pa.array((hb % np.uint64(num_buckets))
                               .astype(np.int64))})

    empty = pd.DataFrame({conv_col: [],
                          "n_role_turns": pd.Series([], dtype="int64"),
                          "n_repeats": pd.Series([], dtype="int64"),
                          "max_repeat_run": pd.Series([], dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g[g[role_col] == role]
        if len(g) == 0:
            return empty.copy()
        g = g.sort_values([conv_col, idx_col, ts_col], kind="stable")
        conv = g[conv_col].to_numpy()
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        rep = np.zeros(len(g), dtype=bool)
        rep[1:] = ((conv[1:] == conv[:-1]) & (h1[1:] == h1[:-1])
                   & (h2[1:] == h2[:-1]))
        # run lengths of consecutive repeats, vectorized: distance to
        # the last non-repeat row (rep[0] is always False, and a conv
        # change forces False, so runs never cross conversations)
        idx = np.arange(len(g), dtype=np.int64)
        last_reset = np.maximum.accumulate(np.where(rep, -1, idx))
        run = idx - last_reset
        d = pd.DataFrame({conv_col: conv, "_rep": rep.astype(np.int64),
                          "_run": run})
        out = (d.groupby(conv_col, sort=False)
               .agg(n_role_turns=("_rep", "size"),
                    n_repeats=("_rep", "sum"),
                    max_repeat_run=("_run", "max")).reset_index())
        for c in ("n_role_turns", "n_repeats", "max_repeat_run"):
            out[c] = out[c].astype(np.int64)
        return out

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort(conv_col)


def conv_language_consistency(ds, *, conv_col: str = "conv_id",
                              text_col: str = "text",
                              num_buckets: int | None = None):
    """Per-conversation language consistency: classify every turn with
    the engine's marker-word language heuristic (the
    :class:`~packs_ray.models.LangIdModel` scoring with the
    deterministic en→fr→de→cjk argmax tie order), then report each
    conversation's majority language, how many distinct languages
    appear and the majority's share — the code-switching screen run
    before language-bucketed training mixes (a conv that flips
    language mid-way usually indicates concatenation bugs, not
    bilingual users).  Null conv rows are excluded; null text counts
    as ''.

    Exactness: per-turn language labels and all counts are exact;
    agreement is ONE pinned division, 6dp.  Majority ties break to the
    lexicographically smallest language (both engines sort
    (n DESC, lang ASC)).

    Scale shape: languages are classified BEFORE the exchange — only
    (conv, lang) marks shuffle once on hash(conv); per-bucket work is
    one vectorized double groupby.

    Output per conversation: (conv_id, n_turns, n_langs,
    majority_lang, agreement, is_mixed), ordered by conv_id."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions
    from packs_ray.models import _CJK_RANGE_RE, LANG_MARKERS

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    import re as _re
    patterns = {
        lang: r"(?i)\b(?:" + "|".join(_re.escape(w) for w in words)
        + r")\b" for lang, words in LANG_MARKERS.items()}

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([conv_col, text_col]).filter(
            batch.column(conv_col).is_valid())
        text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()),
                            "")
        n_tok = np.maximum(pc.count_substring_regex(text, r"\S+")
                           .to_numpy(zero_copy_only=False)
                           .astype(np.float64), 1.0)
        n_chr = np.maximum(pc.utf8_length(text)
                           .to_numpy(zero_copy_only=False)
                           .astype(np.float64), 1.0)
        sc = {lang: pc.count_substring_regex(text, pat)
              .to_numpy(zero_copy_only=False).astype(np.float64) / n_tok
              for lang, pat in patterns.items()}
        cjk = pc.count_substring_regex(text, _CJK_RANGE_RE) \
            .to_numpy(zero_copy_only=False).astype(np.float64) / n_chr
        en, fr, de = sc["en"], sc["fr"], sc["de"]
        # the deterministic en>=fr>=de>=cjk cascade (== the SQL CASE)
        lang = np.where(
            np.maximum(np.maximum(en, fr), np.maximum(de, cjk)) <= 0,
            "und",
            np.where((en >= fr) & (en >= de) & (en >= cjk), "en",
                     np.where((fr >= de) & (fr >= cjk), "fr",
                              np.where(de >= cjk, "de", "cjk"))))
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return pa.table({
            conv_col: batch.column(conv_col),
            "lang": pa.array(lang.astype(object)),
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64))})

    empty = pd.DataFrame({conv_col: [],
                          "n_turns": pd.Series([], dtype="int64"),
                          "n_langs": pd.Series([], dtype="int64"),
                          "majority_lang": pd.Series([], dtype=object),
                          "agreement": pd.Series([], dtype="float64"),
                          "is_mixed": pd.Series([], dtype="bool")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from packs_ray.stages.util import round_half_away as _r

        if len(g) == 0:
            return empty.copy()
        c = (g.groupby([conv_col, "lang"], sort=False).size()
             .reset_index(name="n"))
        c = c.sort_values(["n", "lang"], ascending=[False, True],
                          kind="stable")
        top = c.drop_duplicates(subset=[conv_col], keep="first")
        tot = (c.groupby(conv_col, sort=False)
               .agg(n_turns=("n", "sum"), n_langs=("n", "size"))
               .reset_index())
        out = tot.merge(top[[conv_col, "lang", "n"]], on=conv_col)
        out["agreement"] = _r(out["n"].to_numpy(np.float64)
                              / out["n_turns"].to_numpy(np.float64), 6)
        out["is_mixed"] = out["n_langs"] > 1
        out = out.rename(columns={"lang": "majority_lang"})
        for col in ("n_turns", "n_langs"):
            out[col] = out[col].astype(np.int64)
        return out[[conv_col, "n_turns", "n_langs", "majority_lang",
                    "agreement", "is_mixed"]]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort(conv_col)

def echo_score(ds, *, conv_col: str = "conv_id", idx_col: str = "turn_idx",
               role_col: str = "role", ts_col: str = "ts",
               text_col: str = "text",
               num_buckets: int | None = None):
    """Assistant-parroting profile: for every assistant turn, the
    fraction of its token POSITIONS whose token also appears in the
    nearest PRECEDING user turn of the same conversation (under the
    stable (conv, turn_idx, ts) order) — the echo/copy metric that
    catches agents answering by quoting the question back.  One row
    per conversation with >=1 scored assistant turn:
    (conv_id, n_scored, mean_echo, max_echo).  Assistant turns with no
    tokens or no preceding user turn are not scored; a preceding user
    turn with EMPTY text scores 0.  Null conv/idx/role/ts rows drop;
    null text counts as empty.  Same trim/split tokenizer as
    top_terms.

    Determinism: per-turn ratios pin to integer PARTS-PER-MILLION
    (half-away); mean_echo = round(sum_ppm / n / 1e6, 6) and
    max_echo = max_ppm / 1e6 are each ONE shared float expression.

    Scale shape: text shuffles ONCE on hash(conv) (like the SFT
    assembler — token comparison needs the raw turns together);
    per-bucket work is one stable sort + vectorized last-user-index
    accumulate + two exploded-token merges."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions
    from packs_ray.stages.util import round_half_away

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    cols = [conv_col, idx_col, role_col, ts_col, text_col]
    ws_re = r"[ \t\n\r\f\v]+"

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(conv_col).is_valid()
        for c in (idx_col, role_col, ts_col):
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        hb = pd.util.hash_array(np.asarray(conv))
        return batch.append_column(
            "bucket", pa.array((hb % np.uint64(num_buckets))
                               .astype(np.int64)))

    empty = pd.DataFrame({conv_col: [],
                          "n_scored": pd.Series([], dtype="int64"),
                          "mean_echo": pd.Series([], dtype="float64"),
                          "max_echo": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g.sort_values([conv_col, idx_col, ts_col],
                          kind="stable").reset_index(drop=True)
        conv = g[conv_col].to_numpy()
        role = g[role_col].to_numpy()
        text = g[text_col].fillna("").to_numpy()
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        conv_start = np.zeros(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = conv[1:] != conv[:-1]
        conv_start = pos[new][np.cumsum(new) - 1]
        # index of the last user turn at-or-before each row, then
        # shift: the PRECEDING user turn for row i is that value at i-1
        user_at = np.where(role == "user", pos, np.int64(-1))
        last_user = np.maximum.accumulate(user_at)
        prev_user = np.full(n, -1, dtype=np.int64)
        prev_user[1:] = last_user[:-1]
        prev_user[prev_user < conv_start] = -1
        scored = (role == "assistant") & (prev_user >= 0)
        if not scored.any():
            return empty.copy()
        sidx = np.flatnonzero(scored)
        a_tok = (pd.Series(text[sidx]).str.strip(" \t\n\r\f\v")
                 .str.split(ws_re, regex=True))
        n_tok = a_tok.str.len().to_numpy(dtype=np.int64).copy()
        empty_a = pd.Series(text[sidx]).str.strip(" \t\n\r\f\v") == ""
        n_tok[empty_a.to_numpy()] = 0
        ok = n_tok > 0
        sidx, a_tok, n_tok = sidx[ok], a_tok[ok.tolist()], n_tok[ok]
        if not len(sidx):
            return empty.copy()
        rows = np.repeat(np.arange(len(sidx)), n_tok)
        a_long = pd.DataFrame({"r": rows,
                               "tok": np.concatenate(a_tok.to_numpy())})
        u_txt = pd.Series(text[prev_user[sidx]])
        u_tok = (u_txt.str.strip(" \t\n\r\f\v")
                 .str.split(ws_re, regex=True))
        u_len = u_tok.str.len().to_numpy(dtype=np.int64).copy()
        u_len[(u_txt.str.strip(" \t\n\r\f\v") == "").to_numpy()] = 0
        u_rows = np.repeat(np.arange(len(sidx)), u_len)
        nz = u_len > 0   # empty user turns contribute no tokens, and
        # their [''] split artifact must not enter the concat
        u_long = pd.DataFrame({
            "r": u_rows,
            "tok": np.concatenate(list(u_tok[nz.tolist()]))
            if nz.any() else np.array([], dtype=object)}) \
            .drop_duplicates()
        hits = (a_long.merge(u_long, on=["r", "tok"], how="inner")
                .groupby("r").size())
        hit_vec = np.zeros(len(sidx), dtype=np.int64)
        hit_vec[hits.index.to_numpy()] = hits.to_numpy()
        ppm = round_half_away(
            hit_vec.astype(np.float64) / n_tok.astype(np.float64) * 1e6,
            0).astype(np.int64)
        d = pd.DataFrame({conv_col: conv[sidx], "ppm": ppm})
        out = (d.groupby(conv_col, sort=False)
               .agg(n_scored=("ppm", "size"), sum_ppm=("ppm", "sum"),
                    max_ppm=("ppm", "max")).reset_index())
        out["n_scored"] = out["n_scored"].astype(np.int64)
        out["mean_echo"] = round_half_away(
            out["sum_ppm"].to_numpy(dtype=np.float64)
            / out["n_scored"].to_numpy(dtype=np.float64) / 1e6, 6)
        out["max_echo"] = out["max_ppm"].to_numpy(dtype=np.float64) / 1e6
        return out[[conv_col, "n_scored", "mean_echo", "max_echo"]]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort(conv_col)


def refusal_profile(ds, *, conv_col: str = "conv_id",
                    role_col: str = "role", text_col: str = "text",
                    phrases: list[str] | None = None,
                    num_buckets: int | None = None):
    """Per-conversation assistant-refusal profile: how many assistant
    turns open with a refusal ("i cannot", "i'm sorry", ...) — the SFT
    curation screen that drops or downweights refusal-heavy
    conversations before instruction tuning.  Matching is literal
    lowercase CONTAINS against :data:`packs_ray.rules.patterns
    .REFUSAL_PHRASES` (the pii_scanner contains-semantics,
    /root/reference/pii_scanner_pack/main.py:29-55) so the engine and
    the SQL oracle share exact strpos semantics.

    Output per conversation with >=1 assistant turn:
    (conv_id, n_assistant, n_refusals, refusal_rate) ordered by
    conv_id.  Null-text assistant turns count in n_assistant but never
    as refusals; null conv/role rows drop.  refusal_rate is ONE pinned
    division, 6dp.

    Scale shape: flags are computed BEFORE the exchange — only
    (conv, is_refusal) marks shuffle once on hash(conv); per-bucket
    work is one vectorized groupby-sum."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions
    from packs_ray.rules.patterns import REFUSAL_PHRASES

    bank = REFUSAL_PHRASES if phrases is None else phrases
    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([conv_col, role_col, text_col])
        mask = pc.and_(batch.column(conv_col).is_valid(),
                       pc.equal(pc.fill_null(
                           pc.cast(batch.column(role_col), pa.string()),
                           ""), "assistant"))
        batch = batch.filter(mask)
        low = pc.utf8_lower(pc.fill_null(
            pc.cast(batch.column(text_col), pa.string()), ""))
        hit = np.zeros(len(batch), dtype=bool)
        for p in bank:
            hit |= pc.match_substring(low, p).to_numpy(
                zero_copy_only=False)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return pa.table({
            conv_col: batch.column(conv_col),
            "is_refusal": pa.array(hit.astype(np.int64)),
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64))})

    empty = pd.DataFrame({conv_col: [],
                          "n_assistant": pd.Series([], dtype="int64"),
                          "n_refusals": pd.Series([], dtype="int64"),
                          "refusal_rate": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from packs_ray.stages.util import round_half_away as _r

        if len(g) == 0:
            return empty.copy()
        out = (g.groupby(conv_col, sort=False)
               .agg(n_assistant=("is_refusal", "size"),
                    n_refusals=("is_refusal", "sum"))
               .reset_index())
        out["refusal_rate"] = _r(
            out["n_refusals"].to_numpy(np.float64)
            / out["n_assistant"].to_numpy(np.float64), 6)
        for col in ("n_assistant", "n_refusals"):
            out[col] = out[col].astype(np.int64)
        return out

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort(conv_col)


def toxicity_profile(ds, *, conv_col: str = "conv_id",
                     role_col: str = "role", text_col: str = "text",
                     regex: str | None = None,
                     num_buckets: int | None = None):
    """Per-conversation toxicity profile: how many turns (any role) match
    the toxicity keyword bank, and how many of those are assistant turns
    — the curation screen that drops or routes toxic conversations before
    training (the north-star "toxicity keyword filter" surfaced as a
    per-conversation metric instead of a per-turn drop bit,
    :data:`packs_ray.rules.turn_rules` bit ``toxicity``).

    Matching is :data:`packs_ray.rules.patterns.TOXICITY_REGEX` via RE2
    (`pc.match_substring_regex`), the same engine DuckDB uses for
    ``regexp_matches`` — so engine and oracle share exact semantics.

    Output per conversation: (conv_id, n_turns, n_toxic,
    n_toxic_assistant, toxicity_rate) ordered by conv_id.  Null-conv
    rows drop; null text counts in n_turns but never matches; null role
    counts but is never "assistant".  toxicity_rate is ONE pinned
    division, 6dp.

    Scale shape: flags are computed BEFORE the exchange — only
    (conv, is_toxic, is_assistant) marks shuffle once on hash(conv);
    per-bucket work is one vectorized groupby-sum."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions
    from packs_ray.rules.patterns import TOXICITY_REGEX

    rx = TOXICITY_REGEX if regex is None else regex
    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([conv_col, role_col, text_col])
        batch = batch.filter(batch.column(conv_col).is_valid())
        text = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        tox = pc.match_substring_regex(text, rx).to_numpy(
            zero_copy_only=False).astype(np.int64)
        role = pc.fill_null(pc.cast(batch.column(role_col), pa.string()), "")
        is_a = pc.equal(role, "assistant").to_numpy(
            zero_copy_only=False).astype(np.int64)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return pa.table({
            conv_col: batch.column(conv_col),
            "is_toxic": pa.array(tox),
            "tox_assistant": pa.array(tox * is_a),
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64))})

    empty = pd.DataFrame({
        conv_col: [],
        "n_turns": pd.Series([], dtype="int64"),
        "n_toxic": pd.Series([], dtype="int64"),
        "n_toxic_assistant": pd.Series([], dtype="int64"),
        "toxicity_rate": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from packs_ray.stages.util import round_half_away as _r

        if len(g) == 0:
            return empty.copy()
        out = (g.groupby(conv_col, sort=False)
               .agg(n_turns=("is_toxic", "size"),
                    n_toxic=("is_toxic", "sum"),
                    n_toxic_assistant=("tox_assistant", "sum"))
               .reset_index())
        out["toxicity_rate"] = _r(
            out["n_toxic"].to_numpy(np.float64)
            / out["n_turns"].to_numpy(np.float64), 6)
        for col in ("n_turns", "n_toxic", "n_toxic_assistant"):
            out[col] = out[col].astype(np.int64)
        return out

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort(conv_col)


def turn_integrity(ds, *, conv_col: str = "conv_id",
                   idx_col: str = "turn_idx",
                   num_buckets: int | None = None):
    """Per-conversation turn-index integrity: does the conversation's
    turn_idx sequence have holes or duplicates?  The transcript analogue
    of the reference's sequence/required-field validity
    (/root/reference/fhir_compliance_pack/main.py:67-98) at the
    conversation level — truncated logging, lost turns and double
    writes all show up here before they poison SFT assembly.

    Output per conversation: (conv_id, n_turns, n_distinct_idx,
    min_idx, max_idx, n_missing, n_dup_idx) ordered by conv_id, where
    n_missing = (max-min+1) - n_distinct (holes inside the observed
    span) and n_dup_idx = n_turns - n_distinct (double-written
    indices).  Rows with null conv or null idx drop (a null index can
    be neither a hole nor a duplicate).

    Scale shape: only (conv, idx) marks shuffle once on hash(conv);
    per-bucket work is one vectorized groupby (size/nunique/min/max)."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([conv_col, idx_col])
        mask = pc.and_(batch.column(conv_col).is_valid(),
                       batch.column(idx_col).is_valid())
        batch = batch.filter(mask)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return pa.table({
            conv_col: batch.column(conv_col),
            "idx": pc.cast(batch.column(idx_col), pa.int64()),
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64))})

    empty = pd.DataFrame({
        conv_col: [],
        **{c: pd.Series([], dtype="int64")
           for c in ("n_turns", "n_distinct_idx", "min_idx", "max_idx",
                     "n_missing", "n_dup_idx")}})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        out = (g.groupby(conv_col, sort=False)
               .agg(n_turns=("idx", "size"),
                    n_distinct_idx=("idx", "nunique"),
                    min_idx=("idx", "min"), max_idx=("idx", "max"))
               .reset_index())
        out["n_missing"] = (out["max_idx"] - out["min_idx"] + 1
                            - out["n_distinct_idx"])
        out["n_dup_idx"] = out["n_turns"] - out["n_distinct_idx"]
        for c in ("n_turns", "n_distinct_idx", "min_idx", "max_idx",
                  "n_missing", "n_dup_idx"):
            out[c] = out[c].astype(np.int64)
        return out

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort(conv_col)


def dedup_conversations(ds, *, conv_col: str = "conv_id",
                        idx_col: str = "turn_idx",
                        role_col: str = "role", text_col: str = "text",
                        num_buckets: int | None = None):
    """Conversation-LEVEL exact dedup: two conversations are duplicates
    iff their multisets of (turn_idx, role, text) triples are equal —
    i.e. the same turns at the same positions, regardless of row order
    on disk.  The whole-dialog analogue of the per-turn exact dedup
    (:func:`packs_ray.stages.dedup.dedup_marks`); re-crawled or
    double-logged conversations collapse to one canonical id.

    Output one row per conversation: (conv_id, canonical_conv_id,
    is_dup) ordered by conv_id, where canonical_conv_id is the MINIMUM
    conv_id among content-equal conversations and is_dup = 1 for every
    non-canonical member.  Rows with null conv or null idx drop; null
    role/text are content (hashed like any value).

    Scale design: text NEVER shuffles.  Each row contributes two
    avalanched 64-bit mixes of (turn_idx, role, text); a conversation's
    digest is the WRAPPING uint64 SUM of its rows' mixes (order-free,
    so batch-local partial sums combine across blocks), 128 bits total
    — collision odds are negligible at 10^12 turns.  Exchange 1:
    per-batch partial sums (conv, s1, s2, n) on hash(conv).  Exchange
    2: one finished digest row per conversation on hash(digest), where
    min(conv_id) per digest group is the canonical.  Both exchanges
    carry ~40 B/conversation."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    P = np.uint64(1099511628211)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([conv_col, idx_col, role_col, text_col])
        mask = pc.and_(batch.column(conv_col).is_valid(),
                       batch.column(idx_col).is_valid())
        batch = batch.filter(mask)
        role = batch.column(role_col).to_numpy(
            zero_copy_only=False).astype(object)
        text = batch.column(text_col).to_numpy(
            zero_copy_only=False).astype(object)
        idx = pc.cast(batch.column(idx_col),
                      pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        h1 = (pd.util.hash_array(role, hash_key="0123456789123456") * P) \
            ^ pd.util.hash_array(text, hash_key="0123456789123456")
        h2 = (pd.util.hash_array(role, hash_key="6543216543210987") * P) \
            ^ pd.util.hash_array(text, hash_key="6543216543210987")
        # avalanche the (content, position) pair so wrapping sums of
        # many rows cannot cancel structurally
        m1 = pd.util.hash_array((h1 ^ (idx * P)).astype(np.uint64))
        m2 = pd.util.hash_array((h2 ^ (idx * np.uint64(0x9E3779B97F4A7C15)))
                                .astype(np.uint64))
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(pd.Series(conv), sort=False)
        order = np.argsort(codes, kind="stable")
        starts = np.searchsorted(codes[order], np.arange(len(uniq)))
        s1 = np.add.reduceat(m1[order], starts) if len(uniq) else \
            np.array([], dtype=np.uint64)
        s2 = np.add.reduceat(m2[order], starts) if len(uniq) else \
            np.array([], dtype=np.uint64)
        hb = pd.util.hash_array(np.asarray(uniq, dtype=object))
        return pa.table({
            conv_col: pa.array(uniq, type=pa.string()),
            "s1": pa.array(s1.view(np.int64)),
            "s2": pa.array(s2.view(np.int64)),
            "bucket": pa.array((hb % np.uint64(num_buckets))
                               .astype(np.int64))})

    dig_empty = pd.DataFrame({conv_col: [],
                              "d1": pd.Series([], dtype="int64"),
                              "d2": pd.Series([], dtype="int64"),
                              "bucket2": pd.Series([], dtype="int64")})

    def finish_digest(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return dig_empty.copy()
        gg = g.sort_values(conv_col, kind="stable")
        codes, uniq = pd.factorize(gg[conv_col], sort=False)
        starts = np.searchsorted(codes, np.arange(len(uniq)))
        d1 = np.add.reduceat(
            gg["s1"].to_numpy(np.int64).view(np.uint64), starts)
        d2 = np.add.reduceat(
            gg["s2"].to_numpy(np.int64).view(np.uint64), starts)
        hb = pd.util.hash_array((d1 * P) ^ d2)
        return pd.DataFrame({
            conv_col: uniq,
            "d1": d1.view(np.int64), "d2": d2.view(np.int64),
            "bucket2": (hb % np.uint64(num_buckets)).astype(np.int64)})

    out_empty = pd.DataFrame({conv_col: [],
                              "canonical_conv_id": pd.Series([], dtype=object),
                              "is_dup": pd.Series([], dtype="int64")})

    def assign_canonical(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return out_empty.copy()
        canon = g.groupby(["d1", "d2"], sort=False)[conv_col].transform("min")
        return pd.DataFrame({
            conv_col: g[conv_col].to_numpy(),
            "canonical_conv_id": canon.to_numpy(),
            "is_dup": (g[conv_col].to_numpy()
                       != canon.to_numpy()).astype(np.int64)})

    digests = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(finish_digest, batch_format="pandas"))
    return digests.groupby("bucket2") \
        .map_groups(assign_canonical, batch_format="pandas") \
        .sort(conv_col)


def preference_pairs(ds, *, conv_col: str = "conv_id",
                     idx_col: str = "turn_idx", role_col: str = "role",
                     ts_col: str = "ts", text_col: str = "text",
                     prompt_role: str = "user",
                     response_role: str = "assistant",
                     num_buckets: int | None = None):
    """DPO-style preference-pair mining over a transcript corpus: for
    every PROMPT (a ``prompt_role`` turn directly followed by a
    ``response_role`` turn under the pinned (conv, turn_idx, ts, role,
    text) total order) that occurs with ≥ 2 distinct responses across
    the corpus, emit (prompt, chosen, rejected) where chosen/rejected
    are the highest/lowest heuristic-quality responses (the
    ``textstats.quality_scores`` formula; ties pinned by (response,
    conv) so the pair set is bit-deterministic).

    Output: (prompt, chosen, rejected, chosen_score, rejected_score,
    n_candidates) ordered by prompt; prompts whose best and worst
    response are the same text emit nothing.

    Scale shape: two narrow shuffles — (conv)-bucketed adjacency
    extraction (text moves once, with its conversation), then a
    (prompt)-bucketed group reduce over candidate rows only.  Skewed
    mega-prompts ("hi") concentrate their candidates in one bucket;
    cap-per-prompt sampling upstream is the guard if a corpus is
    pathological."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    cols = [conv_col, idx_col, role_col, ts_col, text_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(conv_col).is_valid()
        for c in cols[1:]:
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    pair_empty = pd.DataFrame({
        "prompt": pd.Series([], dtype=object),
        "response": pd.Series([], dtype=object),
        conv_col: pd.Series([], dtype=object),
        "bucket2": pd.Series([], dtype="int64")})

    def extract_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pair_empty.copy()
        g = g.sort_values([conv_col, idx_col, ts_col, role_col, text_col],
                          kind="stable")
        conv = g[conv_col].to_numpy()
        roles = g[role_col].to_numpy()
        text = g[text_col].to_numpy()
        hit = np.zeros(len(g), dtype=bool)
        hit[1:] = ((conv[1:] == conv[:-1])
                   & (roles[1:] == response_role)
                   & (roles[:-1] == prompt_role))
        prev = np.roll(text, 1)          # hit[0] is always False
        d = pd.DataFrame({"prompt": prev[hit],
                          "response": text[hit],
                          conv_col: conv[hit]})
        hb = pd.util.hash_array(d["prompt"].to_numpy(dtype=object))
        d["bucket2"] = (hb % np.uint64(num_buckets)).astype(np.int64)
        return d

    out_empty = pd.DataFrame({
        "prompt": pd.Series([], dtype=object),
        "chosen": pd.Series([], dtype=object),
        "rejected": pd.Series([], dtype=object),
        "chosen_score": pd.Series([], dtype="float64"),
        "rejected_score": pd.Series([], dtype="float64"),
        "n_candidates": pd.Series([], dtype="int64")})

    def _score(texts: pd.Series) -> np.ndarray:
        from packs_ray.functions.textstats import quality_score_array

        return quality_score_array(pa.array(texts, type=pa.string()))

    def pick_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return out_empty.copy()
        g = g.copy()
        g["score"] = _score(g["response"])
        n = g.groupby("prompt", sort=False)["response"].transform("size")
        g["n_candidates"] = n.astype(np.int64)
        best = (g.sort_values(["score", "response", conv_col],
                              ascending=[False, True, True], kind="stable")
                .groupby("prompt", sort=False).head(1))
        worst = (g.sort_values(["score", "response", conv_col],
                               ascending=[True, True, True], kind="stable")
                 .groupby("prompt", sort=False).head(1))
        m = best.merge(worst, on="prompt", suffixes=("_c", "_r"))
        m = m[m["response_c"] != m["response_r"]]
        return pd.DataFrame({
            "prompt": m["prompt"],
            "chosen": m["response_c"],
            "rejected": m["response_r"],
            "chosen_score": m["score_c"].astype("float64"),
            "rejected_score": m["score_r"].astype("float64"),
            "n_candidates": m["n_candidates_c"].astype("int64")})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(extract_pairs, batch_format="pandas")
            .groupby("bucket2")
            .map_groups(pick_pairs, batch_format="pandas")
            .sort("prompt"))


def conversation_windows(ds, *, conv_col: str = "conv_id",
                         idx_col: str = "turn_idx",
                         role_col: str = "role", ts_col: str = "ts",
                         window: int = 8, stride: int = 4,
                         num_buckets: int | None = None):
    """Sliding turn-window expansion for long-context training: each
    conversation's turns (0-based ``pos`` under the pinned (turn_idx,
    ts, role) order) are tiled into overlapping windows of ``window``
    turns every ``stride`` turns; window ``n`` covers positions
    ``[n·stride, n·stride + window)``.  One output row per
    (turn, containing window): (conv_id, window_id, pos, turn_idx) —
    the turn-granular analogue of ``textstats.chunk_documents``.

    Output rows are deterministic even when turns tie on all three
    order columns: tied rows are indistinguishable in the output, so
    either pos assignment yields the same row multiset.

    Scale shape: ONE keyed shuffle of the narrow (conv, idx, ts, role)
    projection (text never moves); per bucket a stable sort + a
    vectorized repeat-expansion (each turn appears in at most
    ``ceil(window/stride)`` windows).  Null conv/idx/ts/role rows
    drop (module convention)."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    cols = [conv_col, idx_col, ts_col, role_col]
    w, s = int(window), int(stride)

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(conv_col).is_valid()
        for c in cols[1:]:
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return batch.append_column("bucket", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({
        conv_col: pd.Series([], dtype=object),
        "window_id": pd.Series([], dtype="int64"),
        "pos": pd.Series([], dtype="int64"),
        idx_col: pd.Series([], dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g.sort_values([conv_col, idx_col, ts_col, role_col],
                          kind="stable")
        conv = g[conv_col].to_numpy()
        idx = g[idx_col].to_numpy().astype(np.int64)
        pos = (pd.Series(np.ones(len(g), dtype=np.int64))
               .groupby(pd.Series(conv)).cumsum().to_numpy() - 1)
        lo = np.maximum(0, -((w - 1 - pos) // s))   # ceil((p-w+1)/s)
        hi = pos // s
        n = hi - lo + 1
        off = np.cumsum(n) - n
        flat = np.arange(n.sum(), dtype=np.int64)
        win = np.repeat(lo, n) + (flat - np.repeat(off, n))
        return pd.DataFrame({
            conv_col: np.repeat(conv, n),
            "window_id": win,
            "pos": np.repeat(pos, n),
            idx_col: np.repeat(idx, n)})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .sort([conv_col, "window_id", "pos"]))


TEMPLATE_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
TEMPLATE_URL_RE = r"https?://[^ \t\n\r\f\v]+"


def template_normalize(text):
    """Entity-masking normalizer for template fingerprints: lowercase,
    URLs → <url>, emails → <email>, digit runs → 0, whitespace runs
    collapsed + trimmed.  All patterns are RE2 on both engines (pyarrow
    and DuckDB), so the SQL twin is byte-identical; nulls stay null."""
    import pyarrow.compute as pc

    t = pc.utf8_lower(text)
    t = pc.replace_substring_regex(t, TEMPLATE_URL_RE, "<url>")
    t = pc.replace_substring_regex(t, TEMPLATE_EMAIL_RE, "<email>")
    t = pc.replace_substring_regex(t, "[0-9]+", "0")
    t = pc.replace_substring_regex(t, "[ \t\n\r\f\v]+", " ")
    return pc.utf8_trim(t, " ")


def template_dedup(ds, *, conv_col: str = "conv_id",
                   idx_col: str = "turn_idx", role_col: str = "role",
                   text_col: str = "text",
                   num_buckets: int | None = None):
    """Template-level conversation dedup: conversations are duplicates
    iff they are content-equal AFTER entity masking
    (:func:`template_normalize`) — the re-crawl / form-letter catcher
    for dialogs that differ only in ids, emails, URLs or numbers, which
    exact dedup (:func:`dedup_conversations`) cannot see.

    Same output contract and scale shape as ``dedup_conversations``
    (text never shuffles; two ~40 B/conversation exchanges): the
    normalizer is one extra zero-copy Arrow kernel chain in the partial
    pass."""
    import pyarrow.compute as pc

    from packs_ray.stages.util import str_column

    def normalize(batch: pa.Table) -> pa.Table:
        t = template_normalize(str_column(batch, text_col))
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, t)

    return dedup_conversations(
        ds.map_batches(normalize, batch_format="pyarrow"),
        conv_col=conv_col, idx_col=idx_col, role_col=role_col,
        text_col=text_col, num_buckets=num_buckets)


def merge_consecutive_turns(ds, *, conv_col: str = "conv_id",
                            idx_col: str = "turn_idx",
                            role_col: str = "role", ts_col: str = "ts",
                            text_col: str = "text",
                            sep: str = "\n\n",
                            num_buckets: int | None = None):
    """SFT-prep repair: merge runs of consecutive same-role turns into
    one turn per run (crawled/agent transcripts routinely split one
    logical message across rows; chat-template training assumes
    alternating roles).  Within each conversation — under the pinned
    (turn_idx, ts, role, text) total order the pipeline uses everywhere
    — adjacent rows with the same role collapse into one output turn:
    text joined by ``sep`` in order, ts = earliest of the run,
    n_merged = run length, and a new dense 0-based turn_idx.

    This is the repair twin of the role-sequence validity check
    (reference semantics: `fhir_compliance_pack/main.py:67-98` flags
    invalid sequences; this op normalizes them).

    Scale shape: only the five needed columns shuffle once on
    hash(conv); per-bucket work is one stable sort + one vectorized
    run-boundary scan + a bounded per-run string join.  Null
    conv/idx/role/ts rows are excluded; null text joins as ''."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    cols = [conv_col, idx_col, role_col, ts_col, text_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(conv_col).is_valid()
        for c in (idx_col, role_col, ts_col):
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        conv = batch.column(conv_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({
        conv_col: pd.Series([], dtype="object"),
        idx_col: pd.Series([], dtype="int64"),
        role_col: pd.Series([], dtype="object"),
        text_col: pd.Series([], dtype="object"),
        ts_col: pd.Series([], dtype="datetime64[us]"),
        "n_merged": pd.Series([], dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g.copy()
        g[text_col] = g[text_col].fillna("")
        g[ts_col] = g[ts_col].astype("datetime64[us]")
        g = g.sort_values([conv_col, idx_col, ts_col, role_col, text_col],
                          kind="stable")
        conv = g[conv_col].to_numpy()
        roles = g[role_col].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (conv[1:] != conv[:-1]) | (roles[1:] != roles[:-1])
        grp = np.cumsum(new) - 1
        g["_grp"] = grp
        m = (g.groupby("_grp", sort=True)
             .agg(**{conv_col: (conv_col, "first"),
                     role_col: (role_col, "first"),
                     ts_col: (ts_col, "min"),
                     "n_merged": (text_col, "size"),
                     text_col: (text_col, sep.join)})
             .reset_index(drop=True))
        m[idx_col] = m.groupby(conv_col, sort=False).cumcount() \
            .astype("int64")
        m["n_merged"] = m["n_merged"].astype("int64")
        return m[[conv_col, idx_col, role_col, text_col, ts_col,
                  "n_merged"]]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")
