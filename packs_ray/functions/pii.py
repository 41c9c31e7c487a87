"""PII scan as a streaming aggregate (detection-only variant of the
pipeline scrub stage).

Reference: pii_scanner_pack/main.py:29-68 — per (column × pattern) hit
counts via Python-re search, plus the row-union ``pii_records_ratio``.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.config import DEFAULT_CONFIG, FilterConfig
from packs_ray.rules.patterns import PII_PREFILTER_CHARS
from packs_ray.stages.util import str_column

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def pii_scan(ds, columns: list[str], cfg: FilterConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Rows: per (column, pattern) hit counts; plus a __dataset__ row with
    rows_with_pii / total / pii_records_ratio (4dp)."""
    from packs_ray.functions.validation import _re2_safe

    bank = [(k, p) for k, p in cfg.pii_patterns]
    # RE2-safe patterns run as ONE vectorized Arrow kernel per batch; the
    # Python re loop survives only for lazy-quantifier patterns (the
    # credit-card regex) where RE2 and Python semantics diverge — and only
    # over prefiltered candidate rows
    safe = {k for k, p in bank if _re2_safe(p)}

    def partial(batch: pa.Table) -> dict:
        import numpy as np

        compiled = [(k, re.compile(p)) for k, p in bank if k not in safe]
        d = {"total": batch.num_rows, "rows_with_pii": 0}
        any_hit = np.zeros(batch.num_rows, dtype=bool)
        for col in columns:
            text = str_column(batch, col)
            for key, pat in bank:
                if key in safe:
                    m = pc.match_substring_regex(text, pat).fill_null(False) \
                        .to_numpy(zero_copy_only=False)
                    any_hit |= m
                    d[f"hits_{col}_{key}"] = d.get(f"hits_{col}_{key}", 0) \
                        + int(m.sum())
            if compiled:
                cand = pc.match_substring_regex(
                    text, PII_PREFILTER_CHARS).fill_null(False) \
                    .to_numpy(zero_copy_only=False)
                vals = text.to_numpy(zero_copy_only=False)
                for key, rx in compiled:
                    hits = 0
                    for i in np.flatnonzero(cand):
                        if vals[i] is not None and rx.search(vals[i]):
                            hits += 1
                            any_hit[i] = True
                    d[f"hits_{col}_{key}"] = d.get(f"hits_{col}_{key}", 0) + hits
        d["rows_with_pii"] = int(any_hit.sum())
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {c: int(p[c].fillna(0).sum()) for c in p.columns}

    agg = global_agg(ds, partial, combine)
    rows = []
    for col in columns:
        for key, _ in bank:
            rows.append({"column": col, "pattern": key,
                         "pii_hits": agg.get(f"hits_{col}_{key}", 0)})
    out = pd.DataFrame(rows)
    total = agg["total"]
    out_ds = pd.DataFrame([{
        "column": "__dataset__", "pattern": "pii_records_ratio",
        "pii_hits": agg["rows_with_pii"],
    }])
    return pd.concat([out, out_ds], ignore_index=True)


# Credit-card candidates: 13-19 digits, single space/dash separators
# allowed between digits.  ASCII [0-9] on BOTH sides (engine Python re
# and the DuckDB/RE2 oracle) so the two can never diverge on Unicode
# digits — the \d pitfall flagged for the generic PII bank.
CARD_CANDIDATE = r"[0-9](?:[ -]?[0-9]){12,18}"


def _luhn_valid(cands: list[str]) -> "np.ndarray":
    """Vectorized Luhn mod-10 over candidate strings (separators
    stripped): reversed digits in a padded matrix, every second digit
    doubled (minus 9 above 9), sum % 10 == 0.  Left-padding with zeros
    is checksum-neutral (0 doubled is 0)."""
    import numpy as np

    if not cands:
        return np.zeros(0, dtype=bool)
    digs = [np.frombuffer(c.replace(" ", "").replace("-", "").encode(),
                          dtype=np.uint8) - 48 for c in cands]
    m = np.zeros((len(digs), 19), dtype=np.int64)
    for i, d in enumerate(digs):
        m[i, : len(d)] = d[::-1]
    doubled = 2 * m[:, 1::2]
    s = m[:, 0::2].sum(axis=1) + (doubled - 9 * (doubled > 9)).sum(axis=1)
    return s % 10 == 0


def luhn_scan(ds, id_col: str, text_col: str):
    """Checksum-validated credit-card detection: lazy Dataset of
    ``(id, n_candidates, n_valid)`` for rows containing at least one
    card-shaped digit run.

    The reference's credit-card PII rule is regex-only
    (pii_scanner_pack/pack_conf.json — ``(?:\\d[ -]*?){13,16}``), so any
    16-digit order/tracking number is a false hit; validating the Luhn
    checksum keeps real card numbers (all major networks checksum) and
    drops ~90 % of random digit runs.  Scale shape: the vectorized RE2
    prefilter skips digit-free rows entirely; the Python findall loop
    runs only over surviving candidate rows, and the checksum is one
    numpy pass over all candidates in the batch."""
    import numpy as np

    from packs_ray.stages.util import str_column

    def fn(batch: pa.Table) -> pa.Table:
        rx = re.compile(CARD_CANDIDATE)
        text = str_column(batch, text_col)
        cand = pc.match_substring_regex(text, CARD_CANDIDATE) \
            .fill_null(False).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col)
        vals = text.to_numpy(zero_copy_only=False)
        idx, spans = [], []
        all_cands: list[str] = []
        for i in np.flatnonzero(cand):
            found = rx.findall(vals[i])
            idx.append(i)
            spans.append(len(found))
            all_cands.extend(found)
        ok = _luhn_valid(all_cands)
        n_valid, pos = [], 0
        for k in spans:
            n_valid.append(int(ok[pos: pos + k].sum()))
            pos += k
        return pa.table({
            id_col: ids.take(pa.array(idx, type=pa.int64())),
            "n_candidates": pa.array(spans, type=pa.int64()),
            "n_valid": pa.array(n_valid, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


IBAN_CANDIDATE = r"[A-Z]{2}[0-9]{2}[0-9A-Z]{10,30}"
_IBAN_MAP = str.maketrans({chr(c): str(c - 55) for c in range(65, 91)})


def _iban_valid(cands: "list[str]") -> "np.ndarray":
    """ISO 13616 mod-97 verdict per candidate: move the first 4 chars
    to the end, map A..Z -> 10..35, big-integer remainder == 1.  The
    letter mapping is one C-level str.translate and the remainder one
    int() per candidate — this only ever runs on the (rare) rows the
    RE2 prefilter kept."""
    import numpy as np

    out = np.zeros(len(cands), dtype=bool)
    for i, s in enumerate(cands):
        digs = (s[4:] + s[:4]).translate(_IBAN_MAP)
        out[i] = int(digs) % 97 == 1
    return out


def iban_scan(ds, id_col: str, text_col: str):
    """Checksum-validated IBAN detection: lazy Dataset of
    ``(id, n_candidates, n_valid)`` for rows containing at least one
    IBAN-shaped token — the international-bank-account companion of
    ``luhn_scan`` (the reference's PII bank is regex-only,
    pii_scanner_pack/pack_conf.json; a mod-97 check drops ~99 % of
    random IBAN-shaped strings).  Same scale shape as luhn_scan:
    vectorized RE2 prefilter, candidate loop only over surviving
    rows."""
    import numpy as np

    from packs_ray.stages.util import str_column

    def fn(batch: pa.Table) -> pa.Table:
        rx = re.compile(IBAN_CANDIDATE)
        text = str_column(batch, text_col)
        cand = pc.match_substring_regex(text, IBAN_CANDIDATE) \
            .fill_null(False).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col)
        vals = text.to_numpy(zero_copy_only=False)
        idx, spans = [], []
        all_cands: list[str] = []
        for i in np.flatnonzero(cand):
            found = rx.findall(vals[i])
            idx.append(i)
            spans.append(len(found))
            all_cands.extend(found)
        ok = _iban_valid(all_cands)
        n_valid, pos = [], 0
        for k in spans:
            n_valid.append(int(ok[pos: pos + k].sum()))
            pos += k
        return pa.table({
            id_col: ids.take(pa.array(idx, type=pa.int64())),
            "n_candidates": pa.array(spans, type=pa.int64()),
            "n_valid": pa.array(n_valid, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class PiiSpanStage:
    """Actor-pool stage emitting PII match SPANS — (id, kind, start,
    end) codepoint offsets per match — the audit/NER-training view the
    scan (counts) and scrub (replace) surfaces don't give.  A reviewer
    needs offsets to render highlights; a span-corruption training task
    needs them as labels.

    Stateful map_batches callable: the pattern bank compiles ONCE per
    actor in ``__init__`` (reference compiles per call,
    pii_scanner_pack/main.py:29-40); ``__call__`` prefilters rows with
    the shared RE2 candidate-chars kernel and runs ``finditer`` only on
    candidate rows (per-match Python is inherent to offset extraction —
    Arrow has no match-position kernel; the C regex engine does the
    scanning).  Use as
    ``ds.map_batches(PiiSpanStage, fn_constructor_kwargs=...,
    concurrency=N)``."""

    def __init__(self, id_col: str, text_col: str,
                 cfg: FilterConfig = DEFAULT_CONFIG):
        self.id_col, self.text_col = id_col, text_col
        self.bank = [(k, re.compile(p)) for k, p in cfg.pii_patterns]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        text = str_column(batch, self.text_col)
        cand = pc.match_substring_regex(
            text, PII_PREFILTER_CHARS).fill_null(False).to_numpy(
            zero_copy_only=False)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        vals = text.to_numpy(zero_copy_only=False)
        out_id, out_kind, out_s, out_e = [], [], [], []
        for i in np.flatnonzero(cand):
            v = vals[i]
            if v is None:
                continue
            for kind, rx in self.bank:
                for m in rx.finditer(v):
                    out_id.append(ids[i])
                    out_kind.append(kind)
                    out_s.append(m.start())
                    out_e.append(m.end())
        return pa.table({
            self.id_col: pa.array(out_id,
                                  type=batch.schema.field(self.id_col).type),
            "kind": pa.array(out_kind, type=pa.string()),
            "start": pa.array(out_s, type=pa.int64()),
            "end": pa.array(out_e, type=pa.int64())})


def pii_spans(ds, id_col: str, text_col: str,
              cfg: FilterConfig = DEFAULT_CONFIG, *, concurrency=None):
    """PII span extraction over a text column (see ``PiiSpanStage``).
    Returns a lazy Dataset of (id, kind, start, end)."""
    if concurrency is None:
        # autoscaling pool up to 8 actors: span extraction is bursty
        # (prefilter skips clean rows), so let idle actors release
        concurrency = (1, 8)
    return ds.map_batches(
        PiiSpanStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "cfg": cfg},
        batch_format="pyarrow", concurrency=concurrency)


def pii_density(ds, key_col: str, text_col: str,
                cfg: FilterConfig = DEFAULT_CONFIG,
                num_partitions: int | None = None):
    """Per-group PII density: for every value of ``key_col`` (a
    conversation, a domain, a source), how many rows carry any PII
    pattern hit in ``text_col`` and the hit ratio — the rollup view of
    ``pii_scan``'s corpus totals (which conversations need scrubbing
    review, not just how many rows overall).

    Output: (key_col, n_rows, n_pii, pii_ratio 6dp).  Null-text rows
    count in n_rows but can't hit; null keys are excluded.

    Scale shape: the row-level any-hit indicator is computed exactly
    like pii_scan (one vectorized RE2 kernel per safe pattern, the
    Python loop only for lazy-quantifier patterns over prefiltered
    candidates); only (key, n, n_pii) partials ride one bucketed sum.
    """
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.functions.validation import _re2_safe
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    bank = [(k, p) for k, p in cfg.pii_patterns]
    safe = {k for k, p in bank if _re2_safe(p)}

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, text_col]).filter(
            batch.column(key_col).is_valid())
        compiled = [(k, re.compile(p)) for k, p in bank if k not in safe]
        text = str_column(batch, text_col)
        any_hit = np.zeros(batch.num_rows, dtype=bool)
        for key, pat in bank:
            if key in safe:
                any_hit |= pc.match_substring_regex(text, pat) \
                    .fill_null(False).to_numpy(zero_copy_only=False)
        if compiled:
            cand = pc.match_substring_regex(
                text, PII_PREFILTER_CHARS).fill_null(False) \
                .to_numpy(zero_copy_only=False)
            vals = text.to_numpy(zero_copy_only=False)
            for key, rx in compiled:
                for i in np.flatnonzero(cand & ~any_hit):
                    if vals[i] is not None and rx.search(vals[i]):
                        any_hit[i] = True
        df = pd.DataFrame({key_col: batch.column(key_col)
                           .to_numpy(zero_copy_only=False),
                           "_hit": any_hit.astype(np.int64)})
        out = (df.groupby(key_col, sort=False)["_hit"]
               .agg(n_rows="size", n_pii="sum").reset_index())
        for c in ("n_rows", "n_pii"):
            out[c] = out[c].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(key_col, sort=False)[["n_rows", "n_pii"]]
               .sum().reset_index())
        out["pii_ratio"] = _r(out["n_pii"].to_numpy(np.float64)
                              / out["n_rows"].to_numpy(np.float64), 6)
        for c in ("n_rows", "n_pii"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucketed_group_reduce(parts, [key_col], reduce_fn,
                                 num_partitions)


def k_anonymity(ds, quasi_cols: list[str], sensitive_col: str | None = None,
                *, k: int = 5, l: int = 2,
                num_partitions: int | None = None):
    """k-anonymity / l-diversity audit (Sweeney 2002, Machanavajjhala
    2007 — public definitions): group rows by the quasi-identifier
    columns and report how exposed the table is — the privacy
    complement of the pattern-level PII scan (a row can be re-identified
    by its QI combination even with every direct identifier scrubbed).

    One summary row: n_rows, n_groups, min_group_size, k_anonymity
    (the k the table actually achieves = min group size), n_rows_at_risk
    (rows in groups smaller than ``k``), at_risk_ratio (6dp) and — when
    ``sensitive_col`` is given — min_l_diversity (the smallest distinct
    sensitive-value count over groups) and n_groups_low_diversity
    (groups with fewer than ``l`` distinct sensitive values).

    Scale shape: per-batch (QI..., n, sensitive-distinct marks) partials
    ride one bucketed reduce on the QI key; only the fixed-width
    per-bucket summary rows land on the driver.  Rows with any null QI
    column are excluded (they form no linkable signature)."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    cols = quasi_cols + ([sensitive_col] if sensitive_col else [])

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(quasi_cols[0]).is_valid()
        for c in quasi_cols[1:]:
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        df = batch.to_pandas()
        out = (df.groupby(quasi_cols, sort=False)
               .size().reset_index(name="_n"))
        out["_n"] = out["_n"].astype(np.int64)
        if sensitive_col:
            # distinct sensitive marks per group, kept as rows so the
            # reduce can count across batches exactly
            dd = df.drop_duplicates()
            out = out.merge(
                dd.groupby(quasi_cols, sort=False)[sensitive_col]
                .agg(lambda s: "\x1f".join(
                    sorted(str(x) for x in s.dropna().unique())))
                .reset_index(name="_sv"), on=quasi_cols, how="left")
        return _table_from_pandas(out, preserve_index=False)

    parts = ds.map_batches(marks, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sizes = (g.groupby(quasi_cols, sort=False)["_n"].sum())
        row = {"n_rows": int(sizes.sum()), "n_groups": len(sizes),
               "min_size": int(sizes.min()) if len(sizes) else 0,
               "at_risk": int(sizes[sizes < k].sum())}
        if sensitive_col:
            sv = (g.dropna(subset=["_sv"])
                  .groupby(quasi_cols, sort=False)["_sv"]
                  .agg(lambda s: len(set(
                      x for joined in s for x in joined.split("\x1f")
                      if x != ""))))
            sv = sv.reindex(sizes.index, fill_value=0)
            row["min_l"] = int(sv.min()) if len(sv) else 0
            row["low_div"] = int((sv < l).sum())
        return pd.DataFrame([row])

    per = bucketed_group_reduce(parts, quasi_cols, per_bucket,
                                num_partitions).to_pandas()
    if per.empty:
        base = {"n_rows": 0, "n_groups": 0, "min_size": 0, "at_risk": 0}
        if sensitive_col:
            base.update({"min_l": 0, "low_div": 0})
        per = pd.DataFrame([base])
    n_rows = int(per["n_rows"].sum())
    n_groups = int(per["n_groups"].sum())
    min_size = int(per["min_size"][per["n_groups"] > 0].min()) \
        if n_groups else 0
    at_risk = int(per["at_risk"].sum())
    out = {"n_rows": np.int64(n_rows), "n_groups": np.int64(n_groups),
           "k_anonymity": np.int64(min_size),
           "n_rows_at_risk": np.int64(at_risk),
           "at_risk_ratio": float(_r(at_risk / n_rows, 6))
           if n_rows else None}
    if sensitive_col:
        out["min_l_diversity"] = np.int64(
            int(per["min_l"][per["n_groups"] > 0].min()) if n_groups
            else 0)
        out["n_groups_low_diversity"] = np.int64(
            int(per["low_div"].sum()))
    return pd.DataFrame([out])


def pseudonymize(ds, cols: list[str], *, salt: str = "s1"):
    """Deterministic keyed pseudonymization: each listed column is
    replaced by the token ``anon_<fnv1a64(salt || ':' || value)>`` (the
    repo's shared vectorized FNV-1a over the value's string form,
    signed-int64 rendering — the same fold the fingerprint/HLL SQL
    replicas reproduce).  Equal values map to equal tokens, so joins
    and groupbys on the pseudonymized key still work; different salts
    give unlinkable token spaces across releases.  Nulls stay null.

    This is referential-integrity tokenization, NOT cryptographic
    anonymization — FNV-1a is not a keyed MAC, and a determined party
    with the salt (or a small value domain) can dictionary-reverse it.
    For release-grade privacy swap in a real HMAC behind the same seam.

    Stateless vectorized map_batches (one lockstep byte pass per
    column per batch); text never leaves the worker, no shuffle."""
    import numpy as np

    from packs_ray.functions.sketches import _fnv1a_str

    pre = salt + ":"

    def fn(batch: pa.Table) -> pa.Table:
        out = batch
        for c in cols:
            col = out.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s = col.cast(pa.string())
            full = pc.binary_join_element_wise(
                pa.array([pre] * len(out), type=pa.string()), s, "")
            h, valid = _fnv1a_str(full)
            signed = h.astype(np.int64)
            tok = pd.Series(np.char.add("anon_", signed.astype("U21")),
                            dtype=object)
            tok[~valid] = None
            arr = pa.array(tok, type=pa.string())
            out = out.set_column(out.schema.get_field_index(c),
                                 pa.field(c, pa.string()), arr)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def t_closeness(ds, quasi_cols: list[str], sensitive_col: str, *,
                t: float = 0.2,
                num_partitions: int | None = None) -> pd.DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007 — public
    definition) for a CATEGORICAL sensitive attribute: per
    quasi-identifier group, the total-variation distance between the
    group's sensitive-value distribution and the global one — the
    attack k-anonymity and l-diversity miss (a group can be large and
    diverse yet still skewed enough to leak).

    One summary row: n_rows, n_groups, max_t (the largest group TVD,
    6dp) and n_groups_above (groups with TVD > ``t``).  Rows with a
    null QI column or null sensitive value drop from both
    distributions.

    Exactness: each |p_group - p_global| term is pinned to an integer
    nano-unit (round half-away, mirrored by the SQL twin); values
    ABSENT from a group contribute their pinned global mass via the
    identity  su = sum_in_group(|..| - q9(v)) + sum_all(q9), so the
    per-group fold is an exact integer at any parallelism.

    Scale shape: the global distribution is one ``keyed_count``
    collected to the driver — bounded by the SENSITIVE-value
    cardinality, the documented assumption (a privacy attribute is
    categorical); per-(QI, value) counts ride one bucketed reduce on
    the QI key; only fixed-width per-bucket summary rows return."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         keyed_count,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _rh

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    cols = quasi_cols + [sensitive_col]

    def filt(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        mask = batch.column(cols[0]).is_valid()
        for c in cols[1:]:
            mask = pc.and_(mask, batch.column(c).is_valid())
        return batch.filter(mask)

    nn = ds.map_batches(filt, batch_format="pyarrow")
    glob = keyed_count(nn.select_columns([sensitive_col]),
                       [sensitive_col], count_col="cv").to_pandas()
    empty = pd.DataFrame([{ "n_rows": np.int64(0),
                            "n_groups": np.int64(0),
                            "max_t": None,
                            "n_groups_above": np.int64(0)}])
    if glob.empty:
        return empty
    n_total = int(glob["cv"].sum())
    q = {v: int(c) for v, c in zip(glob[sensitive_col], glob["cv"])}
    q9 = {v: int(_rh(c / n_total * 1e9, 0)) for v, c in q.items()}
    t_all = sum(q9.values())

    gv = keyed_count(nn, cols, count_col="c")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"n_rows": pd.Series([], dtype="int64"),
                                 "n_groups": pd.Series([], dtype="int64"),
                                 "max_su": pd.Series([], dtype="int64"),
                                 "n_above": pd.Series([], dtype="int64")})
        c = g["c"].to_numpy(np.float64)
        ng = (g.groupby(quasi_cols, sort=False)["c"].transform("sum")
              .to_numpy(np.float64))
        cv = g[sensitive_col].map(q).to_numpy(np.float64)
        term = np.abs(c / ng - cv / n_total) * 1e9
        u = (_rh(term, 0).astype(np.int64)
             - g[sensitive_col].map(q9).to_numpy(np.int64))
        gg = g.assign(_u=u)
        su = (gg.groupby(quasi_cols, sort=False)["_u"].sum()
              .to_numpy(np.int64) + np.int64(t_all))
        tg = su / 2_000_000_000.0
        return pd.DataFrame([{
            "n_rows": np.int64(g["c"].sum()),
            "n_groups": np.int64(su.size),
            "max_su": np.int64(su.max()),
            "n_above": np.int64(int((tg > t).sum()))}])

    parts = bucketed_group_reduce(gv, quasi_cols, per_bucket,
                                  num_partitions).to_pandas()
    if parts.empty or int(parts["n_groups"].sum()) == 0:
        return empty
    max_su = int(parts["max_su"][parts["n_groups"] > 0].max())
    return pd.DataFrame([{
        "n_rows": np.int64(parts["n_rows"].sum()),
        "n_groups": np.int64(parts["n_groups"].sum()),
        "max_t": float(_rh(max_su / 2_000_000_000.0, 6)),
        "n_groups_above": np.int64(parts["n_above"].sum())}])


def dp_counts(ds, group_col: str, *, epsilon: float = 1.0,
              salt: str = "dp",
              num_partitions: int | None = None) -> "pd.DataFrame":
    """epsilon-DP noisy group counts: exact distributed counts plus
    Laplace(1/epsilon) noise whose randomness is a PURE FUNCTION of the
    group value — seeded by the repo's FNV-1a + finalize hash of
    CAST(group AS VARCHAR) premultiplied by the salt constant — so the
    release is reproducible on any cluster, any retry, any resume (the
    same no-RNG-state contract as sampling.sample_mask), and the DuckDB
    oracle can verify it cell-for-cell.

    Noise = inverse-CDF Laplace: u = (h mod 2^53) / 2^53 (exact
    double), c = u - 0.5, noise = -(1/eps) * sign(c) * ln(1 - 2|c|).
    Every arithmetic step is an exact-rounded IEEE op shared with the
    SQL twin; ln is libm on both sides (class_tfidf precedent).
    Sensitivity is 1 (row-level adjacency): one row changes one group
    count by one.  NOTE a real release publishes ONLY n_noisy; the
    exact n column here exists for the parity gate.

    Caveat (documented, matching standard practice): a fixed salt
    means repeated releases share noise — rotate the salt per release
    epoch, and remember the group-key SET itself is data-dependent
    (standard known-domain assumption).

    Scale shape: counts are keyed_count partials (one narrow reduce);
    only the bounded per-group table lands on the driver, where the
    noise loop is O(groups)."""
    import math

    import numpy as np

    from packs_ray.functions.agg import keyed_count
    from packs_ray.functions.sampling import _salt_constant
    from packs_ray.functions.sketches import _finalize, _fnv1a_str
    from packs_ray.stages.util import round_half_away as _rh

    def drop_null(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column(group_col).is_valid())

    cnt = keyed_count(
        ds.select_columns([group_col]).map_batches(
            drop_null, batch_format="pyarrow"),
        [group_col], count_col="n",
        num_partitions=num_partitions).to_pandas()
    if not len(cnt):
        return pd.DataFrame({group_col: pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "n_noisy": pd.Series([], dtype="float64")})
    cnt = cnt.sort_values(group_col).reset_index(drop=True)
    h, _valid = _fnv1a_str(pa.array(cnt[group_col].astype(str)))
    h = _finalize(h * _salt_constant(salt))
    # u in [2^-53, 1 - 2^-53]: the mod-(2^53-1)-plus-1 map keeps both
    # Laplace branch endpoints out of the domain (u = 0 would put
    # c = -0.5 into ln(1 - 2|c|) = ln 0), every value exactly
    # representable; the SQL twin evaluates the identical chain
    u = ((h % np.uint64((1 << 53) - 1)) + np.uint64(1)) \
        .astype(np.float64) / float(1 << 53)
    b = 1.0 / float(epsilon)
    noisy = []
    for n_i, u_i in zip(cnt["n"].to_numpy(np.int64), u):
        c = u_i - 0.5
        noise = 0.0 if c == 0.0 else -b * math.copysign(1.0, c) \
            * math.log(1.0 - 2.0 * abs(c))
        noisy.append(float(n_i) + noise)
    cnt["n"] = cnt["n"].astype("int64")
    cnt["n_noisy"] = _rh(np.array(noisy), 6)
    return cnt[[group_col, "n", "n_noisy"]]
