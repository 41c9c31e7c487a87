"""Mergeable approximate-distinct sketch (HyperLogLog).

The reference has no sketches — it substitutes head-sampling for them
(SURVEY.md §2.5, `profiling_pack/main.py:65-133`) and computes
`distinct_count` with exact groupbys (`duplicates_finder_pack/
main.py:161-173`).  At 100 TB an exact distinct is an all-to-all
shuffle of every key; an HLL register array is the standard streaming
answer: per-batch partials are 4 KB regardless of input size, merge is
an elementwise max (associative + commutative), and the estimate's
error is ~1.04/sqrt(m) (~1.6 % at m=4096).

Determinism contract (drives the DuckDB oracle): values are hashed as
FNV-1a over the utf-8 bytes of their string form (`CAST(col AS
VARCHAR)` in SQL); register index = top 12 hash bits; rho = leading
zeros of the remaining 52-bit word + 1 computed with exact integer
comparisons (NOT float log2, whose rounding misclassifies 2^k-1 near
the mantissa edge); the harmonic sum is kept as the exact integer
S = Σ 2^(53 - rho_j) so no float-summation-order ambiguity exists, and
the final estimate arithmetic is a fixed sequence of IEEE ops both
sides replicate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

P_BITS = 12
M = 1 << P_BITS                      # 4096 registers
K_MAX = 64 - P_BITS + 1              # max rho (w == 0 -> 53)
_ALPHA = 0.7213 / (1 + 1.079 / M)    # Flajolet bias constant for m >= 128
_BIT_BINS = (2.0 ** np.arange(1, 64 - P_BITS + 1))  # exact float64 powers

_FNV_OFF = np.uint64(14695981039346656037)
_FNV_P = np.uint64(1099511628211)
# multiply-rotate-multiply finalizer: FNV-1a's high bits barely avalanche
# on short inputs (a one-byte difference only perturbs bits ~40-48), which
# collapses register indices; two odd-constant multiplies around a rot29
# spread every input bit into the top 12.  Chosen over murmur fmix64
# because it needs no xor, so the DuckDB replica stays pure HUGEINT
# arithmetic (mul/div/add mod 2^64).
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xFF51AFD7ED558CCD)


def _finalize(h: np.ndarray) -> np.ndarray:
    h = h * _C1
    h = (h << np.uint64(29)) | (h >> np.uint64(35))
    return h * _C2


def _fnv1a_str(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, valid_mask): vectorized FNV-1a over each value's utf-8
    string bytes (lockstep byte advance — same scheme as
    textstats.fingerprints)."""
    s = col.cast(pa.string())
    valid = np.asarray(pc.is_valid(s).to_numpy(zero_copy_only=False))
    arr = pc.fill_null(s, "").cast(pa.binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    raw_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    offsets = raw_off[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            else np.zeros(0, dtype=np.uint8))
    lens = offsets[1:] - offsets[:-1]
    n = len(arr)
    h = np.full(n, _FNV_OFF)
    starts = offsets[:-1]
    order = np.argsort(-lens, kind="stable")
    so, sl = starts[order], lens[order]
    hh = h[order].copy()
    for j in range(int(lens.max()) if n else 0):
        na = int(np.searchsorted(-sl, -j, side="left"))
        if na == 0:
            break
        b = data[so[:na] + j].astype(np.uint64)
        hh[:na] = (hh[:na] ^ b) * _FNV_P
    h[order] = hh
    return h, valid


def _registers(col: pa.Array) -> np.ndarray:
    """4096-byte HLL register array for one column of one batch."""
    h, valid = _fnv1a_str(col)
    h = _finalize(h[valid])
    regs = np.zeros(M, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - P_BITS)).astype(np.int64)
    w = (h & np.uint64((1 << (64 - P_BITS)) - 1)).astype(np.float64)
    # bit_length via exact comparisons against float64 powers of two
    # (w < 2^52 is exactly representable; np.log2 rounds 2^k-1 up to k
    # at these magnitudes)
    bl = np.digitize(w, _BIT_BINS) + 1
    rho = np.where(w == 0, K_MAX, (64 - P_BITS + 1) - bl).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> dict:
    """Deterministic HLL estimate from a register array: exact-integer
    harmonic sum + the standard linear-counting small-range branch."""
    counts = np.bincount(regs, minlength=K_MAX + 1)
    # arbitrary-precision: the sum reaches m * 2^53 = 2^65, past int64
    s_int = sum(int(c) << (K_MAX - k) for k, c in enumerate(counts))
    v_zero = int(counts[0])
    e_raw = (_ALPHA * M * M) * float(1 << K_MAX) / float(s_int)
    if e_raw <= 2.5 * M and v_zero > 0:
        est = M * math.log(M / v_zero)
    else:
        est = e_raw
    return {"approx_distinct": int(math.floor(est + 0.5)),
            "zero_registers": v_zero,
            "harmonic_scaled": float(s_int)}


CMS_D = 4                 # count-min depth (rows)
CMS_W = 1 << 12           # width: eps = e/w ~ 0.07% of stream length
_C3 = np.uint64(0xC2B2AE3D27D4EB4F)


def _cms_positions(h1: np.ndarray) -> np.ndarray:
    """(CMS_D, n) counter positions by double hashing: pos_j =
    (h1 + j*h2) mod w with h2 = (h1 * C3 | 1) — all arithmetic done on
    the mod-w residues so the engine (wrapping uint64) and the SQL
    replica (non-wrapping HUGEINT) compute identical cells."""
    h2 = (h1 * _C3) | np.uint64(1)
    a = (h1 % np.uint64(CMS_W)).astype(np.int64)
    b = (h2 % np.uint64(CMS_W)).astype(np.int64)
    j = np.arange(CMS_D, dtype=np.int64)[:, None]
    return (a[None, :] + j * b[None, :]) % CMS_W


def _cms_counters(col: pa.Array) -> np.ndarray:
    """(CMS_D, CMS_W) int64 counter matrix for one batch of one column."""
    h, valid = _fnv1a_str(col)
    h1 = _finalize(h[valid])
    cnt = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(h1):
        pos = _cms_positions(h1)
        for j in range(CMS_D):
            np.add.at(cnt[j], pos[j], 1)
    return cnt


QK = 5                    # quantile-sketch sub-bucket bits (rel err ~ 2^-QK)
_QS = 1 << QK


def _qbucket_ids(v: np.ndarray) -> np.ndarray:
    """Signed monotone log-bucket id (DDSketch-style, base-2 with 2^QK
    linear sub-buckets per octave) for int64 cents values.  Pure integer
    arithmetic — bit_length comes from frexp (exact for |v| < 2^53, no
    log2 rounding), so the DuckDB replica (length(bin(v))) computes the
    identical id for every value."""
    a = np.abs(v)
    # bit_length: frexp exponent is exact for integers below 2^53
    bl = np.frexp(a.astype(np.float64))[1].astype(np.int64)
    shift = np.maximum(bl - 1 - QK, 0)
    sub = a >> shift
    mono = np.where(a < _QS, a, (bl - QK - 1) * _QS + sub)
    return np.sign(v) * mono


def _qbucket_bounds(mono: int) -> tuple[int, int]:
    """[lo, hi] inclusive cents bounds of non-negative bucket id."""
    if mono < _QS:
        return mono, mono
    bl = (mono - _QS) // _QS + QK + 1
    sub = mono - (bl - QK - 1) * _QS
    shift = bl - 1 - QK
    return sub << shift, ((sub + 1) << shift) - 1


def approx_quantiles(ds, col: str, qs: list[float],
                     num_partitions: int | None = None) -> pd.DataFrame:
    """Mergeable approximate quantiles of ``col`` (relative error
    <= 2^-QK ~ 3%) from a log-bucket histogram: values ride as integer
    cents, each batch emits partial (bucket, count) rows (at most a few
    hundred distinct buckets regardless of input size), a bucketed
    reduce sums them, and the driver walks the ~KB-sized histogram —
    the scale path for `profiling`'s exact-percentile rank selection
    when a full distributed sort is not worth the shuffle.

    Returns one row per q: (q, rank, n, lo_cents, hi_cents, est_cents);
    rank = ceil(q*n) (1-based), est = floor((lo+hi)/2) of the bucket
    holding that rank.  All outputs are integers -> exact oracle parity.
    """
    from packs_ray.functions.agg import keyed_count

    def to_buckets(batch: pa.Table) -> pa.Table:
        x = batch.column(col).drop_null()
        cents = pc.cast(pc.round(pc.multiply(x, 100.0), 0), "int64")
        ids = _qbucket_ids(cents.to_numpy(zero_copy_only=False))
        return pa.table({"bucket": pa.array(ids, type=pa.int64())})

    hist = keyed_count(ds.select_columns([col])
                       .map_batches(to_buckets, batch_format="pyarrow"),
                       ["bucket"], num_partitions=num_partitions).to_pandas()
    if "bucket" not in hist.columns:  # 0-row input: empty, column-less
        hist = pd.DataFrame({"bucket": [], "cnt": []})
    hist = hist.sort_values("bucket").reset_index(drop=True)
    n = int(hist["cnt"].sum()) if len(hist) else 0
    cum = hist["cnt"].cumsum().to_numpy() if len(hist) else np.zeros(0)
    rows = []
    for q in qs:
        if n == 0:
            rows.append({"q": q, "rank": 0, "n": 0, "lo_cents": None,
                         "hi_cents": None, "est_cents": None})
            continue
        r = max(1, int(math.ceil(q * n)))
        i = int(np.searchsorted(cum, r, side="left"))
        b = int(hist["bucket"].iloc[i])
        lo, hi = _qbucket_bounds(abs(b))
        if b < 0:
            lo, hi = -hi, -lo
        rows.append({"q": q, "rank": r, "n": n, "lo_cents": lo,
                     "hi_cents": hi, "est_cents": (lo + hi) // 2})
    return pd.DataFrame(rows)


def count_min_counts(ds, col: str, probe_values: list, *,
                     fold_batch: int = 64) -> pd.DataFrame:
    """Count-min sketch frequency estimates (upper bounds, within
    e/CMS_W of the stream length with prob 1-e^-CMS_D) for the given
    probe values.  Counters are mergeable by elementwise sum —
    order-free and exact, so the result is deterministic and the DuckDB
    oracle replicates it cell-for-cell.  Per-partial cost is a fixed
    CMS_D x CMS_W x 8 B (128 KB) regardless of input size."""

    def partial(batch: pa.Table) -> pa.Table:
        cnt = _cms_counters(batch.column(col))
        return pa.table({"cnt": pa.array([cnt.ravel().tolist()],
                                         type=pa.list_(pa.int64()))})

    def fold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(CMS_D * CMS_W, dtype=np.int64)
        for r in batch.column("cnt").to_pylist():
            acc += np.asarray(r, dtype=np.int64)
        return pa.table({"cnt": pa.array([acc.tolist()],
                                         type=pa.list_(pa.int64()))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow",
                          batch_size=fold_batch).to_pandas())
    cnt = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for r in parts["cnt"] if len(parts) else ():
        cnt += np.asarray(r, dtype=np.int64)
    cnt = cnt.reshape(CMS_D, CMS_W)

    probe_arr = pa.array([str(v) for v in probe_values], type=pa.string())
    h1 = _finalize(_fnv1a_str(probe_arr)[0])
    pos = _cms_positions(h1)
    est = np.min(cnt[np.arange(CMS_D)[:, None], pos], axis=0)
    return pd.DataFrame({"key": [str(v) for v in probe_values],
                         "est_count": est.astype(np.int64)})


def approx_distinct(ds, columns: list[str], *, fold_batch: int = 256
                    ) -> pd.DataFrame:
    """One row per column: (column, approx_distinct, zero_registers,
    harmonic_scaled).  Partials are one 4 KB register row per
    (batch, column); an intermediate fold stage maxes ``fold_batch``
    partial rows at a time so the driver-side final fold sees
    #batches/fold_batch rows, not #batches."""

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "regs": []}
        for c in columns:
            rows["column"].append(c)
            rows["regs"].append(_registers(batch.column(c)))
        return pa.table({"column": pa.array(rows["column"]),
                         "regs": pa.array([r.tolist() for r in rows["regs"]],
                                          type=pa.list_(pa.uint8()))})

    def fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_c, out_r = [], []
        for c, grp in df.groupby("column", sort=True):
            regs = np.stack([np.asarray(r, dtype=np.uint8)
                             for r in grp["regs"]]).max(axis=0)
            out_c.append(c)
            out_r.append(regs.tolist())
        return pa.table({"column": pa.array(out_c),
                         "regs": pa.array(out_r, type=pa.list_(pa.uint8()))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow",
                          batch_size=fold_batch).to_pandas())
    rows = []
    for c in columns:
        grp = parts[parts["column"] == c] if len(parts) else parts
        if len(grp):
            regs = np.stack([np.asarray(r, dtype=np.uint8)
                             for r in grp["regs"]]).max(axis=0)
        else:  # 0-row input: all-empty registers
            regs = np.zeros(M, dtype=np.uint8)
        rows.append({"column": c, **_estimate(regs)})
    return pd.DataFrame(rows)


def grouped_approx_distinct(ds, key_col: str, col: str, *,
                            num_partitions: int | None = None):
    """Per-key HLL distinct count — "distinct users per event type" at
    any cardinality: one row per key with (key_col, approx_distinct,
    zero_registers, harmonic_scaled), the same register construction
    and deterministic estimate as ``approx_distinct``.

    Scale shape: each batch contributes one 4 KB register row per key
    it contains; ONLY those (key, regs) partials ride a bucketed
    shuffle (values never move), and the per-key max-merge + estimate
    runs inside the reduce — mergeable-sketch semantics, so retries /
    partition counts cannot change the answer.  Rows with a null key
    or a null value are excluded (a key whose values are all null does
    not appear, matching the SQL replica's DISTINCT-over-non-null)."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, col]).to_pandas() \
            .dropna(subset=[key_col, col])
        keys, regs = [], []
        for k, grp in df.groupby(key_col, sort=True):
            keys.append(k)
            regs.append(_registers(pa.Array.from_pandas(grp[col])))
        # pin the key type so a key-less batch can't emit a null-typed
        # column that breaks the downstream concat
        ktype = batch.schema.field(key_col).type
        return pa.table({key_col: pa.array(keys, type=ktype),
                         "regs": pa.array([r.tolist() for r in regs],
                                          type=pa.list_(pa.uint8()))})

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in g.groupby(key_col, sort=True):
            regs = np.stack([np.asarray(r, dtype=np.uint8)
                             for r in grp["regs"]]).max(axis=0)
            rows.append({key_col: k, **_estimate(regs)})
        return pd.DataFrame(rows)

    parts = ds.select_columns([key_col, col]) \
        .map_batches(partial, batch_format="pyarrow")
    return bucketed_group_reduce(parts, [key_col], reduce_fn,
                                 num_partitions)


def heavy_hitters(ds, col: str, phi: float, *,
                  fold_batch: int = 64) -> pd.DataFrame:
    """EXACT phi-heavy hitters (values with frequency > phi*n) without a
    full-cardinality groupby.  Pass 1 builds per-batch Misra-Gries
    summaries with k = ceil(2/phi) counters; MG summaries are mergeable
    (sum matching counters, re-compress by subtracting the (k+1)-th
    largest — Agarwal et al. 2012), and the merged summary undercounts
    any value by at most n/(k+1) < phi*n/2, so every true heavy hitter
    survives as a candidate.  Pass 2 re-counts ONLY the <=k candidate
    keys exactly (tiny per-batch count vectors, summed driver-side) and
    keeps those with exact count > phi*n — byte-identical to SQL
    ``GROUP BY col HAVING count(*) > phi*n``.

    Scale shape: pass-1 partials are <=k (key, cnt) rows per batch
    regardless of column cardinality (the whole point vs keyed_count on
    a 10^9-distinct key: no all-to-all of every key, no reducer-side
    cardinality blowup); pass-2 ships one <=k-slot int64 vector per
    batch.  Null values are excluded on both sides.  The reference's
    duplicates/profiling packs compute full value_counts in one process
    (duplicates_finder_pack/main.py:161-173) — this is the streaming
    answer for columns whose distinct count doesn't fit anywhere.
    """
    from packs_ray.stages.util import round_half_away

    if not (0.0 < phi < 1.0):
        raise ValueError("phi must be in (0, 1)")
    k = int(math.ceil(2.0 / phi))

    def _compress(keys: np.ndarray, cnts: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
        if len(keys) <= k:
            return keys, cnts
        # subtract the (k+1)-th largest count; keep strictly positive
        kth = np.partition(cnts, len(cnts) - (k + 1))[len(cnts) - (k + 1)]
        keep = cnts - kth > 0
        return keys[keep], cnts[keep] - kth

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(col).cast(pa.string())
        vc = pc.value_counts(pc.drop_null(s))
        keys = np.asarray(vc.field("values").to_pandas(), dtype=object)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys, cnts = _compress(keys, cnts)
        return pa.table({"key": pa.array(list(keys), type=pa.string()),
                         "cnt": pa.array(cnts, type=pa.int64())})

    def fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("key", sort=True, as_index=False).agg(
            cnt=("cnt", "sum"))
        keys, cnts = _compress(np.asarray(g["key"], dtype=object),
                               g["cnt"].to_numpy(dtype=np.int64))
        return pa.table({"key": pa.array(list(keys), type=pa.string()),
                         "cnt": pa.array(cnts, type=pa.int64())})

    # pass 1: candidate keys only (exact n is counted in pass 2)
    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow",
                          batch_size=fold_batch).to_pandas())
    if len(parts):
        g = parts.groupby("key", sort=True, as_index=False).agg(
            cnt=("cnt", "sum"))
        cand, _ = _compress(np.asarray(g["key"], dtype=object),
                            g["cnt"].to_numpy(dtype=np.int64))
    else:
        cand = np.asarray([], dtype=object)
    cand = np.asarray(sorted(cand), dtype=object)
    empty = pd.DataFrame({"key": pd.Series([], dtype="string"),
                          "count": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "share": pd.Series([], dtype="float64")})
    if len(cand) == 0:
        return empty

    # pass 2: exact counts for the <=k candidates + exact non-null n
    cand_list = [str(c) for c in cand]

    def exact(batch: pa.Table) -> pa.Table:
        s = pc.drop_null(batch.column(col).cast(pa.string()))
        idx = pc.fill_null(
            pc.index_in(s, pa.array(cand_list, type=pa.string())), -1)
        pos = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        pos = pos[pos >= 0]
        vec = np.bincount(pos, minlength=len(cand_list)).astype(np.int64)
        return pa.table({"vec": pa.array([vec.tolist()],
                                         type=pa.list_(pa.int64())),
                         "n": pa.array([len(s)], type=pa.int64())})

    ex = ds.select_columns([col]).map_batches(
        exact, batch_format="pyarrow").to_pandas()
    if not len(ex):
        return empty
    n = int(ex["n"].sum())
    counts = np.zeros(len(cand_list), dtype=np.int64)
    for v in ex["vec"]:
        counts += np.asarray(v, dtype=np.int64)
    keep = counts.astype(np.float64) > phi * float(n)
    out = pd.DataFrame({"key": np.asarray(cand_list, dtype=object)[keep],
                        "count": counts[keep], "n": n,
                        "share": round_half_away(
                            counts[keep].astype(np.float64) / float(n), 6)})
    out = out.sort_values(["count", "key"],
                          ascending=[False, True]).reset_index(drop=True)
    return out.astype({"count": "int64", "n": "int64"})


def save_distinct_state(ds, columns: list[str], path: str,
                        *, fold_batch: int = 256) -> str:
    """Persist the mergeable HLL register state of a run: one parquet
    row per column — (column, regs list<uint8>[4096]) — so cardinality
    monitoring is INCREMENTAL across snapshots: each ingest saves its
    own 4 KB/column state, and ``merged_distinct`` answers "distinct
    over all runs so far" by an elementwise register max, never
    rescanning history.  (Register max over a union of streams equals
    the union's registers — HLL's defining property.)"""
    import os

    import pyarrow.parquet as pq

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "column": pa.array(columns),
            "regs": pa.array([_registers(batch.column(c)).tolist()
                              for c in columns],
                             type=pa.list_(pa.uint8()))})

    def fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_c, out_r = [], []
        for c, grp in df.groupby("column", sort=True):
            regs = np.stack([np.asarray(r, dtype=np.uint8)
                             for r in grp["regs"]]).max(axis=0)
            out_c.append(c)
            out_r.append(regs.tolist())
        return pa.table({"column": pa.array(out_c),
                         "regs": pa.array(out_r,
                                          type=pa.list_(pa.uint8()))})

    parts = (ds.select_columns(columns)
             .map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow",
                          batch_size=fold_batch).to_pandas())
    rows_c, rows_r = [], []
    for c in columns:
        grp = parts[parts["column"] == c] if len(parts) else parts
        regs = (np.stack([np.asarray(r, dtype=np.uint8)
                          for r in grp["regs"]]).max(axis=0)
                if len(grp) else np.zeros(M, dtype=np.uint8))
        rows_c.append(c)
        rows_r.append(regs.tolist())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(pa.table({
        "column": pa.array(rows_c),
        "regs": pa.array(rows_r, type=pa.list_(pa.uint8()))}),
        path + ".tmp")
    os.replace(path + ".tmp", path)   # atomic: resume-safe
    return path


def merged_distinct(paths: list[str]) -> pd.DataFrame:
    """Merge persisted HLL states (see ``save_distinct_state``) and
    estimate: one row per column — (column, approx_distinct,
    zero_registers, harmonic_scaled), identical to running
    ``approx_distinct`` over the concatenation of all runs."""
    import pyarrow.parquet as pq

    acc: dict[str, np.ndarray] = {}
    for p in paths:
        t = pq.read_table(p)
        for c, r in zip(t.column("column").to_pylist(),
                        t.column("regs").to_pylist()):
            r = np.asarray(r, dtype=np.uint8)
            acc[c] = np.maximum(acc[c], r) if c in acc else r
    rows = [{"column": c, **_estimate(r)}
            for c, r in sorted(acc.items())]
    return pd.DataFrame(rows)


def decayed_heavy_hitters(ds, key_col: str, ts_col: str, *,
                          half_life_days: float = 7.0, k: int = 10,
                          num_partitions: int | None = None) -> "pd.DataFrame":
    """Exponentially time-decayed top-k keys: score(key) =
    Σ_days cnt(key, day) · 0.5^((D_max − day) / half_life) — the
    trending/recency ranking :func:`heavy_hitters` (all-time phi-heavy)
    cannot give: a key hammering the feed THIS week outranks a bigger
    but stale historical key.

    Determinism: day counts are exact ints; the decay weight is
    libm pow on an integer age (identical on both sides); the per-key
    fold runs ascending day — a bounded (≤ day-span terms) Python
    float loop inside the bucketed reduce, == the oracle's
    ``list_sum(list(term ORDER BY day))``.  Ranking is
    (score 6dp DESC, key ASC), so ties are stable.

    Scale shape: ONE bucketed (key, day) count reduce (keys stay
    distributed; the fold happens inside each bucket), a narrow
    global-max-day pre-scan, then per-bucket top-k partials — only
    buckets × k rows land on the driver.

    Output: top-k (key, n_total, decayed) rows."""
    import math

    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _rh

    def day_marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, ts_col])
        mask = pc.and_(batch.column(key_col).is_valid(),
                       batch.column(ts_col).is_valid())
        batch = batch.filter(mask)
        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({key_col: batch.column(key_col).to_numpy(
            zero_copy_only=False),
            "day": us // np.int64(86_400_000_000)})
        g = (df.groupby([key_col, "day"], sort=False).size()
             .reset_index(name="cnt"))
        return _table_from_pandas(g, preserve_index=False)

    marks = ds.map_batches(day_marks, batch_format="pyarrow") \
        .materialize()
    if num_partitions is None:
        num_partitions = reduce_partition_count(marks)
    if marks.count() == 0:
        return pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "n_total": pd.Series([], dtype="int64"),
                             "decayed": pd.Series([], dtype="float64")})
    d_max = int(marks.max("day"))
    hl = float(half_life_days)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby([key_col, "day"], sort=False)["cnt"].sum()
             .reset_index().sort_values([key_col, "day"], kind="stable"))
        rows = []
        for key, gg in g.groupby(key_col, sort=False):
            s = 0.0
            for day, cnt in zip(gg["day"].to_numpy(np.int64),
                                gg["cnt"].to_numpy(np.int64)):
                s += cnt * math.pow(0.5, (d_max - day) / hl)
            rows.append((key, int(gg["cnt"].sum()), s))
        out = pd.DataFrame(rows, columns=[key_col, "n_total", "decayed"])
        out["decayed"] = _rh(out["decayed"].to_numpy(np.float64), 6)
        # bucket-local top-k partial: global winner must be in some
        # bucket's local top-k
        return (out.sort_values(["decayed", key_col],
                                ascending=[False, True], kind="stable")
                .head(k))

    parts = bucketed_group_reduce(marks, [key_col], per_bucket,
                                  num_partitions).to_pandas()
    return (parts.sort_values(["decayed", key_col],
                              ascending=[False, True], kind="stable")
            .head(k).reset_index(drop=True)
            .astype({"n_total": "int64", "decayed": "float64"}))


def _cms_matrix(ds, col: str, *, fold_batch: int = 64) -> "np.ndarray":
    """(CMS_D, CMS_W) merged counter matrix of a column stream (the
    count_min_counts partial/fold shape, returned raw)."""
    def partial(batch: pa.Table) -> pa.Table:
        cnt = _cms_counters(batch.column(col))
        return pa.table({"cnt": pa.array([cnt.ravel().tolist()],
                                         type=pa.list_(pa.int64()))})

    def fold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(CMS_D * CMS_W, dtype=np.int64)
        for r in batch.column("cnt").to_pylist():
            acc += np.asarray(r, dtype=np.int64)
        return pa.table({"cnt": pa.array([acc.tolist()],
                                         type=pa.list_(pa.int64()))})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow",
                          batch_size=fold_batch).to_pandas())
    cnt = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for r in parts["cnt"] if len(parts) else ():
        cnt += np.asarray(r, dtype=np.int64)
    return cnt.reshape(CMS_D, CMS_W)


def cms_join_size(ds_a, col_a: str, ds_b, col_b: str) -> pd.DataFrame:
    """Equi-join SIZE estimate without running the join: the classic
    count-min inner-product estimator |A ⋈ B| ≈ min_j Σ_pos
    cntA[j][pos]·cntB[j][pos] (an upper bound in expectation within
    nA·nB/CMS_W per row) — the planner statistic that decides
    broadcast-vs-shuffle-vs-skew-salt BEFORE paying for the exchange,
    from two fixed 128 KB sketches instead of a key-cardinality scan.

    Null join keys never enter the sketches (they never match).  All
    counters are exact ints; the per-row dot products accumulate in
    Python ints (no overflow at any stream length), so the estimate is
    bit-deterministic and the oracle replicates it cell-for-cell.

    Output: one row (n_a, n_b, est_join_rows)."""
    def nn(ds, col):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({"x": batch.column(col).drop_null()})
        return ds.select_columns([col]).map_batches(
            f, batch_format="pyarrow")

    A = _cms_matrix(nn(ds_a, col_a), "x")
    B = _cms_matrix(nn(ds_b, col_b), "x")
    n_a = int(A[0].sum())
    n_b = int(B[0].sum())
    dots = []
    for j in range(CMS_D):
        dots.append(sum(int(x) * int(y)
                        for x, y in zip(A[j], B[j]) if x and y))
    return pd.DataFrame([{
        "n_a": np.int64(n_a), "n_b": np.int64(n_b),
        "est_join_rows": np.int64(min(dots))}])
