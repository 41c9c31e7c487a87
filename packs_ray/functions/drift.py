"""Data-drift (KS test) and tolerant compare checks.

Reference: data_drift_pack/main.py:41-70 (ks_2samp per shared numeric
column, score = mean(p >= 0.05)); data_compare_pack/main.py:219-351
(datacompy-style join on id columns, abs/rel tolerance compare,
precision/recall/F1).

Scale: the KS statistic is computed from per-batch sorted-value partials
merged on the driver (only the compared column streams); compare is a
broadcast join while the target fits COMPARE_BROADCAST_CAP rows and a
hash-bucketed co-partition join above it (neither table materializes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def _column_values(ds, column: str, cap: int = 2_000_000,
                   seed: int = 42) -> tuple[np.ndarray, bool]:
    """Collect one numeric column; above ``cap`` rows a seeded random
    sample of ~cap values is taken instead (the reference itself caps its
    inputs by head-sampling, profiling_pack/main.py:26-28 — we sample
    uniformly and keep the KS p-value valid for the sampled sizes).
    Returns (values, sampled)."""
    proj = ds.select_columns([column])
    n = proj.count()
    sampled = bool(n and n > cap)
    if sampled:
        proj = proj.random_sample(cap / n, seed=seed)
    return np.concatenate([
        b.column(column).drop_null().to_numpy(zero_copy_only=False)
        for b in proj.iter_batches(batch_size=65536, batch_format="pyarrow")
    ] or [np.array([])]), sampled


def ks_2sample(ds_a, ds_b, column: str) -> pd.DataFrame:
    """Exact two-sample KS statistic + asymptotic p-value (public
    Smirnov formula; matches scipy.stats.ks_2samp(mode='asymp')).
    Exact below the _column_values cap; sampled above it — the
    ``sampled`` output column says which, so a consumer knows the
    p-value is an estimate over ~cap draws rather than the full data."""
    av, sa = _column_values(ds_a, column)
    bv, sb = _column_values(ds_b, column)
    a, b = np.sort(av), np.sort(bv)
    sampled = sa or sb
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        # degenerate sample: no evidence of drift (scipy would raise)
        return pd.DataFrame([{"column": column, "ks_stat": 0.0,
                              "p_value": 1.0, "drifted": False,
                              "sampled": sampled}])
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side="right") / n
    cdf_b = np.searchsorted(b, allv, side="right") / m
    d = float(np.abs(cdf_a - cdf_b).max())
    en = np.sqrt(n * m / (n + m))
    lam = (en + 0.12 + 0.11 / en) * d
    j = np.arange(1, 101)
    p = float(np.clip(2 * ((-1) ** (j - 1) * np.exp(-2 * (lam * j) ** 2)).sum(), 0, 1))
    return pd.DataFrame([{"column": column, "ks_stat": float(_r(d, 6)),
                          "p_value": float(_r(p, 6)), "drifted": p < 0.05,
                          "sampled": sampled}])


#: target rows above this switch compare_datasets to the hash-bucketed
#: co-partition path (the broadcast copy of the target must fit workers)
COMPARE_BROADCAST_CAP = 5_000_000


def _tol_mismatch(left: np.ndarray, right: np.ndarray, abs_tol: float,
                  rel_tol: float) -> np.ndarray:
    """datacompy tolerance: values match iff
    |a - b| <= abs_tol + rel_tol * |b|  (data_compare_pack/main.py:151,224
    via datacompy.columns_equal).  Returns a per-row any-column-mismatch
    boolean matrix reduced over axis 1 by callers."""
    return np.abs(left - right) > (abs_tol + rel_tol * np.abs(right))


def _dedup_target(tgt: pd.DataFrame, id_cols: list[str]) -> pd.DataFrame:
    """Index the target on its id columns, keeping the FIRST row per
    duplicated id (datacompy tolerates duplicate join keys; we resolve
    them to one representative instead of crashing on a re-expanding
    ``.loc``).  Order is file order in the broadcast path; within-bucket
    arrival order in the bucketed path."""
    return (tgt.drop_duplicates(subset=id_cols, keep="first")
            .set_index(id_cols))


def _match_counts(src: pd.DataFrame, tgt_idx: pd.DataFrame,
                  id_cols: list[str], value_cols: list[str],
                  abs_tol: float, rel_tol: float = 0.0) -> tuple[int, int, int]:
    """(source_rows, common, mismatched) for one source chunk against a
    UNIQUE-indexed target — the shared kernel of both compare paths.
    Duplicate source ids each count (and each compare against the
    target's representative row)."""
    key = pd.MultiIndex.from_frame(src[id_cols]) if len(id_cols) > 1 \
        else pd.Index(src[id_cols[0]])
    mask = key.isin(tgt_idx.index)
    mismatched = 0
    if mask.any():
        left = src.loc[mask, value_cols].to_numpy(dtype=float)
        right = tgt_idx.loc[key[mask], value_cols].to_numpy(dtype=float)
        mismatched = int(_tol_mismatch(left, right, abs_tol, rel_tol)
                         .any(axis=1).sum())
    return len(src), int(mask.sum()), mismatched


def _broadcast_target_idx(target_ds, id_cols, value_cols):
    tgt = target_ds.select_columns(id_cols + value_cols).to_pandas()
    if tgt.empty:  # 0-row collect loses the schema; restore the columns
        tgt = pd.DataFrame(columns=id_cols + value_cols)
    return _dedup_target(tgt, id_cols)


def _compare_broadcast(source_ds, target_ds, id_cols, value_cols, abs_tol,
                       rel_tol=0.0):
    """Small target: collect+index it ONCE, ship via ray.put, stream the
    source through map_batches."""
    tgt_idx = _broadcast_target_idx(target_ds, id_cols, value_cols)
    ref = ray.put(tgt_idx)

    def partial(batch):
        import pyarrow as pa
        t = ray.get(ref)
        n, c, m = _match_counts(batch.to_pandas(), t, id_cols, value_cols,
                                abs_tol, rel_tol)
        return pa.table({"source_rows": [n], "common": [c], "mismatched": [m]})

    parts = source_ds.select_columns(id_cols + value_cols).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # 0-row source: no partials ran
        return (0, len(tgt_idx), 0, 0)
    return (int(parts["source_rows"].sum()), len(tgt_idx),
            int(parts["common"].sum()), int(parts["mismatched"].sum()))


def _cobucketed_frames(source_ds, target_ds, id_cols, value_cols,
                       per_bucket_fn, num_partitions: int | None = None):
    """Shared large-large machinery: co-partition BOTH sides on the
    id-key hash (mirrors integrity._orphans_bucketed) and run
    ``per_bucket_fn(src_frame, tgt_frame) -> DataFrame`` once per bucket —
    neither table is ever materialized whole."""
    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = max(reduce_partition_count(source_ds),
                             reduce_partition_count(target_ds))

    def mark(side: int):
        def fn(batch):
            import pyarrow as pa
            df = batch.to_pandas()
            h = pd.util.hash_pandas_object(df[id_cols], index=False).to_numpy()
            out = df[id_cols + value_cols].copy()
            out["__side"] = np.int8(side)
            out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
            return _table_from_pandas(out, preserve_index=False)
        return fn

    src = source_ds.select_columns(id_cols + value_cols).map_batches(
        mark(0), batch_format="pyarrow")
    tgt = target_ds.select_columns(id_cols + value_cols).map_batches(
        mark(1), batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side"].to_numpy()
        return per_bucket_fn(g.loc[side == 0, id_cols + value_cols],
                             g.loc[side == 1, id_cols + value_cols])

    return (src.union(tgt).groupby("__p")
            .map_groups(reduce_fn, batch_format="pandas").to_pandas())


def _compare_bucketed(source_ds, target_ds, id_cols, value_cols, abs_tol,
                      rel_tol=0.0, num_partitions: int | None = None):
    def per_bucket(s: pd.DataFrame, t: pd.DataFrame) -> pd.DataFrame:
        t_idx = _dedup_target(t, id_cols)
        n, c, m = _match_counts(s, t_idx, id_cols, value_cols, abs_tol, rel_tol)
        return pd.DataFrame({"source_rows": [n], "target_rows": [len(t_idx)],
                             "common": [c], "mismatched": [m]})

    parts = _cobucketed_frames(source_ds, target_ds, id_cols, value_cols,
                               per_bucket, num_partitions)
    return (int(parts["source_rows"].sum()), int(parts["target_rows"].sum()),
            int(parts["common"].sum()), int(parts["mismatched"].sum()))


def _mismatch_frame(src: pd.DataFrame, tgt_idx: pd.DataFrame,
                    id_cols: list[str], value_cols: list[str],
                    abs_tol: float, rel_tol: float,
                    cap: int) -> pd.DataFrame:
    """Mismatch rows of one source chunk vs a unique-indexed target chunk:
    one output row per (id, value column) beyond tolerance; truncated to
    the ``cap`` smallest ids (ascending id then column order) so every
    chunk's contribution is bounded."""
    key = pd.MultiIndex.from_frame(src[id_cols]) if len(id_cols) > 1 \
        else pd.Index(src[id_cols[0]])
    mask = key.isin(tgt_idx.index)
    out = {c: [] for c in id_cols + ["column", "source_value", "target_value"]}
    if mask.any():
        common = key[mask]
        left = src.loc[mask, value_cols]
        right = tgt_idx.loc[common, value_cols]
        for c in value_cols:
            lv = left[c].to_numpy(dtype=float)
            rv = right[c].to_numpy(dtype=float)
            bad = _tol_mismatch(lv, rv, abs_tol, rel_tol)
            if bad.any():
                ids = common[bad]
                for j, k in enumerate(id_cols):
                    vals = (ids.get_level_values(j) if len(id_cols) > 1
                            else ids)
                    out[k].extend(vals.tolist())
                n = int(bad.sum())
                out["column"].extend([c] * n)
                out["source_value"].extend(lv[bad].tolist())
                out["target_value"].extend(rv[bad].tolist())
    df = pd.DataFrame(out)
    return (df.sort_values(id_cols + ["column"], kind="stable").head(cap)
            if len(df) else df)


_MISMATCH_EMPTY_TYPES = {"column": "object", "source_value": "float64",
                         "target_value": "float64"}


def _empty_mismatch(id_cols: list[str]) -> pd.DataFrame:
    return pd.DataFrame({
        **{k: pd.Series([], dtype="int64") for k in id_cols},
        **{k: pd.Series([], dtype=t) for k, t in _MISMATCH_EMPTY_TYPES.items()}})


def compare_mismatch_rows(source_ds, target_ds, id_cols: list[str],
                          value_cols: list[str], abs_tol: float = 1e-4,
                          rel_tol: float = 0.0, export_cap: int = 10_000,
                          broadcast_cap: int | None = None) -> pd.DataFrame:
    """Row-level mismatch export (datacompy ``all_mismatch`` semantics,
    data_compare_pack/main.py:369-406): one row per (id, value column)
    whose values differ beyond ``abs_tol + rel_tol*|target|`` on rows
    present in BOTH tables — head-capped at ``export_cap`` (reference
    :27) in ascending id order so the cap is deterministic.

    Scale: broadcast-indexed target + streamed source while the target
    fits ``broadcast_cap`` rows (default COMPARE_BROADCAST_CAP); above it
    the hash-bucketed co-partition path emits per-bucket mismatch rows,
    each bucket capped at ``export_cap``, so the driver collects at most
    buckets x export_cap rows before the final deterministic head."""
    import pyarrow as pa

    if broadcast_cap is None:
        broadcast_cap = COMPARE_BROADCAST_CAP
    cols = id_cols + ["column", "source_value", "target_value"]
    try:
        trows = target_ds.count()  # parquet metadata only
    except Exception:
        trows = None

    if trows is not None and trows > broadcast_cap:
        def per_bucket(s: pd.DataFrame, t: pd.DataFrame) -> pd.DataFrame:
            out = _mismatch_frame(s, _dedup_target(t, id_cols), id_cols,
                                  value_cols, abs_tol, rel_tol, export_cap)
            return out if len(out) else _empty_mismatch(id_cols)

        parts = _cobucketed_frames(source_ds, target_ds, id_cols, value_cols,
                                   per_bucket)
    else:
        tgt_idx = _broadcast_target_idx(target_ds, id_cols, value_cols)
        ref = ray.put(tgt_idx)

        def partial(batch):
            t = ray.get(ref)
            out = _mismatch_frame(batch.to_pandas(), t, id_cols, value_cols,
                                  abs_tol, rel_tol, export_cap)
            if not len(out):
                types = {**{k: pa.int64() for k in id_cols},
                         "column": pa.string(), "source_value": pa.float64(),
                         "target_value": pa.float64()}
                return pa.table({k: pa.array([], type=types[k]) for k in cols})
            return _table_from_pandas(out, preserve_index=False)

        parts = source_ds.select_columns(id_cols + value_cols).map_batches(
            partial, batch_format="pyarrow").to_pandas()

    if parts.empty:
        return _empty_mismatch(id_cols)
    return (parts[cols].sort_values(id_cols + ["column"], kind="stable")
            .head(export_cap).reset_index(drop=True))


def compare_datasets(source_ds, target_ds, id_cols: list[str],
                     value_cols: list[str], abs_tol: float = 1e-4,
                     rel_tol: float = 0.0,
                     broadcast_cap: int = COMPARE_BROADCAST_CAP,
                     num_partitions: int | None = None) -> pd.DataFrame:
    """datacompy-semantics compare: row-match sets on id columns +
    per-column tolerance compare (match iff |a-b| <= abs_tol +
    rel_tol*|b|); precision = common/target_rows, recall =
    common/source_rows, F1 (data_compare_pack/main.py:303-351).

    Broadcast join while the target fits ``broadcast_cap`` rows; above it
    both sides co-partition on the id-key hash (no full materialization
    of either table anywhere)."""
    try:
        trows = target_ds.count()  # parquet metadata only
    except Exception:
        trows = None
    if trows is not None and trows > broadcast_cap:
        source_rows, target_rows, common, mism = _compare_bucketed(
            source_ds, target_ds, id_cols, value_cols, abs_tol, rel_tol,
            num_partitions)
    else:
        source_rows, target_rows, common, mism = _compare_broadcast(
            source_ds, target_ds, id_cols, value_cols, abs_tol, rel_tol)
    precision = common / target_rows if target_rows else 0.0
    recall = common / source_rows if source_rows else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return pd.DataFrame([{
        "source_rows": source_rows, "target_rows": target_rows,
        "rows_in_common": common, "rows_mismatched": mism,
        "precision": float(_r(precision, 4)), "recall": float(_r(recall, 4)),
        "f1": float(_r(f1, 4)),
    }])


def psi_drift(ds_a, ds_b, column: str, *, n_bins: int = 10,
              threshold: float = 0.2) -> pd.DataFrame:
    """Population Stability Index between a baseline and a comparison
    dataset over one numeric column — the standard production drift
    score next to ``ks_2sample`` (same data_drift_pack shape,
    data_drift_pack/main.py:41-70, different statistic: PSI is
    binned and threshold-interpretable, 0.1 = moderate / 0.2 = major
    shift).

    Bins are ``n_bins`` fixed-width intervals from the BASELINE's
    global min/max with the engine's histogram boundary expression
    ``min(max(floor((x - lo) / w), 0), n-1)`` (histogram(),
    profiling.py) so the SQL replica reproduces every boundary;
    comparison values outside the baseline range clamp into the edge
    bins.  Proportions are floored at 1e-6 before the log ratio (the
    standard zero-bin guard).  Fully streaming: two scans of the one
    column per side (min/max + bincount partials), nothing lands on
    the driver but 2*n_bins counts — no value collect, no cap, unlike
    the KS path.  ``psi`` is 6dp-pinned; ``drifted`` compares the
    rounded value so the verdict is bit-stable too."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from packs_ray.functions.agg import global_agg

    def mpartial(batch: pa.Table) -> dict:
        v = batch.column(column).drop_null()
        return {"n": len(v),
                "mn": pc.min(v).as_py() if len(v) else None,
                "mx": pc.max(v).as_py() if len(v) else None}

    def mcombine(parts: pd.DataFrame) -> dict:
        n = int(parts["n"].sum())
        return {"n": n, "mn": float(parts["mn"].min()) if n else 0.0,
                "mx": float(parts["mx"].max()) if n else 0.0}

    sch = pa.schema([(column, pa.float64())])
    agg = global_agg(ds_a.select_columns([column]), mpartial, mcombine,
                     empty_schema=sch)
    lo, hi, n_a = agg["mn"], agg["mx"], agg["n"]
    # guard on w (not hi > lo): a subnormal range underflows the
    # division to 0.0 and would NaN the bin expression
    w = (hi - lo) / n_bins
    if not w > 0:
        w = 1.0

    def hpartial(batch: pa.Table) -> dict:
        v = batch.column(column).drop_null() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.minimum(np.maximum(np.floor((v - lo) / w), 0),
                         n_bins - 1).astype(np.int64)
        return {"h": np.bincount(idx, minlength=n_bins).tobytes()}

    def hcombine(parts: pd.DataFrame) -> dict:
        tot = np.zeros(n_bins, dtype=np.int64)
        for b in parts["h"].dropna():
            tot += np.frombuffer(b, dtype=np.int64)
        return {"h": tot}

    def counts(ds) -> np.ndarray:
        return global_agg(ds.select_columns([column]), hpartial,
                          hcombine, empty_schema=sch)["h"]

    ca = counts(ds_a) if n_a else np.zeros(n_bins, dtype=np.int64)
    cb = counts(ds_b)
    n_b = int(cb.sum())
    if n_a == 0 or n_b == 0:
        return pd.DataFrame([{"column": column, "psi": np.nan,
                              "drifted": False, "n_bins": n_bins}])
    pa_ = np.maximum(ca / n_a, 1e-6)
    pb_ = np.maximum(cb / n_b, 1e-6)
    psi = float(_r(np.sum((pa_ - pb_) * np.log(pa_ / pb_)), 6))
    return pd.DataFrame([{"column": column, "psi": psi,
                          "drifted": bool(psi >= threshold),
                          "n_bins": np.int64(n_bins)}])


def categorical_drift(ds_a, ds_b, column: str, *,
                      psi_threshold: float = 0.2) -> pd.DataFrame:
    """Distribution drift for a CATEGORICAL column — the gap
    ``ks_2sample`` (numeric ECDF) and ``psi_drift`` (numeric bins)
    leave open: per-category counts on both sides, then the two-sample
    chi-square homogeneity statistic, Cramér's V effect size, and
    categorical PSI over the union of observed categories (1e-6
    proportion floor, categories absent from one side count as zero).

    Scale shape: each side runs one ``keyed_count`` (per-batch partial
    counts, bucketed sum reduce); only the per-CATEGORY count tables —
    bounded by the category cardinality, not the row count — land on
    the driver for the closed-form statistics.  Nulls are excluded (a
    missing label is a completeness problem, not a drift signal).  All
    emitted floats are 6dp-pinned."""
    from packs_ray.functions.agg import keyed_count

    def counts(ds) -> pd.DataFrame:
        import pyarrow.compute as pc_

        nn = ds.select_columns([column]).map_batches(
            lambda t: t.filter(pc_.is_valid(t.column(column))),
            batch_format="pyarrow")
        return keyed_count(nn, [column]).to_pandas()

    a, b = counts(ds_a), counts(ds_b)
    n_a, n_b = int(a["cnt"].sum()) if len(a) else 0, \
        int(b["cnt"].sum()) if len(b) else 0
    if n_a == 0 or n_b == 0:
        return pd.DataFrame([{"column": column, "n_categories": np.int64(0),
                              "chi2": np.nan, "cramers_v": np.nan,
                              "psi": np.nan, "drifted": False}])
    m = a.merge(b, on=column, how="outer", suffixes=("_a", "_b")) \
        .fillna({"cnt_a": 0, "cnt_b": 0}).sort_values(column)
    ca = m["cnt_a"].to_numpy(dtype=np.float64)
    cb = m["cnt_b"].to_numpy(dtype=np.float64)
    k = len(m)
    n = float(n_a + n_b)
    # homogeneity chi-square over the 2xk table (expected from pooled)
    pool = (ca + cb) / n
    ea, eb = n_a * pool, n_b * pool
    chi2 = float(np.sum((ca - ea) ** 2 / ea) + np.sum((cb - eb) ** 2 / eb))
    v = float(np.sqrt(chi2 / n)) if k > 1 else 0.0
    pa_ = np.maximum(ca / n_a, 1e-6)
    pb_ = np.maximum(cb / n_b, 1e-6)
    psi = float(_r(np.sum((pa_ - pb_) * np.log(pa_ / pb_)), 6))
    return pd.DataFrame([{"column": column, "n_categories": np.int64(k),
                          "chi2": float(_r(chi2, 6)),
                          "cramers_v": float(_r(v, 6)),
                          "psi": psi,
                          "drifted": bool(psi >= psi_threshold)}])


def snapshot_diff(old_ds, new_ds, keys: list[str],
                  value_cols: list[str], *,
                  num_partitions: int | None = None):
    """Keyed CDC diff between two snapshots of one table: per key —
    ``added`` (new only), ``removed`` (old only), ``changed`` (present
    in both, any value column differs under SQL ``IS DISTINCT FROM``
    semantics, i.e. null == null) or ``unchanged``.

    The row-level complement of ``compare_datasets`` (which rolls the
    same comparison up into precision/recall/F1): the crawl-refresh /
    table-sync primitive.  Keys must be unique per side (snapshot
    primary key — the caller's contract).  Both sides project to
    ``keys + value_cols`` and co-partition on the key hash: one narrow
    shuffle per side, one vectorized outer merge per bucket, full rows
    never move twice."""
    import numpy as np
    import pyarrow as pa

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)

    if num_partitions is None:
        num_partitions = max(row_shuffle_partitions(old_ds),
                             row_shuffle_partitions(new_ds))
    cols = keys + value_cols

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(cols)
            return t.append_column("__side", pa.array(
                np.full(len(t), side, dtype=np.int8)))
        return fn

    both = (old_ds.map_batches(tag(0), batch_format="pyarrow")
            .union(new_ds.map_batches(tag(1), batch_format="pyarrow")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["__side"] == 0].drop(columns="__side")
        new = g[g["__side"] == 1].drop(columns="__side")
        m = old.merge(new, on=keys, how="outer", indicator=True,
                      suffixes=("_old", "_new"))
        status = np.where(m["_merge"] == "right_only", "added",
                          np.where(m["_merge"] == "left_only",
                                   "removed", "unchanged")).astype(object)
        in_both = (m["_merge"] == "both").to_numpy()
        changed = np.zeros(len(m), dtype=bool)
        for c in value_cols:
            a, b = m[f"{c}_old"], m[f"{c}_new"]
            neq = (a != b) & ~(a.isna() & b.isna())   # IS DISTINCT FROM
            changed |= neq.to_numpy()
        status[in_both & changed] = "changed"
        out = m[keys].copy()
        out["status"] = status
        return out

    return bucketed_group_reduce(both, keys, per_bucket, num_partitions)


def rolling_psi(ds, ts_col: str, value_col: str, *, period: str = "day",
                n_bins: int = 10, threshold: float = 0.2):
    """Drift over TIME: Population Stability Index of each period's
    value distribution against the whole dataset's baseline — the
    monitoring view ``psi_drift`` (two fixed datasets) doesn't cover
    (reference shape: data_drift_pack run per scheduled ingest; this
    folds the whole schedule into one pass).

    Bins are ``n_bins`` fixed-width intervals from the GLOBAL min/max
    with the shared histogram boundary expression, so the SQL replica
    reproduces every boundary.  Proportions are floored at 1e-6;
    ``psi`` is 6dp-pinned with a strict ascending-bin summation order
    shared with the oracle.

    Scale shape: one min/max scan, then one streaming pass emitting a
    (period, n_bins-bincount) partial per batch; only those fixed-size
    partials ride one bucketed reduce keyed on the period, and the
    bounded per-period table (periods, not rows) lands on the driver
    for the closed-form PSI.  Returns a pandas DataFrame of
    (period_start, n, psi, drifted) sorted by period_start.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce, global_agg,
                                         reduce_partition_count)

    def mpartial(batch: pa.Table) -> dict:
        # same null gate as the histogram pass: a row with a null ts
        # never reaches any bin, so it must not shape the baseline
        v = batch.filter(pc.and_(batch.column(ts_col).is_valid(),
                                 batch.column(value_col).is_valid())) \
            .column(value_col)
        return {"n": len(v),
                "mn": pc.min(v).as_py() if len(v) else None,
                "mx": pc.max(v).as_py() if len(v) else None}

    def mcombine(parts: pd.DataFrame) -> dict:
        n = int(parts["n"].sum())
        return {"n": n, "mn": float(parts["mn"].min()) if n else 0.0,
                "mx": float(parts["mx"].max()) if n else 0.0}

    sch = pa.schema([(ts_col, pa.timestamp("us")), (value_col, pa.float64())])
    narrow = ds.select_columns([ts_col, value_col])
    agg = global_agg(narrow, mpartial, mcombine, empty_schema=sch)
    lo, n_total = agg["mn"], agg["n"]
    w = (agg["mx"] - lo) / n_bins
    if not w > 0:
        w = 1.0

    def hpartial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(batch.column(ts_col).is_valid(),
                                     batch.column(value_col).is_valid()))
        per = pc.floor_temporal(batch.column(ts_col), unit=period)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        idx = np.minimum(np.maximum(np.floor((v - lo) / w), 0),
                         n_bins - 1).astype(np.int64)
        df = pd.DataFrame({"period_start": per.to_numpy(zero_copy_only=False),
                           "_b": idx})
        rows = [(p, np.bincount(g["_b"], minlength=n_bins).tobytes())
                for p, g in df.groupby("period_start", sort=True)]
        return pa.table({
            "period_start": pa.array([r[0] for r in rows],
                                     type=pa.timestamp("us")),
            "h": pa.array([r[1] for r in rows], type=pa.binary())})

    parts = narrow.map_batches(hpartial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for p, grp in g.groupby("period_start", sort=True):
            tot = np.zeros(n_bins, dtype=np.int64)
            for b in grp["h"]:
                tot += np.frombuffer(b, dtype=np.int64)
            rows.append((p, tot.tobytes()))
        return pd.DataFrame({"period_start": [r[0] for r in rows],
                             "h": [r[1] for r in rows]})

    per_period = bucketed_group_reduce(
        parts, ["period_start"], reduce_fn,
        reduce_partition_count(narrow)).to_pandas()
    if len(per_period) == 0 or n_total == 0:
        return pd.DataFrame({"period_start": pd.Series([], dtype="datetime64[us]"),
                             "n": pd.Series([], dtype="int64"),
                             "psi": pd.Series([], dtype="float64"),
                             "drifted": pd.Series([], dtype="bool")})
    per_period = per_period.sort_values("period_start").reset_index(drop=True)
    counts = np.stack([np.frombuffer(b, dtype=np.int64)
                       for b in per_period["h"]])
    g_counts = counts.sum(axis=0)
    pg = np.maximum(g_counts / n_total, 1e-6)
    out = []
    for i in range(len(per_period)):
        n_p = int(counts[i].sum())
        pp = np.maximum(counts[i] / n_p, 1e-6)
        # strict ascending-bin left-associative fold, shared with the
        # SQL list_reduce replica (np.sum's pairwise order would not be)
        psi = 0.0
        for t in ((pg - pp) * np.log(pg / pp)):
            psi += t
        psi = _r(psi, 6)
        out.append((per_period["period_start"].iloc[i], n_p, psi,
                    bool(psi >= threshold)))
    res = pd.DataFrame(out, columns=["period_start", "n", "psi", "drifted"])
    res["period_start"] = res["period_start"].astype("datetime64[us]")
    res["n"] = res["n"].astype(np.int64)
    return res


def mannwhitney_u(ds_a, ds_b, column: str,
                  num_partitions: int | None = None) -> pd.DataFrame:
    """Exact two-sample Mann-Whitney U (Wilcoxon rank-sum) with the
    standard tie corrections (Mann & Whitney 1947) — the nonparametric
    location-shift drift test beside :func:`ks_2sample`: U counts, over
    every cross pair, how often side A exceeds side B (ties count ½),
    so it reads a median shift where KS reads any CDF gap.  Null values
    are excluded.

    Exactness: U is assembled from exact per-value int64 count tables
    (U = Σ_v cA(v)·(cumB_less(v) + cB(v)/2) — no sampling, unlike the
    2M-capped ks_2sample); the z-score normalizes by the tie-corrected
    variance, one pinned float64 expression, 6dp.

    Partitioning assumption: the count tables are bounded by the
    DISTINCT value domain (quantized amounts/scores), not the row
    count — they, never the rows, reach the driver.

    Output: one row (n_a, n_b, u, z, auc) — ``auc`` = U/(n_a·n_b), the
    probability-of-superiority effect size."""
    import numpy as np

    from packs_ray.functions.agg import keyed_count
    from packs_ray.stages.util import round_half_away as _r

    def counts(ds) -> pd.Series:
        import pyarrow.compute as pc

        narrow = ds.select_columns([column]).map_batches(
            lambda t: t.filter(pc.is_valid(t.column(column))),
            batch_format="pyarrow")
        c = keyed_count(narrow, [column],
                        num_partitions=num_partitions).to_pandas()
        if c.empty or column not in c.columns:
            return pd.Series(dtype="int64")
        return (c.set_index(column)["cnt"].astype(np.int64)
                .sort_index())

    ca, cb = counts(ds_a), counts(ds_b)
    na, nb = int(ca.sum()), int(cb.sum())
    if na == 0 or nb == 0:
        return pd.DataFrame([{"n_a": np.int64(na), "n_b": np.int64(nb),
                              "u": np.nan, "z": np.nan, "auc": np.nan}])
    allv = ca.index.union(cb.index).sort_values()
    a = ca.reindex(allv, fill_value=0).to_numpy(dtype=np.float64)
    b = cb.reindex(allv, fill_value=0).to_numpy(dtype=np.float64)
    cum_b_less = np.concatenate([[0.0], np.cumsum(b)[:-1]])
    u = float((a * (cum_b_less + b / 2.0)).sum())
    n = float(na + nb)
    t = a + b
    tie = float((t * (t * t - 1.0)).sum())
    mu = na * nb / 2.0
    var = (na * nb / 12.0) * ((n + 1.0) - tie / (n * (n - 1.0)))
    z = (u - mu) / np.sqrt(var) if var > 0 else None
    return pd.DataFrame([{
        "n_a": np.int64(na), "n_b": np.int64(nb),
        "u": float(_r(u, 6)),
        "z": float(_r(z, 6)) if z is not None else None,
        "auc": float(_r(u / (na * nb), 6))}])


def js_divergence(ds_a, ds_b, text_col: str, *,
                  num_partitions: int | None = None) -> pd.DataFrame:
    """EXACT Jensen-Shannon divergence between the unigram
    distributions of two corpora — the symmetric, bounded-by-ln2
    distribution-shift score for "did this week's crawl change
    language" (KL blows up on unseen tokens; JS doesn't).  One summary
    row: (n_a, n_b, vocab_a, vocab_b, vocab_union, js_nats).

    Determinism: each token's contribution
    0.5*p*ln(p/m) + 0.5*q*ln(q/m) (m = (p+q)/2) is ONE pinned float64
    expression rounded half-away to integer NANO-nats; the cross-token
    sum is then exact int64 (|JS| <= ln2 so the total stays < 1e9 —
    float summation order can never flip a bit).  The SQL replica
    mirrors the expression and the nano-int pinning term for term.

    Scale shape: per-batch local token counts (value_counts combiner,
    same tokenizer contract as top_terms), ONE vocab-bounded token
    shuffle to merge counts, totals from the merged table, then a
    second tiny pass over the vocab table emits per-bucket int64
    contribution partials.  Text never shuffles."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)
    from packs_ray.stages.util import str_column

    if num_partitions is None:
        num_partitions = max(row_shuffle_partitions(ds_a),
                             row_shuffle_partitions(ds_b))
    ws_re = "[ \t\n\r\f\v]+"

    def counts(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            col = str_column(batch, text_col)
            trimmed = pc.utf8_trim(pc.fill_null(col, ""), " \t\n\r\f\v")
            lists = pc.split_pattern_regex(trimmed, ws_re)
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            off = lists.offsets.to_numpy().astype(np.int64)
            raw_lens = off[1:] - off[:-1]
            empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
            flat = lists.flatten().to_pandas().to_numpy()
            keep = np.ones(len(flat), dtype=bool)
            keep[(off[:-1] - off[0])[empty]] = False
            s = pd.Series(flat[keep]).value_counts()
            ca = s.to_numpy(dtype=np.int64)
            return pa.table({
                "token": pa.array(s.index.to_numpy(), type=pa.string()),
                "ca": pa.array(ca if side == "a"
                               else np.zeros(len(ca), dtype=np.int64)),
                "cb": pa.array(ca if side == "b"
                               else np.zeros(len(ca), dtype=np.int64))})
        return fn

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", sort=False, as_index=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum"))

    both = ds_a.select_columns([text_col]) \
        .map_batches(counts("a"), batch_format="pyarrow") \
        .union(ds_b.select_columns([text_col])
               .map_batches(counts("b"), batch_format="pyarrow"))
    vocab = bucketed_group_reduce(both, ["token"], merge,
                                  num_partitions).materialize()

    def tot_partial(batch: pa.Table) -> pa.Table:
        ca = batch.column("ca").to_numpy(zero_copy_only=False)
        cb = batch.column("cb").to_numpy(zero_copy_only=False)
        return pa.table({"na": [int(ca.sum())], "nb": [int(cb.sum())],
                         "va": [int((ca > 0).sum())],
                         "vb": [int((cb > 0).sum())],
                         "v": [len(ca)]})

    t = vocab.map_batches(tot_partial, batch_format="pyarrow").to_pandas()
    if not len(t):   # both corpora empty: no vocab blocks at all
        t = pd.DataFrame({"na": [], "nb": [], "va": [], "vb": [], "v": []})
    na, nb = int(t["na"].sum()), int(t["nb"].sum())
    va, vb, v = int(t["va"].sum()), int(t["vb"].sum()), int(t["v"].sum())
    if na == 0 or nb == 0:
        return pd.DataFrame({"n_a": [na], "n_b": [nb], "vocab_a": [va],
                             "vocab_b": [vb], "vocab_union": [v],
                             "js_nats": [0.0]})

    def contrib(batch: pa.Table) -> pa.Table:
        from packs_ray.stages.util import round_half_away
        ca = batch.column("ca").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cb = batch.column("cb").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        p = ca / float(na)
        q = cb / float(nb)
        m = 0.5 * (p + q)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = (np.where(ca > 0, 0.5 * p * np.log(p / m), 0.0)
                    + np.where(cb > 0, 0.5 * q * np.log(q / m), 0.0))
        u = round_half_away(term * 1e9, 0).astype(np.int64)
        return pa.table({"u": [int(u.sum())]})

    parts = vocab.map_batches(contrib, batch_format="pyarrow").to_pandas()
    total = int(parts["u"].sum()) if len(parts) else 0
    return pd.DataFrame({"n_a": [na], "n_b": [nb], "vocab_a": [va],
                         "vocab_b": [vb], "vocab_union": [v],
                         "js_nats": [float(total) / 1e9]})


def calibration_profile(ds, prob_col: str, label_col: str, *,
                        n_bins: int = 10) -> pd.DataFrame:
    """Probability-calibration audit of a scored dataset: reliability
    bins + ECE + Brier score (Guo et al. 2017 definitions) — the
    quality gate for any learned filter (langid confidence, NB quality
    classifier, toxicity score) whose probabilities drive keep/drop
    thresholds downstream.  The packs' score-rollup idea
    (profiling_pack/main.py:402-432 emits a dataset-level score from
    per-check rates) applied to a model column.

    Contract: ``prob_col`` is clipped into [0, 1]; ``label_col`` is a
    0/1 outcome; rows with a null in either column drop.  Probabilities
    are pinned to integer micro-units (1e-6 for the linear terms, 1e-4
    for the squared Brier terms) so every sum is an exact integer and
    the result is bit-identical at any parallelism; the SQL replica
    mirrors the same quantization.

    Output: one row per non-empty bin — (bin, n, mean_pred, frac_pos,
    gap) — plus the dataset-level ``ece`` (bin-weighted mean |gap|,
    summed in ascending-bin order) and ``brier`` repeated on every row,
    all 6dp-pinned, ordered by bin.

    Scale shape: one streaming scan; each batch emits four fixed-width
    int64 per-bin vectors (n, sum_p6, sum_y, sum_sq4), combined on the
    driver in arbitrary-precision Python ints — nothing but
    O(blocks * n_bins) integers ever move."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from packs_ray.functions.agg import global_agg
    from packs_ray.stages.util import round_half_away as _rh

    def partial(batch: pa.Table) -> dict:
        p = batch.column(prob_col)
        y = batch.column(label_col)
        mask = pc.and_(p.is_valid(), y.is_valid())
        p = np.minimum(np.maximum(
            p.filter(mask).to_numpy(zero_copy_only=False)
            .astype(np.float64), 0.0), 1.0)
        yv = y.filter(mask).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p6 = _rh(p * 1e6, 0).astype(np.int64)
        p4 = _rh(p * 1e4, 0).astype(np.int64)
        b = np.minimum(p6 * n_bins // 1_000_000, n_bins - 1)
        out = {"n": np.bincount(b, minlength=n_bins)}
        for k, v in (("sp6", p6), ("sy", yv),
                     ("sq4", (p4 - yv * 10_000) ** 2)):
            acc = np.zeros(n_bins, dtype=np.int64)
            np.add.at(acc, b, v)
            out[k] = acc
        return {k: v.astype(np.int64).tobytes() for k, v in out.items()}

    def combine(parts: pd.DataFrame) -> dict:
        tot = {k: [0] * n_bins for k in ("n", "sp6", "sy", "sq4")}
        for k in tot:
            for buf in parts[k].dropna():
                a = np.frombuffer(buf, dtype=np.int64)
                # python-int accumulation: sq4 sums overflow int64 at
                # ~1e12 rows; the oracle uses HUGEINT for the same sums
                for i in range(n_bins):
                    tot[k][i] += int(a[i])
        return {k: repr(v) for k, v in tot.items()}

    sch = pa.schema([(prob_col, pa.float64()), (label_col, pa.int64())])
    agg = global_agg(ds.select_columns([prob_col, label_col]),
                     partial, combine, empty_schema=sch)
    import ast

    n = [int(x) for x in ast.literal_eval(agg["n"])]
    sp6 = [int(x) for x in ast.literal_eval(agg["sp6"])]
    sy = [int(x) for x in ast.literal_eval(agg["sy"])]
    sq4 = [int(x) for x in ast.literal_eval(agg["sq4"])]
    total = sum(n)
    rows, ece_acc = [], 0.0
    for b in range(n_bins):
        if n[b] == 0:
            continue
        mp = float(sp6[b]) / (n[b] * 1e6)
        fp = float(sy[b]) / float(n[b])
        gap = abs(mp - fp)
        ece_acc += n[b] * gap          # ascending-bin order, both sides
        rows.append({"bin": np.int64(b), "n": np.int64(n[b]),
                     "mean_pred": float(_rh(mp, 6)),
                     "frac_pos": float(_rh(fp, 6)),
                     "gap": float(_rh(gap, 6))})
    if not rows:
        return pd.DataFrame({"bin": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             **{c: pd.Series([], dtype="float64")
                                for c in ("mean_pred", "frac_pos",
                                          "gap", "ece", "brier")}})
    ece = float(_rh(ece_acc / total, 6))
    brier = float(_rh(float(sum(sq4)) / (total * 1e8), 6))
    out = pd.DataFrame(rows)
    out["ece"] = ece
    out["brier"] = brier
    return out


def binary_eval(ds, score_col: str, label_col: str, *, decimals: int = 2,
                num_partitions: int | None = None) -> pd.DataFrame:
    """Exact threshold-sweep evaluation of a binary scorer — the
    ranking twin of :func:`calibration_profile` for the quality-model
    loop (the reference scores rows and thresholds at a fixed 0.5,
    ``outlier_detection_pack/main.py:201-260``; picking that threshold
    needs this sweep): tie-corrected ROC-AUC, average precision (the
    PR-curve area as the standard step-wise sum), and the best
    achievable F1 with the highest score attaining it.

    Exactness: scores quantize to ``decimals`` fixed-point units
    (round-half-away, the repo cents convention); one distributed
    (score_unit, label) count reduce gives the bounded table — bounded
    by the quantized score DOMAIN, never the row count — and every
    curve quantity is assembled from exact Python-int cumulative
    counts: ROC-AUC = Σ(2·p·(N−cumfp) + p·q) / (2·P·N) with one pinned
    float division; AP folds (p/P)·(cumtp/(cumtp+cumfp)) left-assoc in
    score-descending order (== the SQL ``list_sum(list(... ORDER BY s
    DESC))``); F1 = 2·cumtp/(cumtp+cumfp+P) per cut, max over cuts.
    Nulls in either column drop.  6dp.

    Output: one row (n, n_pos, n_neg, roc_auc, avg_precision, best_f1,
    best_f1_threshold); the AUC/AP/F1 fields are null when a class is
    empty (AP/F1 need positives; AUC needs both)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from packs_ray.functions.agg import keyed_count
    from packs_ray.stages.util import round_half_away as _rh

    unit = 10.0 ** decimals

    def proj(batch: pa.Table) -> pa.Table:
        t = batch.select([score_col, label_col])
        m = pc.and_(pc.is_valid(t.column(score_col)),
                    pc.is_valid(t.column(label_col)))
        t = t.filter(m)
        s = t.column(score_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = np.asarray(t.column(label_col).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        ok = np.isfinite(s) & ~np.isnan(y)
        s, y = s[ok], (y[ok] != 0).astype(np.int8)
        return pa.table({"s": pa.array(_rh(s * unit, 0).astype(np.int64)),
                         "y": pa.array(y)})

    cnt = keyed_count(ds.map_batches(proj, batch_format="pyarrow"),
                      ["s", "y"], num_partitions=num_partitions).to_pandas()
    if len(cnt) == 0:
        return pd.DataFrame([{
            "n": np.int64(0), "n_pos": np.int64(0), "n_neg": np.int64(0),
            "roc_auc": None, "avg_precision": None, "best_f1": None,
            "best_f1_threshold": None}])
    g = (cnt.pivot_table(index="s", columns="y", values="cnt",
                         aggfunc="sum", fill_value=0)
         .reindex(columns=[0, 1], fill_value=0)
         .sort_index(ascending=False))
    p = [int(x) for x in g[1]]          # positives per distinct score
    q = [int(x) for x in g[0]]          # negatives per distinct score
    s_desc = [int(x) for x in g.index]
    P, N = sum(p), sum(q)
    ctp = cfp = 0
    num2 = 0                            # 2·U, exact Python int
    ap = 0.0                            # left-assoc fold == list_sum
    best_f1 = None
    best_s = None
    for i in range(len(p)):
        ctp += p[i]
        cfp += q[i]
        num2 += 2 * p[i] * (N - cfp) + p[i] * q[i]
        if P > 0 and p[i] > 0:
            ap = ap + (float(p[i]) / float(P)) \
                * (float(ctp) / float(ctp + cfp))
        if P > 0:
            f1 = 2.0 * float(ctp) / float(ctp + cfp + P)
            if best_f1 is None or f1 > best_f1:
                best_f1, best_s = f1, s_desc[i]
    return pd.DataFrame([{
        "n": np.int64(P + N), "n_pos": np.int64(P), "n_neg": np.int64(N),
        "roc_auc": (float(_rh(float(num2) / float(2 * P * N), 6))
                    if P > 0 and N > 0 else None),
        "avg_precision": float(_rh(ap, 6)) if P > 0 else None,
        "best_f1": float(_rh(best_f1, 6)) if P > 0 else None,
        "best_f1_threshold": (float(best_s) / unit
                              if best_s is not None else None)}])


def welch_ttest(ds_a, ds_b, column: str) -> pd.DataFrame:
    """Welch's unequal-variance two-sample t-test on the means — the
    parametric cohort-comparison beside :func:`mannwhitney_u` (which
    reads rank shift) and :func:`ks_2sample` (any CDF gap): "did the
    mean of `value` move between feed A and feed B / treatment and
    control", with the Welch-Satterthwaite degrees of freedom so
    unequal variances and sizes stay honest.

    Exactness: each side reduces to three exact integer power sums
    over integer cents (n, Σc, Σc²) — per-batch partials with
    Python-int driver accumulation, no float ever crosses a partition
    boundary.  Σc² is computed magnitude-adaptively
    (``agg._exact_prod_sum``) and rides between partitions as a
    decimal string, so the sums stay exact for any |value| whose cents
    fit int64 (~9.2e16); Σc needs only the int64 column (65536-row
    batches of int64 cents cannot wrap its chunk sums).  The
    final t / dof are ONE pinned float64 expression both the engine
    and the DuckDB twin evaluate literally (HUGEINT sums cast to
    DOUBLE at the same points).

    Output: one row (n_a, n_b, mean_a, mean_b, t_stat, dof), floats
    6dp-pinned.  Null values drop; a side with n < 2 yields null
    t/dof (variance undefined)."""
    import numpy as np
    import pyarrow as pa

    from packs_ray.functions.agg import _exact_int_sum
    from packs_ray.stages.util import round_half_away as _r

    def side_sums(ds) -> tuple[int, int, int]:
        def partial(batch: "pa.Table") -> "pa.Table":
            import numpy as np
            import pyarrow as pa

            from packs_ray.functions.agg import _exact_prod_sum

            col = batch.column(column)
            v = col.drop_null().to_numpy(zero_copy_only=False)
            c = np.round(v * 100.0).astype(np.int64)
            return pa.table({
                "n": pa.array([len(c)], type=pa.int64()),
                "s1": pa.array([_exact_int_sum(c)], type=pa.int64()),
                "s2": pa.array([str(_exact_prod_sum(c, c))],
                               type=pa.string())})

        p = ds.select_columns([column]).map_batches(
            partial, batch_format="pyarrow").to_pandas()
        if not len(p):
            return 0, 0, 0
        return (int(p["n"].sum()),
                sum(int(x) for x in p["s1"]),
                sum(int(x) for x in p["s2"]))

    na, sa, s2a = side_sums(ds_a)
    nb, sb, s2b = side_sums(ds_b)
    mean_a = _r(sa / (na * 100.0), 6) if na else None
    mean_b = _r(sb / (nb * 100.0), 6) if nb else None
    t_stat = dof = None
    if na >= 2 and nb >= 2:
        na_d, nb_d = float(na), float(nb)
        va = (float(s2a) - float(sa) * float(sa) / na_d) \
            / (na_d - 1.0) / 10000.0
        vb = (float(s2b) - float(sb) * float(sb) / nb_d) \
            / (nb_d - 1.0) / 10000.0
        se2 = va / na_d + vb / nb_d
        if se2 > 0:
            t_stat = float(_r((sa / (na_d * 100.0) - sb / (nb_d * 100.0))
                              / np.sqrt(se2), 6))
            dof = float(_r(se2 * se2 / (
                (va / na_d) * (va / na_d) / (na_d - 1.0)
                + (vb / nb_d) * (vb / nb_d) / (nb_d - 1.0)), 6))
    return pd.DataFrame([{
        "n_a": np.int64(na), "n_b": np.int64(nb),
        "mean_a": None if mean_a is None else float(mean_a),
        "mean_b": None if mean_b is None else float(mean_b),
        "t_stat": t_stat, "dof": dof}])


def conformal_interval(ds, id_col: str, group_col: str, value_col: str,
                       *, alpha: float = 0.1, salt: str = "conformal",
                       scale: int = 100,
                       num_partitions: int | None = None) -> pd.DataFrame:
    """Split-conformal prediction-interval calibration — the
    distribution-free uncertainty check for any per-group predictor:
    rows split 50/50 into calibration/test by the reproducible hash
    band (sampling.hash_split, keyed on ``id_col``); the predictor is
    the per-group calibration mean; the conformal radius q is the
    ceil((n+1)(1-alpha))-th smallest calibration residual, and the
    test-side coverage of |value - mean_g| <= q should be ~(1-alpha)
    if exchangeability holds (a coverage collapse = the feed shifted
    between "calibration" and "test" populations).

    Exactness: residuals are exact integer cents against the
    half-away-rounded integer-cents group mean; the conformal radius
    is an exact order statistic read from a (split, residual) count
    table bounded by the DISTINCT residual domain (mannwhitney_u's
    partitioning assumption) — rows never land on the driver.

    Output: one row (n_calib, n_test, q, coverage, target); q in
    value units, coverage 6dp, q/coverage null when a side is empty."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from packs_ray.functions.agg import keyed_count
    from packs_ray.functions.sampling import hash_split
    from packs_ray.stages.util import round_half_away as _rh

    sp = hash_split(
        ds.select_columns([id_col, group_col, value_col]), id_col,
        {"calib": 0.5, "test": 0.5}, salt=salt)

    def clean(batch: pa.Table) -> pa.Table:
        m = batch.column("split").is_valid()
        for c in (group_col, value_col):
            m = pc.and_(m, batch.column(c).is_valid())
        return batch.filter(m)

    sp = sp.map_batches(clean, batch_format="pyarrow").materialize()

    def mean_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("split"), "calib"))
        df = batch.select([group_col, value_col]).to_pandas()
        df["c"] = np.rint(df[value_col].to_numpy(np.float64)
                          * scale).astype(np.int64)
        g = df.groupby(group_col, sort=False)["c"] \
            .agg(["sum", "size"]).reset_index()
        return _table_from_pandas(g, preserve_index=False)

    mp = sp.map_batches(mean_partial, batch_format="pyarrow").to_pandas()
    out_cols = ["n_calib", "n_test", "q", "coverage", "target"]
    if not len(mp):
        return pd.DataFrame([{**dict.fromkeys(out_cols),
                              "n_calib": np.int64(0),
                              "n_test": np.int64(0),
                              "target": 1.0 - alpha}])[out_cols]
    mg = mp.groupby(group_col, sort=False).agg(
        s=("sum", "sum"), n=("size", "sum"))
    means = {k: np.int64(_rh(float(r.s) / (r.n * 1.0), 0))
             for k, r in mg.iterrows()}
    import ray as _ray
    means_ref = _ray.put(means)

    def resid_partial(batch: pa.Table) -> pa.Table:
        mm = _ray.get(means_ref)
        df = batch.select(["split", group_col, value_col]).to_pandas()
        mc = df[group_col].map(mm)
        keep = mc.notna()
        df, mc = df[keep], mc[keep]
        c = np.rint(df[value_col].to_numpy(np.float64)
                    * scale).astype(np.int64)
        r = np.abs(c - mc.to_numpy(np.int64))
        g = (pd.DataFrame({"split": df["split"].to_numpy(), "r": r})
             .groupby(["split", "r"], sort=False).size()
             .reset_index(name="cnt"))
        return _table_from_pandas(g, preserve_index=False)

    parts = sp.map_batches(resid_partial,
                           batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame([{**dict.fromkeys(out_cols),
                              "n_calib": np.int64(0),
                              "n_test": np.int64(0),
                              "target": 1.0 - alpha}])[out_cols]
    tab = (parts.groupby(["split", "r"], sort=True)["cnt"].sum()
           .reset_index())
    cal = tab[tab["split"] == "calib"].sort_values("r")
    tst = tab[tab["split"] == "test"]
    n_cal = int(cal["cnt"].sum())
    n_tst = int(tst["cnt"].sum())
    q_cents = cov = None
    if n_cal:
        k = math.ceil((n_cal + 1) * (1.0 - alpha))
        if k <= n_cal:
            cum = cal["cnt"].cumsum().to_numpy(np.int64)
            q_cents = int(cal["r"].to_numpy(np.int64)[
                np.searchsorted(cum, k, side="left")])
            if n_tst:
                hit = int(tst[tst["r"] <= q_cents]["cnt"].sum())
                cov = float(_rh(hit / (n_tst * 1.0), 6))
    return pd.DataFrame([{
        "n_calib": np.int64(n_cal), "n_test": np.int64(n_tst),
        "q": None if q_cents is None else float(_rh(
            q_cents / float(scale), 6)),
        "coverage": cov, "target": 1.0 - alpha}])[out_cols]


def sprt_monitor(ds, ts_col: str, flag_col: str, *,
                 p0: float, p1: float, alpha: float = 0.05,
                 beta: float = 0.05,
                 num_partitions: int | None = None) -> pd.DataFrame:
    """Wald sequential probability-ratio test (SPRT) over a daily
    Bernoulli stream — the always-valid monitoring companion to the
    fixed-horizon :func:`welch_ttest`: each day adds its exact
    (n, successes) counts to the cumulative log-likelihood ratio for
    H1: rate = p1 vs H0: rate = p0; the run stops the first day the
    LLR crosses ln((1-beta)/alpha) (accept H1) or ln(beta/(1-alpha))
    (accept H0) — with error rates alpha/beta guaranteed regardless of
    when you peek, which a repeated t-test cannot give.

    ``flag_col`` must be boolean-like (0/1 after cast).  Null ts/flag
    rows drop.  Floats: the two per-observation log terms and the
    boundaries are computed by the identical ln expressions on both
    sides; the cumulative fold runs ascending day (engine loop ==
    the oracle's window list_sum).

    Scale shape: per-batch (day, n, x) int partials → one bucketed
    reduce; the day-span-bounded series folds on the driver.

    Output: one row per day — (day, n, x, llr, decision) with
    decision in {'continue', 'accept_h0', 'accept_h1'} evaluated on
    the cumulative LLR that day (monitoring view: rows after a
    boundary crossing keep reporting their state)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _rh

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([ts_col, flag_col])
        mask = pc.and_(t.column(ts_col).is_valid(),
                       t.column(flag_col).is_valid())
        t = t.filter(mask)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        x = pc.cast(t.column(flag_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"day": us // np.int64(86_400_000_000),
                           "n": np.ones(len(x), dtype=np.int64),
                           "x": x})
             .groupby("day", sort=False).sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)[["n", "x"]].sum() \
            .reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions).to_pandas()
    cols = ["day", "n", "x", "llr", "decision"]
    if daily.empty or "day" not in daily.columns:
        return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             "x": pd.Series([], dtype="int64"),
                             "llr": pd.Series([], dtype="float64"),
                             "decision": pd.Series([], dtype="object")})
    daily = daily.sort_values("day").reset_index(drop=True)
    l1 = math.log(p1 / p0)
    l0 = math.log((1.0 - p1) / (1.0 - p0))
    a_bound = math.log((1.0 - beta) / alpha)
    b_bound = math.log(beta / (1.0 - alpha))
    llr = 0.0
    rows = []
    for day, n, x in zip(daily["day"].to_numpy(np.int64),
                         daily["n"].to_numpy(np.int64),
                         daily["x"].to_numpy(np.int64)):
        llr += (x * l1) + ((n - x) * l0)       # left fold == list_sum
        dec = ("accept_h1" if llr >= a_bound
               else "accept_h0" if llr <= b_bound else "continue")
        rows.append({"day": np.int64(day), "n": np.int64(n),
                     "x": np.int64(x), "llr": float(_rh(llr, 6)),
                     "decision": dec})
    return pd.DataFrame(rows)[cols]


def emd_drift(ds_a, ds_b, column: str, *, scale: int = 100,
              num_partitions: int | None = None) -> pd.DataFrame:
    """Exact 1-D earth-mover (Wasserstein-1) distance between two
    numeric feeds — the magnitude-aware drift number the rest of the
    family lacks: KS reads the worst CDF gap, PSI reads binned ratio
    shifts, but only EMD says "the distribution moved by ~3.2 value
    units on average", in the column's own units.

    W1 = ∫ |F_a(x) − F_b(x)| dx over the merged support of integer
    cents: counts are exact int64 value tables (bounded by the
    DISTINCT cents domain — the mannwhitney_u partitioning
    assumption); the integral folds ascending over merged values with
    term |cumA/nA − cumB/nB| · gap, one pinned float expression per
    step (engine loop == the oracle's list_sum ORDER BY value).

    Output: one row (n_a, n_b, emd), value units 6dp; null when a
    side is empty."""
    import numpy as np

    from packs_ray.functions.agg import keyed_count
    from packs_ray.stages.util import round_half_away as _rh

    def counts(ds) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        def to_cents(batch: pa.Table) -> pa.Table:
            col = batch.column(column).drop_null()
            v = col.to_numpy(zero_copy_only=False)
            return pa.table({"c": pa.array(
                np.rint(np.asarray(v, np.float64) * scale)
                .astype(np.int64))})

        c = keyed_count(ds.select_columns([column]).map_batches(
            to_cents, batch_format="pyarrow"), ["c"],
            num_partitions=num_partitions).to_pandas()
        if c.empty or "c" not in c.columns:
            return pd.Series(dtype="int64")
        return c.set_index("c")["cnt"].astype(np.int64).sort_index()

    ca, cb = counts(ds_a), counts(ds_b)
    na, nb = int(ca.sum()), int(cb.sum())
    if na == 0 or nb == 0:
        return pd.DataFrame([{"n_a": np.int64(na), "n_b": np.int64(nb),
                              "emd": None}])
    merged = ca.index.union(cb.index)
    va = ca.reindex(merged, fill_value=0).to_numpy(np.int64)
    vb = cb.reindex(merged, fill_value=0).to_numpy(np.int64)
    vals = merged.to_numpy()
    cum_a = np.cumsum(va)
    cum_b = np.cumsum(vb)
    emd = 0.0
    for i in range(len(vals) - 1):            # left fold == list_sum
        gap = float(vals[i + 1] - vals[i])
        emd += abs(cum_a[i] / (na * 1.0) - cum_b[i] / (nb * 1.0)) * gap
    return pd.DataFrame([{
        "n_a": np.int64(na), "n_b": np.int64(nb),
        "emd": float(_rh(emd / float(scale), 6))}])
