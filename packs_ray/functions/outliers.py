"""Outlier detection: two-phase fit/score (the reference's KNN template).

Reference: outlier_detection_pack/main.py:201-260 — fit on a (seeded
here; unseeded there) sample of <=100k rows, score every row, inlier
score = 1 - score/(max+eps), outlier if below threshold; univariate per
numeric column plus a multivariate variant (:264-325).

pyod is not in this container; the scorer is plain numpy exact kNN
(the same algorithm class), fit on the driver and broadcast to a
scoring actor pool — the template every fitted-model stage follows.

Scale notes:
- univariate (d=1): train sorted once per actor; per-row kNN found via
  ``searchsorted`` + a 2k-candidate window — exact, O(rows · k), no
  distance matrix.
- multivariate: O(rows · train) distance computation done per-dimension
  in float64 with in-place accumulation (no BLAS: tiny inner dims hit
  a pathological dgemm path here; fixed accumulation order keeps scores
  bit-reproducible in SQL), train capped at ``sample_rows``
  (default 1024 — the scorer is O(rows × train) and memory-bound, and
  the reference itself fits on an unseeded random sample, i.e. the
  score is approximate by design; raise the knob for tighter scores).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def _knn_univariate(x: np.ndarray, train_sorted: np.ndarray, k: int) -> np.ndarray:
    """Exact mean-distance-to-k-nearest for 1-d data via sorted window."""
    m = len(train_sorted)
    k = min(k, m)
    pos = np.searchsorted(train_sorted, x)
    # candidate window: k points on each side of the insertion point;
    # out-of-range slots are masked to +inf (clipping would duplicate the
    # boundary training point and underestimate tail scores).  The window
    # always holds >= k in-range slots, so no inf reaches the k smallest.
    offs = np.arange(-k, k)
    idx = pos[:, None] + offs[None, :]
    oob = (idx < 0) | (idx >= m)
    cand = train_sorted[np.clip(idx, 0, m - 1)]   # (n, 2k)
    d = np.abs(cand - x[:, None])
    d[oob] = np.inf
    d.partition(k - 1, axis=1)
    return np.sort(d[:, :k], axis=1).mean(axis=1)  # ascending-order sum


def _knn_multivariate(m: np.ndarray, train: np.ndarray, k: int) -> np.ndarray:
    """Exact kNN mean distance, numeric-only (per-dimension float64
    accumulation in fixed column order — bit-reproducible in SQL)."""
    return _knn_mixed(m, [], train, [], k)


def _knn_mixed(m: np.ndarray, x_cat: list[np.ndarray], train: np.ndarray,
               t_cat: list[np.ndarray], k: int) -> np.ndarray:
    """kNN mean distance with one-hot-equivalent categorical terms.

    ||onehot(a)-onehot(b)||² is 0 (same), 2 (both known, different) or
    1 (unknown vs known) — computed directly from category indices, so
    one (rows × train) matrix per categorical column instead of one per
    category, and d² accumulates in a fixed order (numeric columns, then
    categorical columns, one addition each) that a SQL replica can
    reproduce bit-for-bit."""
    k = min(k, train.shape[0])
    d2 = _sq_dists(m, train)
    for xi, ti in zip(x_cat, t_cat):
        d2 += np.where(xi[:, None] < 0, 1.0,
                       np.where(xi[:, None] == ti[None, :], 0.0, 2.0))
    d2.partition(k - 1, axis=1)
    # ascending-order mean of the k nearest: the SQL replica sums a
    # sorted list, so fix the same order here (k<=8: numpy sums l-to-r)
    near = np.sort(d2[:, :k], axis=1)
    return np.sqrt(near, out=near).mean(axis=1)


def _sq_dists(m: np.ndarray, train: np.ndarray) -> np.ndarray:
    d2 = np.zeros((m.shape[0], train.shape[0]), dtype=np.float64)
    for j in range(m.shape[1]):
        diff = m[:, j][:, None] - train[:, j][None, :]
        np.multiply(diff, diff, out=diff)
        d2 += diff
    return d2


_H32 = np.uint64(0x9E3779B9)
_M32 = np.uint64(0xFFFFFFFF)


def _key_hash32(keys: np.ndarray) -> np.ndarray:
    """32-bit golden-ratio multiplicative hash of an int64 key — chosen
    because it is exactly replicable in SQL with no 64-bit-overflow
    gymnastics: ((key & 0xFFFFFFFF) * 2654435769) & 0xFFFFFFFF."""
    k = np.ascontiguousarray(keys, dtype=np.int64).view(np.uint64)
    return (((k & _M32) * _H32) & _M32).view(np.int64)


class KnnScorer:
    """Actor: holds the (broadcast) training sample + categorical
    encoders; scores batches by mean distance to the k nearest training
    points."""

    def __init__(self, state_ref, k: int):
        # loaded once per actor
        train, num_cols, cat_maps, train_cat = ray.get(state_ref)
        self.k = k
        self.num_cols = num_cols
        self.cat_maps = cat_maps
        self.univariate = train.shape[1] == 1 and not cat_maps
        self.train = np.sort(train[:, 0]) if self.univariate else train
        self.train_cat = train_cat

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = np.column_stack(
            [df[c].to_numpy(dtype=np.float64) for c in self.num_cols]) \
            if self.num_cols else np.zeros((len(df), 0))
        if self.univariate:
            score = _knn_univariate(m[:, 0], self.train, self.k)
        else:
            x_cat = [df[c].map(mp).fillna(-1).to_numpy(dtype=np.int64)
                     for c, mp in self.cat_maps.items()]
            score = _knn_mixed(m, x_cat, self.train, self.train_cat, self.k)
        return batch.append_column(
            "knn_score", pa.array(score.astype(np.float64), type=pa.float64()))


def knn_outliers(ds, columns: list[str], categorical_columns: list[str] | None = None,
                 k: int = 5, sample_rows: int | None = None,
                 outlier_threshold: float = 0.5, seed: int = 42,
                 max_categories: int = 100,
                 sample_key: str | None = None) -> pd.DataFrame:
    """Univariate/multivariate kNN outlier metrics: normality score per
    the reference roll-up (fraction of inliers).  ``categorical_columns``
    are one-hot encoded with a sample-fitted ≤``max_categories`` map
    (the reference's multivariate path).

    ``sample_key`` names a unique int64 key column: the training sample
    becomes the ``sample_rows`` non-null rows with the smallest 32-bit
    golden hash of the key — fully deterministic regardless of block
    layout or parallelism (and exactly replicable in SQL), unlike the
    default seeded ``random_sample`` whose output shifts with block
    splits.  Prefer it wherever a stable key exists."""
    cat_cols = categorical_columns or []
    if sample_rows is None:
        sample_rows = 65_536 if len(columns) == 1 and not cat_cols else 1_024
    proj = ds.select_columns(
        columns + cat_cols + ([sample_key] if sample_key else []))
    total = proj.count()  # parquet metadata only
    if total == 0:
        return pd.DataFrame([{"rows": 0, "outliers": 0,
                              "outlier_percent": 0.0,
                              "normality_score": 1.0}])
    if sample_key:
        # per-block top-n by key hash, then one driver-side merge of the
        # blocks×n prefiltered rows (n is small; a bucketed tree reduce is
        # the drop-in upgrade if blocks×n ever outgrows the driver)
        # feature columns break ties between rows sharing a key (keys
        # SHOULD be unique, but a collision must not make the boundary
        # row of the sample depend on physical block order)
        order = ["__h", sample_key] + columns + cat_cols

        def local_top(df: pd.DataFrame) -> pd.DataFrame:
            df = df.dropna(subset=columns + cat_cols + [sample_key])
            df = df.assign(
                __h=_key_hash32(df[sample_key].to_numpy(dtype=np.int64)))
            return df.sort_values(order).head(sample_rows)

        parts = proj.map_batches(local_top, batch_format="pandas").to_pandas()
        if "__h" not in parts.columns:  # every block dropped to 0 rows
            parts = pd.DataFrame({c: pd.Series([], dtype="float64")
                                  for c in columns + cat_cols
                                  + ["__h", sample_key]})
        sample_df = (parts.sort_values(order)
                     .head(sample_rows).drop(columns=["__h", sample_key]))
    else:
        sample = proj.random_sample(min(1.0, sample_rows / max(1, total)),
                                    seed=seed)
        sample_df = sample.to_pandas().dropna()[:sample_rows]
    # deterministic category selection/order: count desc, then value asc
    def _cat_map(s: pd.Series) -> dict:
        vc = s.value_counts()
        order = sorted(vc.index, key=lambda v: (-vc[v], str(v)))
        return {v: i for i, v in enumerate(order[:max_categories])}

    cat_maps = {c: _cat_map(sample_df[c]) for c in cat_cols}
    train = np.column_stack(
        [sample_df[c].to_numpy(dtype=np.float64) for c in columns]) \
        if columns else np.zeros((len(sample_df), 0))
    train_cat = [sample_df[c].map(mp).fillna(-1).to_numpy(dtype=np.int64)
                 for c, mp in cat_maps.items()]
    sref = ray.put((train, columns, cat_maps, train_cat))

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # fixed pool (one spawn wave), but never the whole cluster — a pool
    # demanding every CPU starves the upstream read and deadlocks
    pool = max(1, min(4, cpus - 1))
    scored = proj.map_batches(KnnScorer, fn_constructor_args=(sref, k),
                              batch_format="pyarrow", batch_size=4096,
                              concurrency=pool)
    # two streaming aggregate passes over the score COLUMN only (scoring
    # runs once — the 8-byte/row column materializes in the object store,
    # never on the driver): pass 1 n+max, pass 2 inlier count using the
    # exact same float expression as the reference roll-up
    from packs_ray.functions.agg import global_agg

    score_col = scored.select_columns(["knn_score"]).materialize()
    agg1 = global_agg(
        score_col,
        lambda b: {"n": b.num_rows,
                   "mx": pa.compute.max(b.column("knn_score")).as_py()},
        lambda p: {"n": int(p["n"].sum()),
                   "mx": float(p["mx"].max()) if p["mx"].notna().any() else 0.0})
    n, mx = agg1["n"], agg1["mx"]

    def count_outliers(b: pa.Table) -> dict:
        s = b.column("knn_score").to_numpy(zero_copy_only=False)
        inlier = 1.0 - s / (mx + 1e-9)
        return {"n_out": int((inlier < outlier_threshold).sum())}

    n_out = global_agg(score_col, count_outliers,
                       lambda p: {"n_out": int(p["n_out"].sum())})["n_out"] \
        if n else 0
    return pd.DataFrame([{
        "rows": n, "outliers": n_out,
        "outlier_percent": float(_r(n_out / n, 4)) if n else 0.0,
        "normality_score": float(_r(1 - (n_out / n if n else 0.0), 2)),
    }])


def mad_outliers(ds, column: str, *, k: float = 3.0):
    """Robust (median/MAD) outlier flags: rows where
    |v − median| > k · 1.4826 · MAD, MAD = median(|v − median|).

    The reference's outlier pack is kNN-distance based (pyod semantics,
    outlier_detection_pack/main.py) which needs a train sample; MAD is
    the standard robust univariate alternative — insensitive to up to
    50 % contamination and cheap at any scale.  Both medians come from
    the exact distributed rank selection (`profiling._rank_select`
    machinery via `quantile_threshold`) — three streaming scans of one
    column, nothing driver-side but two scalars.  Null values are never
    flagged.  Returns the input with ``is_outlier`` (bool, null for
    null values) and ``mad_z`` (the |v−med|/(1.4826·MAD) score, 6dp;
    null when MAD is 0 — a degenerate spread flags nothing).
    """
    import pyarrow.compute as pc

    from packs_ray.functions.profiling import quantile_threshold

    med = quantile_threshold(ds, column, 0.5)
    if med is None:
        # no non-null values: rows pass through with null flags/scores
        def all_null(batch: pa.Table) -> pa.Table:
            return (batch
                    .append_column("is_outlier",
                                   pa.nulls(len(batch), pa.bool_()))
                    .append_column("mad_z",
                                   pa.nulls(len(batch), pa.float64())))

        return ds.map_batches(all_null, batch_format="pyarrow")

    def absdev(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        return pa.table({"__ad": pa.array(
            np.abs(v.astype(np.float64) - med),
            mask=~np.asarray(pc.is_valid(batch.column(column))
                             .to_numpy(zero_copy_only=False)))})

    mad = quantile_threshold(
        ds.select_columns([column]).map_batches(absdev,
                                                batch_format="pyarrow"),
        "__ad", 0.5)
    denom = 1.4826 * mad

    def flag(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        valid = np.asarray(pc.is_valid(batch.column(column))
                           .to_numpy(zero_copy_only=False))
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.round(np.abs(v.astype(np.float64) - med) / denom, 6)
        ok = valid & (denom > 0)
        out = batch.append_column("is_outlier", pa.array(
            np.where(ok, z > k, False), type=pa.bool_(), mask=~ok))
        return out.append_column("mad_z", pa.array(
            np.where(ok, z, np.nan), type=pa.float64(), mask=~ok))

    return ds.map_batches(flag, batch_format="pyarrow")


def sum_anomaly(ds, ts_col: str, value_col: str, *, k: float = 3.0,
                scale: int = 100, num_partitions: int | None = None):
    """dqops-taxonomy ``sum_anomaly`` (dqops-checks-reference.md
    "ANOMALY DETECTION"): aggregate the value into daily sums, then
    flag anomalous days with the robust median/MAD rule — lazy Dataset
    of ``(day, cents, is_outlier, mad_z)``.

    Scale shape: per-batch (day, int64-cents) partials → bucketed
    reduce (exact whatever the partition order), then ``mad_outliers``
    over the aggregated series — which is |days| rows, already tiny at
    any input scale, the aggregate-then-analyze pattern anomaly checks
    rely on."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([ts_col, value_col]).to_pandas() \
            .dropna(subset=[ts_col, value_col])
        day = df[ts_col].dt.floor("D")
        cents = np.rint(df[value_col].to_numpy(dtype=np.float64)
                        * scale).astype(np.int64)
        g = (pd.DataFrame({"day": day.to_numpy(), "cents": cents})
             .groupby("day", sort=False)["cents"].sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)["cents"].sum().reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions)
    return mad_outliers(daily, "cents", k=k)


def iqr_outliers_per_key(ds, key_col: str, value_col: str,
                         id_cols: list[str], *, k: float = 1.5,
                         num_partitions: int | None = None):
    """Per-group Tukey-fence outlier flags: a row is an outlier when
    its value leaves ``[q1 − k·IQR, q3 + k·IQR]`` computed over ITS OWN
    group — the per-segment form of the outlier pack's global checks
    (a price that's normal for segment A can be anomalous for B).

    Exactness: per-key q1/q3 are exact order statistics (np.percentile
    'linear' == DuckDB quantile_cont), 6dp-pinned; the fences are one
    pinned float expression.  Null key/value rows are excluded.

    Scale shape: only the (key, value) projection shuffles once to
    co-locate each group for the exact quantiles; the bounded per-key
    fence table is broadcast via ``ray.put`` and the FLAG pass streams
    the full rows without any shuffle.  Mega-groups inherit
    grouped_quantiles' documented bucket-fit assumption."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import reduce_partition_count
    from packs_ray.functions.profiling import grouped_quantiles

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    qt = grouped_quantiles(ds, key_col, value_col, (0.25, 0.75),
                           num_partitions=num_partitions).to_pandas()
    if qt.empty:  # 0-row / all-null input: no groups, no fences
        qt = pd.DataFrame({key_col: [], "q": [], "value": []})
    fences = {}
    for key, grp in qt.groupby(key_col, sort=False):
        q = dict(zip(grp["q"], grp["value"]))
        iqr = q[0.75] - q[0.25]
        fences[key] = (q[0.25] - k * iqr, q[0.75] + k * iqr)
    lo_s = pd.Series({key: v[0] for key, v in fences.items()},
                     dtype=np.float64)
    hi_s = pd.Series({key: v[1] for key, v in fences.items()},
                     dtype=np.float64)
    ref = ray.put((lo_s, hi_s))

    def flag(batch: pa.Table) -> pa.Table:
        flo, fhi = ray.get(ref)
        batch = batch.select(id_cols + [key_col, value_col])
        mask = pc.and_(pc.is_valid(batch.column(key_col)),
                       pc.is_valid(batch.column(value_col)))
        batch = batch.filter(mask)
        keys = batch.column(key_col).to_pandas()
        lo = keys.map(flo).to_numpy(dtype=np.float64)
        hi = keys.map(fhi).to_numpy(dtype=np.float64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return batch.append_column(
            "is_outlier", pa.array((v < lo) | (v > hi)))

    return ds.map_batches(flag, batch_format="pyarrow")


def cusum_changepoint(ds, ts_col: str, value_col: str, *,
                      scale: int = 100,
                      num_partitions: int | None = None) -> "pd.DataFrame":
    """CUSUM mean-shift change-point detection over the daily value
    series (Page 1954): the day k maximizing |S_k|, S_k = Σ_{i≤k}
    (v_i − v̄) over daily sums — the pipeline-monitoring question
    "when did this feed change" that per-day outlier flags
    (:func:`sum_anomaly`) can't answer (a level shift is many small
    deviations, not one spike).  Null ts/value rows are excluded.

    Exactness: daily sums are exact int64 cents; the argmax runs on
    the EXACT integer m·S_k = m·cumsum_k − k·total (no float before
    the argmax, so the winning day is bit-determined; ties → earliest
    day); the normalized statistic and the before/after means are
    pinned float64 expressions, 6dp.

    Scale shape: per-batch (day, cents) partials → bucketed reduce;
    the |days| series (time-bounded, tiny at any corpus scale) lands
    on the driver for the scan — the aggregate-then-analyze pattern.

    Output: one row (n_days, change_day, stat, mean_before,
    mean_after); a single-day series yields nulls."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([ts_col, value_col]).to_pandas() \
            .dropna(subset=[ts_col, value_col])
        day = df[ts_col].dt.floor("D")
        cents = np.rint(df[value_col].to_numpy(dtype=np.float64)
                        * scale).astype(np.int64)
        g = (pd.DataFrame({"day": day.to_numpy(), "cents": cents})
             .groupby("day", sort=False)["cents"].sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)["cents"].sum().reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions).to_pandas()
    empty = pd.DataFrame([{
        "n_days": np.int64(0), "change_day": pd.NaT,
        "stat": None, "mean_before": None, "mean_after": None}])
    empty["change_day"] = empty["change_day"].astype("datetime64[us]")
    if daily.empty or "day" not in daily.columns:
        return empty
    daily = daily.sort_values("day", kind="stable").reset_index(drop=True)
    m = len(daily)
    v = daily["cents"].to_numpy(dtype=np.int64)
    if m < 2:
        out = empty.copy()
        out.loc[0, "n_days"] = np.int64(m)
        return out
    cum = np.cumsum(v)
    tot = int(cum[-1])
    # exact integer m*S_k; argmax over k = 1..m-1 (S_m == 0 by def).
    # Python-int arithmetic (arbitrary precision) once the int64
    # product could wrap: |m*cum| bounded by m * max|cum|
    if m * max(abs(int(cum.max())), abs(int(cum.min()))) < (1 << 62):
        ms = m * cum[:-1] - np.arange(1, m) * tot
    else:
        ms = np.array([m * int(c) - kk * tot
                       for kk, c in enumerate(cum[:-1], start=1)],
                      dtype=object)
    k = int(np.argmax(np.abs(ms)))          # earliest day on ties
    mean = tot / m
    var = float(np.maximum((v.astype(np.float64) ** 2).mean()
                           - mean * mean, 0.0))
    sd = np.sqrt(var)
    stat = ((abs(int(ms[k])) / m) / (sd * np.sqrt(m))
            if sd > 0 else None)
    nb = k + 1
    mean_before = (int(cum[k]) / nb) / scale
    mean_after = ((tot - int(cum[k])) / (m - nb)) / scale
    out = pd.DataFrame([{
        "n_days": np.int64(m),
        "change_day": pd.Timestamp(daily["day"].iloc[k]),
        "stat": float(_r(stat, 6)) if stat is not None else None,
        "mean_before": float(_r(mean_before, 6)),
        "mean_after": float(_r(mean_after, 6))}])
    out["change_day"] = out["change_day"].astype("datetime64[us]")
    return out


def weekday_profile(ds, ts_col: str, value_col: str, *,
                    scale: int = 100,
                    num_partitions: int | None = None) -> "pd.DataFrame":
    """Day-of-week seasonality profile of the daily value series: per
    ISO weekday (1=Mon..7=Sun), how many days occurred, their exact
    value total, the mean daily value, and the weekday's share of the
    grand total — the "is Sunday supposed to be this quiet" complement
    to :func:`cusum_changepoint` (level shifts) and
    :func:`sum_anomaly` (single-day spikes).  Null ts/value rows are
    excluded.

    Exactness: daily and weekday sums are exact int64 cents; mean and
    share are pinned float64 expressions, 6dp.

    Scale shape: the same per-batch (day, cents) partials → bucketed
    reduce; the |days| series lands on the driver for the 7-row
    weekday fold.

    Output: one row per occurring weekday — (weekday, n_days, total,
    mean_daily, share), ordered by weekday."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([ts_col, value_col]).to_pandas() \
            .dropna(subset=[ts_col, value_col])
        day = df[ts_col].dt.floor("D")
        cents = np.rint(df[value_col].to_numpy(dtype=np.float64)
                        * scale).astype(np.int64)
        g = (pd.DataFrame({"day": day.to_numpy(), "cents": cents})
             .groupby("day", sort=False)["cents"].sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)["cents"].sum().reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions).to_pandas()
    if daily.empty or "day" not in daily.columns:
        return pd.DataFrame({
            "weekday": pd.Series([], dtype="int64"),
            "n_days": pd.Series([], dtype="int64"),
            "total": pd.Series([], dtype="float64"),
            "mean_daily": pd.Series([], dtype="float64"),
            "share": pd.Series([], dtype="float64")})
    daily["weekday"] = (pd.to_datetime(daily["day"]).dt.dayofweek
                        + 1).astype(np.int64)
    g = (daily.groupby("weekday", sort=True)["cents"]
         .agg(n_days="size", s="sum").reset_index())
    tot = int(g["s"].sum())
    s = g["s"].to_numpy(dtype=np.float64)
    nd = g["n_days"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "weekday": g["weekday"].astype(np.int64),
        "n_days": g["n_days"].astype(np.int64),
        "total": _r(s / scale, 6),
        "mean_daily": _r((s / nd) / scale, 6),
        "share": _r(s / float(tot), 6) if tot else np.nan})


def daily_autocorr(ds, ts_col: str, value_col: str, *,
                   lags: tuple = (1, 2, 7), scale: int = 100,
                   num_partitions: int | None = None) -> "pd.DataFrame":
    """Calendar-lag autocorrelation of the daily value series: for each
    lag L (days), the correlation between day t and day t+L deviations
    from the global daily mean — the periodicity detector that closes
    the time-series toolkit (:func:`weekday_profile` shows the weekly
    fold; ACF at lag 7 shows how strong it is).  Gap days simply form
    no pair (calendar lag, not index lag).  Null ts/value rows are
    excluded.

    Exactness: daily sums are exact int64 cents; each ACF value is the
    standard estimator Σ_pairs(v_t−v̄)(v_{t+L}−v̄) / Σ_all(v−v̄)²
    with v̄ the grand daily mean — assembled from exact integer sums
    in ONE pinned float64 expression per lag, 6dp.

    Scale shape: same (day, cents) partials → bucketed reduce; the
    |days| series lands on the driver for the lag scan.

    Output: one row per lag — (lag, n_pairs, acf); a series with zero
    variance or no pairs yields a null acf."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([ts_col, value_col]).to_pandas() \
            .dropna(subset=[ts_col, value_col])
        day = df[ts_col].dt.floor("D")
        cents = np.rint(df[value_col].to_numpy(dtype=np.float64)
                        * scale).astype(np.int64)
        g = (pd.DataFrame({"day": day.to_numpy(), "cents": cents})
             .groupby("day", sort=False)["cents"].sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)["cents"].sum().reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions).to_pandas()
    lags = sorted(int(x) for x in lags)
    if daily.empty or "day" not in daily.columns:
        return pd.DataFrame({
            "lag": pd.Series(lags, dtype="int64"),
            "n_pairs": np.int64(0), "acf": None})
    daily = daily.sort_values("day", kind="stable").reset_index(drop=True)
    dnum = (pd.to_datetime(daily["day"]).to_numpy()
            .astype("datetime64[D]").astype(np.int64))
    v = daily["cents"].to_numpy(dtype=np.float64)
    m = len(v)
    mean = v.sum() / m
    dev = v - mean
    denom = float((dev * dev).sum())
    pos = {int(d): i for i, d in enumerate(dnum)}
    rows = []
    for lag in lags:
        idx_t, idx_tl = [], []
        for i, d in enumerate(dnum):
            j = pos.get(int(d) + lag)
            if j is not None:
                idx_t.append(i)
                idx_tl.append(j)
        n_pairs = len(idx_t)
        acf = (float((dev[idx_t] * dev[idx_tl]).sum()) / denom
               if n_pairs and denom > 0 else None)
        rows.append({"lag": np.int64(lag), "n_pairs": np.int64(n_pairs),
                     "acf": float(_r(acf, 6)) if acf is not None
                     else None})
    return pd.DataFrame(rows)


def ewma_anomaly(ds, ts_col: str, value_col: str, *,
                 alpha: float = 0.3, k: float = 3.0, scale: int = 100,
                 num_partitions: int | None = None) -> "pd.DataFrame":
    """EWMA control chart over the daily value series (Roberts 1959):
    each day is predicted by the exponentially weighted moving average
    of the PRIOR days (one-step-ahead), and flagged when its residual
    exceeds ``k`` one-step-error sigmas — the fast-reacting sibling of
    :func:`sum_anomaly` (median/MAD reacts to level, EWMA to recent
    trend).  Null ts/value rows are excluded.

    Exactness: daily sums are exact int64 cents; the EWMA recursion
    ``e_t = α·v_t + (1−α)·e_{t−1}`` (seeded with day 1's value) is a
    strict sequential float64 recurrence both engines evaluate in the
    identical order; sigma is the rms one-step residual; z = |r|/σ is
    rounded 6dp BEFORE the ``> k`` compare so the flag is shared with
    the SQL replica.

    Scale shape: same (day, cents) partials → bucketed reduce; the
    |days| series (time-bounded) runs the recursion on the driver.

    Output per day (ordered): (day, cents, ewma_prev, resid, z,
    is_anomaly); day 1 has null prediction/flag."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([ts_col, value_col]).to_pandas() \
            .dropna(subset=[ts_col, value_col])
        day = df[ts_col].dt.floor("D")
        cents = np.rint(df[value_col].to_numpy(dtype=np.float64)
                        * scale).astype(np.int64)
        g = (pd.DataFrame({"day": day.to_numpy(), "cents": cents})
             .groupby("day", sort=False)["cents"].sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)["cents"].sum().reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions).to_pandas()
    empty = pd.DataFrame({
        "day": pd.Series([], dtype="datetime64[us]"),
        "cents": pd.Series([], dtype="int64"),
        "ewma_prev": pd.Series([], dtype="float64"),
        "resid": pd.Series([], dtype="float64"),
        "z": pd.Series([], dtype="float64"),
        "is_anomaly": pd.Series([], dtype="object")})
    if daily.empty or "day" not in daily.columns:
        return empty
    daily = daily.sort_values("day", kind="stable").reset_index(drop=True)
    v = daily["cents"].to_numpy(dtype=np.float64)
    m = len(v)
    # strict sequential recurrence — |days| is time-bounded, driver-side
    ewma_prev = np.full(m, np.nan)
    e = v[0]
    for t in range(1, m):
        ewma_prev[t] = e
        e = alpha * v[t] + (1.0 - alpha) * e
    resid = v - ewma_prev                      # nan on day 1
    rr = resid[1:]
    sigma = float(np.sqrt((rr * rr).sum() / len(rr))) if m > 1 else 0.0
    with np.errstate(invalid="ignore"):
        z = np.abs(resid) / sigma if sigma > 0 else np.full(m, np.nan)
    zr = np.asarray(_r(z, 6), dtype=np.float64)
    out = pd.DataFrame({
        "day": pd.to_datetime(daily["day"]).astype("datetime64[us]"),
        "cents": daily["cents"].astype(np.int64),
        "ewma_prev": _r(ewma_prev, 6),
        "resid": _r(resid, 6),
        "z": zr,
        # object dtype with True/False/None — what both an Arrow
        # nullable bool and DuckDB's fetchdf produce
        "is_anomaly": pd.Series([None if np.isnan(x) else bool(x > k)
                                 for x in zr], dtype=object)})
    return out


def seasonal_decompose_daily(ds, ts_col: str, value_col: str, *,
                             scale: int = 100,
                             num_partitions: int | None = None
                             ) -> "pd.DataFrame":
    """Classical additive seasonal decomposition of the daily value
    series, weekly period: trend = centered 7-day moving average,
    seasonal index per ISO weekday = mean detrended deviation,
    centered to sum ~0 — the decomposition behind
    :func:`weekday_profile` (which shows raw weekday totals; this
    isolates the seasonal effect from the trend so a ramping feed
    doesn't masquerade as seasonality).

    Exactness: the detrended deviation is kept in exact integer
    micro-units — 7*cents[t] - sum7[t], with sum7 an int64
    convolution over the gap-masked daily array (exact while each
    7-day cents sum stays inside int64; no float64 round-trip) — so
    the per-weekday numerator is an exact integer sum; only the final
    index = num / (7*cnt) and the ≤7-term centering fold are floats,
    pinned to the oracle's expression order (list_sum left fold by
    weekday).  Days without a full 7-day calendar window (boundaries,
    gaps) are excluded, matching the SQL RANGE-window row count.

    Scale shape: per-batch (day, cents) partials → one bucketed
    reduce; only the |days| daily series lands on the driver for the
    rolling window (bounded by the time span, not the row count).

    Output: one row per occurring weekday — (weekday, n_used,
    seasonal), value units, 6dp, ordered by weekday."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([ts_col, value_col]).to_pandas() \
            .dropna(subset=[ts_col, value_col])
        day = df[ts_col].dt.floor("D")
        cents = np.rint(df[value_col].to_numpy(dtype=np.float64)
                        * scale).astype(np.int64)
        g = (pd.DataFrame({"day": day.to_numpy(), "cents": cents})
             .groupby("day", sort=False)["cents"].sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)["cents"].sum().reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions).to_pandas()
    empty = pd.DataFrame({"weekday": pd.Series([], dtype="int64"),
                          "n_used": pd.Series([], dtype="int64"),
                          "seasonal": pd.Series([], dtype="float64")})
    if daily.empty or "day" not in daily.columns:
        return empty
    daily = daily.sort_values("day").reset_index(drop=True)
    daily["day"] = pd.to_datetime(daily["day"])
    # full calendar with explicit gap masking: a missing day voids
    # every window it touches.  The window sums stay int64 end-to-end
    # (a pandas reindex would pass through a NaN-bearing float64
    # series and silently lose cents beyond 2^53) — each centered
    # 7-day sum is one exact int64 convolution term, so the claimed
    # bound is |7-day cents sum| < 2^63, not 2^53.
    cal = pd.date_range(daily["day"].min(), daily["day"].max(), freq="D")
    n = len(cal)
    if n < 7:
        return empty
    idx = ((daily["day"] - cal[0]) // pd.Timedelta(days=1)) \
        .to_numpy(np.int64)
    present = np.zeros(n, dtype=bool)
    present[idx] = True
    ivals = np.zeros(n, dtype=np.int64)
    ivals[idx] = daily["cents"].to_numpy(np.int64)
    kern = np.ones(7, dtype=np.int64)
    win_sum = np.convolve(ivals, kern, mode="valid")   # center t = i + 3
    win_cnt = np.convolve(present.astype(np.int64), kern, mode="valid")
    centers = np.arange(3, n - 3)
    ok = present[centers] & (win_cnt == 7)
    if not ok.any():
        return empty
    cents = ivals[centers][ok]
    d7 = win_sum[ok]
    weekday = (cal[centers][ok].dayofweek + 1).to_numpy(np.int64)
    num = 7 * cents - d7                       # exact int micro-units
    sw = (pd.DataFrame({"weekday": weekday, "num": num})
          .groupby("weekday", sort=True)
          .agg(num=("num", "sum"), cnt=("num", "size")).reset_index())
    s = sw["num"].to_numpy(np.float64) / (7.0 * sw["cnt"].to_numpy(np.float64))
    ms = 0.0
    for x in s:                                 # left fold == list_sum
        ms += float(x)
    ms /= float(len(s))
    return pd.DataFrame({
        "weekday": sw["weekday"].astype(np.int64),
        "n_used": sw["cnt"].astype(np.int64),
        "seasonal": _r((s - ms) / float(scale), 6)})


def theilsen_daily_trend(ds, ts_col: str, value_col: str, *,
                         scale: int = 100,
                         num_partitions: int | None = None
                         ) -> "pd.DataFrame":
    """Theil-Sen robust trend of the daily value series: the median of
    all pairwise day-to-day slopes — the outlier-immune complement to
    :func:`cusum_changepoint` (level shifts) and the least-squares
    ``trend_per_key`` (which one spike day can swing; the median slope
    shrugs it off).  Breakdown point 29%.

    Exactness: daily sums are exact int64 cents (the house partials);
    each slope is ONE pinned float division of integer cents by an
    integer day gap; the median is an exact order statistic — sorted
    ascending, odd count takes the middle element, even count averages
    the two middles with one pinned (a + b) / 2.0.  The pairwise slope
    set is bounded by days², i.e. the TIME SPAN, never the row count —
    the same driver-landing bound as the whole daily-series family.

    Output: one row (n_days, n_pairs, slope_per_day, intercept) —
    slope in value units/day (6dp); intercept = median residual
    m = median(v_i - slope * day_i) (the Theil-Sen intercept), 6dp."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([ts_col, value_col]).to_pandas() \
            .dropna(subset=[ts_col, value_col])
        us = df[ts_col].astype("datetime64[us]").astype(np.int64)
        cents = np.rint(df[value_col].to_numpy(dtype=np.float64)
                        * scale).astype(np.int64)
        g = (pd.DataFrame({"day": us // np.int64(86_400_000_000),
                           "cents": cents})
             .groupby("day", sort=False)["cents"].sum().reset_index())
        return _table_from_pandas(g, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", sort=False)["cents"].sum().reset_index()

    daily = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], reduce_fn, num_partitions).to_pandas()
    cols = ["n_days", "n_pairs", "slope_per_day", "intercept"]
    if daily.empty or "day" not in daily.columns or len(daily) < 2:
        return pd.DataFrame([{**dict.fromkeys(cols),
                              "n_days": np.int64(len(daily)),
                              "n_pairs": np.int64(0)}])[cols]
    daily = daily.sort_values("day").reset_index(drop=True)
    day = daily["day"].to_numpy(np.int64)
    cents = daily["cents"].to_numpy(np.int64)
    i, j = np.triu_indices(len(day), k=1)
    slopes = (cents[j] - cents[i]) * 1.0 / (day[j] - day[i])

    def _median(arr: np.ndarray) -> float:
        srt = np.sort(arr, kind="stable")
        n = len(srt)
        if n % 2:
            return float(srt[n // 2])
        return (float(srt[n // 2 - 1]) + float(srt[n // 2])) / 2.0

    slope_c = _median(slopes)                  # cents / day
    resid = cents - slope_c * day
    inter_c = _median(resid)
    return pd.DataFrame([{
        "n_days": np.int64(len(day)),
        "n_pairs": np.int64(len(slopes)),
        "slope_per_day": float(_r(slope_c / float(scale), 6)),
        "intercept": float(_r(inter_c / float(scale), 6))}])[cols]
