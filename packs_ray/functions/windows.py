"""Windowed aggregates over the events stream table.

Ray Data has no event-time windows (SURVEY.md §2.9); tumbling windows are
expressed as groupby over a derived window key — partial counts per batch
first (combiner), then a groupby over the (small) per-window partials.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def events_per_window(ds, key_col: str, ts_col: str, value_col: str,
                      window: str = "day", num_partitions: int | None = None):
    """Lazy Dataset of (key, window_start, n_events, sum_value_cents).

    The value sum is carried in integer cents so results are exactly
    order-independent (double-sum associativity would break value-hash
    parity with the SQL oracle).
    """
    from packs_ray.functions.agg import bucketed_group_reduce, reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column(ts_col), unit=window)
        cents = pc.cast(pc.round(pc.multiply(batch.column(value_col), 100.0), 0), "int64")
        t = pa.table({key_col: batch.column(key_col), "window_start": win,
                      "cents": cents})
        df = t.to_pandas()
        out = (df.groupby([key_col, "window_start"], sort=False)
               .agg(n_events=("cents", "size"), sum_value_cents=("cents", "sum"))
               .reset_index())
        return _table_from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([key_col, "window_start"], sort=False)
                [["n_events", "sum_value_cents"]].sum().reset_index())

    return bucketed_group_reduce(parts, [key_col, "window_start"], reduce_fn,
                                 num_partitions)


def keyed_window_functions(ds, key_col: str, order_cols: list[str],
                           value_col: str, rolling: int = 3,
                           num_buckets: int | None = None):
    """Per-key ordered analytic functions (SQL window functions — absent
    from the Ray Data API): row_number, lag difference, cumulative sum and
    a ``rolling``-row trailing sum/mean, all partitioned by ``key_col``
    and ordered by ``order_cols``.

    Scale shape: ONE hash-bucket shuffle on the key (all rows of a key
    land in one bucket — the same partitioning contract as
    ``sessionize``), then fully vectorized numpy over each sorted bucket;
    no driver materialization.  The value rides as integer cents so
    cumulative sums are exactly order-independent across engines
    (double accumulation order would break value-hash parity).

    Returns a lazy Dataset with columns: key_col, *order_cols, cents,
    row_number, lag_diff_cents (null on each key's first row),
    cumsum_cents, roll_sum_cents, roll_mean_cents.
    """
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    out_cols = [key_col, *order_cols, "cents", "row_number",
                "lag_diff_cents", "cumsum_cents", "roll_sum_cents",
                "roll_mean_cents"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as _np

        # drop null key/order/value rows (the null-handling convention of
        # groupwise_zscore): a null value would otherwise silently cast
        # NaN -> INT64_MIN in the cents vector and poison every cumsum
        valid = pc.is_valid(batch.column(value_col))
        for c in (key_col, *order_cols):
            valid = pc.and_(valid, pc.is_valid(batch.column(c)))
        batch = batch.filter(valid)
        cents = pc.cast(pc.round(pc.multiply(batch.column(value_col), 100.0),
                                 0), "int64")
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(_np.asarray(k))
        t = batch.select([key_col, *order_cols])
        t = t.append_column("cents", cents)
        return t.append_column(
            "bucket", pa.array((h % _np.uint64(num_buckets)).astype(_np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        g = g.sort_values([key_col, *order_cols], kind="stable")
        key = g[key_col].to_numpy()
        v = g["cents"].to_numpy(dtype=np.int64)
        n = len(g)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        # row_number: position since last key start (1-based)
        idx = np.arange(n, dtype=np.int64)
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        rownum = idx - key_start + 1
        # lag diff: v[i] - v[i-1] within key, null on first row of key
        lag_diff = np.empty(n, dtype=np.float64)
        lag_diff[0] = np.nan
        lag_diff[1:] = (v[1:] - v[:-1]).astype(np.float64)
        lag_diff[new_key] = np.nan
        # cumulative sum within key: global cumsum minus cumsum before key
        cs = np.cumsum(v)
        before_key = np.where(key_start > 0, cs[key_start - 1], 0)
        cumsum = cs - before_key
        # trailing rolling sum of `rolling` rows, clipped at the key start
        win_lo = np.maximum(idx - rolling + 1, key_start)
        prev = np.where(win_lo > 0, cs[win_lo - 1], 0)
        roll_sum = cs - prev
        cnt = idx - win_lo + 1
        roll_mean = roll_sum.astype(np.float64) / cnt
        out = g.drop(columns="bucket").copy()
        out["row_number"] = rownum
        out["lag_diff_cents"] = lag_diff
        out["cumsum_cents"] = cumsum
        out["roll_sum_cents"] = roll_sum
        out["roll_mean_cents"] = roll_mean
        return out[out_cols]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def keyed_time_window_agg(ds, key_col: str, ts_col: str, value_col: str,
                          window_seconds: int, keep_cols: list[str] | None = None,
                          num_buckets: int | None = None):
    """Per-row trailing event-time window aggregate: for every row, the
    count and cents-sum of the key's rows with ``ts`` in
    ``[row.ts - window, row.ts]`` (inclusive, peers-at-equal-ts included
    — the value-defined semantics of a SQL RANGE frame, so the result is
    independent of tie order).

    One keyed hash-bucket shuffle, then per key segment two vectorized
    ``searchsorted`` calls against the sorted timestamps + a prefix-sum
    difference — no per-row loop, no driver materialization.

    Returns a lazy Dataset: key, ts, *keep_cols, cents, n_window,
    sum_cents_window."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    keep_cols = keep_cols or []
    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    w_us = np.int64(window_seconds * 1_000_000)
    out_cols = [key_col, ts_col, *keep_cols, "cents", "n_window",
                "sum_cents_window"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        # same null convention as keyed_window_functions: null
        # key/ts/value rows are dropped, never INT64_MIN-poisoned
        valid = pc.and_(pc.and_(pc.is_valid(batch.column(key_col)),
                                pc.is_valid(batch.column(ts_col))),
                        pc.is_valid(batch.column(value_col)))
        batch = batch.filter(valid)
        cents = pc.cast(pc.round(pc.multiply(batch.column(value_col), 100.0),
                                 0), "int64")
        t = batch.select([key_col, ts_col, *keep_cols])
        t = t.append_column("cents", cents)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        g = g.sort_values([key_col, ts_col], kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["cents"].to_numpy(dtype=np.int64)
        key = g[key_col].to_numpy()
        n = len(g)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        seg_starts = np.flatnonzero(new_key)
        seg_ends = np.append(seg_starts[1:], n)
        cs = np.concatenate([[0], np.cumsum(v)])
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(seg_starts, seg_ends):
            seg = ts[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - w_us, side="left")
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        out = g.drop(columns="bucket").copy()
        out["n_window"] = hi - lo
        out["sum_cents_window"] = cs[hi] - cs[lo]
        return out[out_cols]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def sessionize(ds, key_col: str, ts_col: str, gap_seconds: int = 1800,
               num_buckets: int | None = None):
    """Session windows per key: hash-bucket shuffle + vectorized per-bucket
    session assignment (sorted diff > gap ⇒ new session).  Returns a lazy
    Dataset of (key, session_id, session_start, session_end, n_events)."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: [], "session_id": [], "session_start": [],
                                 "session_end": [], "n_events": []})
        g = g.sort_values([key_col, ts_col], kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        key = g[key_col].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_seconds * 1_000_000
        sk = np.cumsum(new_key | gap) - 1
        # renumber sessions per key (0-based within each key)
        key_first = np.maximum.accumulate(np.where(new_key, sk, -1))
        g = g.assign(session_id=sk - key_first)
        out = (g.groupby([key_col, "session_id"], sort=False)
               .agg(session_start=(ts_col, "min"), session_end=(ts_col, "max"),
                    n_events=(ts_col, "size")).reset_index())
        return out

    ds2 = ds.select_columns([key_col, ts_col]).map_batches(
        add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def cohort_retention(ds, user_col: str, ts_col: str, *,
                     period_seconds: int = 604800,
                     num_partitions: int | None = None):
    """Cohort-retention matrix: each user's cohort is their first
    activity period (fixed ``period_seconds`` buckets of the epoch,
    weeks by default); one output row per ``(cohort_week,
    week_offset)`` with the count of users from that cohort active
    that many periods later — the standard engagement/retention
    analytics shape no single groupby expresses (it needs the per-user
    first-touch joined back to every activity row).

    Scale shape: per-batch ``(user, period)`` marks are locally
    deduped (combiner), ONE shuffle co-partitions each user's marks so
    the cohort min and the per-user distinct offsets are computed
    together; the resulting (cohort, offset) cells — bounded by
    users x periods, in practice tiny — flow through ``keyed_count``.
    Null users/timestamps are excluded."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         keyed_count,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    us = np.int64(period_seconds) * np.int64(1_000_000)

    def marks(batch: pa.Table) -> pa.Table:
        df = batch.select([user_col, ts_col]).to_pandas() \
            .dropna(subset=[user_col, ts_col])
        wk = (df[ts_col].astype("datetime64[us]").astype(np.int64)
              // us)
        out = pd.DataFrame({user_col: df[user_col],
                            "wk": wk}).drop_duplicates()
        return _table_from_pandas(out, preserve_index=False)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([user_col, "wk"])
        cohort = g.groupby(user_col, sort=False)["wk"].transform("min")
        return pd.DataFrame({"cohort_week": cohort,
                             "week_offset": g["wk"] - cohort})

    cells = bucketed_group_reduce(
        ds.select_columns([user_col, ts_col])
        .map_batches(marks, batch_format="pyarrow"),
        [user_col], per_user, num_partitions)
    return keyed_count(cells, ["cohort_week", "week_offset"],
                       count_col="n_users")


def funnel_counts(ds, user_col: str, type_col: str, ts_col: str,
                  steps: list[str], *, num_partitions: int | None = None):
    """Ordered-funnel conversion counts: for each prefix of ``steps``,
    how many users performed those event types in order — the greedy
    minimal chain (t1 = first step-1 event; t_k = first step-k event at
    or after t_{k-1}), the standard product-analytics funnel that no
    single groupby expresses.

    Scale shape: rows are prefiltered to the funnel's event types, then
    only deduped ``(user, step, ts)`` marks ride ONE user-bucketed
    shuffle; each bucket resolves its users' chains with k vectorized
    merge+groupby-min passes (k = #steps) and emits k count rows, and
    the per-bucket counts sum on the driver (#buckets x k rows).  Null
    users/timestamps are excluded.  Returns a DataFrame of
    ``(step_idx, step, n_users)``."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        df = batch.select([user_col, type_col, ts_col]).to_pandas() \
            .dropna(subset=[user_col, ts_col])
        df = df[df[type_col].isin(steps)].drop_duplicates()
        return _table_from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        prev = None          # Series: user -> chain time so far
        for s in steps:
            sub = g[g[type_col] == s]
            if prev is not None:
                sub = sub.merge(prev.rename("__prev"),
                                left_on=user_col, right_index=True)
                sub = sub[sub[ts_col] >= sub["__prev"]]
            prev = sub.groupby(user_col, sort=False)[ts_col].min()
            counts.append(np.int64(len(prev)))
        return pd.DataFrame({"step_idx": np.arange(len(steps),
                                                   dtype=np.int64),
                             "step": steps, "n_users": counts})

    parts = bucketed_group_reduce(
        ds.select_columns([user_col, type_col, ts_col])
        .map_batches(marks, batch_format="pyarrow"),
        [user_col], per_bucket, num_partitions).to_pandas()
    if parts.empty:
        return pd.DataFrame({"step_idx": np.arange(len(steps),
                                                   dtype=np.int64),
                             "step": steps,
                             "n_users": np.zeros(len(steps),
                                                 dtype=np.int64)})
    return (parts.groupby(["step_idx", "step"], sort=True)["n_users"]
            .sum().reset_index())


def keyed_lead_rank(ds, key_col: str, order_cols: list[str],
                    value_col: str, num_buckets: int | None = None):
    """The forward-looking / ranking half of the window-function surface
    (``keyed_window_functions`` covers the trailing half): per key —
    lead difference (next value minus current, null on each key's last
    row in ``order_cols`` order) and the value's rank() / dense_rank()
    within its key.  Same one-keyed-bucket-shuffle shape; ranks via
    pandas' vectorized groupby.rank.

    Returns key_col, *order_cols, cents, lead_diff_cents, rank_cents,
    dense_rank_cents."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    out_cols = [key_col, *order_cols, "cents", "lead_diff_cents",
                "rank_cents", "dense_rank_cents"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as _np

        valid = pc.is_valid(batch.column(value_col))
        for c in (key_col, *order_cols):
            valid = pc.and_(valid, pc.is_valid(batch.column(c)))
        batch = batch.filter(valid)
        cents = pc.cast(pc.round(pc.multiply(batch.column(value_col),
                                             100.0), 0), "int64")
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(_np.asarray(k))
        t = batch.select([key_col, *order_cols])
        t = t.append_column("cents", cents)
        return t.append_column("bucket", pa.array(
            (h % _np.uint64(num_buckets)).astype(_np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        g = g.sort_values([key_col, *order_cols], kind="stable")
        key = g[key_col].to_numpy()
        v = g["cents"].to_numpy(dtype=np.int64)
        n = len(g)
        last_of_key = np.empty(n, dtype=bool)
        last_of_key[-1] = True
        last_of_key[:-1] = key[:-1] != key[1:]
        lead = np.empty(n, dtype=np.float64)
        lead[:-1] = (v[1:] - v[:-1]).astype(np.float64)
        lead[last_of_key] = np.nan
        out = g.drop(columns="bucket").copy()
        out["lead_diff_cents"] = lead
        grp = out.groupby(key_col, sort=False)["cents"]
        out["rank_cents"] = grp.rank(method="min").astype("int64")
        out["dense_rank_cents"] = grp.rank(method="dense").astype("int64")
        return out[out_cols]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def keyed_ntile(ds, key_col: str, order_cols: list[str], n: int, *,
                num_buckets: int | None = None):
    """Distribution ranking within each key: SQL ``ntile(n)`` and
    ``percent_rank()`` over ``PARTITION BY key ORDER BY order_cols``
    (the per-user/session quantile-bucket assignment a curation
    pipeline uses to, e.g., keep each user's top quartile of turns).

    ``order_cols`` must be a unique total order per key (ties would
    make percent_rank's rank ambiguous); rows with a null key or null
    order column are dropped (module convention).  Same one keyed
    bucket shuffle as the sibling window ops; everything inside the
    bucket is numpy.  ntile semantics match SQL exactly: with c rows,
    the first ``c % n`` tiles get ``c // n + 1`` rows."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    out_cols = [key_col, *order_cols, "tile", "pct_rank"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as _np

        valid = pc.is_valid(batch.column(key_col))
        for c in order_cols:
            valid = pc.and_(valid, pc.is_valid(batch.column(c)))
        batch = batch.filter(valid)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(_np.asarray(k))
        t = batch.select([key_col, *order_cols])
        return t.append_column("bucket", pa.array(
            (h % _np.uint64(num_buckets)).astype(_np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = {c: [] for c in out_cols}
            return pd.DataFrame(out)
        g = g.sort_values([key_col, *order_cols],
                          kind="stable").drop(columns="bucket")
        key = g[key_col].to_numpy()
        m = len(g)
        new_key = np.empty(m, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, m))
        idx = np.arange(m, dtype=np.int64) - np.repeat(starts, counts)
        c = np.repeat(counts, counts).astype(np.int64)
        q, r = c // n, c % n
        thr = r * (q + 1)
        tile = np.where(idx < thr, idx // np.maximum(q + 1, 1),
                        r + (idx - thr) // np.maximum(q, 1)) + 1
        pct = np.where(c > 1, idx / np.maximum(c - 1, 1), 0.0)
        out = g.copy()
        out["tile"] = tile.astype("int64")
        out["pct_rank"] = pct.astype("float64")
        return out[out_cols]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def keyed_multi_window_agg(ds, key_col: str, ts_col: str, value_col: str,
                           windows_seconds: list[int], *,
                           num_buckets: int | None = None):
    """``keyed_time_window_agg`` for SEVERAL trailing horizons at once
    (the 1h/24h/7d feature-vector pattern): per row, count + cents-sum
    over ``[ts - w, ts]`` for every ``w`` — ONE keyed shuffle total,
    one extra ``searchsorted`` per horizon inside the bucket, instead
    of one full shuffle per horizon.

    Same RANGE-frame value semantics and null-drop convention as the
    single-window op.  Returns key, ts, cents, then
    ``n_{w}s`` / ``sum_cents_{w}s`` per horizon."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    ws = [int(w) for w in windows_seconds]
    out_cols = [key_col, ts_col, "cents"]
    for w in ws:
        out_cols += [f"n_{w}s", f"sum_cents_{w}s"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.and_(pc.is_valid(batch.column(key_col)),
                                pc.is_valid(batch.column(ts_col))),
                        pc.is_valid(batch.column(value_col)))
        batch = batch.filter(valid)
        cents = pc.cast(pc.round(pc.multiply(batch.column(value_col),
                                             100.0), 0), "int64")
        t = batch.select([key_col, ts_col])
        t = t.append_column("cents", cents)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return t.append_column(
            "bucket",
            pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        g = g.sort_values([key_col, ts_col], kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["cents"].to_numpy(dtype=np.int64)
        key = g[key_col].to_numpy()
        n = len(g)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        seg_starts = np.flatnonzero(new_key)
        seg_ends = np.append(seg_starts[1:], n)
        cs = np.concatenate([[0], np.cumsum(v)])
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(seg_starts, seg_ends):
            hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], side="right")
        out = g.drop(columns="bucket").copy()
        for w in ws:
            w_us = np.int64(w * 1_000_000)
            lo = np.empty(n, dtype=np.int64)
            for s, e in zip(seg_starts, seg_ends):
                seg = ts[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - w_us,
                                              side="left")
            out[f"n_{w}s"] = hi - lo
            out[f"sum_cents_{w}s"] = cs[hi] - cs[lo]
        return out[out_cols]

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def transition_counts(ds, key_col: str, type_col: str,
                      order_cols: list[str], *,
                      num_buckets: int | None = None):
    """First-order Markov transition counts: for every adjacent pair of
    a key's rows in ``order_cols`` order, count (from_type, to_type) —
    the session-path / behavioral-flow statistic between ``sessionize``
    (where do sessions break) and ``funnel_counts`` (one fixed path).

    Null key/order/type rows are dropped (module convention).  ONE
    keyed bucket shuffle of the narrow (key, order, type) projection,
    one vectorized shift per bucket, then a tiny reduce bucketed by the
    (from, to) pair — output is bounded by distinct_types²."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         row_shuffle_partitions)

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(batch.column(key_col)),
                        pc.is_valid(batch.column(type_col)))
        for c in order_cols:
            valid = pc.and_(valid, pc.is_valid(batch.column(c)))
        batch = batch.filter(valid)
        t = batch.select([key_col, *order_cols, type_col])
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return t.append_column("bucket", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        g = g.sort_values([key_col, *order_cols], kind="stable")
        key = g[key_col].to_numpy()
        typ = g[type_col].to_numpy()
        same = key[:-1] == key[1:]
        df = pd.DataFrame({"from_type": typ[:-1][same],
                           "to_type": typ[1:][same]})
        out = (df.groupby(["from_type", "to_type"], sort=False)
               .size().reset_index(name="n"))
        return out.astype({"n": "int64"})

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas"))

    def sum_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["from_type", "to_type"], sort=False)["n"]
               .sum().reset_index())
        return out.astype({"n": "int64"})

    return bucketed_group_reduce(parts, ["from_type", "to_type"],
                                 sum_fn, 4)


def _range_bucket_counts(narrow, value_col: str, edges, num_buckets: int,
                         to_f64) -> "np.ndarray":
    """Exact per-range-bucket row counts as a DISTRIBUTED reduce:
    per-batch (bucket, cnt) partial rows -> one bucketed sum -> a
    ``num_buckets``-row driver landing.  (A global_agg emitting one
    count column per bucket would ship num_buckets scalars per BATCH
    to the driver — num_buckets scales with input bytes, so that shape
    breaks at 100 TB; this one lands num_buckets rows total.)"""
    import numpy as np

    from packs_ray.functions.agg import bucketed_group_reduce

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).drop_null()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        arr = to_f64(v)
        b = np.searchsorted(edges, arr, side="right")
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(uniq.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    def sum_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("b", sort=False)["cnt"].sum().reset_index()

    parts = narrow.map_batches(partial, batch_format="pyarrow")
    agg = bucketed_group_reduce(parts, ["b"], sum_fn,
                                min(num_buckets, 64)).to_pandas()
    counts = np.zeros(num_buckets, dtype=np.int64)
    if len(agg):
        counts[agg["b"].to_numpy(dtype=np.int64)] = \
            agg["cnt"].to_numpy(dtype=np.int64)
    return counts


def global_rank(ds, id_cols: list[str], value_col: str, *,
                num_buckets: int | None = None):
    """SQL ``rank()`` / ``percent_rank() OVER (ORDER BY value)`` for
    EVERY row — the global (un-keyed) counterpart of ``keyed_ntile``,
    which Ray Data cannot express at all and a naive
    ``groupby(constant)`` would funnel through one worker.

    Scale shape: range-partition instead of hash-partition.  Two cheap
    narrow scans of ``value_col`` (exact min/max, then exact per-range
    counts on fixed ``num_buckets`` edges), driver holds only the
    B-entry count vector -> exclusive prefix offsets; then ONE shuffle
    of (ids, value) rows by range bucket and a vectorized local
    min-rank per bucket, shifted by the bucket's offset.  Equal values
    always land in the same bucket (searchsorted on shared edges), so
    tie ranks are globally exact.  Known skew bound: uniform-width
    edges — a heavy-tailed column concentrates rows in few buckets
    (documented; edges-from-quantiles is the refinement if a profile
    shows it).  Null values are dropped (module convention; SQL twin
    filters them).

    Reference anchor: the packs rank only via pandas ``rank()`` inside
    a single process (outlier_detection_pack/main.py:206-220 sorts the
    whole frame); this is the distributed exact equivalent.
    """
    import numpy as np

    from packs_ray.functions.agg import global_agg, row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    narrow = ds.select_columns([value_col])
    empty_sch = pa.schema([(value_col, pa.float64())])

    def mm_partial(batch: pa.Table) -> dict:
        v = batch.column(value_col)
        mn, mx = pc.min(v), pc.max(v)
        return {"mn": mn.as_py() if mn.is_valid else None,
                "mx": mx.as_py() if mx.is_valid else None,
                "n": len(v) - v.null_count}

    def mm_combine(df: pd.DataFrame) -> dict:
        n = int(df["n"].sum())
        mns, mxs = df["mn"].dropna(), df["mx"].dropna()
        return {"n": n,
                "mn": float(mns.min()) if len(mns) else 0.0,
                "mx": float(mxs.max()) if len(mxs) else 1.0}

    mm = global_agg(narrow, mm_partial, mm_combine, empty_schema=empty_sch)
    n_total, lo, hi = mm["n"], mm["mn"], mm["mx"]
    if hi <= lo:
        hi = lo + 1.0  # constant column: everything in bucket 0
    edges = np.linspace(lo, hi, num_buckets + 1)[1:-1]

    counts = _range_bucket_counts(
        narrow, value_col, edges, num_buckets,
        lambda v: v.to_numpy(zero_copy_only=False).astype(np.float64))
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    out_cols = [*id_cols, value_col, "rnk", "pct_rank"]

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(value_col)))
        arr = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(edges, arr, side="right").astype(np.int64)
        t = batch.select([*id_cols, value_col])
        return t.append_column("bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        off = int(offsets[int(g["bucket"].iloc[0])])
        g = g.sort_values(value_col, kind="stable").drop(columns="bucket")
        v = g[value_col].to_numpy()
        m = len(g)
        new_v = np.empty(m, dtype=bool)
        new_v[0] = True
        new_v[1:] = v[1:] != v[:-1]
        # min-rank of each tie group, local then shifted to global
        local = np.maximum.accumulate(
            np.where(new_v, np.arange(m, dtype=np.int64), 0))
        rnk = off + local + 1
        out = g.copy()
        out["rnk"] = rnk
        out["pct_rank"] = ((rnk - 1) / (n_total - 1) if n_total > 1
                           else np.zeros(m))
        out["pct_rank"] = out["pct_rank"].astype("float64")
        return out[out_cols]

    ds2 = ds.select_columns([*id_cols, value_col]).map_batches(
        add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def global_row_number(ds, key_col: str, tie_cols: list[str], *,
                      out_col: str = "order_idx",
                      num_buckets: int | None = None):
    """SQL ``row_number() OVER (ORDER BY key, ties...)`` for every row —
    the unique-position sibling of ``global_rank`` (same range-bucket +
    driver-offset shape; ``(key_col, *tie_cols)`` must be a unique total
    order or positions among exact duplicates are arbitrary-but-
    deterministic after the in-bucket stable sort).

    ``key_col`` may be any numeric type (uint64 hash keys included):
    bucket assignment quantizes through float64 — lossy only for
    balance, never for correctness, because equal keys quantize equally
    and the in-bucket sort runs on the EXACT key values.  Null keys are
    dropped (module convention)."""
    import numpy as np

    from packs_ray.functions.agg import global_agg, row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    narrow = ds.select_columns([key_col])
    empty_sch = pa.schema([(key_col, pa.float64())])

    def mm_partial(batch: pa.Table) -> dict:
        v = batch.column(key_col)
        mn, mx = pc.min(v), pc.max(v)
        return {"mn": float(mn.as_py()) if mn.is_valid else None,
                "mx": float(mx.as_py()) if mx.is_valid else None}

    def mm_combine(df: pd.DataFrame) -> dict:
        mns, mxs = df["mn"].dropna(), df["mx"].dropna()
        return {"mn": float(mns.min()) if len(mns) else 0.0,
                "mx": float(mxs.max()) if len(mxs) else 1.0}

    mm = global_agg(narrow, mm_partial, mm_combine, empty_schema=empty_sch)
    lo, hi = mm["mn"], mm["mx"]
    if hi <= lo:
        hi = lo + 1.0
    edges = np.linspace(lo, hi, num_buckets + 1)[1:-1]

    def to_f64(v: pa.ChunkedArray) -> np.ndarray:
        return v.to_numpy(zero_copy_only=False).astype(np.float64)

    counts = _range_bucket_counts(narrow, key_col, edges, num_buckets,
                                  to_f64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    keep = [key_col, *tie_cols]
    out_cols = [*keep, out_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(key_col)))
        b = np.searchsorted(edges, to_f64(batch.column(key_col)),
                            side="right").astype(np.int64)
        return batch.select(keep).append_column("bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        off = int(offsets[int(g["bucket"].iloc[0])])
        g = g.sort_values(keep, kind="stable").drop(columns="bucket")
        out = g.copy()
        out[out_col] = off + np.arange(1, len(g) + 1, dtype=np.int64)
        return out[out_cols]

    ds2 = ds.select_columns(keep).map_batches(add_bucket,
                                              batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def resample_ffill(ds, key_col: str, ts_col: str, value_col: str, *,
                   every_seconds: int = 86_400,
                   num_buckets: int | None = None):
    """Per-key time-series resampling to a regular grid with forward
    fill — the gap-fill step before any per-entity trend feature or
    monitoring rollup (Ray Data has no resample primitive).

    For each key, grid points run from ``floor(min_ts / every) * every``
    to ``max_ts`` in ``every_seconds`` steps (epoch-aligned, so grids of
    different keys line up); the value at a grid point is the value of
    the LAST event at-or-before it (events at the same timestamp dedupe
    to the largest ``value`` — a deterministic tie rule both engines
    express).  Grid points before the key's first event emit null.
    ``filled`` marks carried-forward (gap) points.

    Same ONE keyed bucket shuffle as the sibling window ops; per key
    everything is numpy searchsorted.  Output size is bounded by
    (span / every) per key — choose ``every_seconds`` for the rollup
    you need, not the raw event rate.  Rows with null key/ts/value are
    dropped (module convention)."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    out_cols = [key_col, "grid_ts", value_col, "filled"]
    ev = np.int64(every_seconds) * 1_000_000   # grid step in us

    def add_bucket(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.and_(pc.is_valid(batch.column(key_col)),
                                pc.is_valid(batch.column(ts_col))),
                        pc.is_valid(batch.column(value_col)))
        batch = batch.filter(valid)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        t = batch.select([key_col, ts_col, value_col])
        return t.append_column("bucket", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        g = g.drop(columns="bucket")
        outs = []
        for key, grp in g.groupby(key_col, sort=False):
            ts = grp[ts_col].to_numpy().astype("datetime64[us]")
            v = grp[value_col].to_numpy()
            order = np.lexsort((v, ts.view(np.int64)))
            ts_i, v = ts.view(np.int64)[order], v[order]
            # dedupe same-timestamp events: keep the largest value
            last = np.r_[ts_i[1:] != ts_i[:-1], True]
            ts_i, v = ts_i[last], v[last]
            g0 = (ts_i[0] // ev) * ev
            grid = np.arange(g0, ts_i[-1] + 1, ev, dtype=np.int64)
            idx = np.searchsorted(ts_i, grid, side="right") - 1
            vals = np.where(idx >= 0, v[np.maximum(idx, 0)], np.nan)
            exact = np.zeros(len(grid), dtype=bool)
            pos = np.searchsorted(ts_i, grid, side="left")
            hit = (pos < len(ts_i))
            exact[hit] = ts_i[pos[hit]] == grid[hit]
            outs.append(pd.DataFrame({
                key_col: key,
                "grid_ts": grid.view("datetime64[us]"),
                value_col: vals,
                "filled": np.where(idx >= 0, ~exact, False)}))
        out = pd.concat(outs, ignore_index=True)
        out["filled"] = out["filled"].astype(bool)
        return out[out_cols]

    ds2 = ds.select_columns([key_col, ts_col, value_col]).map_batches(
        add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def sequence_validity(ds, key_col: str, seq_col: str, ts_col: str,
                      num_buckets: int | None = None):
    """Per-key ordering/validity profile of an event or turn stream —
    the generalized form of the transcripts role-/turn-sequence checks
    (reference: conversation turn_idx contiguity; SURVEY §2.2): under
    the deterministic (ts, seq) order per key, count duplicate
    timestamps, sequence regressions (seq lower than an earlier row's),
    and the largest inter-event gap.

    Returns a lazy Dataset of (key, n_rows, n_dup_ts, n_seq_regressions,
    max_gap_us, is_monotonic).  Rows with a null key, seq or ts are
    excluded (they are counted by the completeness checks, not here).

    Scale shape: only the three narrow columns shuffle once on
    hash(key); per-bucket work is fully vectorized (sort + shifted
    compares), output is one row per key.
    """
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, seq_col, ts_col])
        mask = pc.and_(pc.and_(batch.column(key_col).is_valid(),
                               batch.column(seq_col).is_valid()),
                       batch.column(ts_col).is_valid())
        batch = batch.filter(mask)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({key_col: [], "n_rows": [], "n_dup_ts": [],
                          "n_seq_regressions": [], "max_gap_us": [],
                          "is_monotonic": []})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g.sort_values([key_col, ts_col, seq_col], kind="stable")
        key = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        seq = g[seq_col].to_numpy(dtype=np.int64)
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        same = ~new_key
        dup_ts = np.zeros(len(g), dtype=np.int64)
        dup_ts[1:] = same[1:] & (ts[1:] == ts[:-1])
        # regression = seq strictly below the running max of earlier
        # rows of the same key (a late re-emit, not just adjacent swap);
        # segmented cummax resets at key starts
        gid = np.cumsum(new_key) - 1
        runmax = pd.Series(seq).groupby(gid).cummax().to_numpy()
        reg = np.zeros(len(g), dtype=np.int64)
        reg[1:] = same[1:] & (seq[1:] < runmax[:-1])
        gap = np.zeros(len(g), dtype=np.int64)
        gap[1:] = np.where(same[1:], ts[1:] - ts[:-1], 0)
        out = pd.DataFrame({key_col: key, "_dup": dup_ts, "_reg": reg,
                            "_gap": gap})
        agg = (out.groupby(key_col, sort=False)
               .agg(n_rows=("_dup", "size"), n_dup_ts=("_dup", "sum"),
                    n_seq_regressions=("_reg", "sum"),
                    max_gap_us=("_gap", "max")).reset_index())
        agg["is_monotonic"] = agg["n_seq_regressions"] == 0
        for c in ("n_rows", "n_dup_ts", "n_seq_regressions", "max_gap_us"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def rolling_active_keys(ds, key_col: str, ts_col: str, *,
                        window_days: int = 7,
                        num_partitions: int | None = None):
    """Trailing-window distinct actives: for every day that appears in
    the data, the number of distinct ``key_col`` values seen in the
    ``window_days`` days ENDING on it (the WAU/MAU rollup; SQL's
    COUNT(DISTINCT) OVER RANGE, which Ray Data lacks).

    Exactness: distinct (key, day) marks are exploded to the
    ``window_days`` window-ends they fall into, de-duplicated, and
    counted per window — set semantics, so any partitioning gives the
    same answer.  Only days present in the data are emitted (the SQL
    replica mirrors that).

    Scale shape: per-batch distinct (key, day) marks (a combiner — one
    mark per key per day per batch at most), one window-bucketed
    shuffle of marks × window_days (~16 B each, the documented
    amplification), per-bucket distinct count.  Null key/ts rows are
    excluded."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, ts_col]).filter(
            pc.and_(batch.column(key_col).is_valid(),
                    batch.column(ts_col).is_valid()))
        day = pc.cast(pc.floor_temporal(batch.column(ts_col), unit="day"),
                      pa.timestamp("us"))
        t = pa.table({key_col: batch.column(key_col), "day": day}) \
            .group_by([key_col, "day"]).aggregate([])
        # explode each (key, day) mark to every window END it counts in
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        reps = np.repeat(np.arange(window_days, dtype="timedelta64[D]")
                         .astype("timedelta64[us]")[None, :], len(t), 0)
        win = (d[:, None] + reps).ravel()
        return pa.table({key_col: pa.array(np.repeat(k, window_days)),
                         "win": pa.array(win, type=pa.timestamp("us"))})

    parts = ds.map_batches(marks, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates().groupby("win", sort=False)[key_col]
               .nunique().reset_index(name="n_active"))
        out["n_active"] = out["n_active"].astype(np.int64)
        return out.rename(columns={"win": "day"})

    counts = bucketed_group_reduce(parts, ["win"], reduce_fn,
                                   num_partitions)

    # restrict to days actually present: distinct days are bounded —
    # broadcast them and filter the exploded window ends
    import ray

    days = set()
    for b in ds.select_columns([ts_col]).map_batches(
            lambda t: pa.table({"day": pc.cast(
                pc.floor_temporal(t.column(ts_col).drop_null(),
                                  unit="day"),
                pa.timestamp("us")).unique()}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        days.update(b.column("day").to_pylist())
    ref = ray.put(np.sort(np.array(sorted(days),
                                   dtype="datetime64[us]")))

    def keep_real_days(batch: pa.Table) -> pa.Table:
        real = ray.get(ref)
        d = batch.column("day").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        idx = np.searchsorted(real, d)
        ok = (idx < len(real)) & (real[np.minimum(idx, len(real) - 1)] == d)
        return batch.filter(pa.array(ok))

    return counts.map_batches(keep_real_days, batch_format="pyarrow")


def activity_streaks(ds, key_col: str, ts_col: str,
                     num_buckets: int | None = None):
    """Gaps-and-islands per key: from each key's set of distinct active
    DAYS, the number of maximal consecutive-day runs, the longest run,
    and the current-longest-gap statistics — the engagement/streak view
    (SQL's row_number-difference island trick, which needs a keyed
    window Ray Data doesn't have).

    Output per key: (key, n_active_days, n_streaks, longest_streak,
    max_gap_days).  Single-day keys: 1 streak of length 1, gap 0.

    Scale shape: per-batch DISTINCT (key, day) marks (combiner), one
    keyed bucket shuffle of the ~12 B marks, vectorized sorted-diff
    islands per bucket.  Null key/ts rows are excluded."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import reduce_partition_count

    if num_buckets is None:
        num_buckets = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, ts_col]).filter(
            pc.and_(batch.column(key_col).is_valid(),
                    batch.column(ts_col).is_valid()))
        day = pc.cast(pc.floor_temporal(batch.column(ts_col), unit="day"),
                      pa.timestamp("us"))
        t = pa.table({key_col: batch.column(key_col), "day": day}) \
            .group_by([key_col, "day"]).aggregate([])
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({key_col: [],
                          "n_active_days": pd.Series([], dtype="int64"),
                          "n_streaks": pd.Series([], dtype="int64"),
                          "longest_streak": pd.Series([], dtype="int64"),
                          "max_gap_days": pd.Series([], dtype="int64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g.drop_duplicates(subset=[key_col, "day"]) \
            .sort_values([key_col, "day"], kind="stable")
        k = g[key_col].to_numpy()
        d = (g["day"].to_numpy().astype("datetime64[D]")
             .astype(np.int64))
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        diff = np.zeros(len(g), dtype=np.int64)
        diff[1:] = d[1:] - d[:-1]
        new_run = new_key | (diff > 1)
        gap = np.where(new_key, 0, np.maximum(diff - 1, 0))
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_key_idx = np.nonzero(new_run)[0]
        df = pd.DataFrame({key_col: k, "_run": run_id, "_gap": gap})
        runs = pd.DataFrame({key_col: k[run_key_idx],
                             "_len": run_len})
        agg1 = (df.groupby(key_col, sort=False)
                .agg(n_active_days=(key_col, "size"),
                     max_gap_days=("_gap", "max")).reset_index())
        agg2 = (runs.groupby(key_col, sort=False)
                .agg(n_streaks=("_len", "size"),
                     longest_streak=("_len", "max")).reset_index())
        out = agg1.merge(agg2, on=key_col)
        for c in ("n_active_days", "n_streaks", "longest_streak",
                  "max_gap_days"):
            out[c] = out[c].astype(np.int64)
        return out[[key_col, "n_active_days", "n_streaks",
                    "longest_streak", "max_gap_days"]]

    ds2 = ds.map_batches(marks, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def keyed_burstiness(ds, key_col: str, ts_col: str,
                     num_buckets: int | None = None):
    """Per-key temporal dispersion of daily activity: variance-to-mean
    ratio (index of dispersion, Fisher 1950) and the Goh–Barabási
    burstiness coefficient B = (σ−μ)/(σ+μ) of each key's daily event
    counts over the GLOBAL day span (zero-activity days inside the span
    count as zeros) — the bot/scraper/burst-crawl screen run before
    per-domain rate caps.  Null key/ts rows are excluded.

    Exactness: per-(key, day) counts are exact integers; μ, σ², VMR and
    B are pinned float64 expressions over exact integer sums (Σc, Σc²,
    span), rounded 6dp.  A Poisson-like key has VMR≈1, B≈−… → 0;
    VMR≫1 / B→1 flags bursty keys.

    Scale shape: per-batch (key, day, n) count partials (combiner), the
    bounded mark table is materialized once (|keys×active days| rows —
    far smaller than the input), its global day span read with one tiny
    aggregate, then ONE keyed bucket shuffle of the marks; no full-row
    exchange.

    Output per key: (key, n_events, n_active_days, span_days, vmr,
    burstiness), ordered by key."""
    import numpy as np

    from packs_ray.functions.agg import reduce_partition_count
    from packs_ray.stages.util import round_half_away as _r

    if num_buckets is None:
        num_buckets = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, ts_col]).filter(
            pc.and_(batch.column(key_col).is_valid(),
                    batch.column(ts_col).is_valid()))
        day = pc.cast(pc.floor_temporal(batch.column(ts_col), unit="day"),
                      pa.timestamp("us"))
        return (pa.table({key_col: batch.column(key_col), "day": day})
                .group_by([key_col, "day"])
                .aggregate([([], "count_all")])
                .rename_columns([key_col, "day", "n"]))

    mk = ds.map_batches(marks, batch_format="pyarrow").materialize()
    empty = pd.DataFrame({key_col: [],
                          "n_events": pd.Series([], dtype="int64"),
                          "n_active_days": pd.Series([], dtype="int64"),
                          "span_days": pd.Series([], dtype="int64"),
                          "vmr": pd.Series([], dtype="float64"),
                          "burstiness": pd.Series([], dtype="float64")})
    if mk.count() == 0:
        import ray.data

        return ray.data.from_pandas(empty)
    # one tiny driver aggregate for the global span (2 scalars)
    import ray.data

    agg = mk.aggregate(ray.data.aggregate.Min("day"),
                       ray.data.aggregate.Max("day"))
    lo = (pd.Timestamp(agg["min(day)"]).to_datetime64()
          .astype("datetime64[D]").astype(np.int64))
    hi = (pd.Timestamp(agg["max(day)"]).to_datetime64()
          .astype("datetime64[D]").astype(np.int64))
    span = int(hi - lo + 1)

    from packs_ray.functions.agg import bucketed_group_reduce

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = (g.groupby([key_col, "day"], sort=False)["n"].sum()
             .reset_index())
        a = (g.groupby(key_col, sort=False)
             .agg(n_events=("n", "sum"), n_active_days=("n", "size"),
                  sumsq=("n", lambda s: int((s.astype(np.int64) ** 2)
                                            .sum())))
             .reset_index())
        s = a["n_events"].to_numpy(dtype=np.float64)
        s2 = a["sumsq"].to_numpy(dtype=np.float64)
        fspan = float(span)
        mean = s / fspan
        var = np.maximum(s2 / fspan - mean * mean, 0.0)
        sig = np.sqrt(var)
        out = pd.DataFrame({
            key_col: a[key_col],
            "n_events": a["n_events"].astype(np.int64),
            "n_active_days": a["n_active_days"].astype(np.int64),
            "span_days": np.int64(span),
            "vmr": _r(var / mean, 6),
            "burstiness": _r(np.where(sig + mean > 0,
                                      (sig - mean) / (sig + mean), 0.0), 6)})
        return out

    return bucketed_group_reduce(mk, [key_col], per_key,
                                 num_buckets).sort(key_col)


def scd2_intervals(ds, key_col: str, ts_col: str, value_col: str, *,
                   num_buckets: int | None = None):
    """SCD type-2 validity intervals: each key's (ts, value)-ordered
    value history collapsed into change runs — one row per run of equal
    consecutive values: (key, value, valid_from, valid_to, version,
    is_current), with ``valid_to`` = the next run's ``valid_from``
    (null on the current run) — the warehouse dimension-history build
    the reference's pandas scripts do row-by-row, as one shuffle.

    A value that reappears later opens a NEW run (type-2 semantics);
    ties at equal ts pin by value so the run order is total.  Null
    key/ts/value rows drop (module convention).

    Scale shape: ONE keyed bucket shuffle of the narrow (key, ts,
    value) projection (a key never spans buckets), per bucket a stable
    sort + shifted compares + one groupby-cumcount — all vectorized."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.and_(pc.is_valid(batch.column(key_col)),
                                pc.is_valid(batch.column(ts_col))),
                        pc.is_valid(batch.column(value_col)))
        t = batch.filter(valid).select([key_col, ts_col, value_col])
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return t.append_column("bucket", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({
        key_col: pd.Series([], dtype="int64"),
        "value": pd.Series([], dtype=object),
        "valid_from": pd.Series([], dtype="datetime64[us]"),
        "valid_to": pd.Series([], dtype="datetime64[us]"),
        "version": pd.Series([], dtype="int64"),
        "is_current": pd.Series([], dtype=bool)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g.sort_values([key_col, ts_col, value_col], kind="stable")
        key = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        val = g[value_col].to_numpy()
        new_run = np.ones(len(g), dtype=bool)
        new_run[1:] = (key[1:] != key[:-1]) | (val[1:] != val[:-1])
        idx = np.flatnonzero(new_run)
        rkey, rts, rval = key[idx], ts[idx], val[idx]
        same_next = np.zeros(len(idx), dtype=bool)
        same_next[:-1] = rkey[:-1] == rkey[1:]
        vt = np.full(len(idx), np.datetime64("NaT", "us"))
        vt[same_next] = rts[np.flatnonzero(same_next) + 1]
        version = (pd.Series(np.ones(len(idx), dtype=np.int64))
                   .groupby(pd.Series(rkey)).cumsum().to_numpy())
        return pd.DataFrame({
            key_col: rkey, "value": rval,
            "valid_from": rts, "valid_to": vt,
            "version": version.astype(np.int64),
            "is_current": ~same_next})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(per_bucket,
                                          batch_format="pandas")
            .sort([key_col, "version"]))


def entropy_rate(ds, key_col: str, type_col: str,
                 order_cols: list[str], *,
                 num_buckets: int | None = None) -> "pd.DataFrame":
    """Predictability profile of keyed event streams: per current
    state, the Shannon conditional entropy (bits) of the next-state
    distribution, from the :func:`transition_counts` table — the
    bot/stuck-loop detector that complements ``transition_counts``
    (raw flows) and ``label_entropy`` (static mix): organic traffic
    has high next-state entropy, scripted traffic collapses toward 0.

    Floats: per-state fold -Σ (c/n) log2(c/n) runs ascending to_type
    (a Python loop == the oracle's list_sum left fold); log2 is libm.
    Counts are exact ints from the bounded distinct_types² table —
    the only driver landing.

    Output: one row per from_type — (from_type, n_out, n_next_types,
    h_bits), ordered by from_type, 6dp."""
    import math

    import numpy as np

    from packs_ray.stages.util import round_half_away as _rh

    tc = transition_counts(ds, key_col, type_col, order_cols,
                           num_buckets=num_buckets).to_pandas()
    if not len(tc):
        return pd.DataFrame({
            "from_type": pd.Series([], dtype="object"),
            "n_out": pd.Series([], dtype="int64"),
            "n_next_types": pd.Series([], dtype="int64"),
            "h_bits": pd.Series([], dtype="float64")})
    rows = []
    for ft, g in tc.sort_values(["from_type", "to_type"]) \
                   .groupby("from_type", sort=True):
        n = int(g["n"].sum())
        h = 0.0
        for c in g["n"].to_numpy(np.int64):     # left fold == list_sum
            p = c / (n * 1.0)
            h += -(p * math.log2(p))
        rows.append({"from_type": ft, "n_out": np.int64(n),
                     "n_next_types": np.int64(len(g)),
                     "h_bits": float(_rh(h, 6))})
    return pd.DataFrame(rows)


def sessionize_incremental(new_ds, state_df, key_col: str, ts_col: str,
                           gap_seconds: int = 1800,
                           num_buckets: int | None = None) -> "pd.DataFrame":
    """ONE streaming step of sessionization with boundary-state carry —
    the stateful window :func:`sessionize` cannot express across feed
    chunks: a session spanning two ingest batches must keep one id and
    one event count.  State = each key's OPEN tail session
    (key, session_id, session_start, session_end, n_events); a new
    chunk's first event within ``gap_seconds`` of the stored
    session_end CONTINUES that session (id, start and count carry
    over), else numbering resumes at session_id + 1.

    Contract (standard watermark assumption, asserted by the
    equivalence test): chunks are per-key time-ordered — every new
    event's ts >= the key's stored session_end.  Under it, emitting
    each chunk's non-tail sessions and re-feeding the tail state
    reproduces the full-run :func:`sessionize` byte-for-byte
    (pytest + the combined-output SQL oracle).

    Scale shape: state rides the SAME hash-bucket shuffle as the new
    rows (tagged virtual rows carrying their session payload), so the
    step is one co-partitioned exchange; per-bucket logic stays fully
    vectorized.  Output: pandas (key, session_id, session_start,
    session_end, n_events, is_open); rows with is_open=True are the
    next state."""
    import numpy as np
    import pandas as pd
    import ray.data

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(new_ds)

    def tag_new(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, ts_col])
        ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        n = len(t)
        return pa.table({
            key_col: t.column(key_col),
            "ts_us": ts,
            "start_us": ts,
            "w": pa.array(np.ones(n, dtype=np.int64)),
            "sid0": pa.array(np.full(n, -1, dtype=np.int64)),
            "is_state": pa.array(np.zeros(n, dtype=np.int8))})

    stream = new_ds.map_batches(tag_new, batch_format="pyarrow")
    if state_df is not None and len(state_df):
        st = pd.DataFrame({
            key_col: state_df[key_col].to_numpy(),
            "ts_us": pd.to_datetime(state_df["session_end"])
                .astype("datetime64[us]").astype(np.int64),
            "start_us": pd.to_datetime(state_df["session_start"])
                .astype("datetime64[us]").astype(np.int64),
            "w": state_df["n_events"].to_numpy(np.int64),
            "sid0": state_df["session_id"].to_numpy(np.int64),
            "is_state": np.ones(len(state_df), dtype=np.int8)})
        stream = stream.union(ray.data.from_pandas(st))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return batch.append_column("bucket", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    out_cols = [key_col, "session_id", "session_start", "session_end",
                "n_events", "is_open"]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        # state rows first at ts ties so the gap reads state -> event
        g = g.sort_values([key_col, "ts_us", "is_state"],
                          ascending=[True, True, False], kind="stable")
        key = g[key_col].to_numpy()
        ts = g["ts_us"].to_numpy(np.int64)
        is_state = g["is_state"].to_numpy(np.int8).astype(bool)
        n = len(g)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_seconds * 1_000_000
        seg = np.cumsum(new_key | gap) - 1
        idx = np.arange(n)
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        seg_in_key = seg - seg[key_start]
        # base sid: the key's state row (always its first row under the
        # watermark contract) carries sid0; keys without state start at 0
        base = np.where(is_state[key_start],
                        g["sid0"].to_numpy(np.int64)[key_start], 0)
        sid = seg_in_key + base
        out = (pd.DataFrame({
            key_col: key, "session_id": sid,
            "start_us": g["start_us"].to_numpy(np.int64),
            "ts_us": ts, "w": g["w"].to_numpy(np.int64)})
            .groupby([key_col, "session_id"], sort=False)
            .agg(start_us=("start_us", "min"), end_us=("ts_us", "max"),
                 n_events=("w", "sum")).reset_index())
        last_sid = out.groupby(key_col)["session_id"].transform("max")
        out["is_open"] = out["session_id"] == last_sid
        out["session_start"] = pd.to_datetime(out.pop("start_us"),
                                              unit="us") \
            .astype("datetime64[us]")
        out["session_end"] = pd.to_datetime(out.pop("end_us"),
                                            unit="us") \
            .astype("datetime64[us]")
        return out[out_cols]

    res = (stream.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    df = res.to_pandas()
    if not len(df):
        return pd.DataFrame({c: [] for c in out_cols})
    return df.reset_index(drop=True)


def run_incremental_sessionize(chunks, key_col: str, ts_col: str,
                               gap_seconds: int = 1800) -> "pd.DataFrame":
    """Drive :func:`sessionize_incremental` over an ordered list of
    chunk Datasets, carrying the open-tail state between steps; returns
    the combined closed+final-open session table (== the full-run
    :func:`sessionize` under the watermark contract), sorted."""
    import pandas as pd

    state = None
    closed = []
    for ch in chunks:
        out = sessionize_incremental(ch, state, key_col, ts_col,
                                     gap_seconds)
        closed.append(out[~out["is_open"]])
        state = out[out["is_open"]]
    parts = closed + ([state] if state is not None else [])
    parts = [p for p in parts if p is not None and len(p)]
    cols = [key_col, "session_id", "session_start", "session_end",
            "n_events"]
    if not parts:
        return pd.DataFrame({c: [] for c in cols})
    df = pd.concat(parts, ignore_index=True)[cols]
    return df.sort_values([key_col, "session_id"]) \
        .reset_index(drop=True).astype({"session_id": "int64",
                                        "n_events": "int64"})
