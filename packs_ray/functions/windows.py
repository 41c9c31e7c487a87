"""Windowed aggregates over the events stream table.

Ray Data has no event-time windows (SURVEY.md §2.9); tumbling windows are
expressed as groupby over a derived window key — partial counts per batch
first (combiner), then a groupby over the (small) per-window partials.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


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
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([key_col, "window_start"], sort=False)
                [["n_events", "sum_value_cents"]].sum().reset_index())

    return bucketed_group_reduce(parts, [key_col, "window_start"], reduce_fn,
                                 num_partitions)


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
