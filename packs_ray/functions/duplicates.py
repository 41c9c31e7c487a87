"""Duplicates-finder checks + exact dedup as distributed operators.

Reference: duplicates_finder_pack/main.py:23-57 (grouped count,
``duplicates = Σ max(count-1, 0)``, distinct, score), :222-231 (the
2dp-round-before-subtract per-dataset score quirk).

Scale: per-batch partial value-counts first (combiner), then a groupby
over unique keys only — the full rows never shuffle for metrics; exact
dedup keeps min(order_col) per key group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.functions.agg import global_agg, keyed_count
from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def _key_hash128(batch: pa.Table, key_cols: list[str], num_partitions: int):
    """(h1, h2, p) — a 128-bit hash of the key columns computed from the
    ARROW columns via a string cast with a null sentinel.  Hashing the
    pandas materialization instead would be dtype-UNSTABLE: an int64
    block materializes as int64 when null-free but float64 when any
    null is present, so the same logical key hashes into two different
    groups depending on which block it rode in (both copies would then
    survive a dedup).  The arrow type is identical across blocks, so
    its string cast is too."""
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    for c in key_cols:
        col = batch.column(c)
        if pa.types.is_null(col.type):
            vals = np.full(n, "\x00<null>", dtype=object)
        else:
            s = pc.fill_null(pc.cast(col, pa.string()), "\x00<null>")
            vals = s.to_numpy(zero_copy_only=False)
        h1 = (h1 * np.uint64(1099511628211)) ^ pd.util.hash_array(
            vals, hash_key="0123456789123456")
        h2 = (h2 * np.uint64(1099511628211)) ^ pd.util.hash_array(
            vals, hash_key="6543216543210987")
    p = (h1 % np.uint64(num_partitions)).astype(np.int64)
    return h1.view(np.int64), h2.view(np.int64), p


def duplicate_metrics(ds, key_cols: list[str]) -> pd.DataFrame:
    """One row: total_rows, duplicate_rows, distinct_count,
    duplicate_percent (4dp) and score (reference quirk: rate rounded to
    2dp BEFORE 1-x, duplicates_finder_pack/main.py:230-231)."""
    counts = keyed_count(ds, key_cols)

    def partial(batch: pa.Table) -> dict:
        import pyarrow.compute as pc
        c = batch.column("cnt")
        return {"groups": len(c), "rows": pc.sum(c).as_py() or 0,
                "dups": pc.sum(pc.subtract(c, 1)).as_py() or 0}

    def combine(p: pd.DataFrame) -> dict:
        return {k: int(p[k].sum()) for k in ("groups", "rows", "dups")}

    agg = global_agg(counts, partial, combine,
                     empty_schema=pa.schema([("cnt", pa.int64())]))
    rows, dups, groups = agg["rows"], agg["dups"], agg["groups"]
    rate = dups / rows if rows else 0.0
    return pd.DataFrame([{
        "total_rows": rows, "duplicate_rows": dups, "distinct_count": groups,
        "duplicate_percent": float(_r(rate, 4)),
        "score": max(0.0, 1 - float(_r(rate, 2))),
    }])


def duplicate_rows(ds, key_cols: list[str], export_cap: int = 10_000):
    """Full rows whose key appears more than once — the reference's
    dup-keys inner join-back export (duplicates_finder_pack/main.py:60-84,
    head-capped at 10k like :12).  The join is a broadcast semi-join:
    duplicated keys (≤ export_cap of them, collected via the partial-count
    shuffle) are shipped once via ray.put and each batch filters locally —
    no full-row shuffle.  Returns a lazy Dataset (capped)."""
    import pyarrow.compute as pc

    import ray

    counts = keyed_count(ds, key_cols)

    def only_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("cnt"), 1))

    dup_keys = counts.map_batches(only_dups, batch_format="pyarrow") \
        .limit(export_cap).to_pandas()
    if dup_keys.empty:
        return ds.limit(0)
    if len(dup_keys) >= export_cap:
        print(f"duplicate_rows: duplicated-key set hit export_cap={export_cap}; "
              "export truncated")
    keyset_ref = ray.put(set(map(tuple, dup_keys[key_cols].itertuples(index=False))))

    def filter_rows(batch: pa.Table) -> pa.Table:
        import numpy as np

        keyset = ray.get(keyset_ref)
        cols = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        mask = np.fromiter((t in keyset for t in zip(*cols)), dtype=bool,
                           count=len(batch))
        return batch.filter(pa.array(mask))

    return ds.map_batches(filter_rows, batch_format="pyarrow").limit(export_cap)


def dedup_against(ds, snapshot_ds, key_cols: list[str], id_col: str,
                  num_partitions: int | None = None):
    """Incremental-crawl dedup: ids of ``ds`` rows whose ``key_cols``
    content does NOT appear in ``snapshot_ds`` (anti-join on content —
    the "new crawl vs. last snapshot" step; internal duplicates within
    ``ds`` are kept, compose with ``dedup_exact`` for those).

    Scale design: both sides reduce to the same 128-bit dual hash as
    ``dedup_exact`` inside ``map_batches`` — only narrow
    (id, h1, h2) rows ride the ONE co-partitioned shuffle, never the
    text.  The snapshot side is locally deduped per batch (combiner)
    before the exchange.  Both sides must carry ``id_col`` (snapshot ids
    are exchanged but unused) so no column is ever null and integer id
    dtypes survive the pandas bucket reduce intact."""
    import numpy as np

    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = max(reduce_partition_count(ds),
                             reduce_partition_count(snapshot_ds))

    def mk_partial(side: int, local_dedup: bool):
        def partial(batch: pa.Table) -> pa.Table:
            sel = batch.select([id_col] + key_cols)
            # ARROW-column hashing (_key_hash128): hashing the pandas
            # materialization is dtype-unstable across blocks (int64
            # vs float64 depending on null presence)
            h1, h2, p = _key_hash128(sel, key_cols, num_partitions)
            out = pd.DataFrame({
                id_col: sel.column(id_col).to_pandas(),
                "__h1": h1, "__h2": h2, "__p": p,
                "__side": np.full(len(h1), side, dtype=np.int8)})
            if local_dedup:
                out = out.drop_duplicates(["__h1", "__h2"])
            return _table_from_pandas(out, preserve_index=False)
        return partial

    new_marks = ds.map_batches(mk_partial(0, False), batch_format="pyarrow")
    snap_marks = snapshot_ds.map_batches(mk_partial(1, True),
                                         batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["__side"] == 0]
        snap = g[g["__side"] == 1]
        if not snap.empty:
            mi_new = pd.MultiIndex.from_arrays([new["__h1"], new["__h2"]])
            mi_snap = pd.MultiIndex.from_arrays([snap["__h1"], snap["__h2"]])
            new = new[~mi_new.isin(mi_snap)]
        return new[[id_col]]

    return (new_marks.union(snap_marks).groupby("__p")
            .map_groups(per_bucket, batch_format="pandas"))


def save_dedup_state(ds, key_cols: list[str], state_dir: str,
                     run_id: str = "run0") -> str:
    """Persist the 128-bit content marks of a corpus snapshot so later
    ingests can dedup against it WITHOUT rescanning the corpus (the
    exact-dedup sibling of ``sketches.save_distinct_state``): 16 bytes
    per distinct key ride a distributed parquet write — the text never
    moves and never lands on the driver.  One directory per run under
    ``state_dir`` (write-to-tmp + atomic rename: resume-safe; a
    re-run of the same run_id replaces it idempotently).  Marks use
    the same Arrow-cast `_key_hash128` as dedup_exact, so a state
    written by one run matches hashes computed by any other."""
    import os
    import shutil

    def marks(batch: pa.Table) -> pa.Table:
        h1, h2, _ = _key_hash128(batch.select(key_cols), key_cols, 1)
        out = pd.DataFrame({"__h1": h1, "__h2": h2}) \
            .drop_duplicates(["__h1", "__h2"])
        return _table_from_pandas(out, preserve_index=False)

    tmp = os.path.join(state_dir, f".tmp_{run_id}")
    final = os.path.join(state_dir, run_id)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(state_dir, exist_ok=True)
    ds.map_batches(marks, batch_format="pyarrow").write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)  # 0-row write emits no files
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    return final


def dedup_against_state(ds, key_cols: list[str], id_col: str,
                        state_dirs: list[str],
                        num_partitions: int | None = None):
    """Incremental-crawl dedup against PERSISTED marks: ids of ``ds``
    rows whose content hash appears in none of the ``state_dirs``
    written by ``save_dedup_state`` (the union of runs is the corpus
    seen so far).  Equivalent to ``dedup_against`` with the historical
    snapshot as the right side, but the right side is 16 B/key marks
    read straight from parquet — the continuous-ingest shape where
    re-reading yesterday's 100 TB is not an option.

    Scale: state marks and new-row marks co-partition on h1; only
    (id, h1, h2) rows move."""
    import ray

    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def new_marks(batch: pa.Table) -> pa.Table:
        sel = batch.select([id_col] + key_cols)
        h1, h2, p = _key_hash128(sel, key_cols, num_partitions)
        return _table_from_pandas(pd.DataFrame({
            id_col: sel.column(id_col).to_pandas(),
            "__h1": h1, "__h2": h2, "__p": p,
            "__side": np.full(len(h1), 0, dtype=np.int8)}),
            preserve_index=False)

    # typed id sentinel so the union schema matches across sides and
    # integer id dtypes survive the pandas bucket reduce
    sch = ds.schema()
    if sch is None:                 # schema-less 0-row input
        return ds
    id_type = sch.base_schema.field(id_col).type
    sentinel = "" if pa.types.is_string(id_type) or \
        pa.types.is_large_string(id_type) else 0

    def state_marks(batch: pa.Table) -> pa.Table:
        h1 = batch.column("__h1").to_numpy(zero_copy_only=False)
        p = (h1.view(np.uint64)
             % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({
            id_col: pa.array(
                np.full(len(h1), sentinel, dtype=object), type=id_type),
            "__h1": batch.column("__h1"), "__h2": batch.column("__h2"),
            "__p": pa.array(p),
            "__side": pa.array(np.ones(len(h1), dtype=np.int8))})

    import glob
    import os

    paths: list[str] = []           # Ray rejects dirs inside a list
    for d in state_dirs:
        if os.path.isdir(d):
            paths.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        elif os.path.exists(d):
            paths.append(d)
    if not paths:                   # empty corpus so far: keep all
        return ds.select_columns([id_col])
    state = ray.data.read_parquet(paths, columns=["__h1", "__h2"]) \
        .map_batches(state_marks, batch_format="pyarrow")
    new = ds.map_batches(new_marks, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keep = g[g["__side"] == 0]
        seen = g[g["__side"] == 1]
        if not seen.empty:
            mi_new = pd.MultiIndex.from_arrays([keep["__h1"],
                                                keep["__h2"]])
            mi_seen = pd.MultiIndex.from_arrays([seen["__h1"],
                                                 seen["__h2"]])
            keep = keep[~mi_new.isin(mi_seen)]
        return keep[[id_col]]

    return (new.union(state).groupby("__p")
            .map_groups(per_bucket, batch_format="pandas"))


def dedup_exact(ds, key_cols: list[str], order_col: str,
                num_partitions: int | None = None):
    """Exact dedup: keep the row with min(order_col) per key group.
    Returns a lazy Dataset of (key_cols..., order_col) survivors.

    Scale design: the shuffle groups on a 128-bit content hash of the key
    columns (two vectorized 64-bit hashes with distinct keys), never on
    the raw values — long text keys would otherwise dominate the sort
    exchange.  Collision probability at 10^12 keys is ~1e-14 (birthday,
    2^128); the first surviving value of each hash group is re-read from
    the partial rows, so output columns are the real keys.

    (For full-row survivors join the result back on order_col, or use the
    pipeline-level dedup_stage which marks rows in place.)
    """
    import numpy as np

    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        sel = batch.select(key_cols + [order_col])
        h1, h2, p = _key_hash128(sel, key_cols, num_partitions)
        df = sel.to_pandas()
        df = df.assign(__h1=h1, __h2=h2, __p=p)
        out = (df.groupby(["__p", "__h1", "__h2"], dropna=False, sort=False)
               .agg({order_col: "min", **{c: "first" for c in key_cols}})
               .reset_index())
        return _table_from_pandas(out, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # sort so "first" key value is the one carried by the min-order row
        g = g.sort_values(order_col, kind="stable")
        out = (g.groupby(["__h1", "__h2"], dropna=False, sort=False)
               .agg({order_col: "min", **{c: "first" for c in key_cols}})
               .reset_index())
        return out[key_cols + [order_col]]

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("__p").map_groups(per_bucket, batch_format="pandas")


def dedup_latest(ds, key_cols: list[str], ts_col: str, id_col: str,
                 num_partitions: int | None = None):
    """Recency dedup: keep the row with max(ts_col) per key group, ties
    to min(id_col) — the crawl-snapshot policy (newest fetch of a URL
    wins) complementing ``dedup_exact``'s keep-first.  Returns a lazy
    Dataset of (key_cols..., ts_col, id_col) survivors.

    Same scale shape as dedup_exact: per-batch argmax partials ride the
    shuffle keyed on a 128-bit key hash (long text keys never move
    twice), one vectorized per-bucket argmax.  Null timestamps lose to
    any real timestamp (SQL NULLS LAST)."""
    import numpy as np

    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    cols = key_cols + [ts_col, id_col]

    def best(df: pd.DataFrame, group_keys: list[str]) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], ascending=[False, True],
                            kind="mergesort", na_position="last")
        return df.groupby(group_keys, dropna=False, sort=False).head(1)

    def partial(batch: pa.Table) -> pa.Table:
        sel = batch.select(cols)
        h1, h2, p = _key_hash128(sel, key_cols, num_partitions)
        df = sel.to_pandas()
        df = df.assign(__h1=h1, __h2=h2, __p=p)
        out = best(df, ["__p", "__h1", "__h2"])
        return _table_from_pandas(out, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return best(g, ["__h1", "__h2"])[cols]

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("__p").map_groups(per_bucket, batch_format="pandas")


def dup_size_histogram(ds, key_cols: list[str],
                       num_partitions: int | None = None):
    """Duplicate-group size distribution: how many distinct key values
    occur exactly 1×, 2×, 3×, ... — the dedup PLANNING view the
    duplicates pack's single metric row doesn't give (is duplication a
    few huge mirror clusters or a long tail of pairs?  the answer
    decides cap/salting parameters for the dedup shuffle itself).

    Output: (group_size, n_groups) sorted ascending.  SQL nulls group
    together (the 128-bit hash uses a null sentinel).

    Scale shape: per-batch partial counts of the 128-bit content hash
    ride one bucketed sum (the dedup-marks shape, ~40 B/row); the
    second aggregation runs over (size, count) partials bounded by the
    distinct group-size count.  A hash collision would merge two
    groups (odds ~k²/2¹²⁹)."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         keyed_count,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        h1, h2, _ = _key_hash128(batch, key_cols, 1)
        return pa.table({"h1": pa.array(h1.view(np.int64)),
                         "h2": pa.array(h2.view(np.int64))})

    per_group = keyed_count(
        ds.select_columns(key_cols).map_batches(
            marks, batch_format="pyarrow"),
        ["h1", "h2"], count_col="group_size",
        num_partitions=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["group_size"]).to_pandas()
        out = (df.groupby("group_size", sort=False).size()
               .reset_index(name="n_groups"))
        out["n_groups"] = out["n_groups"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    parts = per_group.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("group_size", sort=True)["n_groups"]
               .sum().reset_index())
        out["n_groups"] = out["n_groups"].astype(np.int64)
        return out

    return bucketed_group_reduce(parts, ["group_size"], reduce_fn,
                                 num_partitions)


def cross_source_overlap(ds, text_col: str, source_col: str,
                         num_partitions: int | None = None) -> pd.DataFrame:
    """Pairwise cross-source duplication matrix: for every pair of
    sources (a < b), how many DISTINCT documents they share verbatim
    (exact content identity), with Jaccard and containment — the
    corpus-mixing diagnostic run before weighting sources (a mirror
    pair of crawls shows up as jaccard→1 and should not be counted
    twice in a mixture).  Rows with a null text or source are excluded.

    Identity is the engine-wide 128-bit content hash (``_key_hash128``
    — collision odds ~n²/2¹²⁸, negligible), so the DuckDB oracle can
    equivalently compare raw text equality.

    Scale shape: per-batch DISTINCT (h1, h2, source) marks (combiner,
    ~24 B/doc — text never shuffles), ONE hash-bucketed exchange; each
    bucket emits per-source distinct totals plus per-source-pair common
    counts (≤|S|² rows); only those bounded partials reach the driver,
    which assembles the full |S|(|S|−1)/2 upper triangle (0-common
    pairs included).

    Output: (source_a, source_b, n_a, n_b, n_common, jaccard,
    containment), ordered by (source_a, source_b); jaccard =
    common/(n_a+n_b−common), containment = common/min(n_a, n_b), 6dp."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.select([text_col, source_col]).filter(pc.and_(
            batch.column(text_col).is_valid(),
            batch.column(source_col).is_valid()))
        h1, h2, _ = _key_hash128(batch, [text_col], 1)
        t = pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                      "src": batch.column(source_col)})
        return t.group_by(["h1", "h2", "src"]).aggregate([])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"kind": pd.Series([], dtype="int64"),
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64")}
        if len(g) == 0:
            return pd.DataFrame(cols)
        d = g.drop_duplicates(subset=["h1", "h2", "src"])
        tot = (d.groupby("src", sort=False).size()
               .reset_index(name="n"))
        tot = pd.DataFrame({"kind": np.int64(0), "a": tot["src"],
                            "b": "", "n": tot["n"].astype(np.int64)})
        m = d.merge(d, on=["h1", "h2"])
        m = m[m["src_x"] < m["src_y"]]
        pair = (m.groupby(["src_x", "src_y"], sort=False).size()
                .reset_index(name="n"))
        pair = pd.DataFrame({"kind": np.int64(1), "a": pair["src_x"],
                             "b": pair["src_y"],
                             "n": pair["n"].astype(np.int64)})
        return pd.concat([tot, pair], ignore_index=True)

    parts = bucketed_group_reduce(
        ds.select_columns([text_col, source_col])
          .map_batches(marks, batch_format="pyarrow"),
        ["h1", "h2"], per_bucket, num_partitions).to_pandas()
    empty = pd.DataFrame({
        "source_a": pd.Series([], dtype=object),
        "source_b": pd.Series([], dtype=object),
        "n_a": pd.Series([], dtype="int64"),
        "n_b": pd.Series([], dtype="int64"),
        "n_common": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64"),
        "containment": pd.Series([], dtype="float64")})
    if parts.empty or "kind" not in parts.columns:
        return empty
    tot = (parts[parts["kind"] == 0].groupby("a", sort=True)["n"]
           .sum())
    common = (parts[parts["kind"] == 1]
              .groupby(["a", "b"], sort=True)["n"].sum())
    srcs = sorted(tot.index)
    rows = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            na, nb = int(tot[sa]), int(tot[sb])
            c = int(common.get((sa, sb), 0))
            rows.append({
                "source_a": sa, "source_b": sb,
                "n_a": np.int64(na), "n_b": np.int64(nb),
                "n_common": np.int64(c),
                "jaccard": float(_r(c / (na + nb - c), 6)),
                "containment": float(_r(c / min(na, nb), 6))})
    return pd.DataFrame(rows) if rows else empty


def dedup_within_window(ds, key_cols: list[str], ts_col: str, id_col: str,
                        window_seconds: int,
                        num_partitions: int | None = None):
    """Streaming repeat suppression: mark each row kept=False when the
    SAME content (key_cols) was last seen within ``window_seconds``
    before it — re-crawls, retry storms, and copy-paste turn repeats
    drop while genuine periodic re-occurrences survive.  Semantics are
    SQL ``lag(ts) OVER (PARTITION BY content ORDER BY ts, id)``: a row
    keeps iff it has no predecessor or ``ts - prev_ts >
    window_seconds`` (strict; predecessor is the previous SIGHTING,
    kept or not, so the rule is one window-pass, not a kept-chain
    recursion).  Rows with null key/ts/id are dropped (module
    convention).  Returns a lazy Dataset of (id, ts, kept).

    Scale shape: content groups on the 128-bit key hash (long text
    never rides the exchange); ONE narrow bucketed shuffle of
    (h1, h2, ts, id) marks; per-group numpy diff.  Ties on equal ts
    order by id, deterministically."""
    import numpy as np

    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    win_us = np.int64(window_seconds) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        valid = pc.is_valid(batch.column(id_col))
        valid = pc.and_(valid, pc.is_valid(batch.column(ts_col)))
        for c in key_cols:
            valid = pc.and_(valid, pc.is_valid(batch.column(c)))
        batch = batch.filter(valid)
        sel = batch.select(key_cols + [ts_col, id_col])
        h1, h2, p = _key_hash128(sel, key_cols, num_partitions)
        ts = sel.column(ts_col).cast(pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        ids = sel.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"__p": pa.array(p), "__h1": pa.array(h1),
                         "__h2": pa.array(h2),
                         "ts_us": pa.array(ts, type=pa.int64()),
                         id_col: pa.array(ids)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h1", "__h2", "ts_us", id_col],
                          kind="stable")
        h1 = g["__h1"].to_numpy()
        h2 = g["__h2"].to_numpy()
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        first = np.ones(len(g), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        kept = first | (gap > win_us)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "ts_us": ts, "kept": kept})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("__p").map_groups(per_bucket,
                                           batch_format="pandas")


def key_collisions(ds, key_col: str, num_partitions: int | None = None):
    """Normalized-key collision report: raw key values that become
    IDENTICAL after whitespace-collapse + trim + lowercase but differ
    as stored — the classic silent-join-breaker (\"Acme Corp\" vs
    \"acme  corp \") and the cheap precursor to full entity resolution
    (see entity_clusters for the fuzzy tier).

    Normalization spec (shared verbatim with the SQL oracle): collapse
    every whitespace run to one space, trim spaces, lowercase.  Output
    one row per colliding normalized key: (norm_key, n_rows,
    n_raw_variants), n_raw_variants > 1, sorted by norm_key.  Null keys
    drop.

    Scale: per-block (norm, raw, n) combiner, ONE bucketed shuffle on
    hash(norm); only collision rows (a tiny set on honest data) leave
    the reduce."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)

    def marks(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        norm = pc.utf8_lower(pc.utf8_trim(pc.replace_substring_regex(
            col, r"[ \t\n\r\f\v]+", " "), " "))
        df = pd.DataFrame({"norm_key": norm.to_numpy(zero_copy_only=False),
                           "raw": col.to_numpy(zero_copy_only=False)})
        out = (df.groupby(["norm_key", "raw"], sort=False)
               .size().reset_index(name="n"))
        h = pd.util.hash_array(out["norm_key"].to_numpy(dtype=object))
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("norm_key", sort=False)
               .agg(n_rows=("n", "sum"), n_raw_variants=("raw", "nunique"))
               .reset_index())
        agg = agg[agg["n_raw_variants"] > 1]
        agg["n_rows"] = agg["n_rows"].astype("int64")
        agg["n_raw_variants"] = agg["n_raw_variants"].astype("int64")
        return agg[["norm_key", "n_rows", "n_raw_variants"]]

    return (ds.select_columns([key_col])
            .map_batches(marks, batch_format="pyarrow")
            .groupby("__p").map_groups(per_bucket, batch_format="pandas")
            .sort("norm_key"))


def dup_weights(ds, id_col: str, key_cols: list[str],
                num_partitions: int | None = None):
    """Soft-dedup sampling weights: every row's exact duplicate-group
    size over ``key_cols`` and ``weight = round(1/n, 6)`` — the
    downweight-instead-of-drop alternative to hard dedup (each content
    group contributes total weight ~1 to the training mixture, so
    boilerplate stops dominating without losing coverage).

    Scale shape: ONE shuffle of narrow (id, h1, h2) marks — rows group
    on the 128-bit content hash (the dedup_exact convention; raw text
    never moves), all rows of a hash land in one bucket, so the
    per-bucket group size IS the exact global size.  ~24 B/row on the
    wire regardless of text size.

    Output: lazy Dataset (id_col, group_size, weight) sorted by id."""
    from packs_ray.functions.agg import reduce_partition_count

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        sel = batch.select(key_cols + [id_col])
        h1, h2, p = _key_hash128(sel, key_cols, num_partitions)
        return pa.table({
            id_col: sel.column(id_col),
            "__h1": pa.array(h1),
            "__h2": pa.array(h2),
            "__p": pa.array(p)})

    empty = pd.DataFrame({
        id_col: pd.Series([], dtype="int64"),
        "group_size": pd.Series([], dtype="int64"),
        "weight": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        n = (g.groupby(["__h1", "__h2"], sort=False)[id_col]
             .transform("size").to_numpy(dtype=np.int64))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "group_size": n,
            "weight": _r(1.0 / n.astype(np.float64), 6)})

    return (ds.map_batches(marks, batch_format="pyarrow")
            .groupby("__p").map_groups(per_bucket, batch_format="pandas")
            .sort(id_col))


def cdc_merge(snapshot_ds, changelog_ds, key_cols: list[str],
              ts_col: str, *, op_col: str = "op",
              num_partitions: int | None = None):
    """Apply a CDC changelog (upserts + tombstone deletes) to a
    snapshot — the merge step between :func:`dedup_latest` (upsert-only
    latest-wins) and :func:`drift.snapshot_diff` (which DETECTS the
    delta; this APPLIES one): per key the newest record wins, where
    "newest" orders by (ts, source, payload..., op) — the changelog
    beats the snapshot on ts ties (a change observed at the same
    instant as the base row supersedes it), and the payload + op tail
    pins the winner deterministically even for changelogs with
    duplicate (key, ts) rows (no arrival-order dependence).  A winning
    ``op_col`` = 'D' tombstone removes the key entirely.

    Changelog rows must carry ``op_col`` in {'U', 'D'}; snapshot rows
    need no op column (one is added as 'U').  Null keys/ts drop.

    Scale shape: tag + union the two lazy streams, ONE bucketed
    reduce on hash(key); the per-bucket winner pick is a vectorized
    sort + groupby-tail.  Output: a lazy Dataset with the snapshot's
    columns (op/source helpers removed)."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    import pyarrow.compute as pc

    from packs_ray.functions.joins import _arrow_schema

    sch = _arrow_schema(snapshot_ds)
    payload = [f.name for f in sch if f.name not in (op_col,)]

    def tag(src: int, with_op: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = None
            for c in key_cols + [ts_col]:
                v = batch.column(c).is_valid()
                mask = v if mask is None else pc.and_(mask, v)
            batch = batch.filter(mask)
            if with_op:
                op = batch.column(op_col).cast(pa.string())
                batch = batch.drop_columns([op_col])
            else:
                op = pa.array(["U"] * len(batch), type=pa.string())
            batch = batch.select(payload)
            batch = batch.append_column("__op", op)
            return batch.append_column("__src", pa.array(
                np.full(len(batch), src, dtype=np.int8)))
        return fn

    stream = (snapshot_ds.map_batches(tag(0, False),
                                      batch_format="pyarrow")
              .union(changelog_ds.map_batches(tag(1, True),
                                              batch_format="pyarrow")))
    if num_partitions is None:
        num_partitions = reduce_partition_count(snapshot_ds)

    # winner = max under (ts, src, payload..., op): the payload + op
    # tail makes the pick deterministic even when multiple changelog
    # rows share (key, ts, src) — arrival/partition order never
    # decides (fully identical rows tie, but then the winner is
    # identical too); the SQL twin mirrors the same DESC chain
    tie_cols = [c for c in payload if c not in set(key_cols + [ts_col])]

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + [ts_col, "__src"] + tie_cols
                          + ["__op"], kind="stable")
        win = g.groupby(key_cols, sort=False).tail(1)
        win = win[win["__op"] != "D"]
        return win[payload]

    out = bucketed_group_reduce(stream, key_cols, pick, num_partitions)
    # the pandas reduce upcasts (us timestamps -> ns); restore the
    # snapshot's arrow schema
    target = pa.schema([sch.field(c) for c in payload])

    def restore(batch: pa.Table) -> pa.Table:
        return batch.select(payload).cast(target)

    return out.map_batches(restore, batch_format="pyarrow")

