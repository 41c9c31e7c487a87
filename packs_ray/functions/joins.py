"""Distributed joins: general equi-join (broadcast + bucketed
co-partition) and a time-series as-of join.

The reference joins only as datacompy-style compares and FK anti-joins
(data_compare_pack/main.py, referential_integrity via merge); a
standalone engine needs the general operators.  Shapes follow the
repo's two-tier contract (functions/integrity.py, functions/drift.py):
below ``JOIN_BROADCAST_CAP`` rows the small side is collected once,
``ray.put`` once, and each batch joins against it with Arrow's C++
hash join (zero pandas in the hot path); above the cap both sides are
hash-co-partitioned on the key (ONE shuffle each) and merged per
bucket.  Null join keys never match (SQL semantics) on every path.

The as-of join (latest right row with ts <= left ts per key) is
bucketed-only: both sides shuffle on ``hash(by)`` and each bucket runs
one vectorized ``pd.merge_asof``.  Partitioning assumption: all rows of
one key fit in one bucket — mega-keys need upstream salting or
pre-aggregation, same contract as the conversation shuffle
(stages/conversation.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.functions.agg import reduce_partition_count

# same order of magnitude as COMPARE_BROADCAST_CAP (drift.py): a 5M-row
# narrow side is ~100s of MB in every worker heap — beyond that, shuffle.
JOIN_BROADCAST_CAP = 5_000_000


def equi_join(left_ds, right_ds, *, left_on: list[str], right_on: list[str],
              how: str = "inner", broadcast_cap: int = JOIN_BROADCAST_CAP):
    """Equi-join two Datasets.  ``how`` in {"inner", "left", "right",
    "outer"}.

    Output columns: all left columns, then right columns (join keys
    included; name collisions suffixed ``_r``).  Right side below
    ``broadcast_cap`` rows broadcasts; above it, both sides co-partition
    on the key hash.  ``right``/``outer`` always co-partition: a
    broadcast join evaluates the right side once per left batch, so
    unmatched right rows cannot be emitted exactly once."""
    if how not in ("inner", "left", "right", "outer", "semi", "anti"):
        raise ValueError(
            f"how must be inner/left/right/outer/semi/anti, got {how!r}")
    # a schema-less side is a 0-row dataset whose upstream map stages
    # never ran (known Ray behavior on empty input): its column names
    # are unknowable, so emit the only provable result instead of
    # raising — no left row can match a schema-less-empty right
    lsch, rsch = left_ds.schema(), right_ds.schema()
    if lsch is None:
        return right_ds if how in ("right", "outer") else left_ds
    if rsch is None:
        return (left_ds if how in ("left", "anti", "outer")
                else left_ds.limit(0))
    lcols = left_ds.schema().names
    ren = {c: (c + "_r" if c in lcols else c) for c in right_ds.schema().names}
    if how in ("inner", "left", "semi", "anti") \
            and right_ds.count() <= broadcast_cap:
        return _join_broadcast(left_ds, right_ds, left_on, right_on, how, ren)
    return _join_bucketed(left_ds, right_ds, left_on, right_on, how, ren)


_ARROW_HOW = {"inner": "inner", "left": "left outer",
              "semi": "left semi", "anti": "left anti"}


def _dtype_restorer(out_fields):
    """A pandas-frame fixer for the marked-union join kernels: the
    unioned group frame holds nulls in the other side's columns, so
    pandas upcasts int columns to float64 even when the join result is
    null-free.  Restores each output column to its declared Arrow type's
    pandas dtype, skipping integer casts when nulls remain (legitimate
    outer-join misses stay float64/NaN, matching a SQL client fetch)."""
    out_dtypes = {}
    for name, typ in out_fields:
        try:
            out_dtypes[name] = np.dtype(typ.to_pandas_dtype())
        except (NotImplementedError, TypeError):
            pass

    def restore(m: pd.DataFrame) -> pd.DataFrame:
        fix = {c: dt for c, dt in out_dtypes.items()
               if c in m.columns and m[c].dtype != dt
               and not (np.issubdtype(dt, np.integer) and m[c].isna().any())}
        return m.astype(fix) if fix else m

    return restore


def _arrow_schema(ds) -> pa.Schema:
    """The Dataset's schema as a pyarrow Schema (pandas-block datasets
    report numpy dtypes; object falls back to string)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        else:
            try:
                fields.append((n, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, ValueError, TypeError):
                fields.append((n, pa.string()))
    return pa.schema(fields)


def _join_broadcast(left_ds, right_ds, left_on, right_on, how, ren):
    import ray

    # collect as Arrow, NOT pandas: a pandas roundtrip promotes nullable
    # int key columns to float64 and the typed hash join then refuses
    blocks = [b for b in ray.get(right_ds.to_arrow_refs()) if len(b)]
    rt = (pa.concat_tables(blocks, promote_options="default") if blocks
          else _arrow_schema(right_ds).empty_table())
    # Arrow's hash join coalesces the right key columns away; carry temp
    # copies through as payload so the output matches the bucketed path
    # (left join: null right keys on unmatched rows, as in SQL).
    for i, c in enumerate(right_on):
        rt = rt.append_column(f"__rk{i}", rt.column(c))
    rt = rt.rename_columns(
        [c if c in right_on or c.startswith("__rk") else ren[c]
         for c in rt.column_names])
    ref = ray.put(rt)
    restore = {f"__rk{i}": ren[c] for i, c in enumerate(right_on)}

    def fn(batch: pa.Table) -> pa.Table:
        right = ray.get(ref)
        out = batch.join(right, keys=left_on, right_keys=right_on,
                         join_type=_ARROW_HOW[how], right_suffix="_r")
        return out.rename_columns([restore.get(c, c) for c in out.column_names])

    return left_ds.map_batches(fn, batch_format="pyarrow")


def _join_bucketed(left_ds, right_ds, left_on, right_on, how, ren):
    """Co-partition hash join: each side ships once, keyed on the join
    hash; one pandas merge per bucket.  Null-key rows never shuffle —
    they cannot match (SQL semantics); for a left join they are kept
    with null right columns via a separate streaming branch."""
    num_partitions = max(reduce_partition_count(left_ds),
                         reduce_partition_count(right_ds))
    lcols = left_ds.schema().names
    rcols = right_ds.schema().names
    r_on = [ren[c] for c in right_on]

    # schema-aligned union: every output column present on both sides,
    # nulls where absent, so the two marked streams share one schema.
    lschema = _arrow_schema(left_ds)
    rschema = _arrow_schema(right_ds)
    out_fields = [(c, lschema.field(c).type) for c in lcols]
    if how in ("semi", "anti"):
        # existence joins: output is left columns only; the right side
        # still ships (its keys decide existence) but contributes no
        # payload — mark only its key columns
        out_fields += [(c, rschema.field(k).type)
                       for c, k in zip(r_on, right_on)]
    else:
        out_fields += [(ren[c], rschema.field(c).type) for c in rcols]

    def mark(side, on):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.rename_columns([ren[c] for c in batch.column_names])
            mask = None
            for c in on:
                v = pa.compute.is_valid(batch.column(c))
                mask = v if mask is None else pa.compute.and_(mask, v)
            batch = batch.filter(mask)
            n = len(batch)
            h = np.zeros(n, dtype=np.uint64)
            for c in on:
                vals = batch.column(c).to_numpy(zero_copy_only=False)
                h = (h * np.uint64(31)) ^ pd.util.hash_array(np.asarray(vals))
            cols = {"__p": pa.array((h % np.uint64(num_partitions)).view(np.int64)),
                    "__side": pa.array(np.full(n, side, dtype=np.int8))}
            for name, typ in out_fields:
                cols[name] = (batch.column(name) if name in batch.column_names
                              else pa.nulls(n, typ))
            return pa.table(cols)
        return fn

    marked = (left_ds.map_batches(mark(0, left_on), batch_format="pyarrow")
              .union(right_ds.map_batches(mark(1, r_on),
                                          batch_format="pyarrow")))

    lout = [c for c, _ in out_fields if c in lcols]
    rout = [c for c, _ in out_fields if c not in lcols]
    restore_dtypes = _dtype_restorer(
        [(c, t) for c, t in out_fields if c in lcols]
        if how in ("semi", "anti") else out_fields)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][lout]
        r = g[g["__side"] == 1][rout]
        if how in ("semi", "anti"):
            rkeys = r[r_on].drop_duplicates()
            m = l.merge(rkeys, left_on=left_on, right_on=r_on,
                        how="left", indicator=True)
            keep = (m["_merge"] == "both") if how == "semi" \
                else (m["_merge"] == "left_only")
            return restore_dtypes(m.loc[keep, lout])
        return restore_dtypes(
            l.merge(r, left_on=left_on, right_on=r_on, how=how))

    joined = marked.groupby("__p").map_groups(per_bucket, batch_format="pandas")

    def null_key_branch(src, on, rename_right):
        # null-key rows cannot match (SQL semantics) and never shuffle;
        # outer-preserved sides keep them with nulls in the other side
        def null_key_rows(batch: pa.Table) -> pa.Table:
            if rename_right:
                batch = batch.rename_columns(
                    [ren[c] for c in batch.column_names])
            mask = None
            for c in on:
                v = pa.compute.is_null(batch.column(c))
                mask = v if mask is None else pa.compute.or_(mask, v)
            batch = batch.filter(mask)
            cols = {c: batch.column(c) for c in batch.column_names}
            for name, typ in out_fields:
                if name not in cols:
                    cols[name] = pa.nulls(len(batch), typ)
            return pa.table(cols)

        return src.map_batches(null_key_rows, batch_format="pyarrow")

    if how in ("left", "outer"):
        joined = joined.union(null_key_branch(left_ds, left_on, False))
    if how in ("right", "outer"):
        joined = joined.union(null_key_branch(right_ds, r_on, True))
    if how == "anti":
        # null-key left rows match nothing, so an anti join keeps them
        # (left columns only, like the bucketed output)
        def null_left(batch: pa.Table) -> pa.Table:
            mask = None
            for c in left_on:
                v = pa.compute.is_null(batch.column(c))
                mask = v if mask is None else pa.compute.or_(mask, v)
            return batch.filter(mask)

        joined = joined.union(left_ds.map_batches(null_left,
                                                  batch_format="pyarrow"))
    return joined


def asof_join(left_ds, right_ds, *, by: str, on: str,
              right_cols: list[str], direction: str = "backward"):
    """For each left row, attach the right row with the largest ``on``
    <= left ``on`` (direction="backward"; "forward" = smallest >=)
    sharing the same ``by`` key.

    Output: all left columns + ``right_cols`` (collision-suffixed
    ``_r``).  Right side should be unique per (by, on) — if several
    right rows tie exactly, the match among them is unspecified;
    pre-aggregate for determinism.  Left rows with a null key or null
    ``on`` get null matches.  One shuffle per side, one vectorized
    ``pd.merge_asof`` per bucket.
    """
    lcols = left_ds.schema().names
    ren = {c: (c + "_r" if c in lcols else c) for c in right_cols}
    if right_ds.schema() is None:
        # fully-empty right side with unknown schema (e.g. a filter that
        # dropped everything): every left row gets a null match; types
        # default to float64 since the right never materialized any.
        def all_null(batch: pa.Table) -> pa.Table:
            cols = {c: batch.column(c) for c in batch.column_names}
            for c in right_cols:
                cols[ren[c]] = pa.nulls(len(batch), pa.float64())
            return pa.table(cols)

        return left_ds.map_batches(all_null, batch_format="pyarrow")
    num_partitions = max(reduce_partition_count(left_ds),
                         reduce_partition_count(right_ds))

    lschema = _arrow_schema(left_ds)
    rschema = _arrow_schema(right_ds)
    out_fields = [(c, lschema.field(c).type) for c in lcols]
    out_fields += [(ren[c], rschema.field(c).type) for c in right_cols]

    def mark(side):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.select([by, on] + [c for c in right_cols
                                                 if c not in (by, on)])
                batch = batch.rename_columns(
                    [ren.get(c, c) if c in right_cols and c not in (by, on)
                     else c for c in batch.column_names])
            mask = pa.compute.and_(pa.compute.is_valid(batch.column(by)),
                                   pa.compute.is_valid(batch.column(on)))
            batch = batch.filter(mask)
            n = len(batch)
            vals = np.asarray(batch.column(by).to_numpy(zero_copy_only=False))
            h = pd.util.hash_array(vals) % np.uint64(num_partitions)
            cols = {"__p": pa.array(h.view(np.int64)),
                    "__side": pa.array(np.full(n, side, dtype=np.int8))}
            for name, typ in out_fields:
                cols[name] = (batch.column(name) if name in batch.column_names
                              else pa.nulls(n, typ))
            return pa.table(cols)
        return fn

    marked = (left_ds.map_batches(mark(0), batch_format="pyarrow")
              .union(right_ds.map_batches(mark(1), batch_format="pyarrow")))

    lout = [c for c, _ in out_fields if c in lcols]
    radd = [c for c, _ in out_fields if c not in lcols]
    rkeep = [by, on] + [c for c in radd if c not in (by, on)]
    restore_dtypes = _dtype_restorer(out_fields)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][lout].sort_values(on, kind="stable")
        r = g[g["__side"] == 1][rkeep].sort_values(on, kind="stable")
        if r.empty:
            out = l.copy()
            for c in radd:
                out[c] = None
            return restore_dtypes(out)
        return restore_dtypes(
            pd.merge_asof(l, r, on=on, by=by, direction=direction,
                          suffixes=("", "_r")))

    joined = marked.groupby("__p").map_groups(per_bucket, batch_format="pandas")

    # left rows with null key / null ts: appended with null matches
    def null_key_rows(batch: pa.Table) -> pa.Table:
        mask = pa.compute.or_(pa.compute.is_null(batch.column(by)),
                              pa.compute.is_null(batch.column(on)))
        batch = batch.filter(mask)
        cols = {c: batch.column(c) for c in batch.column_names}
        for name, typ in out_fields:
            if name not in cols:
                cols[name] = pa.nulls(len(batch), typ)
        return pa.table(cols)

    return joined.union(left_ds.map_batches(null_key_rows,
                                            batch_format="pyarrow"))



def interval_join(left_ds, right_ds, *, on: str, ts_col: str,
                  start_col: str, end_col: str, payload_cols: list[str]):
    """Point-in-interval (range) join: for each left row, every right
    interval of the same ``on`` key with ``start <= ts <= end`` —
    inner semantics, one output row per matching pair.  Output: all
    left columns + the interval bounds + ``payload_cols`` (names
    colliding with a left column are suffixed ``_r``).

    Ray Data has no range join; the shape here is the asof contract
    (one hash shuffle per side on the key, vectorized per-bucket merge)
    with a two-path bucket kernel: when a bucket's intervals are
    NON-overlapping per key (sessionization / tumbling windows — the
    common case), one ``pd.merge_asof`` on the interval start plus an
    end-bound filter resolves every point in O((n+m) log m); when
    overlaps exist (a point can match several intervals), the bucket
    falls back to an exact per-key merge+filter whose cost is
    points×intervals per key — fine for bounded intervals-per-key,
    the documented assumption.  Null keys/timestamps never match
    (SQL semantics).
    """
    lcols = left_ds.schema().names
    rsrc = [start_col, end_col] + [c for c in payload_cols
                                   if c not in (start_col, end_col)]
    ren = {c: (c + "_r" if c in lcols else c) for c in rsrc}
    if right_ds.schema() is None:
        # fully-empty right side with unknown schema (e.g. intervals
        # derived from an empty table): the inner join is empty; emit
        # zero rows with the left schema + float64-typed right columns
        # (the right never materialized any types)
        def empty_out(batch: pa.Table) -> pa.Table:
            cols = {c: batch.column(c) for c in batch.column_names}
            for c in rsrc:
                cols[ren[c]] = pa.nulls(len(batch), pa.float64())
            return pa.table(cols).slice(0, 0)

        return left_ds.map_batches(empty_out, batch_format="pyarrow")
    num_partitions = max(reduce_partition_count(left_ds),
                         reduce_partition_count(right_ds))
    lschema = _arrow_schema(left_ds)
    rschema = _arrow_schema(right_ds)
    out_fields = [(c, lschema.field(c).type) for c in lcols]
    out_fields += [(ren[c], rschema.field(c).type) for c in rsrc]
    rs, re_ = ren[start_col], ren[end_col]
    radd = [ren[c] for c in rsrc]

    def mark(side, need):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.select([on] + rsrc)
                batch = batch.rename_columns(
                    [on] + [ren[c] for c in rsrc])
            valid = pa.compute.is_valid(batch.column(need[0]))
            for c in need[1:]:
                valid = pa.compute.and_(valid,
                                        pa.compute.is_valid(batch.column(c)))
            batch = batch.filter(valid)
            n = len(batch)
            vals = np.asarray(batch.column(on).to_numpy(zero_copy_only=False))
            h = pd.util.hash_array(vals) % np.uint64(num_partitions)
            cols = {"__p": pa.array(h.view(np.int64)),
                    "__side": pa.array(np.full(n, side, dtype=np.int8)),
                    on: batch.column(on)}
            for name, typ in out_fields:
                if name == on:
                    continue
                cols[name] = (batch.column(name) if name in batch.column_names
                              else pa.nulls(n, typ))
            return pa.table(cols)
        return fn

    marked = (left_ds.map_batches(mark(0, [on, ts_col]),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(mark(1, [on, rs, re_]),
                                          batch_format="pyarrow")))

    out_cols = [c for c, _ in out_fields]
    restore_dtypes = _dtype_restorer(out_fields)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][lcols]
        r = g[g["__side"] == 1][[on] + radd]
        if l.empty or r.empty:
            return restore_dtypes(l.head(0).merge(r.head(0), on=on)[out_cols])
        v = r.sort_values([on, rs], kind="stable")
        karr = v[on].to_numpy()
        overlap = bool(np.any(
            (karr[1:] == karr[:-1])
            & (v[re_].to_numpy()[:-1] >= v[rs].to_numpy()[1:])))
        if not overlap:
            # merge_asof needs BOTH frames globally sorted on the time
            # column (per-key order is handled by `by` internally)
            l2 = l.sort_values(ts_col, kind="stable")
            m = pd.merge_asof(l2, r.sort_values(rs, kind="stable"),
                              left_on=ts_col, right_on=rs,
                              by=on, direction="backward")
            m = m[m[re_].notna() & (m[ts_col] <= m[re_])]
        else:
            m = l.merge(r, on=on)
            m = m[(m[ts_col] >= m[rs]) & (m[ts_col] <= m[re_])]
        return restore_dtypes(m[out_cols])

    return marked.groupby("__p").map_groups(per_bucket,
                                            batch_format="pandas")


def bloom_semi_join(left_ds, right_ds, *, left_on: str, right_on: str,
                    bits_per_key: int = 16,
                    broadcast_cap: int = JOIN_BROADCAST_CAP):
    """EXACT left-semi join with a Bloom prefilter: when the right key
    set is too large to broadcast exactly, broadcast an m-bit Bloom
    filter of it instead (m ~= bits_per_key * |right|, FPR ~5e-4 at 16
    bits/key with 8 probes), drop every left row the filter rejects
    (no false negatives, so nothing exact is lost), and run the normal
    co-partitioned semi join ONLY on the survivors.  On a selective
    probe (the common shape: "keep turns whose conv_id appears in the
    flagged-conversations table") the all-to-all shuffle shrinks from
    |left| rows to |matches| + eps false positives.

    Keys hash with the repo's shared vectorized FNV-1a + finalizer
    over CAST(key AS VARCHAR) (sketches._fnv1a_str) and double hashing
    for the 8 probe positions — one uint64 pass per batch, no Python
    row loop.  Output = left columns of matching rows, byte-identical
    to ``WHERE EXISTS`` (the Bloom pass is a pure prefilter; the exact
    join settles false positives)."""
    import ray

    from packs_ray.functions.sketches import _finalize, _fnv1a_str

    n_right = right_ds.count()
    m_bits = 1 << max(8, int(np.ceil(np.log2(
        max(1, n_right) * bits_per_key))))
    n_words = m_bits // 64
    K = 8
    _H2C = np.uint64(0x9AE16A3B2F90404F)

    def _positions(col: pa.Array) -> np.ndarray:
        h, valid = _fnv1a_str(col)
        h1 = _finalize(h[valid])
        h2 = (h1 * _H2C) | np.uint64(1)
        j = np.arange(K, dtype=np.uint64)[:, None]
        return (h1[None, :] + j * h2[None, :]) & np.uint64(m_bits - 1)

    def build_partial(batch: pa.Table) -> pa.Table:
        pos = _positions(batch.column(right_on).combine_chunks()
                         if isinstance(batch.column(right_on),
                                       pa.ChunkedArray)
                         else batch.column(right_on))
        words = np.zeros(n_words, dtype=np.uint64)
        flat = pos.ravel()
        np.bitwise_or.at(words, (flat >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (flat & np.uint64(63)))
        return pa.table({"w": pa.array([words.tolist()],
                                       type=pa.list_(pa.uint64()))})

    parts = right_ds.select_columns([right_on]).map_batches(
        build_partial, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(n_words, dtype=np.uint64)
    for w in parts["w"] if len(parts) else ():
        bloom |= np.asarray(w, dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def prefilter(batch: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        col = batch.column(left_on)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h, valid = _fnv1a_str(col)
        keep = np.zeros(len(batch), dtype=bool)
        if valid.any():
            h1 = _finalize(h[valid])
            h2 = (h1 * _H2C) | np.uint64(1)
            hit = np.ones(len(h1), dtype=bool)
            for j in range(K):
                p = (h1 + np.uint64(j) * h2) & np.uint64(m_bits - 1)
                bitset = (bl[(p >> np.uint64(6)).astype(np.int64)]
                          >> (p & np.uint64(63))) & np.uint64(1)
                hit &= bitset.astype(bool)
            keep[valid] = hit
        return batch.filter(pa.array(keep))

    def empty_left(batch: pa.Table) -> pa.Table:
        return batch.slice(0, 0)

    # 0-row right (or left) short-circuits: a semi join against an
    # empty build side is empty, and equi_join can't read a schema off
    # a 0-block stream
    if n_right == 0 or left_ds.schema() is None:
        return left_ds.map_batches(empty_left, batch_format="pyarrow")
    survivors = left_ds.map_batches(prefilter, batch_format="pyarrow")
    if survivors.schema() is None:
        return left_ds.map_batches(empty_left, batch_format="pyarrow")
    return equi_join(survivors, right_ds.select_columns([right_on]),
                     left_on=[left_on], right_on=[right_on], how="semi",
                     broadcast_cap=broadcast_cap)


def skew_join(left_ds, right_ds, *, left_on: str, right_on: str,
              phi: float = 0.01):
    """Skew-aware INNER equi-join — same row set and column contract as
    ``equi_join(how="inner")``, different physical plan for hot keys.

    A plain co-partition join sends every row of a key to ONE bucket,
    so a mega-key (the null-ish sentinel user, the default session id,
    the one viral document) turns the shuffle into a single straggler
    task.  Here the probe side's phi-heavy hitters are detected first
    (:func:`~packs_ray.functions.sketches.heavy_hitters` — exact, two
    streaming passes with fixed-size Misra-Gries partials, no
    full-cardinality groupby), then:

    - HOT keys: only the right side's hot-key rows broadcast
      (``ray.put`` once); every left batch joins them inline with
      Arrow's hash join — no shuffle touches a hot key at all;
    - COLD keys: both sides filter the hot set out and co-partition as
      usual, so every bucket is bounded by ``phi * n`` rows.

    Assumption (the dimension-side contract): the right side holds
    O(1) rows per key, so the hot broadcast is ~|hot keys| rows.  A
    hot key on BOTH sides is a cross-product whose output is
    quadratic no matter the plan — pre-aggregate one side first.

    Keys compare as strings on the hot/cold split (matching the
    heavy-hitter summary representation); null keys never match and
    are dropped on both paths (SQL inner semantics)."""
    import ray

    from packs_ray.functions.sketches import heavy_hitters

    lsch, rsch = left_ds.schema(), right_ds.schema()
    if lsch is None or rsch is None:
        return equi_join(left_ds, right_ds, left_on=[left_on],
                         right_on=[right_on], how="inner")
    hh = heavy_hitters(left_ds, left_on, phi)
    if not len(hh):
        return _join_bucketed(left_ds, right_ds, [left_on], [right_on],
                              "inner",
                              {c: (c + "_r" if c in lsch.names else c)
                               for c in rsch.names})
    hot = pa.array([str(k) for k in hh["key"]], type=pa.string())
    hot_ref = ray.put(hot)

    def side_filter(col: str, keep_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keys = batch.column(col).cast(pa.string())
            m = pc.is_in(keys, value_set=ray.get(hot_ref))
            if not keep_hot:
                m = pc.and_(pc.invert(pc.fill_null(m, False)),
                            pc.is_valid(batch.column(col)))
            else:
                m = pc.fill_null(m, False)
            return batch.filter(m)
        return fn

    ren = {c: (c + "_r" if c in lsch.names else c) for c in rsch.names}
    l_hot = left_ds.map_batches(side_filter(left_on, True),
                                batch_format="pyarrow")
    r_hot = right_ds.map_batches(side_filter(right_on, True),
                                 batch_format="pyarrow")
    l_cold = left_ds.map_batches(side_filter(left_on, False),
                                 batch_format="pyarrow")
    r_cold = right_ds.map_batches(side_filter(right_on, False),
                                  batch_format="pyarrow")
    hot_join = _join_broadcast(l_hot, r_hot, [left_on], [right_on],
                               "inner", ren)
    cold_join = _join_bucketed(l_cold, r_cold, [left_on], [right_on],
                               "inner", ren)
    return hot_join.union(cold_join)


def overlap_join(left_ds, right_ds, *, left_start: str, left_end: str,
                 right_start: str, right_end: str,
                 bucket_seconds: int = 86_400,
                 right_prefix: str = "r_",
                 num_partitions: int | None = None):
    """Interval-OVERLAP join (closed intervals, unkeyed): every
    (left, right) pair whose time intervals intersect —
    ``l.start <= r.end AND r.start <= l.end`` — the third member of the
    temporal-join family next to ``asof_join`` (point→latest point) and
    ``interval_join`` (point→containing interval).  Ray Data has no
    native equivalent.

    Distributed shape (time tiling): each interval replicates into the
    ``bucket_seconds``-wide time buckets it covers, both sides shuffle
    ONCE on ``bucket % P``, and each pair is emitted exactly once — in
    the bucket containing ``max(l.start, r.start)`` (both intervals
    provably cover that bucket when they overlap, so no pair is lost
    and cross-bucket duplicates are filtered without a distinct pass).

    Partitioning assumption (document per SURVEY §2 custom-op rule):
    per-bucket cost is |L_b| x |R_b| — ``bucket_seconds`` must be sized
    so concurrently-open intervals per bucket stay merge-joinable (a
    day for session-vs-outage diagnostics); replication factor per row
    is ceil(span / bucket_seconds).

    Rows with a null endpoint or ``end < start`` drop (they define no
    interval).  Output: left columns + right columns prefixed
    ``right_prefix`` + ``overlap_us`` (int64 inclusive-intersection
    length).  Lazy Dataset."""
    import pyarrow.compute as pc

    if left_ds.schema() is None or right_ds.schema() is None:
        # a fully-empty side with unknown schema (e.g. intervals
        # derived from an empty table through map_groups): the inner
        # join is empty; the vanished side's column names are
        # unknowable, so emit zero rows with the known side's columns
        # (house convention, cf. interval_join)
        import ray.data
        cols = {}
        for side_ds, pref in ((left_ds, ""), (right_ds, right_prefix)):
            if side_ds.schema() is not None:
                sch = _arrow_schema(side_ds)
                for c in sch.names:
                    cols[pref + c] = pd.Series(
                        [], dtype="datetime64[us]"
                        if pa.types.is_timestamp(sch.field(c).type)
                        else sch.field(c).type.to_pandas_dtype())
        cols["overlap_us"] = pd.Series([], dtype="int64")
        return ray.data.from_pandas(pd.DataFrame(cols))

    lsch = _arrow_schema(left_ds)
    rsch = _arrow_schema(right_ds)
    lcols = list(lsch.names)
    rcols = list(rsch.names)
    ren = {c: right_prefix + c for c in rcols}
    if num_partitions is None:
        num_partitions = max(reduce_partition_count(left_ds),
                             reduce_partition_count(right_ds))
    w = np.int64(bucket_seconds) * 1_000_000

    out_fields = ([(c, lsch.field(c).type) for c in lcols]
                  + [(ren[c], rsch.field(c).type) for c in rcols])
    rout = [ren[c] for c in rcols]

    def mark(side, s_col, e_col):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.rename_columns(
                    [ren[c] for c in batch.column_names])
            s_us = pc.cast(pc.cast(batch.column(s_col),
                                   pa.timestamp("us")), pa.int64())
            e_us = pc.cast(pc.cast(batch.column(e_col),
                                   pa.timestamp("us")), pa.int64())
            mask = pc.and_(pc.and_(s_us.is_valid(), e_us.is_valid()),
                           pc.less_equal(s_us, e_us))
            batch = batch.filter(mask)
            s = s_us.filter(mask).to_numpy(zero_copy_only=False)
            e = e_us.filter(mask).to_numpy(zero_copy_only=False)
            b0, b1 = s // w, e // w
            reps = (b1 - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
            # bucket id per replica: cumulative offset within each row
            off = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
            bucket = np.repeat(b0, reps) + off
            n = len(idx)
            cols = {"__b": pa.array(bucket),
                    "__p": pa.array(bucket % np.int64(num_partitions)),
                    "__side": pa.array(np.full(n, side, dtype=np.int8)),
                    "__s": pa.array(s[idx]), "__e": pa.array(e[idx])}
            taken = batch.take(pa.array(idx))
            for name, typ in out_fields:
                cols[name] = (taken.column(name)
                              if name in taken.column_names
                              else pa.nulls(n, typ))
            return pa.table(cols)
        return fn

    marked = (left_ds.map_batches(mark(0, left_start, left_end),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(
                  mark(1, ren[right_start], ren[right_end]),
                  batch_format="pyarrow")))
    restore = _dtype_restorer(out_fields + [("overlap_us", pa.int64())])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][lcols + ["__b", "__s", "__e"]]
        r = g[g["__side"] == 1][rout + ["__b", "__s", "__e"]] \
            .rename(columns={"__s": "__rs", "__e": "__re"})
        m = l.merge(r, on="__b")
        if len(m):
            mx = np.maximum(m["__s"].to_numpy(np.int64),
                            m["__rs"].to_numpy(np.int64))
            mn = np.minimum(m["__e"].to_numpy(np.int64),
                            m["__re"].to_numpy(np.int64))
            keep = (mx <= mn) & (mx // w == m["__b"].to_numpy(np.int64))
            m = m.loc[keep].assign(overlap_us=(mn - mx)[keep])
        else:
            m = m.assign(overlap_us=pd.Series([], dtype="int64"))
        return restore(m[lcols + rout + ["overlap_us"]])

    return marked.groupby("__p").map_groups(per_bucket,
                                            batch_format="pandas")
