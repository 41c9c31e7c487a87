"""Streaming global-aggregate helpers (partial + final).

The reference accumulates chunk partials in driver lists
(CompletenessAggregator etc., profiling_pack/main.py:222-230,507-509);
here each Ray block produces ONE partial row inside ``map_batches`` and
the driver combines the tiny partial table — no shuffle, no full
materialization.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def _est_bytes_and_cpus(input_ds) -> tuple[int, int]:
    import ray

    try:
        nbytes = input_ds.size_bytes() or 0
    except Exception:
        nbytes = 0
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return nbytes, cpus


def reduce_partition_count(input_ds, *, target_bytes: int = 8 << 20,
                           floor: int = 1) -> int:
    """Reduce-partition count for a POST-COMBINER shuffle (the data that
    moves is per-batch partial aggregates, far smaller than ``input_ds``):
    ~one partition per ``target_bytes`` of (estimated, metadata-derived)
    input, capped at 2×cluster CPUs.  Keeps small-input shuffles from
    exploding into O(blocks²) tiny tasks while still fanning out on
    real data volumes."""
    nbytes, cpus = _est_bytes_and_cpus(input_ds)
    return max(floor, min(2 * cpus, int(nbytes // target_bytes) + 1))


def row_shuffle_partitions(input_ds, *, parallel_bytes: int = 2 << 20,
                           partition_bytes: int = 128 << 20) -> int:
    """Partition count for a FULL-ROW shuffle (every input row moves):
    at small scale, enough partitions to keep the pool busy (one per
    ~``parallel_bytes``, capped at 2×CPUs); at large scale, uncapped
    ~``partition_bytes`` partitions so each reduce partition still fits
    in a worker's heap."""
    nbytes, cpus = _est_bytes_and_cpus(input_ds)
    small = min(2 * cpus, int(nbytes // parallel_bytes) + 1)
    return max(small, int(nbytes // partition_bytes))


def global_agg(ds, partial_fn: Callable[[pa.Table], dict[str, Any]],
               combine_fn: Callable[[pd.DataFrame], dict[str, Any]],
               empty_schema: "pa.Schema | None" = None) -> dict[str, Any]:
    """partial_fn: batch -> flat dict of partial stats (one row).
    combine_fn: DataFrame of partial rows -> final dict.

    ``empty_schema``: fallback batch schema for 0-row inputs whose lazy
    schema is unknowable (any transform over zero blocks loses it) —
    supply the columns ``partial_fn`` touches."""

    def partial(batch: pa.Table) -> pa.Table:
        d = partial_fn(batch)
        return pa.table({k: [v] for k, v in d.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        # 0-row input: map_batches never ran; feed partial_fn one empty
        # batch with the input schema so combine sees its column set
        sch = ds.schema()
        arrow_sch = getattr(sch, "base_schema", sch)
        if arrow_sch is not None and not isinstance(arrow_sch, pa.Schema):
            # pandas-block datasets report a PandasBlockSchema (names +
            # numpy dtypes) — rebuild an Arrow schema (object -> string)
            fields = []
            for n, t in zip(arrow_sch.names, arrow_sch.types):
                try:
                    fields.append(pa.field(n, pa.from_numpy_dtype(t)))
                except (pa.ArrowNotImplementedError, TypeError,
                        AttributeError):
                    fields.append(pa.field(n, pa.string()))
            arrow_sch = pa.schema(fields)
        if arrow_sch is None:
            arrow_sch = empty_schema
        if arrow_sch is None:
            raise ValueError(
                "global_agg over a 0-row dataset with unknown schema; "
                "pass empty_schema= with the columns partial_fn reads")
        parts = pa.table({k: [v] for k, v
                          in partial_fn(arrow_sch.empty_table()).items()}).to_pandas()
    return combine_fn(parts)


def bucketed_group_reduce(parts, keys: list[str], reduce_fn, num_partitions: int):
    """Key-grouped reduce via the bucket pattern: hash-partition rows on
    ``keys`` into ``num_partitions`` buckets, then ONE vectorized
    ``reduce_fn(pandas frame)`` per bucket.

    This replaces ``ds.groupby(keys).aggregate(...)`` for high-cardinality
    keys: Ray's sort-based aggregate reduces per group boundary in Python
    (~6k groups/s measured here), while a pandas groupby inside a bucket
    is fully vectorized.  All rows of one key land in one bucket, so any
    associative reduce_fn is exact."""
    import numpy as np

    def add_p(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in keys:
            vals = np.asarray(batch.column(c).to_numpy(zero_copy_only=False))
            h = (h * np.uint64(31)) ^ pd.util.hash_array(vals)
        p = (h % np.uint64(num_partitions)).view(np.int64)
        return batch.append_column("__p", pa.array(p, type=pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # Arrow out of the group fn: downstream arrow stages would run
        # the identical pandas→arrow conversion per block anyway, but
        # Ray's own conversion keeps the pandas metadata dict that
        # makes block schemas unhashable (executor log spam)
        return _table_from_pandas(reduce_fn(g.drop(columns="__p")),
                                  preserve_index=False)

    return (parts.map_batches(add_p, batch_format="pyarrow")
            .groupby("__p").map_groups(per_bucket, batch_format="pandas"))


def top_k_per_group(ds, keys: list[str], value_col: str, k: int,
                    tie_cols: list[str] | None = None,
                    num_partitions: int | None = None):
    """Top-k rows per key group by ``value_col`` (descending; ties broken
    ascending on ``tie_cols`` for determinism).  Per-batch local top-k
    first (combiner: at most k rows per (batch, group) survive), then the
    bucketed vectorized reduce — the full rows never shuffle."""
    tie_cols = tie_cols or []
    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([value_col] + tie_cols,
                            ascending=[False] + [True] * len(tie_cols),
                            kind="stable")
        return df.groupby(keys, dropna=False, sort=False).head(k)

    def partial(batch: pa.Table) -> pa.Table:
        return _table_from_pandas(local_topk(batch.to_pandas()),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_reduce(parts, keys, local_topk, num_partitions)


def keyed_count(ds, keys: list[str], *, count_col: str = "cnt",
                num_partitions: int | None = None):
    """Distributed value-count on ``keys``: per-batch partial counts →
    bucketed vectorized sum over the (much smaller) unique-key partials,
    with the reduce fan sized to the input.

    Returns a Dataset with columns keys + count_col.
    """
    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        out = df.groupby(keys, dropna=False, sort=False).size().reset_index(name=count_col)
        return _table_from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(keys, dropna=False, sort=False)[count_col]
                .sum().reset_index())

    return bucketed_group_reduce(parts, keys, reduce_fn, num_partitions)


def pivot_counts(ds, key_col: str, pivot_col: str, values: list[str], *,
                 prefix: str = "n_", num_partitions: int | None = None):
    """Crosstab: one row per ``key_col``, one count column per entry of
    ``values`` (the pivoted domain of ``pivot_col``), named
    ``{prefix}{value}``.

    The pivoted domain is EXPLICIT (schema stability at scale — a
    discovered domain would make the output schema data-dependent;
    discover it separately with ``keyed_count`` when needed).  Pivot
    values outside ``values`` and null keys are dropped, mirroring SQL
    conditional aggregation over an explicit CASE list.

    Scale shape: per-batch ``pd.crosstab`` combiner (at most
    |keys-in-batch| rows leave each block), then the bucketed vectorized
    sum — the raw rows never shuffle."""
    cols = [f"{prefix}{v}" for v in values]
    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, pivot_col])
        # drop null keys in Arrow BEFORE to_pandas: a null in an int64
        # key column would otherwise coerce the whole block to float64
        # and the output dtype would depend on which blocks held nulls
        batch = batch.filter(batch.column(key_col).is_valid())
        df = batch.to_pandas()
        ct = pd.crosstab(df[key_col], df[pivot_col])
        ct = ct.reindex(columns=values, fill_value=0)
        ct.columns = cols
        ct = ct.reset_index().astype({c: "int64" for c in cols})
        return _table_from_pandas(ct, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, sort=False)[cols].sum().reset_index()
        return out.astype({c: "int64" for c in cols})

    return bucketed_group_reduce(parts, [key_col], reduce_fn, num_partitions)


def rollup_counts(ds, cols: list[str], *, count_col: str = "cnt",
                  num_partitions: int | None = None):
    """SQL ``GROUP BY ROLLUP(cols...)``: counts at every prefix level
    (finest -> ... -> grand total), rolled-up columns emitted as NULL.

    The finest level is one ``keyed_count`` over the input; every
    coarser level re-reduces the previous level's (already tiny) count
    rows — the raw data is scanned exactly once regardless of the
    number of levels."""
    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    base = getattr(ds.schema(), "base_schema", None)
    col_types = {c: (base.field(c).type if base is not None
                     and base.get_field_index(c) >= 0 else pa.string())
                 for c in cols}

    def nullify(level: int):
        # fill rolled-up columns with nulls of the column's OWN type so
        # the level union shares one schema regardless of key dtype
        # (a string-typed null against an int64 finest level would make
        # the union unreadable)
        def fn(batch: pa.Table) -> pa.Table:
            out = {c: (batch.column(c).cast(col_types[c]) if i < level
                       else pa.nulls(len(batch), type=col_types[c]))
                   for i, c in enumerate(cols)}
            out[count_col] = batch.column(count_col)
            return pa.table(out)
        return fn

    finest = keyed_count(ds, cols, count_col=count_col,
                         num_partitions=num_partitions)
    levels = [finest.map_batches(nullify(len(cols)), batch_format="pyarrow")]
    prev = finest
    for lv in range(len(cols) - 1, 0, -1):
        keys = cols[:lv]

        def partial(batch: pa.Table, _k=keys) -> pa.Table:
            df = batch.to_pandas()
            out = (df.groupby(_k, dropna=False, sort=False)[count_col]
                   .sum().reset_index())
            return _table_from_pandas(out, preserve_index=False)

        def reduce_fn(g: pd.DataFrame, _k=keys) -> pd.DataFrame:
            return (g.groupby(_k, dropna=False, sort=False)[count_col]
                    .sum().reset_index())

        parts = prev.map_batches(partial, batch_format="pyarrow")
        lvl = bucketed_group_reduce(parts, keys, reduce_fn, num_partitions)
        levels.append(lvl.map_batches(nullify(lv), batch_format="pyarrow"))
        prev = lvl

    # grand total: per-block partial sums of the coarsest level, reduced
    # in one bucket (the partials are one row per block)
    def gpartial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        total = _pc.sum(batch.column(count_col)).as_py() or 0
        return pa.table({"__one": pa.array([1], type=pa.int64()),
                         count_col: pa.array([total], type=pa.int64())})

    def gsum(g: pd.DataFrame) -> pd.DataFrame:
        row = {c: [None] for c in cols}
        row[count_col] = [int(g[count_col].sum())]
        return pd.DataFrame(row)

    gtotal = bucketed_group_reduce(
        prev.map_batches(gpartial, batch_format="pyarrow"),
        ["__one"], lambda g: gsum(g), 1).map_batches(
            nullify(0), batch_format="pyarrow")
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out.union(gtotal)


def cube_counts(ds, cols: list[str], *, count_col: str = "cnt",
                num_partitions: int | None = None):
    """SQL ``GROUP BY CUBE(cols...)``: counts for EVERY subset of the
    grouping columns (2^k levels), absent columns emitted as typed
    NULLs — the full contingency lattice behind pivot-style data
    exploration.

    Scale shape mirrors ``rollup_counts``: the raw data is scanned once
    (the finest ``keyed_count``); every other subset re-reduces those
    already-tiny count rows, so the 2^k fan-out touches only aggregate
    rows.  ``k`` is capped at 4 (16 levels) — a wider cube is a sign the
    caller wants ``keyed_count`` per analysis instead."""
    from itertools import combinations

    if len(cols) > 4:
        raise ValueError("cube_counts supports at most 4 columns "
                         f"(got {len(cols)}: 2^k levels explode)")
    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    base = getattr(ds.schema(), "base_schema", None)
    col_types = {c: (base.field(c).type if base is not None
                     and base.get_field_index(c) >= 0 else pa.string())
                 for c in cols}

    def nullify(keep: tuple):
        def fn(batch: pa.Table) -> pa.Table:
            out = {c: (batch.column(c).cast(col_types[c]) if c in keep
                       else pa.nulls(len(batch), type=col_types[c]))
                   for c in cols}
            out[count_col] = batch.column(count_col)
            return pa.table(out)
        return fn

    finest = keyed_count(ds, cols, count_col=count_col,
                         num_partitions=num_partitions)
    levels = [finest.map_batches(nullify(tuple(cols)),
                                 batch_format="pyarrow")]
    for r in range(len(cols) - 1, 0, -1):
        for keys in combinations(cols, r):
            ks = list(keys)

            def partial(batch: pa.Table, _k=ks) -> pa.Table:
                df = batch.to_pandas()
                out = (df.groupby(_k, dropna=False, sort=False)[count_col]
                       .sum().reset_index())
                return _table_from_pandas(out, preserve_index=False)

            def reduce_fn(g: pd.DataFrame, _k=ks) -> pd.DataFrame:
                return (g.groupby(_k, dropna=False, sort=False)[count_col]
                        .sum().reset_index())

            parts = finest.map_batches(partial, batch_format="pyarrow")
            lvl = bucketed_group_reduce(parts, ks, reduce_fn,
                                        num_partitions)
            levels.append(lvl.map_batches(nullify(keys),
                                          batch_format="pyarrow"))

    def gpartial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        total = _pc.sum(batch.column(count_col)).as_py() or 0
        return pa.table({"__one": pa.array([1], type=pa.int64()),
                         count_col: pa.array([total], type=pa.int64())})

    def gsum(g: pd.DataFrame) -> pd.DataFrame:
        row = {c: [None] for c in cols}
        row[count_col] = [int(g[count_col].sum())]
        return pd.DataFrame(row)

    gtotal = bucketed_group_reduce(
        finest.map_batches(gpartial, batch_format="pyarrow"),
        ["__one"], lambda g: gsum(g), 1).map_batches(
            nullify(()), batch_format="pyarrow")
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out.union(gtotal)


def groupwise_zscore(ds, key_col: str, value_col: str, *,
                     out_col: str = "zscore", scale: int = 100,
                     ndigits: int = 6, num_partitions: int | None = None,
                     broadcast_cap: int = 5_000_000):
    """Per-group standardization: append ``out_col`` =
    round((v − mean_g) / std_pop_g, ndigits) for each row's group.

    Exactness contract (drives the SQL oracle): values are first fixed
    to integers at ``scale`` (v*scale rounded half-even — the repo's
    cents convention), so the per-group sums n/s/s2 are EXACT integers
    whatever the partition/merge order; mean/std/z are then a fixed
    float64 expression both sides replicate.  Groups with n == 1 or
    zero variance get a null z (undefined), as do null keys/values.

    Scale shape: per-batch integer partials (3 numbers per distinct
    key per batch) → bucketed reduce → the per-key stats table, which
    is the GROUP count not the row count.  Below ``broadcast_cap``
    keys the stats join back via one object-store broadcast lookup per
    batch; above it, the existing bucketed ``equi_join`` co-partition
    path takes over.  Either way the full rows move at most once.
    """
    import numpy as np
    import pyarrow.compute as pc

    from packs_ray.functions.joins import equi_join

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def to_cents(col):
        # int64 partials: exact and order-free.  Range contract: |v*scale|
        # and each group's Σ(v*scale)² must fit int64 — for cents-scale
        # values that is ~1e8 rows per group; shrink `scale` beyond that.
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.rint(v * scale).astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(batch.column(key_col)),
                       pc.is_valid(batch.column(value_col)))
        b = batch.filter(mask)
        df = pd.DataFrame({key_col: b.column(key_col).to_numpy(
            zero_copy_only=False)})
        c = to_cents(b.column(value_col))
        df["__s"] = c
        df["__s2"] = c * c
        g = df.groupby(key_col, sort=False)
        out = g.agg(__n=("__s", "size"), __s=("__s", "sum"),
                    __s2=("__s2", "sum")).reset_index()
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(key_col, sort=False)
                [["__n", "__s", "__s2"]].sum().reset_index())

    stats = bucketed_group_reduce(
        ds.select_columns([key_col, value_col]).map_batches(
            partial, batch_format="pyarrow"),
        [key_col], reduce_fn, num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("__s").to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = batch.column("__s2").to_numpy(zero_copy_only=False).astype(np.float64)
        mean = s / n
        var = s2 / n - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        return pa.table({key_col: batch.column(key_col),
                         "__mean": pa.array(mean),
                         "__std": pa.array(std),
                         "__n1": pa.array(n > 1)})

    if stats.schema() is None:
        # 0-row input: no groups exist; rows (if any later appear via a
        # union) get a null z — emit the schema-stable passthrough
        def null_z(batch: pa.Table) -> pa.Table:
            return batch.append_column(out_col,
                                       pa.nulls(len(batch), pa.float64()))

        return ds.map_batches(null_z, batch_format="pyarrow")

    stats = stats.map_batches(finish, batch_format="pyarrow")
    joined = equi_join(ds, stats, left_on=[key_col], right_on=[key_col],
                       how="left", broadcast_cap=broadcast_cap)

    def zcol(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        valid = (np.asarray(pc.is_valid(batch.column(value_col))
                            .to_numpy(zero_copy_only=False))
                 & np.asarray(pc.fill_null(batch.column("__n1"), False)
                              .to_numpy(zero_copy_only=False)))
        mean = batch.column("__mean").to_numpy(zero_copy_only=False)
        std = batch.column("__std").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            c = np.rint(np.asarray(v, dtype=np.float64) * scale)
            z = np.round((c - mean) / std, ndigits)
        ok = valid & (std > 0)
        keep = [c_ for c_ in batch.column_names
                if c_ not in ("__mean", "__std", "__n1", key_col + "_r")]
        out = batch.select(keep)
        return out.append_column(out_col, pa.array(
            np.where(ok, z, np.nan), type=pa.float64(), mask=~ok))

    return joined.map_batches(zcol, batch_format="pyarrow")


def melt(ds, id_cols: list[str], value_cols: list[str], *,
         var_col: str = "variable", value_col: str = "value"):
    """Unpivot (SQL UNPIVOT / pandas melt): wide numeric columns to
    (id_cols..., var_col, value_col) long rows — the inverse of
    ``pivot_counts`` for feeding column-generic consumers (drift checks,
    per-metric histograms) without one pass per column.

    Stateless per-batch transform — no shuffle, output streams at
    len(value_cols) x input rows.  Values cast to float64 (the SQL
    UNPIVOT common-type rule for mixed numeric columns); nulls
    survive as null rows."""

    def fn(batch: pa.Table) -> pa.Table:
        parts = []
        for v in value_cols:
            cols = {c: batch.column(c) for c in id_cols}
            cols[var_col] = pa.array([v] * batch.num_rows,
                                     type=pa.string())
            cols[value_col] = batch.column(v).cast(pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.select_columns(id_cols + value_cols).map_batches(
        fn, batch_format="pyarrow")


def grouped_stats(ds, key_col: str, value_col: str, *, scale: int = 100,
                  ndigits: int = 6, num_partitions: int | None = None):
    """Per-group descriptive stats: one row per key with
    (n, sum_cents, mean, std_samp, min_v, max_v) — the "describe() per
    segment" profile as ONE streaming pass.

    Exactness contract (drives the SQL oracle): values fix to integers
    at ``scale`` first, so per-group n/s/s2/min/max partials are exact
    integers in any partition/merge order; mean/std are then a pinned
    float64 expression replicated in SQL — mean = round((s/n)/scale, d),
    std = round(sqrt(max(((s2/n) - (s/n)^2) * n/(n-1), 0))/scale, d),
    null when n == 1.  Null keys group together (SQL GROUP BY); null
    values drop, and a key with NO non-null value drops entirely
    (matching SQL aggregation over the value-filtered rows)."""
    import numpy as np

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.select([key_col, value_col])
        df = pd.DataFrame({key_col: b.column(key_col).to_numpy(
            zero_copy_only=False)})
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        v = v.astype(np.float64)
        ok = ~np.isnan(v)
        c = np.where(ok, np.rint(np.where(ok, v, 0.0) * scale), 0) \
            .astype(np.int64)
        df["__n"] = ok.astype(np.int64)
        df["__s"] = np.where(ok, c, 0)
        df["__s2"] = np.where(ok, c * c, 0)
        df["__mn"] = np.where(ok, c, np.iinfo(np.int64).max)
        df["__mx"] = np.where(ok, c, np.iinfo(np.int64).min)
        g = df.groupby(key_col, dropna=False, sort=False)
        out = g.agg(__n=("__n", "sum"), __s=("__s", "sum"),
                    __s2=("__s2", "sum"), __mn=("__mn", "min"),
                    __mx=("__mx", "max")).reset_index()
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby(key_col, dropna=False, sort=False)
             .agg(__n=("__n", "sum"), __s=("__s", "sum"),
                  __s2=("__s2", "sum"), __mn=("__mn", "min"),
                  __mx=("__mx", "max")).reset_index())
        n = a["__n"].to_numpy(dtype=np.float64)
        s = a["__s"].to_numpy(dtype=np.float64)
        s2 = a["__s2"].to_numpy(dtype=np.float64)
        from packs_ray.stages.util import round_half_away

        with np.errstate(divide="ignore", invalid="ignore"):
            m = s / n
            var_c = ((s2 / n) - m * m) * n / np.maximum(n - 1, 1)
            mean = round_half_away(m / scale, ndigits)
            std = round_half_away(
                np.sqrt(np.maximum(var_c, 0.0)) / scale, ndigits)
        out = pd.DataFrame({
            key_col: a[key_col],
            "n": a["__n"].astype("int64"),
            "sum_cents": a["__s"].astype("int64"),
            "mean": np.where(n > 0, mean, np.nan),
            "std_samp": np.where(n > 1, std, np.nan),
            "min_v": np.where(n > 0, a["__mn"].to_numpy(np.float64)
                              / scale, np.nan),
            "max_v": np.where(n > 0, a["__mx"].to_numpy(np.float64)
                              / scale, np.nan)})
        return out[out["n"] > 0]

    parts = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_group_reduce(parts, [key_col], reduce_fn,
                                 num_partitions)


def explode(ds, list_col: str, id_cols: list[str], *,
            pos_col: str = "pos", value_col: str = "value",
            cast_to: str | None = None):
    """UNNEST WITH ORDINALITY: flatten a list column into one row per
    element, carrying ``id_cols`` and the element's 0-based position.

    The relational explode the reference never needs (its frames are all
    scalar, SURVEY §1.2) but any embedding/token/span table does.
    Stateless per-batch Arrow kernels (``list_flatten`` +
    ``list_parent_indices``), no shuffle; null and empty lists emit no
    rows — SQL ``unnest`` semantics."""
    import numpy as np
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        lists = batch.column(list_col)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        lens = lists.value_lengths().to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(starts.size, dtype=np.int64) - starts
        if cast_to is not None:
            flat = pc.cast(flat, cast_to)
        out = {c: pc.take(batch.column(c), parent) for c in id_cols}
        out[pos_col] = pa.array(pos, type=pa.int64())
        out[value_col] = flat
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def collect_strings(ds, key_col: str, value_col: str,
                    order_cols: list[str], *, sep: str = ",",
                    out_col: str = "collected",
                    num_partitions: int | None = None):
    """Ordered per-key string aggregation (SQL
    ``string_agg(value, sep ORDER BY order_cols)``): the sequence-
    assembly reduce behind "collect this key's events in order"
    (session paths, per-conversation role strings, per-user histories).

    One narrow (key, order, value) projection shuffle via the bucket
    pattern, then a single vectorized sort + groupby-join per bucket —
    never a Python loop per group.  Null values are skipped (SQL
    semantics); a key whose values are all null still emits a row with
    ``out_col = NULL`` and ``n_values = 0``.  Mega-keys concatenate into
    one Python string, so this op is for bounded per-key sequences —
    the same documented contract as exact per-group quantiles."""
    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    cols = [key_col, *order_cols, value_col]

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 out_col: pd.Series([], dtype=object),
                                 "n_values": pd.Series([], dtype="int64")})
        g = g.sort_values([key_col, *order_cols], kind="stable")
        grp = g.groupby(key_col, sort=False, dropna=False)[value_col]
        joined = grp.agg(lambda s: sep.join(s.dropna().astype(str))
                         if s.notna().any() else None)
        n = grp.count().astype("int64")
        out = pd.DataFrame({key_col: joined.index, out_col: joined.values,
                            "n_values": n.values})
        return out.reset_index(drop=True)

    return bucketed_group_reduce(ds.select_columns(cols), [key_col],
                                 reduce_fn, num_partitions)


def cooccurrence_pairs(ds, key_col: str, item_col: str, *,
                       num_partitions: int | None = None):
    """Unordered co-occurrence counts: for every item pair (a < b), the
    number of keys whose item set contains both — the market-basket /
    PMI / association-rule primitive (over users x event types, docs x
    tags, sessions x tools...).

    Null keys/items are dropped.  Shape: per-batch distinct (key, item)
    marks, ONE key-bucketed shuffle (all items of a key co-locate), a
    vectorized self-merge per bucket to expand pairs, then a tiny
    second reduce bucketed by pair to sum across key-buckets.  The
    output is bounded by distinct_items², so the item domain must be
    bounded (categorical) — the same documented contract as
    ``pivot_counts``; per-key cost is |items-per-key|², which the
    domain bound also caps."""
    import numpy as np

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, item_col]).to_pandas()
        df = df.dropna().drop_duplicates()
        return _table_from_pandas(df, preserve_index=False)

    parts = ds.map_batches(marks, batch_format="pyarrow")

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()          # marks from different batches
        m = g.merge(g, on=key_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        out = (m.groupby([f"{item_col}_a", f"{item_col}_b"], sort=False)
               .size().reset_index(name="n_keys"))
        return out.rename(columns={f"{item_col}_a": "item_a",
                                   f"{item_col}_b": "item_b"})

    per_key_bucket = bucketed_group_reduce(parts, [key_col],
                                           pairs_per_bucket,
                                           num_partitions)

    def sum_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["item_a", "item_b"], sort=False)["n_keys"]
               .sum().reset_index())
        return out.astype({"n_keys": "int64"})

    return bucketed_group_reduce(per_key_bucket, ["item_a", "item_b"],
                                 sum_fn, max(num_partitions // 4, 1))


def pivot_sum(ds, key_col: str, pivot_col: str, value_col: str,
              values: list[str], *, prefix: str = "sum_",
              num_partitions: int | None = None):
    """Pivoted conditional SUM: one row per ``key_col``, one
    ``{prefix}{v}`` column per explicit pivot value — the value-sum
    sibling of ``pivot_counts`` (same explicit-domain contract: output
    schema never depends on the data).  Sums ride as exact int64 cents
    and become doubles with ONE division at the end, so the result is
    order-independent and bit-equal to the SQL twin's
    ``sum(round(v*100)::BIGINT)::DOUBLE / 100``.

    Scale shape identical to ``pivot_counts``: per-batch pivot combiner,
    then one bucketed vectorized sum over at most |keys| rows."""
    import numpy as np

    cols = [f"{prefix}{v}" for v in values]
    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, pivot_col, value_col])
        batch = batch.filter(pc.and_(
            batch.column(key_col).is_valid(),
            batch.column(value_col).is_valid()))
        cents = pc.cast(pc.round(pc.multiply(
            batch.column(value_col), 100.0), 0), "int64")
        df = pa.table({key_col: batch.column(key_col),
                       pivot_col: batch.column(pivot_col),
                       "cents": cents}).to_pandas()
        pt = df.pivot_table(index=key_col, columns=pivot_col,
                            values="cents", aggfunc="sum", fill_value=0)
        pt = pt.reindex(columns=values, fill_value=0)
        pt.columns = cols
        pt = pt.reset_index().astype({c: "int64" for c in cols})
        return _table_from_pandas(pt, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, sort=False)[cols].sum().reset_index()
        for c in cols:
            out[c] = out[c].to_numpy(dtype=np.int64) / 100.0
        return out

    return bucketed_group_reduce(parts, [key_col], reduce_fn,
                                 num_partitions)


def keyed_count_distinct(ds, key_col: str, col: str, *,
                         out_col: str = "n_distinct",
                         num_partitions: int | None = None):
    """Exact per-key ``COUNT(DISTINCT col)`` — the exact twin of
    ``sketches.grouped_approx_distinct`` for when the per-key value
    cardinality is small enough to move (distinct users per event
    type, distinct domains per language, ...).

    Scale shape: each batch locally dedupes to its distinct
    (key, value) marks FIRST (combiner — repeated values never leave
    the block), then ONLY those narrow two-column marks ride one
    bucketed shuffle on the key; the per-bucket reduce dedupes across
    batches and counts.  All rows of one key land in one bucket, so
    the count is exact regardless of partitioning or retries.  Rows
    with a null key or a null value are excluded, matching the HLL
    sibling and SQL ``COUNT(DISTINCT col)`` over non-null keys.

    Reference parity: the packs compute distinct counts per group via
    single-process pandas ``nunique`` (profiling_pack/main.py); this
    is the distributed exact form.
    """
    import numpy as np

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, col]).filter(pc.and_(
            batch.column(key_col).is_valid(),
            batch.column(col).is_valid()))
        return batch.group_by([key_col, col]).aggregate([])

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(key_col, sort=False)[col].nunique()
               .reset_index(name=out_col))
        out[out_col] = out[out_col].astype(np.int64)
        return out

    return bucketed_group_reduce(parts, [key_col], reduce_fn,
                                 num_partitions)


def target_encode(ds, cat_col: str, value_col: str, *, m: float = 10.0,
                  num_partitions: int | None = None):
    """Smoothed (m-estimate) target encoding: one row per category with
    ``encoded = (sum_value + m * global_mean) / (n + m)`` — the
    leakage-resistant categorical feature encoder (Micci-Barreca 2001).

    Exactness: per-category sums are exact int64 cents partials; the
    global mean and the encode expression are ONE pinned float64
    evaluation per category (``cents/100 + m*mean`` then ``/(n+m)``,
    6dp), shared with the SQL replica.  Rows with a null category or
    null value are excluded.

    Scale shape: per-batch (category, n, cents) partials ride one
    bucketed reduce; the global totals come from the same partials via
    a second tiny streaming scan — the output is bounded by the
    category cardinality and stays a lazy Dataset.
    """
    import numpy as np

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([cat_col, value_col]).filter(pc.and_(
            batch.column(cat_col).is_valid(),
            batch.column(value_col).is_valid()))
        cents = pc.cast(pc.round(pc.multiply(
            batch.column(value_col), 100.0), 0), "int64")
        df = pa.table({cat_col: batch.column(cat_col),
                       "cents": cents}).to_pandas()
        out = (df.groupby(cat_col, sort=False)["cents"]
               .agg(n="size", cents="sum").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(cat_col, sort=False)[["n", "cents"]]
                .sum().reset_index())

    # bounded by the category cardinality — materialize so the totals
    # scan and the encode pass don't each re-execute the full input
    per_cat = bucketed_group_reduce(parts, [cat_col], reduce_fn,
                                    num_partitions).materialize()

    def gpartial(batch: pa.Table) -> dict:
        return {"n": pc.sum(batch.column("n")).as_py() or 0,
                "cents": pc.sum(batch.column("cents")).as_py() or 0}

    def gcombine(p: pd.DataFrame) -> dict:
        return {"n": int(p["n"].sum()), "cents": int(p["cents"].sum())}

    tot = global_agg(per_cat, gpartial, gcombine,
                     empty_schema=pa.schema([("n", pa.int64()),
                                             ("cents", pa.int64())]))
    if tot["n"] == 0:
        return per_cat.map_batches(
            lambda b: b.append_column("encoded",
                                      pa.nulls(len(b), type=pa.float64())),
            batch_format="pyarrow")
    # pinned float tail shared with the SQL replica
    mean_v = tot["cents"] / tot["n"] / 100.0

    def encode(batch: pa.Table) -> pa.Table:
        from packs_ray.stages.util import round_half_away as _r

        n = batch.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cents = batch.column("cents").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        enc = _r((cents / 100.0 + m * mean_v) / (n + m), 6)
        out = batch.remove_column(batch.schema.get_field_index("cents"))
        return out.append_column("encoded", pa.array(enc,
                                                     type=pa.float64()))

    return per_cat.map_batches(encode, batch_format="pyarrow")


def _exact_int_sum(arr) -> int:
    """Sum an int64 array exactly: vectorized 65536-row chunk sums
    (each fits int64 for the bounded operands callers feed in),
    Python-int outer accumulation — no silent wraparound at any row
    count."""
    import numpy as np

    n = len(arr)
    if n == 0:
        return 0
    chunks = np.array_split(arr, max(1, (n + 65535) // 65536))
    return sum(int(c.sum()) for c in chunks)


def _exact_prod_sum(a, b) -> int:
    """Sum of elementwise products Σ a_i·b_i, exact for int64 operand
    arrays of ANY magnitude: chunk length adapts to the provable
    product bound so no vectorized partial can wrap, and once even a
    single product could exceed int64 (|a_i·b_i| ≥ 2^62) the whole sum
    falls back to arbitrary-precision Python ints.  Use this instead
    of ``_exact_int_sum(a * b)``, whose elementwise product silently
    wraps above ~3e9·3e9."""
    import numpy as np

    n = len(a)
    if n == 0:
        return 0
    ma, mb = int(np.abs(a).max()), int(np.abs(b).max())
    if ma * mb >= 2 ** 62:          # Python-int compare: cannot wrap
        return sum(int(x) * int(y) for x, y in zip(a.tolist(), b.tolist()))
    step = max(1, min(n, (2 ** 62) // max(ma * mb, 1)))
    return sum(int((a[k:k + step] * b[k:k + step]).sum())
               for k in range(0, n, step))


def trend_per_key(ds, key_col: str, ts_col: str, value_col: str, *,
                  num_buckets: int | None = None):
    """Per-key least-squares time trend: the slope of ``value`` over
    time for every key, in value-units per day — the "is this entity's
    metric drifting" feature next to the anomaly flags (dqops
    trend/anomaly check family).

    Exactness: x = whole MINUTES since the key's first event
    (floor-div; bounds x² so per-chunk int64 sums cannot overflow for
    spans up to ~10 years), y = exact cents.  All five power sums are
    exact integers (chunked vectorized partial sums, Python-int
    accumulation), and the slope is ONE pinned float64 expression
    ``(n·Sxy − Sx·Sy) / (n·Sxx − Sx²) · cents→units·minutes→day``
    rounded to 6dp, shared with the HUGEINT SQL replica.  Keys with
    n < 2 or zero time variance emit a null slope.

    Scale shape: only (key, ts, value) shuffle once on hash(key);
    per-bucket work is vectorized; output is one row per key."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, ts_col, value_col])
        mask = pc.and_(pc.and_(batch.column(key_col).is_valid(),
                               batch.column(ts_col).is_valid()),
                       batch.column(value_col).is_valid())
        batch = batch.filter(mask)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({key_col: [], "n": pd.Series([], dtype="int64"),
                          "slope_per_day": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        from packs_ray.stages.util import round_half_away as _r

        if len(g) == 0:
            return empty.copy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.rint(g[value_col].to_numpy(dtype=np.float64) * 100.0) \
            .astype(np.int64)
        keys = g[key_col].to_numpy()
        rows = []
        order = np.argsort(keys, kind="stable")
        keys, us, cents = keys[order], us[order], cents[order]
        starts = np.r_[0, np.nonzero(keys[1:] != keys[:-1])[0] + 1,
                       len(keys)]
        for i in range(len(starts) - 1):
            a, b = starts[i], starts[i + 1]
            x = (us[a:b] - us[a:b].min()) // 60_000_000  # whole minutes
            y = cents[a:b]
            n = int(b - a)  # Python int: n*sxy must not wrap in int64
            sx, sy = _exact_int_sum(x), _exact_int_sum(y)
            sxy, sxx = _exact_int_sum(x * y), _exact_int_sum(x * x)
            den = n * sxx - sx * sx
            slope = None
            if n >= 2 and den != 0:
                num = n * sxy - sx * sy
                # cents/minute -> units/day: * 1440 / 100
                slope = float(_r(float(num) / float(den) * 14.4, 6))
            rows.append((keys[a], np.int64(n), slope))
        out = pd.DataFrame(rows, columns=[key_col, "n", "slope_per_day"])
        out["n"] = out["n"].astype(np.int64)
        out["slope_per_day"] = out["slope_per_day"].astype(np.float64)
        return out

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def pmi_pairs(ds, key_col: str, item_col: str, *,
              min_pairs: int = 1, num_partitions: int | None = None):
    """Pointwise mutual information over item co-occurrence: for every
    unordered item pair, ``pmi = ln(n_ab·N / (n_a·n_b))`` where n_a is
    the distinct-key count containing item a and N the distinct keys
    with any valid item — the association-strength score on top of
    ``cooccurrence_pairs`` (Church & Hanks 1990, public measure).

    Exactness: every count is an exact integer (the cooccurrence
    expansion, one marginal distinct-key count per item, one global
    distinct-key count); pmi is ONE pinned float64 expression (6dp)
    shared with the SQL replica.

    Scale shape: reuses cooccurrence_pairs' key-bucketed expansion
    (bounded item domain contract); marginals ride the same
    (item, key)-mark shuffle.  Output bounded by distinct_items² and
    returned as pandas (it is a bounded artifact)."""
    import numpy as np

    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    pairs = cooccurrence_pairs(ds, key_col, item_col,
                               num_partitions=num_partitions).to_pandas()
    empty = pd.DataFrame({"item_a": [], "item_b": [],
                          "n_ab": pd.Series([], dtype="int64"),
                          "pmi": pd.Series([], dtype="float64")})
    if pairs.empty:
        return empty

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([item_col, key_col]).filter(pc.and_(
            batch.column(item_col).is_valid(),
            batch.column(key_col).is_valid()))
        return batch.group_by([item_col, key_col]).aggregate([])

    mk = ds.map_batches(marks, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        out = (d.groupby(item_col, sort=False)[key_col].nunique()
               .reset_index(name="n_item"))
        out["n_item"] = out["n_item"].astype(np.int64)
        return out

    marg = bucketed_group_reduce(mk, [item_col], per_bucket,
                                 num_partitions).to_pandas()
    n_item = dict(zip(marg[item_col], marg["n_item"]))
    # N: distinct keys with >= 1 valid (key, item) mark — one more
    # narrow reduce over the same marks
    n_keys = keyed_count(mk.select_columns([key_col]),
                         [key_col]).count()

    pairs = pairs.rename(columns={"n_keys": "n_ab"})
    pairs = pairs[pairs["n_ab"] >= min_pairs].copy()
    if pairs.empty:
        return empty
    na = pairs["item_a"].map(n_item).to_numpy(dtype=np.float64)
    nb = pairs["item_b"].map(n_item).to_numpy(dtype=np.float64)
    nab = pairs["n_ab"].to_numpy(dtype=np.float64)
    pairs["pmi"] = _r(np.log(nab * float(n_keys) / (na * nb)), 6)
    pairs["n_ab"] = pairs["n_ab"].astype(np.int64)
    return pairs.reset_index(drop=True)


def cohens_kappa(ds, col_a: str, col_b: str,
                 num_partitions: int | None = None) -> pd.DataFrame:
    """Cohen's kappa inter-rater agreement between two categorical
    columns (Cohen 1960, public measure) — the label-quality check for
    doubly-annotated training data.  Rows with a null on either side
    are excluded (unlabeled pairs).

    Exactness: with exact integer counts ``n`` (rated pairs),
    ``n_agree`` and ``s_chance = Σ_k n_a(k)·n_b(k)`` (marginal product
    sum over the category union), every float is ONE pinned expression:
    ``p_observed = n_agree/n``, ``p_expected = s_chance/n²`` and
    ``kappa = (n_agree·n − s_chance) / (n² − s_chance)`` — no float
    accumulation, bit-deterministic under any partitioning.

    Scale shape: per-batch (category, n_a, n_b, n_agree) partials (the
    category domain is bounded — the standard contract for rater
    labels), one category-bucketed sum reduce; only the bounded
    per-category frame lands on the driver.  Degenerate chance
    agreement (``n² == s_chance``, e.g. a constant single label) emits
    null kappa.

    Output: one row (n, n_agree, s_chance, p_observed, p_expected,
    kappa)."""
    import numpy as np

    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([col_a, col_b]).filter(pc.and_(
            batch.column(col_a).is_valid(),
            batch.column(col_b).is_valid()))
        a = batch.column(col_a).to_pandas().astype(str)
        b = batch.column(col_b).to_pandas().astype(str)
        na = a.value_counts(sort=False)
        nb = b.value_counts(sort=False)
        ag = a[a.to_numpy() == b.to_numpy()].value_counts(sort=False)
        cats = na.index.union(nb.index)
        return pa.table({
            "cat": pa.array(cats, type=pa.string()),
            "n_a": pa.array(na.reindex(cats, fill_value=0)
                            .to_numpy().astype(np.int64)),
            "n_b": pa.array(nb.reindex(cats, fill_value=0)
                            .to_numpy().astype(np.int64)),
            "n_ag": pa.array(ag.reindex(cats, fill_value=0)
                             .to_numpy().astype(np.int64))})

    parts = ds.map_batches(marks, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("cat", sort=False)[["n_a", "n_b", "n_ag"]]
                .sum().reset_index()
                .astype({"n_a": "int64", "n_b": "int64", "n_ag": "int64"}))

    cat = bucketed_group_reduce(parts, ["cat"], reduce_fn,
                                num_partitions).to_pandas()
    if cat.empty or "n_a" not in cat.columns:
        cat = pd.DataFrame({"n_a": pd.Series([], dtype="int64"),
                            "n_b": pd.Series([], dtype="int64"),
                            "n_ag": pd.Series([], dtype="int64")})
    n = int(cat["n_a"].sum())
    n_agree = int(cat["n_ag"].sum())
    s = int((cat["n_a"] * cat["n_b"]).sum())
    row = {"n": np.int64(n), "n_agree": np.int64(n_agree),
           "s_chance": np.int64(s)}
    if n == 0:
        row.update({"p_observed": None, "p_expected": None, "kappa": None})
    else:
        row["p_observed"] = float(_r(n_agree / n, 6))
        row["p_expected"] = float(_r(s / (n * n), 6))
        row["kappa"] = (float(_r((n_agree * n - s) / (n * n - s), 6))
                        if n * n != s else None)
    out = pd.DataFrame([row])
    for c in ("p_observed", "p_expected", "kappa"):
        out[c] = out[c].astype("float64")
    return out


def contingency_profile(ds, col_a: str, col_b: str,
                        num_partitions: int | None = None) -> pd.DataFrame:
    """Chi-squared contingency profile between two bounded categorical
    columns (Pearson 1900, public): per-cell observed vs expected
    counts and the cell's chi-squared contribution — the
    association-strength / independence screen (label leakage, skewed
    strata, segment drift).  Rows with a null on either side are
    excluded.

    Exactness: observed and marginal counts are exact integers;
    ``expected = n_a·n_b/n`` and
    ``contrib = (obs·n − n_a·n_b)² / (n·n_a·n_b)`` are ONE pinned
    float64 expression each (6dp, all factors exact ints cast to
    double first) — no cross-row float accumulation; chi² is the
    caller's sum of ``contrib``.

    Scale shape: per-batch (a, b, n) cell partials, one cell-bucketed
    sum reduce; marginals derive from the bounded |A|x|B| cell table on
    the driver.  Output ordered by (a, b)."""
    import numpy as np

    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([col_a, col_b]).filter(pc.and_(
            batch.column(col_a).is_valid(),
            batch.column(col_b).is_valid()))
        df = batch.to_pandas()
        out = (df.groupby([col_a, col_b], sort=False).size()
               .reset_index(name="obs"))
        out["obs"] = out["obs"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([col_a, col_b], sort=False)["obs"].sum()
                .reset_index().astype({"obs": "int64"}))

    cells = bucketed_group_reduce(ds.map_batches(marks,
                                                 batch_format="pyarrow"),
                                  [col_a, col_b], reduce_fn,
                                  num_partitions).to_pandas()
    empty = pd.DataFrame({
        col_a: pd.Series([], dtype=object),
        col_b: pd.Series([], dtype=object),
        "obs": pd.Series([], dtype="int64"),
        "n_a": pd.Series([], dtype="int64"),
        "n_b": pd.Series([], dtype="int64"),
        "expected": pd.Series([], dtype="float64"),
        "contrib": pd.Series([], dtype="float64")})
    if cells.empty or "obs" not in cells.columns:
        return empty
    n = int(cells["obs"].sum())
    na = cells.groupby(col_a)["obs"].sum()
    nb = cells.groupby(col_b)["obs"].sum()
    cells["n_a"] = cells[col_a].map(na).astype(np.int64)
    cells["n_b"] = cells[col_b].map(nb).astype(np.int64)
    o = cells["obs"].to_numpy(dtype=np.float64)
    a = cells["n_a"].to_numpy(dtype=np.float64)
    b = cells["n_b"].to_numpy(dtype=np.float64)
    fn = float(n)
    cells["expected"] = _r(a * b / fn, 6)
    x = o * fn - a * b
    cells["contrib"] = _r((x * x) / (fn * a * b), 6)
    cells = cells.sort_values([col_a, col_b], kind="stable")
    return cells[[col_a, col_b, "obs", "n_a", "n_b", "expected",
                  "contrib"]].reset_index(drop=True)


def association_summary(ds, col_a: str, col_b: str,
                        num_partitions: int | None = None) -> pd.DataFrame:
    """One-row association summary between two bounded categorical
    columns: chi-squared statistic, Cramér's V, mutual information
    (nats) and normalized MI — the feature-redundancy / label-leakage
    screen run before training-data column selection (all formulas
    public: Pearson 1900, Cramér 1946, Shannon 1948).  Rows with a null
    on either side are excluded.

    Exactness: cell and marginal counts are exact integers (same
    bucketed cell reduce as :func:`contingency_profile`); each
    statistic is a float64 sum of per-cell/per-marginal terms taken in
    canonical (a, b) sort order on the driver-side bounded cell table,
    rounded 6dp — the round absorbs summation-order bits so a DuckDB
    oracle summing the identical terms agrees (the
    profile_variables convention).

    Scale shape: per-batch (a, b, n) cell partials → one cell-bucketed
    sum reduce; only the bounded |A|x|B| cell table reaches the driver.

    Output: (n, n_cells, n_distinct_a, n_distinct_b, chi2, cramers_v,
    mi, h_a, h_b, nmi)."""
    import numpy as np

    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([col_a, col_b]).filter(pc.and_(
            batch.column(col_a).is_valid(),
            batch.column(col_b).is_valid()))
        df = batch.to_pandas()
        out = (df.groupby([col_a, col_b], sort=False).size()
               .reset_index(name="obs"))
        out["obs"] = out["obs"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([col_a, col_b], sort=False)["obs"].sum()
                .reset_index().astype({"obs": "int64"}))

    cells = bucketed_group_reduce(ds.map_batches(marks,
                                                 batch_format="pyarrow"),
                                  [col_a, col_b], reduce_fn,
                                  num_partitions).to_pandas()
    if cells.empty or "obs" not in cells.columns:
        return pd.DataFrame([{
            "n": np.int64(0), "n_cells": np.int64(0),
            "n_distinct_a": np.int64(0), "n_distinct_b": np.int64(0),
            "chi2": np.nan, "cramers_v": np.nan, "mi": np.nan,
            "h_a": np.nan, "h_b": np.nan, "nmi": np.nan}])
    cells = cells.sort_values([col_a, col_b], kind="stable")
    n = int(cells["obs"].sum())
    na = cells.groupby(col_a, sort=True)["obs"].sum()
    nb = cells.groupby(col_b, sort=True)["obs"].sum()
    o = cells["obs"].to_numpy(dtype=np.float64)
    a = cells[col_a].map(na).to_numpy(dtype=np.float64)
    b = cells[col_b].map(nb).to_numpy(dtype=np.float64)
    fn = float(n)
    ka, kb = len(na), len(nb)
    # full chi2 includes never-observed (a, b) cells: each contributes
    # its expectation n_a*n_b/n, and summing expectations over ALL cells
    # gives exactly n — so the zero-cell total is n - sum(observed exp)
    x = o * fn - a * b
    chi2 = float(((x * x) / (fn * a * b)).sum()
                 + (fn - (a * b / fn).sum()))
    dof_side = min(ka, kb) - 1
    cramers = float(np.sqrt(chi2 / (fn * dof_side))) if dof_side > 0 else 0.0
    mi = float(((o / fn) * np.log(o * fn / (a * b))).sum())
    pa_ = na.to_numpy(dtype=np.float64) / fn
    pb_ = nb.to_numpy(dtype=np.float64) / fn
    h_a = float(-(pa_ * np.log(pa_)).sum())
    h_b = float(-(pb_ * np.log(pb_)).sum())
    denom = float(np.sqrt(h_a * h_b))
    nmi = mi / denom if denom > 0 else 0.0
    return pd.DataFrame([{
        "n": np.int64(n), "n_cells": np.int64(len(cells)),
        "n_distinct_a": np.int64(ka), "n_distinct_b": np.int64(kb),
        "chi2": float(_r(chi2, 6)), "cramers_v": float(_r(cramers, 6)),
        "mi": float(_r(mi, 6)), "h_a": float(_r(h_a, 6)),
        "h_b": float(_r(h_b, 6)), "nmi": float(_r(nmi, 6))}])


def keyed_label_entropy(ds, key_col: str, label_col: str,
                        num_partitions: int | None = None):
    """Per-key Shannon entropy of a bounded categorical column: how
    mixed each key's label distribution is (nats) — the label-balance /
    behavioral-diversity screen (a user with entropy 0 does exactly one
    thing; normalized entropy ≈1 is uniform across its labels).  Rows
    with a null key or label are excluded.

    Exactness: per-(key, label) counts are exact integers; entropy is
    a float64 sum of per-label terms in canonical label sort order,
    rounded 6dp (the round absorbs summation-order bits so a DuckDB
    oracle summing identical terms agrees); norm_entropy divides the
    UNROUNDED entropy by ln(n_labels), then rounds.

    Scale shape: per-batch (key, label, n) count partials (combiner),
    ONE key-bucketed exchange of the bounded partials; full rows never
    shuffle.

    Output per key: (key, n, n_labels, entropy, norm_entropy), ordered
    by key."""
    import numpy as np

    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, label_col]).filter(pc.and_(
            batch.column(key_col).is_valid(),
            batch.column(label_col).is_valid()))
        return (batch.group_by([key_col, label_col])
                .aggregate([([], "count_all")])
                .rename_columns([key_col, label_col, "n"]))

    empty = pd.DataFrame({key_col: [],
                          "n": pd.Series([], dtype="int64"),
                          "n_labels": pd.Series([], dtype="int64"),
                          "entropy": pd.Series([], dtype="float64"),
                          "norm_entropy": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = (g.groupby([key_col, label_col], sort=True)["n"].sum()
             .reset_index())
        tot = g.groupby(key_col, sort=False)["n"].transform("sum") \
            .to_numpy(dtype=np.float64)
        c = g["n"].to_numpy(dtype=np.float64)
        g["_t"] = -(c / tot) * np.log(c / tot)
        a = (g.groupby(key_col, sort=False)
             .agg(n=("n", "sum"), n_labels=("n", "size"),
                  entropy=("_t", "sum")).reset_index())
        k = a["n_labels"].to_numpy(dtype=np.float64)
        ent = a["entropy"].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            norm = np.where(k > 1, ent / np.log(k), 0.0)
        out = pd.DataFrame({
            key_col: a[key_col],
            "n": a["n"].astype(np.int64),
            "n_labels": a["n_labels"].astype(np.int64),
            "entropy": _r(ent, 6), "norm_entropy": _r(norm, 6)})
        return out

    return bucketed_group_reduce(
        ds.map_batches(marks, batch_format="pyarrow"),
        [key_col], per_bucket, num_partitions).sort(key_col)


def grouped_linreg(ds, key_col: str, x_col: str, y_col: str, *,
                   num_buckets: int | None = None):
    """Per-key OLS of ``y`` on ``x``: slope, intercept, r2 — the
    regr_slope/regr_intercept/regr_r2 family (dqops column-comparison
    checks; the reference's nearest shape is the numeric-relationship
    scoring in numeric_validation_pack/main.py:104-204, which only
    bounds single columns).

    Exactness: both columns scale to exact int64 cents (round half
    away), all five power sums accumulate as exact Python ints
    (chunked via _exact_int_sum), and the float expressions are pinned
    term-for-term with the HUGEINT SQL replica:
    ``slope = num/denx``, ``intercept = (sy - num/denx*sx)/n/100``,
    ``r2 = (num/denx)*(num/deny)`` (the factored form keeps every
    intermediate inside HUGEINT — denx*deny would overflow 128 bits),
    each rounded 6dp.  Keys with n < 2 or zero x-variance emit nulls
    (r2 also null on zero y-variance).  Null key/x/y rows drop.

    Scale shape: only (key, x, y) shuffles once on hash(key); per-
    bucket work is vectorized; output is one row per key."""
    import numpy as np

    from packs_ray.stages.util import round_half_away as _r

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, x_col, y_col])
        mask = pc.and_(pc.and_(batch.column(key_col).is_valid(),
                               batch.column(x_col).is_valid()),
                       batch.column(y_col).is_valid())
        batch = batch.filter(mask)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(k))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    empty = pd.DataFrame({key_col: [], "n": pd.Series([], dtype="int64"),
                          "slope": pd.Series([], dtype="float64"),
                          "intercept": pd.Series([], dtype="float64"),
                          "r2": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        xc = np.rint(g[x_col].to_numpy(dtype=np.float64) * 100.0) \
            .astype(np.int64)
        yc = np.rint(g[y_col].to_numpy(dtype=np.float64) * 100.0) \
            .astype(np.int64)
        keys = g[key_col].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys, xc, yc = keys[order], xc[order], yc[order]
        starts = np.r_[0, np.nonzero(keys[1:] != keys[:-1])[0] + 1,
                       len(keys)]
        rows = []
        for i in range(len(starts) - 1):
            a, b = starts[i], starts[i + 1]
            x, y = xc[a:b], yc[a:b]
            n = int(b - a)  # Python int: n*sxy would wrap in int64
            sx, sy = _exact_int_sum(x), _exact_int_sum(y)
            sxx, syy = _exact_int_sum(x * x), _exact_int_sum(y * y)
            sxy = _exact_int_sum(x * y)
            num = n * sxy - sx * sy
            denx = n * sxx - sx * sx
            deny = n * syy - sy * sy
            slope = intercept = r2 = None
            if n >= 2 and denx != 0:
                sl = float(num) / float(denx)
                slope = float(_r(sl, 6))
                intercept = float(_r(
                    (float(sy) - sl * float(sx)) / float(n) / 100.0, 6))
                if deny != 0:
                    r2 = float(_r(sl * (float(num) / float(deny)), 6))
            rows.append((keys[a], np.int64(n), slope, intercept, r2))
        out = pd.DataFrame(rows, columns=[key_col, "n", "slope",
                                          "intercept", "r2"])
        out["n"] = out["n"].astype(np.int64)
        for c in ("slope", "intercept", "r2"):
            out[c] = out[c].astype(np.float64)
        return out

    ds2 = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas")


def tpch_q1(ds, *, cutoff: str = "1998-09-02", scale: int = 100,
            num_partitions: int | None = None):
    """The TPC-H Q1 pricing-summary report (public benchmark query) as
    one streaming pass — the canonical compound aggregate: per
    (l_returnflag, l_linestatus) over rows shipped on/before
    ``cutoff``: sum_qty, sum_base_price, sum_disc_price
    (Σ price·(1−disc)), sum_charge (Σ price·(1−disc)·(1+tax)),
    avg_qty, avg_price, avg_disc, count_order.

    Exactness contract: quantity/price/discount/tax fix to integer
    hundredths first, so every partial is an exact int64 in any
    partition/merge order (disc_price sums are ×10⁴ units, charge
    ×10⁶; int64 is exact to ~10⁹ rows per group at TPC-H magnitudes —
    beyond that widen the partials to Python int / HUGEINT).  The
    final unit divisions and 6dp rounds are pinned float64 expressions
    the SQL oracle replicates term-for-term."""
    import numpy as np
    import pyarrow.compute as pc

    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    cut = np.datetime64(cutoff + "T23:59:59.999999", "us")

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch.column("l_shipdate")),
                    pc.less_equal(batch.column("l_shipdate"),
                                  pa.scalar(cut.item())))
        b = batch.filter(m)
        df = pd.DataFrame({
            "l_returnflag": b.column("l_returnflag").to_numpy(
                zero_copy_only=False),
            "l_linestatus": b.column("l_linestatus").to_numpy(
                zero_copy_only=False)})
        q = _r(b.column("l_quantity").to_numpy(zero_copy_only=False)
               * scale, 0).astype(np.int64)
        p = _r(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * scale, 0).astype(np.int64)
        d = _r(b.column("l_discount").to_numpy(zero_copy_only=False)
               * scale, 0).astype(np.int64)
        t = _r(b.column("l_tax").to_numpy(zero_copy_only=False)
               * scale, 0).astype(np.int64)
        df["sq"], df["sp"], df["sd"] = q, p, d
        df["sdp"] = p * (scale - d)
        df["sch"] = p * (scale - d) * (scale + t)
        df["n"] = np.int64(1)
        out = df.groupby(["l_returnflag", "l_linestatus"],
                         dropna=False, sort=False).sum().reset_index()
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["l_returnflag", "l_linestatus"], dropna=False,
                      sort=False).sum().reset_index()
        n = s["n"].to_numpy(dtype=np.float64)
        sc = float(scale)
        out = pd.DataFrame({
            "l_returnflag": s["l_returnflag"],
            "l_linestatus": s["l_linestatus"],
            "sum_qty": _r(s["sq"].to_numpy(np.float64) / sc, 6),
            "sum_base_price": _r(s["sp"].to_numpy(np.float64) / sc, 6),
            "sum_disc_price": _r(
                s["sdp"].to_numpy(np.float64) / (sc * sc), 6),
            "sum_charge": _r(
                s["sch"].to_numpy(np.float64) / (sc * sc * sc), 6),
            "avg_qty": _r(s["sq"].to_numpy(np.float64) / n / sc, 6),
            "avg_price": _r(s["sp"].to_numpy(np.float64) / n / sc, 6),
            "avg_disc": _r(s["sd"].to_numpy(np.float64) / n / sc, 6),
            "count_order": s["n"].to_numpy(np.int64)})
        return out

    parts = ds.select_columns(
        ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax"]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_group_reduce(
        parts, ["l_returnflag", "l_linestatus"], reduce_fn,
        num_partitions).sort(["l_returnflag", "l_linestatus"])
