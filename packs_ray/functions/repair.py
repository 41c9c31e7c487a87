"""Data-repair operators: the acting half of the reference's
detect-only checks (completeness finds the nulls,
profiling_pack/main.py:305-323; nothing in the packs ever fills them —
a training-data pipeline has to).

Every strategy is two streaming passes: one partial+final stats scan
(exact integer partials, the repo's standard cents trick) and one
stateless fill pass — no shuffle, no driver column materialization.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def impute(ds, col: str, *, strategy: str = "mean", constant=None,
           scale: int = 100, out_col: str | None = None):
    """Fill nulls in ``col`` (output in ``out_col``, default
    ``{col}_filled``; original column untouched).

    - ``mean``: exact global mean from int64-cents partials; the filled
      value is ``(cents_sum::float / n) / scale`` — one division per
      term, the same pinned float expression the DuckDB twin uses.
    - ``mode``: most frequent non-null value, ties broken by smallest
      value.  Uses a distributed value count, so the column must have a
      bounded domain (categorical) — same documented contract as
      ``pivot_counts``.
    - ``constant``: fill with ``constant`` verbatim.
    """
    if out_col is None:
        out_col = f"{col}_filled"

    if strategy == "mean":
        from packs_ray.functions.agg import global_agg

        def partial(batch: pa.Table) -> dict:
            v = batch.column(col)
            cents = pc.cast(pc.round(pc.multiply(v, float(scale)), 0),
                            "int64")
            s = pc.sum(cents)
            return {"s": s.as_py() if s.is_valid else 0,
                    "n": len(v) - v.null_count}

        def combine(df: pd.DataFrame) -> dict:
            n = int(df["n"].sum())
            total = int(sum(int(x) for x in df["s"]))  # Python ints: no overflow
            return {"n": n, "mean": (float(total) / n) / scale
                    if n else None}

        fill = global_agg(ds.select_columns([col]), partial, combine,
                          empty_schema=pa.schema([(col, pa.float64())]))["mean"]
    elif strategy == "mode":
        from packs_ray.functions.agg import keyed_count

        counts = keyed_count(ds.select_columns([col]), [col]).to_pandas()
        counts = counts[counts[col].notna()]
        if len(counts):
            counts = counts.sort_values(["cnt", col],
                                        ascending=[False, True],
                                        kind="stable")
            fill = counts.iloc[0][col]
        else:
            fill = None
    elif strategy == "constant":
        fill = constant
    else:
        raise ValueError(f"unknown impute strategy: {strategy!r}")

    def fill_pass(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if fill is None:
            filled = v
        else:
            filled = pc.fill_null(v, pa.scalar(fill))
        if isinstance(filled, pa.ChunkedArray):
            filled = filled.combine_chunks()
        return batch.append_column(out_col, filled)

    return ds.map_batches(fill_pass, batch_format="pyarrow")


def try_cast_columns(ds, casts: dict[str, str], *, suffix: str = "_cast"):
    """SQL ``TRY_CAST`` as a streaming repair op: for each ``col ->
    target`` in ``casts``, append ``{col}{suffix}`` (the lenient cast,
    null on failure) and ``{col}_cast_failed`` (true when the input was
    non-null but unparseable) — the acting half of the reference's
    string-typed "dirty column" findings (pattern/accuracy packs report
    them, nothing repairs them).

    Targets: ``double`` (DuckDB-TRY_CAST-parity for trimmed decimal /
    scientific forms; '' and junk -> null), ``int64`` (strict: integral
    strings only — DuckDB's round-half-even string->int is intentionally
    NOT mimicked, a silent 1.5->2 is a data bug, not a repair), ``date``
    (ISO yyyy-mm-dd, impossible calendar dates -> null).

    Stateless, vectorized (pandas to_numeric/to_datetime under the
    hood), no shuffle — the 100-TB shape is one map_batches pass.
    """
    import numpy as np

    def fn(batch: pa.Table) -> pa.Table:
        for col, target in casts.items():
            raw = batch.column(col)
            s = raw.to_pandas().astype("string")
            raw_valid = s.notna().to_numpy()
            if target == "double":
                v = pd.to_numeric(s.str.strip(), errors="coerce")
                arr = pa.array(v.to_numpy(dtype="float64",
                                          na_value=np.nan),
                               type=pa.float64(),
                               from_pandas=True)
            elif target == "int64":
                f = pd.to_numeric(s.str.strip(), errors="coerce")
                fv = f.to_numpy(dtype="float64", na_value=np.nan)
                ok = ~np.isnan(fv) & (np.floor(fv) == fv) \
                    & (np.abs(fv) < 2**53)
                iv = np.where(ok, fv, 0).astype("int64")
                arr = pa.array(iv, type=pa.int64(),
                               from_pandas=True,
                               mask=~ok)
            elif target == "date":
                v = pd.to_datetime(s.str.strip(), format="%Y-%m-%d",
                                   errors="coerce")
                arr = pa.Array.from_pandas(v).cast(pa.date32())
            else:
                raise ValueError(f"unknown try_cast target: {target!r}")
            failed = raw_valid & np.asarray(pc.is_null(arr))
            batch = batch.append_column(f"{col}{suffix}", arr)
            batch = batch.append_column(
                f"{col}_cast_failed", pa.array(failed, type=pa.bool_()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def collapse_rare(ds, id_col: str, column: str, *, min_count: int = 10,
                  other: str = "__other__"):
    """Rare-level collapse: replace every value of ``column`` that
    occurs fewer than ``min_count`` times with the ``other`` sentinel —
    the one-hot/cardinality-taming prep step (the reference's outlier
    pack caps one-hot at 100 categories by DROPPING the column;
    collapsing keeps the signal).

    Scale shape: one keyed_count pass, then the FREQUENT set (bounded
    by n_rows / min_count values — not the unbounded raw domain) is
    broadcast via ``ray.put`` and a stateless map pass rewrites rows;
    rows never shuffle.  Null values stay null (they are a
    completeness concern, not a category).

    Output: (id_col, column collapsed, was_collapsed)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from packs_ray.functions.agg import keyed_count

    counts = keyed_count(
        ds.select_columns([column]).map_batches(
            lambda t: t.filter(t.column(column).is_valid()),
            batch_format="pyarrow"),
        [column]).to_pandas()
    if counts.empty:  # 0-row / all-null column: nothing is frequent
        counts = pd.DataFrame({column: [], "cnt": []})
    frequent = set(counts.loc[counts["cnt"] >= min_count, column])
    ref = ray.put(frequent)

    def fn(batch: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        col = batch.column(column)
        s = col.to_pandas()
        is_freq = s.isin(keep).to_numpy()
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        collapsed = np.where(null | is_freq, s.to_numpy(), other)
        out = pa.array(pd.array(collapsed, dtype=object),
                       type=pa.string())
        return pa.table({
            id_col: batch.column(id_col),
            column: out,
            "was_collapsed": pa.array(~(null | is_freq))})

    return ds.select_columns([id_col, column]) \
        .map_batches(fn, batch_format="pyarrow")


def minmax_scale_per_key(ds, key_col: str, value_col: str,
                         id_cols: list[str], *,
                         num_partitions: int | None = None):
    """Per-group min-max normalization: ``(x − min_g) / (max_g − min_g)``
    with the group's own exact bounds — the feature-scaling prep step
    (per-segment scaling keeps a segment's spread comparable after
    mixing).  Constant groups (max == min) emit 0.0 (the sklearn
    convention); null key/value rows are excluded.

    Scale shape: per-batch (key, min, max) partials ride one bucketed
    reduce; the bounded per-key bounds broadcast via ``ray.put``; the
    normalize pass streams the full rows with no shuffle.  The scaled
    value is ONE pinned float64 expression shared with the SQL
    replica."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, value_col]).filter(pc.and_(
            batch.column(key_col).is_valid(),
            batch.column(value_col).is_valid()))
        df = batch.to_pandas()
        out = (df.groupby(key_col, sort=False)[value_col]
               .agg(mn="min", mx="max").reset_index())
        return _table_from_pandas(out, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(key_col, sort=False)
                .agg(mn=("mn", "min"), mx=("mx", "max")).reset_index())

    bounds = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col], reduce_fn, num_partitions).to_pandas()
    if bounds.empty:
        bounds = pd.DataFrame({key_col: [], "mn": [], "mx": []})
    mn_s = pd.Series(bounds["mn"].to_numpy(np.float64),
                     index=bounds[key_col])
    mx_s = pd.Series(bounds["mx"].to_numpy(np.float64),
                     index=bounds[key_col])
    ref = ray.put((mn_s, mx_s))

    def scale(batch: pa.Table) -> pa.Table:
        bmn, bmx = ray.get(ref)
        batch = batch.select(id_cols + [key_col, value_col]).filter(
            pc.and_(batch.column(key_col).is_valid(),
                    batch.column(value_col).is_valid()))
        keys = batch.column(key_col).to_pandas()
        mn = keys.map(bmn).to_numpy(dtype=np.float64)
        mx = keys.map(bmx).to_numpy(dtype=np.float64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rng = mx - mn
        scaled = np.where(rng > 0, (v - mn) / np.where(rng > 0, rng, 1.0),
                          0.0)
        return batch.append_column("scaled", pa.array(scaled))

    return ds.map_batches(scale, batch_format="pyarrow")


def robust_scale_per_key(ds, key_col: str, value_col: str,
                         id_cols: list[str], *,
                         num_partitions: int | None = None):
    """Per-group robust scaling: ``(x − median_g) / IQR_g`` with the
    group's own exact quartiles — the outlier-insensitive sibling of
    :func:`minmax_scale_per_key` (sklearn RobustScaler semantics): a
    single extreme value shifts a min-max scale arbitrarily but moves
    the median/IQR hardly at all.  Groups with IQR == 0 emit 0.0; null
    key/value rows are excluded.

    Exactness: quartiles are exact np.percentile-'linear'
    (== DuckDB ``quantile_cont``) values rounded 6dp (the shared
    contract with :func:`~packs_ray.functions.profiling.grouped_quantiles`);
    the scaled value is ONE pinned float64 expression over them, 6dp.

    Scale shape: the (key, value) projection shuffles once for the
    exact grouped order statistic; the bounded per-key quartile table
    broadcasts via ``ray.put``; the scale pass streams the full rows
    with no shuffle."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from packs_ray.functions.profiling import grouped_quantiles
    from packs_ray.stages.util import round_half_away as _r

    q = grouped_quantiles(ds, key_col, value_col,
                          (0.25, 0.5, 0.75),
                          num_partitions=num_partitions).to_pandas()
    if q.empty:
        med_s = pd.Series(dtype="float64")
        iqr_s = pd.Series(dtype="float64")
    else:
        piv = q.pivot(index=key_col, columns="q", values="value")
        med_s = piv[0.5]
        iqr_s = piv[0.75] - piv[0.25]
    ref = ray.put((med_s, iqr_s))

    def scale(batch: pa.Table) -> pa.Table:
        med, iqr = ray.get(ref)
        batch = batch.select(id_cols + [key_col, value_col]).filter(
            pc.and_(batch.column(key_col).is_valid(),
                    batch.column(value_col).is_valid()))
        keys = batch.column(key_col).to_pandas()
        m = keys.map(med).to_numpy(dtype=np.float64)
        w = keys.map(iqr).to_numpy(dtype=np.float64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        scaled = _r(np.where(w > 0, (v - m) / np.where(w > 0, w, 1.0),
                             0.0), 6)
        return batch.append_column("scaled", pa.array(scaled))

    return ds.map_batches(scale, batch_format="pyarrow")


def quantile_map(ds_src, ds_ref, value_col: str, id_cols: list[str], *,
                 num_partitions: int | None = None):
    """Quantile-mapping (CDF-matching) normalization: map every source
    value onto the reference distribution — ``mapped(v)`` is the
    SMALLEST reference value whose cumulative fraction reaches the
    source's cumulative fraction at ``v`` (the empirical-quantile
    transform drift repair uses to re-align a shifted feed, and the
    tie-free rule shared with
    :func:`~packs_ray.functions.profiling.weighted_quantiles`).  Null
    values are excluded.

    Exactness: both ECDFs are exact int64 count tables; each cumulative
    fraction is ONE double division, and the >= probe compares those
    identical doubles — numpy ``searchsorted`` here, ``min(v) WHERE``
    in the DuckDB replica, same result bit-for-bit.

    Partitioning assumption: bounded DISTINCT value domains (the count
    tables, never the rows, reach the driver); the mapping then
    broadcasts and the attach pass streams with no shuffle.

    Output: id_cols + (value, mapped); an empty reference maps
    everything to null."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from packs_ray.functions.agg import keyed_count

    def counts(ds) -> pd.Series:
        narrow = ds.select_columns([value_col]).map_batches(
            lambda t: t.filter(pc.is_valid(t.column(value_col))),
            batch_format="pyarrow")
        c = keyed_count(narrow, [value_col],
                        num_partitions=num_partitions).to_pandas()
        if c.empty or value_col not in c.columns:
            return pd.Series(dtype="int64")
        return (c.set_index(value_col)["cnt"].astype(np.int64)
                .sort_index())

    sc, rc = counts(ds_src), counts(ds_ref)
    if len(sc) == 0 or len(rc) == 0:
        mapping = pd.Series(dtype="float64")
    else:
        n_s = float(sc.sum())
        n_r = float(rc.sum())
        p_src = np.cumsum(sc.to_numpy(dtype=np.float64)) / n_s
        crf = np.cumsum(rc.to_numpy(dtype=np.float64)) / n_r
        rv = rc.index.to_numpy(dtype=np.float64)
        idx = np.searchsorted(crf, p_src, side="left")
        mapped = np.where(idx < len(rv), rv[np.minimum(idx, len(rv) - 1)],
                          rv[-1])
        mapping = pd.Series(mapped, index=sc.index)
    ref = ray.put(mapping)

    def attach(batch: pa.Table) -> pa.Table:
        mp = ray.get(ref)
        batch = batch.select(id_cols + [value_col]).filter(
            pc.is_valid(batch.column(value_col)))
        v = batch.column(value_col).to_pandas()
        return batch.append_column(
            "mapped", pa.array(v.map(mp).to_numpy(dtype=np.float64),
                               type=pa.float64()))

    return ds_src.map_batches(attach, batch_format="pyarrow")


def union_by_name(datasets: list, *, strict: bool = False):
    """Schema-evolution-safe UNION ALL BY NAME: concatenate Datasets
    whose schemas drifted across snapshots (a column added in week 2,
    one dropped in week 5 — the normal life of a crawl).  Columns are
    matched by NAME; the output schema is the union in first-seen
    order; a column missing from an input fills with typed nulls.  On
    a name whose type differs across inputs, the first-seen type wins
    and later inputs cast to it (``strict=True`` raises instead) —
    an uncastable value is an error either way, never silent data
    corruption.

    Stateless per-batch projection (add typed nulls + reorder), then
    Ray's plain metadata union — no shuffle, no materialization."""
    from packs_ray.functions.joins import _arrow_schema

    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    target: list[tuple[str, pa.DataType]] = []
    seen: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = _arrow_schema(ds)
        for f in sch:
            if f.name not in seen:
                seen[f.name] = f.type
                target.append((f.name, f.type))
            elif strict and f.type != seen[f.name]:
                raise ValueError(
                    f"column {f.name!r}: type {f.type} != first-seen "
                    f"{seen[f.name]} (strict union_by_name)")

    def project(batch: pa.Table) -> pa.Table:
        cols = []
        for name, typ in target:
            if name in batch.schema.names:
                c = batch.column(name)
                cols.append(c if c.type == typ else c.cast(typ))
            else:
                cols.append(pa.nulls(len(batch), type=typ))
        return pa.table(dict(zip([n for n, _ in target], cols)))

    out = datasets[0].map_batches(project, batch_format="pyarrow")
    for ds in datasets[1:]:
        out = out.union(ds.map_batches(project, batch_format="pyarrow"))
    return out


def fd_repair(ds, lhs: str, rhs: str, *, max_map: int = 5_000_000,
              num_partitions: int | None = None):
    """Functional-dependency repair ``lhs -> rhs``: wherever one lhs
    value maps to several distinct non-null rhs values, rewrite rhs to
    the MAJORITY value for that lhs (ties break to the smallest rhs) —
    the repair twin of ``validation.fd_violations`` (one customer id
    with two spellings of its name collapses to the dominant one).

    Null lhs rows and null rhs values are untouched (nulls are a
    completeness concern — ``impute``'s job, not consistency's).

    Scale shape: one keyed_count over (lhs, rhs), a bucketed per-lhs
    majority reduce, then ONLY the VIOLATING-lhs canonical map (not the
    full lhs domain) is broadcast via ``ray.put`` for a stateless
    rewrite pass — rows never shuffle.  The map is bounded by the
    violation count; above ``max_map`` entries the op raises rather
    than silently broadcasting an unbounded set (co-partition with
    ``joins.equi_join`` instead at that scale).

    Output: the input columns with rhs repaired + ``was_repaired``."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         keyed_count,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    pairs = ds.select_columns([lhs, rhs]).map_batches(
        lambda t: t.filter(pc.and_(t.column(lhs).is_valid(),
                                   t.column(rhs).is_valid())),
        batch_format="pyarrow")
    counts = keyed_count(pairs, [lhs, rhs],
                         num_partitions=num_partitions)

    def majority(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(lhs, sort=False)[rhs].size()
        bad = sizes[sizes > 1].index
        if not len(bad):
            return g.head(0)[[lhs, rhs]]      # keeps real dtypes
        g = g[g[lhs].isin(bad)]
        g = g.sort_values(["cnt", rhs], ascending=[False, True],
                          kind="stable")
        return g.groupby(lhs, sort=False).first().reset_index() \
            [[lhs, rhs]]

    canon = bucketed_group_reduce(counts, [lhs], majority,
                                  num_partitions).to_pandas()
    if len(canon) > max_map:
        raise ValueError(
            f"fd_repair: {len(canon)} violating lhs values exceeds "
            f"max_map={max_map}; co-partition with joins.equi_join "
            "instead of broadcasting")
    mapping = dict(zip(canon[lhs], canon[rhs])) if len(canon) else {}
    ref = ray.put(mapping)

    def rewrite(batch: pa.Table) -> pa.Table:
        mp = ray.get(ref)
        lv = batch.column(lhs).to_pandas()
        rv = batch.column(rhs).to_pandas()
        tgt = lv.map(mp)
        hit = tgt.notna() & rv.notna()
        changed = hit & (tgt != rv)
        out = rv.where(~changed, tgt)
        rep = pa.array(pd.array(out, dtype=object),
                       type=batch.schema.field(rhs).type)
        cols = {c: (rep if c == rhs else batch.column(c))
                for c in batch.column_names}
        cols["was_repaired"] = pa.array(changed.to_numpy(dtype=bool))
        return pa.table(cols)

    return ds.map_batches(rewrite, batch_format="pyarrow")
