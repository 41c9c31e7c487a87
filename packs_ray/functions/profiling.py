"""Profiling-pack checks as streaming aggregates.

Reference: profiling_pack/main.py:262-400 (table/variable stats,
completeness per column, advanced numeric stats), schema_scanner_pack
(md5 schema hashes).  All partial+final over map_batches — no shuffle,
no full materialization; exact percentiles stream ONLY the one numeric
column to the driver (documented scale note: at 10^12 rows swap in a
t-digest sketch; the correctness path is exact).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def completeness(ds, columns: list[str]) -> pd.DataFrame:
    """Per-column non-null counts + completeness ratio
    (profiling_pack/main.py:305-323 semantics, unrounded ratio)."""

    def partial(batch: pa.Table) -> dict:
        d = {"total": batch.num_rows}
        for c in columns:
            d[f"nn_{c}"] = batch.num_rows - batch.column(c).null_count
        return d

    def combine(parts: pd.DataFrame) -> dict:
        total = int(parts["total"].sum())
        return {"total": total,
                **{c: int(parts[f"nn_{c}"].sum()) for c in columns}}

    agg = global_agg(ds, partial, combine)
    total = agg["total"]
    rows = [{"column": c, "non_null": agg[c], "total": total,
             "completeness": (agg[c] / total) if total else 1.0}
            for c in columns]
    return pd.DataFrame(rows)


def numeric_column_stats(ds, column: str, percentiles=(10, 25, 75, 90)) -> pd.DataFrame:
    """count / mean / sample+population std / min / max + exact
    percentiles (np.percentile linear == DuckDB quantile_cont), 4dp
    rounding per profiling_pack/main.py:373-400."""

    def partial(batch: pa.Table) -> dict:
        col = batch.column(column)
        v = col.drop_null()
        s = pc.sum(v).as_py() or 0.0
        s2 = pc.sum(pc.multiply(v, v)).as_py() or 0.0
        return {"n": len(v), "s": float(s), "s2": float(s2),
                "mn": pc.min(v).as_py() if len(v) else None,
                "mx": pc.max(v).as_py() if len(v) else None}

    def combine(parts: pd.DataFrame) -> dict:
        n = int(parts["n"].sum())
        s = float(parts["s"].sum())
        s2 = float(parts["s2"].sum())
        mean = s / n if n else 0.0
        var_pop = max(s2 / n - mean * mean, 0.0) if n else 0.0
        var_samp = var_pop * n / (n - 1) if n > 1 else 0.0
        return {"count_": n, "mean_": mean,
                "std_samp": float(np.sqrt(var_samp)),
                "std_pop": float(np.sqrt(var_pop)),
                "min_": float(parts["mn"].min()), "max_": float(parts["mx"].max())}

    agg = global_agg(ds, partial, combine)

    # exact percentiles, distributed: histogram-refinement rank selection
    # (no column materialization on the driver — the reference loads the
    # whole frame, profiling_pack/main.py:386; we replicate np.percentile
    # 'linear' == DuckDB quantile_cont exactly via the two bounding ranks)
    n = agg["count_"]
    if n:
        ranks = set()
        qpos = {}
        for p in percentiles:
            q = (n - 1) * (p / 100.0)
            lo_i, hi_i = int(np.floor(q)), int(np.ceil(q))
            ranks.update((lo_i, hi_i))
            qpos[p] = (q, lo_i, hi_i)
        rank_vals = _rank_select(ds, column, sorted(ranks),
                                 agg["min_"], agg["max_"])
        pcts = {}
        for p in percentiles:
            q, lo_i, hi_i = qpos[p]
            v_lo, v_hi = rank_vals[lo_i], rank_vals[hi_i]
            pcts[f"p{p}"] = float(_r(v_lo + (q - lo_i) * (v_hi - v_lo), 4))
    else:
        pcts = {f"p{p}": None for p in percentiles}

    row = {"column": column, "n": agg["count_"],
           "mean_value": float(_r(agg["mean_"], 4)),
           "std_samp": float(_r(agg["std_samp"], 4)),
           "std_pop": float(_r(agg["std_pop"], 4)),
           "min_value": float(_r(agg["min_"], 4)), "max_value": float(_r(agg["max_"], 4)),
           **pcts}
    return pd.DataFrame([row])


def profile_variables(ds, column: str) -> pd.DataFrame:
    """The ydata-style per-variable catalog tail the reference emits as
    metric records (profiling_pack/main.py:356-371 + README metric
    table): missing/distinct fractions, central moments up to kurtosis,
    CV, quartiles and IQR, zeros — one streaming power-sum scan plus ONE
    unique-value shuffle (exact n_distinct) plus the shared
    rank-selection percentile scans; nothing lands on the driver.

    Skewness/kurtosis are the bias-corrected sample estimators pandas
    ``skew()``/``kurt()`` report (adjusted Fisher-Pearson G1 / excess
    G2), computed from exact raw power sums s..s4 so the oracle can
    replicate the arithmetic term for term.
    """
    from packs_ray.functions.agg import keyed_count

    def partial(batch: pa.Table) -> dict:
        v = batch.column(column).drop_null()
        a = v.to_numpy(zero_copy_only=False).astype(np.float64)
        return {"n_total": batch.num_rows, "n": len(a),
                "s": float(a.sum()), "s2": float((a * a).sum()),
                "s3": float((a ** 3).sum()), "s4": float((a ** 4).sum()),
                "mn": float(a.min()) if len(a) else None,
                "mx": float(a.max()) if len(a) else None,
                "zeros": int((a == 0.0).sum()),
                # exact integer-cents sum: a float sum of 10^12 values
                # carries O(n*eps) absolute error, which no fixed-decimal
                # rounding can absorb — the extensive stat rides as int64
                "sc": int(np.round(a * 100.0).astype(np.int64).sum())}

    def combine(p: pd.DataFrame) -> dict:
        return {"n_total": int(p["n_total"].sum()), "n": int(p["n"].sum()),
                "s": float(p["s"].sum()), "s2": float(p["s2"].sum()),
                "s3": float(p["s3"].sum()), "s4": float(p["s4"].sum()),
                "mn": float(p["mn"].min()), "mx": float(p["mx"].max()),
                "zeros": int(p["zeros"].sum()), "sc": int(p["sc"].sum())}

    agg = global_agg(ds, partial, combine)
    n_total, n = agg["n_total"], agg["n"]
    n_distinct = keyed_count(ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column(column))),
        batch_format="pyarrow"), [column]).count()

    mean = agg["s"] / n if n else 0.0
    m2 = max(agg["s2"] / n - mean ** 2, 0.0) if n else 0.0
    var_samp = m2 * n / (n - 1) if n > 1 else 0.0
    std_samp = float(np.sqrt(var_samp))
    cv = std_samp / mean if n and mean != 0 else None
    m3 = agg["s3"] / n - 3 * mean * (agg["s2"] / n) + 2 * mean ** 3 \
        if n else 0.0
    m4 = (agg["s4"] / n - 4 * mean * (agg["s3"] / n)
          + 6 * mean ** 2 * (agg["s2"] / n) - 3 * mean ** 4) if n else 0.0
    skew = kurt = None
    if n > 2 and m2 > 0:
        g1 = m3 / m2 ** 1.5
        skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
    if n > 3 and m2 > 0:
        g2 = m4 / m2 ** 2 - 3.0
        kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))

    sub = numeric_column_stats(ds, column, percentiles=(25, 50, 75)).iloc[0]
    p25, p50, p75 = sub["p25"], sub["p50"], sub["p75"]

    row = {
        "column": column, "n": n, "n_missing": n_total - n,
        "p_missing": float(_r((n_total - n) / n_total, 6)) if n_total else None,
        "n_distinct": n_distinct,
        "p_distinct": float(_r(n_distinct / n, 6)) if n else None,
        "mean_value": float(_r(mean, 4)) if n else None,
        "std_samp": float(_r(std_samp, 4)) if n else None,
        # variance is the square of the ROUNDED std: squaring identical
        # 4dp inputs keeps both engines off each other's rounding edges
        "variance": float(_r(_r(std_samp, 4) ** 2, 4)) if n else None,
        "cv": float(_r(cv, 6)) if cv is not None else None,
        "skewness": float(_r(skew, 6)) if skew is not None else None,
        "kurtosis": float(_r(kurt, 6)) if kurt is not None else None,
        "min_value": float(_r(agg["mn"], 4)) if n else None,
        "max_value": float(_r(agg["mx"], 4)) if n else None,
        "range_value": float(_r(agg["mx"] - agg["mn"], 4)) if n else None,
        "sum_value": agg["sc"] / 100.0 if n else None,
        "n_zeros": agg["zeros"],
        "p_zeros": float(_r(agg["zeros"] / n, 6)) if n else None,
        "p25": p25, "p50": p50, "p75": p75,
        "iqr": float(_r(p75 - p25, 4)) if n else None,
    }
    return pd.DataFrame([row])


def _bin_edges(lo: float, hi: float, n_bins: int) -> np.ndarray:
    """Deterministic bin edges with exact lo/hi endpoints."""
    edges = lo + (hi - lo) * np.arange(n_bins + 1) / n_bins
    edges[0], edges[-1] = lo, hi
    return edges


def _rank_select(ds, column: str, ranks: list[int], lo: float, hi: float,
                 n_bins: int = 4096, gather_cap: int = 4_000_000) -> dict[int, float]:
    """Exact values at the given 0-based sorted ranks of the column.

    Iterative distributed selection: histogram the active [lo, hi) span
    per rank (one combined scan per level, n_bins buckets), narrow each
    rank to its bucket, and only when a bucket holds ≤ gather_cap values
    gather that bucket to the driver for the final pick.  Depth is
    log_{n_bins}(n / gather_cap) — ≤ 2 scans up to ~10^13 rows."""
    # state per rank: (lo, hi, count_below_lo) with bin-index semantics
    state = {r: [lo, hi, 0] for r in ranks}
    out: dict[int, float] = {}

    for _level in range(4):
        active = {r: s for r, s in state.items() if r not in out}
        if not active:
            break
        spans = sorted({(s[0], s[1]) for s in active.values()})

        def hist_partial(batch, spans=spans):
            col = batch.column(column).drop_null()
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            d = {}
            for si, (slo, shi) in enumerate(spans):
                if shi > slo:
                    edges = _bin_edges(slo, shi, n_bins)
                    # pure value-comparison binning: consistent across
                    # refinement levels and with the gather predicate
                    idx = np.searchsorted(edges, v, side="right") - 1
                    sel = (v >= slo) & (v < shi)
                    counts = np.bincount(np.clip(idx[sel], 0, n_bins - 1),
                                         minlength=n_bins)
                else:
                    counts = np.zeros(n_bins, dtype=np.int64)
                d[f"h_{si}"] = counts.tobytes()
                d[f"eq_{si}"] = int((v == shi).sum())  # top-edge values
            return d

        def hist_combine(p):
            d = {}
            for si in range(len(spans)):
                tot = np.zeros(n_bins, dtype=np.int64)
                for b in p[f"h_{si}"]:
                    tot += np.frombuffer(b, dtype=np.int64)
                d[f"h_{si}"] = tot
                d[f"eq_{si}"] = int(p[f"eq_{si}"].sum())
            return d

        hists = global_agg(ds.select_columns([column]), hist_partial, hist_combine)

        gather_spans = {}
        for r, (slo, shi, below) in active.items():
            si = spans.index((slo, shi))
            counts = hists[f"h_{si}"]
            if shi <= slo:  # degenerate span: single value
                out[r] = slo
                continue
            cum = below + np.cumsum(counts)
            total_in = below + counts.sum() + hists[f"eq_{si}"]
            if r >= total_in - hists[f"eq_{si}"]:  # rank sits on the top edge
                out[r] = shi
                continue
            b = int(np.searchsorted(cum, r + 1))
            new_below = below + (cum[b - 1] - below if b else 0)
            edges = _bin_edges(slo, shi, n_bins)
            blo, bhi = float(edges[b]), float(edges[b + 1])
            if bhi <= blo:      # bin width collapsed: single float value
                out[r] = blo
            elif counts[b] <= gather_cap:
                gather_spans.setdefault((slo, shi, b), []).append(r)
                state[r] = [blo, bhi, int(new_below)]
            else:
                state[r] = [blo, bhi, int(new_below)]

        if gather_spans:
            def gather(batch, keys=sorted(gather_spans)):
                col = batch.column(column).drop_null()
                v = col.to_numpy(zero_copy_only=False).astype(np.float64)
                cols = {}
                for ki, (slo, shi, b) in enumerate(keys):
                    edges = _bin_edges(slo, shi, n_bins)
                    sel = (v >= edges[b]) & (v < edges[b + 1])
                    cols[f"v_{ki}"] = [v[sel].tobytes()]
                return pa.table(cols)

            got = ds.select_columns([column]).map_batches(
                gather, batch_format="pyarrow").to_pandas()
            for ki, key in enumerate(sorted(gather_spans)):
                vals = np.sort(np.concatenate(
                    [np.frombuffer(b, dtype=np.float64) for b in got[f"v_{ki}"]]))
                for r in gather_spans[key]:
                    below = state[r][2]
                    out[r] = float(vals[r - below])

    for r in ranks:  # safety: any unresolved rank (shouldn't happen)
        if r not in out:
            raise RuntimeError(f"rank {r} unresolved in _rank_select")
    return out


def table_summary(ds, columns: list[str]) -> pd.DataFrame:
    """ydata-profiling "table" stats (profiling_pack/main.py:325-371
    catalog): n rows, n_var, total cells, missing cells + percent, and
    per-column distinct counts — one streaming pass of partials plus one
    bucketed distinct count per column."""
    from packs_ray.functions.agg import global_agg, keyed_count

    def partial(batch: pa.Table) -> dict:
        d = {"rows": batch.num_rows}
        for c in columns:
            d[f"null_{c}"] = batch.column(c).null_count
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {"rows": int(p["rows"].sum()),
                **{f"null_{c}": int(p[f"null_{c}"].sum()) for c in columns}}

    agg = global_agg(ds.select_columns(columns), partial, combine,
                     empty_schema=pa.schema([(c, pa.string()) for c in columns]))
    n = agg["rows"]
    cells = n * len(columns)
    missing = sum(agg[f"null_{c}"] for c in columns)
    rows = [{"key": "n", "value": float(n)},
            {"key": "n_var", "value": float(len(columns))},
            {"key": "n_cells", "value": float(cells)},
            {"key": "n_cells_missing", "value": float(missing)},
            {"key": "p_cells_missing",
             "value": float(_r(missing / cells, 4)) if cells else 0.0}]
    for c in columns:
        distinct = keyed_count(ds.select_columns([c]), [c]).count()
        rows.append({"key": f"n_distinct_{c}", "value": float(distinct)})
        rows.append({"key": f"p_missing_{c}",
                     "value": float(_r(agg[f"null_{c}"] / n, 4)) if n else 0.0})
    return pd.DataFrame(rows)


def schema_drift(ds_a, ds_b) -> pd.DataFrame:
    """Column-presence drift between two datasets
    (schema_scanner_pack/main.py:84-124 semantics, name level): one row
    per column name with status left_only / right_only / both."""
    a = list(ds_a.schema().names)
    b = list(ds_b.schema().names)
    sa, sb = set(a), set(b)
    rows = [{"column": c, "status": "both" if c in sb else "left_only"}
            for c in a]
    rows += [{"column": c, "status": "right_only"} for c in b if c not in sa]
    return (pd.DataFrame(rows).sort_values("column").reset_index(drop=True))


def schema_hashes(ds) -> pd.DataFrame:
    """md5 drift hashes of column list / ordered list / dtypes
    (schema_scanner_pack/main.py:84-124 semantics)."""
    schema = ds.schema()
    names = list(schema.names)
    types = [str(t) for t in schema.types]
    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    return pd.DataFrame([{
        "columns_hash": h(",".join(sorted(names))),
        "order_hash": h(",".join(names)),
        "dtypes_hash": h(",".join(f"{n}:{t}" for n, t in zip(names, types))),
        "n_columns": len(names),
    }])


def quantile_thresholds(ds, column: str,
                        qs: "list[float]") -> "list[float] | None":
    """Exact ``quantile_cont(column, q)`` for EVERY q in one pass, no
    column materialization: one global (n, min, max) scan, then a single
    histogram-refinement rank selection over the union of bounding ranks
    and the np.percentile-'linear' interpolation — a fixed float64
    expression the SQL oracle replicates term-for-term.  Returns None
    when the column has no non-null values."""

    def partial(batch: pa.Table) -> dict:
        v = batch.column(column).drop_null()
        return {"n": len(v),
                "mn": pc.min(v).as_py() if len(v) else None,
                "mx": pc.max(v).as_py() if len(v) else None}

    def combine(parts: pd.DataFrame) -> dict:
        n = int(parts["n"].sum())
        return {"n": n,
                "mn": float(parts["mn"].min()) if n else 0.0,
                "mx": float(parts["mx"].max()) if n else 0.0}

    agg = global_agg(ds.select_columns([column]), partial, combine,
                     empty_schema=pa.schema([(column, pa.float64())]))
    n = agg["n"]
    if n == 0:
        return None
    bounds = []
    ranks: set[int] = set()
    for q in qs:
        qf = (n - 1) * q
        lo_i, hi_i = int(np.floor(qf)), int(np.ceil(qf))
        bounds.append((qf, lo_i, hi_i))
        ranks.update((lo_i, hi_i))
    rv = _rank_select(ds, column, sorted(ranks), agg["mn"], agg["mx"])
    return [float(rv[lo_i] + (qf - lo_i) * (rv[hi_i] - rv[lo_i]))
            for qf, lo_i, hi_i in bounds]


def quantile_threshold(ds, column: str, q: float) -> "float | None":
    """Single-q convenience wrapper over ``quantile_thresholds``."""
    thrs = quantile_thresholds(ds, column, [q])
    return None if thrs is None else thrs[0]


def quantile_filter(ds, column: str, q: float, *, keep: str = "above"):
    """Keep rows whose ``column`` is >= (keep='above') or <= ('below')
    the exact global q-quantile — the "drop the worst X % of the corpus
    by score" step of a quality-filter pipeline.

    Two-pass by construction (a global order statistic cannot be known
    in one streaming pass): both passes are streaming scans of the one
    needed column; nothing materializes on the driver but the
    threshold.  Rows with a null score are dropped (unknown quality
    never passes a quality gate).  For a score column that is itself an
    expensive pipeline, checkpoint it to parquet first so the two scans
    re-read the cheap artifact rather than recompute the model."""
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be above|below, got {keep!r}")
    thr = quantile_threshold(ds, column, q)

    def fn(batch: pa.Table) -> pa.Table:
        if thr is None:     # no scores at all: nothing can pass the gate
            return batch.slice(0, 0)
        col = batch.column(column)
        m = (pc.greater_equal(col, thr) if keep == "above"
             else pc.less_equal(col, thr)).fill_null(False)
        return batch.filter(m)

    return ds.map_batches(fn, batch_format="pyarrow")


def ntile_by_value(ds, column: str, n_buckets: int = 10, *,
                   tier_col: str = "tier"):
    """Assign every row a 1..n_buckets quality tier by VALUE BOUNDARY:
    tier = 1 + #{exact j/n_buckets quantiles <= value}.

    This is the scalable ntile — a true rank-ntile needs a global sort,
    while boundary assignment needs only the n_buckets-1 exact
    order statistics (one combined histogram-refinement selection) plus
    one streaming pass.  Rows inside one quantile span share a tier, so
    unlike SQL NTILE the bucket populations are equal only up to ties at
    the boundaries; the tie rule (boundary value goes UP a tier) is
    deterministic and replicated by the oracle term-for-term.  Rows with
    a null value are dropped (the quantile-gate convention of
    ``quantile_filter``)."""
    qs = [j / n_buckets for j in range(1, n_buckets)]
    thrs = quantile_thresholds(ds, column, qs)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        batch = batch.filter(col.is_valid())
        if thrs is None or batch.num_rows == 0:
            return batch.slice(0, 0).append_column(
                tier_col, pa.array([], type=pa.int64()))
        v = batch.column(column).to_numpy(zero_copy_only=False).astype(
            np.float64)
        tier = 1 + np.searchsorted(np.asarray(thrs), v, side="right")
        return batch.append_column(
            tier_col, pa.array(tier.astype(np.int64), type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def grouped_quantiles(ds, key_col: str, value_col: str,
                      qs: tuple = (0.25, 0.5, 0.75), *,
                      ndigits: int = 6, num_partitions: int | None = None):
    """Exact per-group quantiles: lazy Dataset of
    ``(key, q, value)`` with np.percentile-'linear' (== DuckDB
    ``quantile_cont``) interpolation, 6dp.

    An exact grouped order statistic needs each group's values
    co-located, so the (key, value) projection — two columns, never the
    full rows — hash-shuffles once and one vectorized pandas quantile
    runs per bucket.  Partitioning assumption: one group's values fit a
    bucket (mega-groups want the mergeable log-bucket sketch,
    sketches.approx_quantiles, instead — same trade the global exact
    path documents).  Null keys and null values are excluded.
    """
    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def project(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, value_col])
        mask = pc.and_(pc.is_valid(t.column(key_col)),
                       pc.is_valid(t.column(value_col)))
        return t.filter(mask)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, vals in g.groupby(key_col, sort=False)[value_col]:
            v = np.round(np.percentile(vals.to_numpy(dtype=np.float64),
                                       [q * 100 for q in qs]), ndigits)
            out.append(pd.DataFrame({key_col: key, "q": list(qs),
                                     "value": v}))
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame({key_col: [], "q": [], "value": []}))

    proj = ds.map_batches(project, batch_format="pyarrow")
    return bucketed_group_reduce(proj, [key_col], per_group, num_partitions)


def histogram(ds, column: str, n_bins: int = 20) -> pd.DataFrame:
    """Value-distribution histogram: one row per bin (empty bins
    included) with ``(bin, lo, hi, n)``.

    The profiling reference draws its histograms from the full frame in
    memory (ydata-profiling semantics); here: one streaming pass for the
    global min/max, one for the counts — per-batch ``np.bincount``
    partials, elementwise sum.  Binning is the fixed float expression
    ``min(floor((x − lo) / ((hi − lo) / n)), n−1)`` (NOT searchsorted on
    precomputed edges) so a SQL replica reproduces every boundary
    bit-for-bit.  Nulls excluded; a constant column lands in bin 0."""

    def mpartial(batch: pa.Table) -> dict:
        v = batch.column(column).drop_null()
        return {"n": len(v),
                "mn": pc.min(v).as_py() if len(v) else None,
                "mx": pc.max(v).as_py() if len(v) else None}

    def mcombine(parts: pd.DataFrame) -> dict:
        n = int(parts["n"].sum())
        return {"n": n, "mn": float(parts["mn"].min()) if n else 0.0,
                "mx": float(parts["mx"].max()) if n else 0.0}

    agg = global_agg(ds.select_columns([column]), mpartial, mcombine,
                     empty_schema=pa.schema([(column, pa.float64())]))
    lo, hi = agg["mn"], agg["mx"]
    # guard on w itself (not hi > lo): a subnormal range underflows
    # the division to 0.0 and would NaN the bin expression
    w = (hi - lo) / n_bins
    if not w > 0:
        w = 1.0

    def hpartial(batch: pa.Table) -> dict:
        v = batch.column(column).drop_null() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.minimum(np.floor((v - lo) / w), n_bins - 1).astype(np.int64)
        return {"h": np.bincount(idx, minlength=n_bins).tobytes()}

    def hcombine(parts: pd.DataFrame) -> dict:
        tot = np.zeros(n_bins, dtype=np.int64)
        for b in parts["h"].dropna():
            tot += np.frombuffer(b, dtype=np.int64)
        return {"h": tot}

    counts = (global_agg(ds.select_columns([column]), hpartial, hcombine,
                         empty_schema=pa.schema([(column, pa.float64())]))
              ["h"] if agg["n"] else np.zeros(n_bins, dtype=np.int64))
    i = np.arange(n_bins)
    return pd.DataFrame({"bin": i, "lo": lo + i * w, "hi": lo + (i + 1) * w,
                         "n": counts.astype(np.int64)})


def winsorize(ds, id_cols: list[str], column: str,
              q_lo: float = 0.05, q_hi: float = 0.95):
    """Winsorize ``column`` at the exact global [q_lo, q_hi] quantiles:
    every row is emitted with ``winsorized`` = value clipped into the
    quantile band, 6dp — the outlier-TREATMENT counterpart of the
    outlier-detection checks (outlier_detection_pack flags; training
    pipelines clip features/scores instead of dropping rows).

    Two streaming passes for the thresholds (``quantile_thresholds``,
    no column collect), then one stateless clip pass — rows never
    shuffle.  Null values stay null (a missing measurement is not an
    extreme one); the 6dp round pins float parity with the SQL replica
    across summation orders."""
    thrs = quantile_thresholds(ds, column, [q_lo, q_hi])

    def fn(batch: pa.Table) -> pa.Table:
        v = batch.column(column)
        vf = v.to_numpy(zero_copy_only=False).astype(np.float64)
        if thrs is None:
            out = np.full(len(vf), np.nan)
        else:
            out = _r(np.clip(vf, thrs[0], thrs[1]), 6)
        return pa.table(
            {c: batch.column(c) for c in id_cols}
            | {column: v,
               "winsorized": pa.array(out, type=pa.float64(),
                                      from_pandas=True)})

    return ds.select_columns(id_cols + [column]) \
        .map_batches(fn, batch_format="pyarrow")


def benford_profile(ds, column: str, *, scale: int = 100) -> pd.DataFrame:
    """First-significant-digit profile vs Benford's law — the classic
    profiling/fraud screen for amount-like columns (a per-digit
    companion to the ydata variable catalog; the reference profiles
    value histograms but has no conformity law check).

    One streaming pass: values become exact int64 cents
    (``round(v * scale)``, the repo's cents convention), the first
    digit is the first character of the integer's decimal string —
    exact on both sides, no float log10 boundary risk — and per-batch
    10-bin bincount partials sum elementwise.  Zero cents carry no
    leading digit and are excluded, as are nulls.  Returns 9 rows
    ``(digit, n, p_observed, p_expected)``, 6dp-pinned, digit
    ascending."""

    def partial(batch: pa.Table) -> dict:
        v = batch.column(column).drop_null() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.rint(v * scale).astype(np.int64)
        cents = cents[cents != 0]
        if len(cents):
            first = np.abs(cents).astype(str).astype("<U1") \
                .astype(np.int64)
            h = np.bincount(first, minlength=10)
        else:
            h = np.zeros(10, dtype=np.int64)
        return {"h": h.tobytes()}

    def combine(parts: pd.DataFrame) -> dict:
        tot = np.zeros(10, dtype=np.int64)
        for b in parts["h"].dropna():
            tot += np.frombuffer(b, dtype=np.int64)
        return {"h": tot}

    counts = global_agg(ds.select_columns([column]), partial, combine,
                        empty_schema=pa.schema([(column, pa.float64())])
                        )["h"]
    d = np.arange(1, 10)
    n = counts[1:10].astype(np.int64)
    tot = float(n.sum())
    p_obs = (_r(n / tot, 6) if tot
             else np.full(9, np.nan))
    return pd.DataFrame({"digit": d.astype(np.int64), "n": n,
                         "p_observed": p_obs,
                         "p_expected": _r(np.log10(1.0 + 1.0 / d), 6)})


def correlation_matrix(ds, columns: list[str], *,
                       scale: int = 100) -> pd.DataFrame:
    """Pairwise Pearson correlation for the given numeric columns —
    the correlations block of a ydata-style profile (the reference's
    profiling pack ships per-variable stats; correlations are the
    standard companion catalog).

    One streaming pass: values become exact int64 cents and each batch
    contributes integer power sums (n, Sx, Sy, Sxx, Syy, Sxy) per
    column pair over rows where BOTH sides are present.  Integer sums
    are associative, so the result is exact for any partition order;
    the driver combine re-sums them as Python ints (no 64-bit overflow
    at any scale) and evaluates one fixed float64 expression, 6dp.
    Pairs with fewer than 2 complete rows or zero variance emit a null
    pearson."""
    pairs = [(a, b) for i, a in enumerate(columns)
             for b in columns[i + 1:]]

    def partial(batch: pa.Table) -> dict:
        d = {}
        cents = {}
        valid = {}
        for c in columns:
            v = batch.column(c).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ok = ~np.isnan(v)
            cents[c] = np.where(ok, np.rint(v * scale), 0.0) \
                .astype(np.int64)
            valid[c] = ok
        for i, (a, b) in enumerate(pairs):
            m = valid[a] & valid[b]
            x, y = cents[a][m], cents[b][m]
            d[f"n_{i}"] = int(m.sum())
            d[f"sx_{i}"] = int(x.sum())
            d[f"sy_{i}"] = int(y.sum())
            d[f"sxx_{i}"] = int((x * x).sum())
            d[f"syy_{i}"] = int((y * y).sum())
            d[f"sxy_{i}"] = int((x * y).sum())
        return d

    def combine(p: pd.DataFrame) -> dict:
        # object-dtype Python-int accumulation: per-batch sums fit
        # int64, but global Sxx/Sxy at 10^12 rows would not
        return {k: int(sum(int(v) for v in p[k].dropna()))
                for k in p.columns}

    agg = global_agg(
        ds.select_columns(columns), partial, combine,
        empty_schema=pa.schema([(c, pa.float64()) for c in columns]))
    rows = []
    for i, (a, b) in enumerate(pairs):
        n = agg.get(f"n_{i}", 0)
        if n >= 2:
            # n*Sxx - Sx^2 etc. in EXACT integer arithmetic, float64
            # only at the very end — one rounding per term, the same
            # sequence as the SQL replica's CAST(<HUGEINT expr> AS
            # DOUBLE), so near-cancellation can't diverge
            sx, sy = agg[f"sx_{i}"], agg[f"sy_{i}"]
            vx = n * agg[f"sxx_{i}"] - sx * sx
            vy = n * agg[f"syy_{i}"] - sy * sy
            cov = n * agg[f"sxy_{i}"] - sx * sy
            r = (float(_r(float(cov) / np.sqrt(float(vx) * float(vy)), 6))
                 if vx > 0 and vy > 0 else None)
        else:
            r = None
        rows.append({"col_a": a, "col_b": b, "n": np.int64(n),
                     "pearson": r})
    out = pd.DataFrame(rows)
    out["pearson"] = out["pearson"].astype(np.float64)
    return out


def value_counts_catalog(ds, columns: list[str], k: int = 10,
                         *, num_partitions: int | None = None):
    """Per-column top-``k`` most frequent values with counts and
    frequency — the ydata-profiling "value counts" block
    (profiling_pack emits per-variable value tables from the full
    in-memory frame; here it streams).  Ties rank deterministically by
    (n desc, value asc); values are emitted as strings so one output
    table covers every column type.  Nulls are excluded (completeness
    is its own check).

    Scale shape: per-batch per-column value counts (combiner) ride one
    shuffle bucketed by (column, value); per-bucket sums then a tiny
    per-column top-k reduce.  Returns a lazy Dataset of
    ``(column, value, n, p)`` with p = n / column non-null total,
    6dp."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import str_column

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        frames = []
        for c in columns:
            v = str_column(batch, c).drop_null().to_pandas()
            if not len(v):
                continue
            g = v.value_counts()
            frames.append(pd.DataFrame({
                "column": c, "value": g.index.astype(str),
                "n": g.to_numpy(dtype=np.int64)}))
        if not frames:
            return pa.table({"column": pa.array([], type=pa.string()),
                             "value": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        return _table_from_pandas(pd.concat(frames),
                                    preserve_index=False)

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["column", "value"], sort=False)["n"]
                .sum().reset_index())

    summed = bucketed_group_reduce(
        ds.select_columns(columns).map_batches(partial,
                                               batch_format="pyarrow"),
        ["column", "value"], sum_counts, num_partitions)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("column", sort=False)["n"].transform("sum")
        g = g.assign(p=_r(g["n"].to_numpy(dtype=np.float64)
                          / tot.to_numpy(dtype=np.float64), 6))
        g = g.sort_values(["n", "value"], ascending=[False, True],
                          kind="stable")
        return g.groupby("column", sort=False).head(k)

    return bucketed_group_reduce(summed, ["column"], topk,
                                 min(num_partitions, len(columns)))


def grouped_correlation(ds, group_col: str, x_col: str, y_col: str, *,
                        scale: int = 100,
                        num_partitions: int | None = None):
    """Per-group Pearson correlation — ``correlation_matrix`` keyed by a
    segment column (the "does the relationship hold per segment"
    profiling question; SQL ``corr(x, y) ... GROUP BY g`` but with this
    repo's exact-integer partials instead of a float running sum).

    Per-batch integer power sums per group (cents trick, both-present
    rows), ONE tiny bucketed reduce over the per-(batch, group) partial
    rows; the reduce re-sums as Python ints (object dtype — no overflow
    at any scale) and evaluates the same one-rounding-per-term float64
    tail as ``correlation_matrix``.  Null pearson when n < 2 or a side
    has zero variance; null group keys form their own group."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    sum_cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        m = ~np.isnan(x) & ~np.isnan(y)
        # rows where a side is null are dropped BEFORE grouping (SQL
        # WHERE-before-GROUP-BY: a group with only null pairs is absent)
        xi = np.rint(x[m] * scale).astype(np.int64)
        yi = np.rint(y[m] * scale).astype(np.int64)
        df = pd.DataFrame({
            group_col: batch.column(group_col).to_pandas()[m],
            "n": np.ones(len(xi), dtype=np.int64), "sx": xi, "sy": yi,
            "sxx": xi * xi, "syy": yi * yi, "sxy": xi * yi})
        out = (df.groupby(group_col, dropna=False, sort=False)[sum_cols]
               .sum().reset_index())
        return _table_from_pandas(out, preserve_index=False)

    parts = ds.select_columns([group_col, x_col, y_col]).map_batches(
        partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        sums = (g.astype({c: object for c in sum_cols})
                .groupby(group_col, dropna=False, sort=False)[sum_cols]
                .sum())
        rows = []
        for key, r in sums.iterrows():       # bounded: distinct groups
            n = int(r["n"])
            pearson = None
            if n >= 2:
                sx, sy = int(r["sx"]), int(r["sy"])
                vx = n * int(r["sxx"]) - sx * sx
                vy = n * int(r["syy"]) - sy * sy
                cov = n * int(r["sxy"]) - sx * sy
                if vx > 0 and vy > 0:
                    pearson = float(_r(
                        float(cov) / np.sqrt(float(vx) * float(vy)), 6))
            rows.append({group_col: key, "n": np.int64(n),
                         "pearson": pearson})
        out = pd.DataFrame(rows,
                           columns=[group_col, "n", "pearson"])
        out["n"] = out["n"].astype("int64")
        out["pearson"] = out["pearson"].astype(np.float64)
        return out

    return bucketed_group_reduce(parts, [group_col], reduce_fn,
                                 num_partitions)


_TYPE_RES = (
    ("int", r"^[+-]?[0-9]+$"),
    ("float", r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("bool", r"^(?i)(true|false|yes|no|0|1)$"),
)


def type_inference(ds, columns: list[str]):
    """Semantic-type inference catalog over string columns — the
    generalization of the reference's date-only sniffing
    (timeliness_pack/main.py:26-61): per column, the fraction of
    non-null values matching int / float / date / bool shapes (RE2 on
    both sides, 6dp) and the inferred type (first family whose
    fraction is 1.0, in int → date → bool → float priority — ints also
    match the float shape, so float wins only when something is
    fractional; all-null columns infer "unknown").

    One streaming scan: per-batch regex-count partials per column, a
    tiny driver combine (rows = len(columns))."""
    from packs_ray.functions.agg import global_agg

    def partial(batch: pa.Table) -> dict:
        d = {}
        for c in columns:
            v = batch.column(c)
            d[f"n_{c}"] = len(v) - v.null_count
            for name, rx in _TYPE_RES:
                m = pc.match_substring_regex(v, rx)
                d[f"{name}_{c}"] = pc.sum(
                    pc.cast(m, "int64")).as_py() or 0
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {k: int(p[k].sum()) for k in p.columns}

    agg = global_agg(
        ds.select_columns(columns), partial, combine,
        empty_schema=pa.schema([(c, pa.string()) for c in columns]))
    rows = []
    for c in columns:
        n = agg[f"n_{c}"]
        fr = {name: (float(_r(agg[f"{name}_{c}"] / n, 6)) if n else None)
              for name, _ in _TYPE_RES}
        if n == 0:
            inferred = "unknown"
        elif fr["int"] == 1.0:
            inferred = "int"
        elif fr["date"] == 1.0:
            inferred = "date"
        elif fr["bool"] == 1.0:
            inferred = "bool"
        elif fr["float"] == 1.0:
            inferred = "float"
        else:
            inferred = "string"
        rows.append({"column": c, "n": np.int64(n),
                     "frac_int": fr["int"], "frac_float": fr["float"],
                     "frac_date": fr["date"], "frac_bool": fr["bool"],
                     "inferred_type": inferred})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    for name, _ in _TYPE_RES:
        out[f"frac_{name}"] = out[f"frac_{name}"].astype(np.float64)
    return out


def equi_depth_histogram(ds, value_col: str, tie_cols: list[str],
                         n_tiles: int = 16, *,
                         num_buckets: int | None = None):
    """Equal-FREQUENCY histogram (the quantile sibling of the
    equal-width ``histogram``): SQL ``ntile(n) OVER (ORDER BY value,
    ties...)`` rolled up per tile to (tile, n, lo, hi).  Tile
    boundaries ARE the empirical quantiles, so this is the profile a
    quality gate reads when the distribution is skewed and fixed-width
    bins collapse into one bar.

    ``(value_col, *tie_cols)`` must be a unique total order (the SQL
    ntile over a tied order is nondeterministic; the explicit
    tie-break makes both engines deterministic).  Shape: ONE
    ``global_row_number`` pass (range-bucket shuffle + driver offsets),
    a stateless tile map using the exact SQL tile-size rule (first
    ``N % n`` tiles get one extra row), then an ``n_tiles``-row
    reduce.  Null values are dropped (module convention)."""
    import numpy as np

    from packs_ray.functions.agg import bucketed_group_reduce, global_agg
    from packs_ray.functions.windows import global_row_number

    def n_partial(batch: pa.Table) -> dict:
        v = batch.column(value_col)
        return {"n": len(v) - v.null_count}

    n_total = global_agg(
        ds.select_columns([value_col]), n_partial,
        lambda df: {"n": int(df["n"].sum())},
        empty_schema=pa.schema([(value_col, pa.float64())]))["n"]

    ranked = global_row_number(ds, value_col, tie_cols,
                               num_buckets=num_buckets)
    q, r = divmod(n_total, n_tiles) if n_total else (0, 0)
    thr = r * (q + 1)

    def add_tile(batch: pa.Table) -> pa.Table:
        idx = batch.column("order_idx").to_numpy(
            zero_copy_only=False) - 1
        tile = np.where(idx < thr, idx // max(q + 1, 1),
                        r + (idx - thr) // max(q, 1)) + 1
        return pa.table({"tile": pa.array(tile.astype(np.int64)),
                         value_col: batch.column(value_col)})

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("tile", sort=False)[value_col]
               .agg(n="size", lo="min", hi="max").reset_index())
        return out.astype({"n": "int64"})

    parts = ranked.map_batches(add_tile, batch_format="pyarrow")
    return bucketed_group_reduce(parts, ["tile"], reduce_fn,
                                 min(n_tiles, 16))


def key_skew(ds, key_col: str, *, top_k: int = 10) -> pd.DataFrame:
    """Partition-key skew diagnostic: how concentrated the row count is
    across the values of ``key_col`` — the number every shuffle/salting
    decision in this repo hangs on (a groupby on a key with
    top1_share ≈ 1 funnels through one reducer; see SURVEY §2 skew
    notes).  One summary row: n_rows, n_keys, max_count, top1_share,
    topk_share (largest ``top_k`` counts), and the Gini coefficient of
    the per-key count distribution (0 = perfectly even, →1 = one key
    owns everything).

    Exactness: counts, the rank-weighted Gini numerator and the top-k
    sum are exact integers (Python-int combine, no overflow); each
    share/Gini is ONE pinned float64 expression (6dp) shared with the
    SQL replica.  Ties in the Gini rank order don't matter — equal
    counts contribute the same weighted sum under any permutation.

    Scale shape: per-key counts via the bucketed count reduce (bounded
    by key cardinality, stays distributed); ranks via the
    range-partitioned global_row_number; then two tiny streaming scans
    (moment partials, per-block top-k candidates).  Null keys are
    excluded."""
    from packs_ray.functions.agg import keyed_count
    from packs_ray.functions.windows import global_row_number

    narrow = ds.select_columns([key_col]).map_batches(
        lambda b: b.filter(pc.is_valid(b.column(key_col))),
        batch_format="pyarrow")
    counts = keyed_count(narrow, [key_col], count_col="cnt").materialize()

    ranked = global_row_number(counts, "cnt", [key_col], out_col="rn")

    def spartial(batch: pa.Table) -> dict:
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        top = np.sort(cnt)[-top_k:]
        return {"k": len(cnt), "s": int(cnt.sum()),
                "mx": int(cnt.max()) if len(cnt) else 0,
                # Python ints: rank*count sums overflow int64 long
                # before they overflow arbitrary precision
                "s1": str(sum(int(a) * int(b) for a, b in zip(rn, cnt))),
                "top": np.ascontiguousarray(top.astype(np.int64)).tobytes()}

    def scombine(p: pd.DataFrame) -> dict:
        tops = np.sort(np.concatenate(
            [np.frombuffer(b, dtype=np.int64) for b in p["top"]]
            or [np.array([], dtype=np.int64)]))[-top_k:]
        return {"k": int(p["k"].sum()), "s": int(p["s"].sum()),
                "mx": int(p["mx"].max()) if len(p) else 0,
                "s1": sum(int(x) for x in p["s1"]),
                "topk": int(tops.sum())}

    sch = pa.schema([("cnt", pa.int64()), ("rn", pa.int64())])
    st = global_agg(ranked, spartial, scombine, empty_schema=sch)
    if st["k"] == 0:
        return pd.DataFrame([{"column": key_col, "n_rows": np.int64(0),
                              "n_keys": np.int64(0),
                              "max_count": np.int64(0),
                              "top1_share": np.nan, "topk_share": np.nan,
                              "gini": np.nan}])
    k, s, s1 = float(st["k"]), float(st["s"]), float(st["s1"])
    return pd.DataFrame([{
        "column": key_col,
        "n_rows": np.int64(st["s"]), "n_keys": np.int64(st["k"]),
        "max_count": np.int64(st["mx"]),
        "top1_share": float(_r(st["mx"] / s, 6)),
        "topk_share": float(_r(st["topk"] / s, 6)),
        "gini": float(_r(2.0 * s1 / (k * s) - (k + 1.0) / k, 6))}])


def missingness_phi(ds, columns: list[str]) -> pd.DataFrame:
    """Missing-value correlation catalog: for every column pair, the
    phi coefficient between the two null-indicator vectors — the
    "missing correlations" block of a ydata-style profile (reference
    profiling pack ambition; structural missingness, e.g. two fields
    absent together, shows up as phi near 1).

    Exactness: the four joint counts (n, n_a, n_b, n_ab) are exact
    integers from one streaming pass; phi is ONE pinned float64
    expression ``(n·n_ab − n_a·n_b) / sqrt(n_a(n−n_a)) / sqrt(n_b(n−n_b))``
    (6dp) shared with the HUGEINT SQL replica.  Pairs where either
    column is never or always null emit a null phi (zero variance).
    """
    from packs_ray.functions.agg import global_agg

    pairs = [(a, b) for i, a in enumerate(columns)
             for b in columns[i + 1:]]

    def partial(batch: pa.Table) -> dict:
        miss = {c: pc.is_null(batch.column(c))
                .to_numpy(zero_copy_only=False) for c in columns}
        d = {"n": len(batch)}
        for c in columns:
            d[f"m_{c}"] = int(miss[c].sum())
        for i, (a, b) in enumerate(pairs):
            d[f"ab_{i}"] = int((miss[a] & miss[b]).sum())
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {k: int(p[k].sum()) for k in p.columns}

    agg = global_agg(ds.select_columns(columns), partial, combine,
                     empty_schema=pa.schema(
                         [(c, pa.float64()) for c in columns]))
    n = agg["n"]
    rows = []
    for i, (a, b) in enumerate(pairs):
        na, nb, nab = agg[f"m_{a}"], agg[f"m_{b}"], agg[f"ab_{i}"]
        va, vb = na * (n - na), nb * (n - nb)
        phi = None
        if va > 0 and vb > 0:
            phi = float(_r((n * nab - na * nb)
                           / np.sqrt(float(va)) / np.sqrt(float(vb)), 6))
        rows.append((a, b, np.int64(n), np.int64(na), np.int64(nb),
                     np.int64(nab), phi))
    out = pd.DataFrame(rows, columns=["col_a", "col_b", "n", "n_a",
                                      "n_b", "n_ab", "phi"])
    out["phi"] = out["phi"].astype(np.float64)
    return out


def grouped_completeness(ds, group_col: str, columns: list[str],
                         num_partitions: int | None = None):
    """Per-segment completeness: non-null counts + completeness ratio
    for each ``columns`` entry WITHIN each ``group_col`` value — the
    sliced view of ``completeness`` that catches a feed whose nulls
    concentrate in one segment while the global ratio still looks
    healthy.  Null group values form their own ``None`` segment (they
    are exactly the rows a segment audit must not drop).

    Exactness: exact integer counts; completeness is one pinned 6dp
    division per row.  Shape: per-batch (group, n, nn_col...) partial
    rows, one group-bucketed sum reduce; output is bounded by
    n_groups x n_columns.

    Output: (group_col, column, non_null, total, completeness)."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col] + columns).to_pandas()
        g = df.groupby(group_col, sort=False, dropna=False)
        out = g.size().reset_index(name="_n")
        for c in columns:
            out[f"_nn_{c}"] = g[c].count().to_numpy().astype(np.int64)
        out["_n"] = out["_n"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(group_col, sort=False, dropna=False).sum()
        rows = []
        for grp, r in s.iterrows():
            total = int(r["_n"])
            for c in columns:
                nn = int(r[f"_nn_{c}"])
                rows.append({
                    group_col: grp, "column": c,
                    "non_null": np.int64(nn), "total": np.int64(total),
                    "completeness": float(_r(nn / total, 6))
                    if total else None})
        return pd.DataFrame(rows)

    return bucketed_group_reduce(parts, [group_col], reduce_fn,
                                 num_partitions)


def weighted_quantiles(ds, value_col: str, weight_col: str,
                       qs: tuple = (0.25, 0.5, 0.75), *,
                       n_bins: int = 4096,
                       gather_cap: int = 4_000_000) -> pd.DataFrame:
    """Exact weighted quantiles of ``value_col`` under integer weights
    ``weight_col`` — e.g. token-weighted document-length quantiles,
    where a 10k-token document should count 10k times (the corpus-mass
    view; unweighted quantiles answer the per-document view).  The
    q-quantile is the SMALLEST value v whose cumulative weight
    (Σ weight over values ≤ v) reaches ``q × W`` — a tie-free
    definition both engines compute identically.  Rows with a null
    value or null/non-positive weight are excluded.

    Exactness: W and all cumulative weights are exact int64 sums; the
    only float is the ``q × W`` threshold, compared identically by the
    DuckDB replica.

    Scale shape: the weighted sibling of the :func:`_rank_select`
    histogram-refinement — one combined (weight-sum, row-count)
    histogram scan per level over the active spans, descend into the
    crossing bin, gather a bin to the driver only once it holds
    ≤ ``gather_cap`` rows; depth ≤ log_bins(n/cap).  No driver column
    materialization.

    Output: one row per q — (q, value, total_weight), ordered by q."""

    def base_partial(batch: pa.Table) -> dict:
        v = batch.column(value_col)
        w = batch.column(weight_col)
        m = pc.and_(pc.and_(v.is_valid(), w.is_valid()),
                    pc.greater(pc.fill_null(w, 0), 0))
        vv = v.filter(m).to_numpy(zero_copy_only=False).astype(np.float64)
        ww = w.filter(m).to_numpy(zero_copy_only=False).astype(np.int64)
        return {"W": int(ww.sum()), "n": len(vv),
                "mn": float(vv.min()) if len(vv) else None,
                "mx": float(vv.max()) if len(vv) else None}

    def base_combine(p: pd.DataFrame) -> dict:
        return {"W": int(p["W"].sum()), "n": int(p["n"].sum()),
                "mn": float(p["mn"].min()) if p["mn"].notna().any() else None,
                "mx": float(p["mx"].max()) if p["mx"].notna().any() else None}

    narrow = ds.select_columns([value_col, weight_col])
    # 0-row inputs lose their lazy schema after any upstream transform;
    # the partials only cast, so generic numeric fields suffice
    esch = pa.schema([(value_col, pa.float64()), (weight_col, pa.int64())])
    base = global_agg(narrow, base_partial, base_combine,
                      empty_schema=esch)
    W, lo, hi = base["W"], base["mn"], base["mx"]
    if not base["n"]:
        return pd.DataFrame({"q": pd.Series(sorted(qs), dtype="float64"),
                             "value": np.nan,
                             "total_weight": np.int64(0)})
    # state per q: [lo, hi, weight_below_lo]; closed spans, the top
    # edge rides the last bin (idx clipped), so binning == gather
    state = {float(q): [lo, hi, 0] for q in qs}
    out: dict[float, float] = {}
    if hi <= lo:
        out = {float(q): lo for q in qs}

    def _bin_idx(v: np.ndarray, slo: float, shi: float) -> np.ndarray:
        edges = _bin_edges(slo, shi, n_bins)
        idx = np.searchsorted(edges, v, side="right") - 1
        return np.clip(idx, 0, n_bins - 1)

    for _level in range(6):
        active = {q: s for q, s in state.items() if q not in out}
        if not active:
            break
        spans = sorted({(s[0], s[1]) for s in active.values()})

        def hist_partial(batch, spans=spans):
            v = batch.column(value_col)
            w = batch.column(weight_col)
            m = pc.and_(pc.and_(v.is_valid(), w.is_valid()),
                        pc.greater(pc.fill_null(w, 0), 0))
            vv = v.filter(m).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ww = w.filter(m).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = {}
            for si, (slo, shi) in enumerate(spans):
                sel = (vv >= slo) & (vv <= shi)
                idx = _bin_idx(vv[sel], slo, shi)
                d[f"w_{si}"] = np.bincount(
                    idx, weights=ww[sel].astype(np.float64),
                    minlength=n_bins).astype(np.int64).tobytes()
                d[f"c_{si}"] = np.bincount(
                    idx, minlength=n_bins).astype(np.int64).tobytes()
            return d

        def hist_combine(p):
            d = {}
            for si in range(len(spans)):
                for pre in ("w", "c"):
                    tot = np.zeros(n_bins, dtype=np.int64)
                    for b in p[f"{pre}_{si}"]:
                        tot += np.frombuffer(b, dtype=np.int64)
                    d[f"{pre}_{si}"] = tot
            return d

        hists = global_agg(narrow, hist_partial, hist_combine,
                           empty_schema=esch)

        gathers: dict[tuple, list[float]] = {}
        for q, (slo, shi, below) in active.items():
            si = spans.index((slo, shi))
            wsum = hists[f"w_{si}"]
            cnt = hists[f"c_{si}"]
            T = q * W
            cum = below + np.cumsum(wsum)
            if cum[-1] < T:       # q*W beyond all mass (q == 1.0 edge)
                out[q] = shi
                continue
            # smallest bin whose cumulative weight reaches T
            b = int(np.searchsorted(cum, T, side="left"))
            while cum[b] < T:
                b += 1
            new_below = int(below + (cum[b - 1] - below if b else 0))
            edges = _bin_edges(slo, shi, n_bins)
            blo, bhi = float(edges[b]), float(edges[b + 1] if b + 1 <= n_bins
                                              else shi)
            if bhi <= blo:
                out[q] = blo
            elif cnt[b] <= gather_cap:
                gathers.setdefault((slo, shi, b), []).append(q)
                state[q] = [blo, bhi, new_below]
            else:
                state[q] = [blo, bhi, new_below]

        if gathers:
            def gather_partial(batch, keys=sorted(gathers)):
                v = batch.column(value_col)
                w = batch.column(weight_col)
                m = pc.and_(pc.and_(v.is_valid(), w.is_valid()),
                            pc.greater(pc.fill_null(w, 0), 0))
                vv = v.filter(m).to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
                ww = w.filter(m).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                d = {}
                for ki, (slo, shi, b) in enumerate(keys):
                    sel = (vv >= slo) & (vv <= shi)
                    sub_v, sub_w = vv[sel], ww[sel]
                    inbin = _bin_idx(sub_v, slo, shi) == b
                    # distinct-value weight sums: bounded by bin content
                    uv, inv = np.unique(sub_v[inbin], return_inverse=True)
                    uw = np.bincount(inv, weights=sub_w[inbin]
                                     .astype(np.float64)).astype(np.int64) \
                        if len(uv) else np.zeros(0, dtype=np.int64)
                    d[f"gv_{ki}"] = uv.tobytes()
                    d[f"gw_{ki}"] = uw.tobytes()
                return d

            def gather_combine(p, keys=sorted(gathers)):
                d = {}
                for ki in range(len(keys)):
                    vs, ws = [], []
                    for bv, bw in zip(p[f"gv_{ki}"], p[f"gw_{ki}"]):
                        vs.append(np.frombuffer(bv, dtype=np.float64))
                        ws.append(np.frombuffer(bw, dtype=np.int64))
                    av = np.concatenate(vs) if vs else np.zeros(0)
                    aw = np.concatenate(ws) if ws else np.zeros(0, np.int64)
                    uv, inv = np.unique(av, return_inverse=True)
                    uw = np.bincount(inv, weights=aw.astype(np.float64)) \
                        .astype(np.int64) if len(uv) \
                        else np.zeros(0, np.int64)
                    d[f"v_{ki}"] = uv.tobytes()
                    d[f"w_{ki}"] = uw.tobytes()
                return d

            g = global_agg(narrow, gather_partial, gather_combine,
                           empty_schema=esch)
            for ki, key in enumerate(sorted(gathers)):
                uv = np.frombuffer(g[f"v_{ki}"], dtype=np.float64)
                uw = np.frombuffer(g[f"w_{ki}"], dtype=np.int64)
                for q in gathers[key]:
                    below = state[q][2]
                    cum = below + np.cumsum(uw)
                    T = q * W
                    j = int(np.searchsorted(cum, T, side="left"))
                    while j < len(cum) and cum[j] < T:
                        j += 1
                    out[q] = float(uv[min(j, len(uv) - 1)])

    rows = [{"q": float(q), "value": float(out[float(q)]),
             "total_weight": np.int64(W)} for q in sorted(qs)]
    return pd.DataFrame(rows)


def spearman_corr(ds, col_a: str, col_b: str,
                  num_partitions: int | None = None) -> pd.DataFrame:
    """Exact Spearman rank correlation between two bounded-domain
    numeric columns (Spearman 1904): Pearson over average ranks with
    the standard mid-rank tie treatment — the monotone-association
    sibling of the Pearson catalog (:func:`correlation_matrix`), robust
    to the skewed long-tail columns a quality pipeline scores.  Rows
    with a null on either side are excluded (pairwise deletion: ranks
    are computed on the joint non-null set).

    Exactness: the bounded (a, b) cell table and both marginal count
    tables are exact integers from one bucketed cell reduce; average
    ranks (cnt_less + (cnt_eq+1)/2) and every moment are float64 sums
    of identical per-cell terms in canonical (a, b) order, rounded 6dp
    (the round absorbs summation-order bits — the
    association_summary convention).  Zero-variance columns yield a
    null rho.

    Partitioning assumption: the DISTINCT value domains are bounded
    (discrete/quantized columns — quantities, rates, scores); the cell
    table, not the rows, reaches the driver.

    Output: one row (n, spearman_rho)."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([col_a, col_b]).filter(pc.and_(
            batch.column(col_a).is_valid(),
            batch.column(col_b).is_valid()))
        return (batch.group_by([col_a, col_b])
                .aggregate([([], "count_all")])
                .rename_columns([col_a, col_b, "n"]))

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([col_a, col_b], sort=False)["n"].sum()
                .reset_index().astype({"n": "int64"}))

    cells = bucketed_group_reduce(
        ds.map_batches(marks, batch_format="pyarrow"),
        [col_a, col_b], reduce_fn, num_partitions).to_pandas()
    if cells.empty or "n" not in cells.columns:
        return pd.DataFrame([{"n": np.int64(0), "spearman_rho": np.nan}])
    cells = cells.sort_values([col_a, col_b], kind="stable")

    def avg_ranks(counts: pd.Series) -> pd.Series:
        # counts indexed by sorted value; avg rank (1-based) =
        # cnt_less + (cnt_eq + 1)/2, mid-rank tie convention
        c = counts.to_numpy(dtype=np.float64)
        less = np.concatenate([[0.0], np.cumsum(c)[:-1]])
        return pd.Series(less + (c + 1.0) / 2.0, index=counts.index)

    na = cells.groupby(col_a, sort=True)["n"].sum()
    nb = cells.groupby(col_b, sort=True)["n"].sum()
    ra = avg_ranks(na)
    rb = avg_ranks(nb)
    w = cells["n"].to_numpy(dtype=np.float64)
    x = cells[col_a].map(ra).to_numpy(dtype=np.float64)
    y = cells[col_b].map(rb).to_numpy(dtype=np.float64)
    n = float(w.sum())
    sx, sy = float((w * x).sum()), float((w * y).sum())
    sxx, syy = float((w * x * x).sum()), float((w * y * y).sum())
    sxy = float((w * x * y).sum())
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    rho = ((n * sxy - sx * sy) / (np.sqrt(vx) * np.sqrt(vy))
           if vx > 0 and vy > 0 else None)
    return pd.DataFrame([{
        "n": np.int64(int(n)),
        "spearman_rho": float(_r(rho, 6)) if rho is not None else None}])


def kendall_tau(ds, col_a: str, col_b: str,
                num_partitions: int | None = None) -> pd.DataFrame:
    """Exact Kendall tau-b between two bounded-domain numeric columns
    (Kendall 1938, tie-adjusted): concordant-minus-discordant pair mass
    over the joint cell table — the third association measure beside
    Pearson (:func:`correlation_matrix`) and Spearman
    (:func:`spearman_corr`); preferred when the monotone signal lives
    in heavily tied ordinal scores.  Null rows pairwise-deleted.

    Exactness: cell counts are exact integers from one bucketed
    reduce; C, D and the tie terms are float64 sums of identical
    per-cell-pair products in canonical cell order (pair mass reaches
    ~n², past int64 at corpus scale), rounded via the final 6dp round.

    Partitioning assumption: bounded DISTINCT domains (the |cells|²
    concordance scan runs on the driver over the bounded cell table).

    Output: one row (n, kendall_tau)."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([col_a, col_b]).filter(pc.and_(
            batch.column(col_a).is_valid(),
            batch.column(col_b).is_valid()))
        return (batch.group_by([col_a, col_b])
                .aggregate([([], "count_all")])
                .rename_columns([col_a, col_b, "n"]))

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([col_a, col_b], sort=False)["n"].sum()
                .reset_index().astype({"n": "int64"}))

    cells = bucketed_group_reduce(
        ds.map_batches(marks, batch_format="pyarrow"),
        [col_a, col_b], reduce_fn, num_partitions).to_pandas()
    if cells.empty or "n" not in cells.columns:
        return pd.DataFrame([{"n": np.int64(0), "kendall_tau": np.nan}])
    cells = cells.sort_values([col_a, col_b], kind="stable")
    a = cells[col_a].to_numpy(dtype=np.float64)
    b = cells[col_b].to_numpy(dtype=np.float64)
    w = cells["n"].to_numpy(dtype=np.float64)
    gt_a = a[None, :] > a[:, None]      # cell pair (i, j): a_j > a_i
    ww = w[:, None] * w[None, :]
    C = float(ww[gt_a & (b[None, :] > b[:, None])].sum())
    D = float(ww[gt_a & (b[None, :] < b[:, None])].sum())
    n = float(w.sum())
    n0 = n * (n - 1) / 2.0
    ta = cells.groupby(col_a, sort=True)["n"].sum() \
        .to_numpy(dtype=np.float64)
    tb = cells.groupby(col_b, sort=True)["n"].sum() \
        .to_numpy(dtype=np.float64)
    n1 = float((ta * (ta - 1) / 2.0).sum())
    n2 = float((tb * (tb - 1) / 2.0).sum())
    denom = np.sqrt(n0 - n1) * np.sqrt(n0 - n2)
    tau = (C - D) / denom if denom > 0 else None
    return pd.DataFrame([{
        "n": np.int64(int(n)),
        "kendall_tau": float(_r(tau, 6)) if tau is not None else None}])


def histogram2d(ds, col_x: str, col_y: str, n_bins: int = 20) -> pd.DataFrame:
    """Joint 2-D histogram of two numeric columns: one row per occupied
    (bin_x, bin_y) cell — the dependence/drift eyeball view (a joint
    shift two marginal histograms can't show).  Rows with a null on
    either side are excluded.

    Same contract as :func:`histogram`: one streaming pass for the
    global bounds of each column, one for the counts (per-batch 2-D
    ``np.bincount`` partials, elementwise sum); binning is the fixed
    float expression ``min(floor((v − lo)/w), n−1)`` per axis so a SQL
    replica reproduces every boundary bit-for-bit; a constant column
    lands in bin 0 (w forced to 1.0).  Empty cells are OMITTED (the 2-D
    lattice is n²; SQL GROUP BY semantics).

    Output: (bin_x, bin_y, lo_x, hi_x, lo_y, hi_y, n), ordered by
    (bin_x, bin_y)."""

    def mpartial(batch: pa.Table) -> dict:
        x = batch.column(col_x)
        y = batch.column(col_y)
        m = pc.and_(x.is_valid(), y.is_valid())
        xv, yv = x.filter(m), y.filter(m)
        return {"n": len(xv),
                "mnx": pc.min(xv).as_py() if len(xv) else None,
                "mxx": pc.max(xv).as_py() if len(xv) else None,
                "mny": pc.min(yv).as_py() if len(yv) else None,
                "mxy": pc.max(yv).as_py() if len(yv) else None}

    def mcombine(p: pd.DataFrame) -> dict:
        n = int(p["n"].sum())
        return {"n": n,
                "mnx": float(p["mnx"].min()) if n else 0.0,
                "mxx": float(p["mxx"].max()) if n else 0.0,
                "mny": float(p["mny"].min()) if n else 0.0,
                "mxy": float(p["mxy"].max()) if n else 0.0}

    esch = pa.schema([(col_x, pa.float64()), (col_y, pa.float64())])
    narrow = ds.select_columns([col_x, col_y])
    agg = global_agg(narrow, mpartial, mcombine, empty_schema=esch)
    lox, loy = agg["mnx"], agg["mny"]
    wx = (agg["mxx"] - lox) / n_bins
    wy = (agg["mxy"] - loy) / n_bins
    if not wx > 0:
        wx = 1.0
    if not wy > 0:
        wy = 1.0

    def hpartial(batch: pa.Table) -> dict:
        x = batch.column(col_x)
        y = batch.column(col_y)
        m = pc.and_(x.is_valid(), y.is_valid())
        xv = x.filter(m).to_numpy(zero_copy_only=False).astype(np.float64)
        yv = y.filter(m).to_numpy(zero_copy_only=False).astype(np.float64)
        ix = np.minimum(np.floor((xv - lox) / wx), n_bins - 1) \
            .astype(np.int64)
        iy = np.minimum(np.floor((yv - loy) / wy), n_bins - 1) \
            .astype(np.int64)
        return {"h": np.bincount(ix * n_bins + iy,
                                 minlength=n_bins * n_bins).tobytes()}

    def hcombine(p: pd.DataFrame) -> dict:
        tot = np.zeros(n_bins * n_bins, dtype=np.int64)
        for b in p["h"].dropna():
            tot += np.frombuffer(b, dtype=np.int64)
        return {"h": tot}

    counts = global_agg(narrow, hpartial, hcombine,
                        empty_schema=esch)["h"]
    grid = counts.reshape(n_bins, n_bins)
    bx, by = np.nonzero(grid)
    return pd.DataFrame({
        "bin_x": bx.astype(np.int64), "bin_y": by.astype(np.int64),
        "lo_x": lox + bx * wx, "hi_x": lox + (bx + 1) * wx,
        "lo_y": loy + by * wy, "hi_y": loy + (by + 1) * wy,
        "n": grid[bx, by].astype(np.int64)})


def completeness_ci(ds, columns: list[str], *,
                    z: float = 1.959963984540054) -> pd.DataFrame:
    """Per-column completeness with a Wilson score interval (Wilson
    1927) — the sample-size-aware version of :func:`completeness`: on
    a 1k-row partition a 99% point estimate means little, and the
    Wilson bounds say exactly how little (they stay inside [0, 1] and
    behave at p→1, where the Wald interval collapses).  Default z is
    the two-sided 95% normal quantile.

    Exactness: counts are exact integers; the bounds are ONE pinned
    float64 expression each over (k, n, z), 6dp.

    Output per column: (column, non_null, total, completeness,
    ci_low, ci_high)."""

    base = completeness(ds, columns)
    from packs_ray.stages.util import round_half_away as _r

    k = base["non_null"].to_numpy(dtype=np.float64)
    n = base["total"].to_numpy(dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(n > 0, k / n, 1.0)
        denom = 1.0 + z * z / n
        center = (p + z * z / (2.0 * n)) / denom
        half = (z * np.sqrt(p * (1.0 - p) / n
                            + z * z / (4.0 * n * n))) / denom
        lo = np.where(n > 0, np.maximum(center - half, 0.0), np.nan)
        hi = np.where(n > 0, np.minimum(center + half, 1.0), np.nan)
    out = base.copy()
    out["ci_low"] = _r(lo.astype(np.float64), 6)
    out["ci_high"] = _r(hi.astype(np.float64), 6)
    return out


def grouped_quantile_filter(ds, key_col: str, value_col: str, q: float,
                            *, keep_cols: list[str] | None = None,
                            num_partitions: int | None = None):
    """Per-GROUP quantile gate: keep rows whose value is at-or-above
    their own group's q-quantile — the curation shape that a global
    gate (``quantile_filter``) gets wrong on mixed corpora, where one
    dominant language/domain sets the bar and starves the rest.
    Returns a lazy Dataset of the kept rows (``keep_cols`` or all
    input columns).  Null key/value rows drop (they have no group
    bar to clear).

    Exactness: thresholds come from the exact ``grouped_quantiles``
    (quantile_cont interpolation, 6dp) and the compare is ``>=``
    against the ROUNDED threshold — both shared with the SQL replica.

    Scale shape: the threshold table is bounded by group cardinality
    (languages/domains — small by construction; a 10^9-key group-by
    wants the sketch path instead), broadcast once with ``ray.put``;
    the gate itself is a stateless vectorized filter, full rows never
    shuffle."""
    import ray

    if ds.schema() is None:  # schema-less 0-row input: nothing to gate
        return ds
    thr = grouped_quantiles(ds, key_col, value_col, qs=(q,),
                            num_partitions=num_partitions).to_pandas()
    mapping = (dict(zip(thr[key_col], thr["value"]))
               if key_col in thr.columns else {})
    ref = ray.put(mapping)
    cols = keep_cols or ds.schema().names

    def gate(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        batch = batch.select(cols)
        mask = pc.and_(pc.is_valid(batch.column(key_col)),
                       pc.is_valid(batch.column(value_col)))
        batch = batch.filter(mask)
        keys = batch.column(key_col).to_pandas()
        bars = keys.map(m).to_numpy(dtype=np.float64, na_value=np.inf)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return batch.filter(pa.array(v >= bars))

    return ds.map_batches(gate, batch_format="pyarrow")


def mutual_info(ds, col_a: str, col_b: str) -> pd.DataFrame:
    """Mutual information between two categorical columns (nats) plus
    marginal entropies and normalized MI — the dependency screen behind
    "is this field redundant / is this split leaking labels?".  Extends
    the profiling pack's per-column view to column PAIRS (the reference
    only profiles columns independently, profiling_pack/main.py:356-371).

    Exactness (the js_divergence convention): every per-cell float
    contribution is pinned to integer NANO-nats and summed as int64 —
    order-free, so block/partition order cannot drift a bit.  The final
    mi / h_a / h_b are single divisions of those integer sums; nmi is
    ONE fixed float expression, rounded 6dp, identical in the SQL
    oracle.  Rows with a null in either column drop.

    Scale: per-block local (a, b, n) combiner rides one tiny groupby —
    driver sees only the joint-cardinality table."""
    import pyarrow.compute as pc

    from packs_ray.stages.util import round_half_away as _rr

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([col_a, col_b])
        mask = pc.and_(batch.column(col_a).is_valid(),
                       batch.column(col_b).is_valid())
        df = batch.filter(mask).to_pandas()
        out = (df.groupby([col_a, col_b], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    joint = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby([col_a, col_b]).sum("n").to_pandas()
             .rename(columns={"sum(n)": "nij"}))
    if joint.empty:
        return pd.DataFrame([{"n": 0, "card_a": 0, "card_b": 0,
                              "mi_nats": None, "h_a": None, "h_b": None,
                              "nmi": None}])
    nij = joint["nij"].to_numpy(np.int64)
    ni = joint.groupby(col_a)["nij"].transform("sum").to_numpy(np.int64)
    nj = joint.groupby(col_b)["nij"].transform("sum").to_numpy(np.int64)
    n = int(nij.sum())
    nf, nijf, nif, njf = float(n), nij.astype(np.float64), \
        ni.astype(np.float64), nj.astype(np.float64)
    terms = _rr((nijf / nf) * np.log((nf * nijf) / (nif * njf)) * 1e9,
                0).astype(np.int64)
    mi = float(terms.sum()) / 1e9
    ma = joint.groupby(col_a)["nij"].sum().to_numpy(np.int64) \
        .astype(np.float64)
    mb = joint.groupby(col_b)["nij"].sum().to_numpy(np.int64) \
        .astype(np.float64)
    ha = float(_rr((-(ma / nf)) * np.log(ma / nf) * 1e9, 0)
               .astype(np.int64).sum()) / 1e9
    hb = float(_rr((-(mb / nf)) * np.log(mb / nf) * 1e9, 0)
               .astype(np.int64).sum()) / 1e9
    nmi = (float(_rr(mi / np.sqrt(ha * hb), 6))
           if ha > 0 and hb > 0 else None)
    return pd.DataFrame([{
        "n": n, "card_a": int(len(ma)), "card_b": int(len(mb)),
        "mi_nats": mi, "h_a": ha, "h_b": hb, "nmi": nmi}])


def _exact_dot_py(a, b, cap: int = 1 << 62):
    """Exact Σ a_i*b_i for int64 vectors whose per-element product fits
    int64 but whose SUM may not: vectorized int64 products, chunked so
    each chunk's partial stays under ``cap``, Python-int fold across the
    (few) chunk partials.  Returns a Python int."""
    import numpy as np

    if len(a) == 0:
        return 0
    prod = a.astype(np.int64) * b.astype(np.int64)
    mx = int(np.abs(prod).max()) or 1
    step = max(1, cap // (mx + 1))
    return sum(int(prod[i:i + step].sum())
               for i in range(0, len(prod), step))


def gini_profile(ds, value_col: str, *,
                 num_buckets: int | None = None) -> pd.DataFrame:
    """Exact Gini coefficient of a non-negative numeric column —
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over the ascending sort — the
    inequality profile of a curation pipeline (token-budget or revenue
    concentration; a corpus whose domain sizes have G→1 is one crawl
    host in a trench coat).  Values are pinned to integer cents; the
    rank-weighted sum is exact (chunked-int64 + Python-int fold; the
    SQL twin uses HUGEINT), and tie groups contribute a
    permutation-invariant Σ, so the result is bit-stable at any
    parallelism.  Nulls drop.  One row: n, total (2dp), gini (6dp,
    null when n=0 or Σx=0).

    Scale shape: the global_rank range-bucket pattern — two narrow
    scans (min/max, per-bucket counts) give exclusive offsets; ONE
    value-bucketed shuffle of (cents) rows; per bucket a local sort +
    one exact dot against the global 1-based rank window.  Only
    fixed-width partials land on the driver."""
    import numpy as np

    from packs_ray.functions.agg import global_agg, row_shuffle_partitions
    from packs_ray.functions.windows import _range_bucket_counts
    from packs_ray.stages.util import round_half_away as _rh

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)
    narrow = ds.select_columns([value_col])
    empty_sch = pa.schema([(value_col, pa.float64())])

    def cents_of(col: pa.Array) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return _rh(v * 100.0, 0).astype(np.int64)

    def mm_partial(batch: pa.Table) -> dict:
        v = batch.column(value_col).drop_null()
        mn, mx = pc.min(v), pc.max(v)
        return {"mn": mn.as_py() if mn.is_valid else None,
                "mx": mx.as_py() if mx.is_valid else None,
                "n": len(v) - v.null_count}

    def mm_combine(df: pd.DataFrame) -> dict:
        n = int(df["n"].sum())
        mns, mxs = df["mn"].dropna(), df["mx"].dropna()
        return {"n": n, "mn": float(mns.min()) if len(mns) else 0.0,
                "mx": float(mxs.max()) if len(mxs) else 1.0}

    mm = global_agg(narrow, mm_partial, mm_combine,
                    empty_schema=empty_sch)
    n_total, lo, hi = mm["n"], mm["mn"], mm["mx"]
    if n_total == 0:
        return pd.DataFrame([{"n": np.int64(0), "total": None,
                              "gini": None}])
    if hi <= lo:
        hi = lo + 1.0
    edges = np.linspace(lo, hi, num_buckets + 1)[1:-1]
    counts = _range_bucket_counts(
        narrow, value_col, edges, num_buckets,
        lambda v: v.to_numpy(zero_copy_only=False).astype(np.float64))
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch.column(value_col).drop_null()
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arr = col.to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(edges, arr, side="right").astype(np.int64)
        return pa.table({"c": pa.array(cents_of(col)),
                         "bucket": pa.array(b)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"sr": pd.Series([], dtype="object"),
                                 "t": pd.Series([], dtype="object")})
        off = int(offsets[int(g["bucket"].iloc[0])])
        c = np.sort(g["c"].to_numpy(np.int64))
        rn = np.arange(1, len(c) + 1, dtype=np.int64) + np.int64(off)
        return pd.DataFrame([{"sr": str(_exact_dot_py(rn, c)),
                              "t": str(_exact_dot_py(
                                  np.ones(len(c), dtype=np.int64), c))}])

    parts = (narrow.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas")
             .to_pandas())
    sr = sum(int(x) for x in parts["sr"]) if len(parts) else 0
    t = sum(int(x) for x in parts["t"]) if len(parts) else 0
    total = float(_rh(t / 100.0, 2))
    if t <= 0:
        return pd.DataFrame([{"n": np.int64(n_total), "total": total,
                              "gini": None}])
    gini = float(_rh(float(2 * sr - (n_total + 1) * t)
                     / float(n_total * t), 6))
    return pd.DataFrame([{"n": np.int64(n_total), "total": total,
                          "gini": gini}])
