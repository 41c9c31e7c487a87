"""Kaplan-Meier survival analysis over keyed event streams.

Retention / lifetime analysis is the missing tail of the timeliness
family: the reference's timeliness_pack tracks only per-column newest
timestamps (timeliness_pack/main.py:107-112); a training-data feed
additionally needs "how long do keys stay alive" — user retention,
crawl-source lifetime, conversation longevity — with the stock
statistical answer being the Kaplan-Meier product-limit estimator
under right-censoring (keys still active at the end of the
observation window have an unknown full lifetime and must not be
counted as churned), plus the log-rank test to compare two cohorts'
survival exactly.

Determinism contract (drives the DuckDB oracles):

- lifetime = (last_ts - first_ts) in whole UTC days (integer floor of
  the microsecond span / 86_400_000_000);
- a key is OBSERVED (churned) when the global max timestamp is more
  than ``censor_horizon_days`` past its last event, else right-censored;
- at each distinct lifetime t (ascending): n_event = churned keys with
  lifetime t, n_censored = censored keys with lifetime t, n_risk =
  keys with lifetime >= t (deaths at t happen before censoring at t,
  the standard KM convention);
- survival(t) = left-fold product of (n_risk - n_event) / n_risk over
  event times <= t.  The fold is sequential ascending-t float64
  multiplication — ``np.cumprod`` here, ``list_product(list(term)
  OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))`` in DuckDB — verified
  bit-identical folds, so the 6dp pin is cosmetic, not load-bearing;
- log-rank sums fold left in ascending event time (a Python float
  loop here == ``list_sum(list(term ORDER BY t))`` in the oracle).

Scale shape: per-batch (key, min_ts, max_ts) combiner marks ride ONE
bucketed reduce on hash(key); the per-key span Dataset NEVER lands on
the driver — the global max and total are Dataset aggregates, and a
second narrow reduce collapses spans to the per-lifetime step table
(bounded by the observed day span, not the key cardinality), where
the KM / log-rank folds are O(steps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

_DAY_US = np.int64(86_400_000_000)


def _empty() -> pd.DataFrame:
    return pd.DataFrame({
        "duration_d": pd.Series([], dtype="int64"),
        "n_risk": pd.Series([], dtype="int64"),
        "n_event": pd.Series([], dtype="int64"),
        "n_censored": pd.Series([], dtype="int64"),
        "survival": pd.Series([], dtype="float64")})


def _span_dataset(ds, key_cols: list[str], ts_col: str,
                  num_partitions: int | None):
    """(key..., first_us, last_us) Dataset: per-batch combiner marks,
    one bucketed reduce on hash(key).  Null key/ts rows drop."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select(key_cols + [ts_col])
        mask = batch.column(ts_col).is_valid()
        for c in key_cols:
            mask = pc.and_(mask, batch.column(c).is_valid())
        batch = batch.filter(mask)
        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({c: batch.column(c).to_numpy(
            zero_copy_only=False) for c in key_cols})
        df["first_us"] = us
        df["last_us"] = us
        g = df.groupby(key_cols, sort=False).agg(
            first_us=("first_us", "min"), last_us=("last_us", "max"))
        return _table_from_pandas(g.reset_index(), preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(key_cols, sort=False).agg(
            first_us=("first_us", "min"), last_us=("last_us", "max"))
        return gg.reset_index()

    parts = ds.map_batches(marks, batch_format="pyarrow")
    if num_partitions is None:
        num_partitions = reduce_partition_count(parts)
    return bucketed_group_reduce(parts, key_cols, per_bucket,
                                 num_partitions).materialize()


def _step_table(spans_ds, gmax_us: int,
                censor_horizon_days: int) -> pd.DataFrame:
    """Collapse a span Dataset to the bounded per-lifetime step table
    (duration_d, n_event, n_censored), ascending — per-batch count
    partials, one driver sum over the (days-span-bounded) partials."""
    horizon_us = int(censor_horizon_days) * int(_DAY_US)

    def partial(batch: pa.Table) -> pa.Table:
        first = batch.column("first_us").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        last = batch.column("last_us").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dur = (last - first) // _DAY_US
        obs = (np.int64(gmax_us) - last) > np.int64(horizon_us)
        out = (pd.DataFrame({"duration_d": dur,
                             "n_event": obs.astype(np.int64),
                             "n_censored": (~obs).astype(np.int64)})
               .groupby("duration_d", sort=False).sum().reset_index())
        return _table_from_pandas(out, preserve_index=False)

    parts = spans_ds.map_batches(partial,
                                 batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"duration_d": pd.Series([], dtype="int64"),
                             "n_event": pd.Series([], dtype="int64"),
                             "n_censored": pd.Series([], dtype="int64")})
    return (parts.groupby("duration_d", sort=True).sum().reset_index()
            .astype("int64"))


def survival_curve(ds, key_cols: list[str], ts_col: str, *,
                   censor_horizon_days: int = 7,
                   num_partitions: int | None = None) -> pd.DataFrame:
    """Kaplan-Meier survival of key lifetimes (see module docstring).

    Emits one row per distinct lifetime that has at least one churn
    event: (duration_d, n_risk, n_event, n_censored, survival),
    ascending duration, survival 6dp-pinned.  Rows with a null ts or
    any null key column are dropped before the span computation.
    """
    from packs_ray.stages.util import round_half_away as _rh

    spans = _span_dataset(ds, key_cols, ts_col, num_partitions)
    total = spans.count()
    if total == 0:
        return _empty()
    gmax = int(spans.max("last_us"))
    steps = _step_table(spans, gmax, censor_horizon_days)

    leaving = (steps["n_event"] + steps["n_censored"]).to_numpy(np.int64)
    n_risk = np.int64(total) - np.concatenate(
        ([np.int64(0)], np.cumsum(leaving)[:-1]))
    steps["n_risk"] = n_risk
    # KM fold: sequential ascending-duration cumprod (== the oracle's
    # list_product left fold, bit-for-bit)
    term = (n_risk - steps["n_event"].to_numpy(np.int64)) / (n_risk * 1.0)
    steps["survival"] = _rh(np.cumprod(term), 6)
    out = steps[steps["n_event"] > 0].reset_index(drop=True)
    if not len(out):
        return _empty()
    return out[["duration_d", "n_risk", "n_event", "n_censored",
                "survival"]].astype(
        {"duration_d": "int64", "n_risk": "int64", "n_event": "int64",
         "n_censored": "int64", "survival": "float64"})


def logrank_test(ds_a, ds_b, key_cols: list[str], ts_col: str, *,
                 censor_horizon_days: int = 7,
                 num_partitions: int | None = None) -> pd.DataFrame:
    """Two-cohort log-rank test on key lifetimes: do cohort A's keys
    churn on a different schedule than cohort B's?  The standard
    companion to :func:`survival_curve` (Mantel 1966): at each pooled
    event time t with d_t total churns and n_at / n_t at-risk counts,

        O_a += d_at,   E_a += d_t * n_at / n_t,
        V   += d_t * (n_at/n_t) * (1 - n_at/n_t) * (n_t - d_t) / (n_t - 1),

    chi2 = (O_a - E_a)^2 / V  (1 dof).  Censoring uses the POOLED
    observation end (max last_ts across both cohorts), so a cohort
    that simply stops earlier reads as censored, not churned.

    Float parity: E_a and V accumulate in a sequential ascending-t
    Python-float loop — the oracle's ``list_sum(list(term ORDER BY
    t))`` left fold.  All counts are exact ints.

    Output: one row (n_a, n_b, o_a, e_a, o_b, e_b, chi2), floats
    6dp-pinned; chi2 null when V == 0 (no comparable event times)."""
    from packs_ray.stages.util import round_half_away as _rh

    spans_a = _span_dataset(ds_a, key_cols, ts_col, num_partitions)
    spans_b = _span_dataset(ds_b, key_cols, ts_col, num_partitions)
    n_a, n_b = spans_a.count(), spans_b.count()
    if n_a == 0 or n_b == 0:
        return pd.DataFrame([{
            "n_a": np.int64(n_a), "n_b": np.int64(n_b),
            "o_a": np.int64(0), "e_a": None, "o_b": np.int64(0),
            "e_b": None, "chi2": None}])
    gmax = max(int(spans_a.max("last_us")), int(spans_b.max("last_us")))
    st_a = _step_table(spans_a, gmax, censor_horizon_days)
    st_b = _step_table(spans_b, gmax, censor_horizon_days)

    def with_risk(st: pd.DataFrame, total: int) -> pd.DataFrame:
        leaving = (st["n_event"] + st["n_censored"]).to_numpy(np.int64)
        st = st.copy()
        st["n_risk"] = np.int64(total) - np.concatenate(
            ([np.int64(0)], np.cumsum(leaving)[:-1]))
        return st

    st_a, st_b = with_risk(st_a, n_a), with_risk(st_b, n_b)
    merged = (st_a.set_index("duration_d")[["n_event", "n_risk"]]
              .rename(columns={"n_event": "da", "n_risk": "ra"})
              .join(st_b.set_index("duration_d")[["n_event", "n_risk"]]
                    .rename(columns={"n_event": "db", "n_risk": "rb"}),
                    how="outer").sort_index())
    # a duration present in only one cohort: the other cohort's risk
    # set there = its risk after all earlier leavers = next row's
    # n_risk looking back; fill by backward offset from cumulative
    # leavers instead of ffill to stay exact
    for side, st, total in (("a", st_a, n_a), ("b", st_b, n_b)):
        dcol, rcol = f"d{side}", f"r{side}"
        merged[dcol] = merged[dcol].fillna(0).astype(np.int64)
        if merged[rcol].isna().any():
            durs = merged.index.to_numpy(np.int64)
            leav = (st["n_event"] + st["n_censored"]).to_numpy(np.int64)
            edges = st["duration_d"].to_numpy(np.int64)
            cum = np.concatenate(([np.int64(0)], np.cumsum(leav)))
            # keys at risk at time t = total - leavers with duration < t
            idx = np.searchsorted(edges, durs, side="left")
            merged[rcol] = np.int64(total) - cum[idx]
        merged[rcol] = merged[rcol].astype(np.int64)

    o_a = int(merged["da"].sum())
    o_b = int(merged["db"].sum())
    e_a = e_b = v = 0.0
    for _, row in merged[(merged["da"] + merged["db"]) > 0].iterrows():
        dt = float(row["da"] + row["db"])
        nt = float(row["ra"] + row["rb"])
        if nt <= 0:
            continue
        pa_ = row["ra"] / nt
        e_a += dt * pa_
        e_b += dt * (row["rb"] / nt)
        if nt > 1:
            v += dt * pa_ * (1.0 - pa_) * (nt - dt) / (nt - 1.0)
    chi2 = None
    if v > 0:
        d = o_a - e_a
        chi2 = float(_rh(d * d / v, 6))
    return pd.DataFrame([{
        "n_a": np.int64(n_a), "n_b": np.int64(n_b),
        "o_a": np.int64(o_a), "e_a": float(_rh(e_a, 6)),
        "o_b": np.int64(o_b), "e_b": float(_rh(e_b, 6)),
        "chi2": chi2}])
