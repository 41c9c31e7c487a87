"""Kaplan-Meier survival analysis over keyed event streams.

Retention / lifetime analysis is the missing tail of the timeliness
family: the reference's timeliness_pack tracks only per-column newest
timestamps (timeliness_pack/main.py:107-112); a training-data feed
additionally needs "how long do keys stay alive" — user retention,
crawl-source lifetime, conversation longevity — with the stock
statistical answer being the Kaplan-Meier product-limit estimator
under right-censoring (keys still active at the end of the
observation window have an unknown full lifetime and must not be
counted as churned).

Determinism contract (drives the DuckDB oracle):

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
  bit-identical folds, so the 6dp pin is cosmetic, not load-bearing.

Scale shape: per-batch (key, min_ts, max_ts) combiner marks ride ONE
bucketed reduce on hash(key); only the per-lifetime step table
(bounded by the observed day span, not the key cardinality) lands on
the driver, where the KM fold is O(steps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_DAY_US = np.int64(86_400_000_000)


def _empty() -> pd.DataFrame:
    return pd.DataFrame({
        "duration_d": pd.Series([], dtype="int64"),
        "n_risk": pd.Series([], dtype="int64"),
        "n_event": pd.Series([], dtype="int64"),
        "n_censored": pd.Series([], dtype="int64"),
        "survival": pd.Series([], dtype="float64")})


def survival_curve(ds, key_cols: list[str], ts_col: str, *,
                   censor_horizon_days: int = 7,
                   num_partitions: int | None = None) -> pd.DataFrame:
    """Kaplan-Meier survival of key lifetimes (see module docstring).

    Emits one row per distinct lifetime that has at least one churn
    event: (duration_d, n_risk, n_event, n_censored, survival),
    ascending duration, survival 6dp-pinned.  Rows with a null ts or
    any null key column are dropped before the span computation.
    """
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _rh

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

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
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(key_cols, sort=False).agg(
            first_us=("first_us", "min"), last_us=("last_us", "max"))
        return pa.Table.from_pandas(gg.reset_index(),
                                    preserve_index=False).to_pandas()

    spans = bucketed_group_reduce(
        ds.map_batches(marks, batch_format="pyarrow"), key_cols,
        per_bucket, num_partitions).to_pandas()
    if not len(spans):
        return _empty()

    first = spans["first_us"].to_numpy(np.int64)
    last = spans["last_us"].to_numpy(np.int64)
    dur = (last - first) // _DAY_US
    horizon_us = np.int64(censor_horizon_days) * _DAY_US
    observed = (np.int64(last.max()) - last) > horizon_us

    # bounded step table: per distinct lifetime, churn/censor counts
    steps = (pd.DataFrame({"duration_d": dur,
                           "n_event": observed.astype(np.int64),
                           "n_censored": (~observed).astype(np.int64)})
             .groupby("duration_d", sort=True).sum().reset_index())
    total = np.int64(len(spans))
    leaving = (steps["n_event"] + steps["n_censored"]).to_numpy(np.int64)
    n_risk = total - np.concatenate(([np.int64(0)],
                                     np.cumsum(leaving)[:-1]))
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
