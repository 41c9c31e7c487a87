"""Timeliness checks (pinned-now; the reference's wall-clock dependence
is made deterministic via an explicit ``now`` parameter).

Reference: timeliness_pack/main.py:64-67 (score = max(0, 1 -
days_since_latest/365)), :224-250 (dataset = mean of column scores).
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def staleness(paths: list[str], now: _dt.datetime) -> pd.DataFrame:
    """Days since each input file was last modified
    (timeliness_pack/main.py:150-187 file/folder mtime semantics, with
    ``now`` pinned instead of wall-clock).  Pure input-manifest metadata —
    at scale this is one stat() per fragment, no data read."""
    import os

    rows = []
    for p in sorted(paths):
        mtime = _dt.datetime.fromtimestamp(os.path.getmtime(p))
        days = (now - mtime).days
        rows.append({"path": os.path.basename(p),
                     "days_since_modified": days,
                     "staleness_score": float(_r(max(0.0, 1 - days / 365), 2))})
    return pd.DataFrame(rows)


#: the reference's 10 string-date regexes (timeliness_pack/main.py:28-39)
_DATE_PATTERNS = (
    r"^\d{4}-\d{2}-\d{2}$", r"^\d{4}/\d{2}/\d{2}$", r"^\d{2}-\d{2}-\d{4}$",
    r"^\d{2}/\d{2}/\d{4}$", r"^\d{2}-\d{2}-\d{4}$", r"^\d{2}/\d{2}/\d{4}$",
    r"^\d{4}\.\d{2}\.\d{2}$", r"^\d{2}\.\d{2}\.\d{4}$", r"^\d{2}\.\d{2}\.\d{4}$",
    r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$",
)


def sniff_date_type(values, now: _dt.datetime) -> str | None:
    """Replicates is_date over a sample (timeliness_pack/main.py:26-61,
    with ``now`` pinned instead of datetime.now()): 'year_only' for
    4-digit years 1900..now.year, 'date' if any sample value matches a
    date regex AND dateutil-parses, else None."""
    import re

    from dateutil.parser import parse as _parse

    kinds: set = set()
    for v in values:
        s = str(v)
        if re.match(r"^\d{4}$", s):
            kinds.add("year_only" if 1900 <= int(s) <= now.year else False)
        elif any(re.match(p, s) for p in _DATE_PATTERNS):
            try:
                _parse(s)
                kinds.add(True)
            except ValueError:
                kinds.add(False)
        else:
            kinds.add(False)
    if "year_only" in kinds:
        return "year_only"
    return "date" if True in kinds else None


def _safe_to_datetime(series: pd.Series) -> pd.Series:
    """The reference's mixed-format coercion ladder
    (timeliness_pack/main.py:74-83)."""
    try:
        return pd.to_datetime(series, errors="coerce", format="mixed")
    except Exception:
        try:
            return pd.to_datetime(series, errors="coerce", dayfirst=True)
        except Exception:
            return pd.to_datetime(series, errors="coerce")


def timeliness_sniffed(ds, columns: list[str], now: _dt.datetime,
                       sample_rows: int = 1000) -> pd.DataFrame:
    """Timeliness over STRING/INT candidate columns: the date type is
    sniffed from the first <=10 unique values of a head sample (reference
    samples 10 uniques, timeliness_pack/main.py:115-118 — here from the
    first ``sample_rows`` rows so the sniff never scans the dataset), then

    - 'year_only' columns aggregate int min/max year; latest_ts is pinned
      to Jan 1 of the latest year (the reference's external aggregator is
      not public; this convention is ours and documented);
    - 'date' columns run the mixed-format ``to_datetime`` coercion ladder
      per batch and max-aggregate the parsed timestamps.

    Non-date columns are skipped (reference ``continue``)."""
    sample = ds.select_columns(columns).limit(sample_rows).to_pandas()
    plan: dict[str, str] = {}
    for c in columns:
        if c not in sample.columns:  # 0-row input loses mapped columns
            continue
        vals = sample[c].dropna().unique()[:10]
        kind = sniff_date_type(vals, now)
        if kind:
            plan[c] = kind

    if not plan:
        return pd.DataFrame(columns=["column", "latest_ts",
                                     "days_since_latest", "timeliness_score"])

    def partial(batch: pa.Table) -> dict:
        d = {}
        for c, kind in plan.items():
            ser = batch.column(c).to_pandas()
            if kind == "year_only":
                yr = ser.dropna().astype(int)
                d[f"max_{c}"] = int(yr.max()) if len(yr) else None
            else:
                conv = _safe_to_datetime(ser)
                mx = conv.max()
                d[f"max_{c}"] = None if pd.isnull(mx) else mx
        return d

    def combine(p: pd.DataFrame) -> dict:
        return {c: p[f"max_{c}"].max() for c in plan}

    agg = global_agg(ds, partial, combine)
    rows = []
    for c, kind in plan.items():
        latest = agg[c]
        if latest is None or pd.isnull(latest):
            continue
        if kind == "year_only":
            latest = pd.Timestamp(year=int(latest), month=1, day=1)
        days = (now - latest).days
        rows.append({"column": c, "latest_ts": latest,
                     "days_since_latest": days,
                     "timeliness_score": float(_r(max(0.0, 1 - days / 365), 2))})
    return _us_ts(pd.DataFrame(rows))


def _us_ts(df: pd.DataFrame) -> pd.DataFrame:
    """Emit timestamps at microsecond precision (the parquet/SQL norm)
    rather than pandas' default ns, so downstream hashes are stable."""
    if "latest_ts" in df.columns and len(df):
        df["latest_ts"] = pd.to_datetime(df["latest_ts"]).astype("datetime64[us]")
    return df


def timeliness(ds, ts_cols: list[str], now: _dt.datetime) -> pd.DataFrame:
    """Per ts column: latest value, whole days since, score (2dp)."""

    def partial(batch: pa.Table) -> dict:
        return {f"max_{c}": pc.max(batch.column(c)).as_py() for c in ts_cols}

    def combine(p: pd.DataFrame) -> dict:
        return {c: p[f"max_{c}"].max() for c in ts_cols}

    agg = global_agg(ds, partial, combine)
    rows = []
    for c in ts_cols:
        latest = agg[c]
        if latest is not None and pd.isnull(latest):
            latest = None  # all-null / 0-row column aggregates to NaN
        days = (now - latest).days if latest is not None else None
        score = max(0.0, 1 - days / 365) if days is not None else 0.0
        rows.append({"column": c, "latest_ts": latest, "days_since_latest": days,
                     "timeliness_score": float(_r(score, 2))})
    return _us_ts(pd.DataFrame(rows))


def day_gaps(ds, key_col: str, ts_col: str,
             num_buckets: int | None = None):
    """Per-key calendar-day coverage: which keys have HOLES in their
    daily event stream?  The feed-continuity screen (a day with zero
    events usually means an ingestion outage, not real silence) — the
    timeliness_pack's freshness idea applied inside the observed span
    instead of only at its end.

    day = epoch_ms // 86,400,000 (UTC bucket, the house convention).
    Output per key: (key, n_days, span_days, n_missing_days,
    max_gap_days) ordered by key, where span = max-min+1,
    missing = span - n_days and max_gap = the longest run of absent
    days between two present days (0 when fully contiguous).  Null
    key/ts rows drop.

    Scale shape: per-batch LOCAL (key, day) dedup combiner, then only
    distinct day marks (16 B) shuffle once on hash(key); per-bucket
    work is one sort + vectorized diff."""
    import numpy as np

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_buckets is None:
        num_buckets = row_shuffle_partitions(ds)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, ts_col])
        mask = pc.and_(batch.column(key_col).is_valid(),
                       batch.column(ts_col).is_valid())
        batch = batch.filter(mask)
        us = pc.cast(batch.column(ts_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = us // np.int64(86_400_000_000)
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({"k": key, "day": day}).drop_duplicates()
        h = pd.util.hash_array(d["k"].to_numpy())
        return pa.table({
            key_col: pa.array(d["k"].to_numpy()),
            "day": pa.array(d["day"].to_numpy(np.int64)),
            "bucket": pa.array((h % np.uint64(num_buckets))
                               .astype(np.int64))})

    empty = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                          **{c: pd.Series([], dtype="int64")
                             for c in ("n_days", "span_days",
                                       "n_missing_days", "max_gap_days")}})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        g = g.drop_duplicates([key_col, "day"]) \
            .sort_values([key_col, "day"], kind="stable") \
            .reset_index(drop=True)
        k = g[key_col].to_numpy()
        day = g["day"].to_numpy(np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = k[1:] == k[:-1]
        gap = np.where(same, day - np.roll(day, 1) - 1, 0)
        gg = pd.DataFrame({key_col: k, "day": day, "gap": gap})
        out = (gg.groupby(key_col, sort=False)
               .agg(n_days=("day", "size"), mn=("day", "min"),
                    mx=("day", "max"), max_gap_days=("gap", "max"))
               .reset_index())
        out["span_days"] = out["mx"] - out["mn"] + 1
        out["n_missing_days"] = out["span_days"] - out["n_days"]
        for c in ("n_days", "span_days", "n_missing_days",
                  "max_gap_days"):
            out[c] = out[c].astype("int64")
        return out[[key_col, "n_days", "span_days", "n_missing_days",
                    "max_gap_days"]]

    ds2 = ds.map_batches(marks, batch_format="pyarrow")
    return ds2.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas") \
        .sort(key_col)


def novelty_rate(ds, key_cols: list[str], ts_col: str,
                 num_partitions: int | None = None):
    """Per-day first-seen novelty of a keyed event stream: for each
    UTC day, how many events arrived and how many of them introduced a
    key never seen before — the crawl-freshness signal (a feed whose
    novelty ratio decays to zero is re-serving old content; a spike is
    a new source coming online).  Extends the timeliness_pack's
    freshness idea (timeliness_pack/main.py:107-112 tracks only the
    newest timestamp) to the full arrival curve.

    day = epoch_us // 86_400_000_000 (the house UTC bucket, as
    ``day_gaps``).  Rows with a null ts or any null key column drop
    from both counts.  Output: (day, n_events, n_first, novelty_ratio)
    ordered by day, ratio 6dp-pinned.

    Scale shape: per-batch (key..., min day) combiner marks ride ONE
    bucketed reduce on hash(key) for the exact global first-day per
    key; day totals are a ``keyed_count`` over the derived day column.
    Only per-day count rows (bounded by the observed day span) land on
    the driver."""
    import numpy as np

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         keyed_count,
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
        df["day"] = us // np.int64(86_400_000_000)
        out = (df.groupby(key_cols, sort=False)["day"].min()
               .reset_index())
        return _table_from_pandas(out, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = (g.groupby(key_cols, sort=False)["day"].min())
        cnt = first.value_counts().sort_index()
        return pd.DataFrame({"day": cnt.index.to_numpy(np.int64),
                             "n_first": cnt.to_numpy(np.int64)})

    firsts = bucketed_group_reduce(
        ds.map_batches(marks, batch_format="pyarrow"), key_cols,
        per_bucket, num_partitions).to_pandas()
    if len(firsts):
        firsts = (firsts.groupby("day", sort=True)["n_first"].sum()
                  .reset_index())

    def day_col(batch: pa.Table) -> pa.Table:
        mask = batch.column(ts_col).is_valid()
        for c in key_cols:
            mask = pc.and_(mask, batch.column(c).is_valid())
        us = pc.cast(pc.cast(batch.filter(mask).column(ts_col),
                             pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(
            us // np.int64(86_400_000_000), type=pa.int64())})

    totals = keyed_count(
        ds.select_columns(key_cols + [ts_col])
        .map_batches(day_col, batch_format="pyarrow"),
        ["day"], count_col="n_events").to_pandas()
    if not len(totals):
        return pd.DataFrame({
            "day": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "n_first": pd.Series([], dtype="int64"),
            "novelty_ratio": pd.Series([], dtype="float64")})
    out = totals.merge(firsts, on="day", how="left") \
        if len(firsts) else totals.assign(n_first=0)
    out["n_first"] = out["n_first"].fillna(0).astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["day"] = out["day"].astype(np.int64)
    out["novelty_ratio"] = _rh(
        out["n_first"].to_numpy(np.float64)
        / out["n_events"].to_numpy(np.float64), 6)
    return out.sort_values("day", kind="stable").reset_index(drop=True)


def out_of_order_profile(ds, seq_col: str, ts_col: str, *,
                         bucket_size: int = 100_000) -> "pd.DataFrame":
    """Late-data / watermark diagnostic of an ingest stream: reading
    rows in ``seq_col`` (arrival) order, how often does event time run
    BACKWARD past the high-watermark, and by how much?  The number
    that sizes streaming-window allowed-lateness and decides whether
    an append-only contract (e.g. :func:`windows.sessionize_incremental`)
    actually holds on a feed.

    lateness(i) = max(ts[j] for j arriving before or at i) − ts[i]; a
    row is LATE when lateness > 0.  Exact two-pass prefix-max: arrival
    order is range-bucketed on ``seq_col`` (contiguous id ranges), each
    bucket computes its internal running max and reports its own max;
    the driver folds the bounded per-bucket maxima into exclusive
    prefix carries, and a second vectorized pass applies them — no
    global sort, no sequential scan.

    Output: one row per UTC day (of event ts) — (day, n_events,
    n_late, max_lateness_s, late_ratio 6dp), ordered by day; null
    seq/ts rows drop."""
    import numpy as np
    import pandas as pd

    from packs_ray.stages.util import round_half_away as _rh

    def marks(batch: pa.Table) -> pa.Table:
        t = batch.select([seq_col, ts_col])
        mask = pc.and_(t.column(seq_col).is_valid(),
                       t.column(ts_col).is_valid())
        t = t.filter(mask)
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        seq = t.column(seq_col).cast(pa.int64())
        return pa.table({"seq": seq, "us": us})

    nar = ds.map_batches(marks, batch_format="pyarrow").materialize()
    cols = ["day", "n_events", "n_late", "max_lateness_s", "late_ratio"]
    if nar.count() == 0:
        return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                             "n_events": pd.Series([], dtype="int64"),
                             "n_late": pd.Series([], dtype="int64"),
                             "max_lateness_s": pd.Series([], dtype="int64"),
                             "late_ratio": pd.Series([], dtype="float64")})

    bs = int(bucket_size)

    def pass1(batch: pa.Table) -> pa.Table:
        seq = batch.column("seq").to_numpy(zero_copy_only=False)
        us = batch.column("us").to_numpy(zero_copy_only=False)
        b = seq // bs
        g = (pd.DataFrame({"b": b, "us": us}).groupby("b", sort=False)
             ["us"].max().reset_index(name="mx"))
        return _table_from_pandas(g, preserve_index=False)

    bmax = nar.map_batches(pass1, batch_format="pyarrow").to_pandas()
    bmax = bmax.groupby("b", sort=True)["mx"].max()
    # exclusive prefix maxima over the bounded bucket index
    carry = {}
    run = np.iinfo(np.int64).min
    for b, mx in bmax.items():
        carry[int(b)] = run
        run = max(run, int(mx))
    import ray as _ray

    carry_ref = _ray.put(carry)

    def pass2(batch: pa.Table) -> pa.Table:
        cr = _ray.get(carry_ref)
        df = pd.DataFrame({
            "seq": batch.column("seq").to_numpy(zero_copy_only=False),
            "us": batch.column("us").to_numpy(zero_copy_only=False)})
        df = df.sort_values("seq", kind="stable")
        out_parts = []
        for b, g in df.groupby(df["seq"].to_numpy(np.int64) // bs,
                               sort=True):
            us = g["us"].to_numpy(np.int64)
            # NOTE: exactness of the in-bucket running max requires
            # each bucket's rows to be together — the materialized
            # narrow table is re-bucketed below via groupby to
            # guarantee it
            run = np.maximum.accumulate(us)
            wm = np.maximum(run, np.int64(cr.get(int(b),
                                                 np.iinfo(np.int64).min)))
            late_us = wm - us
            day = us // np.int64(86_400_000_000)
            out_parts.append(pd.DataFrame({
                "day": day,
                "late": (late_us > 0).astype(np.int64),
                "lat_s": late_us // np.int64(1_000_000)}))
        o = pd.concat(out_parts, ignore_index=True)
        g = (o.groupby("day", sort=False)
             .agg(n_events=("late", "size"), n_late=("late", "sum"),
                  max_lateness_s=("lat_s", "max")).reset_index())
        return _table_from_pandas(g, preserve_index=False)

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    def add_b(batch: pa.Table) -> pa.Table:
        seq = batch.column("seq").to_numpy(zero_copy_only=False)
        return batch.append_column("bkt", pa.array(
            (seq // bs).astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = _table_from_pandas(g[["seq", "us"]], preserve_index=False)
        return pass2(t).to_pandas()

    daily = bucketed_group_reduce(
        nar.map_batches(add_b, batch_format="pyarrow"), ["bkt"],
        per_bucket, reduce_partition_count(nar)).to_pandas()
    daily = (daily.groupby("day", sort=True)
             .agg(n_events=("n_events", "sum"), n_late=("n_late", "sum"),
                  max_lateness_s=("max_lateness_s", "max"))
             .reset_index())
    daily["late_ratio"] = _rh(
        daily["n_late"].to_numpy(np.float64)
        / daily["n_events"].to_numpy(np.float64), 6)
    return daily[cols].astype({
        "day": "int64", "n_events": "int64", "n_late": "int64",
        "max_lateness_s": "int64", "late_ratio": "float64"})


def null_burst_profile(ds, seq_col: str, col: str, *,
                       bucket_size: int = 100_000) -> "pd.DataFrame":
    """Null-burst (upstream-outage) detector: in arrival order
    (``seq_col``), find maximal runs of consecutive rows whose ``col``
    is null — scattered nulls are entry noise, but a 500-row null BURST
    is a dead sensor / broken join upstream, and column-level
    completeness (which only counts) cannot tell the two apart.

    Exact distributed run-length: rows are range-bucketed on
    ``seq_col`` (contiguous id ranges); each bucket reports its
    leading-run length, trailing-run length, interior burst count/max
    and null/row totals; the driver folds the bounded bucket summaries
    ascending, stitching runs that touch bucket boundaries (all-null
    buckets chain through).  Adjacency is by sort position within the
    ``seq_col`` order.

    Output: one row — (n_rows, n_null, n_bursts, max_burst,
    mean_burst 6dp); mean_burst = n_null / n_bursts, null when no
    bursts."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _rh

    bs = int(bucket_size)

    def marks(batch: pa.Table) -> pa.Table:
        t = batch.select([seq_col, col])
        t = t.filter(t.column(seq_col).is_valid())
        seq = t.column(seq_col).cast(pa.int64())
        isnull = pc.cast(pc.is_null(t.column(col)), pa.int8())
        out = pa.table({"seq": seq, "nl": isnull})
        return out.append_column("bkt", pc.divide(
            out.column("seq"), pa.scalar(bs, type=pa.int64())))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, gg in g.groupby("bkt", sort=True):
            gg = gg.sort_values("seq", kind="stable")
            nl = gg["nl"].to_numpy(np.int8).astype(bool)
            n = len(nl)
            if n == 0:
                continue
            # run-length encode
            change = np.flatnonzero(np.diff(nl.astype(np.int8)) != 0)
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [n]))
            lens = ends - starts
            vals = nl[starts]
            null_lens = lens[vals]
            lead = int(lens[0]) if vals[0] else 0
            trail = int(lens[-1]) if vals[-1] else 0
            all_null = bool(nl.all())
            interior = null_lens
            rows.append({
                "bkt": np.int64(b), "n": np.int64(n),
                "n_null": np.int64(int(nl.sum())),
                "n_runs": np.int64(len(null_lens)),
                "max_run": np.int64(int(null_lens.max())
                                    if len(null_lens) else 0),
                "lead": np.int64(lead), "trail": np.int64(trail),
                "all_null": np.int64(1 if all_null else 0)})
        if not rows:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ["bkt", "n", "n_null",
                                           "n_runs", "max_run", "lead",
                                           "trail", "all_null"]})
        return pd.DataFrame(rows)

    parts = bucketed_group_reduce(
        ds.map_batches(marks, batch_format="pyarrow"), ["bkt"],
        per_bucket, reduce_partition_count(ds)).to_pandas()
    cols = ["n_rows", "n_null", "n_bursts", "max_burst", "mean_burst"]
    if not len(parts):
        return pd.DataFrame([{**dict.fromkeys(cols),
                              "n_rows": np.int64(0),
                              "n_null": np.int64(0),
                              "n_bursts": np.int64(0),
                              "max_burst": np.int64(0)}])[cols]
    parts = parts.sort_values("bkt").reset_index(drop=True)
    n_rows = int(parts["n"].sum())
    n_null = int(parts["n_null"].sum())
    n_bursts = int(parts["n_runs"].sum())
    max_burst = int(parts["max_run"].max()) if len(parts) else 0
    # stitch boundary runs ascending: carry the running open-run length
    open_run = 0
    for _, r in parts.iterrows():
        if open_run > 0 and r["lead"] > 0:
            # the carried run and this bucket's leading run are ONE
            # burst: uncount one junction
            n_bursts -= 1
            merged = open_run + int(r["lead"])
            if int(r["all_null"]):
                open_run = merged            # chains to the next bucket
            else:
                open_run = int(r["trail"])
            max_burst = max(max_burst, merged)
        else:
            open_run = int(r["trail"]) if not int(r["all_null"]) \
                else int(r["n"]) if open_run == 0 else open_run + int(r["n"])
    mean = None
    if n_bursts > 0:
        mean = float(_rh(n_null / (n_bursts * 1.0), 6))
    return pd.DataFrame([{
        "n_rows": np.int64(n_rows), "n_null": np.int64(n_null),
        "n_bursts": np.int64(n_bursts),
        "max_burst": np.int64(max_burst), "mean_burst": mean}])[cols]
