"""Size-aware parquet reads.

Ray Data's default read heuristic targets ~2×CPU blocks regardless of
input size; on small inputs that turns every downstream shuffle into
O(blocks²) tiny tasks whose scheduling overhead dwarfs the work (a
500-row groupby was 64 blocks → 4096 shuffle tasks).  For small inputs
we override the block count from the on-disk footprint; large inputs
(≥ ``SMALL_INPUT_BYTES`` on disk) keep Ray's own heuristics, which are
what you want on a real multi-node cluster.
"""

from __future__ import annotations

import os
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

# ~4x is a typical parquet→Arrow in-memory expansion for mixed columns
MEM_FACTOR = 4
PARALLEL_BLOCK_BYTES = 1 << 20      # in-memory floor per block when fanning
                                    # out a small input across the pool
SMALL_INPUT_BYTES = 256 << 20       # on-disk; above this, defer to Ray


def _disk_bytes(path) -> int:
    paths = path if isinstance(path, (list, tuple)) else [path]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith((".parquet", ".pq")))
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def read_parquet_sized(path, *, columns=None,
                       parallel_block_bytes: int = PARALLEL_BLOCK_BYTES,
                       **kwargs):
    """``ray.data.read_parquet`` with a block count sized to the input:
    enough blocks to keep the pool busy (capped at 4×CPUs), but never the
    thousands of near-empty blocks Ray's 2×CPU default creates for tiny
    files."""
    import ray
    import ray.data

    disk = _disk_bytes(path)
    if 0 < disk < SMALL_INPUT_BYTES and "override_num_blocks" not in kwargs:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        mem = disk * MEM_FACTOR
        blocks = max(1, min(4 * cpus, mem // parallel_block_bytes))
        kwargs["override_num_blocks"] = int(blocks)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def compact_parquet(in_path, out_dir: str, *,
                    target_file_bytes: int = 128 << 20) -> dict:
    """Small-file compaction: stream a parquet directory through Ray
    and rewrite it as ~``target_file_bytes`` files — the maintenance
    pass every long-running ingest needs (a 100-TB table accreted in
    10k-row increments reads 100× slower through its file-open
    overhead than the same bytes in 128 MB files).

    Contents are preserved exactly (no dedup, no reorder guarantees —
    parquet row order within a file is whatever the stream delivered);
    only the physical layout changes.  The write streams with
    backpressure — nothing materializes beyond Ray's block budget.

    Returns {"rows", "in_files", "out_files", "in_bytes"} so callers
    can log the compaction ratio."""
    import glob as _glob

    import ray.data

    in_bytes = _disk_bytes(in_path)
    in_files = (len(_glob.glob(os.path.join(in_path, "**", "*.parquet"),
                               recursive=True))
                if os.path.isdir(in_path) else 1)
    ds = read_parquet_sized(in_path)
    n_out = max(1, in_bytes // target_file_bytes)
    ds = ds.repartition(int(n_out))
    ds.write_parquet(out_dir)
    out_files = len(_glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                               recursive=True))
    rows = read_parquet_sized(out_dir).count()
    return {"rows": int(rows), "in_files": int(in_files),
            "out_files": int(out_files), "in_bytes": int(in_bytes)}


def write_clustered(ds, key_col: str, out_dir: str, *,
                    num_files: int = 8) -> dict:
    """Range-clustered parquet layout with a zone-map manifest: rows are
    range-partitioned on the EXACT global quantiles of ``key_col``
    (equal-frequency cuts — skew cannot starve or bloat a file), sorted
    within each file, and a ``manifest.json`` records per-file
    (rows, min, max) so ``read_clustered`` can prune files that cannot
    contain a requested key range — the clustering / Z-order-lite
    maintenance pass that turns full scans into bounded reads.

    The write is distributed (each range writes its own file from its
    reduce task) and atomic (tmp dir + rename); re-running replaces the
    layout idempotently.  Null keys land in file 0 and are recorded as
    ``null_rows`` (a range read never matches them).  Partitioning
    assumption: one range ≈ total/num_files rows must fit a worker —
    size ``num_files`` to ~128 MB ranges like ``compact_parquet``.

    Returns the manifest dict."""
    import json
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from packs_ray.functions.profiling import quantile_thresholds

    qs = [i / num_files for i in range(1, num_files)]
    cuts = quantile_thresholds(ds, key_col, qs) if num_files > 1 else []
    cuts = np.asarray(cuts if cuts is not None else [], dtype=np.float64)

    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v = pc.cast(batch.column(key_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        fid = np.searchsorted(cuts, v, side="right").astype(np.int64)
        fid[~np.isfinite(v)] = 0            # nulls/NaN -> file 0
        return batch.append_column("__file", pa.array(fid))

    def write_range(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"file": [], "rows": [],
                                 "null_rows": [], "min": [], "max": []})
        fid = int(g["__file"].iloc[0])
        g = g.drop(columns="__file").sort_values(key_col, kind="stable",
                                                 na_position="first")
        path = os.path.join(tmp, f"part-{fid:05d}.parquet")
        pq.write_table(_table_from_pandas(g, preserve_index=False),
                       path + ".w")
        os.replace(path + ".w", path)
        k = g[key_col].dropna()
        return pd.DataFrame([{
            "file": f"part-{fid:05d}.parquet",
            "rows": len(g), "null_rows": int(len(g) - len(k)),
            "min": float(k.min()) if len(k) else None,
            "max": float(k.max()) if len(k) else None}])

    man_rows = (ds.map_batches(assign, batch_format="pyarrow")
                .groupby("__file")
                .map_groups(write_range, batch_format="pandas")
                .to_pandas())
    if "file" not in man_rows.columns:  # 0-row input: no files written
        man_rows = pd.DataFrame({"file": [], "rows": [],
                                 "null_rows": [], "min": [], "max": []})
    man_rows = man_rows.sort_values("file").reset_index(drop=True)
    manifest = {"key": key_col, "cuts": cuts.tolist(),
                "files": man_rows.to_dict("records")}
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return manifest


def read_clustered(layout_dir: str, lo: float, hi: float, *,
                   columns=None):
    """Zone-map-pruned range read over a ``write_clustered`` layout:
    only files whose [min, max] overlaps [lo, hi] are opened (the
    manifest decides — a driver-side metadata check, no data IO), then
    one residual filter pass bounds the edge files exactly.

    Returns (Dataset, stats) where stats records files_total /
    files_read so callers can assert the pruning actually happened."""
    import json

    import pyarrow as pa

    import ray.data

    with open(os.path.join(layout_dir, "manifest.json")) as f:
        manifest = json.load(f)
    key = manifest["key"]
    picked = [r["file"] for r in manifest["files"]
              if r["min"] is not None
              and not (r["max"] < lo or r["min"] > hi)]
    stats = {"files_total": len(manifest["files"]),
             "files_read": len(picked)}
    if not picked:
        # typed empty result: schema from any layout file, else key-only
        import pandas as pd
        import pyarrow.parquet as pq

        if manifest["files"]:
            sch = pq.read_schema(os.path.join(
                layout_dir, manifest["files"][0]["file"]))
            if columns is not None:
                keep = [c for c in columns if c in sch.names]
                sch = pa.schema([sch.field(c) for c in keep])
            return sch.empty_table().to_pandas(), stats
        return pd.DataFrame({key: pd.Series(dtype="float64")}), stats

    if columns is not None and key not in columns:
        columns = list(columns) + [key]   # residual filter needs it
    ds = ray.data.read_parquet(
        [os.path.join(layout_dir, p) for p in picked], columns=columns)

    def residual(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v = pc.cast(batch.column(key), pa.float64())
        m = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
        return batch.filter(pc.fill_null(m, False))

    return ds.map_batches(residual, batch_format="pyarrow"), stats


def parquet_rowgroup_stats(path: str, columns: list[str]) -> "pd.DataFrame":
    """Zone-map report of a parquet file: per (row_group, column) the
    value count, null count and min/max statistics — the storage
    introspection behind ``clustered_read``'s pruning (this SHOWS the
    zone maps; that USES them).  Run it before choosing a sort/cluster
    key: a column whose row-group ranges all overlap prunes nothing.

    Metadata-only (footer read; zero data pages touched) — at 100 TB
    this is one driver-side footer fetch per file, so wrap per-file
    calls in ``map_batches`` over a file listing for fleets of files.

    Output: (row_group, column, n_values, null_count, min_d, max_d)
    with min/max as doubles rounded 6dp (numeric columns only — the
    caller picks ``columns``), sorted."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from packs_ray.stages.util import round_half_away as _rh

    md = pq.ParquetFile(path).metadata
    want = set(columns)
    rows = []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema not in want:
                continue
            st = c.statistics
            rows.append({
                "row_group": np.int64(g),
                "column": c.path_in_schema,
                "n_values": np.int64(c.num_values),
                "null_count": np.int64(st.null_count)
                if st is not None and st.has_null_count else None,
                "min_d": float(_rh(float(st.min), 6))
                if st is not None and st.has_min_max else None,
                "max_d": float(_rh(float(st.max), 6))
                if st is not None and st.has_min_max else None})
    if not rows:
        return pd.DataFrame({
            "row_group": pd.Series([], dtype="int64"),
            "column": pd.Series([], dtype="object"),
            "n_values": pd.Series([], dtype="int64"),
            "null_count": pd.Series([], dtype="int64"),
            "min_d": pd.Series([], dtype="float64"),
            "max_d": pd.Series([], dtype="float64")})
    return (pd.DataFrame(rows).sort_values(["row_group", "column"])
            .reset_index(drop=True))
