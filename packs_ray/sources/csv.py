"""Size-aware CSV reads (the reference's default input format —
``pack.load_data`` loads CSV/Excel into a DataFrame, e.g.
/root/reference/profiling_pack/main.py:139-147, with ``job.source.skiprows``
honored).

Same block-count sizing rationale as :mod:`packs_ray.sources.parquet`:
small inputs get an explicit block count so downstream shuffles don't fan
into thousands of near-empty tasks; large inputs defer to Ray's own
heuristics.
"""

from __future__ import annotations

from packs_ray.sources.parquet import (
    MEM_FACTOR,
    PARALLEL_BLOCK_BYTES,
    SMALL_INPUT_BYTES,
)


def _disk_bytes(path) -> int:
    import os

    paths = path if isinstance(path, (list, tuple)) else [path]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith(".csv"))
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def read_csv_sized(path, *, skiprows: int = 0, columns=None,
                   parallel_block_bytes: int = PARALLEL_BLOCK_BYTES,
                   **kwargs):
    """``ray.data.read_csv`` with input-sized block count, optional
    ``skiprows`` (the reference's ``job.source.skiprows``) and column
    projection.  CSV in-memory expansion is ~2x (text stays text), so the
    parquet MEM_FACTOR is halved."""
    import ray
    import ray.data
    from pyarrow import csv as pacsv

    disk = _disk_bytes(path)
    if 0 < disk < SMALL_INPUT_BYTES and "override_num_blocks" not in kwargs:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        mem = disk * (MEM_FACTOR // 2)
        blocks = max(1, min(4 * cpus, mem // parallel_block_bytes))
        kwargs["override_num_blocks"] = int(blocks)
    if skiprows:
        kwargs.setdefault("read_options",
                          pacsv.ReadOptions(skip_rows=skiprows))
    # pandas (the reference's loader) reads empty CSV fields as NaN;
    # Arrow keeps them as "" unless told otherwise
    kwargs.setdefault("convert_options",
                      pacsv.ConvertOptions(strings_can_be_null=True))
    ds = ray.data.read_csv(path, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds
