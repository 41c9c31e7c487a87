"""Size-aware JSONL reads/writes — the interchange format LLM data
pipelines actually ship (one JSON object per line; HF datasets, CC
derivatives, fine-tune files).  The reference has no JSON source (its
``pack.load_data`` handles CSV/Excel/database); this closes the gap the
same way :mod:`packs_ray.sources.csv` does for CSV.

Same block-count sizing rationale as :mod:`packs_ray.sources.parquet`:
small inputs get an explicit block count so downstream shuffles don't
fan into thousands of near-empty tasks; large inputs defer to Ray's own
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
                             for f in files
                             if f.endswith((".jsonl", ".json")))
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def read_jsonl_sized(path, *, columns=None,
                     parallel_block_bytes: int = PARALLEL_BLOCK_BYTES,
                     **kwargs):
    """``ray.data.read_json`` (newline-delimited) with input-sized block
    count and column projection.  JSONL in-memory expansion is ~2x (text
    stays text, keys drop), so the parquet MEM_FACTOR is halved."""
    import ray
    import ray.data

    disk = _disk_bytes(path)
    if 0 < disk < SMALL_INPUT_BYTES and "override_num_blocks" not in kwargs:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        mem = disk * (MEM_FACTOR // 2)
        blocks = max(1, min(4 * cpus, mem // parallel_block_bytes))
        kwargs["override_num_blocks"] = int(blocks)
    ds = ray.data.read_json(path, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds, out_dir: str) -> None:
    """Partitioned JSONL sink (one file per block — resumable /
    re-readable in parallel, never one giant file)."""
    ds.write_json(out_dir)
