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
