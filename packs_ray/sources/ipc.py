"""Arrow IPC / Feather (v2) source + partitioned sink.

Ray Data ships no IPC reader; pyarrow's does the decoding here.  The
driver opens each file for METADATA only (record-batch count — a
footer read of the IPC file format), then fans one Ray task per
record-batch range so the buffers are memory-mapped and decoded
remotely, in parallel.  Column pruning happens per batch after the
(zero-copy) mmap — IPC stores whole record batches, so unlike parquet
there are no column chunks to skip on disk, but unrequested columns
are dropped before leaving the read task.

The format matters for LLM pipelines: Feather is the interchange
format of Arrow-native feature stores and of ``Dataset.write_ipc``-
style fast local caches (no decode cost at all on re-read).
"""

from __future__ import annotations

import os

import pyarrow as pa


def _ipc_files(path) -> list[str]:
    paths = path if isinstance(path, (list, tuple)) else [path]
    out = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out += [os.path.join(root, f) for f in sorted(files)
                        if f.endswith((".arrow", ".feather", ".ipc"))]
        else:
            out.append(p)
    return sorted(out)


def read_ipc_sized(path, *, columns=None, batches_per_block: int = 8):
    """Parallel Arrow IPC file read: one task per ``batches_per_block``
    record batches of each file.  ``columns`` prunes the decoded table
    before it leaves the read task."""
    import ray.data

    tasks = []
    for p in _ipc_files(path):
        with pa.memory_map(p) as source:       # footer-only driver read
            n = pa.ipc.open_file(source).num_record_batches
        for lo in range(0, max(n, 1), batches_per_block):
            tasks.append({"path": p, "lo": lo,
                          "hi": min(lo + batches_per_block, n)})
    if not tasks:
        return ray.data.from_arrow(pa.table({}))

    def read_task(batch) -> pa.Table:
        outs = []
        for path_, lo, hi in zip(batch["path"], batch["lo"], batch["hi"]):
            with pa.memory_map(str(path_)) as source:
                f = pa.ipc.open_file(source)
                if f.num_record_batches == 0:
                    t = f.schema.empty_table()
                    outs.append(t.select(columns) if columns else t)
                    continue
                for i in range(int(lo), int(hi)):
                    t = pa.Table.from_batches([f.get_batch(i)])
                    outs.append(t.select(columns) if columns else t)
        return pa.concat_tables(outs, promote_options="default")

    return (ray.data.from_items(tasks, override_num_blocks=len(tasks))
            .map_batches(read_task, batch_format="numpy", batch_size=1))


def write_ipc(ds, out_dir: str) -> list[str]:
    """Partitioned Feather-v2 sink: one file per block (resumable,
    parallel re-readable — never one giant file).  Returns the paths."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrow")
        with pa.OSFile(name, "wb") as sink:
            with pa.ipc.new_file(sink, batch.schema) as writer:
                writer.write_table(batch)
        return pa.table({"path": pa.array([name]),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    manifest = ds.map_batches(write_block,
                              batch_format="pyarrow").to_pandas()
    return sorted(manifest["path"].tolist()) if len(manifest) else []
