"""ORC source + partitioned sink.

Ray Data ships no ``read_orc``; pyarrow's ORC reader does the decoding
here.  The driver opens each file for METADATA only (stripe count — a
footer read), then fans one Ray task per stripe range so the column
bytes are read and decoded remotely, in parallel, column-pruned at the
stripe reader.  The block count therefore tracks the input's own stripe
layout the same way the parquet opener tracks row groups.
"""

from __future__ import annotations

import os

import pyarrow as pa


def _orc_files(path) -> list[str]:
    paths = path if isinstance(path, (list, tuple)) else [path]
    out = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out += [os.path.join(root, f) for f in sorted(files)
                        if f.endswith(".orc")]
        else:
            out.append(p)
    return sorted(out)


def read_orc_sized(path, *, columns=None, stripes_per_block: int = 4):
    """Parallel ORC read: one task per ``stripes_per_block`` stripes of
    each file.  ``columns`` prunes at the stripe reader (only requested
    column streams are decompressed)."""
    from pyarrow import orc as paorc

    import ray.data

    tasks = []
    for p in _orc_files(path):
        n = paorc.ORCFile(p).nstripes          # footer-only driver read
        for lo in range(0, max(n, 1), stripes_per_block):
            tasks.append({"path": p, "lo": lo,
                          "hi": min(lo + stripes_per_block, n)})
    if not tasks:
        return ray.data.from_arrow(pa.table({}))

    def read_task(batch) -> pa.Table:
        from pyarrow import orc as _orc

        outs = []
        for path_, lo, hi in zip(batch["path"], batch["lo"], batch["hi"]):
            f = _orc.ORCFile(str(path_))
            if f.nstripes == 0:
                outs.append(f.read(columns=columns))
                continue
            for i in range(int(lo), int(hi)):
                t = f.read_stripe(i, columns=columns)
                if isinstance(t, pa.RecordBatch):
                    t = pa.Table.from_batches([t])
                outs.append(t)
        return pa.concat_tables(outs, promote_options="default")

    return (ray.data.from_items(tasks, override_num_blocks=len(tasks))
            .map_batches(read_task, batch_format="numpy", batch_size=1))


def write_orc(ds, out_dir: str) -> list[str]:
    """Partitioned ORC sink: one file per block (resumable, parallel
    re-readable — never one giant file).  Returns the written paths."""
    import uuid

    from pyarrow import orc as paorc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
        paorc.write_table(batch, name)
        return pa.table({"path": pa.array([name]),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    manifest = ds.map_batches(write_block,
                              batch_format="pyarrow").to_pandas()
    return sorted(manifest["path"].tolist()) if len(manifest) else []
