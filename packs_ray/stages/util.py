"""Small shared helpers for Arrow batch stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def round_half_away(x, nd: int):
    """Round half away from zero (SQL ROUND semantics; numpy/Python round
    half-to-even, which diverges from the DuckDB oracle exactly on .5
    boundaries of the (nd+1)-th digit)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def str_column(batch: pa.Table, name: str) -> pa.Array:
    """Column as a combined string Array: null-typed blocks (type lost
    through a pandas stage) and non-string columns (int keys fed to a
    string check — the reference's astype(str)) are cast to string."""
    col = batch.column(name)
    if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def schema_anchor(ds, schema: "pa.Schema"):
    """Union ``ds`` with a 0-row table of ``schema`` so the Dataset
    keeps a schema even when every upstream block is empty (Ray reports
    ``schema() is None`` after any transform of an empty dataset, which
    breaks schema-dependent consumers like joins).  Adds nothing at any
    real size."""
    import ray.data

    return ds.union(ray.data.from_arrow(schema.empty_table()))


def table_from_pandas(df, **kwargs) -> pa.Table:
    """``pa.Table.from_pandas`` minus the pandas schema metadata.

    The metadata blob is a dict, which makes every resulting schema
    unhashable — Ray Data's block-schema deduplication hashes schemas
    and logs a warning per block otherwise ("Failed to hash the
    schemas"), burying real warnings in executor logs.  Nothing in this
    engine reads the pandas metadata back (all round-trips go through
    explicit Arrow schemas), so it is dropped at the source."""
    t = pa.Table.from_pandas(df, **kwargs)
    return t.replace_schema_metadata(None) if t.schema.metadata else t
