"""Small shared helpers for Arrow batch stages."""

from __future__ import annotations

import pyarrow as pa


def str_column(batch: pa.Table, name: str) -> pa.Array:
    """Column as a combined string Array; all-null blocks that lost their
    type through a pandas stage (null type) are cast back to string."""
    col = batch.column(name)
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col
