"""Streaming global-aggregate helpers (partial + final).

The reference accumulates chunk partials in driver lists
(CompletenessAggregator etc., profiling_pack/main.py:222-230,507-509);
here each Ray block produces ONE partial row inside ``map_batches`` and
the driver combines the tiny partial table — no shuffle, no full
materialization.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
import pyarrow as pa


def global_agg(ds, partial_fn: Callable[[pa.Table], dict[str, Any]],
               combine_fn: Callable[[pd.DataFrame], dict[str, Any]]) -> dict[str, Any]:
    """partial_fn: batch -> flat dict of partial stats (one row).
    combine_fn: DataFrame of partial rows -> final dict."""

    def partial(batch: pa.Table) -> pa.Table:
        d = partial_fn(batch)
        return pa.table({k: [v] for k, v in d.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return combine_fn(parts)


def keyed_count(ds, keys: list[str], *, count_col: str = "cnt"):
    """Distributed value-count on ``keys``: per-batch partial counts →
    groupby-sum over the (much smaller) unique-key partials.

    Returns a Dataset with columns keys + count_col.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        out = df.groupby(keys, dropna=False, sort=False).size().reset_index(name=count_col)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return parts.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))
