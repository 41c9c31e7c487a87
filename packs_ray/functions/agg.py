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


def reduce_partition_count(input_ds, *, target_bytes: int = 64 << 20,
                           floor: int = 1) -> int:
    """Reduce-partition count for a shuffle whose input is ``input_ds``:
    ~one partition per ``target_bytes`` of (estimated, metadata-derived)
    input, capped at 2×cluster CPUs.  Keeps small-input shuffles from
    exploding into O(blocks²) tiny tasks while still fanning out on
    real data volumes."""
    import ray

    try:
        nbytes = input_ds.size_bytes() or 0
    except Exception:
        nbytes = 0
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(floor, min(2 * cpus, int(nbytes // target_bytes) + 1))


def global_agg(ds, partial_fn: Callable[[pa.Table], dict[str, Any]],
               combine_fn: Callable[[pd.DataFrame], dict[str, Any]]) -> dict[str, Any]:
    """partial_fn: batch -> flat dict of partial stats (one row).
    combine_fn: DataFrame of partial rows -> final dict."""

    def partial(batch: pa.Table) -> pa.Table:
        d = partial_fn(batch)
        return pa.table({k: [v] for k, v in d.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return combine_fn(parts)


def keyed_count(ds, keys: list[str], *, count_col: str = "cnt",
                num_partitions: int | None = None):
    """Distributed value-count on ``keys``: per-batch partial counts →
    groupby-sum over the (much smaller) unique-key partials, with the
    reduce fan sized to the input.

    Returns a Dataset with columns keys + count_col.
    """
    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        out = df.groupby(keys, dropna=False, sort=False).size().reset_index(name=count_col)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").repartition(num_partitions)
    from ray.data.aggregate import Sum

    return parts.groupby(keys).aggregate(Sum(count_col, alias_name=count_col))
