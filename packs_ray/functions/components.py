"""Connected components over a pair Dataset — turns near-duplicate PAIRS
(neardup.minhash_lsh_pairs / embedding_cosine_pairs output) into CLUSTER
labels, completing the dedup story: keep one canonical document per
component instead of dropping arbitrary pair endpoints.

Algorithm: iterative min-label propagation (the "hash-to-min" family,
Rastogi et al. 2013).  Every node starts labeled with itself; each round
every node takes the min of its own label and its neighbors' labels.
Converges in O(component diameter) rounds — near-dup components are
boilerplate clusters with tiny diameters, so a handful of rounds in
practice; ``max_iters`` caps pathological chains and the truncation is
surfaced via ``attrs``-style return metadata.

Scale shape: each round is two narrow bucketed shuffles (16 B/row
edges + labels; the full documents never move), labels materialize
between rounds (an iterative algorithm's working set — narrow by
construction), convergence is detected with a cheap global label-sum
(monotone non-increasing, fixpoint iff unchanged).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from packs_ray.functions.agg import bucketed_group_reduce, reduce_partition_count
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b", *,
                         node_col: str = "node", label_col: str = "cluster",
                         max_iters: int = 50):
    """Component labels for every node appearing in ``pairs``.

    Returns a Dataset of (``node_col``, ``label_col``) where the label is
    the MINIMUM node id in the component (deterministic canonical member).
    ``pairs`` may be a Dataset or a pandas DataFrame of id pairs.
    """
    import ray.data

    if isinstance(pairs, pd.DataFrame):
        pairs = ray.data.from_arrow(
            _table_from_pandas(pairs[[id_a, id_b]], preserve_index=False))
    else:
        pairs = pairs.select_columns([id_a, id_b])

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column(id_a).to_numpy(zero_copy_only=False))
        b = np.asarray(batch.column(id_b).to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    num_partitions = reduce_partition_count(edges)
    base = getattr(edges.schema(), "base_schema", None)
    id_is_int = base is not None and pa.types.is_integer(base.field("src").type)

    def restore_ids(out: pd.DataFrame) -> pd.DataFrame:
        # the unioned edge+label frame carries nulls in the other side's
        # columns, so pandas upcasts integer ids to float64 — restore so
        # the emitted label schema matches the input id type exactly
        if id_is_int:
            fix = {c: np.int64 for c in ("node", "label")
                   if c in out.columns and out[c].dtype != np.int64}
            if fix:
                out = out.astype(fix)
        return out

    def min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        return restore_ids(
            g.groupby("node", sort=False)["label"].min().reset_index())

    labels = bucketed_group_reduce(
        edges.map_batches(
            lambda b: pa.table({"node": b.column("src"),
                                "label": b.column("src")}),
            batch_format="pyarrow"),
        ["node"], min_per_node, num_partitions).materialize()

    def mark_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "src": batch.column("src"), "dst": batch.column("dst"),
            "label": pa.nulls(n, pa.int64()),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def mark_labels(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "src": batch.column("node"), "dst": pa.nulls(n, pa.int64()),
            "label": batch.column("label").cast(pa.int64()),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        })

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["__side"] == 0][["src", "dst"]]
        l = g[g["__side"] == 1][["src", "label"]]
        msg = e.merge(l, on="src")[["dst", "label"]]
        msg.columns = ["node", "label"]
        own = l.rename(columns={"src": "node"})
        return restore_ids(
            pd.concat([msg, own[["node", "label"]]], ignore_index=True))

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        marked = (edges.map_batches(mark_edges, batch_format="pyarrow")
                  .union(labels.map_batches(mark_labels,
                                            batch_format="pyarrow")))
        cands = bucketed_group_reduce(marked, ["src"], propagate,
                                      num_partitions)
        labels = bucketed_group_reduce(cands, ["node"], min_per_node,
                                       num_partitions).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        print(f"connected_components: not converged after {max_iters} "
              "rounds (component diameter exceeds cap); labels are the "
              "partial fixpoint")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch.column("node"),
                         label_col: batch.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")


def drop_near_duplicates(ds, id_col: str, labels_ds, *,
                         node_col: str = "node", label_col: str = "cluster",
                         canonicals=None, canonical_col: str | None = None):
    """Keep only cluster-canonical documents: rows whose id is either
    absent from ``labels_ds`` (no near-dup) or canonical for its
    cluster — by default the cluster label itself (the component
    minimum); pass ``canonicals`` (a ``cluster_canonicals`` result) and
    ``canonical_col`` to keep the best-scoring member instead.  The
    non-canonical id set is the clustered-minus-canonical slice — far
    smaller than the corpus — broadcast once via ``ray.put`` and tested
    per batch."""
    import ray

    def non_canonical(batch: pa.Table) -> pa.Table:
        keep = pa.compute.not_equal(batch.column(node_col),
                                    batch.column(label_col))
        return batch.filter(keep).select([node_col])

    if canonicals is None:
        bad = np.sort(np.concatenate([
            np.asarray(b.column(node_col).to_numpy(zero_copy_only=False))
            for b in ray.get(labels_ds.map_batches(
                non_canonical, batch_format="pyarrow").to_arrow_refs())
            if len(b)] or [np.empty(0, dtype=np.int64)]))
    else:
        def ids_of(src, col):
            return np.concatenate([
                np.asarray(b.column(col).to_numpy(zero_copy_only=False))
                for b in ray.get(src.map_batches(
                    lambda t, c=col: t.select([c]),
                    batch_format="pyarrow").to_arrow_refs())
                if len(b)] or [np.empty(0, dtype=np.int64)])

        clustered = ids_of(labels_ds, node_col)
        keep_ids = ids_of(canonicals, canonical_col or id_col)
        bad = np.setdiff1d(clustered, keep_ids)   # sorted, unique
    ref = ray.put(bad)

    def keep_rows(batch: pa.Table) -> pa.Table:
        drop_ids = ray.get(ref)
        if drop_ids.size == 0:
            return batch
        ids = np.asarray(batch.column(id_col).to_numpy(zero_copy_only=False))
        pos = np.clip(np.searchsorted(drop_ids, ids), 0, drop_ids.size - 1)
        return batch.filter(pa.array(drop_ids[pos] != ids))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def cluster_canonicals(labels_ds, scores_ds, *, id_col: str,
                       score_col: str, node_col: str = "node",
                       label_col: str = "cluster"):
    """Per-cluster representative by QUALITY instead of label minimum:
    the member with the maximum ``score_col`` (ties to the smallest id)
    — "keep the best document" dedup, the production policy when docs
    carry a quality/length signal (vs ``drop_near_duplicates``'s
    keep-min-id).  Returns a lazy Dataset (label_col, id_col, score_col),
    one row per cluster.

    Scale shape: one equi-join of the (narrow) label set against the
    score column — the label side broadcasts while small, co-partitions
    above the join cap — then one bucketed argmax reduce over
    (label, id, score) rows; the documents themselves never move."""
    from packs_ray.functions.agg import row_shuffle_partitions
    from packs_ray.functions.joins import equi_join

    if labels_ds.schema() is None or labels_ds.count() == 0:
        # no clusters (empty corpus / no near-dups): typed empty result
        # (an empty map_batches output has no schema to join against)
        import ray.data

        sbase = getattr(scores_ds.schema(), "base_schema", None)
        stype = (sbase.field(score_col).type if sbase is not None
                 and sbase.get_field_index(score_col) >= 0
                 else pa.float64())
        return ray.data.from_arrow(pa.table({
            label_col: pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            score_col: pa.array([], type=stype)}))

    joined = equi_join(scores_ds, labels_ds, left_on=[id_col],
                       right_on=[node_col], how="inner")
    keep = [label_col, id_col, score_col]
    proj = joined.map_batches(lambda t: t.select(keep),
                              batch_format="pyarrow")

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([score_col, id_col], ascending=[False, True],
                          kind="mergesort")
        return g.groupby(label_col, sort=False).head(1)[keep]

    return bucketed_group_reduce(proj, [label_col], best,
                                 row_shuffle_partitions(labels_ds))
