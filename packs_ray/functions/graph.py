"""Graph operators over edge tables.

``connected_components`` (components.py) covers the undirected
clustering half; this module adds the directed-importance half:
PageRank, the canonical iterative distributed graph computation
(domain authority for crawl prioritization, citation weighting for
document curation).

The implementation is **exact integer PageRank**: ranks live in
integer units of ``1/scale``, every step is floor division and integer
summation, so the result is bit-deterministic regardless of partition
order, cluster size or summation order — the property float PageRank
cannot give (float contributions sum in nondeterministic order) and
the reason a DuckDB replica can verify it hash-exact.  The update is

    rank' = (scale * (den - num)) // den  +  (num * incoming) // den
    incoming = Σ_{edges u→v} rank[u] // out_degree[u]

with damping ``num/den`` (default 85/100).  Dangling-node mass
dissipates (the standard simplification); rank stays within
``N * scale``, far inside int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pagerank_int(edges, src_col: str, dst_col: str, *, iters: int = 4,
                 scale: int = 1_000_000, damping_num: int = 85,
                 damping_den: int = 100,
                 num_partitions: int | None = None):
    """Exact integer PageRank over a (src, dst) edge Dataset.

    Shape per iteration: ONE bucketed merge by src (ranks ⋈ edges →
    per-edge contributions) and ONE bucketed reduce by node
    (contribution sums + the node list → new ranks) — two narrow
    shuffles of (node, int) rows; edges shuffle once up front (distinct
    + out-degree attach) and are reused as a materialized narrow table
    every round, mirroring ``connected_components``'s loop shape.
    Null endpoints are dropped; duplicate edges count once.

    Returns a Dataset of (node, rank) with rank in 1/``scale`` units
    after ``iters`` rounds from a uniform ``scale`` start."""
    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(edges)
    base = (scale * (damping_den - damping_num)) // damping_den

    def project(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(batch.column(src_col)),
                        pc.is_valid(batch.column(dst_col)))
        t = batch.filter(valid)
        return pa.table({"src": t.column(src_col),
                         "dst": t.column(dst_col)})

    raw = edges.map_batches(project, batch_format="pyarrow")

    def dedup_and_deg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        g["deg"] = g.groupby("src")["src"].transform("size") \
            .astype("int64")
        return g

    # all edges of one src land in one bucket -> exact out-degree
    e = bucketed_group_reduce(raw, ["src"], dedup_and_deg,
                              num_partitions).materialize()

    def node_rows(col):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column(col)})
        return fn

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    nodes = bucketed_group_reduce(
        e.map_batches(node_rows("src"), batch_format="pyarrow")
        .union(e.map_batches(node_rows("dst"), batch_format="pyarrow")),
        ["node"], dedup_nodes, num_partitions).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        return batch.append_column("rank", pa.array(
            np.full(len(batch), scale, dtype=np.int64)))

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow") \
        .materialize()

    def tag(side: int, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(cols)
            return t.append_column("__side", pa.array(
                np.full(len(t), side, dtype=np.int8)))
        return fn

    def contribs(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g["__side"] == 0][["src", "rank"]]
        ed = g[g["__side"] == 1][["src", "dst", "deg"]]
        m = ed.merge(r, on="src", how="inner")
        out = pd.DataFrame({"node": m["dst"],
                            "contrib": (m["rank"].to_numpy(np.int64)
                                        // m["deg"].to_numpy(np.int64))})
        return out

    def new_ranks(g: pd.DataFrame) -> pd.DataFrame:
        n = g[g["__side"] == 0][["node"]]
        c = g[g["__side"] == 1]
        inc = c.groupby("node")["contrib"].sum() if len(c) else None
        out = n.copy()
        if inc is not None:
            got = n["node"].map(inc).fillna(0).astype("int64")
        else:
            got = np.zeros(len(n), dtype=np.int64)
        out["rank"] = base + (damping_num
                              * np.asarray(got, dtype=np.int64)) \
            // damping_den
        return out

    def zeros(n: int):
        return pa.array(np.zeros(n, dtype=np.int64))

    for _ in range(iters):
        # unused side columns carry an int 0 sentinel, NEVER a null:
        # a null int64 column would upcast the whole unioned column to
        # float64 in the pandas bucket (the round-3 hash-red bug class)
        r_tagged = ranks.map_batches(
            lambda b: pa.table({"src": b.column("node"),
                                "dst": b.column("node"),
                                "deg": zeros(len(b)),
                                "rank": b.column("rank")}),
            batch_format="pyarrow").map_batches(
            tag(0, ["src", "dst", "deg", "rank"]),
            batch_format="pyarrow")
        e_tagged = e.map_batches(
            lambda b: b.append_column("rank", zeros(len(b))),
            batch_format="pyarrow").map_batches(
            tag(1, ["src", "dst", "deg", "rank"]),
            batch_format="pyarrow")
        contrib_ds = bucketed_group_reduce(r_tagged.union(e_tagged),
                                           ["src"], contribs,
                                           num_partitions)
        n_tagged = nodes.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "contrib": zeros(len(b))}),
            batch_format="pyarrow").map_batches(
            tag(0, ["node", "contrib"]), batch_format="pyarrow")
        c_tagged = contrib_ds.map_batches(
            tag(1, ["node", "contrib"]), batch_format="pyarrow")
        ranks = bucketed_group_reduce(n_tagged.union(c_tagged),
                                      ["node"], new_ranks,
                                      num_partitions).materialize()

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "rank": pc.cast(batch.column("rank"),
                                         "int64")})

    return ranks.map_batches(finalize, batch_format="pyarrow")
