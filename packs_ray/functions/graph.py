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


def triangle_count(edges, src_col: str, dst_col: str, *,
                   num_partitions: int | None = None,
                   degree_broadcast_cap: int = 20_000_000) -> pd.DataFrame:
    """Exact triangle count + global clustering coefficient of the
    UNDIRECTED graph induced by a (src, dst) edge Dataset — the other
    classic distributed graph kernel next to :func:`pagerank_int`
    (community density for link-graph curation; a crawl whose
    clustering collapses is a spam farm signal).

    Algorithm (all-integer, bit-deterministic at any parallelism):

    1. canonicalize: drop nulls and self-loops, order endpoints
       (u = min, v = max); dedup via one bucketed shuffle on (u, v);
    2. exact degrees via one bucketed reduce on node;
    3. orient every edge from its lower-(degree, id) endpoint — the
       standard degeneracy orientation bounding out-degree by
       O(sqrt(m)), so step 4 is O(m^1.5) worst-case, not O(n*dmax^2);
    4. emit wedges (x, y) per source from (degree, id)-sorted
       out-neighborhoods (one bucketed reduce on source);
    5. close: a wedge is a triangle iff (x, y) is itself an oriented
       edge — one marked-union bucketed reduce on (x, y), counting
       matches per bucket (integer partials, summed on the driver).

    The degree table (|V| rows) broadcasts via ``ray.put`` below
    ``degree_broadcast_cap`` (the FK-orphan cap, integrity.py); beyond
    it the orientation step needs two bucketed joins instead — raised
    explicitly rather than silently collected.

    Returns ONE row: (n_nodes, n_edges, n_triangles, n_wedges,
    clustering) where n_wedges = sum_v C(deg(v), 2) and clustering =
    round(3.0 * triangles / wedges, 6) (0.0 when wedge-free).
    """
    import ray

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(edges)

    def canon(batch: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(batch.column(src_col)),
                        pc.is_valid(batch.column(dst_col)))
        t = batch.filter(valid)
        a = t.column(src_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column(dst_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": pa.array(np.minimum(a, b)),
                         "v": pa.array(np.maximum(a, b))})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    e = bucketed_group_reduce(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"], dedup, num_partitions).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [batch.column("u").combine_chunks().cast(pa.int64()),
             batch.column("v").combine_chunks().cast(pa.int64())])})

    def count_nodes(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("node", sort=False).size()
        return pd.DataFrame({"node": c.index.to_numpy(dtype=np.int64),
                             "d": c.to_numpy(dtype=np.int64)})

    deg = bucketed_group_reduce(
        e.map_batches(endpoints, batch_format="pyarrow"),
        ["node"], count_nodes, num_partitions).to_pandas()
    n_nodes = int(len(deg))
    if n_nodes == 0:
        return pd.DataFrame([{"n_nodes": np.int64(0), "n_edges": np.int64(0),
                              "n_triangles": np.int64(0),
                              "n_wedges": np.int64(0), "clustering": 0.0}])
    if n_nodes > degree_broadcast_cap:
        raise ValueError(
            f"degree table has {n_nodes} nodes > cap {degree_broadcast_cap}"
            " — switch the orientation step to bucketed joins")
    d_arr = deg["d"].to_numpy(dtype=np.int64)
    n_edges_total = int(d_arr.sum()) // 2
    n_wedges = int((d_arr * (d_arr - 1) // 2).sum())
    nodes_sorted = np.sort(deg["node"].to_numpy(dtype=np.int64))
    deg_sorted = deg.sort_values("node")["d"].to_numpy(dtype=np.int64)
    dref = ray.put((nodes_sorted, deg_sorted))

    def orient(batch: pa.Table) -> pa.Table:
        nodes, degs = ray.get(dref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = degs[np.searchsorted(nodes, u)]
        dv = degs[np.searchsorted(nodes, v)]
        # from lower (deg, id) to higher; u < v already, so ties on
        # degree keep u -> v
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pa.table({"a": pa.array(np.where(fwd, u, v)),
                         "b": pa.array(np.where(fwd, v, u))})

    oriented = e.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        nodes, degs = ray.get(dref)
        b = g["b"].to_numpy(dtype=np.int64)
        db = degs[np.searchsorted(nodes, b)]
        g = g.assign(__db=db).sort_values(["a", "__db", "b"],
                                          kind="stable")
        a = g["a"].to_numpy(dtype=np.int64)
        b = g["b"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        sizes = np.diff(np.r_[starts, len(a)])
        xs, ys = [], []
        for st, s in zip(starts, sizes):
            if s < 2:
                continue
            i, j = np.triu_indices(int(s), k=1)
            xs.append(b[st + i])
            ys.append(b[st + j])
        if not xs:
            return pd.DataFrame({"x": pd.Series(dtype="int64"),
                                 "y": pd.Series(dtype="int64")})
        return pd.DataFrame({"x": np.concatenate(xs),
                             "y": np.concatenate(ys)})

    wedge_ds = bucketed_group_reduce(oriented, ["a"], wedges,
                                     num_partitions)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.rename_columns(["x", "y"])
            return t.append_column("__side", pa.array(
                np.full(len(t), side, dtype=np.int8)))
        return fn

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        ed = g[g["__side"] == 0][["x", "y"]].drop_duplicates()
        wd = g[g["__side"] == 1][["x", "y"]]
        if ed.empty or wd.empty:
            return pd.DataFrame({"t": pd.Series([0], dtype="int64")})
        m = wd.merge(ed, on=["x", "y"], how="inner")
        return pd.DataFrame({"t": pd.Series([len(m)], dtype="int64")})

    marked = (oriented.map_batches(tag(0), batch_format="pyarrow")
              .union(wedge_ds.map_batches(
                  lambda t: t.select(["x", "y"]),
                  batch_format="pyarrow").map_batches(
                  tag(1), batch_format="pyarrow")))
    closed = bucketed_group_reduce(marked, ["x", "y"], close_count,
                                   num_partitions)
    n_tri = int(closed.sum("t") or 0)
    from packs_ray.stages.util import round_half_away as _r6

    clustering = float(_r6(3.0 * n_tri / n_wedges, 6)) if n_wedges else 0.0
    return pd.DataFrame([{"n_nodes": np.int64(n_nodes),
                          "n_edges": np.int64(n_edges_total),
                          "n_triangles": np.int64(n_tri),
                          "n_wedges": np.int64(n_wedges),
                          "clustering": clustering}])


def kcore(edges, src_col: str, dst_col: str, *, k: int = 3,
          max_iters: int = 50,
          num_partitions: int | None = None) -> pd.DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    every node whose degree in the surviving subgraph is < k until a
    fixpoint; return the surviving nodes with their core degree.

    The k-core is the density screen the near-dup components
    (components.py) don't give: connected components find *any* link
    chain, the k-core finds regions where every member has >= k
    intra-region links (dense template families in a similarity graph,
    well-connected supplier hubs, spam link farms).

    Semantics: undirected simple graph — edges canonicalize to
    (min, max), exact-dedupe, drop self-loops and null endpoints;
    degree counts distinct neighbors.  All arithmetic is integer, so
    the fixpoint (and hence the output) is independent of partition
    order.

    Scale shape per iteration: degree = one narrow keyed_count over
    the 2-column endpoint stream; the surviving-node set filters the
    edge list via TWO exact semi joins (broadcast <= 5M survivor keys,
    hash co-partitioned above — equi_join picks); the edge list is
    re-materialized each round so the lineage stays O(1) deep.
    Worst case is the classic peeling chain (a path graph peels two
    endpoints per round, O(n) rounds) — bounded by ``max_iters``,
    which raises rather than silently returning a non-fixpoint.
    """
    from packs_ray.functions.agg import (keyed_count,
                                         reduce_partition_count)
    from packs_ray.functions.joins import equi_join

    def canon(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col)
        b = batch.column(dst_col)
        mask = pc.and_(a.is_valid(), b.is_valid())
        batch = batch.filter(mask)
        av = batch.column(src_col).to_numpy(zero_copy_only=False)
        bv = batch.column(dst_col).to_numpy(zero_copy_only=False)
        lo = np.minimum(av, bv)
        hi = np.maximum(av, bv)
        keep = lo != hi                     # self-loops never core-count
        return pa.table({"a": pa.array(lo[keep], type=pa.int64()),
                         "b": pa.array(hi[keep], type=pa.int64())})

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    from packs_ray.functions.agg import bucketed_group_reduce

    raw = edges.map_batches(canon, batch_format="pyarrow")
    if num_partitions is None:
        num_partitions = reduce_partition_count(raw)
    e = bucketed_group_reduce(raw, ["a", "b"], dedupe,
                              num_partitions).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            batch.column("a").combine_chunks().cast(pa.int64()),
            batch.column("b").combine_chunks().cast(pa.int64())])})

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "degree": pd.Series([], dtype="int64")})

    n_edges = e.count()
    for _ in range(max_iters):
        if n_edges == 0:
            return _empty()
        deg = keyed_count(e.map_batches(endpoints, batch_format="pyarrow"),
                          ["node"], count_col="degree")
        kk = int(k)

        def good_nodes(batch: pa.Table) -> pa.Table:
            m = pc.greater_equal(batch.column("degree"), kk)
            return batch.filter(m).select(["node"])

        good = deg.map_batches(good_nodes, batch_format="pyarrow")
        e2 = equi_join(e, good, left_on=["a"], right_on=["node"],
                       how="semi")
        e2 = equi_join(e2, good, left_on=["b"], right_on=["node"],
                       how="semi").materialize()
        n2 = e2.count()
        if n2 == n_edges:                   # no node fell below k
            out = keyed_count(
                e2.map_batches(endpoints, batch_format="pyarrow"),
                ["node"], count_col="degree").to_pandas()
            return (out.sort_values("node").reset_index(drop=True)
                    .astype({"node": "int64", "degree": "int64"}))
        e, n_edges = e2, n2
    raise RuntimeError(
        f"kcore did not converge within max_iters={max_iters}")
