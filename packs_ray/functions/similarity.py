"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once), per-batch local top-k partials merged
  on the driver — the scale-correct baseline (no shuffle, no
  materialization).
- IVF-style bucketed variant: rows are pre-assigned to coarse centroid
  buckets (fit on a seeded sample, broadcast); queries probe only the
  nearest ``nprobe`` buckets — the documented scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from packs_ray.stages.util import round_half_away as _r


def _fit_dim(m: np.ndarray, d: int) -> np.ndarray:
    """Zero-pad / truncate a batch matrix to the query dimension (only
    reachable on degenerate inputs: all-null or ragged embedding rows)."""
    if m.shape[1] == d:
        return m
    out = np.zeros((m.shape[0], d))
    w = min(d, m.shape[1])
    out[:, :w] = m[:, :w]
    return out


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix.  Null or ragged rows
    zero-pad (a zero vector has cosine 0 to everything — corrupt rows
    sink to the bottom instead of crashing the batch)."""
    import pyarrow.compute as pc

    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    lens = pc.list_value_length(arr).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if n and lens.min() == lens.max() and len(flat) == n * lens[0]:
        return flat.reshape(n, int(lens[0]))       # fast path: rectangular
    dim = int(lens.max()) if n else 0
    m = np.zeros((n, dim))
    if len(flat):
        idx_rows = np.repeat(np.arange(n), lens)
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx_cols = np.arange(len(flat)) - np.repeat(offs, lens)
        m[idx_rows, idx_cols] = flat
    return m


def brute_force_topk(ds, id_col: str, emb_col: str, query: np.ndarray,
                     k: int = 10) -> pd.DataFrame:
    """Top-k rows by cosine similarity to ``query`` (float64 math so the
    DuckDB list_cosine_similarity oracle agrees)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    qref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _fit_dim(_batch_matrix(batch, emb_col), len(qv))
        norms = np.linalg.norm(m, axis=1)
        cos = (m @ qv) / np.where(norms > 0, norms, 1.0)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "cosine": pa.array(_r(cos[top], 6), type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out = parts.sort_values(["cosine", id_col], ascending=[False, True],
                            kind="stable").head(k)
    return out.reset_index(drop=True)


def brute_force_topk_multi(ds, id_col: str, emb_col: str, queries: np.ndarray,
                           k: int = 10) -> pd.DataFrame:
    """Batched multi-query cosine top-k: ONE broadcast (Q, d) query
    matrix, one matmul per batch producing all Q score columns, local
    per-query top-k partials, driver merge of (blocks × Q × k) rows.
    Returns (query_idx, id, cosine) sorted per query."""
    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)                       # (Q, d)
        m = _fit_dim(_batch_matrix(batch, emb_col), qv.shape[1])  # (n, d)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        mn = m / np.where(norms > 0, norms, 1.0)
        cos = mn @ qv.T                          # (n, Q)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        out_q, out_id, out_cos = [], [], []
        for qi in range(cos.shape[1]):
            top = np.argsort(-cos[:, qi], kind="stable")[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[top])
            out_cos.append(cos[top, qi])
        return pa.table({"query_idx": np.concatenate(out_q),
                         id_col: pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(_r(np.concatenate(out_cos), 6),
                                            type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"query_idx": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out = (parts.sort_values(["query_idx", "cosine", id_col],
                             ascending=[True, False, True], kind="stable")
           .groupby("query_idx", sort=False).head(k))
    return out.reset_index(drop=True)


def _lloyd(m: np.ndarray, n_centroids: int, seed: int) -> np.ndarray:
    """Deterministic 5-iteration Lloyd k-means on a collected matrix
    (shared by the engine fit and the SQL-oracle generator so both see
    bit-identical centroids)."""
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(5):
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            pts = m[assign == c]
            if len(pts):
                cent[c] = pts.mean(0)
    return cent


def _sq_dist_seq(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, C) squared distances accumulated dimension-by-dimension in
    index order — the same left-to-right sum a SQL ``list_sum`` replica
    evaluates, unlike numpy's pairwise ``.sum(-1)``."""
    d2 = np.zeros((m.shape[0], cent.shape[0]))
    for j in range(m.shape[1]):
        diff = m[:, j][:, None] - cent[None, :, j]
        np.multiply(diff, diff, out=diff)
        d2 += diff
    return d2


def _fit_centroids(ds, emb_col: str, n_centroids: int, sample_rows: int,
                   seed: int) -> np.ndarray:
    """Seeded-sample Lloyd fit on the driver (deterministic, 5 iters)."""
    sample = ds.limit(sample_rows).select_columns([emb_col])
    chunks = [_batch_matrix(b, emb_col)
              for b in sample.iter_batches(batch_size=sample_rows,
                                           batch_format="pyarrow")]
    if not chunks:
        return np.zeros((0, 0))
    return _lloyd(np.concatenate(chunks), n_centroids, seed)


def ivf_build(ds, id_col: str, emb_col: str, index_dir: str,
              n_centroids: int = 16, sample_rows: int = 2048,
              seed: int = 42) -> np.ndarray:
    """Build a PERSISTED IVF index: fit centroids once, assign every row
    its nearest-centroid bucket in one streaming pass, and write Parquet
    hive-partitioned by ``ivf_bucket`` (one directory per bucket) plus
    ``centroids.npy``.  Queries then read ONLY their ``nprobe`` bucket
    directories — no re-scan of assignments (the scale path the one-shot
    :func:`ivf_topk` approximates)."""
    import os

    cent = _fit_centroids(ds, emb_col, n_centroids, sample_rows, seed)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        centv = ray.get(cref)
        m = _batch_matrix(batch, emb_col)
        d = _sq_dist_seq(m, centv)
        return pa.table({id_col: batch.column(id_col),
                         emb_col: batch.column(emb_col),
                         "ivf_bucket": pa.array(d.argmin(1).astype(np.int64))})

    (ds.select_columns([id_col, emb_col])
     .map_batches(assign, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["ivf_bucket"]))
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    return cent


def ivf_query(index_dir: str, id_col: str, emb_col: str, query: np.ndarray,
              k: int = 10, nprobe: int = 4) -> pd.DataFrame:
    """Query a pre-built IVF index: load centroids, pick the ``nprobe``
    closest buckets, and read only those partition directories."""
    import glob as _glob
    import os

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = np.asarray(query, dtype=np.float64)
    probe = np.argsort(((cent - q) ** 2).sum(1))[:nprobe].tolist()
    paths = [f for b in probe
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"ivf_bucket={b}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    import ray.data

    ds = ray.data.read_parquet(paths, columns=[id_col, emb_col])
    qn = q / np.linalg.norm(q)
    qref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _batch_matrix(batch, emb_col)
        norms = np.linalg.norm(m, axis=1)
        cos = (m @ qv) / np.where(norms > 0, norms, 1.0)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "cosine": pa.array(_r(cos[top], 6), type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (parts.sort_values(["cosine", id_col], ascending=[False, True],
                              kind="stable").head(k).reset_index(drop=True))


def ivf_topk(ds, id_col: str, emb_col: str, query: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, sample_rows: int = 2048,
             seed: int = 42) -> pd.DataFrame:
    """IVF-bucketed ANN, one-shot variant: centroids fit on a seeded
    sample (driver), broadcast; only batches' rows in the ``nprobe``
    closest buckets are scored.  Approximate by construction; tests
    compare its recall against brute force.  For repeated queries build a
    persisted index with :func:`ivf_build` / :func:`ivf_query` instead."""
    cent = _fit_centroids(ds, emb_col, n_centroids, sample_rows, seed)
    if cent.size == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    q = np.asarray(query, dtype=np.float64)
    probe = set(np.argsort(((cent - q) ** 2).sum(1))[:nprobe].tolist())
    cref = ray.put((cent, probe, q / np.linalg.norm(q)))

    def partial(batch: pa.Table) -> pa.Table:
        centv, probev, qv = ray.get(cref)
        mb = _fit_dim(_batch_matrix(batch, emb_col), centv.shape[1])
        d = _sq_dist_seq(mb, centv)
        in_probe = np.isin(d.argmin(1), list(probev))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[in_probe]
        mm = mb[in_probe]
        norms = np.linalg.norm(mm, axis=1)
        cos = (mm @ qv) / np.where(norms > 0, norms, 1.0)
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "cosine": pa.array(_r(cos[top], 6), type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (parts.sort_values(["cosine", id_col], ascending=[False, True], kind="stable")
            .head(k).reset_index(drop=True))


def cluster_assign(ds, id_col: str, emb_col: str, n_clusters: int = 16,
                   sample_rows: int = 2048, seed: int = 42,
                   centroids: np.ndarray | None = None):
    """Lazy Dataset of (id_col, cluster): nearest-centroid assignment of
    every embedding under the deterministic seeded-sample Lloyd fit
    (the ivf_build assignment, without persisting payloads).  Null
    embeddings are excluded — a zero-filled vector would land in an
    arbitrary cluster.  Pass ``centroids`` to reuse a fit."""
    cent = (centroids if centroids is not None
            else _fit_centroids(ds, emb_col, n_clusters, sample_rows, seed))
    if cent.size == 0:
        return ds.select_columns([id_col]).map_batches(
            lambda b: pa.table({id_col: b.column(id_col),
                                "cluster": pa.nulls(len(b), pa.int64())})
            .slice(0, 0), batch_format="pyarrow")
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        centv = ray.get(cref)
        batch = batch.filter(pc.is_valid(batch.column(emb_col)))
        m = _fit_dim(_batch_matrix(batch, emb_col), centv.shape[1])
        d = _sq_dist_seq(m, centv)
        return pa.table({id_col: batch.column(id_col),
                         "cluster": pa.array(d.argmin(1).astype(np.int64))})

    return ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow")


def cluster_balanced_sample(ds, id_col: str, emb_col: str, *,
                            n_per_cluster: int, n_clusters: int = 16,
                            sample_rows: int = 2048, seed: int = 42,
                            salt: str = ""):
    """Topic-balanced subset: k-means-cluster the embeddings, then take
    a deterministic stratified sample of ``n_per_cluster`` ids per
    cluster (lowest finalized hash(id, salt) — retry/block-split
    stable).  The mixture-flattening step of embedding-clustered data
    curation: a dominant topic cluster contributes the same row budget
    as a rare one.  Returns a lazy Dataset of (id_col, cluster)."""
    from packs_ray.functions.sampling import stratified_sample

    assigned = cluster_assign(ds, id_col, emb_col, n_clusters,
                              sample_rows, seed)
    return stratified_sample(assigned, "cluster", id_col, n_per_cluster,
                             salt=salt)


def semantic_dedup(ds, id_col: str, emb_col: str, *, tau: float,
                   n_clusters: int = 16, sample_rows: int = 2048,
                   seed: int = 42, group_cap: int = 100_000,
                   centroids: np.ndarray | None = None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embeddings, then within each cluster drop every row that has a
    SMALLER-id row with cosine similarity >= ``tau`` (leader dedup; the
    leader set includes already-dropped rows, so the rule is
    order-independent and exactly SQL-replicable as NOT EXISTS).

    Scale shape: clustering bounds the pairwise work — embeddings ride
    ONE shuffle co-partitioned by cluster, and each cluster runs a
    blockwise normalized matmul (never materializing more than
    block x cluster floats).  Clusters above ``group_cap`` rows skip the
    quadratic pass and keep all rows, loudly (the capped-group
    convention of minhash verify).  Null embeddings are excluded.

    Returns a lazy Dataset of survivors (id_col, cluster)."""
    cent = (centroids if centroids is not None
            else _fit_centroids(ds, emb_col, n_clusters, sample_rows, seed))
    if cent.size == 0:
        return ds.select_columns([id_col]).map_batches(
            lambda b: pa.table({id_col: b.column(id_col),
                                "cluster": pa.nulls(len(b), pa.int64())})
            .slice(0, 0), batch_format="pyarrow")
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        centv = ray.get(cref)
        batch = batch.filter(pc.is_valid(batch.column(emb_col)))
        m = _fit_dim(_batch_matrix(batch, emb_col), centv.shape[1])
        d = _sq_dist_seq(m, centv)
        return pa.table({id_col: batch.column(id_col),
                         emb_col: batch.column(emb_col),
                         "cluster": pa.array(d.argmin(1).astype(np.int64))})

    withc = ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow")

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n > group_cap:
            print(f"semantic_dedup: cluster of {n} rows exceeds "
                  f"group_cap={group_cap}; quadratic pass skipped, "
                  "all rows kept")
            return g[[id_col, "cluster"]]
        order = np.argsort(g[id_col].to_numpy(), kind="stable")
        g = g.iloc[order]
        M = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g[emb_col]])
        norm = np.linalg.norm(M, axis=1)
        norm[norm == 0] = 1.0
        M = M / norm[:, None]
        keep = np.ones(n, dtype=bool)
        B = 1024
        rows = np.arange(n)
        for j0 in range(0, n, B):
            j1 = min(j0 + B, n)
            S = M[:j1] @ M[j0:j1].T                    # (j1, block)
            earlier = rows[:j1, None] < np.arange(j0, j1)[None, :]
            keep[j0:j1] = ~((S >= tau) & earlier).any(axis=0)
        return g.loc[keep, [id_col, "cluster"]]

    return withc.groupby("cluster").map_groups(per_cluster,
                                               batch_format="pandas")


def quantize_embeddings(ds, id_col: str, emb_col: str):
    """Symmetric per-vector int8 quantization — the storage/transport
    compression step for ANN at scale (4x smaller than float32, 8x
    smaller than float64): scale = max|v| / 127, q = floor(v/scale +
    0.5) (half-up — floor(x+0.5) on BOTH sides, so engine and SQL agree
    bit-for-bit even on .5 boundaries), plus the reconstruction MSE as
    the quality audit.  Stateless per-batch; returns
    (id, scale, q8 as a comma-joined string — portable across Arrow /
    DuckDB list representations — and mse rounded 6dp)."""

    def fn(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, emb_col)                  # (n, d) float64
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n, d = m.shape if m.size else (len(ids), 0)
        amax = np.abs(m).max(axis=1) if d else np.zeros(n)
        scale = amax / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        q = np.floor(m / safe[:, None] + 0.5).astype(np.int64) if d \
            else np.zeros((n, 0), dtype=np.int64)
        acc = np.zeros(n, dtype=np.float64)
        for j in range(d):                  # sequential fold = SQL list_sum
            diff = m[:, j] - q[:, j] * scale
            acc = acc + diff * diff
        mse = _r(acc / d, 6) if d else np.zeros(n)
        q8 = np.array([",".join(str(int(x)) for x in row) for row in q],
                      dtype=object)
        return pa.table({id_col: pa.array(ids),
                         "scale": pa.array(scale, type=pa.float64()),
                         "q8": pa.array(q8, type=pa.string()),
                         "mse": pa.array(mse, type=pa.float64())})

    return ds.select_columns([id_col, emb_col]).map_batches(
        fn, batch_format="pyarrow")


def brute_force_topk_quantized(ds, id_col: str, emb_col: str,
                               query: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Cosine top-k over int8-QUANTIZED vectors (quantize -> reconstruct
    -> score): the retrieval-quality audit for ``quantize_embeddings``
    — at 100 TB the corpus is stored int8 and this is what search
    actually sees.  Same shape as ``brute_force_topk``: broadcast query,
    per-batch local top-k partials, blocks x k driver merge."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    qref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _fit_dim(_batch_matrix(batch, emb_col), len(qv))
        amax = np.abs(m).max(axis=1) if m.size else np.zeros(len(m))
        scale = amax / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        recon = np.floor(m / safe[:, None] + 0.5) * scale[:, None]
        norms = np.linalg.norm(recon, axis=1)
        cos = (recon @ qv) / np.where(norms > 0, norms, 1.0)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "cosine": pa.array(_r(cos[top], 6),
                                            type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out = parts.sort_values(["cosine", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
    return out.reset_index(drop=True)


def label_noise_knn(ds, id_col: str, emb_col: str, label_col: str, *,
                    k: int = 5) -> pd.DataFrame:
    """Label-noise screen via kNN vote (Confident-Learning-lite,
    Northcutt et al. 2021 class of checks): each row's label is
    compared to the majority label of its k nearest neighbors by
    cosine — a disagreeing neighborhood marks a suspected mislabel,
    the classifier-data quality check the packs' tabular rules can't
    express.  Rows with a null id/embedding/label are excluded.

    Determinism contract (shared with the ANN family): cosines are
    rounded 6dp BEFORE ranking, neighbor ties break on ascending id,
    vote ties on ascending label, self is excluded by id.

    Scale shape: this is the EXACT baseline — the (id, embedding,
    label) reference table is collected once and broadcast via
    ``ray.put`` (reference-table-sized corpora; the scale path is the
    :func:`semantic_dedup` IVF co-partition with per-cluster kNN), and
    scoring streams per batch as one matmul against the broadcast
    matrix.

    Output per row: (id, label, knn_label, n_agree, is_suspect),
    ordered by id."""
    import pyarrow.compute as pc

    narrow = ds.select_columns([id_col, emb_col, label_col]) \
        .map_batches(lambda t: t.filter(pc.and_(pc.and_(
            pc.is_valid(t.column(id_col)),
            pc.is_valid(t.column(label_col))),
            pc.is_valid(t.column(emb_col)))), batch_format="pyarrow")
    corpus = narrow.to_pandas()
    if corpus.empty:
        return pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            label_col: pd.Series([], dtype="int64"),
            "knn_label": pd.Series([], dtype="int64"),
            "n_agree": pd.Series([], dtype="int64"),
            "is_suspect": pd.Series([], dtype="bool")})
    ids = corpus[id_col].to_numpy()
    labels = corpus[label_col].to_numpy()
    m = np.stack([np.asarray(e, dtype=np.float64)
                  for e in corpus[emb_col]])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    mn = m / np.where(norms > 0, norms, 1.0)
    ref = ray.put((ids, labels, mn))

    def partial(batch: pa.Table) -> pa.Table:
        cids, clabels, cm = ray.get(ref)
        bm = _fit_dim(_batch_matrix(batch, emb_col), cm.shape[1])
        bn = np.linalg.norm(bm, axis=1, keepdims=True)
        bmn = bm / np.where(bn > 0, bn, 1.0)
        sims = np.asarray(_r(bmn @ cm.T, 6))          # (n, N), 6dp
        bids = batch.column(id_col).to_numpy(zero_copy_only=False)
        blab = batch.column(label_col).to_numpy(zero_copy_only=False)
        out_lab = np.empty(len(bids), dtype=np.int64)
        out_agree = np.empty(len(bids), dtype=np.int64)
        for i in range(len(bids)):                   # rows per batch;
            s = sims[i]                              # inner ops vectorized
            mask = cids != bids[i]
            order = np.lexsort((cids[mask], -s[mask]))[:k]
            nl = clabels[mask][order]
            uniq, cnt = np.unique(nl, return_counts=True)
            pick = np.lexsort((uniq, -cnt))[0]
            out_lab[i] = int(uniq[pick])
            out_agree[i] = int(cnt[pick])
        return pa.table({
            id_col: pa.array(bids),
            label_col: batch.column(label_col),
            "knn_label": pa.array(out_lab),
            "n_agree": pa.array(out_agree),
            "is_suspect": pa.array(out_lab != blab.astype(np.int64))})

    res = narrow.map_batches(partial, batch_format="pyarrow").to_pandas()
    return res.sort_values(id_col, kind="stable").reset_index(drop=True)


def kcenter_sample(ds, id_col: str, emb_col: str, *, k: int = 8) -> pd.DataFrame:
    """Greedy k-center (maxmin / farthest-point) diversity sample over
    an embedding column (Gonzalez 1985, 2-approximation): start from
    the smallest id, then repeatedly pick the point FARTHEST (cosine
    distance) from everything selected so far — the coverage-maximizing
    seed-set selection curation uses for eval panels and active
    labeling.  Null id/embedding rows are excluded.

    Determinism contract (ANN family): distances are
    ``round(1 − cosine, 6)``; the running minimum is the min of those
    ROUNDED legs; argmax ties break on ascending id — so a SQL replica
    unrolling the same k steps agrees exactly.

    Scale shape: ONE streaming scan per iteration (k scans total) —
    each batch computes its distance to the ≤k broadcast selected
    vectors, takes a local argmax partial, and ships only (id, d,
    vector) per batch; nothing else reaches the driver.  This is the
    iterative-algorithm template (broadcast state → scan → tiny
    reduce → grow state).

    Output: (pick_order 1..k, id, min_dist) — min_dist is the
    selection-time distance to the prior set (null for the seed)."""
    import pyarrow.compute as pc

    narrow = ds.select_columns([id_col, emb_col]).map_batches(
        lambda t: t.filter(pc.and_(pc.is_valid(t.column(id_col)),
                                   pc.is_valid(t.column(emb_col)))),
        batch_format="pyarrow")
    empty = pd.DataFrame({"pick_order": pd.Series([], dtype="int64"),
                          id_col: pd.Series([], dtype="int64"),
                          "min_dist": pd.Series([], dtype="float64")})

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "vec": pa.array([], type=pa.binary())})
        i = int(np.argmin(ids))
        m = _batch_matrix(batch.slice(i, 1), emb_col)
        return pa.table({id_col: pa.array([int(ids[i])]),
                         "vec": pa.array([m[0].tobytes()])})

    seeds = narrow.map_batches(seed_partial,
                               batch_format="pyarrow").to_pandas()
    if seeds.empty:
        return empty
    row = seeds.loc[seeds[id_col].idxmin()]
    sel_ids = [int(row[id_col])]
    sel_vecs = [np.frombuffer(row["vec"], dtype=np.float64)]
    out_rows = [{"pick_order": np.int64(1), id_col: np.int64(sel_ids[0]),
                 "min_dist": np.nan}]

    for step in range(2, k + 1):
        sm = np.stack(sel_vecs)
        sn = sm / np.where(np.linalg.norm(sm, axis=1, keepdims=True) > 0,
                           np.linalg.norm(sm, axis=1, keepdims=True), 1.0)
        ref = ray.put((np.asarray(sel_ids, dtype=np.int64), sn))

        def far_partial(batch: pa.Table) -> pa.Table:
            sids, svecs = ray.get(ref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            keep = ~np.isin(ids, sids)
            if not keep.any():
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "d": pa.array([], type=pa.float64()),
                                 "vec": pa.array([], type=pa.binary())})
            m = _fit_dim(_batch_matrix(batch, emb_col), svecs.shape[1])[keep]
            ids = ids[keep]
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            mn = m / np.where(nrm > 0, nrm, 1.0)
            d = np.asarray(_r(1.0 - mn @ svecs.T, 6)).min(axis=1)
            best = np.lexsort((ids, -d))[0]
            return pa.table({id_col: pa.array([int(ids[best])]),
                             "d": pa.array([float(d[best])]),
                             "vec": pa.array([m[best].tobytes()])})

        parts = narrow.map_batches(far_partial,
                                   batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        parts = parts.sort_values(["d", id_col],
                                  ascending=[False, True], kind="stable")
        win = parts.iloc[0]
        sel_ids.append(int(win[id_col]))
        sel_vecs.append(np.frombuffer(win["vec"], dtype=np.float64))
        out_rows.append({"pick_order": np.int64(step),
                         id_col: np.int64(win[id_col]),
                         "min_dist": float(win["d"])})
    return pd.DataFrame(out_rows)


def embedding_quality(ds, emb_col: str) -> pd.DataFrame:
    """One-row hygiene profile of an embedding column — the pre-flight
    check every ANN / semantic-dedup stage needs: null rows, ragged
    dimensions, non-finite values, silent zero vectors, and the norm
    distribution (an unnormalized or collapsed encoder shows up here
    long before recall metrics do).

    Exactness: each vector's squared-norm is pinned to integer
    NANO-units per element (round(x²·1e9) summed in int64 — order-free,
    so block order can't drift bits), and each norm to integer
    MICRO-units; min/max/mean are over those ints with ONE final
    division.  Non-finite vectors are counted but excluded from norm
    stats; a null row contributes only to n_null.

    Scale: streaming per-block partials via ``global_agg`` — nothing
    but one ~10-field dict per block reaches the driver."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import global_agg
    from packs_ray.stages.util import round_half_away as _rr

    def partial(batch: pa.Table) -> dict:
        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        n_null = int(n - valid.sum())
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        dims = lens[valid].astype(np.int64) if valid.any() else \
            np.array([], dtype=np.int64)
        vals = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # per-valid-row segments over the flattened values
        ends = np.cumsum(dims)
        starts = ends - dims
        fin = np.isfinite(vals)
        row_fin = np.ones(len(dims), dtype=bool)
        if len(vals):
            bad = np.add.reduceat(
                (~fin).astype(np.int64), np.minimum(starts, len(vals) - 1))
            bad[dims == 0] = 0
            row_fin = bad == 0
        sq_nano = np.zeros(len(vals), dtype=np.int64)
        if len(vals):
            sq = np.where(fin, vals, 0.0)
            sq_nano = _rr(sq * sq * 1e9, 0).astype(np.int64)
        ssq = np.zeros(len(dims), dtype=np.int64)
        if len(vals) and len(dims):
            ssq = np.add.reduceat(sq_nano, np.minimum(starts, len(vals) - 1))
            ssq[dims == 0] = 0
        ssq_fin = ssq[row_fin]
        dims_fin = dims[row_fin]
        micro = _rr(np.sqrt(ssq_fin.astype(np.float64) / 1e9) * 1e6,
                    0).astype(np.int64)
        return {
            "n_vecs": n, "n_null": n_null,
            "n_nonfinite": int((~row_fin).sum()),
            "n_zero": int(((ssq_fin == 0) & (dims_fin > 0)).sum()),
            "min_dim": int(dims.min()) if len(dims) else None,
            "max_dim": int(dims.max()) if len(dims) else None,
            "n_norm": len(micro),
            "min_micro": int(micro.min()) if len(micro) else None,
            "max_micro": int(micro.max()) if len(micro) else None,
            "sum_micro": int(micro.sum()),
        }

    def combine(p: pd.DataFrame) -> dict:
        n_norm = int(p["n_norm"].sum())
        mn = p["min_micro"].dropna()
        mx = p["max_micro"].dropna()
        return {
            "n_vecs": int(p["n_vecs"].sum()),
            "n_null": int(p["n_null"].sum()),
            "n_nonfinite": int(p["n_nonfinite"].sum()),
            "n_zero": int(p["n_zero"].sum()),
            "min_dim": (int(p["min_dim"].dropna().min())
                        if p["min_dim"].notna().any() else None),
            "max_dim": (int(p["max_dim"].dropna().max())
                        if p["max_dim"].notna().any() else None),
            "n_norm": n_norm,
            "min_norm": float(mn.min()) / 1e6 if len(mn) else None,
            "max_norm": float(mx.max()) / 1e6 if len(mx) else None,
            "mean_norm": (_rr(float(p["sum_micro"].sum()) / n_norm / 1e6, 6)
                          if n_norm else None),
        }

    agg = global_agg(ds, partial, combine,
                     empty_schema=pa.schema(
                         [(emb_col, pa.list_(pa.float32()))]))
    return pd.DataFrame([agg])


def embedding_drift(ds_a, ds_b, emb_col: str) -> pd.DataFrame:
    """Centroid drift between two embedding feeds (old vs new encoder
    run, snapshot A vs B): the cosine between the two MEAN vectors —
    the cheapest early-warning that an encoder changed or a corpus
    shifted, long before ANN recall moves.

    Exactness: each element is pinned to integer NANO-units
    (round(x*1e9)) and summed per dimension in int64 (order-free);
    the cosine is computed from those integer sums in arbitrary-
    precision Python ints (the 1e9 scale cancels), with ONE final
    float division — bit-identical to the HUGEINT SQL oracle.  Null
    rows, ragged and non-finite vectors are excluded (and counted).

    Scale: one streaming pass per side; only a (dim,)-int64 partial
    per block reaches the combiner."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import global_agg
    from packs_ray.stages.util import round_half_away as _rr

    def side_sum(ds):
        def partial(batch: pa.Table) -> dict:
            col = batch.column(emb_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            lens = np.where(valid, lens, 0).astype(np.int64)
            # majority dim of this block decides candidates; ragged and
            # non-finite rows drop (counted)
            vals = col.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ends = np.cumsum(lens)
            starts = ends - lens
            dims = lens[valid] if valid.any() else np.array([], np.int64)
            dim = int(np.bincount(dims).argmax()) if len(dims) else 0
            nano = _rr(vals * 1e9, 0)
            fin = np.isfinite(vals)
            # vectorized row screen: finite everywhere + exact dim
            bad = np.zeros(len(lens), dtype=np.int64)
            if len(vals):
                bad = np.add.reduceat((~fin).astype(np.int64),
                                      np.minimum(starts, len(vals) - 1))
                bad[lens == 0] = 0
            ok = valid & (lens == dim) & (bad == 0) & (dim > 0)
            sums = np.zeros(dim, dtype=np.int64)
            if ok.any():
                sel = np.repeat(ok, lens)            # mask over flat values
                sums = nano[sel].astype(np.int64).reshape(-1, dim) \
                    .sum(axis=0)
            n_used = int(ok.sum())
            return {"dim": dim, "n_used": n_used,
                    "n_skip": int((valid & ~ok).sum()),
                    "n_null": int((~valid).sum()),
                    "sums": sums.tolist()}

        def combine(p: pd.DataFrame) -> dict:
            dims = [d for d in p["dim"] if d]
            dim = max(set(dims), key=lambda d: sum(
                n for dd, n in zip(p["dim"], p["n_used"]) if dd == d)) \
                if dims else 0
            sums = [0] * dim
            n_used = n_skip = 0
            for _, row in p.iterrows():
                if row["dim"] == dim and row["n_used"]:
                    for j, v in enumerate(row["sums"]):
                        sums[j] += int(v)
                    n_used += int(row["n_used"])
                else:
                    n_skip += int(row["n_used"])
                n_skip += int(row["n_skip"])
            return {"dim": dim, "n_used": n_used, "n_skip": n_skip,
                    "n_null": int(p["n_null"].sum()), "sums": sums}

        return global_agg(ds, partial, combine,
                          empty_schema=pa.schema(
                              [(emb_col, pa.list_(pa.float32()))]))

    a, b = side_sum(ds_a), side_sum(ds_b)
    cos = None
    if a["n_used"] and b["n_used"] and a["dim"] == b["dim"]:
        dot = sum(x * y for x, y in zip(a["sums"], b["sums"]))
        na = sum(x * x for x in a["sums"])
        nb = sum(y * y for y in b["sums"])
        if na > 0 and nb > 0:
            cos = float(_rr(float(dot) / (np.sqrt(float(na))
                                          * np.sqrt(float(nb))), 6))
    return pd.DataFrame([{
        "n_a": int(a["n_used"]), "n_b": int(b["n_used"]),
        "n_excluded": int(a["n_skip"] + a["n_null"]
                          + b["n_skip"] + b["n_null"]),
        "dim": int(a["dim"]),
        "centroid_cosine": cos,
    }])


def contrastive_pairs(ds, id_col: str, emb_col: str, label_col: str, *,
                      anchor_mod: int = 50) -> pd.DataFrame:
    """Contrastive training-pair mining: for each anchor (ids with
    ``id % anchor_mod == 0``) the most-similar SAME-label row (the
    positive) and the most-similar DIFFERENT-label row (the hard
    negative) — the (anchor, positive, hard-negative) triplets every
    embedding-finetune data pipeline materializes.

    Determinism contract (ANN family): cosines rounded 6dp BEFORE
    ranking, ties break on ascending candidate id, self excluded by id.
    Rows with null id/embedding/label are excluded everywhere.

    Scale shape: anchors are broadcast once as a normalized matrix
    (``ray.put``); the corpus STREAMS through map_batches emitting one
    (anchor, side, best_cos, best_id) partial per block — an exact
    tournament reduce, no N x N materialization; driver sees
    O(anchors x blocks) partials.  At IVF scale, restrict candidates
    per anchor to probed clusters first (`ann_ivf` path)."""
    import pyarrow.compute as pc

    from packs_ray.stages.util import round_half_away as _r

    narrow = ds.select_columns([id_col, emb_col, label_col]) \
        .map_batches(lambda t: t.filter(pc.and_(pc.and_(
            pc.is_valid(t.column(id_col)),
            pc.is_valid(t.column(label_col))),
            pc.is_valid(t.column(emb_col)))), batch_format="pyarrow")

    def is_anchor(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % anchor_mod == 0))

    anchors = narrow.map_batches(is_anchor,
                                 batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({
        "anchor_id": pd.Series([], dtype="int64"),
        "anchor_label": pd.Series([], dtype="int64"),
        "pos_id": pd.Series([], dtype="float64"),
        "pos_cos": pd.Series([], dtype="float64"),
        "neg_id": pd.Series([], dtype="float64"),
        "neg_cos": pd.Series([], dtype="float64")})
    if anchors.empty:
        return empty
    a_ids = anchors[id_col].to_numpy(np.int64)
    a_lab = anchors[label_col].to_numpy(np.int64)
    am = np.stack([np.asarray(e, dtype=np.float64)
                   for e in anchors[emb_col]])
    an = np.linalg.norm(am, axis=1, keepdims=True)
    amn = am / np.where(an > 0, an, 1.0)
    ref = ray.put((a_ids, a_lab, amn))

    def partial(batch: pa.Table) -> pa.Table:
        ai, al, amat = ray.get(ref)
        bm = _fit_dim(_batch_matrix(batch, emb_col), amat.shape[1])
        bn = np.linalg.norm(bm, axis=1, keepdims=True)
        bmn = bm / np.where(bn > 0, bn, 1.0)
        sims = np.asarray(_r(amat @ bmn.T, 6))        # (A, n)
        bids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        blab = batch.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rows = {"anchor": [], "side": [], "cos": [], "cand": []}
        same_all = al[:, None] == blab[None, :]       # (A, n)
        not_self = ai[:, None] != bids[None, :]
        for side, m in ((1, same_all & not_self),
                        (0, ~same_all & not_self)):
            ok = m.any(axis=1)
            if not ok.any():
                continue
            s = np.where(m, sims, -np.inf)
            best = s.max(axis=1)
            # tie -> smallest candidate id (mask non-best with +inf ids)
            cand = np.where(s == best[:, None], bids[None, :],
                            np.iinfo(np.int64).max).min(axis=1)
            idx = np.flatnonzero(ok)
            rows["anchor"].extend(ai[idx].tolist())
            rows["side"].extend([side] * len(idx))
            rows["cos"].extend(best[idx].tolist())
            rows["cand"].extend(cand[idx].tolist())
        return pa.table({
            "anchor": pa.array(rows["anchor"], type=pa.int64()),
            "side": pa.array(rows["side"], type=pa.int64()),
            "cos": pa.array(rows["cos"], type=pa.float64()),
            "cand": pa.array(rows["cand"], type=pa.int64())})

    parts = narrow.map_batches(partial, batch_format="pyarrow").to_pandas()
    lab_by_id = dict(zip(a_ids.tolist(), a_lab.tolist()))
    out_rows = []
    for aid in sorted(lab_by_id):
        row = {"anchor_id": aid, "anchor_label": lab_by_id[aid],
               "pos_id": None, "pos_cos": None,
               "neg_id": None, "neg_cos": None}
        for side, pid, pcos in ((1, "pos_id", "pos_cos"),
                                (0, "neg_id", "neg_cos")):
            g = parts[(parts["anchor"] == aid) & (parts["side"] == side)]
            if len(g):
                best = g["cos"].max()
                row[pcos] = float(best)
                row[pid] = int(g.loc[g["cos"] == best, "cand"].min())
        out_rows.append(row)
    out = pd.DataFrame(out_rows)
    for c in ("pos_id", "neg_id"):
        out[c] = out[c].astype("float64")   # nullable-friendly, SQL parity
    return out


def _cov_power_sums(ds, emb_col: str, dim: int):
    """Exact micro-int power sums for a covariance matrix.

    Each element is pinned to integer MICRO-units (round-half-away of
    x*1e6 after the float32->float64 cast — the `embedding_drift`
    convention), then S1[i] = sum(micro_i) and S2[i][j] = sum(micro_i *
    micro_j) are exact integers: block order, batch size and CPU count
    cannot drift a bit.  Per-block products use one int64 matmul when
    the magnitude bound allows (always, for unit-scale embeddings) and
    fall back to row-chunked matmuls otherwise so no partial ever
    overflows; cross-block combine is Python-int (arbitrary precision).

    Scale: only (dim*(dim+1)/2 + dim + 1)-row integer partials per block
    reach the driver — never a vector.  Rows that are null, ragged
    (len != dim) or contain non-finite values are excluded.

    Returns (n_rows, S1 list[int], S2 dict[(i, j)] -> int, 0-based,
    i <= j)."""
    import pyarrow.compute as pc

    iu0, iu1 = np.triu_indices(dim)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = col.is_valid().to_numpy(zero_copy_only=False) & (lens == dim)
        m = _batch_matrix(batch.filter(pa.array(keep)), emb_col)
        m = _fit_dim(m, dim) if m.size else np.zeros((0, dim))
        fin = np.isfinite(m).all(axis=1)
        m = m[fin]
        micro = _r(m * 1e6, 0).astype(np.int64)
        n = micro.shape[0]
        tabs = []
        mx = int(np.abs(micro).max()) if n else 0
        step = n if not n else max(1, min(n, (2 ** 62) // max(mx * mx, 1)))
        for a in range(0, max(n, 1), max(step, 1)):
            c = micro[a:a + step]
            if not len(c) and a:
                break
            s2 = (c.T @ c) if len(c) else np.zeros((dim, dim), np.int64)
            s1 = c.sum(axis=0) if len(c) else np.zeros(dim, np.int64)
            i_rows = np.concatenate([iu0 + 1, np.arange(1, dim + 1), [0]])
            j_rows = np.concatenate([iu1 + 1, np.zeros(dim, np.int64), [0]])
            s_rows = np.concatenate([s2[iu0, iu1], s1,
                                     [np.int64(len(c))]])
            tabs.append(pa.table({
                "i": pa.array(i_rows, type=pa.int64()),
                "j": pa.array(j_rows, type=pa.int64()),
                "s": pa.array(s_rows, type=pa.int64())}))
            if not n:
                break
        return pa.concat_tables(tabs)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return 0, [0] * dim, {}
    parts["s"] = parts["s"].map(int)            # Python-int combine
    sums = parts.groupby(["i", "j"])["s"].sum()
    n = int(sums.get((0, 0), 0))
    s1 = [int(sums.get((i, 0), 0)) for i in range(1, dim + 1)]
    s2 = {(int(i) - 1, int(j) - 1): int(v)
          for (i, j), v in sums.items() if i >= 1 and j >= 1}
    return n, s1, s2


def covariance_matrix(ds, emb_col: str, dim: int = 64) -> pd.DataFrame:
    """Exact population covariance matrix of an embedding column — the
    whitening / PCA-prep profile (the reference computes only per-column
    scalar stats, `profiling_pack/main.py:373-400`; this is the
    vector-column analogue).

    cov(i, j) = (S2/n - S1_i*S1_j/n/n) / 1e12 over the exact micro-int
    power sums of `_cov_power_sums`, ONE pinned left-associative float
    expression per cell shared with the DuckDB replica, rounded 9dp
    half-away.  Output: one row per (i, j), 1-based, i <= j."""
    n, s1, s2 = _cov_power_sums(ds, emb_col, dim)
    if n == 0:
        return pd.DataFrame({"i": pd.Series(dtype="int64"),
                             "j": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "cov": pd.Series(dtype="float64")})
    rows = []
    for (i, j), sij in sorted(s2.items()):
        cov = (float(sij) / n - float(s1[i]) * float(s1[j]) / n / n) / 1e12
        rows.append({"i": np.int64(i + 1), "j": np.int64(j + 1),
                     "n": np.int64(n), "cov": float(_r(cov, 9))})
    return pd.DataFrame(rows)


def pca_project(ds, id_col: str, emb_col: str, *, k: int = 2,
                dim: int = 64):
    """PCA projection of an embedding column onto its top-k principal
    components — dimensionality reduction for visualization / cheap
    clustering over the same exact covariance sums as
    `covariance_matrix`.

    Determinism: the covariance matrix is built from exact integer
    sums (bit-identical at any parallelism), `np.linalg.eigh` of that
    fixed matrix is deterministic, and each eigenvector's sign is
    pinned (its largest-|.|-component is made positive, first index on
    ties) so the projection never flips between runs.  Eigen-
    decomposition is not SQL-expressible, so this operator is
    pytest-gated (numpy parity + variance ordering) rather than
    oracle-gated.

    Scale: one streaming power-sum pass (fixed-size partials), a
    dim x dim driver eigh (trivial), then one stateless broadcast
    projection pass — rows never shuffle."""
    n, s1, s2 = _cov_power_sums(ds, emb_col, dim)
    if n == 0:
        return ds.map_batches(
            lambda b: pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 **{f"pc{c + 1}": pa.array([], type=pa.float64())
                    for c in range(k)}}),
            batch_format="pyarrow")
    cov = np.zeros((dim, dim))
    for (i, j), sij in s2.items():
        v = (float(sij) / n - float(s1[i]) * float(s1[j]) / n / n) / 1e12
        cov[i, j] = cov[j, i] = v
    mean = np.array([float(x) / n / 1e6 for x in s1])
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :k].copy()            # descending eigenvalue
    for c in range(comps.shape[1]):             # sign pin
        if comps[np.argmax(np.abs(comps[:, c])), c] < 0:
            comps[:, c] = -comps[:, c]
    ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pa.Table:
        mu, vv = ray.get(ref)
        import pyarrow.compute as pc

        col = batch.column(emb_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = col.is_valid().to_numpy(zero_copy_only=False) & (lens == dim)
        t = batch.filter(pa.array(keep))
        m = _fit_dim(_batch_matrix(t, emb_col), dim) if keep.any() \
            else np.zeros((0, dim))
        fin = np.isfinite(m).all(axis=1) if len(m) else \
            np.zeros(0, dtype=bool)
        t = t.filter(pa.array(fin)) if len(m) else t
        z = (m[fin] - mu) @ vv
        cols = {id_col: t.column(id_col)}
        for c in range(vv.shape[1]):
            cols[f"pc{c + 1}"] = pa.array(
                _r(z[:, c], 6) if len(z) else
                np.zeros(0), type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def ranking_metrics(pred: pd.DataFrame, truth: pd.DataFrame,
                    id_col: str, k: int,
                    score_col: str = "cosine") -> pd.DataFrame:
    """Retrieval-quality metrics of an approximate top-k ``pred``
    against the exact ``truth`` set (both bounded k-row driver
    artifacts, the ANN-family output contract): overlap recall@k and
    MRR (reciprocal rank of the first relevant prediction under the
    pinned (score desc, id asc) ranking).  The standard eval for an
    IVF/LSH index against brute force — run it on a held-out query
    sample before trusting an index at corpus scale.

    Returns one row: (k, n_pred, n_truth, n_overlap, recall_at_k,
    mrr), 6dp floats."""
    from packs_ray.stages.util import round_half_away as _r6

    pr = pred.sort_values([score_col, id_col],
                          ascending=[False, True], kind="stable") \
        .reset_index(drop=True)
    pr["__rnk"] = np.arange(1, len(pr) + 1, dtype=np.int64)
    tset = set(truth[id_col].tolist())
    hits = pr[pr[id_col].isin(tset)]
    n_overlap = int(len(hits))
    mrr = float(_r6(1.0 / float(hits["__rnk"].min()), 6)) \
        if n_overlap else 0.0
    return pd.DataFrame([{
        "k": np.int64(k),
        "n_pred": np.int64(len(pred)),
        "n_truth": np.int64(len(truth)),
        "n_overlap": np.int64(n_overlap),
        "recall_at_k": float(_r6(n_overlap / float(k), 6)),
        "mrr": mrr}])


def kmeans_fit(ds, id_col: str, emb_col: str, *, k: int = 8,
               iters: int = 2, scale: int = 1_000_000):
    """Fully DISTRIBUTED Lloyd k-means over the embedding column — the
    iterative-ML-at-scale shape the IVF helpers avoid by fitting on a
    driver-side sample (`_fit_centroids`).  Here every pass streams the
    WHOLE dataset: assignment is a stateless ``map_batches`` over
    ``ray.put``-broadcast centroids, and the centroid update is an
    exact integer partial — per-(cluster, dim) sums of micro-unit
    quantized coordinates plus per-cluster counts — reduced with one
    narrow groupby shuffle of at most ``k * (dim + 1)`` tiny rows per
    block.  Integer partials make each update order-free, so the whole
    fit is byte-identical under any partition layout / CPU count (the
    classic distributed-kmeans float pitfall is summing raw float
    coordinates, whose value depends on block merge order).

    Determinism contract (mirrored exactly by the SQL oracle):

    - coordinates quantize ONCE: ``xq = round_half_away(x * scale)``
      (int64); all distances use ``xv = xq / scale`` float64;
    - squared distances accumulate dimension-by-dimension in index
      order (`_sq_dist_seq` == the oracle's ``list_sum`` fold);
    - argmin ties go to the lowest cluster index;
    - updated centroid coord = ``round(s / (n * scale), 6)`` half-away;
      empty clusters keep their previous centroid;
    - init = the embeddings of the ``k`` smallest non-null ids;
    - inertia = exact int64 sum of per-row ``round(d2 * scale)`` micro
      distances, divided by ``scale`` once at the end.

    Null id / null embedding rows are excluded.  Returns
    ``(centroids, summary)``: the (k', dim) float64 centroid matrix and
    a k'-row pandas frame ``(cluster_id, n, inertia)`` from a final
    assignment pass (bounded driver artifact, like the ANN outputs).

    Scale shape: ``iters + 2`` streaming passes over a 2-column
    projection (init scan, ``iters`` update passes, final stats pass);
    nothing wide ever materializes.  For k*dim beyond ~10^5 the
    per-block partial should switch from dense to per-present-cluster
    emission — already the case here (zero-count clusters are dropped
    per block)."""
    import pyarrow.compute as pc

    sel = ds.select_columns([id_col, emb_col])
    fscale = float(scale)

    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.is_valid(batch.column(id_col)),
                                    pc.is_valid(batch.column(emb_col))))

    empty = pd.DataFrame({"cluster_id": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "inertia": pd.Series(dtype="float64")})

    # ---- init: embeddings of the k smallest ids (per-block top-k
    # partials -> bounded driver merge; no sort shuffle) ----
    def init_partial(batch: pa.Table) -> pa.Table:
        batch = _valid(batch).select([id_col, emb_col])
        if len(batch) == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(order, type=pa.int64()))

    cand = sel.map_batches(init_partial, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return np.zeros((0, 0)), empty
    order = np.argsort(cand[id_col].to_numpy(), kind="stable")[:k]
    vecs = [np.asarray(v, dtype=np.float64)
            for v in cand[emb_col].to_numpy()[order]]
    ndim = max(len(v) for v in vecs)
    m0 = np.zeros((len(vecs), ndim))
    for i, v in enumerate(vecs):
        m0[i, :len(v)] = v
    cent = _r(m0 * fscale, 0) / fscale          # quantized init centroids

    def _quant(batch: pa.Table) -> np.ndarray:
        m = _fit_dim(_batch_matrix(batch, emb_col), ndim)
        return _r(m * fscale, 0).astype(np.int64)

    # ---- Lloyd iterations: exact integer update partials ----
    for _ in range(iters):
        cref = ray.put(cent)

        def upd_partial(batch: pa.Table, _cref=cref) -> pa.Table:
            centv = ray.get(_cref)
            batch = _valid(batch)
            if len(batch) == 0:
                return pa.table({"cluster": pa.array([], type=pa.int64()),
                                 "dim": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.int64())})
            xq = _quant(batch)
            a = _sq_dist_seq(xq / fscale, centv).argmin(1)
            kk, dd = centv.shape
            sums = np.zeros((kk, dd), dtype=np.int64)
            np.add.at(sums, a, xq)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            cl = np.repeat(np.arange(kk, dtype=np.int64), dd + 1)
            dims = np.tile(np.arange(-1, dd, dtype=np.int64), kk)
            vals = np.concatenate(
                [np.concatenate(([counts[c]], sums[c])) for c in range(kk)])
            keep = np.repeat(counts > 0, dd + 1)   # drop untouched clusters
            return pa.table({"cluster": pa.array(cl[keep]),
                             "dim": pa.array(dims[keep]),
                             "s": pa.array(vals[keep])})

        agg = (sel.map_batches(upd_partial, batch_format="pyarrow")
               .groupby(["cluster", "dim"]).sum("s").to_pandas())
        if agg.empty:
            break
        kk, dd = cent.shape
        counts = np.zeros(kk, dtype=np.int64)
        sums = np.zeros((kk, dd), dtype=np.int64)
        c_arr = agg["cluster"].to_numpy(dtype=np.int64)
        d_arr = agg["dim"].to_numpy(dtype=np.int64)
        s_arr = agg["sum(s)"].to_numpy(dtype=np.int64)
        is_n = d_arr == -1
        counts[c_arr[is_n]] = s_arr[is_n]
        sums[c_arr[~is_n], d_arr[~is_n]] = s_arr[~is_n]
        nz = counts > 0
        new = cent.copy()
        new[nz] = _r(sums[nz] / (counts[nz, None].astype(np.float64)
                                 * fscale), 6)
        cent = new

    # ---- final assignment + exact micro-int inertia ----
    cref = ray.put(cent)

    def stats_partial(batch: pa.Table, _cref=cref) -> pa.Table:
        centv = ray.get(_cref)
        batch = _valid(batch)
        if len(batch) == 0:
            return pa.table({"cluster": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "iq": pa.array([], type=pa.int64())})
        xq = _quant(batch)
        d2 = _sq_dist_seq(xq / fscale, centv)
        a = d2.argmin(1)
        iq = _r(d2[np.arange(len(a)), a] * fscale, 0).astype(np.int64)
        kk = centv.shape[0]
        counts = np.bincount(a, minlength=kk).astype(np.int64)
        isums = np.zeros(kk, dtype=np.int64)
        np.add.at(isums, a, iq)
        keep = counts > 0
        return pa.table(
            {"cluster": pa.array(np.arange(kk, dtype=np.int64)[keep]),
             "n": pa.array(counts[keep]), "iq": pa.array(isums[keep])})

    stats = (sel.map_batches(stats_partial, batch_format="pyarrow")
             .groupby("cluster").sum(["n", "iq"]).to_pandas())
    if stats.empty:
        return cent, empty
    out = pd.DataFrame({
        "cluster_id": stats["cluster"].astype("int64"),
        "n": stats["sum(n)"].astype("int64"),
        "inertia": stats["sum(iq)"].to_numpy(dtype=np.float64) / fscale})
    return cent, out.sort_values("cluster_id").reset_index(drop=True)


def dim_truncation_eval(ds, id_col: str, emb_col: str,
                        query: np.ndarray, *, dims=(8, 16, 32, 64),
                        k: int = 10) -> pd.DataFrame:
    """Matryoshka-style dimension-truncation retrieval eval: how much
    recall@k / MRR survives when both corpus and query vectors are
    truncated to their first ``d`` dimensions (the MRL deployment
    question — can the 100-TB index store d=16 prefixes instead of
    full vectors).  Truth = the full-dimension exact top-k.

    ONE corpus scan computes every truncation level: per batch, one
    (n, d_full) matrix is sliced per d, cosine = dot over the prefix
    divided by prefix norms (float64), local top-k per d selected
    under the global (cosine 6dp desc, id asc) order so cross-batch
    merging is deterministic; the driver merges blocks × |dims| × k
    rows and scores each level against the full-dim level.

    Output: one row per d — (dim, k, n_overlap, recall_at_k, mrr)."""
    from packs_ray.functions.similarity import ranking_metrics
    from packs_ray.stages.util import round_half_away as _r6

    q = np.asarray(query, dtype=np.float64)
    dims = tuple(sorted({int(d) for d in dims} | {len(q)}))
    qref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _fit_dim(_batch_matrix(batch, emb_col), len(qv))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_d, out_id, out_cos = [], [], []
        for d in dims:
            md, qd = m[:, :d], qv[:d]
            qn = np.linalg.norm(qd)
            norms = np.linalg.norm(md, axis=1) * (qn if qn > 0 else 1.0)
            cos = (md @ qd) / np.where(norms > 0, norms, 1.0)
            cr = _r(cos, 6)
            top = np.lexsort((ids, -cr))[:k]
            out_d.append(np.full(len(top), d, dtype=np.int64))
            out_id.append(ids[top])
            out_cos.append(cr[top])
        return pa.table({"dim": np.concatenate(out_d),
                         id_col: pa.array(np.concatenate(out_id)),
                         "cosine": pa.array(np.concatenate(out_cos),
                                            type=pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "dim": pd.Series([], dtype="int64"),
            "k": pd.Series([], dtype="int64"),
            "n_overlap": pd.Series([], dtype="int64"),
            "recall_at_k": pd.Series([], dtype="float64"),
            "mrr": pd.Series([], dtype="float64")})
    top = (parts.sort_values(["dim", "cosine", id_col],
                             ascending=[True, False, True], kind="stable")
           .groupby("dim", sort=True).head(k))
    truth = top[top["dim"] == len(q)]
    rows = []
    for d in dims:
        pred = top[top["dim"] == d].reset_index(drop=True)
        m = ranking_metrics(pred, truth, id_col, k)
        m.insert(0, "dim", np.int64(d))
        rows.append(m[["dim", "k", "n_overlap", "recall_at_k", "mrr"]])
    return pd.concat(rows, ignore_index=True)


def moment_drift(ds_a, ds_b, emb_col: str, *, dim: int = 64) -> pd.DataFrame:
    """Second-moment distribution drift between two embedding feeds —
    the shape-change detector :func:`embedding_drift` (centroid cosine,
    1st moment) cannot see: a feed can keep its mean while its spread
    or correlation structure shifts (encoder retrain, domain mix
    change).  The statistic is the quadratic-kernel MMD^2 in closed
    form, ||E[xxT]_a - E[xxT]_b||_F^2 — moment matching instead of a
    pairwise kernel sum, so it reduces EXACTLY to the micro-int power
    sums of `_cov_power_sums` (order-free integer partials; no pair
    sampling, no RNG), plus the L2 mean gap for the 1st moment.

    Floats: per-cell deltas and the two folds (ascending i, then
    (i, j)) are the only float ops, pinned to the oracle's list_sum
    order; off-diagonal cells weight 2 (symmetry).

    Output: one row (n_a, n_b, mean_l2, mmd2_quad), 9dp."""
    import math

    from packs_ray.stages.util import round_half_away as _r9

    na, s1a, s2a = _cov_power_sums(ds_a, emb_col, dim)
    nb, s1b, s2b = _cov_power_sums(ds_b, emb_col, dim)
    if na == 0 or nb == 0:
        return pd.DataFrame([{"n_a": np.int64(na), "n_b": np.int64(nb),
                              "mean_l2": None, "mmd2_quad": None}])
    g = 0.0
    for i in range(dim):                       # left fold == list_sum
        di = (float(s1a[i]) / na - float(s1b[i]) / nb) / 1e6
        g += di * di
    f = 0.0
    for (i, j) in sorted(set(s2a) | set(s2b)):
        dij = (float(s2a.get((i, j), 0)) / na
               - float(s2b.get((i, j), 0)) / nb) / 1e12
        w = 1.0 if i == j else 2.0
        f += w * (dij * dij)
    return pd.DataFrame([{
        "n_a": np.int64(na), "n_b": np.int64(nb),
        "mean_l2": float(_r9(math.sqrt(g), 9)),
        "mmd2_quad": float(_r9(f, 9))}])


def ivf_append(new_ds, id_col: str, emb_col: str,
               index_dir: str) -> int:
    """Incremental IVF index maintenance: assign NEW vectors to the
    EXISTING persisted centroids and append them to the index's hive
    partitions — the streaming-ingest path :func:`ivf_build` (full
    rebuild) can't serve: at 100 TB a nightly feed appends millions of
    vectors and must not re-shuffle the corpus.  Centroids stay fixed
    (the standard IVF maintenance contract — rebuild when the
    assignment-distance distribution drifts; ``ivf_query`` needs no
    change because parquet appends are new files in the same
    ``ivf_bucket=`` directories).

    Returns the number of vectors appended.  Ray's parquet writer
    UUIDs its filenames, so repeated appends never clobber; callers
    needing exactly-once should stage via the checkpoint manifest
    (state/checkpoint.py) like the curation pipelines."""
    import os

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        centv = ray.get(cref)
        m = _batch_matrix(batch, emb_col)
        d = _sq_dist_seq(m, centv)
        return pa.table({id_col: batch.column(id_col),
                         emb_col: batch.column(emb_col),
                         "ivf_bucket": pa.array(
                             d.argmin(1).astype(np.int64))})

    out = (new_ds.select_columns([id_col, emb_col])
           .map_batches(assign, batch_format="pyarrow")).materialize()
    n = out.count()
    if n:
        out.write_parquet(index_dir, partition_cols=["ivf_bucket"])
    return n
