"""Referential-integrity checks (FK anti-join orphan counting).

Reference: referential_integrity_pack/main.py:16-79 (anti-join orphan
count, multi-column keys).

Scale: broadcast anti-join — the parent key set is collected once
(distinct keys, usually small), shipped via ``ray.put`` and read in every
task's first use; the child table streams through ``map_batches`` and is
never shuffled.  For large-large anti-joins co-partition both sides on
key hash (see packs_ray.stages.dedup bucket pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from packs_ray.functions.agg import global_agg
from packs_ray.stages.util import round_half_away as _r
from packs_ray.stages.util import table_from_pandas as _table_from_pandas


def _combined_hash(arrays: list[np.ndarray]) -> np.ndarray:
    """Order-sensitive 64-bit combine of per-column hashes — turns a
    multi-column key into one sortable array (collision odds
    ~|parent|x|child|/2^64, negligible; a collision can only under-count
    orphans by one)."""
    import pandas as pd

    P = np.uint64(0x9E3779B97F4A7C15)
    h = np.full(len(arrays[0]), np.uint64(0xCBF29CE484222325))
    for a in arrays:
        ha = pd.util.hash_array(np.asarray(a, dtype=object))
        h = (h * P) ^ ha
    return h.view(np.int64)


BROADCAST_CAP = 20_000_000  # parent rows above this → bucketed anti-join


def _orphans_broadcast(child_ds, child_keys, parent_ds, parent_keys):
    """Small parent: distinct keys → ONE broadcast array → streamed isin."""
    # null keys NEVER match (SQL join / pandas merge semantics): null
    # parent keys are dropped; null child keys always count as orphans
    if len(parent_keys) == 1:
        uniq = parent_ds.select_columns(parent_keys).unique(parent_keys[0])
        vals = np.asarray([v for v in np.asarray(uniq).ravel()
                           if v is not None and not (isinstance(v, float)
                                                     and np.isnan(v))])
        parent_bc = np.sort(vals)  # sorted ONCE, on the driver
    else:
        # multi-column: combine to one 64-bit hash per key, sort once —
        # membership then stays a vectorized searchsorted like the
        # single-column path (no per-row tuple/set lookups)
        rows = parent_ds.select_columns(parent_keys).to_pandas()
        if rows.empty:
            rows = pd.DataFrame(columns=parent_keys)
        rows = rows.dropna(subset=parent_keys)
        parent_bc = np.unique(_combined_hash(
            [rows[c].to_numpy() for c in parent_keys]))
    ref = ray.put(parent_bc)

    def partial(batch: pa.Table) -> dict:
        pkeys = ray.get(ref)
        if len(child_keys) == 1:
            col = batch.column(child_keys[0])
            null_keys = col.null_count
            keys = col.drop_null().to_numpy(zero_copy_only=False)
        else:
            df = batch.select(child_keys).to_pandas()
            nn = df.dropna(subset=child_keys)
            null_keys = len(df) - len(nn)
            keys = _combined_hash([nn[c].to_numpy() for c in child_keys])
        if len(pkeys) and len(keys):
            idx = np.clip(np.searchsorted(pkeys, keys), 0, len(pkeys) - 1)
            orphans = int((pkeys[idx] != keys).sum())
        else:
            orphans = len(keys)
        return {"total": batch.num_rows, "orphans": orphans + null_keys}

    def combine(p: pd.DataFrame) -> dict:
        return {"total": int(p["total"].sum()), "orphans": int(p["orphans"].sum())}

    return global_agg(child_ds, partial, combine)


def _orphans_bucketed(child_ds, child_keys, parent_ds, parent_keys,
                      num_partitions: int | None = None):
    """Large-large: co-partition BOTH sides on key hash (child side ships
    only per-batch distinct keys + counts), per-bucket set difference."""
    from packs_ray.functions.agg import bucketed_group_reduce, keyed_count, \
        reduce_partition_count

    if num_partitions is None:
        num_partitions = max(reduce_partition_count(child_ds),
                             reduce_partition_count(parent_ds))

    # Null child keys are orphans BY DEFINITION (SQL join semantics — same
    # contract as the broadcast path).  Count them in one streaming pass
    # and exclude them from the exchange entirely: a nullable int64 key
    # would otherwise promote to float64 through the pandas reduce and
    # hash into different buckets than the parent's int64 keys.
    child_proj = child_ds.select_columns(child_keys)

    def _valid_mask(batch: pa.Table):
        mask = None
        for c in child_keys:
            v = pa.compute.is_valid(batch.column(c))
            mask = v if mask is None else pa.compute.and_(mask, v)
        return mask

    null_child = global_agg(
        child_proj,
        lambda b: {"nulls": len(b) - (pa.compute.sum(
            pa.compute.cast(_valid_mask(b), "int64")).as_py() or 0)},
        lambda p: {"nulls": int(p["nulls"].sum())})["nulls"]

    child_nonnull = child_proj.map_batches(
        lambda b: b.filter(_valid_mask(b)), batch_format="pyarrow")
    child_counts = keyed_count(child_nonnull, child_keys,
                               num_partitions=num_partitions)

    def mark_side(side: int, keys: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {f"k{i}": batch.column(c) for i, c in enumerate(keys)}
            cols["cnt"] = (batch.column("cnt") if side == 0
                           else pa.array(np.zeros(n, dtype=np.int64)))
            cols["side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)
        return fn

    kcols = [f"k{i}" for i in range(len(child_keys))]
    child_marked = child_counts.map_batches(mark_side(0, child_keys),
                                            batch_format="pyarrow")

    def drop_null_keys(batch: pa.Table) -> pa.Table:
        # null parent keys never match (SQL join semantics — same contract
        # as the broadcast path); dropping them here also stops the pandas
        # merge below from NaN==NaN-matching a null child key
        mask = None
        for c in parent_keys:
            valid = pa.compute.is_valid(batch.column(c))
            mask = valid if mask is None else pa.compute.and_(mask, valid)
        return batch.filter(mask)

    parent_marked = (parent_ds.select_columns(parent_keys)
                     .map_batches(drop_null_keys, batch_format="pyarrow")
                     .map_batches(mark_side(1, parent_keys),
                                  batch_format="pyarrow"))

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        have_parent = g.loc[g["side"] == 1, kcols].drop_duplicates()
        child = g[g["side"] == 0]
        merged = child.merge(have_parent.assign(__hit=1), how="left", on=kcols)
        orphans = int(merged.loc[merged["__hit"].isna(), "cnt"].sum())
        total = int(child["cnt"].sum())
        return pd.DataFrame({"total": [total], "orphans": [orphans]})

    parts = bucketed_group_reduce(child_marked.union(parent_marked), kcols,
                                  reduce_fn, num_partitions).to_pandas()
    return {"total": int(parts["total"].sum()) + null_child,
            "orphans": int(parts["orphans"].sum()) + null_child}


def fk_orphans(child_ds, child_keys: list[str], parent_ds,
               parent_keys: list[str]) -> pd.DataFrame:
    """Count child rows whose key is absent from the parent key set.
    Broadcast anti-join for small parents; hash-bucketed co-partition
    anti-join when the parent side exceeds BROADCAST_CAP rows."""
    try:
        parent_rows = parent_ds.count()
    except Exception:
        parent_rows = 0
    if parent_rows > BROADCAST_CAP:
        agg = _orphans_bucketed(child_ds, child_keys, parent_ds, parent_keys)
    else:
        agg = _orphans_broadcast(child_ds, child_keys, parent_ds, parent_keys)
    total, orphans = agg["total"], agg["orphans"]
    return pd.DataFrame([{
        "child_rows": total, "orphan_rows": orphans,
        "orphan_percent": float(_r(orphans / total, 4)) if total else 0.0,
        "score": max(0.0, 1 - (orphans / total if total else 0.0)),
    }])


def key_overlap(ds_a, ds_b, key_a: str, key_b: str | None = None) -> "pd.DataFrame":
    """Join-cardinality diagnostic between two tables' key sets: exact
    distinct counts on each side, the intersection size, Jaccard, and
    both containment ratios — what you check BEFORE running an
    equi-join / FK validation at scale (a containment far below 1.0
    predicts orphan volume; see ``fk_orphans``).

    Exactness: per-batch distinct (key, side) marks ride one bucketed
    shuffle; each bucket reduces to three exact integers, driver sums
    the bounded per-bucket partials.  Ratios are pinned 6dp float64
    shared with the SQL replica.  Null keys are excluded (SQL DISTINCT
    join semantics: null never matches)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)
    from packs_ray.stages.util import round_half_away as _r

    if key_b is None:
        key_b = key_a

    def marks(col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(col).drop_null().unique()
            return pa.table({
                "k": pc.cast(k, pa.string()),
                "side": pa.array(np.full(len(k), side, dtype=np.int8))})
        return fn

    parts = ds_a.select_columns([key_a]) \
        .map_batches(marks(key_a, 0), batch_format="pyarrow") \
        .union(ds_b.select_columns([key_b])
               .map_batches(marks(key_b, 1), batch_format="pyarrow"))

    nparts = max(reduce_partition_count(ds_a),
                 reduce_partition_count(ds_b))

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        # distinct within the bucket (marks repeat across batches)
        d = g.drop_duplicates()
        a = d.loc[d["side"] == 0, "k"].to_numpy()
        b = d.loc[d["side"] == 1, "k"].to_numpy()
        return pd.DataFrame([{
            "n_a": len(a), "n_b": len(b),
            "n_common": len(np.intersect1d(a, b))}])

    per_bucket = bucketed_group_reduce(parts, ["k"], reduce_fn,
                                       nparts).to_pandas()
    if per_bucket.empty:  # no non-null key on either side
        per_bucket = pd.DataFrame([{"n_a": 0, "n_b": 0, "n_common": 0}])
    na = int(per_bucket["n_a"].sum())
    nb = int(per_bucket["n_b"].sum())
    nc = int(per_bucket["n_common"].sum())
    union = na + nb - nc
    return pd.DataFrame([{
        "n_keys_a": np.int64(na), "n_keys_b": np.int64(nb),
        "n_common": np.int64(nc),
        "jaccard": float(_r(nc / union, 6)) if union else None,
        "containment_a": float(_r(nc / na, 6)) if na else None,
        "containment_b": float(_r(nc / nb, 6)) if nb else None}])


def candidate_keys(ds, columns: list[str], *, max_arity: int = 2,
                   num_partitions: int | None = None) -> pd.DataFrame:
    """Candidate-key discovery: for every column combination up to
    ``max_arity``, the exact distinct-tuple count and whether it equals
    the row count — the uniqueness half of profiling-era key detection
    (which columns could be a primary key? which pairs?), with NULL
    treated as a value (SQL ``SELECT DISTINCT`` grouping semantics,
    NOT ``count(DISTINCT)``'s null-dropping).

    Scale shape: one pass emits per-block LOCALLY-DEDUPED 128-bit tuple
    hashes tagged by combo id (<= 24 B/mark), ONE narrow shuffle on
    hash bucket, per-bucket exact dedup, and a driver-side sum over the
    tiny (combo, bucket) count table.  Values are hashed from their
    Arrow-cast string form so block-level pandas dtype drift (int64 vs
    float64-with-NaN) cannot split a value across buckets."""
    from itertools import combinations

    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    combos = [list(c) for r in range(1, max_arity + 1)
              for c in combinations(columns, r)]
    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    n_rows = ds.count()

    P = np.uint64(0x9E3779B97F4A7C15)

    def marks(batch: pa.Table) -> pa.Table:
        svs = {}
        for c in columns:
            col = pc.cast(batch.column(c), pa.string())
            svs[c] = (col.to_pandas().fillna("\x00<null>")
                      .to_numpy(dtype=object))
        outs = []
        for cid, cols in enumerate(combos):
            h1 = np.full(batch.num_rows, np.uint64(0xCBF29CE484222325))
            h2 = np.full(batch.num_rows, np.uint64(0x84222325CBF29CE4))
            for c in cols:
                h1 = (h1 * P) ^ pd.util.hash_array(
                    svs[c], hash_key="0123456789123456")
                h2 = (h2 * P) ^ pd.util.hash_array(
                    svs[c], hash_key="6543216543210987")
            part = pd.DataFrame({
                "__cid": np.full(batch.num_rows, cid, dtype=np.int64),
                "__h1": h1.view(np.int64), "__h2": h2.view(np.int64),
            }).drop_duplicates()
            outs.append(part)
        out = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            {"__cid": [], "__h1": [], "__h2": []}, dtype="int64")
        out["__p"] = (out["__h1"].to_numpy().view(np.uint64)
                      % np.uint64(num_partitions)).astype(np.int64)
        return _table_from_pandas(out, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.drop_duplicates(["__cid", "__h1", "__h2"])
             .groupby("__cid", sort=False).size().reset_index(name="nd"))
        d["nd"] = d["nd"].astype("int64")
        return d[["__cid", "nd"]]

    agg = (ds.map_batches(marks, batch_format="pyarrow")
           .groupby("__p").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    by_cid = (agg.groupby("__cid")["nd"].sum() if len(agg)
              else pd.Series(dtype="int64"))
    rows = []
    for cid, cols in enumerate(combos):
        nd = int(by_cid.get(cid, 0))
        rows.append({"combo": ",".join(cols), "n_distinct": nd,
                     "n_rows": int(n_rows), "is_key": nd == n_rows})
    out = pd.DataFrame(rows).sort_values("combo").reset_index(drop=True)
    out["n_distinct"] = out["n_distinct"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def id_gaps(ds, id_col: str, num_partitions: int | None = None) -> pd.DataFrame:
    """Global id-sequence gap profile: how contiguous is a surrogate-key
    / offset column?  (n_ids, min_id, max_id, span, n_missing, max_gap,
    n_gaps) where a \"gap\" is a maximal run of absent values between
    two present ids — the batch-ingest loss detector (a dropped file
    shows up as one wide gap, steady sampling as many unit gaps).
    Duplicates collapse (distinct ids); null ids drop.

    Scale shape: RANGE-bucketed by id//span so adjacency is local —
    each bucket reduces its sorted distinct ids to a fixed-width
    summary (min, max, count, max internal gap, internal gap count);
    the driver stitches only consecutive bucket summaries.  Two narrow
    passes (global min/max, then the bucketed reduce); the id column
    never leaves the cluster un-reduced."""
    import pyarrow.compute as pc

    from packs_ray.functions.agg import row_shuffle_partitions

    if num_partitions is None:
        num_partitions = row_shuffle_partitions(ds)
    proj = ds.select_columns([id_col])
    lo = proj.min(id_col)
    hi = proj.max(id_col)
    empty = pd.DataFrame([{"n_ids": 0, "min_id": None, "max_id": None,
                           "span": 0, "n_missing": 0, "max_gap": 0,
                           "n_gaps": 0}])
    if lo is None or hi is None:
        return empty
    lo, hi = int(lo), int(hi)
    span = max(1, -(-(hi - lo + 1) // num_partitions))

    def marks(batch: pa.Table) -> pa.Table:
        ids = np.unique(batch.column(id_col).drop_null()
                        .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"id": pa.array(ids),
                         "__b": pa.array((ids - lo) // span)})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["id"].to_numpy(np.int64))
        d = np.diff(ids) - 1
        return pd.DataFrame([{
            "__b": int(g["__b"].iloc[0]), "mn": int(ids[0]),
            "mx": int(ids[-1]), "cnt": int(len(ids)),
            "mg": int(d.max()) if len(d) else 0,
            "ng": int((d > 0).sum())}])

    s = (proj.map_batches(marks, batch_format="pyarrow")
         .groupby("__b").map_groups(per_bucket, batch_format="pandas")
         .to_pandas().sort_values("__b").reset_index(drop=True))
    if s.empty:
        return empty
    max_gap = int(s["mg"].max())
    n_gaps = int(s["ng"].sum())
    bound = s["mn"].to_numpy(np.int64)[1:] - s["mx"].to_numpy(np.int64)[:-1] - 1
    if len(bound):
        max_gap = max(max_gap, int(bound.max()))
        n_gaps += int((bound > 0).sum())
    n_ids = int(s["cnt"].sum())
    return pd.DataFrame([{
        "n_ids": n_ids, "min_id": lo, "max_id": hi,
        "span": hi - lo + 1, "n_missing": (hi - lo + 1) - n_ids,
        "max_gap": max_gap, "n_gaps": n_gaps}])


def table_fingerprint(ds, cols: list[str], *, buckets: int = 16):
    """Order-free table fingerprint for cross-system reconciliation:
    every row hashes to 64 bits (FNV-1a + finalize over the
    concatenated LENGTH-PREFIXED string casts — each field rides as
    ``{char_len}:{value}`` and null as ``N:``, so the encoding is
    prefix-free: no value, including one containing separators or a
    would-be sentinel literal, can alias another row), and each
    of ``buckets`` hash buckets reports (n_rows, sum of hashes mod
    2^64).  Addition is commutative, so the digest is independent of
    row order, partitioning and cluster size — two systems holding the
    same rows produce identical digests, and a mismatch localizes to a
    bucket (re-run on the suspect bucket's rows to drill down).

    Cast caveat (documented contract): string/integer columns format
    identically everywhere; floats/timestamps should be pre-rounded to
    strings by the caller before fingerprinting (float shortest-
    round-trip formatting is not cross-engine stable).

    Scale shape: one streaming pass; per-batch partials are
    ``buckets`` rows of (bucket, n, wrapped-sum) — uint64 wraparound
    IS the mod, so partials stay int64-width and merge by addition.

    Output: (bucket, n_rows, digest) with digest as the decimal
    string of the 64-bit sum, plus n_rows; ordered by bucket."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from packs_ray.functions.sketches import _finalize, _fnv1a_str

    nb = int(buckets)

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = batch.column(c)
            s = col.cast(pa.string())
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            ln = pc.utf8_length(s).cast(pa.string())
            enc = pc.binary_join_element_wise(ln, s, ":")  # {len}:{val}
            parts.append(pc.fill_null(enc, "N:"))
        joined = pc.binary_join_element_wise(*parts, "") \
            if len(parts) > 1 else parts[0]
        h, _valid = _fnv1a_str(joined.combine_chunks()
                               if isinstance(joined, pa.ChunkedArray)
                               else joined)
        h = _finalize(h)
        b = (h % np.uint64(nb)).astype(np.int64)
        ns = np.zeros(nb, dtype=np.int64)
        dg = np.zeros(nb, dtype=np.uint64)
        for i in range(nb):
            m = b == i
            ns[i] = int(m.sum())
            dg[i] = h[m].sum(dtype=np.uint64)   # wraps == mod 2^64
        return pa.table({
            "bucket": pa.array(np.arange(nb, dtype=np.int64)),
            "n": pa.array(ns),
            "d": pa.array(dg.astype(np.int64))})  # two's-complement carry

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                             "n_rows": pd.Series([], dtype="int64"),
                             "digest": pd.Series([], dtype="object")})
    g = parts.groupby("bucket", sort=True)
    rows = []
    for b, gg in g:
        n = int(gg["n"].sum())
        d = sum(int(x) & 0xFFFFFFFFFFFFFFFF
                for x in gg["d"].to_numpy(np.int64)) % (1 << 64)
        rows.append({"bucket": np.int64(b), "n_rows": np.int64(n),
                     "digest": str(d)})
    return pd.DataFrame(rows)


def ref_integrity_chain(edges: list[tuple[str, "object", list[str],
                                          "object", list[str]]]
                        ) -> pd.DataFrame:
    """Schema-level referential-integrity audit: run the
    :func:`fk_orphans` anti-join over EVERY declared FK edge of a
    schema in one call and emit the per-edge report — the "is the
    whole star intact" overview a single fk check can't give (orders →
    customer → nation → region each individually green can still hide
    a broken edge elsewhere).

    ``edges`` entries are (name, child_ds, child_keys, parent_ds,
    parent_keys); each edge reuses fk_orphans' broadcast-or-bucketed
    shape unchanged.

    Output: one row per edge — (edge, child_rows, orphan_rows,
    orphan_percent), in the declared edge order."""
    import numpy as np

    rows = []
    for name, child, ck, parent, pk in edges:
        r = fk_orphans(child, ck, parent, pk).iloc[0]
        rows.append({"edge": name,
                     "child_rows": np.int64(r["child_rows"]),
                     "orphan_rows": np.int64(r["orphan_rows"]),
                     "orphan_percent": float(r["orphan_percent"])})
    return pd.DataFrame(rows)


def row_completeness(ds, cols: list[str], *, n_bins: int | None = None
                     ) -> pd.DataFrame:
    """Row-level completeness distribution: for each row, how many of
    ``cols`` are non-null — the per-RECORD view column completeness
    (:func:`functions.profiling`) aggregates away: a table can be 90 %
    complete per column yet have zero fully-complete rows.

    Exact histogram over 0..len(cols) non-null counts via one
    vectorized validity-sum pass and a bounded (len(cols)+1)-row
    reduce.

    Output: (n_nonnull, n_rows, pct 6dp) ascending, plus the count of
    fully-complete rows is the last bucket."""
    import numpy as np

    from packs_ray.functions.agg import keyed_count
    from packs_ray.stages.util import round_half_away as _rh

    def partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        acc = np.zeros(n, dtype=np.int64)
        for c in cols:
            acc += batch.column(c).is_valid().to_numpy(
                zero_copy_only=False).astype(np.int64)
        return pa.table({"n_nonnull": pa.array(acc)})

    counts = keyed_count(ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow"), ["n_nonnull"],
        count_col="n_rows").to_pandas()
    if not len(counts):
        return pd.DataFrame({"n_nonnull": pd.Series([], dtype="int64"),
                             "n_rows": pd.Series([], dtype="int64"),
                             "pct": pd.Series([], dtype="float64")})
    counts = counts.sort_values("n_nonnull").reset_index(drop=True)
    total = int(counts["n_rows"].sum())
    counts["pct"] = _rh(counts["n_rows"].to_numpy(np.float64)
                        / (total * 1.0), 6)
    return counts.astype({"n_nonnull": "int64", "n_rows": "int64",
                          "pct": "float64"})
