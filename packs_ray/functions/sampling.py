"""Deterministic sampling / dataset mixing.

Training-data pipelines mix sources at configured rates (web 40 %,
code 10 %, ...).  At 100 TB the sample decision must be a pure function
of the row — no RNG state, no coordination — so any worker, any retry,
any resume produces the same subset.  The gate here is
``hash(id, salt) % 1e6 < rate * 1e6`` with the engine's FNV-1a +
multiply-rotate-multiply finalizer (packs_ray.functions.sketches),
which the DuckDB oracle replicates exactly.

The reference's only sampling is positional ``head()``
(profiling_pack/main.py:65-133) and an UNSEEDED ``np.random.choice``
(outlier_detection_pack/main.py:206-209) — i.e. non-reproducible; this
operator is the reproducible replacement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from packs_ray.functions.sketches import _finalize, _fnv1a_str
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

_MOD = np.uint64(1_000_000)


def _salt_constant(salt: str) -> np.uint64:
    """Odd 64-bit constant from FNV-1a of the salt string (odd so the
    pre-multiply stays a bijection mod 2^64)."""
    h = 14695981039346656037
    for b in salt.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) % (1 << 64)
    return np.uint64(h | 1)


def sample_mask(col: pa.Array, rate: float, salt: str = "") -> np.ndarray:
    """Boolean keep-mask: hash(value, salt) lands under the rate
    threshold.  Null values are never kept."""
    h, valid = _fnv1a_str(col)
    h = _finalize(h * _salt_constant(salt))
    thr = np.uint64(int(round(rate * 1e6)))
    return valid & ((h % _MOD) < thr)


def deterministic_sample(ds, id_col: str, rate: float, *, salt: str = ""):
    """Filter a Dataset to a reproducible ``rate`` fraction keyed on
    ``id_col`` (same id -> same decision, on any cluster, any retry)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(
            sample_mask(batch.column(id_col), rate, salt)))

    return ds.map_batches(fn, batch_format="pyarrow")


def mixture_sample(sources: list[tuple[str, "object", str, float]]):
    """Mix sources at per-source rates: each element is
    ``(name, ds, id_col, rate)``; rows are gated by
    hash(id, salt=name) < rate and emitted as (source, id).  The union
    is lazy — each branch streams independently, no shuffle."""
    outs = []
    for name, ds, id_col, rate in sources:
        def fn(batch: pa.Table, _n=name, _c=id_col, _r=rate) -> pa.Table:
            keep = sample_mask(batch.column(_c), _r, _n)
            ids = batch.column(_c).cast(pa.int64())
            t = pa.table({"source": pa.array([_n] * batch.num_rows),
                          "id": ids}).filter(pa.array(keep))
            return t
        outs.append(ds.map_batches(fn, batch_format="pyarrow"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def hash_split(ds, id_col: str, fractions: dict[str, float], *,
               salt: str = "split"):
    """Add a ``split`` column assigning each row to a named split by
    hash band — keyed on ``id_col`` so rows sharing a key (e.g. all
    turns of a conversation) land in the SAME split: no train/val
    leakage, reproducible anywhere.  Fractions must sum to ~1; bands
    are cumulative thresholds over hash(id, salt) % 1e6.  Null ids get
    a null split."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions sum to {total}, expected 1")
    names = list(fractions)
    edges = np.cumsum([int(round(fractions[n] * 1e6)) for n in names])
    edges[-1] = 1_000_000            # absorb rounding in the last band
    sc = _salt_constant(salt)

    def fn(batch: pa.Table) -> pa.Table:
        h, valid = _fnv1a_str(batch.column(id_col))
        band = np.searchsorted(edges, (_finalize(h * sc) % _MOD)
                               .astype(np.int64), side="right")
        labels = np.array(names, dtype=object)[np.minimum(band, len(names) - 1)]
        return batch.append_column(
            "split", pa.array([l if v else None
                               for l, v in zip(labels, valid)],
                              type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, id_col: str, n_per_group: int, *,
                      salt: str = "", num_partitions: int | None = None):
    """Deterministic stratified sampling: at most ``n_per_group`` rows
    per ``group_col`` value, chosen as the lowest finalized
    ``hash(id, salt)`` (ties broken by id) — a pure function of the row,
    so the sample is identical across clusters/retries/block splits,
    unlike reservoir sampling (RNG + order dependent).

    Scale shape: per-batch local head-n combiner first (at most n rows
    per (batch, group) survive), then the bucketed vectorized reduce —
    full rows never shuffle beyond the surviving candidates."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    sc = _salt_constant(salt)

    def add_hash(batch: pa.Table) -> pa.Table:
        h, valid = _fnv1a_str(batch.column(id_col))
        hv = (_finalize(h * sc) >> np.uint64(1)).astype(np.int64)
        t = batch.append_column("__hv", pa.array(hv))
        return t.filter(pa.array(valid))      # null ids never sampled

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__hv", id_col], kind="stable")
        return df.groupby(group_col, dropna=False, sort=False).head(n_per_group)

    def partial(batch: pa.Table) -> pa.Table:
        return _table_from_pandas(local(batch.to_pandas()),
                                    preserve_index=False)

    parts = (ds.map_batches(add_hash, batch_format="pyarrow")
             .map_batches(partial, batch_format="pyarrow"))
    out = bucketed_group_reduce(parts, [group_col], local, num_partitions)
    return out.drop_columns(["__hv"])


def weighted_sample(ds, id_col: str, weight_col: str, n: int, *,
                    salt: str = ""):
    """Deterministic weighted sampling without replacement: ``n`` rows
    drawn with probability proportional to ``weight_col`` — the
    Efraimidis–Spirakis exponential-key scheme (key = -ln(u)/w, keep
    the n SMALLEST keys), with the uniform u derived from
    ``hash(id, salt)`` instead of an RNG, so any worker/retry/resume
    produces the identical subset (the DSIR-resampling companion:
    weight by exp(importance) and this draws the selection).

    Rows with null id, null weight, or weight <= 0 are never sampled.
    Scale shape: per-batch local head-n (at most n rows survive any
    batch), then one tiny single-bucket reduce over <= n*blocks
    candidate rows — full rows never shuffle.

    Returns a lazy Dataset of the winning (id_col, weight_col, key)
    rows; ``key`` (10dp) makes the draw auditable and deterministic to
    sort on — selection itself uses the unrounded key."""
    import pandas as pd

    from packs_ray.functions.agg import bucketed_group_reduce
    from packs_ray.stages.util import round_half_away as _r

    sc = _salt_constant(salt)

    def add_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = batch.column(weight_col)
        valid_w = pc.and_(pc.is_valid(w),
                          pc.greater(pc.cast(w, pa.float64()), 0.0))
        batch = batch.filter(pc.fill_null(valid_w, False))
        h, valid = _fnv1a_str(batch.column(id_col))
        batch = batch.filter(pa.array(valid))
        h = _finalize(h[valid] * sc)
        # 53-bit mantissa uniform in (0, 1]; +1 keeps u > 0 so the key
        # is finite (an exact-zero u would win every draw)
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) * 2.0 ** -53
        wv = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        key = -np.log(u) / wv
        t = pa.table({id_col: batch.column(id_col),
                      weight_col: batch.column(weight_col),
                      "key": pa.array(key, type=pa.float64())})
        df = t.to_pandas().sort_values(["key", id_col], kind="stable").head(n)
        df["__one"] = np.int64(1)
        return _table_from_pandas(df, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["key", id_col], kind="stable").head(n)
               .drop(columns="__one"))
        out["key"] = _r(out["key"].to_numpy(), 10)
        return out

    parts = ds.select_columns([id_col, weight_col]) \
        .map_batches(add_key, batch_format="pyarrow")
    return bucketed_group_reduce(parts, ["__one"], reduce_fn, 1)


def budget_sample(ds, id_col: str, source_col: str, tokens_col: str,
                  budgets: "dict[str, int]", *, salt: str = ""):
    """Token-budget mixture construction (the LLaMA/DoReMi "fill each
    source's token budget" step): within each source, rows are ordered
    by finalized ``hash(id, salt)`` (ties by id — the deterministic
    shuffle order of ``assign_shards``) and kept while the running token
    total BEFORE the row is under the source's budget, so every source
    overshoots by at most one document.  Sources absent from
    ``budgets`` (and null ids) are dropped.

    Scale shape: rows are pre-filtered to budgeted sources, then only
    (id, source, tokens, hv) marks ride ONE shuffle that lands each
    source in a single bucket (the sessionize partitioning contract —
    a mixture spec has few sources by construction); the budget scan is
    a single vectorized int64 cumsum per bucket, exact by integer
    associativity.  Returns a lazy Dataset of
    (id_col, source_col, tokens_col) survivors."""
    import pandas as pd

    sc = _salt_constant(salt)
    allowed = set(budgets)

    def add_hash(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.select([id_col, source_col, tokens_col])
        keep = pc.is_in(batch.column(source_col),
                        value_set=pa.array(sorted(allowed), pa.string()))
        batch = batch.filter(pc.fill_null(keep, False))
        h, valid = _fnv1a_str(batch.column(id_col))
        hv = (_finalize(h * sc) >> np.uint64(1)).astype(np.int64)
        return batch.append_column("__hv", pa.array(hv)) \
            .filter(pa.array(valid))

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__hv", id_col], kind="stable")
        tok = g[tokens_col].to_numpy(dtype=np.int64)
        cum = np.cumsum(tok)
        budget = np.int64(budgets[g[source_col].iloc[0]])
        return g.loc[(cum - tok) < budget,
                     [id_col, source_col, tokens_col]]

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby(source_col)
            .map_groups(per_source, batch_format="pandas"))


def uniform_sample_n(ds, id_col: str, n: int, *, salt: str = ""):
    """Deterministic exact-n uniform sample without replacement: the n
    rows whose finalized ``hash(id, salt)`` is smallest (ties broken by
    id) — the fixed-size companion of ``deterministic_sample``'s
    fixed-rate gate, and the reproducible replacement for the
    reference's positional ``head()`` sampling
    (profiling_pack/main.py:95-105): head() depends on file order;
    this draw is a pure function of the row ids.

    Scale shape: identical to ``weighted_sample`` — per-batch local
    head-n (at most n rows survive any batch), then one tiny
    single-bucket reduce over <= n*blocks candidates; full rows never
    shuffle.  Null ids are never sampled.  Returns a lazy Dataset of
    ``(id_col, hv)`` where ``hv`` is the (sign-cleared int64) hash key
    the draw ordered on, making the sample auditable."""
    import pandas as pd

    from packs_ray.functions.agg import bucketed_group_reduce

    sc = _salt_constant(salt)

    def add_key(batch: pa.Table) -> pa.Table:
        h, valid = _fnv1a_str(batch.column(id_col))
        hv = (_finalize(h * sc) >> np.uint64(1)).astype(np.int64)
        t = pa.table({id_col: batch.column(id_col),
                      "hv": pa.array(hv)}).filter(pa.array(valid))
        df = t.to_pandas().sort_values(["hv", id_col], kind="stable").head(n)
        df["__one"] = np.int64(1)
        return _table_from_pandas(df, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["hv", id_col], kind="stable").head(n)
                .drop(columns="__one"))

    parts = ds.select_columns([id_col]) \
        .map_batches(add_key, batch_format="pyarrow")
    return bucketed_group_reduce(parts, ["__one"], reduce_fn, 1)


def temperature_budgets(counts: dict, alpha: float,
                        total_n: int) -> dict:
    """Per-group budgets for temperature-flattened mixture sampling:
    budget_g = min(n_g, floor(total_n * n_g^alpha / sum n^alpha)).
    Shared by the engine and the oracle generator so both sides inline
    the exact same integers (floats appear only here, once)."""
    w = {k: float(n) ** alpha for k, n in counts.items() if n > 0}
    s = sum(w.values())
    if s <= 0:
        return {k: 0 for k in counts}
    return {k: min(int(counts[k]), int(total_n * w.get(k, 0.0) / s))
            for k in counts}


def temperature_sample(ds, group_col: str, id_col: str, *,
                       alpha: float = 0.5, total_n: int = 1000,
                       salt: str = "temp",
                       num_partitions: int | None = None):
    """Temperature-flattened mixture sampling — the multilingual
    rebalancing draw (probability mass per group ∝ count^alpha; alpha<1
    upsamples the tail relative to the head, alpha=1 is proportional,
    alpha=0 uniform-over-groups).  Deterministic: within each group the
    budget_g lowest finalized hash(id, salt) rows win (ties by id), so
    the sample is identical across clusters/retries/block splits.

    Scale shape: one ``keyed_count`` for the (bounded: languages /
    sources) group sizes, budgets broadcast in the closure, then the
    ``stratified_sample`` machinery with a per-group head-n — a local
    combiner caps each (batch, group) at its budget before the one
    bucketed reduce.  Returns (id_col, group_col) survivors."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce, keyed_count,
                                         reduce_partition_count)

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)
    cnt = keyed_count(ds.map_batches(
        lambda t: t.filter(pa.compute.is_valid(t.column(group_col))),
        batch_format="pyarrow"), [group_col]).to_pandas()
    if cnt.empty:
        # no non-null groups at all: typed empty result (the empty
        # keyed_count output carries no columns to read budgets from)
        import ray.data

        base = getattr(ds.schema(), "base_schema", None)

        def _t(col):
            return (base.field(col).type if base is not None
                    and base.get_field_index(col) >= 0 else pa.string())

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], type=_t(id_col)),
            group_col: pa.array([], type=_t(group_col))}))
    budgets = temperature_budgets(
        dict(zip(cnt[group_col], cnt["cnt"])), alpha, total_n)
    sc = _salt_constant(salt)

    def add_hash(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.is_valid(batch.column(group_col)))
        h, valid = _fnv1a_str(batch.column(id_col))
        hv = (_finalize(h * sc) >> np.uint64(1)).astype(np.int64)
        t = batch.append_column("__hv", pa.array(hv))
        return t.filter(pa.array(valid))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__hv", id_col], kind="stable")
        rank = df.groupby(group_col, sort=False).cumcount()
        cap = df[group_col].map(budgets).fillna(0).to_numpy()
        return df[rank.to_numpy() < cap]

    def partial(batch: pa.Table) -> pa.Table:
        return _table_from_pandas(local(batch.to_pandas()),
                                    preserve_index=False)

    parts = (ds.select_columns([id_col, group_col])
             .map_batches(add_hash, batch_format="pyarrow")
             .map_batches(partial, batch_format="pyarrow"))
    out = bucketed_group_reduce(parts, [group_col], local, num_partitions)
    return out.drop_columns(["__hv"])


def interleave_sources(sources: list[tuple[str, "object", str, int]], *,
                       num_buckets: int | None = None):
    """Deterministic weighted curriculum interleave: union the sources
    and assign every row a global ``order_idx`` such that reading in
    ``order_idx`` order yields the sources mixed ~proportionally to
    their integer weights (a weight-2 source appears twice as often as
    a weight-1 source in any long prefix).

    Mechanics: each row's position key is ``finalize(fnv1a(id) *
    salt(source)) // weight`` — dividing a uniform uint64 hash by the
    weight compresses that source's keys by the weight factor, so its
    density along the key axis (and hence its rate in any prefix of the
    global key order) is proportional to the weight.  The mix ratio is
    statistical (hash-uniform), the ORDER is exact and reproducible on
    any cluster, any retry — no RNG, no coordination, the same property
    contract as ``sample_mask``.  ``order_idx`` itself comes from ONE
    ``global_row_number`` pass over the union (ties broken by
    (source, id), a unique total order).

    Emits (source, id, order_idx); ids are cast to string so
    heterogeneous source id types union cleanly.  Null ids are dropped.
    """
    import pyarrow.compute as pc

    from packs_ray.functions.windows import global_row_number

    parts = []
    for name, ds, id_col, weight in sources:
        if weight < 1:
            raise ValueError(f"weight must be >= 1, got {weight}")

        def make(name=name, id_col=id_col, weight=weight):
            def fn(batch: pa.Table) -> pa.Table:
                batch = batch.filter(pc.is_valid(batch.column(id_col)))
                col = batch.column(id_col)
                h, _valid = _fnv1a_str(col)
                k = _finalize(h * _salt_constant(name)) // np.uint64(weight)
                return pa.table({
                    "k": pa.array(k),
                    "source": pa.array([name] * len(batch),
                                       type=pa.string()),
                    "id": pc.cast(col, pa.string())})
            return fn

        parts.append(ds.select_columns([id_col]).map_batches(
            make(), batch_format="pyarrow"))

    uni = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    out = global_row_number(uni, "k", ["source", "id"],
                            num_buckets=num_buckets)
    return out.select_columns(["source", "id", "order_idx"])


def grouped_sample_n(ds, key_col: str, id_col: str, n: int, *,
                     salt: str = ""):
    """Deterministic per-key exact-n sample: for every value of
    ``key_col``, the ``n`` rows whose finalized ``hash(id, salt)`` is
    smallest (ties by id) — the "cap documents per domain" / "cap turns
    per conversation" curation primitive (RefinedWeb-style per-source
    caps), reproducible under retries and re-partitioning because the
    draw is a pure function of the row ids.

    Scale shape: per-batch local per-key head-n FIRST (combiner — at
    most n rows per (batch, key) survive), then one bucketed reduce on
    the key; full rows never shuffle.  Null keys or ids are never
    sampled.  Returns a lazy Dataset of (key_col, id_col, hv)."""
    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    sc = _salt_constant(salt)

    def add_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.select([key_col, id_col]).filter(
            pc.and_(batch.column(key_col).is_valid(),
                    batch.column(id_col).is_valid()))
        h, valid = _fnv1a_str(batch.column(id_col))
        hv = (_finalize(h * sc) >> np.uint64(1)).astype(np.int64)
        t = pa.table({key_col: batch.column(key_col),
                      id_col: batch.column(id_col),
                      "hv": pa.array(hv)}).filter(pa.array(valid))
        df = (t.to_pandas().sort_values(["hv", id_col], kind="stable")
              .groupby(key_col, sort=False).head(n))
        return _table_from_pandas(df, preserve_index=False)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["hv", id_col], kind="stable")
                .groupby(key_col, sort=False).head(n)
                [[key_col, id_col, "hv"]])

    parts = ds.map_batches(add_key, batch_format="pyarrow")
    return bucketed_group_reduce(parts, [key_col], reduce_fn,
                                 reduce_partition_count(ds))


def stratified_split(ds, group_col: str, id_col: str,
                     fractions: dict[str, float], *, salt: str = "split"):
    """EXACT-proportion per-stratum split: within every ``group_col``
    value, rows are ranked by (finalized hash(id, salt), id) and the
    first round(n*f1) go to split 1, the next round(n*(f1+f2)) - that
    to split 2, ... (cumulative thresholds, half-away rounding, last
    split absorbs the remainder).  Unlike ``hash_split`` (expected
    proportions, id-sticky across datasets), this guarantees the split
    sizes per stratum on THIS dataset — the right tool for sizing
    eval/test sets from small or skewed strata.

    Output: (group_col, id_col, split) marks — only the key/id columns
    shuffle, join back by id if the full rows are needed.  Null group
    or id rows drop.  Partitioning assumption: one stratum's marks fit
    in a worker (the repo's map_groups convention); a mega-stratum
    needs the two-pass distributed rank-select in profiling.py."""
    import pandas as pd
    import pyarrow.compute as pc

    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions sum to {total}, expected 1")
    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names])
    sc = _salt_constant(salt)

    def marks(batch: pa.Table) -> pa.Table:
        batch = batch.select([group_col, id_col])
        mask = pc.and_(batch.column(group_col).is_valid(),
                       batch.column(id_col).is_valid())
        batch = batch.filter(mask)
        h, _ = _fnv1a_str(batch.column(id_col))
        return batch.append_column(
            "__h", pa.array(_finalize(h * sc).view(np.int64)))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_col], kind="stable",
                          key=lambda s: (s.to_numpy().view(np.uint64)
                                         if s.name == "__h" else s)) \
            .reset_index(drop=True)
        n = len(g)
        edges = np.floor(cum * n + 0.5).astype(np.int64)
        edges[-1] = n
        band = np.searchsorted(edges, np.arange(1, n + 1), side="left")
        g["split"] = np.array(names, dtype=object)[
            np.minimum(band, len(names) - 1)]
        return g[[group_col, id_col, "split"]]

    return (ds.map_batches(marks, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(per_group, batch_format="pandas"))


def cluster_split(ds, id_col: str, pairs, fractions: dict[str, float], *,
                  id_a: str = "id_a", id_b: str = "id_b",
                  salt: str = "split"):
    """Leakage-safe train/val/test split: every near-duplicate CLUSTER
    lands wholly in one split.  A plain :func:`hash_split` on document
    id leaks — two near-identical docs hash to different splits and the
    eval set grades memorization (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", §6).  Here the split
    decision is keyed on the cluster's canonical (minimum) member id:
    ``pairs`` (any near-dup pair Dataset — minhash, simhash,
    embedding-cosine) is closed into components, every id joins its
    component label (singletons label themselves), and the usual hash
    band assigns the split.

    Returns a Dataset of (``id_col``, cluster, split).

    Scale shape: component labels ride `connected_components`' narrow
    bucketed label propagation; the label attach is ONE equi-join
    (broadcast under the join cap — the pair-touched id set is tiny on
    a deduplicated corpus — bucketed co-partition above it); the band
    decision is stateless per batch.  Nothing but fixed-width partials
    lands on the driver."""
    import pyarrow.compute as pc

    from packs_ray.functions.components import connected_components
    from packs_ray.functions.joins import equi_join

    narrow = ds.select_columns([id_col])
    labels = connected_components(pairs, id_a, id_b, node_col="__node",
                                  label_col="__cluster")
    joined = equi_join(narrow, labels, left_on=[id_col],
                       right_on=["__node"], how="left")

    def attach_key(batch: pa.Table) -> pa.Table:
        own = batch.column(id_col)
        if "__cluster" in batch.schema.names:
            cl = batch.column("__cluster")
            if isinstance(cl, pa.ChunkedArray):
                cl = cl.combine_chunks()
            cluster = pc.coalesce(cl.cast(own.type), own)
        else:                      # empty pair set: upstream map stages
            cluster = own          # never ran, all rows are singletons
        return pa.table({id_col: own, "cluster": cluster})

    keyed = joined.map_batches(attach_key, batch_format="pyarrow")
    return hash_split(keyed, "cluster", fractions, salt=salt)


def _poisson1_cum(k_max: int = 12) -> "np.ndarray":
    """Cumulative P(X<=k) for Poisson(1), k=0..k_max-1, as the exact
    double constants BOTH the engine and the SQL twin use literally
    (embedded into the oracle, so no cross-library exp/factorial
    divergence can exist)."""
    import math

    probs, term = [], math.exp(-1.0)
    cum = 0.0
    for k in range(k_max):
        if k > 0:
            term = term / k
        cum += term
        probs.append(cum)
    return np.array(probs, dtype=np.float64)


def bootstrap_ci(ds, id_col: str, value_col: str, *,
                 n_replicates: int = 40, salt: str = "boot",
                 scale: int = 100) -> "pd.DataFrame":
    """Poisson-bootstrap confidence interval for the mean of
    ``value_col`` — the resampling SE/CI without any RNG state: each
    row's weight in replicate r is Poisson(1) drawn by inverse CDF
    from u = finalized(FNV(id) × salt_r) / 2^53, a pure function of
    (id, r), so every replicate is identical on any cluster, any
    retry, any block layout (the Chamandy et al. "Poisson bootstrap"
    estimator for map-reduce, made deterministic).

    Exactness: replicate aggregates are exact integer cents —
    per-batch (r, Σw, Σw·cents) int64 partials, Python-int driver
    fold; only the R replicate means, their ≤R-term stddev fold and
    two order-statistic quantiles are floats, pinned to the oracle's
    expression order.

    Output: one row — (n_rows, mean, n_replicates, se_boot, ci_lo,
    ci_hi), value units, 6dp; CI = percentile bootstrap at 2.5/97.5
    (indexes floor(.025·R) and ceil(.975·R)-1 of the sorted means)."""
    import math

    import pandas as pd

    from packs_ray.functions.agg import _exact_int_sum
    from packs_ray.stages.util import round_half_away as _rh

    R = int(n_replicates)
    cum = _poisson1_cum()
    salts = np.array([_salt_constant(f"{salt}:{r}") for r in range(R)],
                     dtype=np.uint64)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as _np
        import pyarrow.compute as pc

        t = batch.select([id_col, value_col])
        mask = pc.and_(t.column(id_col).is_valid(),
                       t.column(value_col).is_valid())
        t = t.filter(mask)
        h, _v = _fnv1a_str(t.column(id_col))
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        cents = _np.rint(_np.asarray(v, dtype=_np.float64)
                         * scale).astype(_np.int64)
        rs = _np.empty(R, dtype=_np.int64)
        sw = _np.empty(R, dtype=_np.int64)
        swc = _np.empty(R, dtype=_np.int64)
        n = _np.int64(len(cents))
        s = _np.int64(_exact_int_sum(cents)) if len(cents) else 0
        for r in range(R):
            hr = _finalize(h * salts[r])
            u = (hr % _np.uint64(1 << 53)).astype(_np.float64) \
                / float(1 << 53)
            w = _np.searchsorted(cum, u, side="right").astype(_np.int64)
            rs[r] = r
            sw[r] = _exact_int_sum(w)
            swc[r] = _exact_int_sum(w * cents)
        out = pa.table({"r": pa.array(rs), "sw": pa.array(sw),
                        "swc": pa.array(swc)})
        return out.append_column("n", pa.array(
            _np.full(R, n, dtype=_np.int64))).append_column(
            "s", pa.array(_np.full(R, s, dtype=_np.int64)))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = ["n_rows", "mean", "n_replicates", "se_boot", "ci_lo", "ci_hi"]
    if not len(parts):
        return pd.DataFrame([{**dict.fromkeys(cols),
                              "n_rows": np.int64(0),
                              "n_replicates": np.int64(R)}])[cols]
    # every partial carries the SAME per-batch (n, s) once per r row;
    # divide by R to undo the replication
    n_rows = int(parts["n"].sum()) // R
    s_tot = sum(int(x) for x in parts["s"]) // R
    g = parts.groupby("r", sort=True)
    means = []
    for r, gg in g:
        swr = sum(int(x) for x in gg["sw"])
        swcr = sum(int(x) for x in gg["swc"])
        if swr > 0:
            means.append(float(swcr) / (swr * 1.0) / float(scale))
    if n_rows == 0 or not means:
        return pd.DataFrame([{**dict.fromkeys(cols),
                              "n_rows": np.int64(n_rows),
                              "n_replicates": np.int64(R)}])[cols]
    mbar = 0.0
    for m in means:                       # left fold == list_sum
        mbar += m
    mbar /= float(len(means))
    ssq = 0.0
    for m in means:
        d = m - mbar
        ssq += d * d
    se = math.sqrt(ssq / (len(means) - 1.0)) if len(means) > 1 else None
    srt = sorted(means)
    lo = srt[int(math.floor(0.025 * len(srt)))]
    hi = srt[int(math.ceil(0.975 * len(srt))) - 1]
    return pd.DataFrame([{
        "n_rows": np.int64(n_rows),
        "mean": float(_rh(float(s_tot) / (n_rows * 1.0) / float(scale), 6)),
        "n_replicates": np.int64(R),
        "se_boot": None if se is None else float(_rh(se, 6)),
        "ci_lo": float(_rh(lo, 6)), "ci_hi": float(_rh(hi, 6))}])[cols]


def bootstrap_median_ci(ds, id_col: str, value_col: str, *,
                        n_replicates: int = 40, salt: str = "bootm",
                        scale: int = 100) -> "pd.DataFrame":
    """Poisson-bootstrap percentile CI for the MEDIAN — the robust
    companion to :func:`bootstrap_ci` (mean): same deterministic
    hash-seeded replicate weights, but each replicate statistic is the
    lower weighted median of integer cents, so every step through the
    order statistics is EXACT integer arithmetic (no float fold at
    all until the final /scale).

    Lower weighted median rule (pinned, shared with the oracle):
    the smallest value c with 2 * cum_weight(c) >= W_total.

    Scale shape: per-batch (r, cents, w) count partials ride one
    bucketed reduce on (r, cents); the driver folds a table bounded by
    n_replicates x the DISTINCT cents domain (the mannwhitney_u
    partitioning assumption), never rows.

    Output: one row (n_rows, median, ci_lo, ci_hi), value units;
    CI = percentile bootstrap at 2.5/97.5 of the replicate medians."""
    import math

    import pandas as pd

    from packs_ray.functions.agg import (bucketed_group_reduce,
                                         reduce_partition_count)

    R = int(n_replicates)
    cum = _poisson1_cum()
    salts = np.array([_salt_constant(f"{salt}:{r}") for r in range(R)],
                     dtype=np.uint64)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as _np
        import pyarrow.compute as pc

        t = batch.select([id_col, value_col])
        mask = pc.and_(t.column(id_col).is_valid(),
                       t.column(value_col).is_valid())
        t = t.filter(mask)
        h, _v = _fnv1a_str(t.column(id_col))
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        cents = _np.rint(_np.asarray(v, dtype=_np.float64)
                         * scale).astype(_np.int64)
        frames = [pd.DataFrame({"r": _np.int64(-1), "c": cents,
                                "w": _np.int64(1)})]
        for r in range(R):
            hr = _finalize(h * salts[r])
            u = (hr % _np.uint64(1 << 53)).astype(_np.float64) \
                / float(1 << 53)
            w = _np.searchsorted(cum, u, side="right") \
                .astype(_np.int64)
            frames.append(pd.DataFrame({"r": _np.int64(r), "c": cents,
                                        "w": w}))
        g = (pd.concat(frames, ignore_index=True)
             .groupby(["r", "c"], sort=False)["w"].sum().reset_index())
        return _table_from_pandas(g[g["w"] > 0],
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["r", "c"], sort=False)["w"].sum().reset_index()

    tab = bucketed_group_reduce(parts, ["r", "c"], reduce_fn,
                                reduce_partition_count(ds)).to_pandas()
    cols = ["n_rows", "median", "ci_lo", "ci_hi"]
    if not len(tab):
        return pd.DataFrame([{**dict.fromkeys(cols),
                              "n_rows": np.int64(0)}])[cols]

    def wmedian(g: pd.DataFrame) -> int | None:
        g = g.sort_values("c")
        w = g["w"].to_numpy(np.int64)
        total = int(w.sum())
        if total == 0:
            return None
        cumw = np.cumsum(w)
        idx = int(np.searchsorted(2 * cumw, total, side="left"))
        return int(g["c"].to_numpy(np.int64)[idx])

    base = tab[tab["r"] == -1]
    n_rows = int(base["w"].sum())
    if n_rows == 0:
        return pd.DataFrame([{**dict.fromkeys(cols),
                              "n_rows": np.int64(0)}])[cols]
    med_c = wmedian(base)
    meds = []
    for r in range(R):
        m = wmedian(tab[tab["r"] == r])
        if m is not None:
            meds.append(m)
    meds.sort()
    lo = meds[int(math.floor(0.025 * len(meds)))] if meds else None
    hi = meds[int(math.ceil(0.975 * len(meds))) - 1] if meds else None
    f = float(scale)
    return pd.DataFrame([{
        "n_rows": np.int64(n_rows),
        "median": med_c / f,
        "ci_lo": None if lo is None else lo / f,
        "ci_hi": None if hi is None else hi / f}])[cols]


def quota_allocation(ds, group_col: str, total: int, *,
                     num_partitions: int | None = None) -> "pd.DataFrame":
    """Largest-remainder (Hamilton) quota allocation: split ``total``
    sample/shard slots across groups proportionally to their row
    counts, in EXACT integer arithmetic — the allocation step behind
    stratified budgets that float rounding gets wrong (quotas that sum
    to total±1 and flap between runs).  seats_g = total·n_g; base =
    seats_g // N; the ``total − Σ base`` leftover seats go to the
    largest remainders (seats_g mod N), ties to the lexicographically
    first group — so the result is bit-stable and always sums to
    ``total`` exactly.

    Scale shape: one keyed_count reduce; the allocation folds the
    bounded per-group table on the driver.

    Output: (group, n_rows, quota) sorted by group."""
    import numpy as np
    import pandas as pd

    from packs_ray.functions.agg import keyed_count

    def drop_null(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column(group_col).is_valid())

    cnt = keyed_count(
        ds.select_columns([group_col]).map_batches(
            drop_null, batch_format="pyarrow"),
        [group_col], count_col="n_rows",
        num_partitions=num_partitions).to_pandas()
    if not len(cnt):
        return pd.DataFrame({group_col: pd.Series([], dtype="object"),
                             "n_rows": pd.Series([], dtype="int64"),
                             "quota": pd.Series([], dtype="int64")})
    cnt = cnt.sort_values(group_col).reset_index(drop=True)
    n = cnt["n_rows"].to_numpy(np.int64)
    big_n = int(n.sum())
    seats = [int(total) * int(x) for x in n]         # exact ints
    base = np.array([s // big_n for s in seats], dtype=np.int64)
    rem = np.array([s % big_n for s in seats], dtype=np.int64)
    extra = int(total) - int(base.sum())
    order = np.lexsort((np.arange(len(cnt)), -rem))  # rem desc, grp asc
    quota = base.copy()
    quota[order[:extra]] += 1
    cnt["quota"] = quota
    return cnt[[group_col, "n_rows", "quota"]].astype(
        {"n_rows": "int64", "quota": "int64"})
