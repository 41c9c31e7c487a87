"""Web-corpus document curation pipeline: the RefinedWeb/C4-shaped
end-to-end flow a training-data team actually runs, composed from the
library's oracle-verified stages —

    C4 line cleaning → Gopher rule filter → exact dedup (keep lowest id
    per cleaned text) → global-median quality gate → deterministic
    shard assignment

(reference analogue: the per-pack completeness/validity/duplicate
checks run dataset-by-dataset, e.g. /root/reference/scripts/run.sh
sequential pack loop; this is the fused distributed pipeline shape).

Scale design: the document text is scanned ONCE — the clean + rule +
quality-score + content-hash stage is a single fused map chain, after
which only ~40 B/row marks (id, 128-bit hash, flags, score) move.
Dedup is one mark shuffle (all rows of a content hash land in one
bucket, so min-id-per-group is exact).  The quality gate needs a
global quantile of the post-dedup survivors, so the narrow marks
Dataset is materialized once (bounded ~40 B/row; the object store
spills it at corpus scale) and scanned for the threshold before the
final labeling pass.  Every stage verdict is bit-deterministic under
any partitioning: ratio thresholds round half-away BEFORE comparison,
ties in dedup pin to min id, and the quantile is the exact
rank-interpolated value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def run_curation_pipeline(ds, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          min_line_words: int = 3, min_words: int = 20,
                          quality_q: float = 0.5, n_shards: int = 16,
                          shard_salt: str = "shard",
                          num_partitions: int | None = None):
    """Returns a lazy Dataset, one row per non-null input doc, sorted
    by id: (id_col, stage, quality_score, shard) where stage is the
    first stage that dropped the doc — 'clean' (C4 page/line rules),
    'gopher' (rule bundle), 'dedup' (non-canonical exact duplicate),
    'quality' (below the global quantile gate) — or 'kept'.
    quality_score is non-null only for docs that reached the gate;
    shard only for kept docs."""
    from packs_ray.functions.agg import reduce_partition_count
    from packs_ray.functions.duplicates import _key_hash128
    from packs_ray.functions.profiling import quantile_threshold
    from packs_ray.functions.sharding import _hash_cols
    from packs_ray.functions.textstats import quality_score_array
    from packs_ray.functions.webquality import c4_clean, gopher_flags

    if num_partitions is None:
        num_partitions = reduce_partition_count(ds)

    cleaned = c4_clean(ds.select_columns([id_col, text_col]), id_col,
                       text_col, min_line_words=min_line_words)
    flagged = gopher_flags(cleaned, id_col, "text_clean",
                           min_words=min_words,
                           passthrough=("text_clean", "dropped"))

    def marks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tc = batch.column("text_clean")
        drop_clean = pc.or_(batch.column("dropped"),
                            pc.equal(tc, "")).to_numpy(
            zero_copy_only=False).astype(bool)
        score = quality_score_array(tc)
        h1, h2, p = _key_hash128(batch, ["text_clean"], num_partitions)
        return pa.table({
            id_col: batch.column(id_col),
            "__h1": pa.array(h1), "__h2": pa.array(h2),
            "__p": pa.array(p),
            "drop_clean": pa.array(drop_clean),
            "keep_gopher": pa.array(
                batch.column("keep_gopher").to_numpy(
                    zero_copy_only=False).astype(bool)),
            "quality_score": pa.array(score, type=pa.float64())})

    staged_empty = pd.DataFrame({
        id_col: pd.Series([], dtype="int64"),
        "stage": pd.Series([], dtype=object),
        "quality_score": pd.Series([], dtype="float64")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return staged_empty.copy()
        elig = (~g["drop_clean"].to_numpy(dtype=bool)
                & g["keep_gopher"].to_numpy(dtype=bool))
        ids = g[id_col].to_numpy()
        canon = np.zeros(len(g), dtype=bool)
        if elig.any():
            ge = g[elig]
            min_id = (ge.groupby(["__h1", "__h2"], sort=False)[id_col]
                      .transform("min").to_numpy())
            canon[elig] = ge[id_col].to_numpy() == min_id
        stage = np.where(
            g["drop_clean"], "clean",
            np.where(~g["keep_gopher"], "gopher",
                     np.where(canon, "survivor", "dedup")))
        score = g["quality_score"].to_numpy(dtype=np.float64).copy()
        score[stage != "survivor"] = np.nan
        return pd.DataFrame({id_col: ids, "stage": stage,
                             "quality_score": score})

    staged = (flagged.map_batches(marks, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(per_bucket, batch_format="pandas")
              .materialize())      # narrow marks; scanned twice below

    def _survivors(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("stage"), "survivor"))

    thr = quantile_threshold(
        staged.map_batches(_survivors, batch_format="pyarrow"),
        "quality_score", quality_q)

    ns = np.uint64(n_shards)

    def finalize(batch: pa.Table) -> pa.Table:
        stage = batch.column("stage").to_numpy(
            zero_copy_only=False).astype(object)
        score = batch.column("quality_score").to_numpy(
            zero_copy_only=False).astype(np.float64)
        surv = stage == "survivor"
        kept = surv & (thr is not None) & (score >= (thr if thr is not None
                                                     else np.inf))
        stage[surv & ~kept] = "quality"
        stage[kept] = "kept"
        h, valid = _hash_cols(batch, id_col, shard_salt)
        shard = np.where(kept & valid, (h % ns).astype(np.int64), -1)
        return pa.table({
            id_col: batch.column(id_col),
            "stage": pa.array(stage, type=pa.string()),
            "quality_score": pa.array(
                np.where(surv, score, np.nan), type=pa.float64(),
                from_pandas=True),
            "shard": pa.array(
                np.ma.masked_array(shard, mask=~(kept & valid)),
                type=pa.int64())})

    return staged.map_batches(finalize,
                              batch_format="pyarrow").sort(id_col)


def run_curation_resumable(input_files: list[str], out_dir: str, *,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           min_line_words: int = 3, min_words: int = 20,
                           quality_q: float = 0.5, n_shards: int = 16,
                           shard_salt: str = "shard",
                           output_shards: int = 8,
                           num_partitions: int | None = None) -> dict:
    """Checkpointed, resumable curation run — the two-phase resume
    pattern for pipelines with GLOBAL stages (exact dedup + global
    quantile gate are all-to-all; per-input-shard resume alone, the
    flagship's ``run_resumable`` shape, would silently change their
    semantics):

    Phase A (global, atomic): the narrow stage-mark derivation (clean /
    gopher / dedup verdicts + quality scores, ~40 B/row) runs over the
    WHOLE input and commits to ``out_dir/_state/staged/`` (tmp dir +
    rename), with the exact quantile threshold and parameters in
    ``_state/globals.json``.  A restart that finds the committed state
    skips every all-to-all exchange.  A crash mid-phase-A recomputes
    it — phase-level atomicity is the honest granularity for global
    operators.

    Phase B (per-shard, resumable): the committed staged files are
    split into ``output_shards`` groups; each applies the stateless
    threshold+shard finalize and commits
    ``out_dir/shard=K/`` + one ``_manifest.jsonl`` line (files, wall
    time, per-stage lineage counts).  On restart, manifest shards are
    skipped — resume from the last committed partition.

    Returns the merged lineage summary (per-stage totals).  Output rows
    (id, stage, quality_score, shard) across all shards equal
    ``run_curation_pipeline``'s modulo global sort order."""
    import glob as _glob
    import json
    import os
    import shutil
    import time

    import pyarrow.compute as pc

    import ray.data

    from packs_ray.functions.profiling import quantile_threshold
    from packs_ray.functions.sharding import _hash_cols
    from packs_ray.sources.parquet import read_parquet_sized
    from packs_ray.state.checkpoint import _shard_files

    os.makedirs(out_dir, exist_ok=True)
    state_dir = os.path.join(out_dir, "_state")
    staged_dir = os.path.join(state_dir, "staged")
    globals_path = os.path.join(state_dir, "globals.json")

    # ---- phase A: global artifacts (staged marks + threshold) ----
    if not os.path.exists(globals_path):
        ds = read_parquet_sized(input_files, columns=[id_col, text_col])
        # reuse the verified pipeline up to (and including) the staged
        # marks, then stop BEFORE the threshold-dependent finalize:
        # run_curation_pipeline's staged table is its first materialize,
        # so rebuilding it here keeps one source of truth for semantics
        staged_full = run_curation_pipeline(
            ds, id_col=id_col, text_col=text_col,
            min_line_words=min_line_words, min_words=min_words,
            quality_q=quality_q, n_shards=n_shards,
            shard_salt=shard_salt, num_partitions=num_partitions)
        # staged_full already applied the gate; instead persist the
        # pre-gate marks: recover them by mapping 'kept'/'quality' back
        # to 'survivor' (score column is intact for both)
        def ungate(batch: pa.Table) -> pa.Table:
            stage = batch.column("stage").to_numpy(
                zero_copy_only=False).astype(object)
            stage[(stage == "kept") | (stage == "quality")] = "survivor"
            return pa.table({id_col: batch.column(id_col),
                             "stage": pa.array(stage, type=pa.string()),
                             "quality_score": batch.column("quality_score")})

        staged = staged_full.map_batches(ungate, batch_format="pyarrow")
        tmp = staged_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(staged_dir, ignore_errors=True)
        # one file group per resume unit (split-only repartition — the
        # staged table is narrow, no shuffle)
        staged.repartition(output_shards).write_parquet(tmp)
        def _survivors_only(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("stage"), "survivor"))

        thr = quantile_threshold(
            ray.data.read_parquet(tmp).map_batches(
                _survivors_only, batch_format="pyarrow"),
            "quality_score", quality_q)
        os.rename(tmp, staged_dir)     # atomic commit of the heavy state
        with open(globals_path + ".tmp", "w") as f:
            json.dump({"threshold": thr, "quality_q": quality_q,
                       "n_shards": n_shards, "shard_salt": shard_salt,
                       "input_files": sorted(input_files)}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(globals_path + ".tmp", globals_path)
    with open(globals_path) as f:
        g = json.load(f)
    thr = g["threshold"]
    ns = np.uint64(g["n_shards"])

    manifest_path = os.path.join(out_dir, "_manifest.jsonl")
    done: dict[int, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["shard"]] = rec

    staged_files = sorted(_glob.glob(os.path.join(staged_dir,
                                                  "*.parquet")))
    groups = _shard_files(staged_files, output_shards)
    stages = ("clean", "gopher", "dedup", "quality", "kept")

    def finalize(batch: pa.Table) -> pa.Table:
        stage = batch.column("stage").to_numpy(
            zero_copy_only=False).astype(object)
        score = batch.column("quality_score").to_numpy(
            zero_copy_only=False).astype(np.float64)
        surv = stage == "survivor"
        kept = surv & (thr is not None) & (score >= (thr if thr is not None
                                                     else np.inf))
        stage[surv & ~kept] = "quality"
        stage[kept] = "kept"
        h, valid = _hash_cols(batch, id_col, g["shard_salt"])
        shard = np.where(kept & valid, (h % ns).astype(np.int64), -1)
        return pa.table({
            id_col: batch.column(id_col),
            "stage": pa.array(stage, type=pa.string()),
            "quality_score": pa.array(
                np.where(surv, score, np.nan), type=pa.float64(),
                from_pandas=True),
            "shard": pa.array(
                np.ma.masked_array(shard, mask=~(kept & valid)),
                type=pa.int64())})

    for k, files in enumerate(groups):
        if k in done:
            continue
        t0 = time.time()
        if files:
            out = (ray.data.read_parquet(files)
                   .map_batches(finalize, batch_format="pyarrow")
                   .sort(id_col))
        else:
            out = None
        tmp = os.path.join(out_dir, f".tmp_shard={k}")
        final = os.path.join(out_dir, f"shard={k}")
        shutil.rmtree(tmp, ignore_errors=True)
        counts = {s: 0 for s in stages}
        if out is not None:
            out = out.materialize()
            for b in out.iter_batches(batch_format="pyarrow"):
                st = b.column("stage")
                for s in stages:
                    counts[s] += int(pc.sum(pc.cast(pc.equal(st, s),
                                                    "int64")).as_py() or 0)
            out.write_parquet(tmp)
        else:
            os.makedirs(tmp, exist_ok=True)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        rec = {"shard": k, "files": [os.path.basename(p) for p in files],
               "wall_sec": round(time.time() - t0, 3), **counts}
        with open(manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        done[k] = rec

    totals = {s: sum(r.get(s, 0) for r in done.values()) for s in stages}
    return {"shards": len(groups), "threshold": thr, **totals,
            "total": sum(totals.values())}
