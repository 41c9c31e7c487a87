"""Checkpointed, resumable sharded execution of the flagship pipeline.

The input file list is split into shards; each shard runs the full
pipeline as its own Dataset execution and commits atomically:

    out_dir/shard=K/...parquet      (written to a tmp dir, then renamed)
    out_dir/_manifest.jsonl         (one line per committed shard:
                                     input files, rule-hit histogram,
                                     rows total/kept/scrubbed, wall time)

On restart, shards present in the manifest are skipped — resume from the
last committed partition (north rule).  Exact-duplicate marking is
per-shard under sharded execution (global dedup is a dedicated pre-pass:
packs_ray.functions.duplicates.dedup_exact); all other rules are
row/conversation-local, and conversations never span input shards when
the input layout groups a conversation's turns in one file — otherwise
run with shards=1 or pre-bucket the input by conv hash.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa

from packs_ray.config import DEFAULT_CONFIG, RULE_NAMES, FilterConfig


def _shard_files(files: list[str], shards: int) -> list[list[str]]:
    out = [[] for _ in range(min(shards, len(files)))]
    for i, f in enumerate(sorted(files)):
        out[i % len(out)].append(f)
    return out


def _histogram(ds) -> dict:
    """Rule-hit histogram + row counts from a finished output Dataset —
    per-batch partials over the 3 small columns only."""
    from packs_ray.functions.agg import global_agg

    def partial(batch: pa.Table) -> dict:
        bits = batch.column("rule_bits").to_numpy(zero_copy_only=False)
        pii = batch.column("pii_bits").to_numpy(zero_copy_only=False)
        d = {"total": len(bits), "kept": int((bits == 0).sum()),
             "scrubbed": int(((bits == 0) & (pii != 0)).sum())}
        for i, name in enumerate(RULE_NAMES):
            d[name] = int((bits >> i & 1).sum())
        return d

    return global_agg(ds, partial, lambda p: {c: int(p[c].sum()) for c in p.columns})


def run_resumable(input_files: list[str], out_dir: str,
                  cfg: FilterConfig = DEFAULT_CONFIG, shards: int = 8,
                  num_buckets: int | None = None) -> dict:
    """Run the flagship pipeline shard-by-shard with commit manifest.
    Returns the merged lineage summary."""
    import ray.data

    from packs_ray.pipelines.filter_pipeline import build_filter_pipeline

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_manifest.jsonl")
    done: dict[int, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["shard"]] = rec

    shard_lists = _shard_files(input_files, shards)
    for k, files in enumerate(shard_lists):
        if k in done:
            continue
        t0 = time.time()
        from packs_ray.sources.parquet import read_parquet_sized

        ds = read_parquet_sized(files)
        marks_src = read_parquet_sized(
            files, columns=["conv_id", "turn_idx", "role", "text"])
        out = build_filter_pipeline(ds, cfg, num_buckets=num_buckets,
                                    marks_source=marks_src)
        tmp = os.path.join(out_dir, f".tmp_shard={k}")
        final = os.path.join(out_dir, f"shard={k}")
        shutil.rmtree(tmp, ignore_errors=True)
        out.write_parquet(tmp)
        # lineage from the written shard (cheap column-pruned re-read)
        written = ray.data.read_parquet(tmp, columns=["rule_bits", "pii_bits"])
        hist = _histogram(written)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)  # atomic commit of the shard
        rec = {"shard": k, "files": files, "wall_sec": round(time.time() - t0, 3),
               **hist}
        with open(manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        done[k] = rec

    # merged lineage summary + reference-shape metrics
    total = sum(r["total"] for r in done.values())
    kept = sum(r["kept"] for r in done.values())
    scrubbed = sum(r["scrubbed"] for r in done.values())
    rule_counts = {name: sum(r.get(name, 0) for r in done.values())
                   for name in RULE_NAMES}
    from packs_ray.state.metrics import pipeline_metrics

    mc = pipeline_metrics(rule_counts, total, kept, scrubbed,
                          dataset=os.path.basename(out_dir.rstrip("/")) or "transcripts")
    mc.save(out_dir)
    from packs_ray.state.report import write_html_report

    write_html_report(mc, os.path.join(out_dir, "report.html"))
    return {"shards": len(shard_lists), "total": total, "kept": kept,
            "scrubbed": scrubbed, "rule_counts": rule_counts}
