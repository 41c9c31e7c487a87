"""CLI entry point for the flagship pipeline — the `ray job submit` target.

    ray job submit -- python scripts/run_pipeline.py \
        --input '/data/transcripts/*.parquet' --output /data/filtered \
        --shards 64

Runs the checkpointed sharded execution (packs_ray.state.checkpoint):
each shard commits atomically to ``output/shard=K/`` with a lineage line
in ``output/_manifest.jsonl``; re-running the same command resumes from
the last committed shard.  Owns its Ray session (guarded init per the
driver contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet file, glob, or directory of transcripts")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--shards", type=int, default=16,
                    help="checkpoint shards (resume granularity)")
    ap.add_argument("--num-buckets", type=int, default=None,
                    help="conversation-shuffle buckets (default: sized to input)")
    ap.add_argument("--no-dedup", action="store_true",
                    help="skip exact-duplicate marking")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, logging_level="ERROR")

    if os.path.isdir(args.input):
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        files = sorted(glob.glob(args.input))
    if not files:
        sys.exit(f"no parquet files match {args.input!r}")

    from packs_ray.config import DEFAULT_CONFIG
    from packs_ray.state.checkpoint import run_resumable

    cfg = DEFAULT_CONFIG
    if args.no_dedup:
        import dataclasses

        cfg = dataclasses.replace(cfg, dedup_exact=False)

    summary = run_resumable(files, args.output, cfg=cfg, shards=args.shards,
                            num_buckets=args.num_buckets)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
