"""Flagship pipeline: language-ID + quality-filter + PII-scrub over
transcript Parquet (the engine's end-to-end shape, SURVEY.md §3.4):

    read_parquet ──┬─ heuristics          (stateless map_batches, Arrow zero-copy)
                   │   → langid           (actor pool; model built once per actor)
                   │   → perplexity       (actor pool; model built once per actor)
                   └─ dedup marks         (narrow projection: content-hash
                                           buckets, ~40 B/row shuffled)
      → conversation (union)  (the ONE full-row shuffle: conv-hash buckets
                               → stable (conv_id, turn_idx) order + role
                               sequence + exact_duplicate marks absorbed)
      → finalize              (keep / drop_reasons from rule_bits)
      → scrub                 (Python-re PII sub over kept rows only)
      → write_parquet         (or return the lazy Dataset)

Output schema = input columns + lang, bits_per_byte, rule_bits, keep,
drop_reasons:list<string>, text_scrubbed:string, pii_bits.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from packs_ray.config import DEFAULT_CONFIG, FilterConfig
from packs_ray.stages.conversation import conversation_stage
from packs_ray.stages.dedup import dedup_marks
from packs_ray.stages.finalize import drop_helper_columns, finalize_batch
from packs_ray.stages.heuristics import make_heuristics_fn
from packs_ray.stages.model_stages import QualityModelStage
from packs_ray.stages.scrub import make_scrub_fn

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def build_filter_pipeline(
    ds: "ray.data.Dataset",
    cfg: FilterConfig = DEFAULT_CONFIG,
    *,
    num_buckets: int | None = None,
    model_concurrency=None,
    batch_size: int = 16_384,
    dedup: bool | None = None,
    marks_source: "ray.data.Dataset | None" = None,
    marks: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Assemble the lazy flagship pipeline over an input Dataset."""
    dedup = cfg.dedup_exact if dedup is None else dedup
    if model_concurrency is None:
        # One fused model pool.  For real volumes the pool is FIXED at
        # ~3/4 of the cluster: all actors spawn in one parallel import
        # wave at pipeline start, then run at steady state — autoscaling
        # from min=1 spawns actors mid-stream, and each spawn stalls the
        # pipeline on this class of host (measured 2× wall-time noise).
        # Tiny inputs keep a small autoscaling pool so unit-test runs
        # don't pay a 24-actor spawn wave.
        from packs_ray.functions.agg import _est_bytes_and_cpus

        nbytes, cpus = _est_bytes_and_cpus(ds)
        if nbytes < (256 << 20):
            model_concurrency = (1, min(8, cpus))
        else:
            # never demand more actors than the cluster can schedule
            model_concurrency = max(1, min(cpus - 1, (cpus * 3) // 4))
    if num_buckets is None:
        # sized from the (cheap, metadata-estimated) input volume so tiny
        # inputs don't fan every shuffle into thousands of empty buckets
        # while real volumes get one bucket per ~128MB of rows
        from packs_ray.functions.agg import row_shuffle_partitions

        num_buckets = row_shuffle_partitions(ds)

    # passthrough user columns beyond the input_hint schema (schema() is
    # metadata-cheap on reads and in-memory datasets)
    known = set(TRANSCRIPT_COLUMNS)
    try:
        sch = ds.schema()
        extra_fields = [pa.field(n, t) for n, t in zip(sch.names, sch.types)
                        if n not in known]
    except Exception:
        extra_fields = []

    # dedup marks branch: re-reads only the narrow projection of the raw
    # input (conv_id, turn_idx, role, text) and shuffles ~40 B/row; the
    # marks are merged inside the conversation shuffle, so the full text
    # payload shuffles exactly once in the whole pipeline.
    # ``marks_source`` lets path-based callers give this branch its own
    # column-pruned read instead of re-executing the 6-column read.
    # ``marks`` hands in a PRE-COMPUTED (often materialized) marks
    # dataset — staging the narrow marks exchange as its own execution
    # before the wide one keeps the live operator count small, which
    # matters at 10^8-row scale where the executor's per-operator
    # resource budgeting can otherwise starve the interleaved branches
    # (scripts/soak.py measured the single-DAG form trickling at ~1.3
    # load on 32 CPUs in exactly that regime; it must match
    # ``num_buckets``).
    if marks is None:
        marks = dedup_marks(marks_source if marks_source is not None
                            else ds, num_buckets) if dedup else None

    ds = ds.map_batches(make_heuristics_fn(cfg), batch_format="pyarrow",
                        batch_size=batch_size)
    ds = ds.map_batches(QualityModelStage, fn_constructor_args=(cfg,),
                        batch_format="pyarrow", batch_size=batch_size,
                        concurrency=model_concurrency)
    ds = conversation_stage(ds, num_buckets, cfg, marks=marks,
                            extra_fields=extra_fields)
    ds = ds.map_batches(finalize_batch, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(make_scrub_fn(cfg), batch_format="pyarrow",
                        batch_size=batch_size)
    return ds.map_batches(drop_helper_columns, batch_format="pyarrow",
                          batch_size=batch_size)


def read_transcripts(path: str | list[str]) -> "ray.data.Dataset":
    """Column-pruned, block-size-aware parquet read of the transcript schema."""
    from packs_ray.sources.parquet import read_parquet_sized

    return read_parquet_sized(path, columns=TRANSCRIPT_COLUMNS)


def run_filter_pipeline(path: str | list[str], cfg: FilterConfig = DEFAULT_CONFIG,
                        **kwargs) -> "ray.data.Dataset":
    from packs_ray.sources.parquet import read_parquet_sized

    kwargs.setdefault("marks_source", read_parquet_sized(
        path, columns=["conv_id", "turn_idx", "role", "text"]))
    return build_filter_pipeline(read_transcripts(path), cfg, **kwargs)
