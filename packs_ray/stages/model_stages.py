"""Stateful actor-pool stages: language ID + perplexity scoring.

Callable classes for ``ds.map_batches(Cls, concurrency=N, ...)`` — model
state built ONCE per actor in ``__init__`` (the fitted-model scoring
template of the reference, outlier_detection_pack/main.py:201-260:
fit/load once, score every row), work per batch in ``__call__`` over
zero-copy Arrow tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from packs_ray.config import DEFAULT_CONFIG, RULE_BIT, FilterConfig
from packs_ray.models import load_langid_model, load_perplexity_model
from packs_ray.stages.util import str_column


def _or_bits(batch: pa.Table, add: np.ndarray) -> pa.Table:
    if "rule_bits" in batch.column_names:
        add = add | batch.column("rule_bits").to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["rule_bits"])
    return batch.append_column("rule_bits", pa.array(add, type=pa.int64()))


class LangIdStage:
    """Adds ``lang`` (predicted language) and ORs the ``non_target_lang``
    rule bit for confident non-target predictions."""

    def __init__(self, cfg: FilterConfig = DEFAULT_CONFIG, *,
                 model_path: str | None = None) -> None:
        self.cfg = cfg
        # once per actor: stand-in by default, real fastText .bin when
        # model_path / PACKS_RAY_FASTTEXT_BIN points at one (gated
        # loader, models.load_langid_model) -- identical surface
        self.model = load_langid_model(model_path)
        self.keep = frozenset(cfg.keep_languages) | {"und"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = str_column(batch, "text")
        pred, margin = self.model.predict_batch(text)
        drop = np.array([p not in self.keep for p in pred], dtype=bool)
        drop &= margin > self.cfg.langid_min_margin
        bits = drop.astype(np.int64) * RULE_BIT["non_target_lang"]
        batch = batch.append_column("lang", pa.array(pred, type=pa.string()))
        return _or_bits(batch, bits)


class PerplexityStage:
    """Adds ``bits_per_byte`` and ORs the ``high_perplexity`` rule bit."""

    def __init__(self, cfg: FilterConfig = DEFAULT_CONFIG, *,
                 model_path: str | None = None) -> None:
        self.cfg = cfg
        # once per actor: byte-bigram stand-in by default, a real
        # KenLM-format ARPA file when model_path / PACKS_RAY_KENLM_ARPA
        # points at one (models.load_perplexity_model)
        self.model = load_perplexity_model(model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = str_column(batch, "text")
        bpb = self.model.bits_per_byte(text)
        bits = (bpb > self.cfg.max_bits_per_char).astype(np.int64) * RULE_BIT["high_perplexity"]
        batch = batch.append_column("bits_per_byte",
                                    pa.array(np.round(bpb, 4), type=pa.float64()))
        return _or_bits(batch, bits)


class QualityModelStage:
    """Fused langid + perplexity actor: both models built once per actor,
    one batch pass, one pool.  Two separate pools halved utilization on a
    shared node (each capped pool starves while the other's queue grows);
    a single fused pool keeps every actor busy and removes one
    inter-stage object-store hop per block."""

    def __init__(self, cfg: FilterConfig = DEFAULT_CONFIG, *,
                 langid_model_path: str | None = None,
                 perplexity_model_path: str | None = None) -> None:
        self.langid = LangIdStage(cfg, model_path=langid_model_path)
        self.ppl = PerplexityStage(cfg, model_path=perplexity_model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.ppl(self.langid(batch))
