"""End-to-end parity: Ray pipeline vs pandas oracle on labeled fixtures.

Asserts (BASELINE.md targets):
- keep/drop agreement (F1 >= 0.99; we assert exact-match rate too)
- byte-equal scrubbed text under restored (conv_id, turn_idx) order
- drop_reasons set equality per turn
"""

import numpy as np
import pandas as pd
import pytest


def _run_engine(path):
    from packs_ray.pipelines.filter_pipeline import run_filter_pipeline

    out = run_filter_pipeline(path, num_buckets=8)
    df = out.to_pandas()
    return df.sort_values(["conv_id", "turn_idx", "role", "text"],
                          kind="stable").reset_index(drop=True)


def _run_oracle(path):
    from packs_ray.oracle import oracle_labels

    df = pd.read_parquet(path)
    lab = oracle_labels(df)
    return lab.sort_values(["conv_id", "turn_idx", "role", "text"],
                           kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def engine_and_oracle(ray_session, small_transcripts_path):
    return _run_engine(small_transcripts_path), _run_oracle(small_transcripts_path)


def test_row_alignment(engine_and_oracle):
    eng, ora = engine_and_oracle
    assert len(eng) == len(ora)
    pd.testing.assert_series_equal(eng["conv_id"], ora["conv_id"], check_names=False)
    assert (eng["turn_idx"].to_numpy() == ora["turn_idx"].to_numpy()).all()


def test_keep_drop_parity(engine_and_oracle):
    eng, ora = engine_and_oracle
    agree = (eng["keep"].to_numpy() == ora["keep"].to_numpy())
    assert agree.mean() == 1.0, f"keep mismatch on {np.flatnonzero(~agree)[:10]}"
    # F1 on the keep decision (>= 0.99 required; exact parity expected)
    tp = (eng["keep"] & ora["keep"]).sum()
    fp = (eng["keep"] & ~ora["keep"]).sum()
    fn = (~eng["keep"] & ora["keep"]).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99


def test_drop_reasons_parity(engine_and_oracle):
    eng, ora = engine_and_oracle
    for i, (a, b) in enumerate(zip(eng["drop_reasons"], ora["drop_reasons"])):
        assert list(a) == list(b), f"row {i}: {list(a)} != {list(b)}"


def test_scrub_byte_equality(engine_and_oracle):
    eng, ora = engine_and_oracle
    a = eng["text_scrubbed"].to_numpy(dtype=object)
    b = ora["text_scrubbed"].to_numpy(dtype=object)
    mism = [i for i in range(len(a)) if a[i] != b[i]]
    assert not mism, f"{len(mism)} scrub mismatches, first: {mism[:5]}"


def test_lang_and_ppl_columns(engine_and_oracle):
    eng, ora = engine_and_oracle
    assert (eng["lang"].to_numpy() == ora["lang"].to_numpy()).all()
    assert np.allclose(eng["bits_per_byte"], ora["bits_per_byte"], atol=1e-9)


def test_output_turn_idx_stays_int32(ray_session, small_transcripts_path):
    """With dedup marks riding the conversation shuffle (default), output
    turn_idx must still be int32 — not drift to float64 via the null-filled
    mark rows (declared exchange schema: int32)."""
    from packs_ray.pipelines.filter_pipeline import run_filter_pipeline

    out = run_filter_pipeline(small_transcripts_path, num_buckets=8)
    schema = out.schema()
    idx = schema.names.index("turn_idx")
    assert str(schema.types[idx]) == "int32", schema


def test_defect_recall(ray_session, small_transcripts):
    """Sanity vs planted labels: hard defect classes must be dropped and
    clean rows overwhelmingly kept (the oracle is the authority; this
    guards against a degenerate all-drop/all-keep configuration)."""
    import pyarrow.parquet as pq
    from packs_ray.pipelines.filter_pipeline import build_filter_pipeline
    import ray.data

    tbl = small_transcripts  # includes the hidden `defect` label column,
    # which rides through the pipeline untouched
    ds = ray.data.from_arrow(tbl)
    out = build_filter_pipeline(ds, num_buckets=8).to_pandas()
    hard = {"null_text", "empty_text", "whitespace_text", "null_placeholder",
            "too_short", "too_long", "repetition", "symbol_spam", "toxicity",
            "invalid_role", "negative_turn_idx", "null_ts"}
    dropped = ~out["keep"]
    for cls in hard:
        m = out["defect"] == cls
        if m.any():
            assert dropped[m].mean() == 1.0, f"{cls} not fully dropped"
    clean = out["defect"] == "clean"
    assert out["keep"][clean].mean() > 0.9, "too many clean rows dropped"
    pii = out["defect"] == "pii"
    if pii.any():
        kept_pii = out[pii & out["keep"]]
        assert (kept_pii["pii_bits"] > 0).all()
        assert not kept_pii["text_scrubbed"].str.contains("example.com").any()


def test_conversation_summary(ray_session, small_transcripts_path):
    """Per-conversation aggregates must equal a pandas groupby of the
    pipeline output."""
    import pandas as pd

    from packs_ray.pipelines.filter_pipeline import run_filter_pipeline
    from packs_ray.stages.finalize import conversation_summary

    out = run_filter_pipeline(small_transcripts_path, num_buckets=8)
    summary = (conversation_summary(out, num_partitions=4).to_pandas()
               .sort_values("conv_id").reset_index(drop=True))
    df = out.to_pandas()
    exp = (df.assign(scrubbed=df["pii_bits"] > 0)
           .groupby("conv_id", sort=False)
           .agg(n_turns=("turn_idx", "size"), n_kept=("keep", "sum"),
                n_scrubbed=("scrubbed", "sum"), n_roles=("role", "nunique"),
                ts_min=("ts", "min"), ts_max=("ts", "max"))
           .reset_index())
    exp["span_seconds"] = (exp["ts_max"] - exp["ts_min"]).dt.total_seconds().fillna(0.0)
    exp = exp.drop(columns=["ts_min", "ts_max"]).sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        summary.astype({"n_kept": "int64", "n_scrubbed": "int64"}),
        exp.astype({"n_kept": "int64", "n_scrubbed": "int64"}),
        check_dtype=False)


def test_rule_ablation_bit_semantics(ray_session):
    """rule_ablation: counts match a direct bit-level replica over the
    pipeline's rule_bits, unique hits never exceed hits, and the
    __none__ baseline row carries (total, kept, kept)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.config import RULE_NAMES
    from packs_ray.state.metrics import rule_ablation

    rng = np.random.default_rng(11)
    n = 5_000
    # synthetic bit column: ~60% kept, skewed single- and multi-rule hits
    bits = np.where(rng.random(n) < 0.6, 0,
                    rng.integers(1, 1 << len(RULE_NAMES), n))
    ds = ray.data.from_arrow(pa.table({"rule_bits": bits})).repartition(7)
    out = rule_ablation(ds).set_index("rule")

    kept = int((bits == 0).sum())
    for i, name in enumerate(RULE_NAMES):
        bit = 1 << i
        hit = int(((bits & bit) != 0).sum())
        uniq = int((bits == bit).sum())
        assert out.loc[name, "n_hit"] == hit
        assert out.loc[name, "n_unique"] == uniq
        assert out.loc[name, "n_kept_if_removed"] == kept + uniq
        assert uniq <= hit
    assert out.loc["__none__", "n_hit"] == n
    assert out.loc["__none__", "n_unique"] == kept
    assert out.loc["__none__", "n_kept_if_removed"] == kept
