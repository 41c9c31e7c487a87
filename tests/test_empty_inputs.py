"""Every operator must handle 0-row inputs without raising.

Empty partitions / empty tables are routine at 100 TB scale (a filter
that drops everything, a new date partition, a skewed bucket) — an
operator that crashes on them takes the whole job down.  This sweep runs
EVERY driver query against 0-row replicas of the sf tables (schemas
preserved) and asserts each returns a well-formed (possibly empty)
result.
"""

import os

import pyarrow.parquet as pq
import pytest

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# inputs not derived from the sf tables (synthetic media / generated
# transcripts / file-mtime metadata) are exercised by their own tests
SKIP = {"transcripts_filter_summary", "rule_ablation_transcripts",
        "conversation_summary_transcripts",
        "boilerplate_turns_transcripts", "tool_usage_transcripts",
        "sft_examples_transcripts", "response_latency_transcripts",
        "pii_density_transcripts", "context_fit_transcripts",
        "repeated_responses_transcripts",
        "language_consistency_transcripts",
        "echo_score_transcripts",
        "merge_turns_transcripts",
        "refusal_profile_transcripts",
        "toxicity_profile_transcripts",
        "turn_integrity_transcripts",
        "dedup_conversations_transcripts",
        "template_dedup_transcripts",
        "preference_pairs_transcripts",
        "conversation_windows_transcripts",
        "injection_screen_transcripts",
        "staleness_inputs",
        "media_image_features", "media_audio_features", "media_video_frames"}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        sch = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(sch.empty_table(), os.path.join(d, f"{t}.parquet"))
    return str(d)


def _query_names():
    import __ray_entry__ as e

    return sorted(n for n in e.queries() if n not in SKIP)


@pytest.fixture(scope="module")
def allnull_sf(tmp_path_factory):
    """Tables with rows present but EVERY value null (corrupt-feed
    shape: schemas intact, content gone)."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_allnull")
    for t in TABLES:
        sch = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        cols = {f.name: pa.nulls(50, f.type) for f in sch}
        pq.write_table(pa.table(cols, schema=sch),
                       os.path.join(d, f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _query_names())
def test_query_on_empty_tables(name, empty_sf, ray_session):
    import __ray_entry__ as e

    res = e.queries()[name](empty_sf)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    assert res is not None and len(res) >= 0


@pytest.mark.parametrize("name", _query_names())
def test_query_on_allnull_tables(name, allnull_sf, ray_session):
    import __ray_entry__ as e

    res = e.queries()[name](allnull_sf)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    assert res is not None and len(res) >= 0
