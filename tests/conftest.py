import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_transcripts():
    """~5k-turn labeled fixture table (FIXTURES.md §A 'small')."""
    from packs_ray.gen import generate_transcripts

    return generate_transcripts(5_000, seed=42, include_labels=True)


@pytest.fixture(scope="session")
def small_transcripts_path(small_transcripts, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("transcripts")
    p = str(d / "small.parquet")
    pq.write_table(small_transcripts.drop_columns(["defect"]), p)
    return p


SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"
