"""End-to-end drive of scripts/run_pipeline.py — the actual
`ray job submit` target: fresh run writes every shard + manifest,
re-run resumes to a no-op, output row count and schema survive."""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pads
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def small_input(tmp_path_factory):
    """4 parquet fragments (shard granularity is per input file)."""
    import pyarrow.parquet as pq

    from packs_ray.gen import transcripts_path

    t = pq.read_table(transcripts_path(2_000))
    d = tmp_path_factory.mktemp("cli_in")
    q = t.num_rows // 4
    for i in range(4):
        pq.write_table(t.slice(i * q, q if i < 3 else t.num_rows - 3 * q),
                       str(d / f"part_{i}.parquet"))
    return str(d)


def _run(inp, out):
    # subprocess owns its own LOCAL session (run_pipeline defaults to
    # address="auto" for the real `ray job submit` environment)
    env = dict(os.environ, RAY_ADDRESS="local")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--input", inp, "--output", out, "--shards", "4"],
        capture_output=True, text=True, timeout=420, env=env)


def test_cli_run_and_resume(small_input, tmp_path):
    out = str(tmp_path / "filtered")
    r1 = _run(small_input, out)
    assert r1.returncode == 0, r1.stderr[-2000:]
    manifest = os.path.join(out, "_manifest.jsonl")
    assert os.path.exists(manifest)
    done = [json.loads(l) for l in open(manifest)]
    assert sorted(r["shard"] for r in done) == [0, 1, 2, 3]
    # per-shard lineage: input fragments + rule-hit histogram counts
    assert all(r["files"] and "total" in r and "kept" in r for r in done)
    def read_shards():
        import pyarrow as pa

        parts = [pads.dataset(os.path.join(out, d)).to_table()
                 for d in sorted(os.listdir(out)) if d.startswith("shard=")]
        return pa.concat_tables(parts, promote_options="default")

    t = read_shards()
    assert t.num_rows == 2_000
    for col in ("keep", "drop_reasons", "text_scrubbed"):
        assert col in t.column_names

    # second run: all shards already committed -> resume is a no-op
    # (manifest unchanged, no new lines, output intact)
    r2 = _run(small_input, out)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert [json.loads(l) for l in open(manifest)] == done
    assert read_shards().num_rows == 2_000
