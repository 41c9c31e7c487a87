"""Two-phase resumable curation: global-state commit + per-shard
resume must reproduce the plain pipeline exactly."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def doc_files(tmp_path):
    import numpy as np
    import pyarrow as pa

    src = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                        columns=["doc_id", "text"])
    # the raw fixture is single-line without terminal punctuation (all
    # docs would drop at 'clean'): sentence-ify, and route every 5th
    # doc into one shared duplicate group so dedup/quality/kept all
    # have members (mirrors the curation_documents query's plant)
    ids = src.column("doc_id").to_numpy(zero_copy_only=False)
    texts = src.column("text").to_pylist()
    dup = ("this shared duplicate paragraph has plenty of words to "
           "clear the gopher minimum and it ends with a full stop "
           "so the cleaner keeps it around fine.")
    planted = [dup if (i is not None and i % 5 == 0)
               else ((t or "") + ".") for i, t in zip(ids, texts)]
    tbl = pa.table({"doc_id": src.column("doc_id"),
                    "text": pa.array(planted, type=pa.string())})
    files = []
    step = (tbl.num_rows + 2) // 3
    for i in range(3):
        p = str(tmp_path / f"docs-{i}.parquet")
        pq.write_table(tbl.slice(i * step, step), p)
        files.append(p)
    return files


def _manifest(out_dir):
    with open(os.path.join(out_dir, "_manifest.jsonl")) as f:
        return [json.loads(l) for l in f]


def _load(out_dir, shards):
    frames = []
    for k in range(shards):
        d = os.path.join(out_dir, f"shard={k}")
        if any(f.endswith(".parquet") for f in os.listdir(d)):
            frames.append(pq.read_table(d).to_pandas())
    return (pd.concat(frames).sort_values("doc_id")
            .reset_index(drop=True))


def test_curation_resumable_matches_plain(ray_session, doc_files,
                                          tmp_path):
    import ray.data

    from packs_ray.pipelines.curation_pipeline import (
        run_curation_pipeline, run_curation_resumable)

    out = str(tmp_path / "cur")
    summary = run_curation_resumable(doc_files, out, output_shards=4)
    assert summary["total"] == 500
    assert summary["kept"] > 0 and summary["threshold"] is not None

    plain = run_curation_pipeline(
        ray.data.read_parquet(doc_files, columns=["doc_id", "text"]),
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = _load(out, 4)
    pd.testing.assert_frame_equal(got, plain)

    # lineage counts match the output
    recs = _manifest(out)
    assert len(recs) == 4
    assert sum(r["kept"] for r in recs) == int((got["stage"] == "kept").sum())


def test_curation_resume_skips_committed(ray_session, doc_files,
                                         tmp_path):
    from packs_ray.pipelines.curation_pipeline import run_curation_resumable

    out = str(tmp_path / "cur1")
    run_curation_resumable(doc_files, out, output_shards=4)
    recs = _manifest(out)

    # simulate a crash after phase A + shards 0-1: copy state + first
    # two shard dirs + truncated manifest into a fresh out dir
    out2 = str(tmp_path / "cur2")
    os.makedirs(out2)
    shutil.copytree(os.path.join(out, "_state"),
                    os.path.join(out2, "_state"))
    with open(os.path.join(out2, "_manifest.jsonl"), "w") as f:
        for r in recs[:2]:
            f.write(json.dumps(r) + "\n")
    for r in recs[:2]:
        shutil.copytree(os.path.join(out, f"shard={r['shard']}"),
                        os.path.join(out2, f"shard={r['shard']}"))

    summary2 = run_curation_resumable(doc_files, out2, output_shards=4)
    recs2 = _manifest(out2)
    assert len(recs2) == 4
    # committed shards were NOT recomputed: byte-identical manifest rows
    assert recs2[0] == recs[0] and recs2[1] == recs[1]
    # and the final outputs agree
    pd.testing.assert_frame_equal(_load(out, 4), _load(out2, 4))
    assert summary2["total"] == 500
