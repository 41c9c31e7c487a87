"""Near-dup family sanity: planted near-duplicates must be found."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def neardup_docs(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base = [" ".join(np.random.default_rng(i).choice(words, 30)) for i in range(50)]
    texts = list(base)
    # planted near-dups: copy with one word changed
    for i in range(0, 10):
        toks = base[i].split()
        toks[5] = "CHANGED"
        texts.append(" ".join(toks))
    ids = list(range(len(texts)))
    return ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def test_minhash_finds_planted_pairs(neardup_docs):
    from packs_ray.functions.neardup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(neardup_docs, "doc_id", "text",
                              jaccard_threshold=0.6)
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    planted = {(i, 50 + i) for i in range(10)}
    assert planted <= found, planted - found


def test_simhash_close_for_neardups(neardup_docs):
    from packs_ray.functions.neardup import simhash64

    df = simhash64(neardup_docs, "doc_id", "text").to_pandas().set_index("doc_id")
    hd = []
    for i in range(10):
        a = np.uint64(df.loc[i, "simhash"].astype(np.int64).view(np.uint64)) \
            if hasattr(df.loc[i, "simhash"], "astype") else np.int64(df.loc[i, "simhash"]).view(np.uint64)
        b = np.int64(df.loc[50 + i, "simhash"]).view(np.uint64)
        hd.append(bin(int(a) ^ int(b)).count("1"))
    assert np.mean(hd) < 16, hd  # near-dups have small Hamming distance


def test_ivf_recall_vs_bruteforce(ray_session):
    import ray.data

    from packs_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(11)
    m = rng.standard_normal((400, 16)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(np.arange(400), type=pa.int64()),
                    "embedding": pa.array([list(r) for r in m],
                                          type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    q = m[7].astype(np.float64)
    bf = brute_force_topk(ds, "vec_id", "embedding", q, k=10)
    ivf = ivf_topk(ds, "vec_id", "embedding", q, k=10, n_centroids=8, nprobe=4)
    assert bf.iloc[0]["vec_id"] == 7  # the query vector itself
    recall = len(set(bf["vec_id"]) & set(ivf["vec_id"])) / 10
    assert recall >= 0.5, recall
