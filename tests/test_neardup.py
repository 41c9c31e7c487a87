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
                              jaccard_threshold=0.6, collect=True)
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    planted = {(i, 50 + i) for i in range(10)}
    assert planted <= found, planted - found


def test_minhash_reports_skipped_buckets(ray_session):
    """Over-sized LSH buckets (identical boilerplate pile-ups) are skipped
    during pair emission and the skip count must be surfaced in
    result.attrs — not silently dropped."""
    import ray.data

    from packs_ray.functions.neardup import minhash_lsh_pairs

    n = 30
    texts = ["exactly the same boilerplate text repeated everywhere"] * n
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n)), "text": texts}))
    # max_group is 200 by default; identical docs make every band one
    # bucket of size n — with n<=200 nothing is skipped and all pairs emit
    out = minhash_lsh_pairs(ds, "doc_id", "text", jaccard_threshold=0.9,
                            collect=True)
    assert out.attrs.get("skipped_buckets") == 0
    assert len(out) == n * (n - 1) // 2

    # monkeypatch-free way to exceed the cap: 250 identical docs > 200
    n2 = 250
    ds2 = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(n2)),
         "text": ["same boilerplate again " * 3] * n2}))
    out2 = minhash_lsh_pairs(ds2, "doc_id", "text", jaccard_threshold=0.9,
                             collect=True)
    assert out2.attrs.get("skipped_buckets", 0) > 0
    assert len(out2) == 0  # every bucket over the cap -> no pairs emitted


def test_minhash_multipartition_verify_matches(neardup_docs):
    """The request-join replication path (verify_partitions > 1) must give
    identical results to the single-partition route."""
    import pandas as pd

    from packs_ray.functions.neardup import minhash_lsh_pairs

    one = minhash_lsh_pairs(neardup_docs, "doc_id", "text",
                            jaccard_threshold=0.6, collect=True)
    multi = minhash_lsh_pairs(neardup_docs, "doc_id", "text",
                              jaccard_threshold=0.6, verify_partitions=3,
                              collect=True)
    pd.testing.assert_frame_equal(one, multi)


def test_minhash_matches_exact_jaccard(neardup_docs):
    """LSH-verified pairs carry EXACT shingle Jaccard — cross-check the
    distributed verify against a local brute-force computation."""
    from packs_ray.functions.neardup import _shingle_hashes, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(neardup_docs, "doc_id", "text",
                              jaccard_threshold=0.6, collect=True)
    docs = neardup_docs.to_pandas().set_index("doc_id")["text"]
    for _, r in pairs.iterrows():
        A = _shingle_hashes(docs.loc[int(r["id_a"])], 5)
        B = _shingle_hashes(docs.loc[int(r["id_b"])], 5)
        inter = len(np.intersect1d(A, B, assume_unique=True))
        exact = inter / (len(A) + len(B) - inter)
        assert abs(r["jaccard"] - round(exact, 4)) < 1e-9, r


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


def test_batch_matrix_null_and_ragged_rows(ray_session):
    """Null / ragged embedding rows must zero-pad, not crash the reshape,
    and top-k over such a table must still rank the valid rows."""
    import ray.data

    from packs_ray.functions.similarity import _batch_matrix, brute_force_topk

    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], None, [0.0, 1.0], [2.0]],
                              type=pa.list_(pa.float32()))})
    m = _batch_matrix(tbl, "embedding")
    assert m.shape == (4, 2)
    assert (m[1] == 0).all() and m[3, 1] == 0
    out = brute_force_topk(ray.data.from_arrow(tbl), "vec_id", "embedding",
                           np.array([1.0, 0.0]), k=2)
    assert list(out["vec_id"]) == [0, 3]  # exact match first, then [2,0]


def test_ivf_persisted_index(ray_session, tmp_path):
    """ivf_build writes a bucket-partitioned index; ivf_query reads only
    the probed bucket directories and must equal the one-shot ivf_topk
    (same centroids, same probe set)."""
    import os

    import pandas as pd
    import ray.data

    from packs_ray.functions.similarity import ivf_build, ivf_query, ivf_topk

    rng = np.random.default_rng(21)
    emb = rng.normal(size=(400, 16))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(400, dtype=np.int64),
        "embedding": [row.tolist() for row in emb]}))
    q = emb[7]
    idx = str(tmp_path / "ivf")
    ivf_build(ds, "vec_id", "embedding", idx, n_centroids=8, seed=5)
    # partitioned layout on disk: one dir per bucket + persisted centroids
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    buckets = [d for d in os.listdir(idx) if d.startswith("ivf_bucket=")]
    assert len(buckets) >= 2
    got = ivf_query(idx, "vec_id", "embedding", q, k=5, nprobe=3)
    exp = ivf_topk(ds, "vec_id", "embedding", q, k=5, n_centroids=8,
                   nprobe=3, seed=5)
    pd.testing.assert_frame_equal(got, exp)


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


def _emb_ds(m: np.ndarray):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              type=pa.list_(pa.float32()))}))


def test_embedding_lsh_pairs_subset_of_exact(ray_session):
    """Every LSH-bucketed pair must appear in the exact all-pairs output
    with an identical cosine (LSH trades recall, never correctness)."""
    from packs_ray.functions.neardup import embedding_cosine_pairs

    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 16))
    near = base[:10] + 0.01 * rng.standard_normal((10, 16))
    m = np.vstack([base, near])
    ds = _emb_ds(m)
    exact = embedding_cosine_pairs(ds, "vec_id", "embedding",
                                   threshold=0.9, n_planes=0, collect=True)
    lsh = embedding_cosine_pairs(ds, "vec_id", "embedding",
                                 threshold=0.9, n_planes=4, n_bands=3,
                                 collect=True)
    exact_pairs = {(a, b): c for a, b, c in
                   zip(exact["id_a"], exact["id_b"], exact["cosine"])}
    assert len(lsh) > 0
    for a, b, c in zip(lsh["id_a"], lsh["id_b"], lsh["cosine"]):
        assert (a, b) in exact_pairs
        assert abs(exact_pairs[(a, b)] - c) < 1e-9
    # planted near-dups are strong candidates: banding should catch most
    planted = {(i, 40 + i) for i in range(10)}
    assert len(planted & set(exact_pairs)) == 10
    found = planted & {(a, b) for a, b in zip(lsh["id_a"], lsh["id_b"])}
    assert len(found) >= 8, found


def test_embedding_banded_beats_single_band(ray_session):
    """More bands -> strictly more (or equal) recall at the same total
    plane budget; both stay subsets of exact."""
    from packs_ray.functions.neardup import embedding_cosine_pairs

    rng = np.random.default_rng(17)
    base = rng.standard_normal((60, 24))
    near = base[:20] + 0.05 * rng.standard_normal((20, 24))
    ds = _emb_ds(np.vstack([base, near]))
    one = embedding_cosine_pairs(ds, "vec_id", "embedding",
                                 threshold=0.9, n_planes=12, n_bands=1,
                                 collect=True)
    banded = embedding_cosine_pairs(ds, "vec_id", "embedding",
                                    threshold=0.9, n_planes=4, n_bands=3,
                                    collect=True)
    assert len(banded) >= len(one)
    planted = {(i, 60 + i) for i in range(20)}
    hit = planted & {(a, b) for a, b in zip(banded["id_a"], banded["id_b"])}
    assert len(hit) >= 16, len(hit)


def test_embedding_pathological_bucket_capped(ray_session):
    """A same-bucket pile-up (thousands of identical embeddings) must
    complete with bounded memory: over-cap buckets are skipped and the
    skip count surfaced — never an O(g^2) in-bucket blow-up."""
    from packs_ray.functions.neardup import embedding_cosine_pairs

    n = 5000  # identical vectors: one bucket per band, all over max_group
    m = np.tile(np.arange(8, dtype=np.float64), (n, 1))
    out = embedding_cosine_pairs(_emb_ds(m), "vec_id", "embedding",
                                 threshold=0.9, n_planes=4, n_bands=2,
                                 collect=True)
    assert len(out) == 0
    assert out.attrs["skipped_buckets"] > 0

    # under the cap the same corpus emits every pair exactly once
    small = embedding_cosine_pairs(_emb_ds(m[:50]), "vec_id", "embedding",
                                   threshold=0.9, n_planes=4, n_bands=2,
                                   collect=True)
    assert len(small) == 50 * 49 // 2
    assert small.attrs["skipped_buckets"] == 0
    assert (small["cosine"] == 1.0).all()


def test_embedding_pairs_multipartition_verify(ray_session):
    """Request-join payload replication (verify_partitions > 1) must give
    identical results to the single-partition route."""
    import pandas as pd

    from packs_ray.functions.neardup import embedding_cosine_pairs

    rng = np.random.default_rng(23)
    base = rng.standard_normal((50, 16))
    ds = _emb_ds(np.vstack([base, base[:15] + 0.02]))
    one = embedding_cosine_pairs(ds, "vec_id", "embedding", threshold=0.85,
                                 n_planes=4, n_bands=2, collect=True)
    multi = embedding_cosine_pairs(ds, "vec_id", "embedding", threshold=0.85,
                                   n_planes=4, n_bands=2, verify_partitions=3,
                                   collect=True)
    pd.testing.assert_frame_equal(one, multi)
    assert len(one) > 0


def test_bloom_membership_no_false_negatives(ray_session):
    """The Bloom candidate prefilter can false-positive (harmless) but
    must NEVER drop a real candidate id."""
    import ray.data

    from packs_ray.functions.neardup import (_bloom_build, _bloom_contains,
                                             _bloom_nbits)

    rng = np.random.default_rng(5)
    ids = rng.integers(-2**62, 2**62, size=2000, dtype=np.int64)
    pairs = pa.table({"id_a": pa.array(ids[:1000], type=pa.int64()),
                      "id_b": pa.array(ids[1000:], type=pa.int64())})
    nbits = _bloom_nbits(len(ids))
    bm = _bloom_build(ray.data.from_arrow(pairs), nbits)
    assert _bloom_contains(bm, ids, nbits).all()
    probe = rng.integers(-2**62, 2**62, size=20000, dtype=np.int64)
    fresh = probe[~np.isin(probe, ids)]
    fp = _bloom_contains(bm, fresh, nbits).mean()
    assert fp < 0.02, fp


def test_dedup_spans_planted(ray_session):
    """Span-level dedup: a boilerplate k-token span pasted into several
    otherwise-distinct docs survives only in its first (doc_id, pos)
    occurrence; shorter-than-k repeats are untouched; within-doc repeats
    are removed after the first; result is block-split invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.spandedup import dedup_spans

    rng = np.random.default_rng(3)
    boiler = "click here to subscribe to our newsletter today"  # 8 tokens
    short = "terms apply"                                       # 2 tokens
    docs = []
    for i in range(20):
        words = [f"w{i}_{j}" for j in range(rng.integers(10, 25))]
        mid = len(words) // 2
        if i % 3 == 0:
            words = words[:mid] + boiler.split() + words[mid:]
        words += short.split()
        docs.append(" ".join(words))
    docs.append(" ".join(["rep"] * 20))          # within-doc repetition
    docs.append("")                              # empty doc
    docs.append(None)                            # null doc
    ids = list(range(len(docs)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": docs}))
    out = (dedup_spans(ds, "doc_id", "text", k=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert len(out) == len(docs)
    first_with_boiler = 0
    assert boiler in out.text_deduped[first_with_boiler]
    for i in range(1, 20):
        if i % 3 == 0:
            assert boiler not in out.text_deduped[i]
            assert out.n_dup_tokens[i] >= 8
        else:
            assert out.n_dup_tokens[i] == 0
            # short repeated phrase (< k tokens) never removed
            assert out.text_deduped[i].endswith(short)
    # within-doc: "rep"*20 has windows at pos 0..12; pos 0 canonical,
    # covered = pos 1..12 span -> tokens 1..19 removed, 1 kept... the
    # first window [0,8) is itself canonical but tokens 1..7 are covered
    # by later duplicate windows, so exactly the tokens covered by
    # windows 1..12 (i.e. 1..19) go
    rep = out[out.doc_id == 20].iloc[0]
    assert rep.n_tokens == 20 and rep.text_deduped == "rep"
    assert rep.n_dup_tokens == 19
    # empty/null docs
    assert (out[out.doc_id >= 21].n_tokens == 0).all()
    assert (out[out.doc_id >= 21].text_deduped == "").all()

    out7 = (dedup_spans(ds.repartition(7), "doc_id", "text", k=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out7)


def test_minhash_pairs_lazy_dataset_feeds_components(neardup_docs):
    """Default return is a LAZY Dataset — the verified pair set never
    lands on the driver (the 100-TB shape: pairs stream straight into
    connected_components).  The Dataset path must agree exactly with the
    collect=True convenience path, and clustering a pathological
    all-near-dup corpus must work end-to-end without a pandas round-trip."""
    import pandas as pd
    import ray.data

    from packs_ray.functions.components import connected_components
    from packs_ray.functions.neardup import minhash_lsh_pairs

    lazy = minhash_lsh_pairs(neardup_docs, "doc_id", "text",
                             jaccard_threshold=0.6)
    assert isinstance(lazy, ray.data.Dataset)
    collected = minhash_lsh_pairs(neardup_docs, "doc_id", "text",
                                  jaccard_threshold=0.6, collect=True)
    lazy_pdf = (lazy.to_pandas().sort_values(["id_a", "id_b"])
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(lazy_pdf, collected)

    labels = (connected_components(lazy, "id_a", "id_b", node_col="doc_id",
                                   label_col="cluster_id")
              .to_pandas().set_index("doc_id")["cluster_id"])
    for i in range(10):  # planted near-dups: (i, 50+i) share a component
        assert labels[i] == labels[50 + i] == min(i, labels[i])


def test_minhash_pathological_corpus_stays_distributed(ray_session):
    """160 docs of only 4 distinct texts = ~3.2k verified pairs from a
    boilerplate pile-up.  The default (lazy) path must hold ZERO pair
    rows on the driver: consume one streamed batch and verify the full
    cluster labels agree with the known ground truth."""
    import ray.data

    from packs_ray.functions.components import connected_components
    from packs_ray.functions.neardup import minhash_lsh_pairs

    texts, ids = [], []
    for i in range(160):
        texts.append(f"boilerplate variant {i % 4} " * 6)
        ids.append(i)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    pairs = minhash_lsh_pairs(ds, "doc_id", "text", jaccard_threshold=0.9)
    assert isinstance(pairs, ray.data.Dataset)
    # streaming consumption: first batch only, no to_pandas of the set
    first = next(iter(pairs.iter_batches(batch_size=64,
                                         batch_format="pyarrow")))
    assert first.num_rows > 0
    labels = connected_components(pairs, "id_a", "id_b", node_col="doc_id",
                                  label_col="cluster_id").to_pandas()
    assert len(labels) == 160
    got = labels.set_index("doc_id")["cluster_id"]
    for i in range(160):
        assert got[i] == i % 4  # component min = first doc of each variant


def test_simhash_pairs_exact_at_hamming3(ray_session):
    """simhash_pairs == brute-force all-pairs hamming<=3 (band
    pigeonhole is recall-exact) on a corpus engineered for near
    collisions; higher-distance pairs excluded."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.neardup import (_popcount64, simhash64,
                                             simhash_pairs)

    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "the quick brown fox jumps over the lazy dog " * 3 + "!",
             "a completely different document about data engines",
             "a completely different document about data engines!!",
             "unrelated third thing entirely, nothing shared here"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    ds = ray.data.from_arrow(tbl)
    got = simhash_pairs(ds, "doc_id", "text", max_hamming=3,
                        collect=True)
    got_set = {(a, b): h for a, b, h in
               zip(got["id_a"], got["id_b"], got["hamming"])}

    sigs = (simhash64(ray.data.from_arrow(tbl), "doc_id", "text")
            .to_pandas().sort_values("doc_id"))
    sv = sigs["simhash"].to_numpy().view(np.uint64)
    exp = {}
    for i in range(len(sv)):
        for j in range(i + 1, len(sv)):
            h = int(_popcount64(np.array([sv[i] ^ sv[j]]))[0])
            if h <= 3:
                exp[(i, j)] = h
    assert got_set == exp and len(exp) >= 1


def test_phash_pairs_recall_and_cap(ray_session):
    """Banded Hamming-LSH must find EVERY pair within max_hamming
    (pigeonhole recall with bands > max_hamming) and must skip (not
    crash on) a pathological bucket where every image is identical."""
    import numpy as np
    import pyarrow as pa
    import ray

    from packs_ray.functions import multimodal as mm

    # recall: brute force over the planted corpus
    t = mm.synth_neardup_images(64, seed=11)
    hd = mm.image_dhash(ray.data.from_arrow(t).repartition(3))
    hdf = hd.to_pandas().sort_values("media_id").reset_index(drop=True)
    hv = hdf["phash"].to_numpy(np.int64).view(np.uint64)
    ia, ib = np.triu_indices(len(hv), k=1)
    d = mm._popcount64(hv[ia] ^ hv[ib])
    mids = hdf["media_id"].to_numpy(np.int64)
    exp = set(zip(mids[ia[d <= 10]].tolist(), mids[ib[d <= 10]].tolist()))
    got = mm.phash_pairs(hd).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == exp and len(exp) >= 1
    assert list(got["hamming"].dtype.name)[0] == "i"

    # dHash is invariant to the BMP round-trip
    truths = mm.neardup_truth_pixels(64, seed=11)
    assert all(int(hv[i]) == int(mm.dhash64(truths[i]))
               for i in range(len(truths)))

    # cap: 600 identical hashes -> every band bucket oversized -> all
    # skipped, empty result (surfaced, not O(n^2))
    same = ray.data.from_arrow(pa.table({
        "media_id": pa.array(np.arange(600, dtype=np.int64)),
        "phash": pa.array(np.full(600, 12345, dtype=np.int64))}))
    capped = mm.phash_pairs(same, group_cap=512).to_pandas()
    assert len(capped) == 0


def test_suppress_against_state_planted(ray_session, tmp_path):
    import pyarrow as pa
    import ray

    from packs_ray.functions.neardup import (save_neardup_state,
                                             suppress_against_state)

    base = ("The quick brown fox jumps over the lazy dog again and "
            "again in the long document body. " * 4)
    old = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([base, "totally unrelated content here"])}))
    run = save_neardup_state(old, "id", "text", str(tmp_path),
                             run_id="r1")

    new = ray.data.from_arrow(pa.table({
        "id": pa.array([10, 11, 12], type=pa.int64()),
        "text": pa.array([
            base.replace("lazy", "sleepy"),     # near-dup of doc 1
            "completely fresh never seen text about other things",
            None])})).repartition(2)
    sup = suppress_against_state(new, "id", "text", [run]).to_pandas()
    assert list(sup["id"]) == [10]

    # empty state: nothing suppressed
    none = suppress_against_state(new, "id", "text",
                                  [str(tmp_path / "missing")])
    assert none.count() == 0
