"""Edge-semantics tests for the session-6 operators (the DuckDB-oracle
sweeps cover end-to-end parity; these pin the tricky local semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df)


# ---------------------------------------------------------------- bpe

def test_bpe_greedy_overlap_and_second_order(ray_session):
    # "a a a a" must merge greedily -> (aa)(aa); later rounds must see
    # merged symbols ("aa"+"aa" -> "aaaa")
    from packs_ray.functions.bpe import bpe_merges

    df = pd.DataFrame({"text": ["aaaa aaaa aaaa", None, "  "]})
    out = bpe_merges(_ds(df), "text", n_merges=2)
    assert list(out["left"]) == ["a", "aa"]
    assert list(out["right"]) == ["a", "aa"]
    # 3 words x 4 chars: round 1 pairs: greedy (aa)(aa) per word -> the
    # a,a pair count is 3 words * 3 adjacent pairs = 9
    assert out.iloc[0]["pair_count"] == 9
    # round 2: each word is (aa)(aa) -> one aa,aa pair per word
    assert out.iloc[1]["pair_count"] == 3


def test_bpe_tie_break_lexicographic(ray_session):
    from packs_ray.functions.bpe import bpe_merges

    # "xy" and "xz" both appear once: pairs (x,y) and (x,z) tie at 1;
    # (x,y) < (x,z) lexicographically
    df = pd.DataFrame({"text": ["xy xz"]})
    out = bpe_merges(_ds(df), "text", n_merges=1)
    assert (out.iloc[0]["left"], out.iloc[0]["right"]) == ("x", "y")


# ---------------------------------------------------------- skew_join

def test_skew_join_matches_equi_join(ray_session):
    from packs_ray.functions.joins import equi_join, skew_join

    rng = np.random.default_rng(7)
    # one mega-key (0) + a uniform tail; some left keys miss the right
    lk = np.where(rng.random(500) < 0.4, 0, rng.integers(1, 40, 500))
    left = pd.DataFrame({"k": lk, "lv": np.arange(500)})
    right = pd.DataFrame({"k": np.arange(30), "rv": np.arange(30) * 10})
    got = skew_join(_ds(left), _ds(right), left_on="k", right_on="k",
                    phi=0.05).to_pandas()
    want = equi_join(_ds(left), _ds(right), left_on=["k"],
                     right_on=["k"], how="inner").to_pandas()
    key = ["k", "lv", "k_r", "rv"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_skew_join_null_keys_drop(ray_session):
    from packs_ray.functions.joins import skew_join

    left = pd.DataFrame({"k": pd.array([1, None, 1, 2], dtype="Int64"),
                         "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "rv": [10, 20]})
    out = skew_join(_ds(left), _ds(right), left_on="k", right_on="k",
                    phi=0.3).to_pandas()
    assert len(out) == 2 and set(out["lv"]) == {1, 3}


# ------------------------------------------------------ triangle_count

def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in es for x in e})
    t = 0
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) not in es:
                continue
            for w in nodes[nodes.index(v) + 1:]:
                if (u, w) in es and (v, w) in es:
                    t += 1
    return len(nodes), len(es), t


def test_triangle_count_vs_brute_force(ray_session):
    from packs_ray.functions.graph import triangle_count

    rng = np.random.default_rng(11)
    src = rng.integers(0, 25, 300)
    dst = rng.integers(0, 25, 300)
    df = pd.DataFrame({"s": src, "d": dst})
    out = triangle_count(_ds(df), "s", "d")
    n_nodes, n_edges, n_tri = _brute_triangles(list(zip(src, dst)))
    row = out.iloc[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) \
        == (n_nodes, n_edges, n_tri)
    # clustering in [0, 1]
    assert 0.0 <= row["clustering"] <= 1.0


def test_triangle_count_empty(ray_session):
    from packs_ray.functions.graph import triangle_count

    df = pd.DataFrame({"s": pd.Series(dtype="int64"),
                       "d": pd.Series(dtype="int64")})
    out = triangle_count(_ds(df), "s", "d")
    assert out.iloc[0]["n_triangles"] == 0


# ----------------------------------------------------------- kmeans

def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    from packs_ray.functions.similarity import kmeans_fit

    # two tight blobs, k=3: the third centroid (init = third-smallest
    # id, inside blob A) empties after round 1 and must keep its
    # previous position rather than NaN out
    pts = [[0.0, 0.0], [0.01, 0.0], [0.02, 0.0],
           [1.0, 1.0], [1.01, 1.0], [1.02, 1.0]]
    df = pd.DataFrame({"vec_id": range(6), "embedding": pts})
    cent, summary = kmeans_fit(_ds(df), "vec_id", "embedding",
                               k=3, iters=3)
    assert np.isfinite(cent).all()
    assert int(summary["n"].sum()) == 6
    assert summary["inertia"].ge(0).all()


def test_kmeans_single_cluster_mean(ray_session):
    from packs_ray.functions.similarity import kmeans_fit

    df = pd.DataFrame({"vec_id": range(4),
                       "embedding": [[0.0, 2.0], [0.0, 4.0],
                                     [0.0, 6.0], [0.0, 8.0]]})
    cent, summary = kmeans_fit(_ds(df), "vec_id", "embedding",
                               k=1, iters=2)
    assert cent.shape == (1, 2)
    assert cent[0, 1] == pytest.approx(5.0, abs=1e-6)
    assert int(summary.iloc[0]["n"]) == 4


# ------------------------------------------------------------- hybrid

def test_hybrid_rrf_fusion_arithmetic(ray_session):
    from packs_ray.functions.search import hybrid_rrf

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta", "alpha alpha", "gamma delta"]})
    embs = pd.DataFrame({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]})
    out = hybrid_rrf(_ds(docs), _ds(embs), id_col="doc_id",
                     text_col="text", emb_id_col="vec_id",
                     emb_col="embedding", query_text="alpha",
                     query_vec=np.array([1.0, 0.0]), k=3, k_each=3)
    # doc 2 is bm25 rank 1 (two alphas); doc 1 is cosine rank 1
    r = out.set_index("doc_id")
    assert r.loc[2, "bm25_rank"] == 1.0 and r.loc[1, "cos_rank"] == 1.0
    # rrf = 1/(60+rb) + 1/(60+rc), 6dp
    for did in (1, 2):
        rb, rc = r.loc[did, "bm25_rank"], r.loc[did, "cos_rank"]
        want = round(1.0 / (60 + rb) + 1.0 / (60 + rc), 6)
        assert r.loc[did, "rrf"] == pytest.approx(want, abs=2e-6)


# ------------------------------------------------------------ NB

def test_nb_separable_classes(ray_session):
    from packs_ray.functions.lm import naive_bayes_classify

    rows = [("cat purr meow whiskers", "animal")] * 6 \
        + [("engine wheel brake road", "car")] * 6
    df = pd.DataFrame({"doc_id": range(12),
                       "text": [t for t, _ in rows],
                       "label": [l for _, l in rows]})
    out = naive_bayes_classify(_ds(df), "doc_id", "text", "label",
                               vocab_size=64).to_pandas()
    assert list(out.sort_values("doc_id")["pred"]) \
        == ["animal"] * 6 + ["car"] * 6


def test_nb_unlabeled_rows_still_score(ray_session):
    from packs_ray.functions.lm import naive_bayes_classify

    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["aa bb", "cc dd", "aa bb"],
                       "label": ["x", "y", None]})
    out = naive_bayes_classify(_ds(df), "doc_id", "text", "label",
                               vocab_size=16).to_pandas()
    assert len(out) == 3
    assert out.set_index("doc_id").loc[2, "pred"] == "x"
