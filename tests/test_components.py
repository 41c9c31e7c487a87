"""Connected-components label propagation vs a driver union-find."""

import numpy as np
import pandas as pd
import pytest


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min per component
    out = {}
    for x in parent:
        root = find(x)
        out[x] = min(out.get(root, root), root)
    return {x: find(x) for x in parent}


def _expected(pairs):
    lab = _union_find(pairs)
    # union-find roots are not guaranteed minimal; normalize to min-of-component
    comp = {}
    for node, root in lab.items():
        comp.setdefault(root, []).append(node)
    exp = {}
    for members in comp.values():
        m = min(members)
        for node in members:
            exp[node] = m
    return exp


@pytest.mark.parametrize("pairs", [
    [(1, 2), (2, 3), (10, 11)],                      # chain + pair
    [(5, 1), (5, 2), (5, 3), (5, 4)],                # star, hub not minimal
    [(30, 31), (31, 32), (32, 33), (33, 34)],        # long chain (diameter 4)
    [(7, 8), (8, 7), (7, 8)],                        # duplicate/reversed edges
], ids=["chain+pair", "star", "long-chain", "dup-edges"])
def test_cc_matches_union_find(pairs, ray_session):
    from packs_ray.functions.components import connected_components

    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    out = connected_components(df).to_pandas()
    got = dict(zip(out["node"], out["cluster"]))
    assert got == _expected(pairs)


def test_cc_random_graph_property(ray_session):
    from packs_ray.functions.components import connected_components

    rng = np.random.default_rng(7)
    a = rng.integers(0, 60, size=120)
    b = rng.integers(0, 60, size=120)
    pairs = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    out = connected_components(df).to_pandas()
    got = dict(zip(out["node"], out["cluster"]))
    assert got == _expected(pairs)


def test_drop_near_duplicates_keeps_canonical(ray_session):
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.components import (connected_components,
                                                drop_near_duplicates)

    pairs = pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    docs = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2, 3, 4]}))
    kept = drop_near_duplicates(docs, "doc_id",
                                connected_components(pairs)).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 4]


def test_cluster_canonicals_keep_best(ray_session):
    """cluster_canonicals picks the max-score member (ties -> min id)
    and drop_near_duplicates(canonicals=...) keeps exactly the
    canonical + unclustered rows."""
    import pyarrow as pa
    import ray.data

    from packs_ray.functions.components import (cluster_canonicals,
                                                connected_components,
                                                drop_near_duplicates)

    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 10], type=pa.int64()),
        "id_b": pa.array([2, 3, 11], type=pa.int64())}))
    labels = connected_components(pairs, node_col="doc_id",
                                  label_col="cluster_id")
    # scores: doc 3 is the longest in {1,2,3}; 10 and 11 tie -> min id 10
    scores = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11, 99], type=pa.int64()),
        "n_chars": pa.array([5, 7, 9, 4, 4, 100], type=pa.int64())}))
    canon = cluster_canonicals(labels, scores, id_col="doc_id",
                               score_col="n_chars", node_col="doc_id",
                               label_col="cluster_id").to_pandas()
    canon = canon.sort_values("cluster_id").reset_index(drop=True)
    assert canon["cluster_id"].tolist() == [1, 10]
    assert canon["doc_id"].tolist() == [3, 10]
    assert canon["n_chars"].tolist() == [9, 4]
    assert canon["doc_id"].dtype == "int64"

    labels2 = connected_components(pairs, node_col="doc_id",
                                   label_col="cluster_id")
    kept = drop_near_duplicates(
        scores, "doc_id", labels2, node_col="doc_id",
        label_col="cluster_id",
        canonicals=ray.data.from_pandas(canon),
        canonical_col="doc_id").to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [3, 10, 99]
