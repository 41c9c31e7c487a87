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
