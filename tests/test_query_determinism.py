"""Driver-hash hardening sweep over every ``queries()`` entry.

Two properties, both at sf0.001 (small enough for CI, large enough to
exercise the shuffle paths):

1. **dtype parity vs the oracle** — the driver's value hash is
   repr-sensitive (r03: ``interval_join_events`` et al. went red purely
   because pandas upcast int64 ids to float64 in the marked-union join
   kernel while rows/schema still matched).  Engine output dtypes must
   equal the DuckDB oracle's fetchdf dtypes exactly.
2. **double-run byte determinism** — the driver hashes one run; any
   run-to-run nondeterminism (partition-count-dependent code paths,
   unstable map_groups ordering feeding an order-SENSITIVE downstream
   computation, float reduction-order drift) is a latent red.  Each
   query runs twice and the canonicalized outputs must be bit-identical
   (exact float bit patterns, not allclose).
"""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _digest(df: pd.DataFrame) -> str:
    """Order-insensitive but bit-exact digest: canonical row/col sort,
    then raw value bytes per column (float NaN/-0.0 bit patterns count)."""
    df = _canon(df)
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(str(df[c].dtype).encode())
        v = df[c]
        if pd.api.types.is_datetime64_any_dtype(v):
            h.update(v.astype("int64").to_numpy().tobytes())
        elif v.dtype == object or pd.api.types.is_string_dtype(v):
            h.update("\x1f".join("<null>" if pd.isna(x) else str(x)
                                 for x in v).encode())
        else:
            h.update(np.ascontiguousarray(v.to_numpy()).tobytes())
    return h.hexdigest()


@pytest.fixture(scope="module")
def entry(ray_session):
    os.environ["GRAFT_ORACLE_SF"] = SF_DIR
    import __ray_entry__ as E

    return E


@pytest.fixture(scope="module")
def oracle_con():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _query_names():
    # enumerate without Ray so pytest collection stays cheap; the module
    # fixture re-imports with Ray up
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("GRAFT_ORACLE_SF", SF_DIR)
    import __ray_entry__ as E

    return sorted(E.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_dtype_parity_and_determinism(name, entry, oracle_con):
    qs = entry.queries()
    osql = entry.oracle_sql()
    eng1 = _to_pandas(qs[name](SF_DIR))
    eng2 = _to_pandas(qs[name](SF_DIR))
    assert _digest(eng1) == _digest(eng2), (
        f"{name}: two runs produced different canonical bytes "
        "(run-to-run nondeterminism — latent driver hash red)")
    if name not in osql:
        return  # rows-only queries have no SQL twin to dtype-check
    ora = oracle_con.execute(osql[name]).fetchdf()
    assert sorted(eng1.columns) == sorted(ora.columns), name
    mism = {c: (str(eng1[c].dtype), str(ora[c].dtype))
            for c in eng1.columns if str(eng1[c].dtype) != str(ora[c].dtype)}
    assert not mism, f"{name}: engine vs oracle dtype drift {mism}"
