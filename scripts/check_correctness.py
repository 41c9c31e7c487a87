"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` in DuckDB on the same parquet views, and compares
row-count + (sorted) column names + order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, eng: pd.DataFrame, ora: pd.DataFrame) -> list[str]:
    problems = []
    if len(eng) != len(ora):
        problems.append(f"rowcount {len(eng)} != {len(ora)}")
    ec, oc = sorted(eng.columns), sorted(ora.columns)
    if ec != oc:
        problems.append(f"columns {ec} != {oc}")
        return problems
    # strict dtype parity BEFORE canon: the driver's value hash
    # distinguishes float64 1.0 from int64 1 (r03 reds were exactly
    # this), so a canon-hidden dtype drift is a latent driver red
    for c in ec:
        a, b = eng[c].dtype, ora[c].dtype
        if str(a) != str(b):
            problems.append(f"dtype[{c}]: {a} != {b}")
    a, b = canon(eng), canon(ora)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if pd.api.types.is_float_dtype(a[c]):
                ok = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
            else:
                ok = (pd.Series(av).fillna("<null>") == pd.Series(bv).fillna("<null>")).all()
            if not ok:
                idx = next(i for i in range(len(av))
                           if not (av[i] == bv[i] or (pd.isna(av[i]) and pd.isna(bv[i]))))
                problems.append(f"values[{c}] row {idx}: {av[idx]!r} != {bv[idx]!r}")
    return problems


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ["GRAFT_ORACLE_SF"] = sf_dir  # data-dependent oracle constants

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")), include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            eng = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            ok = eng is not None and len(eng) >= 0
            print(f"ok   {name}: rows-only ({len(eng)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            ora = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        problems = compare(name, eng, ora)
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(eng)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
