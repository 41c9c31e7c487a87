"""Cross-parallelism determinism sweep.

The driver runs queries under its own Ray session whose CPU count (and
therefore default block count) differs from the local replica's. Any
query whose VALUES depend on the partition layout — float reduction
order, capped-group skips that see different block boundaries,
two-path kernels keyed on per-bucket shape — passes an in-session
double-run test yet goes hash-red in the driver.

This script runs EVERY ``queries()`` entry in two fresh subprocesses
(``num_cpus=8`` and ``num_cpus=32`` by default, overridable via argv),
canonically digests each output (order-insensitive, float-bit-exact),
and reports per-query digest equality.

Usage:
    python scripts/check_xpar_determinism.py [sf_dir] [ncpu_a] [ncpu_b] [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import hashlib
import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, %(repo)r)
sf_dir = %(sf_dir)r
os.environ["GRAFT_ORACLE_SF"] = sf_dir

import ray

ray.init(address="local", num_cpus=%(ncpu)d, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as E


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def digest(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
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


only = set(%(only)r)
out = {}
for name, fn in E.queries().items():
    if only and name not in only:
        continue
    try:
        out[name] = digest(to_pandas(fn(sf_dir)))
    except Exception as exc:  # surfaced as a mismatch downstream
        out[name] = f"ERROR {type(exc).__name__}: {exc}"
with open(%(out_path)r, "w") as f:
    json.dump(out, f)
ray.shutdown()
"""


def run_side(sf_dir: str, ncpu: int, only: list[str], out_path: str) -> dict:
    code = WORKER % {"repo": REPO, "sf_dir": sf_dir, "ncpu": ncpu,
                     "only": only, "out_path": out_path}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"worker ncpu={ncpu} failed")
    with open(out_path) as f:
        return json.load(f)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    ncpu_a = int(args[1]) if len(args) > 1 else 8
    ncpu_b = int(args[2]) if len(args) > 2 else 32
    only = args[3:]
    a = run_side(sf_dir, ncpu_a, only, "/tmp/xpar_a.json")
    b = run_side(sf_dir, ncpu_b, only, "/tmp/xpar_b.json")
    n_pass = n_fail = 0
    for name in sorted(a):
        if a[name].startswith("ERROR") or b.get(name, "").startswith("ERROR"):
            print(f"FAIL {name}: {a[name][:120]} | {b.get(name, '')[:120]}")
            n_fail += 1
        elif a[name] == b.get(name):
            n_pass += 1
        else:
            print(f"FAIL {name}: digest differs across "
                  f"num_cpus={ncpu_a} vs {ncpu_b}")
            n_fail += 1
    print(f"{n_pass} pass, {n_fail} fail "
          f"(sf={sf_dir}, cpus {ncpu_a} vs {ncpu_b})")
    raise SystemExit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
