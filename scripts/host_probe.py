"""Host-window probe: measures this sandbox's *current* parallel
capacity independently of Ray or our code, so a bench/scaling number
can be tagged with the window it landed in (BASELINE.md documents up
to 6x wall-clock variance from hypervisor-side memory contention).

Two kernels, each run at 1, 2, 8 and 32 concurrent processes:
  cpu  - register-only integer loop (no memory traffic): measures raw
         CPU-slot availability.
  mem  - streaming numpy pass over a fresh 200 MB array (first-touch
         page faults + bandwidth): measures the memory subsystem, the
         thing that actually throttles text/hash workloads here.

Prints one JSON line: per-kernel seconds at each level and the
parallel efficiency  eff_N = t1 / (tN) (ideal 1.0 - all N finish in
the single-process time).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _cpu(_):
    x = 1
    for _ in range(40_000_000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def _mem(_):
    import numpy as np

    a = np.arange(25_000_000, dtype=np.float64)  # 200 MB, fresh pages
    s = 0.0
    for _ in range(4):
        s += float(a.sum())
        a *= 1.0000001
    return s


def timed(fn, n: int) -> float:
    ctx = mp.get_context("spawn")
    t0 = time.time()
    with ctx.Pool(n) as p:
        p.map(fn, range(n))
    return time.time() - t0


def main() -> None:
    out = {}
    for name, fn in (("cpu", _cpu), ("mem", _mem)):
        t = {n: round(timed(fn, n), 2) for n in (1, 2, 8, 32)}
        out[f"{name}_sec"] = t
        out[f"{name}_eff"] = {n: round(t[1] / t[n], 3) for n in (2, 8, 32)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
