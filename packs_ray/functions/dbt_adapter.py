"""dbt test-runner adapter.

Reference: ``dbt_checks_pack/main.py:7-21`` shells out to ``dbt test``
and ``:38-53`` parses ``<project>/target/run_results.json`` —
``resource_type == "test"`` rows counted as passed iff
``status == "pass"``, ``score = passed/total`` (1.0 when no tests),
emitted as dataset-scoped metrics with the 2dp stringified score.

The artifact format is dbt's public ``run_results.json`` schema.  This
container has no dbt binary, so the subprocess launch is gated behind a
``shutil.which`` probe (callers can also hand in an existing artifact
path or parsed dict — the common CI case where dbt already ran).
External-tool adapters are inherently driver-side one-shot calls; there
is nothing to distribute.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from typing import Any

from packs_ray.state.metrics import MetricsCollector


def run_dbt_tests(project_dir: str, *, profiles_dir: str | None = None,
                  target: str | None = None, models: str | None = None,
                  threads: int | None = None,
                  vars_dict: dict | None = None) -> tuple[int, str]:
    """Invoke ``dbt test`` (reference arg-for-arg: main.py:7-21)."""
    if shutil.which("dbt") is None:
        raise RuntimeError(
            "dbt binary not found on PATH — run dbt elsewhere and pass its "
            "target/run_results.json to dbt_checks(run_results=...)")
    cmd = ["dbt", "test", "--project-dir", project_dir]
    if profiles_dir:
        cmd += ["--profiles-dir", profiles_dir]
    if target:
        cmd += ["--target", target]
    if models:
        cmd += ["--models", models]
    if threads:
        cmd += ["--threads", str(threads)]
    if vars_dict:
        cmd += ["--vars", json.dumps(vars_dict)]
    proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    return proc.returncode, proc.stdout


def parse_run_results(run_results: str | dict) -> dict[str, Any]:
    """Pass/fail tallies from a run_results.json path or parsed dict
    (reference semantics: any non-"pass" status is a failure)."""
    if isinstance(run_results, str):
        if os.path.exists(run_results):
            with open(run_results) as f:
                data = json.load(f)
        else:
            data = {}
    else:
        data = run_results
    total = passed = 0
    for res in data.get("results", []):
        if res.get("resource_type") == "test":
            total += 1
            passed += res.get("status") == "pass"
    score = 1.0 if total == 0 else passed / total
    return {"tests_total": total, "tests_passed": passed,
            "tests_failed": total - passed, "score": score}


def dbt_checks(project_dir: str, *, run: bool = False,
               run_results: str | dict | None = None,
               **dbt_kwargs) -> MetricsCollector:
    """Reference-shaped metrics from a dbt project: optionally run
    ``dbt test`` first, then parse the artifact (default location
    ``<project>/target/run_results.json``)."""
    if run:
        code, output = run_dbt_tests(project_dir, **dbt_kwargs)
        print(output)
    if run_results is None:
        run_results = os.path.join(project_dir, "target", "run_results.json")
    tallies = parse_run_results(run_results)
    mc = MetricsCollector(project_dir)
    for key in ("tests_total", "tests_passed", "tests_failed"):
        mc.add_metric(key, tallies[key])
    mc.add_score(tallies["score"])
    return mc
