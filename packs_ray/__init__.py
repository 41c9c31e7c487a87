"""packs_ray — a Ray-Data-native data-quality / quality-filter engine.

A from-scratch reimplementation of the query & data-processing
capabilities of qalita-io/packs (reference at /root/reference), re-expressed
as streaming Ray Data pipelines over Arrow batches:

- ``packs_ray.rules``      vectorized per-turn heuristic rule library
  (completeness / text validation / pattern validation / numeric range /
  PII detection semantics of the reference packs).
- ``packs_ray.stages``     Ray Data stages: stateless ``map_batches`` rule
  stages, stateful actor-pool stages (language-ID, perplexity), shuffle
  stages (conversation re-ordering, exact & near dedup).
- ``packs_ray.pipelines``  end-to-end pipeline assembly (the flagship
  language-ID + quality-filter + PII/toxicity-scrub transcript pipeline).
- ``packs_ray.functions``  dataset-level quality checks re-expressing each
  reference pack as a distributed aggregate (profiling, duplicates,
  timeliness, referential integrity, drift, compare, outliers...).
- ``packs_ray.state``      metrics/lineage emission and checkpoint manifest.
- ``packs_ray.oracle``     straight-pandas reference-semantics oracle used
  by the test suite as ground truth.
- ``packs_ray.gen``        deterministic (seeded) synthetic transcript
  generator with planted defects.

No function in this package calls ``ray.init``/``ray.shutdown``; sessions
are owned by the caller (tests, bench.py, CLI).
"""

__version__ = "0.1.0"
