"""Human-readable report sinks (HTML + tabular exports).

Reference sinks re-expressed:

- profiling HTML report (``profiling_pack/main.py:272-289`` writes the
  ydata-profiling ``to_html`` file next to the JSON) -> a dependency-free
  self-contained HTML page over the engine's own metric /
  recommendation / schema records.
- duplicate-rows / outlier / mismatch ``.xlsx`` workbooks
  (``duplicates_finder_pack/main.py:349-361``,
  ``outlier_detection_pack/main.py:479-527``,
  ``data_compare_pack/main.py:397-406``) -> ``write_tabular`` emits
  ``.xlsx`` when an Excel writer (openpyxl/xlsxwriter) is importable and
  otherwise falls back to ``.csv`` with the same stem (this container
  ships neither writer; the swap point is the import probe below).

Reports are driver-side by design: they render *aggregates* (metric
records) plus row exports that upstream operators already cap (the
reference caps at 10k rows — ``duplicates_finder_pack/main.py:12``).
Nothing here ever pulls an uncapped Dataset onto the driver; callers
pass either small in-memory frames or a Dataset that is ``limit()``-ed
before ``to_pandas()``.
"""

from __future__ import annotations

import html
import os
from typing import Any

EXPORT_CAP = 10_000  # reference export cap (duplicates_finder_pack/main.py:12)

_LEVEL_COLORS = {"high": "#c0392b", "warning": "#e67e22", "info": "#2980b9"}


def _excel_writer_available() -> bool:
    for mod in ("openpyxl", "xlsxwriter"):
        try:
            __import__(mod)
            return True
        except ImportError:
            continue
    return False


def _to_capped_pandas(obj: Any, cap: int):
    """Small frame from a DataFrame / Arrow table / Dataset, capped."""
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(obj, ray.data.Dataset):
            obj = obj.limit(cap).to_pandas()
    except ImportError:  # pragma: no cover - ray always present here
        pass
    if isinstance(obj, pa.Table):
        obj = obj.to_pandas()
    if not isinstance(obj, pd.DataFrame):
        obj = pd.DataFrame(obj)
    return obj.head(cap)


def write_tabular(obj: Any, path_stem: str, *, cap: int = EXPORT_CAP) -> str:
    """Write a row-level export as ``<stem>.xlsx`` if an Excel writer is
    installed, else ``<stem>.csv``; returns the path written."""
    df = _to_capped_pandas(obj, cap)
    os.makedirs(os.path.dirname(path_stem) or ".", exist_ok=True)
    if _excel_writer_available():  # pragma: no cover - no writer in CI image
        path = path_stem + ".xlsx"
        df.to_excel(path, index=False)
    else:
        path = path_stem + ".csv"
        df.to_csv(path, index=False)
    return path


def _scope_label(scope: dict) -> str:
    if not isinstance(scope, dict):
        return str(scope)
    if scope.get("perimeter") == "column":
        parent = scope.get("parent_scope", {}).get("value", "")
        return f"{parent}.{scope.get('value')}" if parent else str(scope.get("value"))
    return str(scope.get("value"))


def _rows_html(rows: list[str]) -> str:
    return "\n".join(rows)


def write_html_report(collector, path: str, *,
                      tables: dict[str, Any] | None = None,
                      cap: int = EXPORT_CAP) -> str:
    """Render a MetricsCollector (metrics / recommendations / schemas)
    plus optional named row-export tables into one self-contained HTML
    file; returns ``path``."""
    e = html.escape
    metric_rows = [
        f"<tr><td>{e(str(m['key']))}</td><td>{e(str(m['value']))}</td>"
        f"<td>{e(_scope_label(m.get('scope', {})))}</td></tr>"
        for m in collector.metrics]
    rec_rows = [
        "<tr><td><span style=\"color:{c};font-weight:bold\">{lvl}</span></td>"
        "<td>{typ}</td><td>{content}</td><td>{scope}</td></tr>".format(
            c=_LEVEL_COLORS.get(r.get("level", "info"), "#2980b9"),
            lvl=e(str(r.get("level", ""))), typ=e(str(r.get("type", ""))),
            content=e(str(r.get("content", ""))),
            scope=e(_scope_label(r.get("scope", {}))))
        for r in collector.recommendations]
    schema_rows = [f"<tr><td>{e(str(s))}</td></tr>" for s in collector.schemas]

    sections = [
        f"<h1>Quality report — {e(collector.dataset)}</h1>",
        f"<h2>Metrics ({len(metric_rows)})</h2>",
        "<table><tr><th>key</th><th>value</th><th>scope</th></tr>"
        f"{_rows_html(metric_rows)}</table>",
        f"<h2>Recommendations ({len(rec_rows)})</h2>",
        "<table><tr><th>level</th><th>type</th><th>content</th><th>scope</th>"
        f"</tr>{_rows_html(rec_rows)}</table>",
    ]
    if schema_rows:
        sections += [f"<h2>Schemas ({len(schema_rows)})</h2>",
                     f"<table>{_rows_html(schema_rows)}</table>"]
    for name, obj in (tables or {}).items():
        df = _to_capped_pandas(obj, cap)
        sections += [f"<h2>{e(name)} ({len(df)} rows)</h2>",
                     df.to_html(index=False, border=0)]

    doc = ("<!doctype html><html><head><meta charset=\"utf-8\">"
           "<style>body{font-family:sans-serif;margin:2em}"
           "table{border-collapse:collapse}"
           "td,th{border:1px solid #ccc;padding:4px 8px;text-align:left}"
           "th{background:#f4f4f4}</style></head><body>"
           + "\n".join(sections) + "</body></html>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(doc)
    return path
