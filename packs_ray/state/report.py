"""Human-readable report sinks (HTML + tabular exports).

Reference sinks re-expressed:

- profiling HTML report (``profiling_pack/main.py:272-289`` writes the
  ydata-profiling ``to_html`` file next to the JSON) -> a dependency-free
  self-contained HTML page over the engine's own metric /
  recommendation / schema records.
- duplicate-rows / outlier / mismatch ``.xlsx`` workbooks
  (``duplicates_finder_pack/main.py:349-361``,
  ``outlier_detection_pack/main.py:479-527``,
  ``data_compare_pack/main.py:397-406``) -> ``write_tabular`` always
  emits a real ``.xlsx``: pandas/openpyxl when importable, else the
  dependency-free minimal OOXML writer (``_write_xlsx_native`` — the
  format is a public ECMA-376 zip of XML parts).

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


_XL_BAD = dict.fromkeys(i for i in range(0x20)
                        if i not in (0x09, 0x0A, 0x0D))


def _col_ref(j: int) -> str:
    s = ""
    j += 1
    while j:
        j, r = divmod(j - 1, 26)
        s = chr(65 + r) + s
    return s


def _write_xlsx_native(df, path: str) -> None:
    """Minimal OOXML workbook writer — a valid ``.xlsx`` with one sheet,
    header row, numeric cells as numbers and everything else as inline
    strings, built with only zipfile + XML escaping (the format is a
    public ECMA-376 zip-of-XML; no openpyxl/xlsxwriter needed).  The
    reference's workbook exports (duplicates_finder_pack/main.py:349-361,
    outlier_detection_pack/main.py:479-527) carry no formatting the data
    depends on, so the minimal package round-trips their content."""
    import zipfile
    from xml.sax.saxutils import escape

    import numpy as np
    import pandas as pd

    def cell(r: int, j: int, v) -> str:
        ref = f"{_col_ref(j)}{r}"
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            return f'<c r="{ref}"/>'
        if isinstance(v, (bool, np.bool_)):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float, np.integer, np.floating)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        s = escape(str(v).translate(_XL_BAD))
        return f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'

    rows_xml = []
    header = "".join(cell(1, j, c) for j, c in enumerate(df.columns))
    rows_xml.append(f'<row r="1">{header}</row>')
    for i, row in enumerate(df.itertuples(index=False), start=2):
        rows_xml.append(
            f'<row r="{i}">'
            + "".join(cell(i, j, v) for j, v in enumerate(row)) + "</row>")
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(rows_xml) + "</sheetData></worksheet>")
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
          'worksheet+xml"/></Types>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>')
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" xmlns:r="http://schemas.'
          'openxmlformats.org/officeDocument/2006/relationships">'
          '<sheets><sheet name="export" sheetId="1" r:id="rId1"/>'
          '</sheets></workbook>')
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/'
               'package/2006/relationships">'
               '<Relationship Id="rId1" Type="http://schemas.'
               'openxmlformats.org/officeDocument/2006/relationships/'
               'worksheet" Target="worksheets/sheet1.xml"/>'
               '</Relationships>')
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def write_tabular(obj: Any, path_stem: str, *, cap: int = EXPORT_CAP) -> str:
    """Write a row-level export as a real ``<stem>.xlsx`` workbook:
    via pandas/openpyxl when an Excel writer is installed, else via the
    dependency-free minimal OOXML writer above (same content, no
    styling).  Returns the path written."""
    df = _to_capped_pandas(obj, cap)
    os.makedirs(os.path.dirname(path_stem) or ".", exist_ok=True)
    path = path_stem + ".xlsx"
    if _excel_writer_available():  # pragma: no cover - no writer in CI image
        df.to_excel(path, index=False)
    else:
        _write_xlsx_native(df, path)
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
