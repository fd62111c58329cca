"""HTML rendering of analysis results — parity with the reference's
HtmlAnalysis (datavec-api/.../transform/ui/HtmlAnalysis.java:48: summary
table + histogram charts per numeric column, written as one .html file).

Restated in pure stdlib: no freemarker/jackson/joda — the analysis dict
from `analysis.analyze()` is rendered as a static self-contained HTML
string (per-column stats table + inline SVG bar charts for the
fixed-bound histograms the analyze pass already computed). Driver-side
formatting of an already-aggregated tiny dict — no Spark work here.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timezone

_CSS = """
body{font-family:sans-serif;margin:24px;color:#222}
h1{font-size:20px} h2{font-size:15px;margin-top:28px}
table{border-collapse:collapse;margin-top:8px}
th,td{border:1px solid #bbb;padding:4px 10px;font-size:13px;text-align:right}
th{background:#eee} td:first-child,th:first-child{text-align:left}
.meta{color:#666;font-size:12px}
svg{margin-top:6px;background:#fafafa;border:1px solid #ddd}
"""


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def _svg_histogram(hist: list[dict], width: int = 420, height: int = 120) -> str:
    """Inline SVG bar chart for one column's fixed-bound histogram
    (HtmlAnalysis renders these via RenderableComponentHistogram)."""
    if not hist:
        return ""
    peak = max(b["count"] for b in hist) or 1
    n = len(hist)
    bw = width / n
    bars = []
    for i, b in enumerate(hist):
        h = (b["count"] / peak) * (height - 14)
        x, y = i * bw, height - h
        title = f"[{_fmt(b['lo'])}, {_fmt(b['hi'])}): {b['count']}"
        bars.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{max(bw - 1, 1):.1f}" '
            f'height="{h:.1f}" fill="#4878a8"><title>{_html.escape(title)}</title></rect>'
        )
    return (f'<svg width="{width}" height="{height}" role="img">' + "".join(bars) + "</svg>")


def render_analysis_html(analysis: dict, title: str = "Data analysis",
                         generated_at: str | None = None) -> str:
    """analysis.analyze() dict → self-contained HTML report string
    (HtmlAnalysis.createHtmlAnalysisString parity)."""
    when = generated_at or datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    cols = analysis.get("columns", {})
    stat_keys: list[str] = []
    for stats in cols.values():
        for k in stats:
            if k not in stat_keys and k != "quantiles":
                stat_keys.append(k)
    head = "".join(f"<th>{_html.escape(k)}</th>" for k in ["column"] + stat_keys)
    body_rows = []
    for name, stats in cols.items():
        cells = "".join(f"<td>{_fmt(stats.get(k))}</td>" for k in stat_keys)
        body_rows.append(f"<tr><td>{_html.escape(name)}</td>{cells}</tr>")
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head><body>",
        f"<h1>{_html.escape(title)}</h1>",
        f"<p class='meta'>rows analysed: {analysis.get('rows', '?')} — generated {_html.escape(when)}</p>",
        f"<table><tr>{head}</tr>{''.join(body_rows)}</table>",
    ]
    for name, stats in cols.items():
        q = stats.get("quantiles")
        if q:
            qcells = "".join(f"<td>{_fmt(v)}</td>" for v in q.values())
            qhead = "".join(f"<th>p{float(k) * 100:g}</th>" for k in q)
            parts.append(f"<h2>{_html.escape(name)} — quantiles</h2>"
                         f"<table><tr>{qhead}</tr><tr>{qcells}</tr></table>")
    for name, hist in (analysis.get("histograms") or {}).items():
        parts.append(f"<h2>{_html.escape(name)} — histogram</h2>")
        parts.append(_svg_histogram(hist))
    parts.append("</body></html>")
    return "".join(parts)


def write_analysis_html(analysis: dict, path: str, title: str = "Data analysis") -> str:
    """HtmlAnalysis.createHtmlAnalysisFile parity: render and write."""
    out = render_analysis_html(analysis, title)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(out)
    return path
