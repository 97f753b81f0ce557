"""Self-contained HTML run report — the engine-scale analogue of the
reference's chart/report branch (vendor_analytics/visualization.py:1-177
matplotlib scorecard figures; interpret.py:1375 ``_save_report``).

At 100 TB the charting library is the wrong layer: the engine's job is to
reduce the corpus to aggregate-sized frames (per-seller scorecards, run
summary, predicate counts — all bounded by seller/predicate cardinality,
never corpus size) and render them into ONE dependency-free artifact a
browser can open. Charts are inline SVG generated from those frames; no
matplotlib/seaborn (not in this container, and a driver-side figure per
vendor would not survive scale anyway).

Everything here is driver-side formatting of already-aggregated data —
there is deliberately no Ray in this module.
"""

from __future__ import annotations

import html
import os

import pandas as pd

_CSS = """
body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}
h1{font-size:1.4rem}h2{font-size:1.1rem;margin-top:2rem}
table{border-collapse:collapse;margin:.5rem 0}
td,th{border:1px solid #ccc;padding:.25rem .6rem;text-align:left;font-size:.9rem}
th{background:#f2f2f2}
svg text{font-family:system-ui,sans-serif}
.note{color:#666;font-size:.8rem}
"""


def _esc(v) -> str:
    return html.escape(str(v))


def _table(df: pd.DataFrame, max_rows: int = 50) -> str:
    head = "".join(f"<th>{_esc(c)}</th>" for c in df.columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{_esc(v)}</td>" for v in row) + "</tr>"
        for row in df.head(max_rows).itertuples(index=False)
    )
    more = (
        f'<p class="note">… {len(df) - max_rows} more rows omitted</p>'
        if len(df) > max_rows
        else ""
    )
    return f"<table><tr>{head}</tr>{body}</table>{more}"


def _bar_chart(labels: list[str], values: list[float], title: str, width: int = 640) -> str:
    """Horizontal bar chart as inline SVG (no deps). Bounded input: callers
    pass top-k slices of aggregate frames."""
    if not labels:
        return '<p class="note">no data</p>'
    bar_h, gap, label_w = 18, 6, 160
    h = len(labels) * (bar_h + gap) + 24
    vmax = max(max(values), 1e-12)
    rows = []
    for i, (lab, val) in enumerate(zip(labels, values)):
        y = 20 + i * (bar_h + gap)
        w = max(1.0, (width - label_w - 80) * val / vmax)
        rows.append(
            f'<text x="{label_w - 6}" y="{y + 13}" text-anchor="end" font-size="11">{_esc(lab)}</text>'
            f'<rect x="{label_w}" y="{y}" width="{w:.1f}" height="{bar_h}" fill="#4878a8"/>'
            f'<text x="{label_w + w + 4:.1f}" y="{y + 13}" font-size="11">{_esc(round(val, 4))}</text>'
        )
    return (
        f'<svg width="{width}" height="{h}" role="img" aria-label="{_esc(title)}">'
        f'<text x="0" y="12" font-size="12" font-weight="bold">{_esc(title)}</text>'
        + "".join(rows)
        + "</svg>"
    )


def render_html_report(
    scorecards: pd.DataFrame,
    summary: pd.DataFrame | None = None,
    pred_counts: dict | None = None,
    title: str = "KG run report",
    top_k: int = 10,
) -> str:
    """Render the run report from aggregate-sized frames.

    ``scorecards``: one row per seller (pipelines/scorecard.py layout —
    seller, total_turns, total_products, product_variety, avg_price, ...).
    ``summary``: the (metric, value) frame from ``scorecard_summary``.
    ``pred_counts``: triples-per-predicate dict from ``run_kg_pipeline``.
    """
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head><body>",
        f"<h1>{_esc(title)}</h1>",
    ]
    if pred_counts:
        items = sorted(pred_counts.items())
        parts.append("<h2>Triples per predicate</h2>")
        parts.append(
            _bar_chart([k for k, _ in items], [float(v) for _, v in items], "triples")
        )
    if summary is not None and len(summary):
        parts.append("<h2>Run summary</h2>")
        parts.append(_table(summary))
    if scorecards is not None and len(scorecards):
        parts.append(f"<h2>Top sellers ({min(top_k, len(scorecards))})</h2>")
        top = scorecards.sort_values(
            ["total_products", "seller"], ascending=[False, True]
        ).head(top_k)
        parts.append(
            _bar_chart(
                top["seller"].astype(str).tolist(),
                top["total_products"].astype(float).tolist(),
                "product mentions",
            )
        )
        if "avg_price" in top.columns:
            parts.append(
                _bar_chart(
                    top["seller"].astype(str).tolist(),
                    top["avg_price"].astype(float).tolist(),
                    "avg price (priced mentions)",
                )
            )
        parts.append("<h2>Seller scorecards</h2>")
        parts.append(_table(scorecards))
    parts.append("</body></html>")
    return "".join(parts)


def write_html_report(path: str, html_text: str) -> None:
    """Atomic write (tmp + replace), mirroring the repo's sidecar discipline."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(html_text)
    os.replace(tmp, path)
