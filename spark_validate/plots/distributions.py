"""Distribution plots: continuous ridgeline (joyplot) + categorical stacked bars.

Reference parity: `nannyml/plots/blueprints/distributions.py` +
`components/joy_plot.py` / `components/stacked_bar_plot.py` — per-chunk
KDE ridgelines for continuous columns and per-chunk stacked category bars
for categoricals. Inputs are the engine's distribution calculator outputs
(spark_validate.distribution): already chunk-level aggregates, so driver-
side rendering is bounded.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from spark_validate.plots.metrics import _to_pandas
from spark_validate.plots.svg import SVG

RIDGE_COLOR = "#3b82c4"
_PALETTE = ["#3b82c4", "#4339a8", "#00a29b", "#e0a800", "#c75146", "#7d8597",
            "#5c946e", "#b56576"]


def plot_continuous_distribution(result, title: Optional[str] = None,
                                 width: int = 920, row_height: int = 46) -> str:
    """(chunk_key, x, density[, cdf]) → ridgeline SVG, one row per chunk."""
    pdf = _to_pandas(result)
    need = {"chunk_key", "x", "density"}
    if not need <= set(pdf.columns):
        raise ValueError(f"continuous distribution frame needs columns {sorted(need)}")
    chunks = list(pdf.groupby("chunk_key", sort=True))
    x_lo, x_hi = pdf["x"].min(), pdf["x"].max()
    d_hi = pdf["density"].max() or 1.0
    span = (x_hi - x_lo) or 1.0
    ml, mr, mt = 150, 24, 34
    height = mt + len(chunks) * row_height + 30
    svg = SVG(width, height)
    if title:
        svg.text(width / 2, 20, title, size=14, anchor="middle", bold=True)
    x0, x1 = ml, width - mr
    sx = lambda v: x0 + (v - x_lo) / span * (x1 - x0)  # noqa: E731
    overlap = 1.7  # ridgelines overlap their row, the joyplot look
    for i, (key, grp) in enumerate(chunks):
        base = mt + (i + 1) * row_height
        grp = grp.sort_values("x")
        pts = [(sx(grp["x"].iloc[0]), base)]
        for _, r in grp.iterrows():
            pts.append((sx(r["x"]), base - (r["density"] / d_hi) * row_height * overlap))
        pts.append((sx(grp["x"].iloc[-1]), base))
        n = int(grp["n"].iloc[0]) if "n" in grp.columns else None
        tip = str(key) if n is None else f"{key} (n={n})"
        svg.polygon(pts, fill=RIDGE_COLOR, opacity=0.35, title=tip)
        svg.path(pts, stroke=RIDGE_COLOR, width=1.0, opacity=0.9)
        svg.text(ml - 8, base - 4, str(key), size=10, anchor="end", fill="#555")
    # x axis
    svg.line(x0, height - 22, x1, height - 22, stroke="#999")
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        xv = x_lo + frac * span
        svg.text(sx(xv), height - 8, f"{xv:g}", size=10, anchor="middle", fill="#666")
    return svg.to_string()


def plot_curation_funnel(report, title: Optional[str] = None, width: int = 760,
                         row_height: int = 34) -> str:
    """Curation attrition funnel: one bar per pipeline stage, width ∝ docs
    remaining after the stage, the dropped count annotated. Input is the
    ``CurationResult.report()`` frame ``(stage, docs_dropped,
    docs_remaining)`` in pipeline order (≤ #stages+1 rows)."""
    pdf = _to_pandas(report)
    need = {"stage", "docs_dropped", "docs_remaining"}
    if not need <= set(pdf.columns):
        raise ValueError(f"curation report frame needs columns {sorted(need)}")
    total = max(int(pdf["docs_remaining"].max()), 1)
    ml, mr, mt = 150, 170, 34
    height = mt + len(pdf) * row_height + 16
    svg = SVG(width, height)
    if title:
        svg.text(width / 2, 20, title, size=14, anchor="middle", bold=True)
    span = width - ml - mr
    for i, r in pdf.reset_index(drop=True).iterrows():
        y = mt + i * row_height
        w = span * (int(r["docs_remaining"]) / total)
        color = _PALETTE[i % len(_PALETTE)]
        svg.rect(ml, y + 4, max(w, 1.0), row_height - 10, fill=color, opacity=0.75,
                 title=f"{r['stage']}: {int(r['docs_remaining']):,} kept, −{int(r['docs_dropped']):,}")
        svg.text(ml - 8, y + row_height / 2 + 3, str(r["stage"]), size=11, anchor="end")
        note = f"{int(r['docs_remaining']):,} kept"
        if int(r["docs_dropped"]):
            note += f"  (−{int(r['docs_dropped']):,})"
        svg.text(ml + max(w, 1.0) + 8, y + row_height / 2 + 3, note, size=10, fill="#555")
    return svg.to_string()


def plot_categorical_distribution(result, title: Optional[str] = None,
                                  width: int = 920, height: int = 360) -> str:
    """(chunk_key, value, freq) → per-chunk stacked frequency bars."""
    pdf = _to_pandas(result)
    need = {"chunk_key", "value", "freq"}
    if not need <= set(pdf.columns):
        raise ValueError(f"categorical distribution frame needs columns {sorted(need)}")
    cats = list(pd.unique(pdf["value"]))
    colors = {c: _PALETTE[i % len(_PALETTE)] for i, c in enumerate(cats)}
    chunks = list(pdf.groupby("chunk_key", sort=True))
    ml, mr, mt, mb = 64, 150, 34, 40
    svg = SVG(width, height)
    if title:
        svg.text(width / 2, 20, title, size=14, anchor="middle", bold=True)
    x0, x1, y0, y1 = ml, width - mr, mt, height - mb
    bw = (x1 - x0) / max(len(chunks), 1)
    for i, (key, grp) in enumerate(chunks):
        acc = 0.0
        gx = x0 + i * bw
        for _, r in grp.sort_values("value").iterrows():
            h = float(r["freq"]) * (y1 - y0)
            cnt = f" ({int(r['cnt']):,})" if "cnt" in grp.columns else ""
            svg.rect(gx + bw * 0.08, y1 - acc - h, bw * 0.84, h,
                     fill=colors.get(r["value"], "#999"), opacity=0.9,
                     title=f"{key} · {r['value']}: {float(r['freq']):.1%}{cnt}")
            acc += h
        svg.text(gx + bw / 2, y1 + 14, str(key), size=9, anchor="middle",
                 fill="#555", rotate=30 if bw < 60 else None)
    for i, c in enumerate(cats):  # legend
        ly = mt + i * 16
        svg.rect(x1 + 12, ly, 10, 10, fill=colors[c])
        svg.text(x1 + 27, ly + 9, str(c), size=10)
    for frac in (0.0, 0.5, 1.0):
        svg.text(x0 - 6, y1 - frac * (y1 - y0) + 4, f"{frac:g}", size=10, anchor="end", fill="#666")
    svg.rect(x0, y0, x1 - x0, y1 - y0, fill="none", stroke="#ccc")
    return svg.to_string()
