"""Step-metric plots from long-form result frames.

Reference parity: `nannyml/plots/blueprints/metrics.py:16-160`
(``plot_metrics`` / ``plot_metric``) renders one step-plot facet per
(column × method): the metric value per chunk, a ±3·sampling-error
confidence band, dashed threshold lines, red diamond markers on alerting
chunks, and the reference period visually separated from analysis. This
module re-expresses that blueprint as dependency-free SVG over the engine's
canonical long result schema (spark_validate.result.RESULT_SCHEMA) — the
input is a per-chunk AGGREGATE (≤ thousands of rows for any real monitor),
so collecting it to the driver for rendering is bounded by design.

Accepts a Spark DataFrame or a pandas frame. Facets are stacked vertically;
x is chunk_index (reference chunks first when a reference period is
present, matching the reference's composite x-axis), or start_ts when every
row carries one.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pandas as pd

from spark_validate.plots.svg import SVG, nice_ticks

REF_COLOR = "#3b82c4"       # reference period line
ANA_COLOR = "#4339a8"       # analysis period line
ALERT_COLOR = "#d63031"
BAND_OPACITY = 0.18
THRESH_COLOR = "#d63031"

_MARGIN_L, _MARGIN_R, _MARGIN_T, _MARGIN_B = 64, 16, 34, 30


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result.copy()
    return result.toPandas()


def _facet_frames(pdf: pd.DataFrame):
    cols = [c for c in ("column_name", "method") if c in pdf.columns]
    if not cols:
        return [("metric", pdf)]
    out = []
    for key, grp in pdf.groupby(cols, dropna=False, sort=True):
        key = key if isinstance(key, tuple) else (key,)
        title = " — ".join(str(k) for k in key if k is not None and str(k) != "nan")
        out.append((title or "metric", grp))
    return out


def _x_positions(grp: pd.DataFrame) -> pd.Series:
    """Composite x: reference chunks first, then analysis continuing the
    index sequence (the reference's ensemble x-axis)."""
    if "period" in grp.columns and (grp["period"] == "reference").any():
        n_ref = int((grp["period"] == "reference").sum())
        x = grp["chunk_index"].astype(float).copy()
        x[grp["period"] != "reference"] += n_ref
        return x
    return grp["chunk_index"].astype(float)


def plot_result(
    result,
    title: Optional[str] = None,
    width: int = 920,
    facet_height: int = 230,
    max_facets: int = 24,
) -> str:
    """Long-form result frame → self-contained SVG string (stacked facets).

    Bounded by construction: results are chunk-level aggregates. ``max_facets``
    guards a caller passing an unfiltered multi-hundred-column result —
    filter with :func:`spark_validate.result.filter_result` first.
    """
    pdf = _to_pandas(result)
    if "chunk_index" not in pdf.columns or "value" not in pdf.columns:
        raise ValueError("plot_result needs a long result frame with chunk_index and value")
    pdf = pdf.dropna(subset=["chunk_index"])
    facets = _facet_frames(pdf)
    if len(facets) > max_facets:
        raise ValueError(
            f"{len(facets)} facets > max_facets={max_facets}; filter the result first "
            "(spark_validate.result.filter_result)"
        )

    height = _MARGIN_T + len(facets) * facet_height + _MARGIN_B
    svg = SVG(width, height)
    if title:
        svg.text(width / 2, 20, title, size=14, anchor="middle", bold=True)

    for fi, (ftitle, grp) in enumerate(facets):
        top = _MARGIN_T + fi * facet_height
        _draw_facet(svg, grp.sort_values(["period", "chunk_index"], ascending=[False, True]),
                    ftitle, top, width, facet_height)
    return svg.to_string()


def _draw_facet(svg: SVG, grp: pd.DataFrame, ftitle: str, top: int, width: int, fh: int):
    x0, x1 = _MARGIN_L, width - _MARGIN_R
    y0, y1 = top + 26, top + fh - 26  # plot box
    svg.text(x0, top + 14, ftitle, size=12, bold=True)

    grp = grp.copy()
    grp["_x"] = _x_positions(grp)
    has_period = "period" in grp.columns
    ref = grp[grp["period"] == "reference"] if has_period else grp.iloc[0:0]
    ana = grp[grp["period"] != "reference"] if has_period else grp

    # y domain: values, confidence boundaries, thresholds
    vals: List[float] = []
    for c in ("value", "lower_confidence_boundary", "upper_confidence_boundary",
              "lower_threshold", "upper_threshold"):
        if c in grp.columns:
            vals.extend(pd.to_numeric(grp[c], errors="coerce").dropna().tolist())
    if not vals:
        svg.text((x0 + x1) / 2, (y0 + y1) / 2, "no data", anchor="middle", fill="#999")
        return
    lo, hi = min(vals), max(vals)
    pad = (hi - lo) * 0.08 or abs(hi) * 0.1 or 1.0
    lo, hi = lo - pad, hi + pad
    xmin, xmax = grp["_x"].min(), grp["_x"].max()
    span = (xmax - xmin) or 1.0
    # each chunk renders as a step of width 1 (index space)
    sx = lambda v: x0 + (v - xmin) / (span + 1.0) * (x1 - x0)  # noqa: E731
    sy = lambda v: y1 - (v - lo) / (hi - lo) * (y1 - y0)  # noqa: E731

    # frame + y ticks
    svg.rect(x0, y0, x1 - x0, y1 - y0, fill="none", stroke="#ccc")
    for t in nice_ticks(lo, hi):
        if lo <= t <= hi:
            svg.line(x0, sy(t), x1, sy(t), stroke="#eee")
            svg.text(x0 - 6, sy(t) + 4, f"{t:g}", size=10, anchor="end", fill="#666")

    # reference/analysis separator + period shading
    if len(ref) and len(ana):
        xsep = sx((ref["_x"].max() + ana["_x"].min()) / 2 + 0.5)
        svg.rect(x0, y0, xsep - x0, y1 - y0, fill="#f4f7fb", opacity=0.8)
        svg.line(xsep, y0, xsep, y1, stroke="#999", dash="4,3")
        svg.text((x0 + xsep) / 2, y1 + 16, "reference", size=10, anchor="middle", fill="#777")
        svg.text((xsep + x1) / 2, y1 + 16, "analysis", size=10, anchor="middle", fill="#777")
    else:
        svg.text((x0 + x1) / 2, y1 + 16, "chunk", size=10, anchor="middle", fill="#777")

    for part, color in ((ref, REF_COLOR), (ana, ANA_COLOR)):
        if not len(part):
            continue
        part = part.sort_values("_x")
        # confidence band: step-shaped ±boundary polygon
        if {"lower_confidence_boundary", "upper_confidence_boundary"} <= set(part.columns):
            band = part.dropna(subset=["lower_confidence_boundary", "upper_confidence_boundary"])
            if len(band):
                up, lo_pts = [], []
                for _, r in band.iterrows():
                    xa, xb = sx(r["_x"]), sx(r["_x"] + 1)
                    up += [(xa, sy(r["upper_confidence_boundary"])), (xb, sy(r["upper_confidence_boundary"]))]
                    lo_pts += [(xa, sy(r["lower_confidence_boundary"])), (xb, sy(r["lower_confidence_boundary"]))]
                svg.polygon(up + lo_pts[::-1], fill=color, opacity=BAND_OPACITY)
        # step value line
        pts = []
        for _, r in part.iterrows():
            if pd.isna(r["value"]):
                continue
            pts += [(sx(r["_x"]), sy(r["value"])), (sx(r["_x"] + 1), sy(r["value"]))]
        svg.path(pts, stroke=color, width=1.8)
        for _, r in part.iterrows():
            if pd.isna(r["value"]):
                continue
            cx = sx(r["_x"] + 0.5)
            label = f"chunk {int(r['chunk_index'])}: {r['value']:.4g}"
            if bool(r.get("alert")):
                svg.diamond(cx, sy(r["value"]), title=label + " (ALERT)")
            else:
                svg.circle(cx, sy(r["value"]), fill=color, title=label)

    # thresholds (dashed) — constant per facet in the engine's results
    for tcol in ("lower_threshold", "upper_threshold"):
        if tcol in grp.columns:
            tv = pd.to_numeric(grp[tcol], errors="coerce").dropna()
            if len(tv):
                t = float(tv.iloc[0])
                if lo <= t <= hi:
                    svg.line(x0, sy(t), x1, sy(t), stroke=THRESH_COLOR, dash="6,4", width=1.2)
                    svg.text(x1 - 4, sy(t) - 4, f"{tcol.split('_')[0]} {t:g}", size=9,
                             anchor="end", fill=THRESH_COLOR)


def save_plot(svg_str: str, path: str) -> str:
    """Write SVG (``.svg``) or a minimal HTML wrapper (anything else)."""
    if path.endswith(".svg"):
        body = svg_str
    else:
        body = f"<!DOCTYPE html><html><body>{svg_str}</body></html>"
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "w") as f:
        f.write(body)
    return path
