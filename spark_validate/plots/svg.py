"""Minimal SVG document builder — zero dependencies.

The reference's plot layer targets plotly (`nannyml/plots/components/
figure.py`); plotly is not available here and a 10^12-row engine only ever
plots CHUNK-level aggregates (≤ thousands of points), so a hand-rolled SVG
writer covers the full need: lines, step paths, polygons (confidence
bands), dashed rules (thresholds), markers (alerts), text and axes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple
from xml.sax.saxutils import escape


def _fmt(v: float) -> str:
    return f"{v:.2f}".rstrip("0").rstrip(".")


class SVG:
    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self._parts: List[str] = []

    def line(self, x1, y1, x2, y2, stroke="#444", width=1.0, dash: Optional[str] = None, opacity=1.0):
        d = f' stroke-dasharray="{dash}"' if dash else ""
        self._parts.append(
            f'<line x1="{_fmt(x1)}" y1="{_fmt(y1)}" x2="{_fmt(x2)}" y2="{_fmt(y2)}" '
            f'stroke="{stroke}" stroke-width="{width}" opacity="{opacity}"{d}/>'
        )

    def path(self, points: Sequence[Tuple[float, float]], stroke="#222", width=1.5,
             fill="none", opacity=1.0, dash: Optional[str] = None, close=False):
        if not points:
            return
        d = "M " + " L ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in points) + (" Z" if close else "")
        dd = f' stroke-dasharray="{dash}"' if dash else ""
        self._parts.append(
            f'<path d="{d}" stroke="{stroke}" stroke-width="{width}" fill="{fill}" '
            f'opacity="{opacity}"{dd} stroke-linejoin="round"/>'
        )

    def polygon(self, points: Sequence[Tuple[float, float]], fill="#ccc", opacity=0.25,
                title: Optional[str] = None):
        if not points:
            return
        pts = " ".join(f"{_fmt(x)},{_fmt(y)}" for x, y in points)
        t = f"<title>{escape(title)}</title>" if title else ""
        end = f">{t}</polygon>" if t else "/>"
        self._parts.append(f'<polygon points="{pts}" fill="{fill}" opacity="{opacity}" stroke="none"{end}')

    def rect(self, x, y, w, h, fill="#eee", opacity=1.0, stroke="none", title: Optional[str] = None):
        t = f"<title>{escape(title)}</title>" if title else ""
        end = f">{t}</rect>" if t else "/>"
        self._parts.append(
            f'<rect x="{_fmt(x)}" y="{_fmt(y)}" width="{_fmt(w)}" height="{_fmt(h)}" '
            f'fill="{fill}" opacity="{opacity}" stroke="{stroke}"{end}'
        )

    def diamond(self, x, y, r=4.5, fill="#d63031", title: Optional[str] = None):
        pts = f"{_fmt(x)},{_fmt(y - r)} {_fmt(x + r)},{_fmt(y)} {_fmt(x)},{_fmt(y + r)} {_fmt(x - r)},{_fmt(y)}"
        t = f"<title>{escape(title)}</title>" if title else ""
        self._parts.append(f'<polygon points="{pts}" fill="{fill}" class="sv-alert">{t}</polygon>')

    def circle(self, x, y, r=2.5, fill="#222", title: Optional[str] = None):
        t = f"<title>{escape(title)}</title>" if title else ""
        self._parts.append(f'<circle cx="{_fmt(x)}" cy="{_fmt(y)}" r="{r}" fill="{fill}">{t}</circle>')

    def text(self, x, y, s, size=11, fill="#333", anchor="start", bold=False, rotate: Optional[float] = None):
        w = ' font-weight="bold"' if bold else ""
        rot = f' transform="rotate({rotate} {_fmt(x)} {_fmt(y)})"' if rotate is not None else ""
        self._parts.append(
            f'<text x="{_fmt(x)}" y="{_fmt(y)}" font-size="{size}" fill="{fill}" '
            f'text-anchor="{anchor}" font-family="sans-serif"{w}{rot}>{escape(str(s))}</text>'
        )

    def to_string(self) -> str:
        return (
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{self.width}" height="{self.height}" '
            f'viewBox="0 0 {self.width} {self.height}">'
            f'<rect width="{self.width}" height="{self.height}" fill="white"/>'
            + "".join(self._parts)
            + "</svg>"
        )


def nice_ticks(lo: float, hi: float, n: int = 5) -> List[float]:
    """~n round-numbered ticks covering [lo, hi]."""
    import math

    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(n, 1)
    mag = 10 ** math.floor(math.log10(raw))
    for mult in (1, 2, 2.5, 5, 10):
        step = mult * mag
        if raw <= step:
            break
    start = math.ceil(lo / step) * step
    ticks = []
    t = start
    while t <= hi + 1e-12 * step:
        ticks.append(round(t, 10))
        t += step
    return ticks
