"""Render SVG plots from an already-written results directory.

Usage::

    python -m spark_validate.plots <results_dir> <out_dir> [--title-prefix P]

``results_dir`` is the runner's ``<output_dir>/results`` sink (long-form
rows partitioned by ``check=``). No Spark session is needed: results are
chunk-level aggregates, so pandas/pyarrow reads them directly on the
driver — plotting an existing run costs nothing but the SVG write.

Reference parity: the post-hoc half of ``result.plot()`` — a user who only
kept the results parquet can still get the reference's figures
(`nannyml/plots/blueprints/metrics.py:16-160`).
"""

from __future__ import annotations

import argparse
import glob
import html
import os
import sys

import pandas as pd

from spark_validate.plots.distributions import (
    plot_categorical_distribution,
    plot_continuous_distribution,
)
from spark_validate.plots.metrics import plot_result, save_plot


def _distributions(results_dir: str):
    """Yield (name, frame, renderer) for each partition of the sibling
    ``distributions`` sink (written by a runner config's ``distributions``
    section) — ridgelines for (x, density) frames, stacked bars for
    (value, freq) frames. Absent dir → nothing."""
    droot = os.path.join(os.path.dirname(results_dir.rstrip("/")), "distributions")
    for p in sorted(glob.glob(os.path.join(droot, "check=*"))):
        name = os.path.basename(p).split("=", 1)[1]
        pdf = pd.read_parquet(p)
        # the sink appends across runs: rendering two runs' rows interleaved
        # would double every curve — keep one run (lexicographically last,
        # deterministic; pass distinct output_dirs for per-run figures)
        if "run_id" in pdf.columns and pdf["run_id"].nunique() > 1:
            keep = sorted(pdf["run_id"].unique())[-1]
            print(
                f"{name}: {pdf['run_id'].nunique()} runs in sink; rendering run_id={keep!r}",
                file=sys.stderr,
            )
            pdf = pdf[pdf["run_id"] == keep]
        if "density" in pdf.columns:
            yield name, pdf, plot_continuous_distribution
        elif "freq" in pdf.columns:
            yield name, pdf, plot_categorical_distribution


def _checks(results_dir: str):
    """Yield (check_name, frame) per check= partition (or one unnamed frame)."""
    parts = sorted(glob.glob(os.path.join(results_dir, "check=*")))
    if parts:
        for p in parts:
            yield os.path.basename(p).split("=", 1)[1], pd.read_parquet(p)
    else:
        yield "result", pd.read_parquet(results_dir)


def write_index(out_dir: str, entries) -> str:
    """One self-contained index.html embedding every rendered SVG inline."""
    rows = []
    for name, svg_path in entries:
        body = open(svg_path).read()
        rows.append(f"<h2>{html.escape(name)}</h2>\n{body}")
    page = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        "<title>spark_validate run</title></head><body>\n"
        + "\n".join(rows)
        + "\n</body></html>"
    )
    path = os.path.join(out_dir, "index.html")
    with open(path, "w") as f:
        f.write(page)
    return path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m spark_validate.plots", description=__doc__)
    ap.add_argument("results_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--title-prefix", default="")
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    entries = []
    for name, pdf in _checks(args.results_dir):
        try:
            svg = plot_result(pdf, title=f"{args.title_prefix}{name}")
        except ValueError as exc:  # non-result-shaped partition: report, keep going
            print(f"skip {name}: {exc}", file=sys.stderr)
            continue
        path = save_plot(svg, os.path.join(args.out_dir, f"{name}.svg"))
        print(path)
        entries.append((name, path))
    for name, pdf, render in _distributions(args.results_dir):
        try:
            svg = render(pdf, title=f"{args.title_prefix}{name}")
        except ValueError as exc:
            print(f"skip {name}: {exc}", file=sys.stderr)
            continue
        path = save_plot(svg, os.path.join(args.out_dir, f"{name}.svg"))
        print(path)
        entries.append((name, path))
    if entries:
        print(write_index(args.out_dir, entries))
    return 0 if entries else 1


if __name__ == "__main__":
    raise SystemExit(main())
