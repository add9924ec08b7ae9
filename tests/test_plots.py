"""SVG plot layer (reference nannyml/plots parity, dependency-free)."""

import re

import pandas as pd
import pytest

from spark_validate.plots import (
    plot_categorical_distribution,
    plot_continuous_distribution,
    plot_result,
    save_plot,
)


@pytest.fixture()
def result_pdf():
    rows = []
    for period, idxs in (("reference", range(4)), ("analysis", range(4))):
        for i in idxs:
            val = 0.1 + 0.02 * i + (0.3 if (period == "analysis" and i == 3) else 0)
            rows.append(
                {
                    "chunk_key": f"{period[:3]}{i}",
                    "chunk_index": i,
                    "period": period,
                    "column_name": "price",
                    "method": "jensen_shannon",
                    "value": val,
                    "sampling_error": 0.01,
                    "lower_confidence_boundary": val - 0.03,
                    "upper_confidence_boundary": val + 0.03,
                    "lower_threshold": None,
                    "upper_threshold": 0.25,
                    "alert": val > 0.25,
                }
            )
    return pd.DataFrame(rows)


def test_step_plot_structure(result_pdf):
    svg = plot_result(result_pdf, title="drift")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "price — jensen_shannon" in svg
    # one alert diamond for the drifted chunk, with a tooltip title
    assert svg.count('class="sv-alert"') == 1
    assert "(ALERT)" in svg
    # threshold dashed line labeled
    assert "upper 0.25" in svg
    # both periods labeled
    assert ">reference<" in svg and ">analysis<" in svg


def test_step_plot_facets_and_guard(result_pdf):
    two = pd.concat([result_pdf, result_pdf.assign(method="psi")])
    svg = plot_result(two)
    assert "price — psi" in svg and "price — jensen_shannon" in svg
    many = pd.concat([result_pdf.assign(method=f"m{i}") for i in range(30)])
    with pytest.raises(ValueError):
        plot_result(many)


def test_step_plot_from_spark_result(spark):
    """End to end: a real calculator result plots without errors."""
    import numpy as np

    from spark_validate.calculators import ColumnStatsCalculator
    from spark_validate.chunking import SizeBasedChunker

    pdf = pd.DataFrame({"id": range(2000), "x": np.linspace(0, 1, 2000)})
    sdf = spark.createDataFrame(pdf)
    calc = ColumnStatsCalculator(
        ["x"], metrics=("avg", "missing_rate"), chunker=SizeBasedChunker(chunk_size=500, order_by=["id"])
    ).fit(sdf)
    svg = plot_result(calc.calculate(sdf))
    assert svg.count("<svg") == 1 and "x — avg" in svg


def test_continuous_ridgeline():
    rows = []
    for k in ("c0", "c1", "c2"):
        for i in range(20):
            rows.append({"chunk_key": k, "x": i / 19.0, "density": 1.0 - abs(i - 10) / 10.0})
    svg = plot_continuous_distribution(pd.DataFrame(rows), title="dist")
    assert svg.count("<polygon") >= 3 and ">c1<" in svg
    # native SVG hover tooltips (the plotly-interactivity stand-in)
    assert "<title>c1</title>" in svg


def test_categorical_stacked_bars(tmp_path):
    rows = []
    for k in ("c0", "c1"):
        for v, f in (("a", 0.5), ("b", 0.3), ("Other", 0.2)):
            rows.append({"chunk_key": k, "value": v, "freq": f})
    svg = plot_categorical_distribution(pd.DataFrame(rows))
    assert len(re.findall(r'<rect [^>]*fill="#', svg)) >= 9  # 6 bars + 3 legend
    assert "<title>c0 · a: 50.0%</title>" in svg  # per-bar hover tooltip
    p = save_plot(svg, str(tmp_path / "d.html"))
    assert open(p).read().startswith("<!DOCTYPE html>")
    p2 = save_plot(svg, str(tmp_path / "d.svg"))
    assert open(p2).read().startswith("<svg")


def test_curation_funnel(tmp_path):
    from spark_validate.plots.distributions import plot_curation_funnel

    rep = pd.DataFrame(
        {
            "stage": ["input", "quality", "pii", "exact_dedup"],
            "docs_dropped": [0, 120, 30, 50],
            "docs_remaining": [1000, 880, 850, 800],
        }
    )
    svg = plot_curation_funnel(rep, title="nightly curation")
    assert svg.startswith("<svg") and svg.count("<rect") >= 4
    assert "exact_dedup" in svg and "(−50)" in svg and "800" in svg
    with pytest.raises(ValueError):
        plot_curation_funnel(pd.DataFrame({"stage": ["x"]}))
