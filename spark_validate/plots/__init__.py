"""Dependency-free SVG plot layer (reference `nannyml/plots/` parity).

Every reference quick-start ends in ``result.plot()``; this package gives
the Spark engine the same last mile without plotly/matplotlib (not
available in the runtime): step-metric facets from the long result schema,
continuous ridgelines and categorical stacked bars from the distribution
calculators. All inputs are chunk-level aggregates — driver-side rendering
is bounded no matter the corpus size.
"""

from spark_validate.plots.distributions import (
    plot_categorical_distribution,
    plot_continuous_distribution,
)
from spark_validate.plots.metrics import plot_result, save_plot

__all__ = [
    "plot_result",
    "save_plot",
    "plot_continuous_distribution",
    "plot_categorical_distribution",
]
