"""spark-validate — a PySpark-native schema + constraint + drift validation engine.

Built from scratch for Spark's execution model (DataFrame/SQL, Catalyst, AQE,
Arrow-vectorized UDFs), re-expressing the monitoring semantics of the NannyML
reference library (fit on a reference period, compute per-chunk metrics with
mean±kσ alert thresholds) as distributed aggregations that hold up at
10^12-row scale.

Semantics reference: NannyML/NannyML v0.13 (read-only checkout at
/root/reference); citations in docstrings are `path:line` into that repo.
No code is copied from the reference — it is a single-node pandas library;
this engine is a fresh Spark-first design.
"""

from spark_validate.chunking import (
    SizeBasedChunker,
    CountBasedChunker,
    PeriodBasedChunker,
    PartitionChunker,
    DefaultChunker,
    chunker_for,
)
from spark_validate.thresholds import ConstantThreshold, StandardDeviationThreshold

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level API (keeps bare import light)
    if name == "UnivariateDriftCalculator":
        from spark_validate.drift import UnivariateDriftCalculator

        return UnivariateDriftCalculator
    if name == "ColumnStatsCalculator":
        from spark_validate.calculators import ColumnStatsCalculator

        return ColumnStatsCalculator
    if name == "PerformanceCalculator":
        from spark_validate.performance import PerformanceCalculator

        return PerformanceCalculator
    if name == "CBPE":
        from spark_validate.performance.cbpe import CBPE

        return CBPE
    if name == "DLE":
        from spark_validate.performance.dle import DLE

        return DLE
    if name == "DatabaseWriter":
        from spark_validate.io.db import DatabaseWriter

        return DatabaseWriter
    if name in ("filter_result", "result_to_wide", "values_with_alerts"):
        from spark_validate import result as _result

        return getattr(_result, name)
    if name == "datasets":
        import importlib

        # NOT `from spark_validate import datasets` — that re-enters this
        # __getattr__ before the submodule is bound and recurses forever
        return importlib.import_module("spark_validate.datasets")
    raise AttributeError(name)


__all__ = [
    "SizeBasedChunker",
    "CountBasedChunker",
    "PeriodBasedChunker",
    "PartitionChunker",
    "DefaultChunker",
    "chunker_for",
    "ConstantThreshold",
    "StandardDeviationThreshold",
    "UnivariateDriftCalculator",
    "ColumnStatsCalculator",
    "PerformanceCalculator",
    "CBPE",
    "DLE",
    "DatabaseWriter",
    "filter_result",
    "result_to_wide",
    "values_with_alerts",
    "datasets",
]
