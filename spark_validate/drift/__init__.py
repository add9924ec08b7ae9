from spark_validate.drift.correlation import CorrelationDriftCalculator
from spark_validate.drift.grouped import GroupedDriftCalculator
from spark_validate.drift.joint import JointHistogramDrift
from spark_validate.drift.rolling import RollingDriftCalculator
from spark_validate.drift.univariate import UnivariateDriftCalculator

__all__ = [
    "CorrelationDriftCalculator",
    "GroupedDriftCalculator",
    "JointHistogramDrift",
    "RollingDriftCalculator",
    "UnivariateDriftCalculator",
]
