from spark_validate.drift.catshift import CategoryShiftCalculator
from spark_validate.drift.correlation import CorrelationDriftCalculator
from spark_validate.drift.grouped import GroupedDriftCalculator
from spark_validate.drift.joint import JointHistogramDrift
from spark_validate.drift.rolling import RollingDriftCalculator
from spark_validate.drift.univariate import UnivariateDriftCalculator

__all__ = [
    "CategoryShiftCalculator",
    "CorrelationDriftCalculator",
    "GroupedDriftCalculator",
    "JointHistogramDrift",
    "RollingDriftCalculator",
    "UnivariateDriftCalculator",
]
