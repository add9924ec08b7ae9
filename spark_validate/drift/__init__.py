from spark_validate.drift.joint import JointHistogramDrift
from spark_validate.drift.univariate import UnivariateDriftCalculator

__all__ = ["JointHistogramDrift", "UnivariateDriftCalculator"]
