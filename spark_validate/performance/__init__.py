from spark_validate.performance.calculator import PerformanceCalculator
from spark_validate.performance.quantify import PriorShiftEstimator

__all__ = ["PerformanceCalculator", "PriorShiftEstimator"]
