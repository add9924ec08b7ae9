from spark_validate.performance.calculator import PerformanceCalculator

__all__ = ["PerformanceCalculator"]
