from spark_validate.drift.univariate import UnivariateDriftCalculator

__all__ = ["UnivariateDriftCalculator"]
