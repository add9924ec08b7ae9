from spark_validate.calculators.stats import (
    ColumnStatsCalculator,
    MissingValuesCalculator,
    SummaryStatsAvgCalculator,
    SummaryStatsSumCalculator,
    SummaryStatsStdCalculator,
    SummaryStatsMedianCalculator,
    SummaryStatsRowCountCalculator,
)

__all__ = [
    "ColumnStatsCalculator",
    "MissingValuesCalculator",
    "SummaryStatsAvgCalculator",
    "SummaryStatsSumCalculator",
    "SummaryStatsStdCalculator",
    "SummaryStatsMedianCalculator",
    "SummaryStatsRowCountCalculator",
]
