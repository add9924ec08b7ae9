from spark_validate.checks.constraints import (
    NumericalRangeCalculator,
    UnseenValuesCalculator,
    DomainCheck,
    UniquenessCheck,
    ReferentialIntegrityCheck,
)
from spark_validate.checks.profile import CardinalityCalculator, ZScoreOutlierCalculator
from spark_validate.checks.schema import SchemaCheck

__all__ = [
    "CardinalityCalculator",
    "ZScoreOutlierCalculator",
    "NumericalRangeCalculator",
    "UnseenValuesCalculator",
    "DomainCheck",
    "UniquenessCheck",
    "ReferentialIntegrityCheck",
    "SchemaCheck",
]
