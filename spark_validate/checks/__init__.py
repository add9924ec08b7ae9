from spark_validate.checks.constraints import (
    NumericalRangeCalculator,
    UnseenValuesCalculator,
    DomainCheck,
    UniquenessCheck,
    ReferentialIntegrityCheck,
)
from spark_validate.checks.schema import SchemaCheck

__all__ = [
    "NumericalRangeCalculator",
    "UnseenValuesCalculator",
    "DomainCheck",
    "UniquenessCheck",
    "ReferentialIntegrityCheck",
    "SchemaCheck",
]
