from spark_validate.checks.constraints import (
    NumericalRangeCalculator,
    UnseenValuesCalculator,
    DomainCheck,
    UniquenessCheck,
    ReferentialIntegrityCheck,
)

__all__ = [
    "NumericalRangeCalculator",
    "UnseenValuesCalculator",
    "DomainCheck",
    "UniquenessCheck",
    "ReferentialIntegrityCheck",
]
