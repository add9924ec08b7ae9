from spark_validate.checks.constraints import (
    NumericalRangeCalculator,
    UnseenValuesCalculator,
    DomainCheck,
    UniquenessCheck,
    ReferentialIntegrityCheck,
)
from spark_validate.checks.profile import (
    BenfordCalculator,
    CardinalityCalculator,
    EntropyCalculator,
    IQROutlierCalculator,
    QuantileStatsCalculator,
    SkewCalculator,
    FrequentItemsCalculator,
    HistogramCalculator,
    RowCompletenessCalculator,
    ShapeStatsCalculator,
    ZScoreOutlierCalculator,
)
from spark_validate.checks.compliance import ComplianceCheck
from spark_validate.checks.fd import FunctionalDependencyCheck
from spark_validate.checks.freshness import FreshnessCheck
from spark_validate.checks.reconcile import ReconciliationCheck, reconcile
from spark_validate.checks.schema import SchemaCheck
from spark_validate.checks.semantic import SemanticTypeCheck
from spark_validate.checks.snapshot import (
    SnapshotDiffCheck,
    snapshot_diff,
    snapshot_diff_summary,
)

__all__ = [
    "BenfordCalculator",
    "ComplianceCheck",
    "CardinalityCalculator",
    "RowCompletenessCalculator",
    "ShapeStatsCalculator",
    "EntropyCalculator",
    "IQROutlierCalculator",
    "QuantileStatsCalculator",
    "SkewCalculator",
    "FrequentItemsCalculator",
    "HistogramCalculator",
    "ZScoreOutlierCalculator",
    "SnapshotDiffCheck",
    "snapshot_diff",
    "snapshot_diff_summary",
    "NumericalRangeCalculator",
    "UnseenValuesCalculator",
    "DomainCheck",
    "UniquenessCheck",
    "ReferentialIntegrityCheck",
    "SchemaCheck",
    "SemanticTypeCheck",
    "FreshnessCheck",
    "FunctionalDependencyCheck",
    "ReconciliationCheck",
    "reconcile",
]
