"""Quick start — the reference's README flow, Spark-native.

Generates the car-loan dataset, detects univariate drift, estimates
post-deployment accuracy without labels (CBPE), ranks columns by alerts,
and exports long-form metric rows to sqlite.

Run: python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_validate import CBPE, PeriodBasedChunker, UnivariateDriftCalculator, DatabaseWriter
from spark_validate.datasets import load_synthetic_car_loan_dataset
from spark_validate.rankers import alert_count_rank
from spark_validate.session import get_spark


def main():
    spark = get_spark("quickstart", cores=8)
    reference, analysis, analysis_targets = load_synthetic_car_loan_dataset(spark, n_rows=50_000)

    chunker = PeriodBasedChunker(offset="W", timestamp_column="timestamp")

    # 1. univariate drift on the model inputs
    drift = UnivariateDriftCalculator(
        column_names=["car_value", "debt_to_income_ratio", "driver_tenure", "salary_range"],
        continuous_methods=["jensen_shannon", "kolmogorov_smirnov"],
        categorical_methods=["chi2", "jensen_shannon"],
        chunker=chunker,
    ).fit(reference)
    drift_res = drift.calculate(analysis)
    drift_res.filter("alert").select("chunk_key", "column_name", "method", "value").show(10, False)

    # 2. estimated accuracy without labels
    cbpe = CBPE(
        metrics=("roc_auc", "accuracy"),
        y_true="repaid",
        y_pred="y_pred",
        y_pred_proba="y_pred_proba",
        chunker=chunker,
    ).fit(reference)
    est = cbpe.estimate(analysis)
    est.select("chunk_key", "method", "value", "alert").orderBy("chunk_key", "method").show(10, False)

    # 3. which columns drifted the most?
    ranked = alert_count_rank(drift_res)
    ranked.show()

    # 4. export long-form metric rows
    db = os.path.join(tempfile.mkdtemp(prefix="sv_quickstart_"), "metrics.db")
    n = DatabaseWriter(f"sqlite:///{db}", model_name="car_loan").write(drift_res, run_id="quickstart")
    print(f"wrote {n} metric rows to {db}")

    drift.release_cache()
    spark.stop()


if __name__ == "__main__":
    main()
