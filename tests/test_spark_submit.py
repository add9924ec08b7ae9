"""North-rule deployment evidence: the engine runs via real ``spark-submit
--py-files`` with the zip artifact as the ONLY source of the package.

The north rule requires the engine to run "via spark-submit --py-files on
multi-executor clusters". This test builds ``dist/spark_validate.zip`` with
``tools/make_pyfiles.py``, writes a minimal driver job + suite config into a
temp directory, and launches an actual ``spark-submit`` subprocess from that
directory with a scrubbed ``PYTHONPATH`` — the repo checkout is NOT
importable, so a pass proves the shipped zip is self-contained (the sandbox
analog of shipping to a cluster where only the artifact exists).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

_JOB = """\
import sys

from pyspark.sql import SparkSession

# the zip from --py-files must be the only way to reach the package
import spark_validate  # noqa: F401
from spark_validate.runner import load_config, run_suite

spark = (
    SparkSession.builder.appName("submit_e2e")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
report = run_suite(spark, load_config(sys.argv[1]))
bad = {k: v for k, v in report.items() if v.get("error")}
assert not bad, f"checks errored: {bad}"
print("SUBMIT_OK", ",".join(sorted(report)))
spark.stop()
"""

_CONFIG = """\
run_id: submit-e2e
output_dir: {out}
store_dir: {store}
reference: {sf}/lineitem.parquet
analysis: {sf}/lineitem.parquet
chunking: {{chunk_period: Q, timestamp_column: l_shipdate}}
checks:
  - {{type: range, columns: [l_extendedprice]}}
  - type: drift
    columns: [l_extendedprice, l_returnflag]
    continuous_methods: [jensen_shannon, psi]
    categorical_methods: [chi2]
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    # 1. build the artifact exactly the way a deployment would
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"), str(tmp_path)],
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
    assert "spark_validate/runner.py" in names  # package at the zip root

    # 2. stage job + config OUTSIDE the repo
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    out_dir = tmp_path / "out"
    cfg = tmp_path / "suite.yaml"
    cfg.write_text(_CONFIG.format(out=out_dir, store=tmp_path / "store", sf=SF_DIR))

    # 3. spark-submit from the temp dir with the repo scrubbed from sys.path
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            str(job),
            str(cfg),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    assert "SUBMIT_OK" in proc.stdout, proc.stdout[-3000:]

    # 4. the run produced the standard artifact layout
    assert (out_dir / "results").exists()
    assert (out_dir / "lineage").exists()
