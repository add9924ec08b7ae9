"""Build the spark-submit --py-files artifact.

Usage:
    python tools/make_pyfiles.py [out_dir]          # default: dist/

Then on a cluster:
    spark-submit --py-files dist/spark_validate.zip your_job.py suite.yaml

(`your_job.py` only needs `from spark_validate.runner import load_config,
run_suite` — the zip is the whole engine; no install step.)
"""

from __future__ import annotations

import os
import shutil
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "dist")
os.makedirs(out_dir, exist_ok=True)
path = shutil.make_archive(
    os.path.join(out_dir, "spark_validate"), "zip", root_dir=repo, base_dir="spark_validate"
)
print(path)
