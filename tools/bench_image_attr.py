"""Image-suite per-check attribution run (round-4 verdict #3).

Runs the north-rule ImageValidationSuite at N rows through bench.py's
builder (same tables, same session shape) and prints the per-check
wall/img-s table — the decomposition that shows whether an
images_per_sec move is added-check cost or a real per-check regression.

Usage: python tools/bench_image_attr.py [n_rows]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def main():
    import bench

    spark = bench.new_session(bench.CPUS)
    img = bench.run_image_suite(spark, N, bench.CPUS * 2)
    print(json.dumps(img))


if __name__ == "__main__":
    main()
