"""Shared bucket → candidate-pair expansion.

One idiom used by every near-duplicate sweep (MinHash LSH, embedding LSH,
exact Hamming): a bucket row holds a sorted array of elements; the pairs are
all (xs[i], xs[j]) with i < j, produced JVM-side via nested
``transform``/``slice`` — no cross join, pair count bounded by the caller's
``max_bucket`` filter on the array size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_bucket_pairs(buckets: DataFrame, xs_col: str = "ids") -> DataFrame:
    """Rows of ``struct(a, b)`` (aliased ``p``) for every in-bucket pair,
    preserving the array's sort order (a before b). Payload-agnostic:
    elements may be scalars or structs; callers project ``p.a`` / ``p.b``."""
    xs = F.col(xs_col)
    return buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    xs,
                    lambda x, idx: F.transform(
                        F.slice(xs, idx + 2, F.size(xs)),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
