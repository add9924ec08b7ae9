"""Perceptual-hash near-duplicate detection — banded Hamming join.

The north-rule image table carries ``phash:int64`` (a 64-bit perceptual
hash). Two images are near-duplicates when the Hamming distance between
their phashes is small (≤4 is the common operating point). At 10^12 rows an
all-pairs comparison is impossible; the banded join is EXACT, not
probabilistic:

    split the 64 bits into ``n_bands`` disjoint bands; h bit flips can
    touch at most h bands, so if h ≤ n_bands − 1 at least one band is
    untouched and the pair collides in that band's bucket (pigeonhole).

With n_bands = max_hamming + 1 recall is therefore 1.0 by construction —
unlike the cosine/MinHash LSH sweeps there is no miss probability — and the
``bit_count(xor) ≤ max_hamming`` verify removes the false positives. Same
bucket-cap guard as the other sweeps: a band value shared by more than
``max_bucket`` images is a degenerate cluster (e.g. the all-black phash)
reported separately rather than exploded quadratically.

No reference analog (NannyML has no image ops); topology mirrors
``text/dedup.py::lsh_candidate_pairs``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _band_exprs(phash_col: str, n_bands: int, bits: int):
    """Disjoint bit ranges covering ``bits`` (remainder spread left-to-right)."""
    base, rem = divmod(bits, n_bands)
    exprs, off = [], 0
    for j in range(n_bands):
        width = base + (1 if j < rem else 0)
        mask = (1 << width) - 1
        exprs.append(
            F.shiftrightunsigned(F.col(phash_col), off).bitwiseAND(F.lit(mask)).alias(f"_b{j}")
        )
        off += width
    return exprs


def _band_keys_arrow(phash_col: str, ranges, combos):
    """array<long> of per-combination concatenated block keys — one
    vectorized numpy pass per Arrow batch (bit-identical to the JVM
    expression path; uint64 views give the logical shifts int64 lacks)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def keys(ph: pd.Series) -> pd.Series:
        u = ph.to_numpy(np.int64).astype(np.uint64)  # bit-preserving
        blocks = [((u >> np.uint64(off)) & np.uint64((1 << w) - 1)) for off, w in ranges]
        cols = []
        for combo in combos:
            key = np.zeros(len(u), dtype=np.uint64)
            shift = 0
            for j in combo:
                key += blocks[j] << np.uint64(shift)
                shift += ranges[j][1]
            cols.append(key.astype(np.int64))
        out = np.stack(cols, axis=1)
        return pd.Series(list(out))

    return keys(F.col(phash_col))


def _block_ranges(bits: int, n_blocks: int):
    base, rem = divmod(bits, n_blocks)
    out, off = [], 0
    for j in range(n_blocks):
        width = base + (1 if j < rem else 0)
        out.append((off, width))
        off += width
    return out


def phash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 4,
    phash_col: str = "phash",
    id_col: str = "image_id",
    n_bands: Optional[int] = None,
    n_blocks: Optional[int] = None,
    bits: int = 64,
    max_bucket: int = 10_000,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(phash_a, phash_b) ≤ max_hamming.

    Exact recall by pigeonhole, with a CORPUS-SIZED candidate load: the hash
    splits into ``n_blocks`` blocks and each "band" is the concatenation of
    ``m = n_blocks − max_hamming`` blocks, over all C(n_blocks, m) block
    combinations (Manku et al., WWW'07 — the simhash dedup construction).
    Any pair within ``max_hamming`` damages at most ``max_hamming`` blocks,
    so some combination of m intact blocks collides: recall is exactly 1.

    Candidate load on worst-case random hashes ≈ T·n²/2^(m·bits/n_blocks)
    with T = C(n_blocks, m) tables:

    * ``n_blocks = max_hamming+1`` (m=1, the minimal construction): T=5
      tables matching ~13 bits — fine to ~10^7 rows;
    * ``n_blocks = 8`` at h=4: T=70 tables matching 32 bits — ~3·10^6×
      fewer random collisions; the right setting for 10^8+ corpora (70×
      explosion is shuffle weight, not pair weight).

    One shuffle on (band, band_value); candidate pairs carry only ids +
    phashes (fixed width — image bytes never enter the join).
    ``n_bands`` is accepted as a legacy alias for ``n_blocks``.
    """
    import itertools

    if n_blocks is None:
        n_blocks = n_bands if n_bands is not None else max_hamming + 1
    if n_blocks < max_hamming + 1:
        raise ValueError(
            f"n_blocks={n_blocks} cannot guarantee recall at max_hamming={max_hamming}; "
            f"need ≥ {max_hamming + 1} (pigeonhole)"
        )
    m = n_blocks - max_hamming
    sel = df.select(F.col(id_col).alias("id"), F.col(phash_col).alias("_ph")).filter(
        F.col("_ph").isNotNull()
    )
    ranges = _block_ranges(bits, n_blocks)
    block_vals = [
        F.shiftrightunsigned(F.col("_ph"), off).bitwiseAND(F.lit((1 << width) - 1))
        for off, width in ranges
    ]
    combos = list(itertools.combinations(range(n_blocks), m))
    if len(combos) <= 8:
        # few tables → pure-JVM key expressions (no Python workers)
        band_structs = []
        for t, combo in enumerate(combos):
            key = F.lit(0).cast("long")
            shift = 0
            for j in combo:
                key = key + F.shiftleft(block_vals[j].cast("long"), shift)
                shift += ranges[j][1]
            band_structs.append(F.struct(F.lit(t).alias("band"), key.alias("val")))
        keyed = sel.select("id", "_ph", F.explode(F.array(*band_structs)).alias("b")).select(
            "id", "_ph", "b.band", "b.val"
        )
    else:
        # many tables (Manku construction: C(n_blocks, m) can be 70+) → one
        # numpy pass per Arrow batch; a 70-struct expression tree was 13×
        # slower from codegen alone
        keyed = sel.select(
            "id", "_ph", F.posexplode(_band_keys_arrow("_ph", ranges, combos))
        ).select("id", "_ph", F.col("pos").alias("band"), F.col("col").alias("val"))
    # ONE shuffle on (band, band_value) — same topology as the MinHash and
    # embedding sweeps; pairs carry (id, phash) only, never image bytes
    exploded = keyed
    buckets = (
        exploded.groupBy("band", "val")
        .agg(F.sort_array(F.collect_list(F.struct("id", "_ph"))).alias("xs"))
        .filter((F.size("xs") > 1) & (F.size("xs") <= max_bucket))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("xs"),
                        lambda x, idx: F.transform(
                            F.slice(F.col("xs"), idx + 2, F.size("xs")),
                            lambda y: F.struct(
                                x["id"].alias("id_a"),
                                y["id"].alias("id_b"),
                                x["_ph"].alias("_pa"),
                                y["_ph"].alias("_pb"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p._pa", "p._pb")
        .distinct()
    )
    dist = F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb")))
    return (
        pairs.withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


class PhashDedupCheck:
    """Runner-compatible check: per-chunk rate of images involved in at
    least one ≤max_hamming near-duplicate pair, plus pair-level violation
    rows. Pair discovery is global (near-dups cross chunk boundaries); the
    chunk metric attributes each involved image to ITS chunk. Alerts on a
    constant upper threshold (default: any involvement alerts, the same
    zero-tolerance default as the range check)."""

    def __init__(
        self,
        phash_col: str = "phash",
        id_col: str = "image_id",
        max_hamming: int = 4,
        chunker=None,
        upper_threshold: float = 0.0,
        max_bucket: int = 10_000,
    ):
        from spark_validate.chunking import DefaultChunker

        self.phash_col = phash_col
        self.id_col = id_col
        self.max_hamming = max_hamming
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold
        self.max_bucket = max_bucket

    def _pairs(self, df: DataFrame) -> DataFrame:
        return phash_near_duplicates(
            df,
            max_hamming=self.max_hamming,
            phash_col=self.phash_col,
            id_col=self.id_col,
            max_bucket=self.max_bucket,
        )

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.checks.constraints import _attach_const_threshold
        from spark_validate.chunking import CHUNK_KEY

        assigned, headers = assign_chunks(df, self.chunker)
        pairs = self._pairs(df)
        involved = (
            pairs.select(F.col("id_a").alias("_id"))
            .unionByName(pairs.select(F.col("id_b").alias("_id")))
            .distinct()
        )
        per_chunk = (
            assigned.join(involved, assigned[self.id_col] == involved["_id"], "left")
            .groupBy(CHUNK_KEY)
            .agg(
                F.count(F.lit(1)).alias("__rows"),
                F.count("_id").cast("double").alias("__dups"),
            )
            .select(
                CHUNK_KEY,
                F.lit(self.phash_col).alias("column_name"),
                F.lit("near_dup_rate").alias("method"),
                (F.col("__dups") / F.col("__rows")).cast("double").alias("value"),
            )
        )
        return _attach_const_threshold(per_chunk, headers, period, None, self.upper_threshold)

    def violations(self, df: DataFrame, row_id: Optional[str] = None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        assigned = self.chunker.assign(df).select(
            F.col(self.id_col).alias("id_a"), F.col(CHUNK_KEY).alias("chunk_key")
        )
        return self._pairs(df).join(assigned, "id_a").select(
            F.lit("phash_dedup").alias("check"),
            F.lit(self.phash_col).alias("column_name"),
            "chunk_key",
            F.col("id_a").cast("string").alias("row_id"),
            F.lit("near_duplicate").alias("violation_kind"),
            F.concat(F.col("id_b").cast("string"), F.lit("@h="), F.col("hamming").cast("string")).alias(
                "observed_value"
            ),
        )


def phash_degenerate_bands(
    df: DataFrame,
    phash_col: str = "phash",
    n_bands: int = 5,
    bits: int = 64,
    max_bucket: int = 10_000,
) -> DataFrame:
    """The clusters the cap excluded: (band, band_value, n_images) above
    ``max_bucket`` — at corpus scale these ARE the finding (constant-color
    thumbnails, watermark templates), reported instead of exploded."""
    sel = df.select(F.col(phash_col).alias("_ph")).filter(F.col("_ph").isNotNull())
    banded = sel.select(*_band_exprs("_ph", n_bands, bits))
    out = None
    for j in range(n_bands):
        g = (
            banded.groupBy(F.col(f"_b{j}").alias("band_value"))
            .agg(F.count(F.lit(1)).alias("n_images"))
            .filter(F.col("n_images") > max_bucket)
            .select(F.lit(j).alias("band"), "band_value", "n_images")
        )
        out = g if out is None else out.unionByName(g)
    return out
