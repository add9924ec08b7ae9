"""Deterministic synthetic image+caption table (BASELINE.json `input_hint`).

Schema: ``image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long`` — synthesized WITH SPARK (``spark.range`` +
column expressions), so generation itself scales to any row count and any
partition layout; nothing is built driver-side.

Injected anomalies (all rate-parameterized, deterministic via hash of the
row id — no RNG state):

* duplicate ``image_id``s (uniqueness-check targets)
* ``phash`` orphans absent from the reference manifest (referential targets)
* unseen ``fmt`` values in the analysis slice (domain-check targets)
* drifted w/h distribution in the analysis slice (drift targets)
* oversized ``bytes`` outliers (skew targets)
* structurally corrupt payloads — wrong magic or header dims disagreeing
  with the metadata columns (payload-header-check targets)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FMTS = ["jpeg", "png", "webp"]
UNSEEN_FMT = "bmp"
SIZES = [64, 128, 256, 512, 1024]
_WORDS = [
    "sunset", "mountain", "river", "cat", "dog", "city", "forest", "beach",
    "portrait", "abstract", "vintage", "neon", "rain", "snow", "bridge", "garden",
]


def _pick(arr, key_col, salt: int):
    """Deterministic choice from a literal array via a hash of the row id."""
    idx = F.pmod(F.xxhash64(key_col, F.lit(salt)), F.lit(len(arr))) + 1
    return F.element_at(F.array(*[F.lit(v) for v in arr]), idx.cast("int"))


def synth_image_table(
    spark: SparkSession,
    n_rows: int,
    n_partitions: int = 32,
    dup_rate: float = 0.0001,
    orphan_rate: float = 0.001,
    unseen_fmt_rate: float = 0.0,
    drift: bool = False,
    oversized_rate: float = 0.0005,
    corrupt_magic_rate: float = 0.0,
    dim_mismatch_rate: float = 0.0,
    empty_caption_rate: float = 0.0,
    payload_kb: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Build the image+caption table. ``drift=True`` produces the 'analysis'
    slice: shifted w/h mix, optional unseen fmt, phash orphans."""
    df = spark.range(0, n_rows, 1, n_partitions).withColumnRenamed("id", "row_id")
    rid = F.col("row_id")
    h64 = F.xxhash64(rid, F.lit(seed))

    # duplicates: a dup_rate slice of rows reuses the id of (row_id - 1)
    dup_flag = F.pmod(h64, F.lit(1_000_000)) < F.lit(int(dup_rate * 1_000_000))
    id_src = F.when(dup_flag & (rid > 0), rid - 1).otherwise(rid)
    image_id = F.sha2(F.concat(F.lit(f"img-{seed}-"), id_src.cast("string")), 256).substr(1, 32)

    size_arr = SIZES if not drift else SIZES[1:] + [2048]  # drifted size mix
    w = _pick(size_arr, rid, seed + 1).cast("int")
    h = _pick(size_arr, rid, seed + 2).cast("int")

    fmt = _pick(FMTS, rid, seed + 3)
    if unseen_fmt_rate > 0:
        unseen_flag = F.pmod(F.xxhash64(rid, F.lit(seed + 4)), F.lit(1_000_000)) < F.lit(
            int(unseen_fmt_rate * 1_000_000)
        )
        fmt = F.when(unseen_flag, F.lit(UNSEEN_FMT)).otherwise(fmt)

    caption = F.concat_ws(
        " ",
        _pick(_WORDS, rid, seed + 5),
        _pick(_WORDS, rid, seed + 6),
        _pick(_WORDS, rid, seed + 7),
    )
    if empty_caption_rate > 0:  # degraded-caption targets (quality checks)
        ec_flag = F.pmod(F.xxhash64(rid, F.lit(seed + 14)), F.lit(1_000_000)) < F.lit(
            int(empty_caption_rate * 1_000_000)
        )
        caption = F.when(ec_flag, F.lit("")).otherwise(caption)

    # phash keyed by image_id so duplicate ids share a phash; orphans re-hash
    # with a different salt, guaranteeing absence from any same-seed manifest
    phash = F.xxhash64(image_id, F.lit(seed + 8))
    if orphan_rate > 0:
        orphan_flag = F.pmod(F.xxhash64(rid, F.lit(seed + 9)), F.lit(1_000_000)) < F.lit(
            int(orphan_rate * 1_000_000)
        )
        phash = F.when(orphan_flag, F.xxhash64(image_id, F.lit(seed + 11))).otherwise(phash)

    # payload: deterministic pseudo-image — fake codec header + seeded bytes;
    # content derives ONLY from image_id so dup ids carry identical payloads
    # and a reference re-decode reproduces identical pixels (PSNR=∞ unless
    # corrupted). Oversized outliers exercise bytes-column skew handling.
    # payload_kb=0 → NULL bytes (relational-only benchmarking tables).
    reps = F.when(
        F.pmod(F.xxhash64(rid, F.lit(seed + 10)), F.lit(1_000_000)) < F.lit(int(oversized_rate * 1_000_000)),
        F.lit(max(payload_kb, 1) * 64),  # 64× oversized
    ).otherwise(F.lit(max(payload_kb, 1)))
    hex_block = F.sha2(F.concat(F.lit("px-"), image_id), 512)  # 128 hex chars = 64 bytes
    body = F.repeat(hex_block, (reps * 16).cast("int"))  # kb → 16 blocks of 64B
    # 'SVI0' magic + 4-byte w + 4-byte h + body (all byte-aligned hex)
    if payload_kb <= 0:
        payload = F.lit(None).cast("binary")
    else:
        magic = F.lit("53564930")
        if corrupt_magic_rate > 0:  # bit-rotted container signature
            corrupt_flag = F.pmod(F.xxhash64(rid, F.lit(seed + 12)), F.lit(1_000_000)) < F.lit(
                int(corrupt_magic_rate * 1_000_000)
            )
            magic = F.when(corrupt_flag, F.lit("DEADBEEF")).otherwise(magic)
        hdr_w = w
        if dim_mismatch_rate > 0:  # header dims disagreeing with metadata
            dim_flag = F.pmod(F.xxhash64(rid, F.lit(seed + 13)), F.lit(1_000_000)) < F.lit(
                int(dim_mismatch_rate * 1_000_000)
            )
            hdr_w = F.when(dim_flag, w + F.lit(1)).otherwise(w)
        payload = F.unhex(
            F.concat(magic, F.lpad(F.hex(hdr_w), 8, "0"), F.lpad(F.hex(h), 8, "0"), body)
        )

    return df.select(
        image_id.alias("image_id"),
        payload.alias("bytes"),
        w.alias("w"),
        h.alias("h"),
        fmt.alias("fmt"),
        caption.alias("caption"),
        phash.alias("phash"),
    )


def reference_manifest(reference: DataFrame) -> DataFrame:
    """Distinct phash manifest of the reference slice (referential target)."""
    return reference.select("phash").distinct()
