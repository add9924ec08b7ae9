"""Generalized exact Hamming near-duplicate join (shared core).

Used by ``image/phash.py`` (perceptual hashes) and ``text/dedup.py``
(simhash fingerprints). See ``hamming_near_duplicates`` for the Manku
multi-block construction and its guarantees.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _band_keys_arrow(hash_col: str, ranges, combos, band_shift: int = 0):
    """array<long> of per-combination concatenated block keys — one
    vectorized numpy pass per Arrow batch (bit-identical to the JVM
    expression path; uint64 views give the logical shifts int64 lacks).
    ``band_shift`` > 0 packs the table index into the high bits of each key
    (see :func:`_pack_shift`)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def keys(ph: pd.Series) -> pd.Series:
        u = ph.to_numpy(np.int64).astype(np.uint64)  # bit-preserving
        blocks = [((u >> np.uint64(off)) & np.uint64((1 << w) - 1)) for off, w in ranges]
        cols = []
        for t, combo in enumerate(combos):
            key = np.zeros(len(u), dtype=np.uint64)
            shift = 0
            for j in combo:
                key += blocks[j] << np.uint64(shift)
                shift += ranges[j][1]
            if band_shift:
                key += np.uint64(t) << np.uint64(band_shift)
            cols.append(key.astype(np.int64))
        out = np.stack(cols, axis=1)
        return pd.Series(list(out))

    return keys(F.col(hash_col))


def _pack_shift(ranges, combos) -> int:
    """Bit position where the table index can sit above every combo's value
    bits so (band, value) packs into ONE non-negative int64 grouping key —
    one 8-byte column through the banded shuffle instead of an int + a
    long (guide §2.3: shuffle fewer bytes). 0 = doesn't fit, keep two
    columns."""
    max_val_bits = max(sum(ranges[j][1] for j in combo) for combo in combos)
    band_bits = max(len(combos) - 1, 1).bit_length()
    return max_val_bits if max_val_bits + band_bits <= 63 else 0


def _block_ranges(bits: int, n_blocks: int):
    base, rem = divmod(bits, n_blocks)
    out, off = [], 0
    for j in range(n_blocks):
        width = base + (1 if j < rem else 0)
        out.append((off, width))
        off += width
    return out


def _keys_frame(sel: DataFrame, ranges, combos, hash_alias: str = "_ph"):
    """(frame, key_cols): the shared one-shuffle key topology. When the
    (table, value) pair fits one int64 (``_pack_shift``), the frame carries
    ONE packed ``val`` column (key_cols = ["val"]) — 8 fewer bytes and one
    fewer grouping column per exploded row through the banded shuffle
    (guide §2.3); otherwise the unpacked (band, val) pair."""
    shift = _pack_shift(ranges, combos)
    block_vals = [
        F.shiftrightunsigned(F.col(hash_alias), off).bitwiseAND(F.lit((1 << width) - 1))
        for off, width in ranges
    ]
    if len(combos) <= 8:
        # few tables → pure-JVM key expressions (no Python workers)
        band_structs = []
        for t, combo in enumerate(combos):
            key = F.lit(t << shift if shift else 0).cast("long")
            koff = 0
            for j in combo:
                key = key + F.shiftleft(block_vals[j].cast("long"), koff)
                koff += ranges[j][1]
            if shift:
                band_structs.append(key)
            else:
                band_structs.append(F.struct(F.lit(t).alias("band"), key.alias("val")))
        if shift:
            return (
                sel.select("*", F.explode(F.array(*band_structs)).alias("val")),
                ["val"],
            )
        return (
            sel.select("*", F.explode(F.array(*band_structs)).alias("b")).select(
                *sel.columns, "b.band", "b.val"
            ),
            ["band", "val"],
        )
    # many tables (Manku construction: C(n_blocks, m) can be 70+) → one
    # numpy pass per Arrow batch; a 70-struct expression tree was 13×
    # slower from codegen alone
    if shift:
        return (
            sel.select(
                "*",
                F.explode(_band_keys_arrow(hash_alias, ranges, combos, shift)).alias("val"),
            ),
            ["val"],
        )
    return (
        sel.select(
            "*", F.posexplode(_band_keys_arrow(hash_alias, ranges, combos))
        ).select(*sel.columns, F.col("pos").alias("band"), F.col("col").alias("val")),
        ["band", "val"],
    )


def suggest_n_blocks(
    n_rows: int,
    max_hamming: int = 4,
    bits: int = 64,
    max_candidate_ratio: float = 2.0,
) -> int:
    """Smallest exact-recall block count whose worst-case random-candidate
    load stays ≤ ``max_candidate_ratio·n_rows``.

    Every ``n_blocks ≥ max_hamming+1`` yields EXACTLY the same output pairs
    (pigeonhole recall 1); the knob trades shuffle weight (C(n_blocks, m)
    exploded rows per hash) against verify load (expected random collisions
    ≈ T·n²/2^matched_bits per table, worst table = the m narrowest blocks).
    Table count T grows with n_blocks, so iterating upward returns the
    cheapest-shuffle construction that still bounds the verify:
    ~1M–10M rows → 7 blocks (35 tables), ~100M → 8 (70), ~1B → 9 (126).
    The 10M-tier sweep measured n_blocks=7 ≈ 2× faster end-to-end than the
    previous fixed 8 at identical (recall-1.0) output.
    """
    import math

    n = max(int(n_rows), 1)
    for nb in range(max_hamming + 1, min(bits, max_hamming + 16)):
        m = nb - max_hamming
        t = math.comb(nb, m)
        widths = sorted(w for _, w in _block_ranges(bits, nb))
        matched = sum(widths[:m])  # worst (narrowest) combo
        load = t * float(n) * n / (2.0**matched) / 2.0
        if load <= max_candidate_ratio * n:
            return nb
    return min(bits, max_hamming + 16) - 1


def hamming_near_duplicates(
    df: DataFrame,
    max_hamming: int = 4,
    hash_col: str = "phash",
    id_col: str = "image_id",
    n_bands: Optional[int] = None,
    n_blocks: Optional[int] = None,
    bits: int = 64,
    max_bucket: int = 10_000,
    enforce_recall: bool = True,
    dedup_hash: bool = False,
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

    ``dedup_hash=True`` switches the nodes to the HASH VALUES themselves
    (``id_col`` is ignored; ``id_a``/``id_b`` are hash values): the bucket
    aggregate becomes ``collect_set``, so exact-equal hashes collapse to one
    node INSIDE the banded shuffle — map-side partial dedup, zero extra
    stages. A boilerplate image copied 10^8 times is one bucket entry, the
    cap counts DISTINCT values, and the pair graph runs over hash-space.
    This is the clusters path (``image/phash.py::phash_clusters``), which
    relabels components back to member ids afterwards.
    """
    import itertools

    if n_blocks is None:
        n_blocks = n_bands if n_bands is not None else max_hamming + 1
    if n_blocks < max_hamming + 1:
        if enforce_recall:
            raise ValueError(
                f"n_blocks={n_blocks} cannot guarantee recall at max_hamming={max_hamming}; "
                f"need ≥ {max_hamming + 1} (pigeonhole) — or pass enforce_recall=False "
                "for probabilistic recall (a pair within the threshold is found only "
                "if some block happens to be untouched)"
            )
        import logging

        logging.getLogger(__name__).warning(
            "hamming join with n_blocks=%d < max_hamming+1=%d: recall is probabilistic",
            n_blocks,
            max_hamming + 1,
        )
    m = max(n_blocks - max_hamming, 1)  # floors at 1 in probabilistic mode
    if dedup_hash:
        sel = df.select(F.col(hash_col).alias("id"), F.col(hash_col).alias("_ph")).filter(
            F.col("_ph").isNotNull()
        )
    else:
        sel = df.select(F.col(id_col).alias("id"), F.col(hash_col).alias("_ph")).filter(
            F.col("_ph").isNotNull()
        )
    ranges = _block_ranges(bits, n_blocks)
    combos = list(itertools.combinations(range(n_blocks), m))
    keyed, key_cols = _keys_frame(sel, ranges, combos)
    # ONE shuffle on the banded key — same topology as the MinHash and
    # embedding sweeps; pairs carry (id, phash) only, never image bytes.
    # dedup_hash: collect_set dedups identical (hash, hash) structs in the
    # map-side partials — equal hashes share every band value, so the whole
    # collapse costs nothing beyond the shuffle that was happening anyway.
    collect = F.collect_set if dedup_hash else F.collect_list
    buckets = (
        keyed.groupBy(*key_cols)
        .agg(F.sort_array(collect(F.struct("id", "_ph"))).alias("xs"))
        .filter((F.size("xs") > 1) & (F.size("xs") <= max_bucket))
    )
    from spark_validate.functions.pairs import explode_bucket_pairs

    pairs = (
        explode_bucket_pairs(buckets, "xs")
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a._ph").alias("_pa"),
            F.col("p.b._ph").alias("_pb"),
        )
        # duplicated id rows (same id twice in the input) would otherwise
        # pair with themselves and report id@h=0 self-duplicates
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    dist = F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb")))
    return (
        pairs.withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )




def hamming_degenerate_buckets(
    df: DataFrame,
    max_hamming: int = 4,
    hash_col: str = "phash",
    n_blocks: Optional[int] = None,
    bits: int = 64,
    max_bucket: int = 10_000,
) -> DataFrame:
    """(band, band_value, n_rows) for buckets the near-dup cap excluded —
    at corpus scale these ARE the finding (constant-color thumbnails,
    boilerplate templates). Uses the SAME key construction as
    ``hamming_near_duplicates`` (one shuffle), so the report cannot drift
    from the join's actual buckets."""
    import itertools

    if n_blocks is None:
        n_blocks = max_hamming + 1
    m = max(n_blocks - max_hamming, 1)
    ranges = _block_ranges(bits, n_blocks)
    combos = list(itertools.combinations(range(n_blocks), m))
    sel = df.select(F.col(hash_col).alias("_ph")).filter(F.col("_ph").isNotNull())
    keyed, key_cols = _keys_frame(sel, ranges, combos)
    if key_cols == ["val"]:  # unpack the packed key for the report
        shift = _pack_shift(ranges, combos)
        keyed = keyed.select(
            F.shiftrightunsigned("val", shift).cast("int").alias("band"),
            F.col("val").bitwiseAND(F.lit((1 << shift) - 1)).alias("val"),
        )
    return (
        keyed.groupBy("band", F.col("val").alias("band_value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > max_bucket)
    )


def hamming_matches(
    df: DataFrame,
    manifest: DataFrame,
    max_hamming: int = 4,
    hash_col: str = "phash",
    id_col: str = "image_id",
    manifest_hash_col: Optional[str] = None,
    manifest_id_col: Optional[str] = None,
    n_blocks: Optional[int] = None,
    bits: int = 64,
    broadcast_manifest: bool = True,
) -> DataFrame:
    """Asymmetric probe: ``(id, match_id, hamming)`` for every df row whose
    hash lies within ``max_hamming`` of SOME manifest hash.

    Same Manku block construction and exact-recall pigeonhole guarantee as
    ``hamming_near_duplicates``, but corpus-vs-manifest instead of
    corpus-vs-self: both sides are banded identically and equi-joined on
    ``(band, value)``. With a broadcast manifest (eval benchmarks are
    thousands of rows, corpora are billions) the whole probe is a NARROW
    map over the corpus scan — zero shuffles; the corpus is read once,
    candidates verify with ``bit_count(xor)`` inline. Non-broadcast falls
    back to a standard shuffle equi-join on the band keys (AQE picks the
    strategy when the manifest size is borderline).
    """
    import itertools

    if n_blocks is None:
        n_blocks = max_hamming + 1
    if n_blocks < max_hamming + 1:
        raise ValueError(
            f"n_blocks={n_blocks} cannot guarantee recall at max_hamming={max_hamming}; "
            f"need ≥ {max_hamming + 1} (pigeonhole)"
        )
    m = n_blocks - max_hamming
    ranges = _block_ranges(bits, n_blocks)
    combos = list(itertools.combinations(range(n_blocks), m))

    sel = df.select(F.col(id_col).alias("id"), F.col(hash_col).alias("_ph")).filter(
        F.col("_ph").isNotNull()
    )
    msel = manifest.select(
        F.col(manifest_id_col or id_col).alias("id"),
        F.col(manifest_hash_col or hash_col).alias("_ph"),
    ).filter(F.col("_ph").isNotNull())

    keyed, key_cols = _keys_frame(sel, ranges, combos)
    mframe, _ = _keys_frame(msel, ranges, combos)
    mkeyed = mframe.select(
        F.col("id").alias("match_id"), F.col("_ph").alias("_mph"), *key_cols
    )
    if broadcast_manifest:
        mkeyed = F.broadcast(mkeyed)
    dist = F.bit_count(F.col("_ph").bitwiseXOR(F.col("_mph")))
    return (
        keyed.join(mkeyed, key_cols)
        .select("id", "match_id", dist.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        # a pair colliding in several band combinations must count once
        .distinct()
    )
