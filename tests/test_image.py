"""Image table synthesis + payload checks (north-rule target workload)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_validate.checks import DomainCheck, ReferentialIntegrityCheck, UniquenessCheck
from spark_validate.chunking import PartitionChunker
from spark_validate.image import decode_pixel_stats, psnr_check, reference_manifest, synth_image_table
from spark_validate.image.synth import FMTS, UNSEEN_FMT

N = 2000


@pytest.fixture(scope="module")
def img_ref(spark):
    return synth_image_table(spark, N, n_partitions=4, dup_rate=0.0, orphan_rate=0.0).cache()


@pytest.fixture(scope="module")
def img_ana(spark):
    return synth_image_table(
        spark, N, n_partitions=4, dup_rate=0.01, orphan_rate=0.01, unseen_fmt_rate=0.02, drift=True, seed=99
    ).cache()


def test_schema_matches_input_hint(img_ref):
    assert dict(img_ref.dtypes) == {
        "image_id": "string",
        "bytes": "binary",
        "w": "int",
        "h": "int",
        "fmt": "string",
        "caption": "string",
        "phash": "bigint",
    }


def test_synthesis_is_deterministic(spark):
    a = synth_image_table(spark, 500, n_partitions=2).toPandas().sort_values("image_id").reset_index(drop=True)
    b = synth_image_table(spark, 500, n_partitions=8).toPandas().sort_values("image_id").reset_index(drop=True)
    # partition layout must not change content
    assert (a["image_id"] == b["image_id"]).all()
    assert (a["phash"] == b["phash"]).all()
    assert (a["caption"] == b["caption"]).all()


def test_injected_duplicates_found(spark, img_ana):
    chk = UniquenessCheck(["image_id"], salt_buckets=4)
    dups = chk.duplicates(img_ana).toPandas()
    assert len(dups) > 0
    assert (dups["dup_count"] >= 2).all()


def test_fmt_domain_violations(spark, img_ana):
    chk = DomainCheck(["fmt"], domain=FMTS, chunker=PartitionChunker())
    res = chk.calculate(img_ana).toPandas()
    assert res["value"].sum() > 0
    assert res["alert"].any()
    v = chk.violations(img_ana, row_id="image_id").toPandas()
    assert set(v["observed_value"]) == {UNSEEN_FMT}


def test_phash_referential(spark, img_ref, img_ana):
    manifest = reference_manifest(img_ref)
    chk = ReferentialIntegrityCheck(column="phash", manifest=manifest, chunker=PartitionChunker())
    orphans = chk.orphans(img_ana).count()
    assert orphans > 0  # analysis was generated with a different seed → plenty of unseen phashes


def test_decode_pixel_stats(spark, img_ref):
    stats = decode_pixel_stats(img_ref, partitions=4).toPandas()
    assert len(stats) == N
    assert stats["decode_ok"].all()
    assert (stats["n_px_bytes"] > 0).all()
    # sha-seeded payloads → byte means approach 127.5
    assert abs(stats["px_mean"].mean() - 127.5) < 3.0


def test_psnr_identical_payloads(spark, img_ref):
    res = psnr_check(img_ref, img_ref, partitions=4).toPandas()
    assert len(res) == N
    assert res["passes"].all()
    assert np.isinf(res["psnr_db"]).all()
    assert res["caption_equal"].all()


def test_psnr_corruption_detected(spark, img_ref):
    # corrupt payload bytes for ~half the rows (flip via different body)
    corrupted = img_ref.withColumn(
        "bytes",
        F.when(
            F.pmod(F.xxhash64("image_id"), F.lit(2)) == 0,
            F.unhex(F.concat(F.lit("53564930"), F.sha2(F.col("image_id"), 512))),
        ).otherwise(F.col("bytes")),
    )
    res = psnr_check(corrupted, img_ref, partitions=4).toPandas()
    assert res["passes"].sum() < N  # corrupted rows fail PSNR
    assert res["passes"].sum() > 0  # untouched rows still pass
    bad = res[~res["passes"]]
    assert (bad["psnr_db"] < 40).all()


def test_resize_images_shapes_and_determinism(img_ref, spark):
    from spark_validate.image import resize_images

    out = resize_images(img_ref.limit(50), out_w=32, out_h=16)
    pdf = out.toPandas()
    assert len(pdf) == 50
    assert (pdf["out_w"] == 32).all() and (pdf["out_h"] == 16).all()
    assert all(len(p) == 32 * 16 for p in pdf["pixels"])
    # deterministic: same input → identical pixel payloads
    pdf2 = resize_images(img_ref.limit(50), out_w=32, out_h=16).toPandas()
    a = pdf.sort_values("image_id")["pixels"].tolist()
    b = pdf2.sort_values("image_id")["pixels"].tolist()
    assert a == b


def test_extract_image_features(img_ref):
    from spark_validate.image import extract_image_features

    feats = extract_image_features(img_ref.limit(100), n_bins=8).toPandas()
    assert len(feats) == 100
    v = np.stack(feats["features"].to_numpy())
    assert v.shape == (100, 5 + 8)
    # histogram sums to 1, mean in [0, 255]
    np.testing.assert_allclose(v[:, 5:].sum(axis=1), 1.0, atol=1e-5)
    assert ((v[:, 0] >= 0) & (v[:, 0] <= 255)).all()


def test_sample_video_frames_explodes_and_composes(spark):
    from spark_validate.image import sample_video_frames, synth_video_payload

    rows = [(f"v{i}", synth_video_payload(f"v{i}", n_frames=25)) for i in range(10)]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    frames = sample_video_frames(df, stride=10)
    pdf = frames.toPandas()
    # 25 frames, stride 10 → indices 0, 10, 20 per video
    assert len(pdf) == 30
    assert sorted(pdf[pdf.video_id == "v0"]["frame_idx"]) == [0, 10, 20]
    assert (pdf["n_frames"] == 25).all()
    # sampled frames compose with the image-side decode operators
    img_like = frames.select(
        F.col("frame_bytes").alias("bytes"),
        F.concat_ws(":", "video_id", "frame_idx").alias("image_id"),
        F.lit(16).alias("w"),
        F.lit(16).alias("h"),
    )
    stats = decode_pixel_stats(img_like).toPandas()
    assert stats["decode_ok"].all()
    assert stats["px_mean"].notna().all()


def test_sample_video_frames_unknown_container_raises(spark):
    from spark_validate.image import sample_video_frames

    df = spark.createDataFrame([("x", b"RIFFxxxxxxxxxxxx")], "video_id string, bytes binary")
    with pytest.raises(Exception, match="NotImplementedError|SVV0|ffmpeg"):
        sample_video_frames(df, stride=5).collect()


def test_fused_payload_checks(img_ref, img_ana, spark):
    """payload_checks = pixel stats + PSNR in one pass; orphans (no reference
    row) keep pixel stats but contribute NULL passes, not failures."""
    from spark_validate.image.payload import payload_checks

    fused = payload_checks(img_ana, img_ref).toPandas()
    assert len(fused) == img_ana.count()  # left join: every analysis row
    assert fused["decode_ok"].all()
    # agreement with the separate operators (drop planted duplicate ids —
    # a pandas index join would cross-match them)
    f = fused.drop_duplicates("image_id", keep=False).set_index("image_id")
    ps = (
        decode_pixel_stats(img_ana)
        .toPandas()
        .drop_duplicates("image_id", keep=False)
        .set_index("image_id")
    )
    joint = ps.join(f, lsuffix="_sep", how="inner")
    assert len(joint) > 1500
    assert np.allclose(joint["px_mean_sep"], joint["px_mean"], equal_nan=True)
    sep = (
        psnr_check(img_ana, img_ref)
        .toPandas()
        .drop_duplicates("image_id", keep=False)
        .set_index("image_id")
    )
    both = sep.join(f, lsuffix="_sep", how="inner").dropna(subset=["psnr_db_sep"])
    assert (both["passes_sep"] == both["passes"]).all()
    # orphans: psnr null, pixel stats present
    orphans = f[f["psnr_db"].isna()]
    if len(orphans):
        assert orphans["px_mean"].notna().all()
        assert orphans["passes"].isna().all()


def test_decode_audio_stats(spark):
    from spark_validate.image import decode_audio_stats, synth_audio_payload

    rows = [(f"a{i}", synth_audio_payload(f"a{i}", n_samples=8000, sample_rate=16000)) for i in range(20)]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = decode_audio_stats(df).toPandas()
    assert len(out) == 20
    assert (out["sample_rate"] == 16000).all()
    assert np.allclose(out["duration_s"], 0.5)
    assert ((out["rms"] > 0.1) & (out["rms"] < 0.5)).all()   # ~8000/32768 sigma
    assert (out["clipping_rate"] < 0.01).all()
    # unknown container raises
    bad = spark.createDataFrame([("x", b"RIFFxxxxxxxxxxxx")], "audio_id string, bytes binary")
    with pytest.raises(Exception, match="NotImplementedError|SVA0|soundfile"):
        decode_audio_stats(bad).collect()


def test_phash_near_duplicates_exact_recall(spark):
    """Pigeonhole banding: EVERY pair within max_hamming is found (recall 1
    by construction), nothing beyond it survives the verify."""
    import numpy as np
    import pandas as pd
    from spark_validate.image.phash import phash_near_duplicates

    rng = np.random.default_rng(9)
    base = rng.integers(-(2**62), 2**62, 300, dtype=np.int64)
    rows = [{"image_id": f"im{i:04d}", "phash": int(h)} for i, h in enumerate(base)]
    # twins: flip exactly k bits of image i for k=0..4 (all within threshold)
    expected = set()
    for k in range(5):
        h = int(base[k])
        for bit in rng.choice(64, size=k, replace=False):
            h ^= 1 << int(bit)
        rows.append({"image_id": f"tw{k:04d}", "phash": h})
        expected.add((f"im{k:04d}", f"tw{k:04d}"))
    # a far twin: 9 flips — must NOT appear at max_hamming=4
    h = int(base[10])
    for bit in range(9):
        h ^= 1 << (bit * 7)
    rows.append({"image_id": "far0", "phash": h})
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    got = phash_near_duplicates(sdf, max_hamming=4).toPandas()
    got_pairs = {tuple(sorted((r.id_a, r.id_b))) for r in got.itertuples()}
    assert expected <= got_pairs
    assert ("far0" not in {x for p in got_pairs for x in p})
    # random 64-bit pairs at hamming<=4 are ~impossible: only planted pairs
    assert got_pairs == expected
    # distances are exact
    by_pair = {tuple(sorted((r.id_a, r.id_b))): r.hamming for r in got.itertuples()}
    for k in range(5):
        assert by_pair[(f"im{k:04d}", f"tw{k:04d}")] == k


def test_phash_degenerate_cluster_capped_and_reported(spark):
    import pandas as pd
    from spark_validate.image.phash import phash_degenerate_bands, phash_near_duplicates

    # 500 identical phashes (constant-color thumbnails) + 2 genuine twins
    rows = [{"image_id": f"c{i}", "phash": 0} for i in range(500)]
    p = 0x7EDCBA9876543210  # nonzero in every band, so the twins stay out of the zero-cluster
    rows += [{"image_id": "a", "phash": p}, {"image_id": "b", "phash": p ^ 3}]
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    got = phash_near_duplicates(sdf, max_hamming=4, max_bucket=100).toPandas()
    pairs = {tuple(sorted((r.id_a, r.id_b))) for r in got.itertuples()}
    assert pairs == {("a", "b")}  # the degenerate cluster never explodes
    deg = phash_degenerate_bands(sdf, max_bucket=100).toPandas()
    assert (deg["n_images"] == 500).all() and len(deg) == 5  # all 5 bands of zeros


def test_image_suite_phash_dedup_check(spark):
    """Suite integration: the optional near-dup sweep finds planted twins."""
    from pyspark.sql import functions as F
    from spark_validate.suite import ImageValidationSuite

    ref = synth_image_table(spark, 400, n_partitions=4, dup_rate=0.0, orphan_rate=0.0)
    twins = (
        ref.filter(F.col("image_id").substr(-2, 2) == "00")
        .withColumn("image_id", F.concat(F.col("image_id"), F.lit("_tw")))
        .withColumn("phash", F.col("phash").bitwiseXOR(F.lit(1 << 17)))
    )
    ana = ref.unionByName(twins)
    suite = ImageValidationSuite(include_payload_checks=False, include_phash_dedup=True)
    out = suite.run(ref, ana)
    pairs = out["phash_near_dups"].toPandas()
    n_twins = twins.count()
    assert n_twins > 0
    planted = pairs[pairs.hamming == 1]
    assert len(planted) >= n_twins  # every planted twin collides in an intact band


def test_phash_multiblock_construction_exact_recall(spark):
    """Manku-style n_blocks > h+1: same exact recall (every ≤h-flip pair
    leaves m blocks intact in some combination), far fewer random
    candidates — the 10^8+ operating point."""
    import numpy as np
    import pandas as pd
    from spark_validate.image.phash import phash_near_duplicates

    rng = np.random.default_rng(23)
    base = rng.integers(-(2**62), 2**62, 400, dtype=np.int64)
    rows = [{"image_id": f"im{i:04d}", "phash": int(h)} for i, h in enumerate(base)]
    expected = set()
    for k in range(5):  # twins at hamming 0..4
        h = int(base[k])
        for bit in rng.choice(64, size=k, replace=False):
            h ^= 1 << int(bit)
        rows.append({"image_id": f"tw{k:04d}", "phash": h})
        expected.add((f"im{k:04d}", f"tw{k:04d}"))
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    for nb in (5, 6, 8):
        got = phash_near_duplicates(sdf, max_hamming=4, n_blocks=nb).toPandas()
        pairs = {tuple(sorted((r.id_a, r.id_b))) for r in got.itertuples()}
        assert pairs == expected, nb


def test_phash_duplicate_id_rows_produce_no_self_pairs(spark):
    import pandas as pd
    from spark_validate.image.phash import phash_near_duplicates

    rows = [
        {"image_id": "x", "phash": 12345},
        {"image_id": "x", "phash": 12345},  # duplicated row, same id
        {"image_id": "y", "phash": 12345 ^ 1},
    ]
    got = phash_near_duplicates(spark.createDataFrame(pd.DataFrame(rows)), max_hamming=4).toPandas()
    pairs = {tuple(sorted((r.id_a, r.id_b))) for r in got.itertuples()}
    assert ("x", "x") not in pairs
    assert ("x", "y") in pairs


# --- structural payload-header checks (image/header.py) ----------------------


def _hdr_df(spark, rows):
    """rows: (image_id, payload_hex_or_None, fmt, w, h)."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["image_id", "hexp", "fmt", "w", "h"])
    return (
        spark.createDataFrame(pdf)
        .withColumn("bytes", F.unhex(F.col("hexp")))
        .withColumn("w", F.col("w").cast("int"))
        .withColumn("h", F.col("h").cast("int"))
        .drop("hexp")
    )


def test_header_issue_expr_classifies_each_kind(spark):
    from spark_validate.image.header import SVI0_SPEC, header_issue_expr

    good = "53564930" + "00000040" + "00000080" + "AB" * 4  # SVI0, w=64, h=128
    rows = [
        ("ok", good, "png", 64, 128),
        ("nullp", None, "png", 64, 128),
        ("trunc", "535649", "png", 64, 128),
        ("badmagic", "DEADBEEF" + good[8:], "png", 64, 128),
        ("dimw", good, "png", 65, 128),
        ("dimh", good, "png", 64, 127),
        ("unkfmt", good, "tiff", 64, 128),
        ("nullfmt", good, None, 64, 128),
        # NULL metadata dims: magic tier only — not a header inconsistency
        ("nulldims", good, "png", None, None),
    ]
    df = _hdr_df(spark, rows)
    issue = header_issue_expr(
        F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h"), {"png": SVI0_SPEC}
    )
    got = {r["image_id"]: r["i"] for r in df.select("image_id", issue.alias("i")).collect()}
    assert got == {
        "ok": None,
        "nullp": "null_payload",
        "trunc": "truncated",
        "badmagic": "magic_mismatch",
        "dimw": "dim_mismatch",
        "dimh": "dim_mismatch",
        "unkfmt": "unknown_format",
        "nullfmt": "unknown_format",
        "nulldims": None,
    }


def test_header_real_png_spec_parses_ihdr_dims(spark):
    """A real 1×1 PNG header: signature + IHDR length/type + w=1,h=1 at the
    documented offsets — REAL_SPECS['png'] validates it with zero decode."""
    from spark_validate.image.header import REAL_SPECS, header_issue_expr

    png = "89504E470D0A1A0A" + "0000000D" + "49484452" + "00000001" + "00000001" + "08060000"
    rows = [("good", png, "png", 1, 1), ("wrongw", png, "png", 2, 1)]
    df = _hdr_df(spark, rows)
    issue = header_issue_expr(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h"), REAL_SPECS)
    got = {r["image_id"]: r["i"] for r in df.select("image_id", issue.alias("i")).collect()}
    assert got == {"good": None, "wrongw": "dim_mismatch"}


def test_header_webp_also_signature(spark):
    from spark_validate.image.header import REAL_SPECS, header_issue_expr

    riff_webp = "52494646" + "24000000" + "57454250" + "56503820"
    riff_wave = "52494646" + "24000000" + "57415645" + "666D7420"  # RIFF but WAVE
    df = _hdr_df(spark, [("w1", riff_webp, "webp", 10, 10), ("w2", riff_wave, "webp", 10, 10)])
    issue = header_issue_expr(F.col("bytes"), F.col("fmt"), None, None, REAL_SPECS)
    got = {r["image_id"]: r["i"] for r in df.select("image_id", issue.alias("i")).collect()}
    assert got == {"w1": None, "w2": "magic_mismatch"}


def test_payload_header_check_counts_planted_corruption(spark):
    """Synth table with planted corrupt magic + dim mismatches: the chunked
    rate matches an independent recount of the planting flags, violations
    carry the right kinds, and a clean table is all-zero, no alerts."""
    from spark_validate.image.header import PayloadHeaderCheck

    n = 3000
    dirty = synth_image_table(
        spark, n, n_partitions=4, dup_rate=0.0, orphan_rate=0.0,
        corrupt_magic_rate=0.05, dim_mismatch_rate=0.05, seed=7,
    ).cache()
    chk = PayloadHeaderCheck(chunker=PartitionChunker())
    res = chk.calculate(dirty).toPandas()
    viol = chk.violations(dirty).toPandas()

    # independent recount straight from the synth planting rule (seed+12/13);
    # magic corruption wins over dim mismatch because magic is checked first
    rid = F.col("row_id")
    base = spark.range(0, n, 1, 4).withColumnRenamed("id", "row_id")
    magic_f = F.pmod(F.xxhash64(rid, F.lit(7 + 12)), F.lit(1_000_000)) < F.lit(50_000)
    dim_f = F.pmod(F.xxhash64(rid, F.lit(7 + 13)), F.lit(1_000_000)) < F.lit(50_000)
    planted = base.select(
        F.sum(magic_f.cast("int")).alias("magic"),
        F.sum((dim_f & ~magic_f).cast("int")).alias("dim"),
    ).first()

    assert int(viol[viol.violation_kind == "magic_mismatch"].shape[0]) == planted["magic"]
    assert int(viol[viol.violation_kind == "dim_mismatch"].shape[0]) == planted["dim"]
    assert float(res["value"].sum()) > 0
    assert bool(res["alert"].any())

    clean = synth_image_table(spark, 500, n_partitions=2, dup_rate=0.0, orphan_rate=0.0, seed=7)
    res_clean = PayloadHeaderCheck(chunker=PartitionChunker()).calculate(clean).toPandas()
    assert float(res_clean["value"].sum()) == 0.0
    assert not bool(res_clean["alert"].any())
    dirty.unpersist()


def test_suite_caption_quality_alerts_on_degraded_captions(spark):
    """Caption-side validation: a batch with planted empty captions drops
    avg quality_score / char_count below the reference-fitted 3σ band and
    alerts; a same-distribution batch stays silent."""
    from spark_validate.suite import ImageValidationSuite

    ref = synth_image_table(spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0, seed=3)
    bad = synth_image_table(
        spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0, seed=4,
        empty_caption_rate=0.25,
    )
    suite = ImageValidationSuite(include_payload_checks=False)
    res = suite.run(ref, bad)["caption_quality"].toPandas()
    degraded = res[(res.method == "avg") & (res.column_name == "char_count")]
    assert bool(degraded["alert"].any())

    ok = synth_image_table(spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0, seed=5)
    res_ok = suite.run(ref, ok)["caption_quality"].toPandas()
    assert not bool(
        res_ok[(res_ok.method == "avg") & (res_ok.column_name == "char_count")]["alert"].any()
    )


# --- phash decontamination (image/phash.py::phash_contamination) -------------


def test_phash_contamination_exact_vs_bruteforce(spark):
    """The banded corpus-vs-benchmark probe returns EXACTLY the brute-force
    match set (pigeonhole recall 1) on random 64-bit hashes with planted
    near-copies at hamming 0..4, at both block settings."""
    import numpy as np
    import pandas as pd

    from spark_validate.image.phash import phash_contamination

    rng = np.random.default_rng(31)
    corpus = rng.integers(-(2**62), 2**62, 600, dtype=np.int64)
    bench = rng.integers(-(2**62), 2**62, 30, dtype=np.int64)
    # plant corpus rows near benchmark hashes at distances 0..4
    for k in range(10):
        flips = 0
        h = int(bench[k % len(bench)])
        for b in range(k % 5):
            h ^= 1 << (7 * b + 3)
            flips += 1
        corpus[50 + k] = h
    cdf = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"c{i}" for i in range(len(corpus))], "phash": corpus})
    )
    bdf = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"b{i}" for i in range(len(bench))], "phash": bench})
    )
    expected = {
        (f"c{i}", f"b{j}", int(bin(int(np.uint64(corpus[i]) ^ np.uint64(bench[j]))).count("1")))
        for i in range(len(corpus))
        for j in range(len(bench))
        if bin(int(np.uint64(corpus[i]) ^ np.uint64(bench[j]))).count("1") <= 4
    }
    assert len(expected) >= 10
    for n_blocks in (5, 8):
        got = {
            (r.image_id, r.bench_id, r.hamming)
            for r in phash_contamination(cdf, bdf, max_hamming=4, n_blocks=n_blocks).collect()
        }
        assert got == expected, n_blocks


def test_phash_decontamination_check_rates_and_violations(spark):
    import numpy as np
    import pandas as pd

    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.image.phash import PhashDecontaminationCheck

    rng = np.random.default_rng(7)
    corpus = rng.integers(-(2**62), 2**62, 400, dtype=np.int64)
    bench = rng.integers(-(2**62), 2**62, 10, dtype=np.int64)
    corpus[5] = bench[0]            # exact leak
    corpus[250] = bench[1] ^ (1 << 9)  # 1-bit leak
    cdf = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": [f"c{i:04d}" for i in range(len(corpus))], "phash": corpus}
        )
    )
    bdf = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"b{i}" for i in range(len(bench))], "phash": bench})
    )
    chk = PhashDecontaminationCheck(
        bdf, chunker=SizeBasedChunker(chunk_size=200, order_by=["image_id"])
    )
    res = chk.calculate(cdf).toPandas().sort_values("chunk_key").reset_index(drop=True)
    assert len(res) == 2
    assert res["value"].tolist() == [1 / 200, 1 / 200]
    assert bool(res["alert"].all())
    v = chk.violations(cdf).toPandas()
    assert set(v["row_id"]) == {"c0005", "c0250"}
    assert set(v["violation_kind"]) == {"benchmark_near_match"}
    assert sorted(v["observed_value"]) == ["b0@h=0", "b1@h=1"]


def test_suite_caption_pii_flags_planted_spans(spark):
    """Caption PII scrubbing inside the image suite: planted email spans in
    the analysis batch alert (any PII caption trips the upper=0 bound);
    the clean synthetic captions stay silent."""
    from pyspark.sql import functions as F

    from spark_validate.suite import ImageValidationSuite

    ref = synth_image_table(spark, 1000, n_partitions=2, dup_rate=0.0, orphan_rate=0.0, seed=3)
    ana = synth_image_table(spark, 1000, n_partitions=2, dup_rate=0.0, orphan_rate=0.0, seed=4)
    leaky = ana.withColumn(
        "caption",
        F.when(
            F.xxhash64("image_id") % 50 == 0,
            F.concat(F.col("caption"), F.lit(" contact admin@leak.example")),
        ).otherwise(F.col("caption")),
    )
    suite = ImageValidationSuite(include_payload_checks=False)
    res = suite.run(ref, leaky)["caption_pii"].toPandas()
    email = res[res.method == "pii_email_rate"]
    assert float(email["value"].sum()) > 0 and bool(email["alert"].any())

    res_clean = suite.run(ref, ana)["caption_pii"].toPandas()
    assert float(res_clean["value"].sum()) == 0.0
    assert not bool(res_clean["alert"].any())


def test_image_suite_profile_checks(spark):
    """Suite integration: z-score w/h row gates + HLL++ cardinality ride the
    suite; a corrupt-dims flood alerts through the z-score check."""
    from pyspark.sql import functions as F
    from spark_validate.suite import ImageValidationSuite

    ref = synth_image_table(spark, 400, n_partitions=4, dup_rate=0.0, orphan_rate=0.0)
    ana = ref.withColumn(
        "w", F.when(F.col("image_id").substr(-2, 2) == "00", F.lit(999999)).otherwise(F.col("w"))
    )
    suite = ImageValidationSuite(include_payload_checks=False)
    out = suite.run(ref, ana)
    zs = out["zscore_outliers"].toPandas()
    assert set(zs["method"]) == {"zscore_outlier_rate"}
    assert (zs[zs.column_name == "w"]["value"] > 0).any()  # flood detected
    card = out["cardinality"].toPandas()
    ratios = card[(card.column_name == "image_id") & (card.method == "approx_distinct_ratio")]
    assert (ratios["value"] > 0.9).all()  # ids unique per chunk (HLL tolerance)


# ---- PSI on phash-derived histograms (width_bucket binning) -----------------


def _phash_frame(spark, n, concentrate_tail=False):
    """Deterministic frame: phash spreads over the fold domain via a bit-mix;
    when ``concentrate_tail`` the last third of ids collapses into a narrow
    band (a drifted corpus whose images suddenly share structure)."""
    df = spark.range(n).select(
        F.col("id").cast("string").alias("image_id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(1 << 40)).alias("phash"),
        F.col("id").alias("ord"),
    )
    if concentrate_tail:
        df = df.withColumn(
            "phash",
            F.when(F.col("ord") >= 2 * n // 3, F.pmod(F.col("phash"), F.lit(128)))
            .otherwise(F.col("phash")),
        )
    return df


def test_phash_histogram_drift_psi(spark):
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.image.phash import PhashHistogramDrift

    n = 3000
    ref = _phash_frame(spark, n)
    ana = _phash_frame(spark, n, concentrate_tail=True)
    chunker = SizeBasedChunker(chunk_size=n // 3, order_by=["ord"])
    chk = PhashHistogramDrift(chunker=chunker).fit(ref)
    res = chk.calculate(ana).toPandas().sort_values("chunk_key").reset_index(drop=True)
    assert set(res["method"]) == {"psi_width_bucket"}
    vals = res.set_index("chunk_key")["value"]
    # first two chunks draw from the reference distribution: PSI ~ 0
    assert (vals.iloc[:2] < 0.05).all()
    # concentrated tail chunk: PSI blows through the 0.2 alert line
    assert vals.iloc[2] > 0.5
    alerts = res.set_index("chunk_key")["alert"]
    assert not alerts.iloc[0] and not alerts.iloc[1] and alerts.iloc[2]


def test_phash_histogram_drift_fused_matches_standalone(spark):
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.fused import fused_calculate, is_fusable
    from spark_validate.image.phash import PhashHistogramDrift

    n = 1200
    ref = _phash_frame(spark, n)
    ana = _phash_frame(spark, n, concentrate_tail=True)
    chunker = SizeBasedChunker(chunk_size=n // 3, order_by=["ord"])
    chk = PhashHistogramDrift(chunker=chunker).fit(ref)
    assert is_fusable(chk)
    standalone = chk.calculate(ana).toPandas().sort_values("chunk_key").reset_index(drop=True)
    fused, wide = fused_calculate({"pd": chk}, ana, chunker)
    got = fused["pd"].toPandas().sort_values("chunk_key").reset_index(drop=True)
    wide.unpersist()
    assert list(got["value"].round(12)) == list(standalone["value"].round(12))
    assert list(got["alert"]) == list(standalone["alert"])


def test_phash_histogram_drift_state_roundtrip(spark):
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.image.phash import PhashHistogramDrift

    n = 900
    ref = _phash_frame(spark, n)
    ana = _phash_frame(spark, n, concentrate_tail=True)
    chunker = SizeBasedChunker(chunk_size=n // 3, order_by=["ord"])
    fitted = PhashHistogramDrift(chunker=chunker).fit(ref)
    clone = PhashHistogramDrift(chunker=chunker).set_state(fitted.get_state())
    a = fitted.calculate(ana).toPandas().sort_values("chunk_key")["value"].tolist()
    b = clone.calculate(ana).toPandas().sort_values("chunk_key")["value"].tolist()
    assert a == b


def test_phash_histogram_out_of_range_mass_counts(spark):
    """Analysis values outside the fitted [lo, hi) land in width_bucket's
    overflow bins (0 / n_bins+1) and register as drift, not silence."""
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.image.phash import PhashHistogramDrift

    # reference occupies only the middle of the fold domain
    ref = spark.range(1000).select(
        F.col("id").cast("string").alias("image_id"),
        (F.lit(1000) + F.pmod(F.xxhash64("id"), F.lit(2000))).alias("phash"),
        F.col("id").alias("ord"),
    )
    # analysis sits entirely below the reference range
    ana = spark.range(1000).select(
        F.col("id").cast("string").alias("image_id"),
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("phash"),
        F.col("id").alias("ord"),
    )
    chk = PhashHistogramDrift(chunker=SizeBasedChunker(chunk_size=500, order_by=["ord"])).fit(ref)
    res = chk.calculate(ana).toPandas()
    assert (res["value"] > 1.0).all()
    assert res["alert"].all()


def test_caption_consistency_conflicts_and_nulls(spark):
    """Groups with >1 distinct non-null caption conflict; NULL captions do
    not count as distinct but their rows still count toward group size."""
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.image import CaptionConsistencyCheck

    rows = [
        # group 1: consistent (two copies, same caption + one NULL) → clean
        (0, 1, "a cat"), (1, 1, "a cat"), (2, 1, None),
        # group 2: conflict (two distinct captions)
        (3, 2, "a dog"), (4, 2, "two dogs"),
        # group 3: single row → clean
        (5, 3, "a bird"),
        # NULL group: ignored even though captions differ
        (6, None, "x"), (7, None, "y"),
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")
    chk = CaptionConsistencyCheck(
        group_col="phash", caption_col="caption",
        chunker=SizeBasedChunker(chunk_size=4, order_by=["image_id"]),
    )
    conf = chk.conflicts(df).toPandas()
    assert conf["phash"].tolist() == [2]
    assert conf.loc[0, "caption_a"] == "a dog" and conf.loc[0, "caption_b"] == "two dogs"
    assert int(conf.loc[0, "n_rows"]) == 2 and int(conf.loc[0, "n_captions"]) == 2

    res = chk.calculate(df).toPandas().sort_values("chunk_key").reset_index(drop=True)
    # chunk [0:3] holds one conflicted row (id 3), chunk [4:7] one (id 4)
    assert res["value"].tolist() == [0.25, 0.25]
    assert res["alert"].all()

    v = chk.violations(df, row_id="image_id").toPandas()
    assert sorted(v["row_id"].astype(int).tolist()) == [3, 4]
    assert (v["observed_value"] == "a dog <> two dogs").all()


def test_caption_consistency_runner_kind(spark, tmp_path):
    """Config-driven caption_consistency check writes per-chunk rates and
    conflict violations through the suite runner."""
    import pandas as pd

    from spark_validate.runner import run_suite

    n = 120
    pdf = pd.DataFrame({
        "image_id": range(n),
        "phash": [i % 10 for i in range(n)],
        "caption": [
            f"variant-{i}" if i % 17 == 0 else f"caption-{i % 10}" for i in range(n)
        ],
        "ord": range(n),
    })
    src = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    cfg = {
        "run_id": "capcon",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": src,
        "analysis": src,
        "chunking": {"chunk_size": 40, "order_by": ["ord"]},
        "row_id": "image_id",
        "checks": [
            {
                "type": "caption_consistency",
                "group_column": "phash",
                "caption_column": "caption",
            }
        ],
    }
    report = run_suite(spark, cfg)
    assert any("caption" in k for k in report)
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    res = res[res["method"] == "caption_conflict_rate"]
    assert len(res) == 3 and (res["value"] > 0).all() and res["alert"].all()
    vio = spark.read.parquet(str(tmp_path / "out" / "violations")).toPandas()
    vio = vio[vio["check"].str.startswith("caption_consistency")]
    # every conflicted group's rows are emitted (runner calls violations
    # without row_id, so row_id carries the group key): groups hit by i%17==0
    flagged_groups = {i % 10 for i in range(n) if i % 17 == 0}
    assert set(vio["row_id"].astype(int)) == flagged_groups
    assert len(vio) == 12 * len(flagged_groups)  # all 12 rows of each group


def test_caption_spam_spread_boundary_and_nulls(spark):
    """A caption is spam iff it spans > max_groups DISTINCT non-null
    groups: exactly-at-boundary stays clean, repeats within one group stay
    clean, NULL captions are ignored, NULL-group rows count toward n_rows
    but never toward the spread."""
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.image import CaptionSpamCheck

    rows = [
        # 'tmpl': 3 distinct groups + one NULL-group row → spam at max_groups=2
        (0, 10, "tmpl"), (1, 11, "tmpl"), (2, 12, "tmpl"), (3, None, "tmpl"),
        # 'twice': 2 groups — exactly at the boundary → clean
        (4, 20, "twice"), (5, 21, "twice"),
        # 'same': repeated 3× within ONE group → clean (dedup's job, not spam)
        (6, 30, "same"), (7, 30, "same"), (8, 30, "same"),
        # NULL captions never vote, whatever their spread
        (9, 40, None), (10, 41, None), (11, 42, None),
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")
    chk = CaptionSpamCheck(
        group_col="phash", caption_col="caption", max_groups=2,
        chunker=SizeBasedChunker(chunk_size=6, order_by=["image_id"]),
    )
    spam = chk.spam_captions(df).toPandas()
    assert spam["caption"].tolist() == ["tmpl"]
    assert int(spam.loc[0, "n_groups"]) == 3
    assert int(spam.loc[0, "n_rows"]) == 4  # NULL-group row counts as a row
    assert int(spam.loc[0, "group_a"]) == 10 and int(spam.loc[0, "group_b"]) == 12

    res = chk.calculate(df).toPandas().sort_values("chunk_key").reset_index(drop=True)
    # chunk [0:5] holds the 4 tmpl rows of 6; chunk [6:11] none
    assert res["value"].tolist() == [4 / 6, 0.0]
    assert res["alert"].tolist() == [True, False]

    v = chk.violations(df, row_id="image_id").toPandas()
    assert sorted(v["row_id"].astype(int).tolist()) == [0, 1, 2, 3]
    assert (v["observed_value"] == "groups=3 span=10..12").all()


def test_caption_spam_runner_kind(spark, tmp_path):
    """Config-driven caption_spam check writes per-chunk rates and spam
    violations through the suite runner."""
    import pandas as pd

    from spark_validate.runner import run_suite

    n = 120
    pdf = pd.DataFrame({
        "image_id": range(n),
        "phash": range(n),  # every image distinct
        "caption": [
            "STOCK TEMPLATE" if i % 5 == 0 else f"caption-{i}" for i in range(n)
        ],
        "ord": range(n),
    })
    src = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    cfg = {
        "run_id": "capspam",
        "output_dir": str(tmp_path / "out"),
        "store_dir": str(tmp_path / "store"),
        "reference": src,
        "analysis": src,
        "chunking": {"chunk_size": 40, "order_by": ["ord"]},
        "row_id": "image_id",
        "checks": [
            {
                "type": "caption_spam",
                "group_column": "phash",
                "caption_column": "caption",
                "max_groups": 3,
            }
        ],
    }
    report = run_suite(spark, cfg)
    assert any("caption_spam" in k for k in report)
    res = spark.read.parquet(str(tmp_path / "out" / "results")).toPandas()
    res = res[res["method"] == "caption_spam_rate"]
    assert len(res) == 3 and (res["value"] == 8 / 40).all() and res["alert"].all()
    vio = spark.read.parquet(str(tmp_path / "out" / "violations")).toPandas()
    vio = vio[vio["check"].str.startswith("caption_spam")]
    assert len(vio) == 24  # every 5th of 120 rows carries the template


def test_caption_election_majority_tiebreak_nulls(spark):
    """Most frequent non-null caption wins; exact ties break to the
    lexicographically smallest; NULL captions don't vote; all-NULL groups
    are absent from the election."""
    from spark_validate.image import elect_canonical_captions

    rows = [
        # group 1: majority "cat" (2 vs 1), a NULL that must not vote
        (0, 1, "dog"), (1, 1, "cat"), (2, 1, "cat"), (3, 1, None),
        # group 2: exact tie "apple" vs "zebra" → "apple" (lexicographic)
        (4, 2, "zebra"), (5, 2, "apple"),
        # group 3: only NULL captions → no elected row
        (6, 3, None), (7, 3, None),
        # NULL group ignored
        (8, None, "x"),
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")
    el = elect_canonical_captions(df).toPandas().sort_values("phash").reset_index(drop=True)
    assert el["phash"].tolist() == [1, 2]
    assert el["canonical_caption"].tolist() == ["cat", "apple"]
    assert el["support"].tolist() == [2, 1]
    assert el["n_rows"].tolist() == [3, 2]
    assert el["n_captions"].tolist() == [2, 2]


def test_apply_canonical_captions_rewrite_flags(spark):
    from spark_validate.image import apply_canonical_captions

    rows = [
        (0, 1, "dog"), (1, 1, "cat"), (2, 1, "cat"), (3, 1, None),
        (4, None, "keep-me"),
        (5, 3, None),  # group with no non-null caption: original kept
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, caption string")
    out = (
        apply_canonical_captions(df)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert out["caption"].tolist() == ["cat", "cat", "cat", "cat", "keep-me", None]
    # replaced: the dissenting row 0 and the NULL-caption row 3 of group 1
    assert out["caption_replaced"].tolist() == [True, False, False, True, False, False]
    assert set(out.columns) == {"image_id", "phash", "caption", "caption_replaced"}


def test_image_suite_consistency_and_joint_drift_keys(spark):
    """The north-rule suite now carries the cross-modal consistency check
    and the joint (w,h) drift: planted caption conflicts on shared phashes
    alert, a clean same-distribution batch stays silent on both."""
    from pyspark.sql import functions as F

    from spark_validate.suite import ImageValidationSuite

    ref = synth_image_table(spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0, seed=11)
    clean = synth_image_table(spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0, seed=12)
    suite = ImageValidationSuite(include_payload_checks=False)

    out_clean = suite.run(ref, clean)
    cc = out_clean["caption_consistency"].toPandas()
    jd = out_clean["joint_drift_wh"].toPandas()
    assert (cc["value"] == 0).all() and not cc["alert"].any()
    assert jd["method"].eq("joint_jensen_shannon").all()
    assert not jd["alert"].any()  # same size-mix recipe → joint stays put

    # conflicted batch: re-caption a slice of rows under their same phash
    conflicted = clean.withColumn(
        "caption",
        F.when(
            F.pmod(F.xxhash64("image_id"), F.lit(7)) == 0,
            F.concat(F.lit("CONFLICT-"), F.col("image_id")),
        ).otherwise(F.col("caption")),
    )
    dup_rows = conflicted.filter(F.pmod(F.xxhash64("image_id"), F.lit(7)) == 0).withColumn(
        "image_id", F.concat(F.col("image_id"), F.lit("_b"))
    ).withColumn("caption", F.concat(F.lit("OTHER-"), F.col("image_id")))
    out_bad = suite.run(ref, conflicted.unionByName(dup_rows))
    cc_bad = out_bad["caption_consistency"].toPandas()
    assert (cc_bad["value"] > 0).any() and cc_bad["alert"].any()


def test_suite_correlation_drift_wh(spark):
    """The w↔h correlation check rides the image suite: independent w/h in
    both periods stays quiet; an analysis batch that squares its images
    (h := w) flips the pair correlation to 1 and alerts every chunk."""
    from pyspark.sql import functions as F

    from spark_validate.suite import ImageValidationSuite

    ref = synth_image_table(spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0, seed=31)
    ana = synth_image_table(spark, 2000, n_partitions=4, dup_rate=0.0, orphan_rate=0.0, seed=32)
    suite = ImageValidationSuite(include_payload_checks=False)
    res = suite.run(ref, ana)["correlation_drift_wh"].toPandas()
    shift = res[res.method == "corr_shift"]
    assert len(shift) == 4 and not shift["alert"].any()
    assert (shift["value"] < 0.25).all()

    squared = ana.withColumn("h", F.col("w"))
    res2 = suite.run(ref, squared)["correlation_drift_wh"].toPandas()
    shift2 = res2[res2.method == "corr_shift"]
    assert shift2["alert"].all() and (shift2["value"] > 0.75).all()


def _svi0_payload(w, h, body: bytes) -> bytes:
    return b"SVI0" + int(w).to_bytes(4, "big") + int(h).to_bytes(4, "big") + body


def _payload_frame(spark, n, w, h, id_offset=0, ts_base=None):
    import pandas as pd

    rows = []
    for i in range(n):
        body = bytes([(i * 37 + j * 11) % 251 for j in range(64)])
        rows.append({
            "image_id": f"img{(i + id_offset):06d}",
            "bytes": _svi0_payload(w, h, body),
            "w": w,
            "h": h,
        })
    pdf = pd.DataFrame(rows)
    if ts_base is not None:
        pdf["ts"] = pd.Timestamp(ts_base) + pd.to_timedelta(
            [i * 3600 // max(n, 1) for i in range(n)], unit="s"
        )
    return spark.createDataFrame(pdf)


def test_payload_drift_detects_pixel_stat_shift(spark):
    """Drift over DECODED stats: identical payload population scores ~0;
    a dimension collapse (64×64 → 3×3 tiles) explodes the per-image
    px_mean/px_std variance and the fitted JS flags it — a shift header
    metadata drift on w/h would ALSO see, but here the payload is the
    ground truth (re-encodes and sensor shifts move pixels first)."""
    from spark_validate.chunking import SizeBasedChunker
    from spark_validate.image.payload import PayloadDriftCheck

    ref = _payload_frame(spark, 300, 64, 64)
    same = _payload_frame(spark, 300, 64, 64)  # identical population
    tiny = _payload_frame(spark, 300, 3, 3)    # 9-px tiles: wild stat variance

    chk = PayloadDriftCheck(
        chunker=SizeBasedChunker(chunk_size=150, order_by=["image_id"])
    ).fit(ref)
    res_same = chk.calculate(same).toPandas()
    assert (res_same["value"] < 0.05).all()
    res_tiny = chk.calculate(tiny).toPandas()
    assert set(res_tiny["column_name"]) == {"px_mean", "px_std"}
    assert (res_tiny["value"] > 0.5).all()
    assert res_tiny["alert"].all()
    # chronological chunk_index survives the decode: the carried ROW_INDEX
    # orders headers by start index, not by lexical key ('[100:…]' would
    # otherwise sort before '[25:…]')
    fine = PayloadDriftCheck(
        chunker=SizeBasedChunker(chunk_size=25, order_by=["image_id"])
    ).fit(ref)
    order = (
        fine.calculate(same)
        .select("chunk_key", "chunk_index")
        .distinct()
        .toPandas()
        .sort_values("chunk_index")
    )
    starts = order["chunk_key"].str.extract(r"\[(\d+):")[0].astype(int).tolist()
    assert starts == sorted(starts)
    fine.release_cache()
    # state roundtrip reproduces scores exactly
    chk2 = PayloadDriftCheck(
        chunker=SizeBasedChunker(chunk_size=150, order_by=["image_id"])
    )
    chk2.set_state(chk.get_state())
    import pandas as pd

    pd.testing.assert_frame_equal(
        res_tiny.sort_values(["chunk_key", "column_name"]).reset_index(drop=True),
        chk2.calculate(tiny).toPandas().sort_values(["chunk_key", "column_name"]).reset_index(drop=True),
    )
    chk.release_cache()
    chk2.release_cache()


def test_streaming_payload_drift_matches_batch(spark, tmp_path):
    """The streaming compile (decode per micro-batch, watermark AFTER the
    mapInPandas re-projection, fitted calculator through the windowed path)
    emits per-window JS equal to the batch period-chunker path."""
    import numpy as np
    import pandas as pd

    from spark_validate.chunking import PeriodBasedChunker
    from spark_validate.image.payload import PayloadDriftCheck
    from spark_validate.streaming import streaming_payload_drift

    ref = _payload_frame(spark, 200, 64, 64, ts_base="2024-06-03 00:00:00")
    # analysis: clean hour then a tiny-dims hour
    a1 = _payload_frame(spark, 120, 64, 64, id_offset=1000, ts_base="2024-06-03 01:00:00")
    a2 = _payload_frame(spark, 120, 3, 3, id_offset=2000, ts_base="2024-06-03 02:00:00")
    ana = a1.unionByName(a2)

    chk = PayloadDriftCheck(
        chunker=PeriodBasedChunker(offset="H", timestamp_column="ts")
    ).fit(ref)
    batch = chk.calculate(ana).toPandas()

    src = str(tmp_path / "payload_stream")
    ana.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_payload_drift(stream, chk, "ts", window_duration="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sv_payload_drift")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    s = spark.sql("SELECT * FROM sv_payload_drift").toPandas()
    b = batch.copy()
    b["hour"] = b["chunk_key"].str.slice(0, 13)
    s["hour"] = pd.to_datetime(s["window_start"]).dt.strftime("%Y-%m-%d %H")
    joined = b.merge(s, on=["hour", "column_name", "method"], suffixes=("_b", "_s"))
    assert len(joined) == 4  # 2 hours × 2 stat columns
    np.testing.assert_allclose(joined["value_b"], joined["value_s"], rtol=1e-12)
    assert (joined["alert_b"].astype(bool) == joined["alert_s"].astype(bool)).all()
    # the tiny-dims hour alerts in both paths
    assert joined[joined["hour"] == "2024-06-03 02"]["alert_s"].astype(bool).all()
    chk.release_cache()


def test_decode_batch_bit_identical_to_rowwise():
    """The batched decode path (concatenated mix kernel, grouped stats,
    integer-exact PSNR) must reproduce the row-at-a-time reference
    algorithm bit-for-bit — including the numpy fallback when the compiled
    kernel is unavailable."""
    import hashlib
    import zlib

    import spark_validate.image.payload as P

    def mk(w, h, body, magic=b"SVI0"):
        return magic + w.to_bytes(4, "big") + h.to_bytes(4, "big") + body

    bufs = []
    for i in range(40):
        w, h = [(64, 64), (128, 128), (64, 128), (256, 512), (3, 3)][i % 5]
        body = hashlib.sha512(f"px-{i}".encode()).hexdigest().encode() * 4
        bufs.append(mk(w, h, body[: 200 + (i % 3)]))
    bufs += [None, b"short", mk(0, 0, b"x"), mk(64, 64, b""), b"DEADBEEF" + b"\0" * 64]

    def decode_rowwise(buf):  # the pre-batching algorithm, verbatim
        if buf is None or len(buf) < 12 or bytes(buf[:4]) != b"SVI0":
            return None
        b = bytes(buf)
        w = int.from_bytes(b[4:8], "big")
        h = int.from_bytes(b[8:12], "big")
        n_px = min(max(w * h, 1), P.MAX_FAKE_PIXELS)
        if len(b) == 12:
            return None
        crc = zlib.crc32(b)
        seed = (crc * 0x9E3779B97F4A7C15 ^ ((len(b) - 12) << 32)) & 0xFFFFFFFFFFFFFFFF
        rng = np.random.Generator(np.random.PCG64(seed))
        block = rng.integers(0, 2**32, (n_px + 3) // 4, dtype=np.uint32)
        for _ in range(P.DECODE_ROUNDS):
            block = block * np.uint32(2654435761) + np.uint32(0x9E3779B9)
            block ^= block >> np.uint32(13)
        return block.view(np.uint8)[:n_px]

    expected = [decode_rowwise(b) for b in bufs]

    saved = P._MIX_KERNEL
    try:
        for force_fallback in (False, True):
            P._MIX_KERNEL = False if force_fallback else saved
            got = P._decode_batch(bufs)
            for e, g in zip(expected, got):
                if e is None:
                    assert g is None
                else:
                    assert g is not None and np.array_equal(e, g)
            singles = [P._decode(b) for b in bufs]
            for e, g in zip(expected, singles):
                if e is None:
                    assert g is None
                else:
                    assert np.array_equal(e, g)
    finally:
        P._MIX_KERNEL = saved

    px = [e for e in expected if e is not None]
    ok, n_px, means, stds = P._pixel_stats_batch(px)
    assert means == [float(p.mean()) for p in px]
    assert stds == [float(p.std()) for p in px]
    psnrs = P._psnr_batch(px, px[::-1])
    assert psnrs == [P._psnr(a, b) for a, b in zip(px, px[::-1])]


def test_suggest_n_blocks_scales_with_corpus():
    """The Manku table count must grow with n (VERDICT r5 #4): minimal
    construction for small corpora, 7 blocks (35 tables) through the 1M-10M
    tiers, 8 (70) at 100M — every choice keeps exact recall."""
    from spark_validate.functions.hamming import suggest_n_blocks

    assert suggest_n_blocks(1_000) == 5
    assert suggest_n_blocks(100_000) == 6
    assert suggest_n_blocks(1_000_000) == 7
    assert suggest_n_blocks(10_000_000) == 7
    assert suggest_n_blocks(100_000_000) == 8
    assert suggest_n_blocks(1_000_000_000) == 9
    for n in (10_000, 1_000_000, 100_000_000):
        assert suggest_n_blocks(n) >= 5  # pigeonhole floor at h=4
