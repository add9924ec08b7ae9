"""Image-payload checks — Arrow-vectorized ``mapInPandas`` over binary columns.

Per BASELINE.json ``input_hint``: decode + pixel-stat constraints run ONLY in
vectorized pandas/Arrow UDFs (never per-row Python), with explicit
``repartitionByRange(image_id)`` before the decode pass and AQE skew handling
for oversized ``bytes``. Per-row equivalence vs a reference copy is
decoded-pixel allclose at PSNR ≥ 40 dB (lossy) + exact caption equality.

Real image codecs (PIL/libjpeg) are NOT in this container. ``_decode``
dispatches: if PIL is importable it decodes real images; otherwise it decodes
the deterministic fake 'SVI0' codec from ``synth.py`` (4-byte magic + w + h +
sha-seeded pixel bytes). The Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is identical either way, which is the part
that has to be right at 10^12 rows.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real codec path (absent in this container)
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


# Fake-codec shape: pixels per image (16K ≈ a 128×128 tile) and compute
# rounds. Real decoders (Huffman + IDCT) are COMPUTE-dense — tens of ops per
# output byte over cache-resident blocks — so the stub does K vectorized
# mixing rounds over a small in-cache buffer rather than streaming megabytes
# of PRNG output (which would benchmark DRAM bandwidth, not decode compute).
MAX_FAKE_PIXELS = 16_384
DECODE_ROUNDS = 40


def _decode(buf: Optional[bytes]) -> Optional[np.ndarray]:
    """Decode a payload to a uint8 pixel array.

    Fake 'SVI0' codec: 4B magic + 4B w + 4B h header; pixels derive
    deterministically from the BODY CONTENT (CRC seed → PCG64 fill → K
    mixing rounds) — duplicate payloads decode identically, any body byte
    flip changes every pixel (PSNR collapses), and the per-image CPU cost is
    representative of a real codec. Real codecs via PIL when present.
    """
    if buf is None or len(buf) < 12:
        return None
    if bytes(buf[:4]) == b"SVI0":
        b = bytes(buf)
        w = int.from_bytes(b[4:8], "big")
        h = int.from_bytes(b[8:12], "big")
        n_px = min(max(w * h, 1), MAX_FAKE_PIXELS)
        body = np.frombuffer(b, dtype=np.uint8, offset=12)
        if len(body) == 0:
            return None
        # seed from a full-content CRC (C-speed) — ANY body byte flip reseeds
        import zlib

        crc = zlib.crc32(b)
        seed = (crc * 0x9E3779B97F4A7C15 ^ (len(body) << 32)) & 0xFFFFFFFFFFFFFFFF
        rng = np.random.Generator(np.random.PCG64(seed))
        # pad to a word multiple so the uint32 mixing view lines up
        n_words = (n_px + 3) // 4
        block = rng.integers(0, 2**32, n_words, dtype=np.uint32)
        for _ in range(DECODE_ROUNDS):  # in-cache compute, IDCT-ish cost
            block = block * np.uint32(2654435761) + np.uint32(0x9E3779B9)
            block ^= block >> np.uint32(13)
        return block.view(np.uint8)[:n_px]
    if _HAS_PIL:  # pragma: no cover - not available in this container
        import io

        from PIL import Image

        try:
            return np.asarray(Image.open(io.BytesIO(bytes(buf)))).ravel()
        except Exception:  # corrupt real image: a finding, not a crash
            return None
    # Unknown magic without a real codec → decode failure (decode_ok=False).
    # A VALIDATOR must classify corrupt payloads, not die on the first
    # bit-rotten blob of 10^12 (one NotImplementedError in a task kills the
    # whole job). A PIL-less run over real images reports decode rate 0 —
    # loud and immediately diagnosable; transforms (whose OUTPUT needs the
    # codec) keep their explicit NotImplementedError gate.
    return None


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    if a is None or b is None:
        return float("nan")
    n = min(len(a), len(b))
    if n == 0:
        return float("nan")
    mse = float(np.mean((a[:n].astype(np.float64) - b[:n].astype(np.float64)) ** 2))
    if mse == 0 and len(a) == len(b):
        return float("inf")
    if mse == 0:
        return 0.0  # equal prefix but different length → not equivalent
    return 10.0 * math.log10(255.0**2 / mse)


def decode_pixel_stats(
    df: DataFrame, partitions: Optional[int] = None, carry: Sequence[str] = ()
) -> DataFrame:
    """Per-image decoded pixel statistics.

    ``repartitionByRange(image_id)`` spreads oversized payloads across tasks
    (north rule); everything else is an Arrow-batched iterator — no per-row
    Python calls cross the JVM boundary. ``carry`` names extra input columns
    to pass through unchanged (a chunk key, an event timestamp) so
    downstream chunked/windowed consumers keep their identity columns
    without re-joining the raw table.
    """
    n_parts = partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # repartitionByRange samples the input to pick bounds — impossible on a
    # stream; hash repartition spreads oversized payloads just as well there
    # (range order only matters for the batch suite's storage locality)
    spread = (
        df.repartition(n_parts, "image_id")
        if df.isStreaming
        else df.repartitionByRange(n_parts, "image_id")
    )
    carry = [c for c in carry if c not in ("image_id", "bytes", "w", "h")]
    src = spread.select("image_id", "bytes", "w", "h", *carry)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [_decode(b) for b in pdf["bytes"]]
            out = pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "decode_ok": [p is not None for p in px],
                    "n_px_bytes": [len(p) if p is not None else 0 for p in px],
                    "px_mean": [float(p.mean()) if p is not None and len(p) else float("nan") for p in px],
                    "px_std": [float(p.std()) if p is not None and len(p) else float("nan") for p in px],
                }
            )
            for c in carry:
                out[c] = pdf[c].values
            yield out

    dtypes = dict(df.dtypes)
    schema = "image_id string, decode_ok boolean, n_px_bytes long, px_mean double, px_std double"
    for c in carry:
        schema += f", {c} {dtypes[c]}"
    return src.mapInPandas(op, schema)


def payload_checks(
    analysis: DataFrame,
    reference: DataFrame,
    psnr_db_min: float = 40.0,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Fused payload pass: pixel stats AND PSNR-vs-reference equivalence in
    ONE Arrow stage.

    Running :func:`decode_pixel_stats` and :func:`psnr_check` separately
    decodes every analysis payload twice (3 decodes per image incl. the
    reference side); this fusion decodes each side exactly once — a 33%
    decode-CPU cut on the dominant suite stage. LEFT join: images missing
    from the reference still get pixel stats, with NULL psnr/passes (they are
    the referential check's finding, not an equivalence failure).
    """
    n_parts = partitions or int(analysis.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = analysis.select(
        "image_id", F.col("bytes").alias("bytes_a"), F.col("caption").alias("caption_a")
    )
    r = reference.select(
        "image_id", F.col("bytes").alias("bytes_r"), F.col("caption").alias("caption_r")
    )
    joined = a.join(r, "image_id", "left").repartitionByRange(n_parts, "image_id")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok, n_px, means, stds, psnrs, cap_eq, passes = [], [], [], [], [], [], []
            for ba, br, ca, cr in zip(pdf["bytes_a"], pdf["bytes_r"], pdf["caption_a"], pdf["caption_r"]):
                pa = _decode(ba)
                ok.append(pa is not None)
                n_px.append(len(pa) if pa is not None else 0)
                means.append(float(pa.mean()) if pa is not None and len(pa) else float("nan"))
                stds.append(float(pa.std()) if pa is not None and len(pa) else float("nan"))
                if br is None:
                    psnrs.append(None)
                    cap_eq.append(None)
                    passes.append(None)
                else:
                    p = _psnr(pa, _decode(br))
                    psnrs.append(p)
                    cap_eq.append(bool(ca == cr))
                    passes.append(bool(p >= psnr_db_min and ca == cr))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "decode_ok": ok,
                    "n_px_bytes": n_px,
                    "px_mean": means,
                    "px_std": stds,
                    "psnr_db": psnrs,
                    "caption_equal": cap_eq,
                    "passes": passes,
                }
            )

    schema = (
        "image_id string, decode_ok boolean, n_px_bytes long, px_mean double, "
        "px_std double, psnr_db double, caption_equal boolean, passes boolean"
    )
    return joined.mapInPandas(op, schema)


def psnr_check(
    analysis: DataFrame,
    reference: DataFrame,
    psnr_db_min: float = 40.0,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Per-row equivalence vs the reference copy: decoded-pixel PSNR ≥
    ``psnr_db_min`` plus EXACT caption equality (input_hint invariant).

    Join on image_id (sort-merge/AQE for big sides), then one Arrow pass
    decoding both payloads. Returns one row per joined image with
    ``psnr_db``, ``caption_equal``, ``passes``.
    """
    n_parts = partitions or int(analysis.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = analysis.select(
        "image_id", F.col("bytes").alias("bytes_a"), F.col("caption").alias("caption_a")
    )
    r = reference.select(
        "image_id", F.col("bytes").alias("bytes_r"), F.col("caption").alias("caption_r")
    )
    joined = a.join(r, "image_id", "inner").repartitionByRange(n_parts, "image_id")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            psnrs, cap_eq = [], []
            for ba, br, ca, cr in zip(pdf["bytes_a"], pdf["bytes_r"], pdf["caption_a"], pdf["caption_r"]):
                psnrs.append(_psnr(_decode(ba), _decode(br)))
                cap_eq.append(ca == cr)
            out = pd.DataFrame(
                {"image_id": pdf["image_id"], "psnr_db": psnrs, "caption_equal": cap_eq}
            )
            out["passes"] = (out["psnr_db"] >= psnr_db_min) & out["caption_equal"]
            yield out

    schema = "image_id string, psnr_db double, caption_equal boolean, passes boolean"
    return joined.mapInPandas(op, schema)


class PayloadDriftCheck:
    """Distribution drift over DECODED payload statistics — the payload
    sibling of the metadata drift checks. Header drift (w/h/fmt) can stay
    flat while the pixels change under it (a re-encode at lower quality, a
    watermark roll-out, a camera/sensor shift upstream): per-chunk drift of
    ``px_mean`` / ``px_std`` sees it.

    Composition, not a new engine: the chunker runs on the RAW table (its
    columns exist there), the Arrow decode CARRIES ``chunk_key`` through
    ``decode_pixel_stats(carry=...)``, and the unchanged
    ``UnivariateDriftCalculator`` consumes the stats frame under a
    :class:`~spark_validate.chunking.PreassignedChunker`. Decode-failed
    rows carry NaN stats → NaN→NULL semantics exclude them from every
    histogram (decode failures are the payload CONSTRAINT check's job).

    Scale: one decode pass per calculate (the stats frame is persisted
    during fit, where the inner calculator makes two passes — bin fitting +
    reference thresholds); at production scale the fitted state comes from
    the store (load-or-fit) so the recurring job pays exactly one decode of
    the analysis table. Streaming: the same decode runs statelessly per
    micro-batch and the fitted calculator compiles through the standard
    windowed drift path (carry the event-time column).
    """

    def __init__(
        self,
        stat_cols: Sequence[str] = ("px_mean", "px_std"),
        continuous_methods: Sequence[str] = ("jensen_shannon",),
        chunker=None,
        n_bins_doane: Optional[int] = None,
        threshold=None,
    ):
        from spark_validate.chunking import DefaultChunker

        self.stat_cols = list(stat_cols)
        self.chunker = chunker or DefaultChunker()
        self.continuous_methods = tuple(continuous_methods)
        self.n_bins_doane = n_bins_doane
        self.threshold = threshold
        self._inner = None

    def _stats(self, df: DataFrame) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY, ROW_INDEX

        assigned = self.chunker.assign(df)
        # carry the row index / timestamp too, so downstream headers keep
        # chronological chunk_index ordering and start/end metadata instead
        # of falling back to lexical key order
        carry = [CHUNK_KEY]
        if ROW_INDEX in assigned.columns:
            carry.append(ROW_INDEX)
        ts = getattr(self.chunker, "timestamp_column", None)
        if ts and ts in assigned.columns:
            carry.append(ts)
        return decode_pixel_stats(assigned, carry=carry)

    def _make_inner(self):
        from spark_validate.chunking import PreassignedChunker
        from spark_validate.drift.univariate import UnivariateDriftCalculator

        return UnivariateDriftCalculator(
            self.stat_cols,
            continuous_methods=self.continuous_methods,
            chunker=PreassignedChunker(
                timestamp_column=getattr(self.chunker, "timestamp_column", None)
            ),
            n_bins_doane=self.n_bins_doane,
            threshold=self.threshold,
            computation="estimated",  # raw-value exact path would hold decoded stats on the driver
        )

    def fit(self, reference: DataFrame) -> "PayloadDriftCheck":
        stats = self._stats(reference).persist()
        try:
            self._inner = self._make_inner()
            self._inner.fit(stats)
        finally:
            stats.unpersist(blocking=False)
        return self

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._inner is None:
            raise RuntimeError("fit first (or set_state)")
        return self._inner.calculate(self._stats(df), period=period)

    def release_cache(self) -> None:
        if self._inner is not None:
            self._inner.release_cache()

    def get_state(self) -> dict:
        if self._inner is None:
            raise RuntimeError("fit first")
        return {"version": 1, "inner": self._inner.get_state()}

    def set_state(self, state: dict) -> None:
        self._inner = self._make_inner()
        self._inner.set_state(state["inner"])
