"""Document deduplication at scale — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Beyond-reference operators for training-data pipelines (NannyML has no text
ops). All deterministic (hash-seeded, no RNG state), all DataFrame-native:

* exact       — md5 grouping; one shuffle on the digest.
* MinHash+LSH — shingle → 64 universal-hash minima (higher-order array
  functions, JVM-side) → band buckets → candidate pairs from bucket joins.
  Signature cost is O(rows × shingles); the pair join only ever sees
  same-bucket collisions, never the full cross product.
* SimHash     — 60-bit sign-aggregated md5 token hashes (Arrow-batched,
  token-cached numpy voting; no shuffle); near-dups = Hamming distance ≤ k
  among same-band candidates.
* n-gram Jaccard — exact verify step for candidate pairs via shingle-set
  intersection counts.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime M31. Both the base shingle hash and the universal-hash family
# h_i(x) = (a_i·x + b_i) mod M31 live in [0, 2^31): products stay inside int64
# under ANSI mode, and — critically — a_i·x + b_i wraps the modulus ~2^31
# times across the domain, so the map is a genuine pseudorandom permutation.
# (A larger modulus like 2^61-1 with x < 2^31 never wraps: a·x+b is then
# monotone in x, every "hash function" selects the same argmin element, and
# MinHash degenerates to comparing min(base) — agreement j instead of
# per-function independence.)
_M31 = (1 << 31) - 1
_P = _M31  # modulus of the universal-hash family
_H32 = _M31  # range of the base shingle hash


def _tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _shingles_of(toks, k: int):
    """Word k-shingles over an ALREADY-PROJECTED token array column.

    Callers should project the tokenizer into a column first and pass that
    column here: inlining the split/lower subtree into the four places this
    expression references its input made Catalyst optimization + codegen the
    dominant cost of every shingle plan (measured 3.5–6.4 s → ~1 s per
    action on the sf0.1 corpus, identical results)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def _shingles(text_col: str, k: int):
    """Word k-shingles as an array column (empty-safe)."""
    return _shingles_of(_tokens(text_col), k)


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_ids: int = 20
) -> DataFrame:
    """(fingerprint, dup_count, ids) for texts appearing more than once.

    ``dup_count`` is exact (map-side-combined counts — skew-safe at any
    cluster size). ``ids`` carries the ``max_ids`` SMALLEST member ids: a
    deterministic sample, NOT the full membership. At corpus scale a
    boilerplate cluster (10^8 copies of an empty/common doc is guaranteed at
    100 TB) would otherwise build a 10^8-element array inside one
    aggregation buffer → executor OOM — the same hot-bucket hazard the
    Hamming join caps (`spark_validate/functions/hamming.py:171`). The min-K
    sample is built in two partition-bounded levels: per input partition
    keep the K smallest (buffer ≤ rows-per-partition, set by
    ``files.maxPartitionBytes``), then merge the per-partition K-arrays
    (buffer ≤ K × partitions-touching-the-fingerprint). The result is a
    pure function of the data — the global K smallest ids — so oracles
    replicate it. Full membership at scale: :func:`exact_duplicate_members`.
    """
    k = int(max_ids)
    fp = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp"))
    per_part = fp.groupBy("fp", F.spark_partition_id().alias("_pid")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.slice(F.sort_array(F.collect_list("id")), 1, k).alias("_ids"),
    )
    return (
        per_part.groupBy("fp")
        .agg(
            F.sum("_cnt").alias("dup_count"),
            F.slice(F.sort_array(F.flatten(F.collect_list("_ids"))), 1, k).alias("ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def exact_duplicate_members(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exploded (fp, id, dup_count) rows — one per member of every duplicate
    group. The scale-safe FULL listing: no per-group array is ever built, so
    a 10^8-copy boilerplate cluster is just 10^8 ordinary rows streamed to
    whatever sink consumes them. Pair with :func:`exact_duplicates` when the
    sampled ``ids`` column isn't enough."""
    fp = df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp"))
    counts = (
        fp.groupBy("fp").agg(F.count(F.lit(1)).alias("dup_count")).filter(F.col("dup_count") > 1)
    )
    return fp.join(counts, "fp").select("fp", "id", "dup_count")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document, entirely in JVM-side array expressions.

    Universal hashing: h_i(x) = (a_i·x32 + b_i) mod p with x32 the base
    shingle hash folded to 31 bits (keeps every product inside int64 — Spark 4
    runs ANSI mode). Deterministic a_i/b_i from a seeded numpy generator.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _H32, n_hashes, dtype=np.int64)
    b = rng.integers(0, _H32, n_hashes, dtype=np.int64)
    # Whole-stage-codegen formulation. The previous single-pass
    # ``F.aggregate``/``zip_with`` fold was algorithmically right but ran
    # INTERPRETED — Spark does not codegen higher-order-function lambdas, and
    # the measured per-shingle cost was ~23 µs (100k docs: 73 s). Re-expressed
    # as posexplode(tokens) → window ``lead`` shingle assembly → ``xxhash64``
    # outside any lambda → one hash-aggregate of n_hashes codegen'd ``min``s,
    # it is 11× faster at 100k docs (6.5 s) and the gap widens with scale.
    # The window and the groupBy share the same ``id`` key, so the whole
    # pipeline costs ONE shuffle of the exploded shingles; map-side partial
    # mins shrink the agg exchange to #docs × n_hashes. Bit-identical output
    # to the fold (asserted in test_text_sim).
    k = shingle_k
    # NULL text coalesces to '' so the doc still yields its (empty) shingle
    # row — under ANSI, size(NULL)=NULL would fail BOTH length filters below
    # and silently drop the document from the output
    safe_text = F.coalesce(F.col(text_col), F.lit(""))
    toks = df.select(
        F.col(id_col).alias("id"), F.split(F.lower(F.trim(safe_text)), r"\s+").alias("t")
    )
    long_d = toks.filter(F.size("t") >= k).select(
        "id", F.posexplode("t").alias("pos", "tok"), F.size("t").alias("n")
    )
    w = Window.partitionBy("id").orderBy("pos")
    sh_long = long_d.select(
        "id",
        F.concat_ws(" ", "tok", *[F.lead("tok", j).over(w) for j in range(1, k)]).alias("g"),
        "pos",
        "n",
    ).filter(F.col("pos") <= F.col("n") - k)
    # short docs (< k tokens) contribute their whole text as the lone shingle,
    # mirroring _shingles' CASE branch (and the DuckDB oracles)
    sh_short = toks.filter(F.size("t") < k).select("id", F.array_join("t", " ").alias("g"))
    h = (
        sh_long.select("id", "g")
        .union(sh_short)
        .select("id", F.pmod(F.xxhash64("g"), F.lit(_H32)).alias("h"))
    )
    agg = h.groupBy("id").agg(
        *[
            F.min(F.pmod(F.lit(int(a[i])) * F.col("h") + F.lit(int(b[i])), F.lit(_P))).alias(f"_s{i}")
            for i in range(n_hashes)
        ]
    )
    return agg.select("id", F.array(*[f"_s{i}" for i in range(n_hashes)]).alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int = 16,
    rows_per_band: Optional[int] = None,
    max_bucket: int = 200,
    n_hashes: int = 64,
) -> DataFrame:
    """Candidate near-duplicate pairs: split signatures into bands, hash each
    band, join ids landing in the same (band, band_hash) bucket.

    One explode (rows × bands), one groupBy — no cross joins. Pair explosion
    inside a bucket is quadratic in bucket size, which is exactly the LSH
    guarantee being bought: buckets are tiny unless documents truly collide.

    ``n_hashes`` must equal the signature width (64 = the
    ``minhash_signatures`` default). It is a plan constant, so it cannot be
    probed from the data without an eager job — the round-2 version ran a
    one-row ``first()`` when it was omitted; now the default simply matches
    the signature default. Too large a value raises at run time (ANSI
    ``element_at`` bounds); a smaller one bands over a signature prefix.
    """
    r = rows_per_band or max(n_hashes // n_bands, 1)
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.element_at("signature", bi * r + j + 1).cast("string") for j in range(r)])).alias(
                    "band_hash"
                ),
            )
            for bi in range(n_bands)
        ]
    )
    exploded = signatures.select("id", F.explode(bands).alias("b")).select("id", "b.band", "b.band_hash")
    buckets = (
        exploded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        # buckets beyond max_bucket are degenerate (quadratic pair blowup on
        # near-constant content); real dups still collide in OTHER bands
    )
    from spark_validate.functions.pairs import explode_bucket_pairs

    return (
        explode_bucket_pairs(buckets, "ids")
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify stage after
    LSH). Joins shingle sets twice (broadcast-friendly when the candidate set
    is small) and computes |∩| / |∪| from set sizes."""
    sh = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("_t")).select(
        "id", F.array_distinct(_shingles_of("_t", shingle_k)).alias("sh")
    )
    a = sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")
    # compute the O(|A|+|B|) intersection ONCE (Catalyst does not guarantee
    # CSE across independently-built trees); union derives from it
    j = pairs.join(a, "id_a").join(b, "id_b").withColumn(
        "_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    )
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - F.col("_inter")
    return j.select("id_a", "id_b", (F.col("_inter") / union).alias("jaccard"))


SIMHASH_BITS = 60  # 15 hex chars of md5 — stays positive in an int64


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per document.

    Token hash = the first 15 hex chars of md5(token) as an integer — chosen
    because every SQL engine can reproduce it exactly (the DuckDB oracle uses
    ``('0x' || substr(md5(tok),1,15))::BIGINT``). Each token occurrence votes
    ±1 per bit position; the fingerprint's bit j is set when the vote sum is
    positive. Tokenization contract: lowercase, split on whitespace, empty
    tokens dropped; documents with no tokens fingerprint to 0.
    """
    # Arrow-batched with a per-batch token→hash cache: md5 is C-implemented,
    # the bit voting is numpy, and repeated tokens hash once per batch.
    # Measured 29k docs/s at 100k docs on local[32] — 4× the per-token-Python
    # FNV predecessor and 7× a pure JVM fold (explode+groupBy shuffles every
    # token; a 60-wide HOF zip_with interprets its lambda per token — both
    # measured slower). Round-3 negative result: "full vectorization"
    # (pandas str.split → flat object array → np.unique/pd.factorize →
    # 60-wide gather + reduceat) measured 6-10× SLOWER than this loop —
    # materializing millions of token objects and a tokens×60 matrix costs
    # more than the tight cache loop's small per-doc arrays. No shuffle:
    # one narrow map pass, scale-safe.
    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        from hashlib import md5

        cache: dict = {}
        shift = np.arange(SIMHASH_BITS, dtype=np.int64)
        out = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = str(t).lower().split() if t else []
            if not toks:
                continue
            hs = np.empty(len(toks), np.int64)
            for k, tok in enumerate(toks):
                v = cache.get(tok)
                if v is None:
                    v = int(md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                    cache[tok] = v
                hs[k] = v
            bits = (hs[:, None] >> shift[None, :]) & 1
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = int(((votes > 0).astype(np.int64) << shift).sum())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))



def simhash_near_duplicates(
    simhashes: DataFrame, max_hamming: int = 3, n_bands: int = 4,
    n_blocks=None, n_bits: int = SIMHASH_BITS, max_bucket: int = 10_000,
) -> DataFrame:
    """Near-duplicates by Hamming distance ≤ ``max_hamming`` — delegates to
    the shared exact Hamming join (`functions/hamming.py`): pigeonhole
    recall 1, bucket cap, and the Manku multi-block construction for large
    corpora (pass ``n_blocks > max_hamming+1``). Recall is exact when
    bands ≥ max_hamming+1; LOOSER thresholds than the band count (the
    classic simhash similarity sweep, e.g. h=16 over 4 bands) run with
    probabilistic recall — a near pair is found when some 15-bit band
    survives untouched. NOTE: buckets above ``max_bucket`` are excluded
    (previously this function enumerated them quadratically); a >10k-row
    identical-fingerprint cluster is boilerplate — surface it via
    ``functions.hamming.hamming_degenerate_buckets`` and/or
    ``exact_duplicates`` rather than as an O(n²) pair list."""
    from spark_validate.functions.hamming import hamming_near_duplicates

    return hamming_near_duplicates(
        simhashes,
        max_hamming=max_hamming,
        hash_col="simhash",
        id_col="id",
        n_bands=n_bands,
        n_blocks=n_blocks,
        bits=n_bits,
        max_bucket=max_bucket,
        enforce_recall=False,  # legacy similarity-sweep semantics
    )


def near_duplicate_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = 32,
    shingle_k: int = 6,
    n_bands: int = 16,
    max_bucket: int = 200,
) -> DataFrame:
    """End-to-end near-duplicate clustering: MinHash signatures → LSH
    candidate pairs → exact shingle-Jaccard verify at ``threshold`` →
    connected components → one row per document with its cluster label and
    the canonical-representative decision.

    Columns: ``(doc_id, cluster_id, cluster_size, keep)`` where
    ``cluster_id`` is the minimum doc id in the component (deterministic),
    ``cluster_size`` counts the component's members, and ``keep`` marks the
    canonical representative (``doc_id == cluster_id``) — the standard
    retention policy for a training-corpus dedup pass. Singletons keep
    themselves with ``cluster_size = 1``.

    At 16 bands × 2 rows the LSH miss probability at j ≥ 0.8 is ≤ 8e-8, so
    the component structure matches brute-force all-pairs Jaccard (the
    DuckDB oracle computes exactly that with a recursive CTE).

    EXACT duplicates are pre-collapsed to one representative node (the
    group's min id) before the LSH sweep. This is semantics-preserving
    (identical texts have Jaccard 1 and always co-cluster; the cluster
    minimum over representatives equals the global minimum id) and it is
    what makes the boilerplate case survive at corpus scale: 10^8 copies of
    one document are ONE node in the pair graph instead of an over-
    ``max_bucket`` bucket that the LSH cap would otherwise silently drop,
    mis-labelling every copy a singleton. Near-identical (non-exact)
    boilerplate above ``max_bucket`` variants per bucket is still capped —
    surface those via ``lsh`` bucket reports / ``exact_duplicates`` first.
    """
    from spark_validate.functions.graph import label_clusters

    # NULL texts stay singletons (they are missing data, not duplicates of
    # each other — and the DuckDB oracle's NULL propagation agrees)
    nn = df.filter(F.col(text_col).isNotNull())
    fp = F.md5(F.col(text_col))
    rep_docs = (
        nn.select(F.col(id_col).alias("id"), fp.alias("_fp"), F.col(text_col).alias(text_col))
        .groupBy("_fp")
        .agg(F.min("id").alias("id"), F.min(text_col).alias(text_col))
    )
    sigs = minhash_signatures(rep_docs, text_col=text_col, id_col="id", n_hashes=n_hashes, shingle_k=shingle_k)
    pairs = lsh_candidate_pairs(sigs, n_bands=n_bands, max_bucket=max_bucket, n_hashes=n_hashes)
    verified = ngram_jaccard(rep_docs, pairs, text_col=text_col, id_col="id", shingle_k=shingle_k).filter(
        F.col("jaccard") >= threshold
    )
    members = (
        nn.select(F.col(id_col).alias("doc_id"), fp.alias("_fp"))
        .join(rep_docs.select("_fp", F.col("id").alias("_rep")), "_fp")
        .select("doc_id", "_rep")
        .unionByName(
            df.filter(F.col(text_col).isNull()).select(
                F.col(id_col).alias("doc_id"), F.col(id_col).alias("_rep")
            )
        )
    )
    return label_clusters(members, verified, member_col="doc_id", node_col="_rep")


class TextDedupCheck:
    """Runner-compatible check: per-chunk rate of documents that are
    NON-CANONICAL members of a near-duplicate cluster (the fraction a dedup
    pass would drop), plus violation rows naming each dropped doc's cluster.
    Cluster discovery is global (near-dups cross chunk boundaries — the same
    topology note as ``image/phash.py::PhashDedupCheck``); the chunk metric
    attributes each duplicate to ITS chunk. Alerts on a constant upper
    threshold (default 0.0: any duplicate alerts)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.8,
        chunker=None,
        upper_threshold: float = 0.0,
        n_hashes: int = 32,
        shingle_k: int = 6,
        n_bands: int = 16,
        max_bucket: int = 200,
    ):
        from spark_validate.chunking import DefaultChunker

        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.chunker = chunker or DefaultChunker()
        self.upper_threshold = upper_threshold
        self.n_hashes = n_hashes
        self.shingle_k = shingle_k
        self.n_bands = n_bands
        self.max_bucket = max_bucket

    def _clusters(self, df: DataFrame) -> DataFrame:
        # the runner calls calculate(ana) then violations(ana) on the SAME
        # frame; the cluster pipeline runs eagerly (iterative CC), so memoize
        # the labeled frame per input instead of paying LSH+CC twice
        cached = getattr(self, "_cc_cache", None)
        if cached is not None and cached[0] is df:
            return cached[1]
        out = near_duplicate_clusters(
            df,
            text_col=self.text_col,
            id_col=self.id_col,
            threshold=self.threshold,
            n_hashes=self.n_hashes,
            shingle_k=self.shingle_k,
            n_bands=self.n_bands,
            max_bucket=self.max_bucket,
        ).localCheckpoint(eager=True)
        self._cc_cache = (df, out)
        return out

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        from spark_validate.calculators.base import assign_chunks
        from spark_validate.checks.constraints import _attach_const_threshold
        from spark_validate.chunking import CHUNK_KEY

        assigned, headers = assign_chunks(df, self.chunker)
        dropped = self._clusters(df).filter(~F.col("keep")).select(F.col("doc_id").alias("_id"))
        per_chunk = (
            assigned.join(dropped, assigned[self.id_col] == dropped["_id"], "left")
            .groupBy(CHUNK_KEY)
            .agg(
                F.count(F.lit(1)).alias("__rows"),
                F.count("_id").cast("double").alias("__dups"),
            )
            .select(
                CHUNK_KEY,
                F.lit(self.text_col).alias("column_name"),
                F.lit("near_dup_drop_rate").alias("method"),
                (F.col("__dups") / F.col("__rows")).cast("double").alias("value"),
            )
        )
        return _attach_const_threshold(per_chunk, headers, period, None, self.upper_threshold)

    def violations(self, df: DataFrame, row_id=None) -> DataFrame:
        from spark_validate.chunking import CHUNK_KEY

        assigned = self.chunker.assign(df).select(
            F.col(self.id_col).alias("doc_id"), F.col(CHUNK_KEY).alias("chunk_key")
        )
        return (
            self._clusters(df)
            .filter(~F.col("keep"))
            .join(assigned, "doc_id")
            .select(
                F.lit("text_dedup").alias("check"),
                F.lit(self.text_col).alias("column_name"),
                "chunk_key",
                F.col("doc_id").cast("string").alias("row_id"),
                F.lit("near_duplicate").alias("violation_kind"),
                F.concat(
                    F.lit("cluster="), F.col("cluster_id").cast("string"),
                    F.lit(" size="), F.col("cluster_size").cast("string"),
                ).alias("observed_value"),
            )
        )
