"""Maximum Mean Discrepancy drift on embedding vectors, linear-time via
random Fourier features.

``EmbeddingDriftCalculator`` monitors per-DIMENSION statistics — it cannot
see a joint change that leaves every marginal alone (a rotation of the
embedding cloud, label-conditional mode swaps).  The kernel two-sample
test (Gretton et al., JMLR 2012) can: MMD²(P, Q) = ||μ_P − μ_Q||²_H over
an RKHS embedding.  The quadratic-time estimator is a non-starter at
10^12 rows, so this calculator uses the random-Fourier-feature
approximation (Rahimi & Recht, NeurIPS 2007): for the Gaussian kernel,
φ(x) = sqrt(2/K)·cos(Wx + b) with W ~ N(0, 1/σ²) and b ~ U[0, 2π) gives
k(x, y) ≈ φ(x)·φ(y), so

    MMD² ≈ ‖ mean_P φ − mean_Q φ ‖²   —   ONE pass, K numbers of state.

Execution shape
---------------
* ``fit``: one aggregation for the bandwidth (σ² = Σ_d var_d — the exact
  E‖x−y‖²/2 identity, the standard median-heuristic stand-in) + one
  aggregation for the K reference feature means.  W/b are derived from a
  seeded generator (`rff_params`) and live in JSON state, so a stored
  model is exactly reproducible.
* ``calculate``: one ``groupBy(chunk)`` with K conditional feature sums —
  each feature is ``cos(w_k·x + b_k)`` where the dot product is a single
  ``zip_with``/``aggregate`` fold against a literal weight array.  No
  shuffle beyond the chunk aggregation, no Python, state O(K).

Exactness contract: cos values are quantized via the ``decimal(38,12)``
device so partial-aggregation order cannot change the sums; the final
MMD² is an explicit k-ascending chain ``(2/K)·Σ (μref_k − μchunk_k)²``.
``cos`` itself may differ from another engine's libm in the last ulp —
a per-row 1e-16 that stays ~1e-14 after averaging — so cross-engine
comparisons round to 6 (the lm_quality convention).  Rows with NULL or
wrong-dimension vectors are excluded.

Alerting: MMD² has no universal scale; the default constant threshold
0.05 is a pragmatic cut (≈ kernel-mean shift of 0.22) — calibrate it per
deployment, or use the ``ref_self_mmd`` the fit reports (the reference
scored against itself in halves — an empirical null scale). Caveat: the
halves are assigned by CONTENT hash (the only split that is deterministic
at any parallelism), so byte-identical duplicate vectors always land in
the same half — a duplicate-heavy reference (a few vectors copied many
times) inflates ``ref_self_mmd`` toward the separation between its modes
rather than a true null draw. Treat it as an UPPER bound on the null
scale there, or exact-dedup the reference (``sim.embedding_clusters``)
before fitting.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_validate.calculators.base import assign_chunks, join_headers_long
from spark_validate.chunking import CHUNK_KEY, Chunker, DefaultChunker
from spark_validate.result import conform_result

_DEC = "decimal(38,12)"


def rff_params(dim: int, n_features: int, sigma: float, seed: int) -> Tuple[list, list]:
    """Deterministic RFF parameters: W (n_features × dim, N(0, 1/σ²)) and
    b (n_features, U[0, 2π)).  Same seed → same floats everywhere — the
    oracle and a restored store rebuild the identical projection."""
    rng = np.random.RandomState(seed)
    W = rng.standard_normal((n_features, dim)) / sigma
    b = rng.uniform(0.0, 2.0 * math.pi, n_features)
    return [[float(x) for x in row] for row in W], [float(x) for x in b]


@dataclass
class MMDDriftCalculator:
    """fit(reference) → calculate(analysis): per-chunk MMD² vs reference."""

    column_name: str = "embedding"
    n_features: int = 64
    sigma: Optional[float] = None  # None → fitted sqrt(Σ_d var_d)
    seed: int = 20
    chunker: Chunker = field(default_factory=DefaultChunker)
    mmd_threshold: float = 0.05
    _state: Optional[Dict] = None

    def __post_init__(self):
        if self.n_features < 2:
            raise ValueError(f"n_features must be >= 2, got {self.n_features}")

    # -- expressions -----------------------------------------------------------

    def _valid(self, dim: int) -> F.Column:
        v = F.col(self.column_name).cast("array<double>")
        return F.when(v.isNotNull() & (F.size(v) == dim), v)

    def _feature_exprs(self, src: Optional[F.Column] = None) -> List[F.Column]:
        """cos(w_k·x + b_k) per feature over the valid vector (NULL rows
        yield NULL → skipped by the sums). ``src`` names an ALREADY-PROJECTED
        valid-vector column; inlining the validity subtree into each of the
        K lambda chains made Catalyst/codegen the dominant fit cost
        (guide §1.2 step 2 — same pattern as the text shinglers)."""
        st = self._state
        v = self._valid(st["dim"]) if src is None else src
        out = []
        for k in range(self.n_features):
            w = F.array(*[F.lit(x) for x in st["W"][k]])
            dot = F.aggregate(
                F.zip_with(v, w, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            out.append(F.cos(dot + F.lit(st["b"][k])))
        return out

    def _sum_aggs(self, src: Optional[F.Column] = None) -> List[F.Column]:
        feats = self._feature_exprs(src)
        aggs = [F.count(feats[0]).alias("__n")]
        for k, f in enumerate(feats):
            aggs.append(
                F.coalesce(F.sum(f.cast(_DEC)), F.lit(0).cast(_DEC)).alias(f"__s{k}")
            )
        return aggs

    def _mmd_expr(self) -> F.Column:
        """(2/K)·Σ_k (ref_mean_k − chunk_mean_k)², k-ascending chain."""
        st = self._state
        n = F.col("__n")
        acc = None
        for k in range(self.n_features):
            mu = F.col(f"__s{k}").cast("double") / n
            d = F.lit(float(st["mu_ref"][k])) - mu
            term = d * d
            acc = term if acc is None else acc + term
        return F.when(n > 0, F.lit(2.0 / self.n_features) * acc)

    # -- fit -------------------------------------------------------------------

    def fit(self, reference: DataFrame) -> "MMDDriftCalculator":
        v = F.col(self.column_name).cast("array<double>")
        first = reference.select(F.size(v).alias("d")).filter(F.col("d").isNotNull()).first()
        if first is None:
            raise ValueError(f"reference column {self.column_name!r} has no vectors")
        dim = int(first["d"])
        if self.sigma is None:
            # σ² = Σ_d var_d == E‖x−y‖²/2 exactly — the median-heuristic
            # stand-in that needs only one moments pass. The valid vector is
            # projected ONCE (2·dim element_at exprs each referenced it).
            vv = F.col("_sv_vec")
            aggs = [F.count(vv).alias("__n")]
            for d in range(dim):
                x = F.element_at(vv, d + 1)
                aggs += [
                    F.coalesce(F.sum(x.cast(_DEC)), F.lit(0).cast(_DEC)).alias(f"__m{d}"),
                    F.coalesce(F.sum((x * x).cast(_DEC)), F.lit(0).cast(_DEC)).alias(f"__q{d}"),
                ]
            row = reference.select(self._valid(dim).alias("_sv_vec")).agg(*aggs).first()
            n = row["__n"]
            if n == 0:
                raise ValueError(f"reference column {self.column_name!r} has no valid vectors")
            var_sum = 0.0
            for d in range(dim):
                m = float(row[f"__m{d}"]) / n
                var_sum += max(float(row[f"__q{d}"]) / n - m * m, 0.0)
            sigma = math.sqrt(var_sum) if var_sum > 0 else 1.0
        else:
            sigma = float(self.sigma)
        W, b = rff_params(dim, self.n_features, sigma, self.seed)
        self._state = {"dim": dim, "sigma": sigma, "W": W, "b": b}
        # One aggregation yields BOTH the K reference means and the split-half
        # null scale: rows hash deterministically into two halves (content
        # hash — stable at any parallelism), half-0 sums ride as K extra
        # conditional columns, half-1 = total − half-0.  ref_self_mmd is the
        # reference scored against itself — the empirical null the docstring
        # tells users to calibrate mmd_threshold with.
        # projected valid vector: rows with NULL features are excluded from
        # every count/sum below, and valid rows hash identically, so hashing
        # the projection is equivalent to hashing the raw cast array
        src = F.col("_sv_vec")
        half0 = F.pmod(F.xxhash64(src), F.lit(2)) == 0
        feats = self._feature_exprs(src)
        aggs = self._sum_aggs(src)
        aggs.append(F.count(F.when(half0, feats[0])).alias("__n0"))
        for k, f in enumerate(feats):
            aggs.append(
                F.coalesce(F.sum(F.when(half0, f).cast(_DEC)), F.lit(0).cast(_DEC)).alias(f"__h{k}")
            )
        row = reference.select(self._valid(dim).alias("_sv_vec")).agg(*aggs).first()
        n = row["__n"]
        if n == 0:
            raise ValueError(f"reference column {self.column_name!r} has no valid vectors")
        self._state["n_ref"] = int(n)
        self._state["mu_ref"] = [float(row[f"__s{k}"]) / n for k in range(self.n_features)]
        n0 = int(row["__n0"])
        n1 = int(n) - n0
        if n0 > 0 and n1 > 0:
            acc = 0.0
            for k in range(self.n_features):
                h = float(row[f"__h{k}"])
                d = h / n0 - (float(row[f"__s{k}"]) - h) / n1
                acc += d * d
            self._state["ref_self_mmd"] = (2.0 / self.n_features) * acc
        else:  # degenerate single-half reference — no null scale available
            self._state["ref_self_mmd"] = None
        return self

    def get_state(self) -> dict:
        if self._state is None:
            raise RuntimeError("fit first")
        return {
            "version": 1,
            "n_features": self.n_features,
            "seed": self.seed,
            "state": self._state,
        }

    def set_state(self, state: dict) -> None:
        if state["n_features"] != self.n_features:
            raise ValueError(
                f"stored state has n_features={state['n_features']}, calculator has {self.n_features}"
            )
        self._state = state["state"]

    # -- calculate -------------------------------------------------------------

    def calculate(self, df: DataFrame, period: str = "analysis") -> DataFrame:
        if self._state is None:
            raise RuntimeError("fit first")
        assigned, headers = assign_chunks(df, self.chunker)
        proj = assigned.select(CHUNK_KEY, self._valid(self._state["dim"]).alias("_sv_vec"))
        wide = proj.groupBy(CHUNK_KEY).agg(*self._sum_aggs(F.col("_sv_vec")))
        thr = float(self.mmd_threshold)
        long_df = wide.select(
            CHUNK_KEY,
            F.lit(self.column_name).alias("column_name"),
            F.lit("mmd").alias("method"),
            self._mmd_expr().cast("double").alias("value"),
            F.lit(None).cast("double").alias("lower_threshold"),
            F.lit(thr).alias("upper_threshold"),
        ).withColumn(
            "alert", F.coalesce(F.col("value") > F.lit(thr), F.lit(False))
        )
        return conform_result(join_headers_long(long_df, headers, period))
