"""Custom stateful streaming operator — running per-group statistics via
``applyInPandasWithState``.

The windowed aggregations in ``incremental.py`` cover the chunk-equivalent
path; this operator covers the genuinely *stateful* one: statistics that
accumulate across micro-batches forever (per format, per partition, per
source), with the state merged by Chan's parallel-variance formula so a
group's running (count, mean, variance, min, max) is exact no matter how the
rows were split across triggers.

Emits one updated row per (group × trigger) in ``update`` output mode — the
streaming analog of the lineage table's per-partition metrics, continuously
maintained instead of recomputed.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "group string, n long, mean double, std double, min double, max double"
_STATE_SCHEMA = "n long, mean double, m2 double, mn double, mx double"


def _merge(n, mean, m2, mn, mx, v: np.ndarray):
    """Chan et al. parallel variance merge of a batch into the running state."""
    bn = len(v)
    if bn == 0:
        return n, mean, m2, mn, mx
    bmean = float(v.mean())
    bm2 = float(((v - bmean) ** 2).sum())
    if n == 0:
        return bn, bmean, bm2, float(v.min()), float(v.max())
    delta = bmean - mean
    tot = n + bn
    return (
        tot,
        mean + delta * bn / tot,
        m2 + bm2 + delta * delta * n * bn / tot,
        min(mn, float(v.min())),
        max(mx, float(v.max())),
    )


def running_group_stats(
    stream: DataFrame,
    group_col: str,
    value_col: str,
    ttl_ms: Optional[int] = None,
    event_time_col: Optional[str] = None,
    watermark: str = "10 minutes",
    event_ttl: str = "1 hour",
) -> DataFrame:
    """Exact running (count, mean, std, min, max) per group across ALL
    micro-batches seen so far.

    State per group is five scalars — O(#groups) total, the only state shape
    that survives unbounded streams. Rows with null group/value are dropped
    (consistent with the batch calculators' NaN removal).

    State eviction for unbounded KEY spaces (per-source-file ids, session
    keys, …) — without one of these, state is O(#groups) forever (fine only
    for closed key sets like formats/partitions):

    * ``ttl_ms`` — wall-clock eviction via ``ProcessingTimeTimeout``: a
      group idle longer than the TTL emits its final stats row once more,
      then drops its five scalars.
    * ``event_time_col`` — WATERMARK-driven eviction via
      ``EventTimeTimeout``: the stream gets ``withWatermark(event_time_col,
      watermark)``, and a group whose newest event is older than
      (watermark − ``event_ttl``) is evicted deterministically from the
      DATA's clock, replay-safe — the right semantics for reprocessable
      sources. A key that re-appears after eviction starts FRESH (n counts
      only post-eviction rows).
    """
    if event_time_col is not None:
        timeout = GroupStateTimeout.EventTimeTimeout
        stream = stream.withWatermark(event_time_col, watermark)
        ttl_delta = pd.Timedelta(event_ttl)
    else:
        ttl_delta = None
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
        )

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # final emission for the evicted group, then drop its state
            n, mean, m2, mn, mx = state.get
            state.remove()
            if n > 0:
                yield pd.DataFrame(
                    [
                        {
                            "group": str(key[0]),
                            "n": n,
                            "mean": mean,
                            "std": math.sqrt(m2 / n),
                            "min": mn,
                            "max": mx,
                        }
                    ]
                )
            return
        if state.exists:
            n, mean, m2, mn, mx = state.get
        else:
            n, mean, m2, mn, mx = 0, 0.0, 0.0, math.inf, -math.inf
        max_ev_ms = None
        for pdf in pdfs:
            v = pd.to_numeric(pdf[value_col], errors="coerce").dropna().to_numpy(np.float64)
            n, mean, m2, mn, mx = _merge(n, mean, m2, mn, mx, v)
            if event_time_col is not None and len(pdf):
                ts = pd.to_datetime(pdf[event_time_col]).max()
                ms = int(ts.value // 1_000_000)
                max_ev_ms = ms if max_ev_ms is None else max(max_ev_ms, ms)
        state.update((n, mean, m2, mn, mx))
        if ttl_ms:
            state.setTimeoutDuration(int(ttl_ms))
        elif event_time_col is not None and max_ev_ms is not None:
            # evicted once the watermark passes newest-event + event_ttl
            state.setTimeoutTimestamp(max_ev_ms + int(ttl_delta.total_seconds() * 1000))
        if n == 0:
            return
        yield pd.DataFrame(
            [
                {
                    "group": str(key[0]),
                    "n": n,
                    "mean": mean,
                    "std": math.sqrt(m2 / n) if n > 0 else float("nan"),
                    "min": mn,
                    "max": mx,
                }
            ]
        )

    keep = [stream[group_col].cast("string").alias("_g"), stream[value_col].alias(value_col)]
    if event_time_col is not None:
        keep.append(stream[event_time_col].alias(event_time_col))  # keeps the watermark attached
    src = stream.filter(stream[group_col].isNotNull()).select(*keep)
    return src.groupBy("_g").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "update", timeout
    )


def streaming_duplicate_keys(
    stream: DataFrame,
    key_columns,
    id_col: Optional[str] = None,
    event_time_col: Optional[str] = None,
    watermark: str = "10 minutes",
    event_ttl: str = "1 hour",
    ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Streaming uniqueness check — a duplicate-key VIOLATION stream.

    The batch ``UniquenessCheck`` is a two-phase ``groupBy(key)`` over the
    full frame; on a stream the key space is unbounded, so this is the
    genuinely stateful analog: per key, state is ONE long (occurrences seen
    so far, plus the newest event time when event-time eviction is on). The
    first occurrence of a key is silent; every later row emits one violation
    carrying its occurrence ordinal (2, 3, …) — rows are final, so the
    operator runs in append mode and feeds the parquet file sink directly.

    Eviction mirrors :func:`running_group_stats`: ``event_time_col`` arms
    watermark-driven ``EventTimeTimeout`` (a key idle past
    watermark − ``event_ttl`` drops its state; replay-deterministic),
    ``ttl_ms`` arms wall-clock ``ProcessingTimeTimeout``. A key that
    re-appears after eviction starts fresh — duplicates farther apart than
    the TTL are the batch check's job (run it over the compacted table);
    this operator is the INGEST gate for the near-in-time duplicate floods
    uniqueness checks exist to catch.

    Keys are compared on a ``to_json(struct(key_columns))`` encoding —
    NULL-safe and separator-collision-free (same device as the runner's
    violations sampling key).
    """
    import pyspark.sql.functions as F

    if event_time_col is not None:
        timeout = GroupStateTimeout.EventTimeTimeout
        stream = stream.withWatermark(event_time_col, watermark)
        ttl_delta = pd.Timedelta(event_ttl)
    else:
        ttl_delta = None
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
        )

    out_schema = "key string, occurrence long, row_id string"
    if event_time_col is not None:
        out_schema += f", {event_time_col} timestamp"

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # duplicates were already emitted; nothing final
            return
        (n,) = state.get if state.exists else (0,)
        max_ev_ms = None
        for pdf in pdfs:
            bn = len(pdf)
            if bn == 0:
                continue
            ords = list(range(n + 1, n + bn + 1))
            n += bn
            if event_time_col is not None:
                ts = pd.to_datetime(pdf[event_time_col]).max()
                ms = int(ts.value // 1_000_000)
                max_ev_ms = ms if max_ev_ms is None else max(max_ev_ms, ms)
            dup_mask = [o > 1 for o in ords]
            if not any(dup_mask):
                continue
            out = {
                "key": [str(key[0])] * sum(dup_mask),
                "occurrence": [o for o in ords if o > 1],
                "row_id": (
                    pdf.loc[dup_mask, "_rid"].astype(str).tolist()
                    if "_rid" in pdf.columns
                    else [None] * sum(dup_mask)
                ),
            }
            if event_time_col is not None:
                out[event_time_col] = pdf.loc[dup_mask, event_time_col].tolist()
            yield pd.DataFrame(out)
        state.update((n,))
        if ttl_ms:
            state.setTimeoutDuration(int(ttl_ms))
        elif event_time_col is not None and max_ev_ms is not None:
            state.setTimeoutTimestamp(max_ev_ms + int(ttl_delta.total_seconds() * 1000))

    kjson = F.to_json(F.struct(*[F.col(c) for c in key_columns])).alias("_k")
    keep = [kjson]
    if id_col is not None:
        keep.append(F.col(id_col).cast("string").alias("_rid"))
    if event_time_col is not None:
        keep.append(F.col(event_time_col))
    src = stream.select(*keep)
    return src.groupBy("_k").applyInPandasWithState(
        fn, out_schema, "n long", "append", timeout
    )


def streaming_caption_conflicts(
    stream: DataFrame,
    group_col: str = "phash",
    caption_col: str = "caption",
    id_col: Optional[str] = None,
    event_time_col: Optional[str] = None,
    watermark: str = "10 minutes",
    event_ttl: str = "1 hour",
    ttl_ms: Optional[int] = None,
    witness_len: int = 256,
) -> DataFrame:
    """Streaming cross-modal consistency — a caption-CONFLICT violation
    stream (the ingest-time sibling of
    `spark_validate/image/consistency.py::CaptionConsistencyCheck`).

    Per image-identity group the state is the FIRST non-null caption seen;
    every later row whose caption differs emits one final violation row
    carrying both captions (append mode, parquet-sink ready). Rows that
    arrived BEFORE the first disagreement are not retroactively emitted —
    rows are final in append mode — so this is the ingest gate for
    near-in-time conflicting floods; full retroactive reporting over the
    compacted table is the batch check's job (same division of labor as
    ``streaming_duplicate_keys``). NULL captions never vote and never
    conflict; NULL groups carry no image identity and are dropped.

    State is ONE caption string per live group (bounded by eviction);
    emitted witnesses are truncated to ``witness_len`` chars but conflict
    comparison uses the full strings. Eviction mirrors
    :func:`running_group_stats`: ``event_time_col`` arms watermark-driven
    ``EventTimeTimeout``, ``ttl_ms`` arms ``ProcessingTimeTimeout``; an
    evicted group that re-appears starts fresh.
    """
    import pyspark.sql.functions as F

    if event_time_col is not None:
        timeout = GroupStateTimeout.EventTimeTimeout
        stream = stream.withWatermark(event_time_col, watermark)
        ttl_delta = pd.Timedelta(event_ttl)
    else:
        ttl_delta = None
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
        )

    out_schema = "group string, row_id string, caption string, first_caption string"
    if event_time_col is not None:
        out_schema += f", {event_time_col} timestamp"

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # conflicts were already emitted; nothing final
            return
        (first,) = state.get if state.exists else (None,)
        max_ev_ms = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if event_time_col is not None:
                ts = pd.to_datetime(pdf[event_time_col]).max()
                ms = int(ts.value // 1_000_000)
                max_ev_ms = ms if max_ev_ms is None else max(max_ev_ms, ms)
            caps = pdf["_cap"]
            voting = caps.notna()
            if first is None:
                nn = voting[voting].index
                if len(nn) == 0:
                    continue
                first = caps.loc[nn[0]]
                # rows BEFORE the first voter in this same batch can't
                # conflict (nothing to disagree with yet)
                voting = voting & (pdf.index > nn[0])
            bad = voting & (caps != first)
            if not bad.any():
                continue
            out = {
                "group": [str(key[0])] * int(bad.sum()),
                "row_id": (
                    pdf.loc[bad, "_rid"].astype(str).tolist()
                    if "_rid" in pdf.columns
                    else [None] * int(bad.sum())
                ),
                "caption": caps.loc[bad].str.slice(0, witness_len).tolist(),
                "first_caption": [str(first)[:witness_len]] * int(bad.sum()),
            }
            if event_time_col is not None:
                out[event_time_col] = pdf.loc[bad, event_time_col].tolist()
            yield pd.DataFrame(out)
        if first is not None:
            state.update((first,))
        if ttl_ms:
            state.setTimeoutDuration(int(ttl_ms))
        elif event_time_col is not None and max_ev_ms is not None:
            state.setTimeoutTimestamp(max_ev_ms + int(ttl_delta.total_seconds() * 1000))

    keep = [
        F.col(group_col).cast("string").alias("_g"),
        F.col(caption_col).cast("string").alias("_cap"),
    ]
    if id_col is not None:
        keep.append(F.col(id_col).cast("string").alias("_rid"))
    if event_time_col is not None:
        keep.append(F.col(event_time_col))
    src = stream.filter(F.col(group_col).isNotNull()).select(*keep)
    return src.groupBy("_g").applyInPandasWithState(
        fn, out_schema, "first string", "append", timeout
    )
