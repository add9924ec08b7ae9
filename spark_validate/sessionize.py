"""Sessionization — gap-based session assignment over event streams.

A behavioral-data training pipeline (recommenders, next-event prediction,
RLHF telemetry) consumes SESSIONS, not raw events: consecutive events of
one actor separated by less than a gap belong together, a silence longer
than the gap starts a new session. This module provides

* :func:`sessionize` — per-EVENT session labels (``session_index`` within
  the actor, a stable ``session_id``, ``event_index`` within the session)
  via the classic gap-flag prefix sum;
* :func:`session_stats` — per-SESSION aggregates (count, span, duration)
  from the labeled frame;
* a Spark-native streaming sibling lives in
  ``streaming/incremental.py::streaming_sessions`` built on
  ``F.session_window`` (dynamic-gap windows with watermark-bounded state),
  and the batch/stream pair is pinned equal in tests.

Scale shape (10^12 events): the only shuffle is the window partition by
the actor column — the natural key the downstream training job groups by
anyway; there is NO global sort (``Window.partitionBy(user).orderBy(ts)``
sorts within partitions only). The parallel unit is the actor: one
pathological actor (a bot with 10^9 events) serializes its own partition —
the same inherent-sequential-unit contract as greedy sequence packing;
cap such actors upstream (the skew check flags them).

Determinism: ties on the timestamp are broken by ``order_by`` extras
(pass the event id); with a total order the gap flags, prefix sums and
ids are bit-stable at any parallelism, so a DuckDB window replica
hash-matches exactly.

Reference scope: NannyML has no session concept; semantics follow Spark's
own ``session_window`` exactly — a new session starts when
``ts − prev_ts >= gap`` (session windows are half-open ``[start,
last + gap)``, so an event arriving exactly ``gap`` after the previous one
does NOT overlap and opens a new session). Pinning the batch rule to the
native streaming operator's makes the batch/stream pair bit-comparable.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(col: str) -> F.Column:
    # TIMESTAMP_NTZ won't cast to double directly; route through timestamp
    # (the UTC-pinned session makes this the same epoch double DuckDB's
    # epoch(ts) computes — the freshness-check device)
    return F.col(col).cast("timestamp").cast("double")


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_by: Sequence[str] = (),
) -> DataFrame:
    """Label every event with its session.

    Adds ``session_index`` (0-based per actor), ``session_id``
    (``"<user>#<index>"``), ``event_index`` (0-based within the session)
    and ``gap_seconds_prev`` (NULL for an actor's first event). Rows with
    a NULL actor or NULL timestamp carry no session (all four NULL) —
    they are the missing-values check's business, not dropped here.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_by]
    w = Window.partitionBy(user_col).orderBy(*order)
    ok = F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    gap = _epoch(ts_col) - F.lag(_epoch(ts_col)).over(w)
    new_session = F.when(gap.isNull() | (gap >= F.lit(float(gap_seconds))), 1).otherwise(0)
    frame = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    session_index = (F.sum(new_session).over(frame) - F.lit(1)).cast("long")
    out = (
        df.withColumn("gap_seconds_prev", F.when(ok, gap))
        .withColumn("session_index", F.when(ok, session_index))
        .withColumn(
            "session_id",
            F.when(
                ok,
                F.concat_ws(
                    "#", F.col(user_col).cast("string"), session_index.cast("string")
                ),
            ),
        )
    )
    # event_index needs the materialized session_index column (a window over
    # a window expression is not allowed); same partition keys → no new
    # exchange, Catalyst reuses the sort
    w_ev = Window.partitionBy(user_col, "session_index").orderBy(*order)
    return out.withColumn(
        "event_index",
        F.when(ok, (F.row_number().over(w_ev) - F.lit(1)).cast("long")),
    )


def session_stats(
    labeled: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session aggregates from a :func:`sessionize`-labeled frame:
    (user, session_index, session_id, n_events, start_ts, end_ts,
    duration_seconds). One ``groupBy`` on the same keys the labeling
    window already partitioned by."""
    return (
        labeled.filter(F.col("session_id").isNotNull())
        .groupBy(user_col, "session_index", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            (F.max(_epoch(ts_col)) - F.min(_epoch(ts_col))).alias("duration_seconds"),
        )
    )
