"""Config-driven streaming validation — the runner's always-on sibling.

Batch runner (`spark_validate/runner.py`) = scheduled re-runs with lineage
resume, like the reference's APScheduler CLI. This module keeps the SAME
config shape but compiles the checks into Structured Streaming queries:

* ``column_stats`` → windowed per-column stats (+ batch-fitted threshold
  alerts when a reference table is configured),
* ``domain`` / ``range`` → append-mode violation row streams,
* ``drift`` → ``streaming_univariate_drift`` from a calculator fitted on the
  reference (js/hellinger/psi).

Sinks are parquet directories under ``output_dir`` with per-query checkpoint
locations (exactly-once file sink semantics; restart-safe, the streaming
analog of the lineage table). ``run_streaming_suite`` returns the started
``StreamingQuery`` handles — callers own the lifecycle (tests drain with
``processAllAvailable``; production runs ``awaitAnyTermination``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from spark_validate.io.readers import read_source
from spark_validate.runner import build_chunker, build_check, _check_name


def _sink(df: DataFrame, out_dir: str, name: str, mode: str, trigger=None):
    w = (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", os.path.join(out_dir, name))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoints", name))
    )
    if trigger:
        w = w.trigger(**trigger)
    return w


def run_streaming_suite(spark: SparkSession, config: dict, trigger: Optional[Dict[str, str]] = None):
    """Start one streaming query per supported check; returns {name: query}.

    Config = the batch runner's schema plus ``stream`` (readStream source
    path), ``timestamp_column``, ``window`` and optional ``watermark``.
    Reference-fitted state (stats thresholds, drift histograms) comes from
    the batch ``reference`` table — fit is a batch job, monitoring streams.
    """
    from spark_validate.streaming.drift import streaming_univariate_drift
    from spark_validate.streaming.incremental import (
        attach_thresholds,
        streaming_column_stats,
        streaming_violations,
    )

    out_dir = config["output_dir"]
    ts = config["timestamp_column"]
    window = config.get("window", "1 hour")
    watermark = config.get("watermark")
    from spark_validate.runner import apply_derived_columns

    batch_src = config.get("reference")
    reference = read_source(spark, batch_src) if batch_src else None
    if reference is not None:
        reference = apply_derived_columns(reference, config.get("derived_columns"))
    # Schema default: the STREAM's own files. Defaulting to the reference
    # table would silently null stream-only columns (e.g. doc_id absent
    # from a curated reference) and fabricate all-NULL reads for
    # reference-only columns. The reference is only the fallback for a
    # cold start where the stream directory holds no files yet;
    # ``stream_schema_from`` still overrides explicitly.
    schema_src = config.get("stream_schema_from")
    if schema_src is not None:
        schema = read_source(spark, schema_src).schema
    else:
        try:
            schema = read_source(spark, config["stream"]).schema
        except Exception:
            if batch_src is None:
                raise
            import logging

            logging.getLogger(__name__).warning(
                "stream source %r not yet readable; using the reference schema "
                "until files land (pass stream_schema_from to silence)",
                config["stream"],
            )
            schema = read_source(spark, batch_src).schema
    # watermarks are applied by each check builder (a second withWatermark on
    # the same frame is an error: "Redefining watermark is disallowed")
    stream = apply_derived_columns(
        spark.readStream.schema(schema).parquet(config["stream"]), config.get("derived_columns")
    )

    queries = {}
    # every started query needs a UNIQUE sink path + checkpointLocation: twin
    # checks of one kind over the same column would otherwise collide (the
    # second start() adopts the first query's checkpoint). A user-supplied
    # ``name`` field wins; otherwise collisions get the check index appended.
    used: set = set()

    def uniq(base: str, idx: int) -> str:
        key = base if base not in used else f"{base}__{idx}"
        used.add(key)
        return key

    for check_idx, check_cfg in enumerate(config["checks"]):
        kind = check_cfg["type"]
        if kind in ("column_stats", "drift"):  # per-column kinds key below
            name = uniq(check_cfg.get("name") or _check_name(check_cfg), check_idx)
        if kind == "column_stats":
            stats = streaming_column_stats(
                stream, ts, check_cfg["columns"], window_duration=window, watermark=watermark or window
            )
            if reference is not None:
                import pyspark.sql.functions as F

                # ONE fused reference aggregation for every column (a
                # per-column .agg().first() loop scans the table per column)
                aggs = []
                for c in check_cfg["columns"]:
                    aggs += [F.avg(c).alias(f"{c}__m"), F.stddev_pop(c).alias(f"{c}__s")]
                row = reference.agg(*aggs).first()
                thr: Dict[str, tuple] = {}
                for c in check_cfg["columns"]:
                    m, s = row[f"{c}__m"], row[f"{c}__s"]
                    if m is not None and s is not None:
                        thr[c] = (m - 3 * s, m + 3 * s)
                stats = attach_thresholds(stats, thr)
            queries[name] = _sink(stats, out_dir, name, "append", trigger).start()
        elif kind == "domain":
            for c in check_cfg["columns"]:
                v = streaming_violations(stream, c, domain=check_cfg["domain"])
                # per-column sink path AND checkpoint: two queries sharing one
                # checkpointLocation adopt the same query id and collide.
                # `name` is unique per check (twin-check safe); suffix the
                # column only for multi-column checks (name already ends
                # with the column for single-column ones)
                key = uniq(check_cfg.get("name", kind) + f"__{c}", check_idx)
                queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "unseen":
            import pyspark.sql.functions as F

            if reference is None:
                raise ValueError("unseen check needs a reference table to fit the seen set")
            for c in check_cfg["columns"]:
                seen = [
                    r[0]
                    for r in reference.select(F.col(c).cast("string"))
                    .filter(F.col(c).isNotNull())
                    .distinct()
                    .limit(100_001)
                    .collect()
                ]
                if len(seen) > 100_000:
                    raise ValueError(
                        f"column {c!r} has >100k distinct reference values — an unseen-values "
                        "stream needs a broadcastable seen set; use the batch anti-join check"
                    )
                v = streaming_violations(stream, c, domain=seen)
                key = uniq(check_cfg.get("name", kind) + f"__{c}", check_idx)
                queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "range":
            if reference is None:
                raise ValueError("range check needs a reference table to fit [min, max]")
            import pyspark.sql.functions as F

            # one fused min/max aggregation for all columns (not one scan each)
            aggs = []
            for c in check_cfg["columns"]:
                aggs += [F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi")]
            row = reference.agg(*aggs).first()
            for c in check_cfg["columns"]:
                v = streaming_violations(
                    stream, c, valid_range=(row[f"{c}__lo"], row[f"{c}__hi"])
                )
                key = uniq(check_cfg.get("name", kind) + f"__{c}", check_idx)
                queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "zscore_outliers":
            # reference-fitted mu±zσ row gate on the ingest stream: the fit is
            # a batch job (exact decimal-sum moments); the stream side is a
            # stateless filter per column — the range-check machinery with the
            # z-score label
            if reference is None:
                raise ValueError("zscore_outliers check needs a reference table to fit moments")
            from spark_validate.checks.profile import ZScoreOutlierCalculator

            zcalc = ZScoreOutlierCalculator(
                check_cfg["columns"], z=check_cfg.get("z", 3.0)
            ).fit(reference)
            for c in check_cfg["columns"]:
                mu, sigma, lo, hi = zcalc._bounds[c]
                if mu is None:
                    continue  # all-null reference column: no bounds, no stream
                v = streaming_violations(
                    stream, c, valid_range=(lo, hi), range_kind="zscore_outlier"
                )
                key = uniq(check_cfg.get("name", kind) + f"__{c}", check_idx)
                queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "quantiles":
            # windowed GK-sketch quantile profile (bounded per-window state)
            from spark_validate.streaming.incremental import streaming_quantiles

            qprof = streaming_quantiles(
                stream, ts, check_cfg["columns"],
                quantiles=tuple(check_cfg.get("quantiles", (0.25, 0.5, 0.75, 0.9, 0.99))),
                accuracy=check_cfg.get("accuracy", 10_000),
                window_duration=window, watermark=watermark or window,
            )
            key = uniq(check_cfg.get("name") or _check_name(check_cfg), check_idx)
            queries[key] = _sink(qprof, out_dir, key, "append", trigger).start()
        elif kind == "cardinality":
            # windowed HLL++ distinct count/ratio (approx only on a stream —
            # exact per-window distinct state is unbounded)
            from spark_validate.streaming.incremental import streaming_cardinality

            card = streaming_cardinality(
                stream, ts, check_cfg["columns"], window_duration=window, watermark=watermark or window
            )
            key = uniq(check_cfg.get("name") or _check_name(check_cfg), check_idx)
            queries[key] = _sink(card, out_dir, key, "append", trigger).start()
        elif kind == "freshness":
            # windowed ingest health: row volume, event-time span, bucket
            # fill (HLL++ — bounded per-window state); the batch check owns
            # exact buckets, staleness and the max-gap sort
            from spark_validate.streaming.incremental import streaming_freshness

            fresh = streaming_freshness(
                stream,
                check_cfg.get("column", check_cfg.get("timestamp_column", ts)),
                window_duration=window,
                watermark=watermark or window,
                bucket_seconds=check_cfg.get("bucket_seconds", 60),
                min_rows=check_cfg.get("min_rows"),
                min_bucket_fill=check_cfg.get("min_bucket_fill"),
            )
            key = uniq(
                check_cfg.get("name") or f"freshness__{check_cfg.get('column', ts)}",
                check_idx,
            )
            queries[key] = _sink(fresh, out_dir, key, "append", trigger).start()
        elif kind == "uniqueness":
            # stateful duplicate-key violation stream: one long of state per
            # key, watermark-evicted — the ingest-time uniqueness gate
            from spark_validate.streaming.stateful import streaming_duplicate_keys
            import pyspark.sql.functions as F

            dups = streaming_duplicate_keys(
                stream,
                check_cfg["keys"],
                id_col=check_cfg.get("id_column"),
                event_time_col=ts,
                watermark=watermark or "10 minutes",
                event_ttl=check_cfg.get("event_ttl", "1 hour"),
            )
            v = dups.select(
                F.lit("uniqueness").alias("check"),
                F.lit("+".join(check_cfg["keys"])).alias("column_name"),
                F.col(ts),
                F.col("row_id"),
                F.lit("duplicate_key").alias("violation_kind"),
                F.concat_ws("#", F.col("key"), F.col("occurrence").cast("string")).alias(
                    "observed_value"
                ),
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "caption_consistency":
            # stateful cross-modal conflict stream: state = the group's
            # first non-null caption, watermark-evicted — the ingest gate
            # for conflicting-copy floods (batch check owns retroactive)
            from spark_validate.streaming.stateful import streaming_caption_conflicts
            import pyspark.sql.functions as F

            gcol = check_cfg.get("group_column", "phash")
            ccol = check_cfg.get("caption_column", "caption")
            conf = streaming_caption_conflicts(
                stream,
                group_col=gcol,
                caption_col=ccol,
                id_col=check_cfg.get("id_column"),
                event_time_col=ts,
                watermark=watermark or "10 minutes",
                event_ttl=check_cfg.get("event_ttl", "1 hour"),
            )
            v = conf.select(
                F.lit("caption_consistency").alias("check"),
                F.lit(f"{gcol}+{ccol}").alias("column_name"),
                F.col(ts),
                F.col("row_id"),
                F.lit("caption_conflict").alias("violation_kind"),
                F.concat_ws(" <> ", F.col("first_caption"), F.col("caption")).alias(
                    "observed_value"
                ),
            )
            # own sink key: `name` is only set by column_stats/drift kinds
            key = uniq(check_cfg.get("name") or f"caption_consistency__{gcol}", check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "drift":
            if reference is None:
                raise ValueError("drift check needs a reference table to fit histograms")
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            drift = streaming_univariate_drift(
                # append-mode windowed agg without a watermark fails at query
                # start — default to the window duration like column_stats
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[name] = _sink(drift, out_dir, name, "append", trigger).start()
            calc.release_cache()
        elif kind == "phash_drift":
            if reference is None:
                raise ValueError("phash_drift check needs a reference table to fit")
            from spark_validate.streaming.drift import streaming_phash_drift

            key = uniq(
                check_cfg.get("name") or f"phash_drift__{check_cfg.get('column', 'phash')}",
                check_idx,
            )
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            ph_drift = streaming_phash_drift(
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(ph_drift, out_dir, key, "append", trigger).start()
        elif kind == "vocab_drift":
            if reference is None:
                raise ValueError("vocab_drift check needs a reference table to fit the vocab")
            from spark_validate.streaming.drift import streaming_vocab_drift

            key = uniq(
                check_cfg.get("name") or f"vocab_drift__{check_cfg.get('column', 'text')}",
                check_idx,
            )
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            v_drift = streaming_vocab_drift(
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(v_drift, out_dir, key, "append", trigger).start()
        elif kind == "prior_shift":
            if reference is None:
                raise ValueError("prior_shift check needs a labeled reference to fit tpr/fpr")
            from spark_validate.performance.quantify import PriorShiftEstimator
            from spark_validate.streaming.drift import streaming_prior_shift

            key = uniq(check_cfg.get("name") or "prior_shift", check_idx)
            # no chunker: fit is a pure aggregate and the stream windows by
            # event time — the suite's chunking config has no effect here
            ps_est = PriorShiftEstimator(
                y_true=check_cfg.get("y_true", "y_true"),
                y_pred=check_cfg.get("y_pred", "y_pred"),
                shift_threshold=check_cfg.get("shift_threshold", 0.05),
            ).fit(reference)
            ps = streaming_prior_shift(
                stream, ps_est, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(ps, out_dir, key, "append", trigger).start()
        elif kind == "payload_drift":
            if reference is None:
                raise ValueError("payload_drift check needs a reference table to fit")
            from spark_validate.image.payload import PayloadDriftCheck
            from spark_validate.streaming.drift import streaming_payload_drift

            key = uniq(check_cfg.get("name") or "payload_drift", check_idx)
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            p_chk = PayloadDriftCheck(
                stat_cols=check_cfg.get("stat_columns", ("px_mean", "px_std")),
                continuous_methods=tuple(check_cfg.get("continuous_methods", ("jensen_shannon",))),
                chunker=chunker,
            ).fit(reference)
            p_drift = streaming_payload_drift(
                stream, p_chk, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(p_drift, out_dir, key, "append", trigger).start()
        elif kind == "category_shift":
            if reference is None:
                raise ValueError("category_shift check needs a reference table to fit")
            from spark_validate.streaming.drift import streaming_category_shift

            key = uniq(
                check_cfg.get("name")
                or "category_shift__" + "_".join(check_cfg["columns"]),
                check_idx,
            )
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            c_shift = streaming_category_shift(
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(c_shift, out_dir, key, "append", trigger).start()
        elif kind == "grouped_drift":
            if reference is None:
                raise ValueError("grouped_drift check needs a reference table to fit")
            from spark_validate.streaming.drift import streaming_grouped_drift

            key = uniq(
                check_cfg.get("name")
                or f"grouped_drift__{check_cfg['column']}_{check_cfg['group_column']}",
                check_idx,
            )
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            g_drift = streaming_grouped_drift(
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(g_drift, out_dir, key, "append", trigger).start()
            calc.release_cache()
        elif kind == "correlation_drift":
            if reference is None:
                raise ValueError("correlation_drift check needs a reference table to fit")
            from spark_validate.streaming.drift import streaming_correlation_drift

            cols_tag = "_".join(check_cfg.get("columns") or [f"{x}_{y}" for x, y in check_cfg["pairs"]])
            key = uniq(check_cfg.get("name") or f"correlation_drift__{cols_tag}", check_idx)
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            c_drift = streaming_correlation_drift(
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(c_drift, out_dir, key, "append", trigger).start()
        elif kind == "joint_drift":
            if reference is None:
                raise ValueError("joint_drift check needs a reference table to fit")
            from spark_validate.streaming.drift import streaming_joint_drift

            # own sink key (`name` is only assigned for column_stats/drift
            # kinds — see embedding_drift below for the collision this avoids)
            key = uniq(
                check_cfg.get("name")
                or f"joint_drift__{check_cfg['column_x']}_{check_cfg['column_y']}",
                check_idx,
            )
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            j_drift = streaming_joint_drift(
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(j_drift, out_dir, key, "append", trigger).start()
        elif kind == "embedding_drift":
            if reference is None:
                raise ValueError("embedding_drift check needs a reference table to fit")
            from spark_validate.streaming.drift import streaming_embedding_drift

            # own sink key: `name` is only assigned for column_stats/drift
            # kinds — reusing it here would inherit the PREVIOUS check's
            # sink path and checkpointLocation (state-store collision)
            key = uniq(
                check_cfg.get("name") or f"embedding_drift__{check_cfg.get('column', 'embedding')}",
                check_idx,
            )
            chunker = build_chunker(config.get("chunking", {"chunk_period": "H", "timestamp_column": ts}))
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            emb_drift = streaming_embedding_drift(
                stream, calc, ts, window_duration=window, watermark=watermark or window
            )
            queries[key] = _sink(emb_drift, out_dir, key, "append", trigger).start()
        elif kind == "decontamination":
            # validate the corpus INGEST stream against a static benchmark:
            # stateless stream-static semi join on the broadcast gram
            # universe + one watermarked windowed agg holding state only for
            # docs that touch the benchmark at all
            from spark_validate.text.decontaminate import streaming_ngram_contamination

            v = streaming_ngram_contamination(
                stream,
                read_source(spark, check_cfg["benchmark"]),
                ts_col=ts,
                text_col=check_cfg.get("column", "text"),
                id_col=check_cfg.get("id_column", "doc_id"),
                n=check_cfg.get("n", 5),
                threshold=check_cfg.get("threshold", 0.5),
                window_duration=window,
                watermark=watermark or window,
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "schema":
            # metadata tier runs ONCE at query-build time (the stream's schema
            # is fixed for the query's lifetime) — a broken contract fails
            # before the query starts; the data tier streams required-null
            # violations as a stateless filter
            import pyspark.sql.functions as F

            from spark_validate.checks.schema import SchemaCheck

            sc = SchemaCheck(
                expected=check_cfg["expected"],
                required=check_cfg.get("required", ()),
                allow_extra=check_cfg.get("allow_extra", True),
            )
            bad = [r for r in sc._verdict_rows(dict(stream.dtypes)) if r[3] not in ("ok", "ok_extra")]
            if bad and check_cfg.get("fail_on_schema", True):
                raise ValueError(f"stream schema violates the contract: {bad}")
            present = [c for c in sc.required if c in stream.columns]
            if present:
                cond = F.lit(False)
                for c in present:
                    cond = cond | F.col(c).isNull()
                v = stream.filter(cond).select(
                    F.lit("schema").alias("check"),
                    F.col(ts),
                    F.lit("required_null").alias("violation_kind"),
                    *[F.col(c).isNull().alias(f"{c}_null") for c in present],
                )
                key = uniq(check_cfg.get("name", kind), check_idx)
                queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "payload_header":
            # structural header triage on the ingest stream: magic + header-
            # dim checks compile to substring/hex/conv column expressions —
            # stateless, no watermark, no Python — so bit-rot is caught at
            # scan speed BEFORE any decode pass touches the micro-batch
            import pyspark.sql.functions as F

            from spark_validate.image.header import REAL_SPECS, header_issue_expr, svi0_specs

            if check_cfg.get("specs") == "real":
                specs = REAL_SPECS
            elif check_cfg.get("fmts"):
                specs = svi0_specs(check_cfg["fmts"])
            else:
                from spark_validate.image.synth import FMTS, UNSEEN_FMT

                specs = svi0_specs([*FMTS, UNSEEN_FMT])
            bytes_col = check_cfg.get("column", "bytes")
            id_col = check_cfg.get("id_column", "image_id")
            issue = header_issue_expr(
                F.col(bytes_col),
                F.col(check_cfg.get("fmt_column", "fmt")),
                F.col(check_cfg.get("w_column", "w")),
                F.col(check_cfg.get("h_column", "h")),
                specs,
            )
            v = (
                stream.withColumn("violation_kind", issue)
                .filter(F.col("violation_kind").isNotNull())
                .select(
                    F.lit("payload_header").alias("check"),
                    F.lit(bytes_col).alias("column_name"),
                    F.col(ts),
                    F.col(id_col).cast("string").alias("row_id"),
                    F.col("violation_kind"),
                    F.hex(F.substring(F.col(bytes_col), 1, 16)).alias("observed_value"),
                )
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "payload":
            # north-rule image-payload checks on the stream: stateless Arrow
            # decode per micro-batch (mapInPandas — no state, no watermark),
            # violations = decode failures + pixel-mean outside reference-
            # fitted 3σ bounds (fitted from a bounded batch decode, like the
            # other reference-fitted streaming checks)
            import pyspark.sql.functions as F

            from spark_validate.image.payload import decode_pixel_stats

            # carry the event-time column through the Arrow decode so the
            # violation rows can be placed in time / joined to windows,
            # like every other violation kind in this runner
            stats_stream = decode_pixel_stats(
                stream, partitions=check_cfg.get("partitions"), carry=[ts]
            )
            lo = hi = None
            if reference is not None:
                import math

                sample_n = int(check_cfg.get("reference_sample", 10_000))
                refpx = decode_pixel_stats(reference.limit(sample_n))
                # px_mean is NaN (not NULL) for failed decodes; avg/stddev
                # propagate NaN, and NaN bounds would flag EVERY streamed
                # image (NaN compares greater than any double in Spark)
                row = (
                    refpx.filter(F.col("decode_ok") & ~F.isnan("px_mean"))
                    .agg(F.avg("px_mean").alias("m"), F.stddev_pop("px_mean").alias("s"))
                    .first()
                )
                m, sd = row["m"], row["s"]
                if m is not None and sd is not None and not (math.isnan(m) or math.isnan(sd)):
                    lo, hi = m - 3 * sd, m + 3 * sd
            cond = ~F.col("decode_ok")
            if lo is not None:
                cond = cond | (F.col("px_mean") < lo) | (F.col("px_mean") > hi)
            v = stats_stream.filter(cond).withColumn(
                "violation_kind",
                F.when(~F.col("decode_ok"), F.lit("decode_failure")).otherwise(
                    F.lit("pixel_stat_out_of_range")
                ),
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "fd":
            # streaming functional dependency dets → dep: the determinant
            # tuple becomes one derived key (stateless to_json projection —
            # NULL-safe, collision-free) and the stateful first-value
            # conflict machinery does the rest: state = the group's first
            # non-null dependent, later disagreeing rows emit final
            # violation rows, watermark-evicted. Rows with any NULL
            # determinant carry no identity and are dropped (batch
            # semantics). The batch check owns retroactive reporting.
            import pyspark.sql.functions as F

            from spark_validate.streaming.stateful import streaming_caption_conflicts

            dets = list(check_cfg["determinants"])
            dep = check_cfg["dependent"]
            cond = None
            for c in dets:
                x = F.col(c).isNotNull()
                cond = x if cond is None else (cond & x)
            keyed = stream.filter(cond).withColumn(
                "_sv_fd_key", F.to_json(F.struct(*dets))
            )
            conf = streaming_caption_conflicts(
                keyed,
                group_col="_sv_fd_key",
                caption_col=dep,
                id_col=check_cfg.get("id_column"),
                event_time_col=ts,
                watermark=watermark or "10 minutes",
                event_ttl=check_cfg.get("event_ttl", "1 hour"),
            )
            label = f"{','.join(dets)}->{dep}"
            v = conf.select(
                F.lit("fd").alias("check"),
                F.lit(label).alias("column_name"),
                F.col(ts),
                F.col("row_id"),
                F.lit("fd_violation").alias("violation_kind"),
                F.concat_ws(" <> ", F.col("first_caption"), F.col("caption")).alias(
                    "observed_value"
                ),
            )
            key = uniq(check_cfg.get("name") or f"fd__{'_'.join(dets)}", check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "compliance":
            # named boolean SQL rules on the ingest stream — row-local
            # Catalyst expressions, so the violation stream is a pure
            # stateless filter (the batch check owns per-chunk rates)
            import pyspark.sql.functions as F

            id_col = check_cfg.get("id_column")
            parts = []
            for rname, sql in check_cfg["rules"].items():
                parts.append(
                    stream.filter(~F.coalesce(F.expr(sql), F.lit(False))).select(
                        F.lit("compliance").alias("check"),
                        F.lit(rname).alias("column_name"),
                        F.col(ts),
                        (
                            F.col(id_col).cast("string")
                            if id_col
                            else F.lit(None).cast("string")
                        ).alias("row_id"),
                        F.lit("rule_violation").alias("violation_kind"),
                        F.lit(sql).alias("observed_value"),
                    )
                )
            v = parts[0]
            for p in parts[1:]:
                v = v.unionByName(p)
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "row_completeness":
            # record-level completeness gate: rows with fewer populated
            # fields than min_fraction·n stream out as violations (stateless;
            # the batch check owns per-chunk means)
            import pyspark.sql.functions as F

            from spark_validate.calculators.base import nan_to_null

            cols = check_cfg["columns"]
            dtypes = dict(stream.dtypes)
            nn = None
            for c in cols:
                x = nan_to_null(F.col(c), dtypes[c]).isNotNull().cast("int")
                nn = x if nn is None else nn + x
            cut = float(check_cfg.get("min_fraction", 1.0)) * len(cols)
            id_col = check_cfg.get("id_column")
            v = stream.filter(nn < F.lit(cut)).select(
                F.lit("row_completeness").alias("check"),
                F.lit("+".join(cols)).alias("column_name"),
                F.col(ts),
                (
                    F.col(id_col).cast("string")
                    if id_col
                    else F.lit(None).cast("string")
                ).alias("row_id"),
                F.lit("incomplete_row").alias("violation_kind"),
                F.concat_ws("/", nn.cast("string"), F.lit(str(len(cols)))).alias(
                    "observed_value"
                ),
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "benford":
            # per-window first-digit MAD (the batch check's codegen counters
            # compiled into one windowed aggregation; 10 counters per
            # window × column of state)
            from spark_validate.streaming.incremental import streaming_benford

            bf = streaming_benford(
                stream, ts, check_cfg["columns"],
                window_duration=window, watermark=watermark or window,
                upper_threshold=check_cfg.get("upper_threshold", 0.015),
            )
            key = uniq(check_cfg.get("name") or _check_name(check_cfg), check_idx)
            queries[key] = _sink(bf, out_dir, key, "append", trigger).start()
        elif kind == "pii":
            # PII scrubbing on the ingest stream: the batch check's codegen
            # regex flags are row-local, so the violation stream is a pure
            # stateless filter — no watermark, no state store, scan-speed
            import pyspark.sql.functions as F

            from spark_validate.text.pii import PII_PATTERNS, with_pii_counts

            text_col = check_cfg.get("column", "text")
            id_col = check_cfg.get("id_column", "doc_id")
            kinds = check_cfg.get("kinds") or list(
                check_cfg.get("patterns") or PII_PATTERNS
            )
            counted = with_pii_counts(
                stream, text_col, kinds=kinds, patterns=check_cfg.get("patterns")
            )
            v = counted.filter(F.col("has_pii")).select(
                F.lit("pii").alias("check"),
                F.lit(text_col).alias("column_name"),
                F.col(ts),
                F.col(id_col).cast("string").alias("row_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.when(F.col(f"n_{k}") > 0, F.lit(f"pii_{k}"))
                        for k in kinds
                    ],
                ).alias("violation_kind"),
                F.col("pii_total").cast("string").alias("observed_value"),
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "url_blocklist":
            # blocked-domain citations on the ingest stream — same stateless
            # row-local shape as pii
            import pyspark.sql.functions as F

            from spark_validate.text.urls import domain_match, with_blocklist_flags

            text_col = check_cfg.get("column", "text")
            id_col = check_cfg.get("id_column", "doc_id")
            domains = check_cfg["domains"]
            flagged = with_blocklist_flags(stream, domains, text_col)
            v = flagged.filter(F.col("is_blocked")).select(
                F.lit("url_blocklist").alias("check"),
                F.lit(text_col).alias("column_name"),
                F.col(ts),
                F.col(id_col).cast("string").alias("row_id"),
                F.lit("blocked_domain").alias("violation_kind"),
                F.array_join(
                    F.filter(F.col("hosts"), lambda h: domain_match(h, domains)), " "
                ).alias("observed_value"),
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind == "lm_quality":
            # reference-fitted bigram-LM perplexity on the ingest stream: the
            # model + doc-level 3σ entropy bound fit in batch (like the other
            # reference-fitted streaming checks); each micro-batch is scored
            # STATELESSLY by an Arrow mapInPandas over the broadcast model —
            # a doc is row-local, so no per-doc aggregation state is needed.
            # score_texts is formula-identical to the batch join path
            # (pinned by test_streaming_lm_matches_batch).
            import pandas as pd
            import pyspark.sql.functions as F

            from spark_validate.text.lm import LMQualityCheck

            if reference is None:
                raise ValueError("lm_quality check needs a reference table to fit the model")
            text_col = check_cfg.get("column", "text")
            id_col = check_cfg.get("id_column", "doc_id")
            chk = LMQualityCheck(
                text_col=text_col,
                id_col=id_col,
                std_multiplier=check_cfg.get("std_multiplier", 3.0),
                max_vocab=check_cfg.get("max_vocab", 50_000),
                max_bigrams=check_cfg.get("max_bigrams", 200_000),
            ).fit(reference)
            _, hi = chk._bounds()
            bc = spark.sparkContext.broadcast(chk.lm.get_state())
            out_schema = f"{id_col} string, {ts} timestamp, cross_entropy double"

            def score_batches(batches):
                from spark_validate.text.lm import NgramLMQuality

                lm = NgramLMQuality().set_state(bc.value)
                for pdf in batches:
                    if pdf.empty:
                        continue
                    scored = lm.score_texts(pdf[text_col])
                    yield pd.DataFrame(
                        {
                            id_col: pdf[id_col].astype(str),
                            ts: pdf[ts],
                            "cross_entropy": [h for (_n, h) in scored],
                        }
                    )

            if hi is None:
                # degenerate reference: no bound — nothing can ever alert, so
                # skip the per-batch scoring entirely (a filter(False) ABOVE
                # the mapInPandas would still tokenize and score every row of
                # every micro-batch forever for a guaranteed-empty sink)
                v = stream.select(id_col, ts).filter(F.lit(False)).select(
                    F.col(id_col).cast("string").alias(id_col),
                    F.col(ts),
                    F.lit(None).cast("double").alias("cross_entropy"),
                )
            else:
                scored = stream.select(id_col, ts, text_col).mapInPandas(
                    score_batches, out_schema
                )
                v = scored.filter(F.col("cross_entropy") > F.lit(hi))
            v = v.select(
                F.lit("lm_quality").alias("check"),
                F.lit(text_col).alias("column_name"),
                F.col(ts),
                F.col(id_col).alias("row_id"),
                F.lit("high_perplexity").alias("violation_kind"),
                F.round(F.pow(F.lit(2.0), F.col("cross_entropy")), 3).cast("string").alias(
                    "observed_value"
                ),
            )
            key = uniq(check_cfg.get("name", kind), check_idx)
            queries[key] = _sink(v, out_dir, key, "append", trigger).start()
        elif kind in ("mmd_drift", "calibration_drift", "bin_shift"):
            # the three reference-fitted drift kinds whose streaming
            # builders share the (stream, calc, ts, window, watermark)
            # shape: fit is a batch job, the stream side is one windowed
            # aggregation each (per-window values ≡ batch, pinned by the
            # pytest parity suites)
            if reference is None:
                raise ValueError(f"{kind} check needs a reference table to fit")
            from spark_validate.streaming.drift import (
                streaming_bin_shift,
                streaming_calibration_drift,
                streaming_mmd_drift,
            )

            builder = {
                "mmd_drift": streaming_mmd_drift,
                "calibration_drift": streaming_calibration_drift,
                "bin_shift": streaming_bin_shift,
            }[kind]
            default_key = {
                "mmd_drift": f"mmd_drift__{check_cfg.get('column', 'embedding')}",
                "calibration_drift": "calibration_drift__"
                + check_cfg.get("y_pred_proba", "y_pred_proba"),
                "bin_shift": "bin_shift__" + "_".join(check_cfg.get("columns", ())),
            }[kind]
            key = uniq(check_cfg.get("name") or default_key, check_idx)
            chunker = build_chunker(
                config.get("chunking", {"chunk_period": "H", "timestamp_column": ts})
            )
            calc = build_check(spark, check_cfg, chunker)
            calc.fit(reference)
            res = builder(stream, calc, ts, window_duration=window, watermark=watermark or window)
            queries[key] = _sink(res, out_dir, key, "append", trigger).start()
        else:
            raise ValueError(f"check type {kind!r} is batch-only (run the batch runner for it)")
    return queries
