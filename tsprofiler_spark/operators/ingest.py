"""Ingest: transcripts -> per-series numeric observations.

Mirrors the reference's CSV-column -> metric projection
(cmd/csv2tsprofile/main.go:179-193) for the transcripts input shape: the
profiled metric is ``length(text)`` (input_hint), with the series keyed on
(conv_id, tool, role). Pure projection — Catalyst prunes ``text`` out of
downstream numeric-only stages automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsprofiler_spark.functions import series_key_cols

SERIES_COLS = series_key_cols()


def derive_series(transcripts: DataFrame, metric_name: str = "len_text") -> DataFrame:
    """Project (conv_id, tool, role, turn_idx, ts, metric, value)."""
    return transcripts.select(
        *SERIES_COLS,
        "turn_idx",
        "ts",
        F.lit(metric_name).alias("metric"),
        F.length("text").cast("double").alias("value"),
    )


# SQL-portable metric expressions (identical text runs on Spark and DuckDB;
# the word count avoids split()-semantics divergence by counting spaces).
METRIC_EXPRS: dict[str, str] = {
    "len_text": "CAST(length(text) AS DOUBLE)",
    "n_words": (
        "CAST(CASE WHEN length(text) = 0 THEN 0 "
        "ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS DOUBLE)"
    ),
}


def derive_multi_series(
    transcripts: DataFrame, metrics: tuple[str, ...] = ("len_text", "n_words")
) -> DataFrame:
    """Multi-metric projection: one observation row per (turn, metric).

    The reference profiles SEVERAL metrics per time-step (TSInput carries
    one TSInputMetric per CSV column, named metric_<i> —
    cmd/csv2tsprofile/main.go:179-193; example-159 runs 3). Spark shape:
    ``stack(n, 'name', expr, ...)`` — a single JVM-side generator
    projection, no shuffle, no UDF, and every downstream operator already
    partitions by (series, metric) so chunking/counting/rollup work
    unchanged. Chunk boundaries stay aligned across metrics (reference
    closes chunks on input count, profiler.go:107) because each turn emits
    exactly one row per metric, so per-metric ``row_number()`` ranks are
    equal for equal turns.
    """
    if not metrics:
        raise ValueError("derive_multi_series requires at least one metric")
    n = len(metrics)
    pairs = ", ".join(f"'{m}', {METRIC_EXPRS[m]}" for m in metrics)
    return transcripts.selectExpr(
        "conv_id", "tool", "role", "turn_idx", "ts",
        f"stack({n}, {pairs}) AS (metric, value)",
    )


def gap_fill(
    transcripts: DataFrame,
    step_seconds: int = 60,
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Fill missing turn_idx values per conversation — join-free.

    Equivalent to exploding a 0..max(turn_idx) spine per conversation and
    left-joining observed turns (the relational formulation the DuckDB
    oracle uses), but executed as ONE window pass + explode: each observed
    row emits ``sequence(prev_turn + 1, turn_idx)``, so the gap rows
    preceding it are generated in place, carrying the last NON-NULL
    role/tool of any preceding observed row (exactly last-ignorenulls
    LOCF — a NULL role on the immediately previous row falls through to the
    one before it), NULL text, an interpolated ts, and is_filled=true.
    Observed rows keep text/ts unchanged (per-turn text equality
    invariant); a NULL role/tool on an observed row is backfilled the same
    LOCF way, matching the spine-join formulation.

    Duplicate (conv_id, turn_idx) rows are tolerated: the sequence start is
    clamped to turn_idx, so a repeated turn re-emits only itself (never a
    fabricated descending range).

    Why not the join: at 10^12 turns the spine join either broadcasts the
    observed side (driver-sized hash relation — catastrophic) or adds two
    exchanges on (conv_id, turn_idx). The window form needs a single
    exchange on conv_id and no join at all.

    ``payload_cols``: columns carried through the window untouched on
    observed rows and NULL on gap rows (default: the raw ``text``).
    Callers that only need DERIVED metrics downstream pass slim
    pre-computed columns instead (see ``gap_fill_slim``) so the window's
    exchange+sort moves a few doubles per row, not the text payload —
    at 10^12 turns the sort's shuffle volume is the profile pipeline's
    single biggest byte mover.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_prec = w.rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.partitionBy("conv_id")

    annotated = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        *payload_cols,
        "tool",
        "ts",
        F.lag("turn_idx").over(w).alias("prev_turn"),
        F.last("role", ignorenulls=True).over(w_prec).alias("prev_role"),
        F.last("tool", ignorenulls=True).over(w_prec).alias("prev_tool"),
        F.min("ts").over(wc).alias("min_ts"),
        F.min("turn_idx").over(wc).alias("min_turn"),
    )
    exploded = annotated.select(
        "conv_id",
        "role",
        *payload_cols,
        "tool",
        "ts",
        "prev_role",
        "prev_tool",
        "min_ts",
        "min_turn",
        (F.col("turn_idx")).alias("obs_turn"),
        F.explode(
            F.sequence(
                F.least(
                    F.coalesce(F.col("prev_turn") + 1, F.lit(0)), F.col("turn_idx")
                ),
                F.col("turn_idx"),
            )
        ).alias("turn_idx"),
    )
    return _assemble_filled(exploded, step_seconds, payload_cols)


def _assemble_filled(
    exploded: DataFrame, step_seconds: int, payload_cols: tuple[str, ...] = ("text",)
) -> DataFrame:
    """Final projection shared by gap_fill and gap_fill_segmented: observed
    rows keep payload/ts untouched (role/tool LOCF-backfilled when NULL);
    gap rows carry the last non-null preceding role/tool, NULL payload, and
    an interpolated ts."""
    is_obs = F.col("turn_idx") == F.col("obs_turn")
    filled_ts = F.when(is_obs, F.col("ts")).otherwise(
        F.col("min_ts")
        + F.make_interval(
            secs=(F.col("turn_idx") - F.col("min_turn")).cast("double")
            * F.lit(float(step_seconds))
        )
    )
    return exploded.select(
        "conv_id",
        "turn_idx",
        F.when(is_obs, F.coalesce(F.col("role"), F.col("prev_role")))
        .otherwise(F.col("prev_role"))
        .alias("role"),
        *[F.when(is_obs, F.col(c)).alias(c) for c in payload_cols],
        F.when(is_obs, F.coalesce(F.col("tool"), F.col("prev_tool")))
        .otherwise(F.col("prev_tool"))
        .alias("tool"),
        filled_ts.alias("ts"),
        # derived from turn identity, NOT payload nullability: an observed
        # turn whose text is NULL must stay is_filled=false (its value is a
        # real observation, not a LOCF gap)
        (~is_obs).alias("is_filled"),
    )


def gap_fill_segmented(
    transcripts: DataFrame,
    step_seconds: int = 60,
    segment_turns: int = 65536,
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Skew-safe `gap_fill`: identical output, bounded work per task.

    Plain `gap_fill` runs one lag-window per conv_id — a hot conversation
    (north_rule skew case) lands in a single task. Here turn ranges of
    ``segment_turns`` form salted sub-keys: the windows run per
    (conv_id, segment), and the cross-segment state each segment needs —
    its predecessor's last turn_idx, and the last NON-NULL role/tool of
    ALL preceding segments (ignorenulls LOCF must see past a trailing-NULL
    segment) — comes from a tiny per-segment boundary table (one row per
    non-empty segment) windowed and joined back co-partitioned on
    (conv_id, segment). Conversation-level min(ts)/min(turn_idx) likewise
    come from an aggregate of the boundary table instead of a whole-series
    window. Ordering inside groups is untouched: segments partition the
    turn_idx axis monotonically.

    Bound caveat: the per-task bound covers the WINDOW work, not the gap
    explode — a conversation whose turn_idx skips entire segments emits
    the whole multi-segment gap from the one row holding the next
    observation (same explode plain `gap_fill` does). Turn indices in
    transcripts are dense by construction, so cross-segment jumps do not
    occur here; a source with sparse indices at 10^6+ gaps would need the
    explode itself chunked (sequence per covered segment), not just the
    windows.
    """
    from pyspark.sql import Window

    s = transcripts.withColumn(
        "_seg", (F.col("turn_idx") / F.lit(segment_turns)).cast("long")
    )
    w_local = Window.partitionBy("conv_id", "_seg").orderBy("turn_idx")
    w_local_prec = w_local.rowsBetween(Window.unboundedPreceding, -1)
    local = s.select(
        "conv_id",
        "turn_idx",
        "role",
        *payload_cols,
        "tool",
        "ts",
        "_seg",
        F.lag("turn_idx").over(w_local).alias("_lp_turn"),
        F.last("role", ignorenulls=True).over(w_local_prec).alias("_lp_role"),
        F.last("tool", ignorenulls=True).over(w_local_prec).alias("_lp_tool"),
    )

    # per-segment boundary row: last turn, last non-null role/tool (max_by
    # ignores NULL ordering keys, so all-NULL segments yield NULL and the
    # cross-segment last(ignorenulls) below skips them)
    seg = s.groupBy("conv_id", "_seg").agg(
        F.max("turn_idx").alias("_last_turn"),
        F.max_by(
            "role", F.when(F.col("role").isNotNull(), F.col("turn_idx"))
        ).alias("_last_role"),
        F.max_by(
            "tool", F.when(F.col("tool").isNotNull(), F.col("turn_idx"))
        ).alias("_last_tool"),
        F.min("ts").alias("_mts"),
        F.min("turn_idx").alias("_mturn"),
    )
    w_seg = Window.partitionBy("conv_id").orderBy("_seg")
    w_seg_prec = w_seg.rowsBetween(Window.unboundedPreceding, -1)
    boundaries = seg.select(
        "conv_id",
        "_seg",
        F.lag("_last_turn").over(w_seg).alias("_prev_seg_turn"),
        F.last("_last_role", ignorenulls=True).over(w_seg_prec).alias("_prev_seg_role"),
        F.last("_last_tool", ignorenulls=True).over(w_seg_prec).alias("_prev_seg_tool"),
    )
    conv_mins = seg.groupBy("conv_id").agg(
        F.min("_mts").alias("min_ts"), F.min("_mturn").alias("min_turn")
    )

    j = local.join(boundaries, ["conv_id", "_seg"]).join(conv_mins, "conv_id")
    prev_turn = F.coalesce(F.col("_lp_turn"), F.col("_prev_seg_turn"))
    exploded = j.select(
        "conv_id",
        "role",
        *payload_cols,
        "tool",
        "ts",
        F.coalesce(F.col("_lp_role"), F.col("_prev_seg_role")).alias("prev_role"),
        F.coalesce(F.col("_lp_tool"), F.col("_prev_seg_tool")).alias("prev_tool"),
        "min_ts",
        "min_turn",
        F.col("turn_idx").alias("obs_turn"),
        F.explode(
            F.sequence(
                F.least(F.coalesce(prev_turn + 1, F.lit(0)), F.col("turn_idx")),
                F.col("turn_idx"),
            )
        ).alias("turn_idx"),
    )
    return _assemble_filled(exploded, step_seconds, payload_cols)


def gap_fill_slim(
    transcripts: DataFrame,
    metrics: tuple[str, ...] | None = None,
    step_seconds: int = 60,
    segment_turns: int | None = None,
) -> DataFrame:
    """Gap-fill + metric derivation fused, text never enters the shuffle.

    Value-identical to ``derive_series(gap_fill(t))`` (``metrics=None``) or
    ``derive_multi_series(gap_fill(t), metrics)`` — pinned by
    tests/test_gap_fill_slim.py — but the metric expressions are computed at
    the SCAN, so the gap-fill window's exchange+sort carries one double per
    metric instead of the raw text column. At transcript scale the text
    payload dominates that sort's bytes (the profile pipeline's widest
    shuffle); slimming it is the difference between shuffling the corpus
    and shuffling its measurements. Output: (conv_id, tool, role, turn_idx,
    ts, metric, value) with value NULL on gap rows (callers LOCF via
    ``gap_fill_series``, exactly as on the unfused path).
    """
    # None -> single-metric default (the unfused derive_series path); an
    # explicit empty tuple is an error, the SAME contract as
    # derive_multi_series — otherwise build_profile_pipeline(metrics=())
    # would raise or silently profile len_text depending on do_gap_fill
    if metrics is not None and not metrics:
        raise ValueError("gap_fill_slim requires at least one metric")
    single = metrics is None
    mets = ("len_text",) if single else metrics
    vcols = tuple(f"_v{i}" for i in range(len(mets)))
    slim = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        *[
            F.expr(METRIC_EXPRS[m]).alias(v)
            for m, v in zip(mets, vcols)
        ],
    )
    if segment_turns:
        filled = gap_fill_segmented(
            slim, step_seconds=step_seconds, segment_turns=segment_turns,
            payload_cols=vcols,
        )
    else:
        filled = gap_fill(slim, step_seconds=step_seconds, payload_cols=vcols)
    if single:
        # matches derive_series's column order/naming exactly
        return filled.select(
            *SERIES_COLS,
            "turn_idx",
            "ts",
            F.lit("len_text").alias("metric"),
            F.col(vcols[0]).alias("value"),
        )
    pairs = ", ".join(f"'{m}', {v}" for m, v in zip(mets, vcols))
    return filled.selectExpr(
        "conv_id", "tool", "role", "turn_idx", "ts",
        f"stack({len(mets)}, {pairs}) AS (metric, value)",
    )


def filter_outliers(series: DataFrame, k: int) -> DataFrame:
    """Optional REAL outlier filter: drop observations with
    ``|value - avg| >= k * stddev`` per (series, metric).

    The reference computes exactly this predicate per value but DISCARDS the
    result — the value is always appended (utils/outliers.go:5-11; unused
    call profiler/buffer/buffer.go:54-58, "dead code" per SURVEY A5). Parity
    mode therefore never applies it; this operator is the flag-gated live
    version (Settings.filter_stddevs) for engine deployments that want the
    filter the reference intended. Two-pass distributive form: global
    per-series avg/stddev via groupBy, then a co-partitioned filter join.
    ``k <= 0`` (the example-159 setting ``filterstddevs: -1``) disables it.
    """
    if k is None or k <= 0:
        return series
    stats = series.groupBy(*SERIES_COLS, "metric").agg(
        F.avg("value").alias("_avg"), F.stddev_samp("value").alias("_sd")
    )
    joined = series.join(stats, [*SERIES_COLS, "metric"])
    # sd NULL (single obs) or 0 (constant series) keeps everything — the raw
    # reference predicate would call the whole constant series outliers
    keep = (
        F.col("_sd").isNull()
        | (F.col("_sd") == 0.0)
        | (F.abs(F.col("value") - F.col("_avg")) < F.lit(float(k)) * F.col("_sd"))
    )
    return joined.where(keep).select(*series.columns)


def gap_fill_series(series: DataFrame) -> DataFrame:
    """LOCF the metric value over filled rows (value NULL where is_filled)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*SERIES_COLS, "metric")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return series.withColumn(
        "value", F.coalesce(F.col("value"), F.last("value", ignorenulls=True).over(w))
    ).where(F.col("value").isNotNull())  # leading gaps have nothing to carry forward
