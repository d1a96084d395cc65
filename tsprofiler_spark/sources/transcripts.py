"""Transcript sources.

Two deterministic sources of the `input_hint` table shape
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``:

* ``transcripts_from_events`` — a pure-SQL derivation from the driver's
  ``events`` table, expressible identically in DuckDB so every downstream
  pipeline stage stays oracle-comparable.
* ``synthesize_transcripts`` — a fully distributed generator (spark.range +
  JVM expressions, zero Python in the data path) with Zipf-skewed
  conversation sizes, sinusoidal text-length dynamics and ~10% missing
  turns, per FIXTURES.md F1. Scales to arbitrary row counts because every
  value is a hash of (conv_id, turn_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsprofiler_spark.sources.tables import load_table

# Derivation of the transcripts table from `events`, written once and used
# verbatim on BOTH engines (Spark SQL and DuckDB) so driver value-hashes match.
# role cycles user/assistant/tool by turn_idx; text deterministically embeds
# the numeric `value` as padding so length(text) carries the series dynamics.
# Nullable columns are coalesced inside concat: Spark's concat propagates
# NULL while DuckDB's skips it, so un-coalesced NULL props/event_type/value
# would make the two engines derive different transcripts tables (value is
# coalesced to 0 INSIDE repeat for the same reason). conv_id padding is
# conditional because lpad TRUNCATES strings longer than the pad width on
# both engines — a bare lpad(...,4) would alias user 14999 onto user 1499's
# conversation at larger scale factors.
TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  concat('conv-', CASE WHEN length(CAST(user_id AS STRING)) > 4
                       THEN CAST(user_id AS STRING)
                       ELSE lpad(CAST(user_id AS STRING), 4, '0') END) AS conv_id,
  CAST(seq AS INT)                                                  AS turn_idx,
  CASE CAST(seq % 3 AS INT)
    WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END      AS role,
  concat(coalesce(event_type, ''), ' ', coalesce(props, ''), ' ',
         repeat('x', GREATEST(0, CAST(FLOOR(coalesce(value, 0)) AS INT) % 97)))  AS text,
  event_type                                                        AS tool,
  ts
FROM (
  SELECT user_id, event_type, props, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS seq
  FROM events
) e
""".strip()


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    df = spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)
    # VARCHAR is DuckDB spelling; Spark parses it as string — same plan either way
    return df


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    max_turns: int = 200,
    seed: int = 42,
    gap_pct: int = 10,
    zipf: bool = True,
    base_ts: str = "2025-01-01 00:00:00",
    step_seconds: int = 60,
) -> DataFrame:
    """Deterministic synthetic transcripts at any scale, fully JVM-side.

    Conversation c gets ``ceil(max_turns / rank_factor)`` turns (Zipf-ish
    skew: conv 0 is the hot key), turn t of conv c exists unless
    ``xxhash64(seed, c, t) % 100 < gap_pct``. Text length follows a
    sinusoid + hash noise so discretized states and periods are non-trivial.
    """
    convs = spark.range(n_convs).select(
        F.col("id").alias("conv_no"),
        F.concat(
            F.lit("conv-"), F.lpad(F.col("id").cast("string"), 6, "0")
        ).alias("conv_id"),
        (
            F.ceil(
                F.lit(max_turns)
                / F.when(F.lit(zipf), F.pow(F.col("id") + 1, F.lit(0.7))).otherwise(1.0)
            ).cast("int")
        ).alias("n_turns"),
    )

    turns = convs.select(
        "conv_no",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h = F.abs(F.xxhash64(F.lit(seed), F.col("conv_no"), F.col("turn_idx")))
    # ~gap_pct% of turns are missing to exercise gap-fill
    turns = turns.where((h % 100) >= F.lit(gap_pct))

    role = F.when(F.col("turn_idx") % 3 == 0, "user").when(
        F.col("turn_idx") % 3 == 1, "assistant"
    ).otherwise("tool")
    tool = F.element_at(
        F.array(F.lit("none"), F.lit("search"), F.lit("exec"), F.lit("browse")),
        (F.abs(F.xxhash64(F.lit(seed + 1), F.col("conv_no"))) % 4 + 1).cast("int"),
    )
    # sinusoidal target length in [8, 88] + hash noise in [0, 8]
    length = (
        F.lit(48)
        + (F.lit(40) * F.sin(F.col("turn_idx") * F.lit(6.283185307179586 / 32.0)))
        + (h % 9)
    ).cast("int")
    length = F.greatest(F.lit(8), length)
    # deterministic printable text of exactly `length` chars; round-trips
    # byte-exact through ingest (per-turn text equality invariant)
    df = (
        turns.withColumn("_len", length)
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            role.alias("role"),
            F.expr(
                "substring(repeat('loremipsum dolorsit ametconsectetur adipiscing elitsed ', 4), 1, _len)"
            ).alias("text"),
            tool.alias("tool"),
            (
                F.to_timestamp(F.lit(base_ts))
                + F.make_interval(
                    secs=F.col("turn_idx").cast("double") * F.lit(float(step_seconds))
                )
            ).alias("ts"),
        )
    )
    return df
