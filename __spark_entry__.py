"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship profile pipeline on sf0.001;
`queries()` exposes every implemented operator; `oracle_sql()` provides
the DuckDB-equivalent ANSI SQL for the driver's side-by-side compare.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tsprofiler-style profile (root TxMatrix + stats per
    (conv_id, tool, role) series) over transcripts derived from sf0.001."""
    from pyspark.sql import functions as F

    from tsprofiler_spark.plans.entry_queries import SETTINGS
    from tsprofiler_spark.plans.pipeline import run_profile
    from tsprofiler_spark.sources.transcripts import transcripts_from_events

    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    profile = run_profile(t, SETTINGS, do_gap_fill=False)
    return profile.select(
        "conv_id", "tool", "role", "metric",
        F.col("profile_json"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tsprofiler_spark.plans.entry_queries import QUERIES
    from tsprofiler_spark.plans.entry_queries_pipeline import PIPELINE_QUERIES

    return {**QUERIES, **PIPELINE_QUERIES}


def oracle_sql() -> dict[str, str]:
    from tsprofiler_spark.plans.entry_queries import ORACLE
    from tsprofiler_spark.plans.entry_queries_pipeline import PIPELINE_ORACLE

    return {**ORACLE, **PIPELINE_ORACLE}
