"""Parity mode: bit-exact reference semantics per series via applyInPandas.

The order-dependent/lossy reference behaviors — dynamic-bound grid rescale
(utils/txdimension.go), period-tree snapshot merge (period.go:137-177),
phase detection (phase.go:64-206) — are not distributive, so they run as a
sequential fold per series inside an Arrow-batched `applyInPandas` kernel
(vectorized numpy inside the kernel, no per-row Python against Spark rows).

At 100 TB this parallelizes across series (10^6+ conversations): each group
is one conversation-series, state is O(states² · phases), and groups are
hash-distributed by conv_id — the same partitioning the scale-mode
pipeline uses, so no extra shuffle when chained.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from tsprofiler_spark.config import Settings
from tsprofiler_spark.operators.ingest import SERIES_COLS

PARITY_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("tool", StringType()),
        StructField("role", StringType()),
        StructField("profile_json", StringType()),
        StructField("history_json", StringType()),
        StructField("current_phase", IntegerType()),
        StructField("period_path_json", StringType()),
    ]
)


def _fold_series(pdf: pd.DataFrame, settings: Settings):
    """Replay one series through ReferenceProfiler: the shared ingest of the
    parity queries (profiles/phases). Returns the fed profiler; ``pdf`` is
    re-sorted in place to reference arrival order first."""
    import numpy as np

    from tsprofiler_spark.kernel.profiler import ReferenceProfiler

    pdf.sort_values(["ts", "turn_idx", "metric"], kind="mergesort", inplace=True)
    prof = ReferenceProfiler(settings)
    # Fast path: when every turn carries the same metric set (the normal
    # shape — one sorted metric tile per (ts, turn_idx)), the sorted
    # frame reshapes to a dense (n_turns, n_metrics) value matrix and
    # the kernel ingests whole chunks vectorized (put_block), skipping
    # the per-turn pandas groupby that dominated the fold cost.
    metric_names = sorted(pdf["metric"].unique().tolist())
    n_m = len(metric_names)
    vals = pdf["value"].to_numpy(dtype=np.float64)
    # duplicate (ts, turn_idx) rows must take the exact groupby path:
    # the fold groups them into ONE put() (one TSInput), while the
    # dense reshape would treat each as its own turn — with n_m == 1
    # the tile checks below can't see the difference, so gate on
    # uniqueness explicitly
    dense = (
        len(pdf) % n_m == 0
        and not pdf.duplicated(["ts", "turn_idx", "metric"]).any()
    )
    if dense:
        n_turns = len(pdf) // n_m
        mets = pdf["metric"].to_numpy().reshape(n_turns, n_m)
        dense = bool((mets == np.array(metric_names)).all())
        if dense and n_m > 1:
            # each tile row must be ONE turn (constant (ts, turn_idx))
            tk = pdf["turn_idx"].to_numpy().reshape(n_turns, n_m)
            ts = pdf["ts"].to_numpy().reshape(n_turns, n_m)
            dense = bool((tk == tk[:, :1]).all() and (ts == ts[:, :1]).all())
    if dense:
        prof.put_block(metric_names, vals.reshape(n_turns, n_m))
    else:
        # ragged metric sets: exact per-turn replay
        for (_, _), turn in pdf.groupby(["ts", "turn_idx"], sort=True):
            prof.put(list(zip(turn["metric"], turn["value"])))
    return prof


def parity_profiles(series: DataFrame, settings: Settings) -> DataFrame:
    """One full reference profile per (conv_id, tool, role) series.

    Input: the `derive_series` long format (turn_idx, ts, metric, value).
    Multi-metric turns are grouped on (ts, turn_idx) so each put() carries
    every metric of that turn, exactly like the reference's TSInput.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        prof = _fold_series(pdf, settings)
        doc = prof.get_profile()
        hist = prof.get_history()
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                {
                    "conv_id": first["conv_id"],
                    "tool": first["tool"],
                    "role": first["role"],
                    "profile_json": json.dumps(doc, sort_keys=True),
                    "history_json": json.dumps(hist, sort_keys=True),
                    "current_phase": prof.get_current_phase(),
                    "period_path_json": json.dumps(prof.get_current_period_path()),
                }
            ]
        )

    return series.groupBy(*SERIES_COLS).applyInPandas(fold, PARITY_SCHEMA)


PHASES_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("tool", StringType()),
        StructField("role", StringType()),
        StructField("chunk_idx", IntegerType()),
        StructField("phase_id", IntegerType()),
        StructField("n_phases", IntegerType()),
    ]
)


def parity_phases(series: DataFrame, settings: Settings) -> DataFrame:
    """Per-chunk phase assignments from the reference phase fold.

    One row per closed chunk: (chunk_idx, phase_id, n_phases) where
    phase_id = the pointer the chunk was counted into (including the
    create-new-phase off-by-one, phase.go:145-148) and n_phases = the
    counter-list length after the chunk. This exposes the float32
    likeliness-threshold clustering (phase.go:64-206) — the last
    reference kernel section without a driver value check (r3 verdict
    ask #4) — as a relation an exact DuckDB replay can hash-compare.

    Same scale shape as parity_profiles: one Arrow-batched fold per
    series, hash-distributed on the series key.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        prof = _fold_series(pdf, settings)
        if not prof.phase_trace:
            # series shorter than one chunk: no phase rows (pandas cannot
            # broadcast the scalar keys against zero-length columns)
            return pd.DataFrame(
                columns=[f.name for f in PHASES_SCHEMA.fields]
            ).astype({"chunk_idx": int, "phase_id": int, "n_phases": int})
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "conv_id": first["conv_id"],
                "tool": first["tool"],
                "role": first["role"],
                "chunk_idx": range(len(prof.phase_trace)),
                "phase_id": [p for p, _ in prof.phase_trace],
                "n_phases": [n for _, n in prof.phase_trace],
            }
        )

    return series.groupBy(*SERIES_COLS).applyInPandas(fold, PHASES_SCHEMA)


PHASE_TX_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("tool", StringType()),
        StructField("role", StringType()),
        StructField("kind", StringType()),
        StructField("phase_id", IntegerType()),
        StructField("metric", StringType()),
        StructField("ident", StringType()),
        StructField("next_state", IntegerType()),
        StructField("prob_pct", IntegerType()),
        StructField("step_prob", IntegerType()),
        StructField("stat_min", DoubleType()),
        StructField("stat_max", DoubleType()),
        StructField("stat_avg", DoubleType()),
        StructField("stat_stddev", DoubleType()),
        StructField("stat_count", IntegerType()),
        StructField("stat_ssum", DoubleType()),
    ]
)


def parity_phase_tx(series: DataFrame, settings: Settings) -> DataFrame:
    """The FINAL phase matrices from the reference phase fold.

    One row per matrix cell of the Phases document (phase.go:176-199):
    kind='phase' rows are each phase counter's integer-percent transition
    grid (Counter.get_tx, counter.go:196-212); kind='phasetx' rows
    (phase_id=-1, metric='phasetx') are the phase-transition counter's
    grid — the one whose state count grows with the phase list and
    rescales through the issue-#5 change_dimension quirk
    (phase.go:156-172, counter.go:91-93,123-145). Every cell row also
    carries its matrix's stats block (min/max/avg/stddev/count/stddevsum
    — the per-phase merge_global_stats fold, counter.go:148-156).
    Together with parity_roottx / parity_tree / parity_phases this
    value-checks every section of the profile document, stats included.

    Same scale shape as parity_profiles: one Arrow-batched fold per
    series, hash-distributed on the series key.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        prof = _fold_series(pdf, settings)
        doc = prof.phase.get_phases_tx()
        rows: list[tuple] = []
        for pid, txs in enumerate(doc["phases"]):
            for tx in txs:
                st = tx["stats"]
                for ident, step in tx["transitions"].items():
                    for j, p in enumerate(step["nextProbs"]):
                        rows.append(
                            ("phase", pid, tx["metric"], ident, j, p,
                             step["probability"], st.min, st.max, st.avg,
                             st.stddev, st.count, st.stddev_sum)
                        )
        tx = doc["tx"]
        if tx is not None:
            st = tx["stats"]
            for ident, step in tx["transitions"].items():
                for j, p in enumerate(step["nextProbs"]):
                    rows.append(
                        ("phasetx", -1, tx["metric"], ident, j, p,
                         step["probability"], st.min, st.max, st.avg,
                         st.stddev, st.count, st.stddev_sum)
                    )
        if not rows:
            # series shorter than one chunk: no matrices
            return pd.DataFrame(
                columns=[f.name for f in PHASE_TX_SCHEMA.fields]
            ).astype(
                {"phase_id": int, "next_state": int,
                 "prob_pct": int, "step_prob": int, "stat_min": float,
                 "stat_max": float, "stat_avg": float, "stat_stddev": float,
                 "stat_count": int, "stat_ssum": float}
            )
        first = pdf.iloc[0]
        return pd.DataFrame(
            {
                "conv_id": first["conv_id"],
                "tool": first["tool"],
                "role": first["role"],
                "kind": [r[0] for r in rows],
                "phase_id": [r[1] for r in rows],
                "metric": [r[2] for r in rows],
                "ident": [r[3] for r in rows],
                "next_state": [r[4] for r in rows],
                "prob_pct": [r[5] for r in rows],
                "step_prob": [r[6] for r in rows],
                "stat_min": [r[7] for r in rows],
                "stat_max": [r[8] for r in rows],
                "stat_avg": [r[9] for r in rows],
                "stat_stddev": [r[10] for r in rows],
                "stat_count": [r[11] for r in rows],
                "stat_ssum": [r[12] for r in rows],
            }
        )

    return series.groupBy(*SERIES_COLS).applyInPandas(fold, PHASE_TX_SCHEMA)
