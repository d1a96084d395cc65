"""Parity-mode applyInPandas plan: the distributed fold must equal a direct
single-process kernel run per series, including period tree + phases and
dynamic (non-fixed) bounds."""

import json

import pytest

from tsprofiler_spark.config import Settings
from tsprofiler_spark.kernel.profiler import ReferenceProfiler
from tsprofiler_spark.operators.ingest import derive_series
from tsprofiler_spark.plans.parity import parity_profiles
from tsprofiler_spark.sources.transcripts import synthesize_transcripts

SETTINGS = Settings(
    buffer_size=3,
    states=5,
    history=2,
    fix_bound=False,  # dynamic bounds: exercises change_dimension rescale
    period_size=(3, 4),
    phase_change_likeliness=0.5,
    phase_change_history=4,
)


@pytest.mark.parametrize("fix_bound", [False, True])
def test_parity_plan_matches_direct_kernel(spark, fix_bound):
    settings = Settings(
        buffer_size=SETTINGS.buffer_size,
        states=SETTINGS.states,
        history=SETTINGS.history,
        fix_bound=fix_bound,
        fixed_min=0.0,
        fixed_max=128.0,
        period_size=SETTINGS.period_size,
        phase_change_likeliness=SETTINGS.phase_change_likeliness,
        phase_change_history=SETTINGS.phase_change_history,
    )
    t = synthesize_transcripts(spark, n_convs=6, max_turns=150, seed=11)
    series = derive_series(t)
    spark_out = {
        (r.conv_id, r.tool, r.role): r
        for r in parity_profiles(series, settings).collect()
    }

    rows = series.orderBy("conv_id", "tool", "role", "ts", "turn_idx").collect()
    direct = {}
    for r in rows:
        key = (r.conv_id, r.tool, r.role)
        if key not in direct:
            direct[key] = ReferenceProfiler(settings)
        direct[key].put([(r.metric, r.value)])

    assert set(spark_out) == set(direct)
    for key, prof in direct.items():
        expected = json.dumps(prof.get_profile(), sort_keys=True)
        got = spark_out[key].profile_json
        assert got == expected, key
        assert spark_out[key].current_phase == prof.get_current_phase()
        assert json.loads(spark_out[key].period_path_json) == prof.get_current_period_path()


def test_parity_duplicate_turn_rows_take_grouped_semantics(spark):
    """Duplicate (ts, turn_idx) rows are grouped into ONE put() (one
    reference TSInput), exactly like the documented multi-metric grouping —
    the dense put_block fast path must not silently treat each duplicate as
    its own turn (it shifts every later chunk boundary)."""
    from pyspark.sql import functions as F

    settings = Settings(
        buffer_size=3, states=5, history=1,
        fix_bound=True, fixed_min=0.0, fixed_max=128.0,
    )
    t = synthesize_transcripts(spark, n_convs=2, max_turns=40, seed=7)
    series = derive_series(t)
    # plant duplicates: re-emit every 10th row (same ts, turn_idx, metric)
    dup = series.where(F.col("turn_idx") % 10 == 0)
    with_dups = series.unionByName(dup)

    spark_out = {
        (r.conv_id, r.tool, r.role): r.profile_json
        for r in parity_profiles(with_dups, settings).collect()
    }

    rows = with_dups.orderBy(
        "conv_id", "tool", "role", "ts", "turn_idx", "metric"
    ).collect()
    direct: dict = {}
    groups: dict = {}
    for r in rows:
        key = (r.conv_id, r.tool, r.role)
        groups.setdefault(key, {}).setdefault((r.ts, r.turn_idx), []).append(
            (r.metric, r.value)
        )
    for key, turns in groups.items():
        prof = ReferenceProfiler(settings)
        for turn_key in sorted(turns):
            prof.put(turns[turn_key])
        direct[key] = json.dumps(prof.get_profile(), sort_keys=True)

    assert spark_out == direct
