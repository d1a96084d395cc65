"""Structured Streaming ingest (streaming/ingest.py): a file-source stream
drained with availableNow through foreachBatch tier MERGEs must produce
tier tables identical to one batch incremental_run over the same data, and
restarting from the offset checkpoint must process only new files
(reference push-ingest analogue: profiler/profiler.go:63-65, 99-133)."""

import os

import pytest

from tsprofiler_spark.config import Settings
from tsprofiler_spark.plans.retention import incremental_run
from tsprofiler_spark.plans.storage import RollupStore
from tsprofiler_spark.sources.transcripts import synthesize_transcripts
from tsprofiler_spark.streaming import (
    process_microbatch,
    start_rollup_stream,
    stream_transcripts,
)

SETTINGS = Settings(fix_bound=True, fixed_min=0.0, fixed_max=128.0, states=6)


def _tier_rows(store, tier):
    df = store.read_tier(tier)
    return sorted(
        (r.conv_id, r.tool, r.role, r.metric, str(r.bucket_start), r.n, r.s1, r.vmin, r.vmax)
        for r in df.collect()
    )


@pytest.fixture()
def transcripts(spark):
    return synthesize_transcripts(
        spark, n_convs=5, max_turns=300, seed=9, step_seconds=600
    ).cache()


def test_stream_equals_batch_and_resumes(spark, transcripts, tmp_path):
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    ckpt = str(tmp_path / "ckpt")

    first = transcripts.where("turn_idx < 150")
    second = transcripts.where("turn_idx >= 150")
    first.coalesce(1).write.parquet(os.path.join(inbox, "drop1"))

    stream_store = RollupStore(spark, str(tmp_path / "stream_store"))
    q = start_rollup_stream(
        stream_transcripts(spark, inbox + "/*", max_files_per_trigger=1),
        stream_store, SETTINGS, ckpt,
    )
    q.awaitTermination(120)

    batch_store = RollupStore(spark, str(tmp_path / "batch_store"))
    incremental_run(first, batch_store, SETTINGS, expire=False)
    for tier in ("1m", "1h", "1d"):
        assert _tier_rows(stream_store, tier) == _tier_rows(batch_store, tier)

    # drop more data; restarting from the same checkpoint must pick up ONLY
    # the new file and converge to the full-batch result
    second.coalesce(1).write.parquet(os.path.join(inbox, "drop2"))
    q2 = start_rollup_stream(
        stream_transcripts(spark, inbox + "/*", max_files_per_trigger=1),
        stream_store, SETTINGS, ckpt,
    )
    q2.awaitTermination(120)

    full_store = RollupStore(spark, str(tmp_path / "full_store"))
    incremental_run(transcripts, full_store, SETTINGS, expire=False)
    for tier in ("1m", "1h", "1d"):
        assert _tier_rows(stream_store, tier) == _tier_rows(full_store, tier)

    # the streaming manifest recorded per-batch lineage
    assert any(
        r["run_id"].startswith("stream-") for r in stream_store.manifest.runs
    )


def test_microbatch_replay_does_not_double_count(spark, transcripts, tmp_path):
    """foreachBatch is at-least-once: a crash between merge and checkpoint
    commit replays the micro-batch with the SAME batch_id. The snapshot
    commit + run_id dedupe must make the replay a no-op."""
    store = RollupStore(spark, str(tmp_path / "s"))
    process_microbatch(transcripts, 0, store)
    before = {t: _tier_rows(store, t) for t in ("1m", "1h", "1d")}
    wm_before = store.manifest.watermark

    # replay: same data, same batch_id (as Structured Streaming would)
    assert process_microbatch(transcripts, 0, store) == []
    for t in ("1m", "1h", "1d"):
        assert _tier_rows(store, t) == before[t], t
    assert store.manifest.watermark == wm_before
    assert len(store.manifest.runs) == 1

    # a NEW batch_id with new data still merges
    more = synthesize_transcripts(
        spark, n_convs=2, max_turns=50, seed=11, step_seconds=600
    )
    process_microbatch(more, 1, store)
    assert len(store.manifest.runs) == 2
    assert _tier_rows(store, "1m") != before["1m"]
