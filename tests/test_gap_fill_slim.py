"""gap_fill_slim (fused scan-side metric derivation) must be value-identical
to the unfused derive∘gap_fill path it replaces in the profile pipeline —
including the adversarial cases the unfused operators already pin: NULL
role/tool on observed rows (LOCF backfill), NULL text on an OBSERVED row
(value NULL but is_filled stays false upstream), duplicate (conv_id,
turn_idx), leading gaps (spine starts at 0), and segmented mode."""

import datetime

from pyspark.sql import Row

from tsprofiler_spark.operators.ingest import (
    derive_multi_series,
    derive_series,
    gap_fill,
    gap_fill_segmented,
    gap_fill_slim,
)

TS0 = datetime.datetime(2025, 1, 1, 0, 0, 0)


def _tricky(spark):
    def t(conv, idx, role, text, tool, mins):
        return Row(
            conv_id=conv, turn_idx=idx, role=role, text=text, tool=tool,
            ts=TS0 + datetime.timedelta(minutes=mins),
        )

    rows = [
        # conv a: leading gap (first observed turn is 2), NULL role on an
        # observed row, NULL text on an observed row, interior gaps
        t("a", 2, "user", "hello world", "search", 2),
        t("a", 3, None, None, None, 3),
        t("a", 6, "tool", "x y z", "exec", 6),
        t("a", 9, "assistant", "", "exec", 9),
        # conv b: duplicate turn_idx, single series
        t("b", 0, "user", "one", "none", 0),
        t("b", 1, "assistant", "two tokens", "none", 1),
        t("b", 1, "assistant", "two tokens", "none", 1),
        t("b", 5, "user", "after a gap", "none", 5),
        # conv c: all roles NULL (LOCF has nothing to carry)
        t("c", 1, None, "solo", None, 1),
    ]
    return spark.createDataFrame(rows)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()],
        key=lambda x: tuple((v is None, str(v)) for v in x),
    )


def test_slim_single_metric_equals_unfused(spark):
    t = _tricky(spark)
    slim = gap_fill_slim(t, None, step_seconds=60)
    unfused = derive_series(gap_fill(t, step_seconds=60))
    assert slim.columns == unfused.columns
    assert _rows(slim) == _rows(unfused)


def test_slim_multi_metric_equals_unfused(spark):
    t = _tricky(spark)
    mets = ("len_text", "n_words")
    slim = gap_fill_slim(t, mets, step_seconds=60)
    unfused = derive_multi_series(gap_fill(t, step_seconds=60), mets)
    assert slim.columns == unfused.columns
    assert _rows(slim) == _rows(unfused)


def test_slim_segmented_equals_unfused(spark):
    t = _tricky(spark)
    mets = ("len_text", "n_words")
    slim = gap_fill_slim(t, mets, step_seconds=60, segment_turns=4)
    unfused = derive_multi_series(
        gap_fill_segmented(t, step_seconds=60, segment_turns=4), mets
    )
    assert _rows(slim) == _rows(unfused)
    # and segmented slim == plain slim (the segmentation is an execution
    # detail, never a semantics change)
    assert _rows(slim) == _rows(gap_fill_slim(t, mets, step_seconds=60))


def test_slim_on_synth_corpus(spark):
    """Whole-corpus equality on the deterministic synthetic corpus (the
    exact frame the scaling pipeline feeds)."""
    from tsprofiler_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=40, max_turns=120, seed=7)
    slim = gap_fill_slim(t, None, step_seconds=60)
    unfused = derive_series(gap_fill(t, step_seconds=60))
    diff = slim.exceptAll(unfused).count() + unfused.exceptAll(slim).count()
    assert diff == 0


def test_slim_empty_metrics_tuple_raises_like_derive_multi(spark):
    """metrics=() (falsy but not None) must raise exactly like
    derive_multi_series — never generate `stack(0, )` (ADVICE r3) and
    never silently fall back to the single-metric default, which would
    make build_profile_pipeline(metrics=()) crash or silently profile
    len_text depending on do_gap_fill. None stays the default path."""
    import pytest

    t = _tricky(spark)
    with pytest.raises(ValueError, match="at least one metric"):
        gap_fill_slim(t, (), step_seconds=60)
    with pytest.raises(ValueError, match="at least one metric"):
        derive_multi_series(t, ())
    assert _rows(gap_fill_slim(t, None, step_seconds=60))
