"""Retention-tier rollup + compression tests."""

import pytest
from pyspark.sql import functions as F

from tsprofiler_spark.config import DEFAULT_TIERS, Settings
from tsprofiler_spark.operators.compress import compress_points, decompress_points
from tsprofiler_spark.operators.ingest import derive_series
from tsprofiler_spark.operators.rollup import (
    apply_ttl,
    build_tiers,
    rollup_from_series,
    tier_transitions,
)
from tsprofiler_spark.sources.transcripts import synthesize_transcripts

SETTINGS = Settings(states=6, fix_bound=True, fixed_min=0.0, fixed_max=128.0)


@pytest.fixture(scope="module")
def series(spark):
    t = synthesize_transcripts(spark, n_convs=8, max_turns=300, seed=3, step_seconds=45)
    return derive_series(t).cache()


def test_cascade_equals_direct(series):
    """1h cascaded from 1m must equal 1h computed directly from raw
    (distributive partials are exact)."""
    tiers = build_tiers(series, SETTINGS)
    direct_1h = rollup_from_series(series, "1h", SETTINGS)
    cascaded_1h = tiers["1h"]
    cols = ["conv_id", "tool", "role", "metric", "bucket_start", "n", "s1", "vmin", "vmax", "state"]
    assert cascaded_1h.select(cols).exceptAll(direct_1h.select(cols)).count() == 0
    assert direct_1h.select(cols).exceptAll(cascaded_1h.select(cols)).count() == 0


def test_tier_counts_conserve(series):
    tiers = build_tiers(series, SETTINGS)
    total = series.count()
    for name, df in tiers.items():
        assert df.agg(F.sum("n")).collect()[0][0] == total, name


def test_tier_transitions_probs_sum(series):
    tiers = build_tiers(series, SETTINGS)
    tx = tier_transitions(tiers["1h"])
    sums = (
        tx.groupBy("conv_id", "tool", "role", "metric", "ident")
        .agg(F.sum("prob_pct").alias("s"), F.count("*").alias("k"))
        .collect()
    )
    for r in sums:
        assert 100 - r.k <= r.s <= 100 + r.k  # int rounding slack


def test_compress_roundtrip(series):
    tiers = build_tiers(series, SETTINGS)
    tier_1m = tiers["1m"]
    compressed = compress_points(tier_1m)
    decoded = decompress_points(compressed)
    orig = tier_1m.select(
        "conv_id", "tool", "role", "metric", "tier", "bucket_start", "avg"
    )
    assert decoded.exceptAll(orig).count() == 0
    assert orig.exceptAll(decoded).count() == 0
    # compression actually compresses a regular series
    sizes = compressed.select(
        F.sum(F.length("ts_dod") + F.length("points_gorilla")).alias("blob"),
        (F.sum("n_points") * 16).alias("raw"),
    ).collect()[0]
    assert sizes.blob < sizes.raw


def test_ttl_expiry(series):
    tiers = build_tiers(series, SETTINGS)
    wm = series.agg(F.max("ts")).collect()[0][0]
    kept = apply_ttl(tiers["1m"], "1m", DEFAULT_TIERS, wm)
    assert kept.count() == tiers["1m"].count()  # synth span << 30d TTL
    tight = {"1m": {"ttl_days": 0}}
    kept0 = apply_ttl(tiers["1m"], "1m", tight, wm)
    assert kept0.count() < tiers["1m"].count()


def test_downsample_m4_semantics(spark):
    """M4 keeps exactly (first, last, min, max) per bucket with the pinned
    tie rules: first/last by (ts, turn_idx); min breaks value ties to the
    EARLIEST occurrence, max to the LATEST (lexicographic struct order).
    Checked against a brute-force python fold, with planted value ties and
    shuffled arrival order."""
    from tsprofiler_spark.operators.rollup import downsample_m4

    t = synthesize_transcripts(spark, n_convs=4, max_turns=120, seed=11, step_seconds=20)
    series = derive_series(t)
    # plant value ties inside buckets: quantize value to 3 levels
    series = series.withColumn("value", (F.col("value") % 3).cast("double"))
    # arrival order must not matter
    series = series.repartition(16)

    got = {
        (r.conv_id, r.tool, r.role, r.metric, r.bucket_start): r
        for r in downsample_m4(series, "1m").collect()
    }

    import collections
    groups = collections.defaultdict(list)
    for r in series.collect():
        bucket = r.ts.replace(second=0, microsecond=0)
        groups[(r.conv_id, r.tool, r.role, r.metric, bucket)].append(r)
    assert set(got) == set(groups)
    for key, rows in groups.items():
        first = min(rows, key=lambda r: (r.ts, r.turn_idx))
        last = max(rows, key=lambda r: (r.ts, r.turn_idx))
        mn = min(rows, key=lambda r: (r.value, r.ts, r.turn_idx))
        mx = max(rows, key=lambda r: (r.value, r.ts, r.turn_idx))
        g = got[key]
        assert g.n == len(rows)
        assert g.v_first == first.value and g.v_last == last.value
        assert (g.vmin, g.t_min) == (mn.value, mn.ts)
        assert (g.vmax, g.t_max) == (mx.value, mx.ts)
        # the M4 envelope property: every value in the bucket is bounded
        assert all(g.vmin <= r.value <= g.vmax for r in rows)


def test_anomaly_zscore_matches_numpy(series):
    """z-scores and flags vs a numpy recomputation from the same milli-unit
    bucket averages (the operator's documented canonicalization)."""
    import collections
    import math

    from tsprofiler_spark.operators.rollup import anomaly_zscore

    t1m = rollup_from_series(series, "1m", SETTINGS)
    got = {
        (r.conv_id, r.tool, r.role, r.metric, r.bucket_start): r
        for r in anomaly_zscore(t1m, k=2.0).collect()
    }

    groups = collections.defaultdict(list)
    for r in t1m.collect():
        u = math.floor(r.s1 / r.n * 1000 + 0.5)
        groups[(r.conv_id, r.tool, r.role, r.metric)].append((r.bucket_start, r.n, u))
    assert len(got) == sum(len(v) for v in groups.values())
    for key, buckets in groups.items():
        us = [u for _, _, u in buckets]
        n_b = len(us)
        s, q = sum(us), sum(u * u for u in us)
        for bucket_start, n, u in buckets:
            g = got[key + (bucket_start,)]
            assert (g.n, g.avg_mu, g.n_buckets) == (n, u, n_b)
            var = (q - s * s / n_b) / (n_b - 1) if n_b > 1 else 0.0
            if n_b > 1 and var > 0:
                z = (u - s / n_b) / math.sqrt(var)
                assert g.z_u == math.floor(z * 1e6 + 0.5)
                assert g.is_anomaly == int(abs(z) > 2.0)
            else:
                assert g.z_u is None and g.is_anomaly == 0


def test_anomaly_zscore_flags_planted_outlier(spark):
    """A z-score over near-constant buckets can never exceed (n-1)/sqrt(n),
    so a planted 10x spike among 9 flat buckets (max z ~2.85) must be the
    ONLY flagged bucket."""
    import datetime as dt

    from tsprofiler_spark.operators.rollup import anomaly_zscore

    base = dt.datetime(2025, 1, 1)
    rows = [
        ("c0", "t", "user", "len_text", "1m",
         base + dt.timedelta(minutes=i), 2, 20.0 if i < 9 else 200.0)
        for i in range(10)
    ]
    tier = spark.createDataFrame(
        rows,
        "conv_id string, tool string, role string, metric string, "
        "tier string, bucket_start timestamp, n long, s1 double",
    )
    out = anomaly_zscore(tier, k=2.0).collect()
    flagged = [r for r in out if r.is_anomaly]
    assert len(flagged) == 1
    assert flagged[0].avg_mu == 100000  # 200/2 * 1000 milli-units
    assert all(r.n_buckets == 10 for r in out)


def test_tier_delta_semantics(series):
    """delta/gap vs a python fold over the same milli-unit bucket chain."""
    import collections
    import math

    from tsprofiler_spark.operators.rollup import tier_delta

    t1m = rollup_from_series(series, "1m", SETTINGS)
    got = {
        (r.conv_id, r.tool, r.role, r.metric, r.bucket_start): r
        for r in tier_delta(t1m).collect()
    }
    groups = collections.defaultdict(list)
    for r in t1m.collect():
        u = math.floor(r.s1 / r.n * 1000 + 0.5)
        groups[(r.conv_id, r.tool, r.role, r.metric)].append((r.bucket_start, u))
    for key, buckets in groups.items():
        buckets.sort()
        prev = None
        for ts, u in buckets:
            g = got[key + (ts,)]
            assert g.avg_mu == u
            if prev is None:
                assert g.prev_avg_mu is None and g.delta_mu is None and g.gap_us is None
            else:
                assert g.prev_avg_mu == prev[1]
                assert g.delta_mu == u - prev[1]
                assert g.gap_us == int((ts - prev[0]).total_seconds() * 1e6)
                assert g.gap_us >= 60_000_000  # 1m tier: gaps are >= one bucket
            prev = (ts, u)


def test_topk_series_daily(series):
    """Exactly min(k, cardinality) rows per day, ranked by total_n with the
    pinned total-order tie-break, matching a python recomputation."""
    import collections

    from tsprofiler_spark.operators.rollup import topk_series_daily

    t1m = rollup_from_series(series, "1m", SETTINGS)
    rows = topk_series_daily(t1m, k=3).collect()
    per_day = collections.defaultdict(list)
    for r in rows:
        per_day[r.day].append(r)

    totals = collections.defaultdict(lambda: collections.defaultdict(int))
    for r in t1m.collect():
        day = r.bucket_start.replace(hour=0, minute=0, second=0, microsecond=0)
        totals[day][(r.conv_id, r.tool, r.role, r.metric)] += r.n

    for day, top in per_day.items():
        top.sort(key=lambda r: r.rank)
        expected = sorted(
            totals[day].items(), key=lambda kv: (-kv[1], kv[0])
        )[: len(top)]
        assert [(r.conv_id, r.tool, r.role, r.metric) for r in top] == [
            k for k, _ in expected
        ]
        assert [r.total_n for r in top] == [v for _, v in expected]
        assert len(top) == min(3, len(totals[day]))
