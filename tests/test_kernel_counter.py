"""Counter / profiler behavior tests pinning reference semantics
(profiler/counter/counter.go, profiler/profiler.go)."""

import numpy as np

from tsprofiler_spark.config import Settings
from tsprofiler_spark.kernel.counter import Counter, TSState
from tsprofiler_spark.kernel.profiler import ReferenceProfiler
from tsprofiler_spark.kernel.stats import TSStats


def _state(metric, state, avg=None, count=1, vmin=0.0, vmax=100.0):
    return TSState(
        metric=metric,
        state=state,
        stats=TSStats(min=vmin, max=vmax, avg=avg if avg is not None else state * 10.0, count=count),
    )


def test_zero_state_seeding():
    # first chunk counts a transition from synthetic state 0 (counter.go:159-162)
    c = Counter(history=1, states=4, buffer_size=1)
    c.count(_state("m", 2))
    assert c.state_change_counters["m"] == {"0": [0, 0, 1, 0]}


def test_suffix_idents_history_2():
    # with history=2 and window [a, b], idents "a-b" AND "b" are incremented
    # (counter.go:164-185)
    c = Counter(history=2, states=3, buffer_size=1)
    for s in [1, 2, 0]:
        c.count(_state("m", s, vmin=0.0, vmax=100.0))
    m = c.state_change_counters["m"]
    # chunk1: window [0,0] -> idents "0-0","0" count state 1
    # chunk2: window [0,1] -> idents "0-1","1" count state 2
    # chunk3: window [1,2] -> idents "1-2","2" count state 0
    assert m["0-0"] == [0, 1, 0]
    assert m["0"] == [0, 1, 0]
    assert m["0-1"] == [0, 0, 1]
    assert m["1"] == [0, 0, 1]
    assert m["1-2"] == [1, 0, 0]
    assert m["2"] == [1, 0, 0]


def test_global_stats_weighted_fold():
    c = Counter(history=1, states=4, buffer_size=2)
    c.count(TSState("m", 0, TSStats(min=0, max=100, avg=10.0, count=2, stddev_sum=3.0)))
    c.count(TSState("m", 1, TSStats(min=0, max=100, avg=30.0, count=2, stddev_sum=5.0)))
    st = c.stats["m"]
    assert st.avg == 20.0
    assert st.count == 4
    assert st.stddev_sum == 8.0
    assert abs(st.stddev - np.sqrt(8.0 / 4.0)) < 1e-12


def test_dynamic_bound_rescale_trigger():
    # expanding max triggers change_dimension against the incoming chunk bounds
    c = Counter(history=1, states=4, buffer_size=1)
    c.count(TSState("m", 3, TSStats(min=50, max=55, avg=54.0, count=1)))
    assert "0" in c.state_change_counters["m"]
    c.count(TSState("m", 2, TSStats(min=0, max=100, avg=50.0, count=1)))
    # old grid (50,55) remapped onto (0,100)
    assert c.stats["m"].min == 0
    assert c.stats["m"].max == 100


def test_profiler_example159_config_shape():
    """example-159 settings: states=10, buffersize=1, history=1, fixbound 0-100.

    Pins the profile JSON shape and the int-percent arithmetic at a realistic
    config (the reference fixture's input CSV is not in the repo, so values
    are checked against the kernel itself on synthetic data; shape/fields
    match /root/reference/tools/example-159/out.profile.json)."""
    settings = Settings(
        buffer_size=1, states=10, history=1, filter_stddevs=-1,
        fix_bound=True, fixed_min=0.0, fixed_max=100.0, name="csv2tsprofile",
    )
    prof = ReferenceProfiler(settings)
    rng = np.random.default_rng(159)
    # three metrics per input row, like the fixture
    for i in range(200):
        prof.put([
            ("metric_0", float(50 + 40 * np.sin(i / 20) + rng.normal(0, 5))),
            ("metric_1", float(np.clip(rng.normal(20, 10), 0, 100))),
            ("metric_2", float(np.clip(rng.normal(25, 15), 0, 100))),
        ])
    doc = prof.get_profile()
    assert {t["metric"] for t in doc["roottx"]} == {"metric_0", "metric_1", "metric_2"}
    for tx in doc["roottx"]:
        assert tx["stats"]["count"] == 200
        assert tx["stats"]["min"] == 0 and tx["stats"]["max"] == 100
        for ident, step in tx["transitions"].items():
            assert len(step["nextProbs"]) == 10
            assert all(isinstance(p, int) for p in step["nextProbs"])
            rowsum = sum(step["nextProbs"])
            assert 95 <= rowsum <= 105 or rowsum == 0  # int-percent rounding
    # buffersize=1 => stddevsum telescopes to 0 like the fixture
    assert all(t["stats"]["stddevsum"] == 0 for t in doc["roottx"])
    hist = prof.get_history()
    assert set(hist["historicStates"][0].keys()) == {"metric_0", "metric_1", "metric_2"}
    assert hist["periodPath"] == []


def test_profiler_period_tree_and_phases_run():
    settings = Settings(
        buffer_size=2, states=4, history=1, fix_bound=True,
        fixed_min=0.0, fixed_max=100.0, period_size=(3, 4),
        phase_change_likeliness=0.5, phase_change_history=3,
    )
    prof = ReferenceProfiler(settings)
    rng = np.random.default_rng(1)
    prof.put_series(rng.uniform(0, 100, 120))
    doc = prof.get_profile()
    root = doc["periodTree"]["root"]
    assert root["maxChilds"] == 3
    assert len(root["children"]) == 3
    # level-0 counter writes into depth-1 nodes; root has no matrix
    assert root["txmatrix"] == []
    assert any(ch["txmatrix"] for ch in root["children"])
    assert len(doc["phases"]["phases"]) >= 1
    assert doc["phases"]["tx"]["metric"] == "phasetx"


def test_put_block_bit_exact_vs_put():
    """put_block (vectorized parity-fold ingest) must be bit-exact vs the
    per-turn put() path: multi-metric, dynamic bounds (rescale), period
    tree + phases, incomplete trailing chunk, and a mid-stream handoff
    between the two APIs."""
    import json

    settings = Settings(
        buffer_size=3, states=5, history=2, fix_bound=False,
        period_size=(3, 4), phase_change_likeliness=0.5, phase_change_history=4,
    )
    rng = np.random.default_rng(159)
    metrics = ["m_a", "m_b"]
    vals = np.round(rng.uniform(0, 120, size=(101, 2)), 3)  # 101 % 3 != 0

    slow = ReferenceProfiler(settings)
    for row in vals:
        slow.put(list(zip(metrics, row)))

    fast = ReferenceProfiler(settings)
    fast.put_block(metrics, vals)
    assert json.dumps(fast.get_profile(), sort_keys=True) == json.dumps(
        slow.get_profile(), sort_keys=True
    )
    assert fast.get_history() == slow.get_history()

    # handoff: 2 per-turn puts (partial buffer) then a block
    mixed = ReferenceProfiler(settings)
    for row in vals[:2]:
        mixed.put(list(zip(metrics, row)))
    mixed.put_block(metrics, vals[2:])
    assert json.dumps(mixed.get_profile(), sort_keys=True) == json.dumps(
        slow.get_profile(), sort_keys=True
    )

    # a block containing the exact -1.0 buffer sentinel falls back per-turn
    v2 = vals.copy()
    v2[50, 1] = -1.0
    s2 = ReferenceProfiler(settings)
    for row in v2:
        s2.put(list(zip(metrics, row)))
    f2 = ReferenceProfiler(settings)
    f2.put_block(metrics, v2)
    assert json.dumps(f2.get_profile(), sort_keys=True) == json.dumps(
        s2.get_profile(), sort_keys=True
    )

    # a block containing NaN also falls back per-turn: the sequential fold's
    # < / > comparisons skip NaN while np.min/np.max would propagate it
    v3 = vals.copy()
    v3[40, 0] = np.nan
    s3 = ReferenceProfiler(settings)
    for row in v3:
        s3.put(list(zip(metrics, row)))
    f3 = ReferenceProfiler(settings)
    f3.put_block(metrics, v3)
    assert json.dumps(f3.get_profile(), sort_keys=True) == json.dumps(
        s3.get_profile(), sort_keys=True
    )


def test_predictor_noise_survives_zero_max():
    """predictor/util.go:86-95 divides stddev/max unguarded; with a
    non-fixed-bound all-negative series the buffer's pinned Max zero-init
    keeps stats max at 0, and Go's float64 division yields Inf/NaN instead
    of crashing. simulate(noise=True) must return values, not raise."""
    from tsprofiler_spark.kernel.predictor import Predictor

    settings = Settings(buffer_size=2, states=4, history=1, fix_bound=False)
    prof = ReferenceProfiler(settings)
    rng = np.random.default_rng(7)
    for v in rng.uniform(-120, -5, size=40):
        prof.put([("m", float(v))])
    doc = prof.get_profile()
    assert doc["roottx"][0]["stats"]["max"] == 0.0  # the quirk under test

    pred = Predictor(doc, mode="roottx", seed=11, noise=True)
    sim = pred.simulate(5)
    assert len(sim) == 5
    for step in sim:
        for m in step:
            assert isinstance(m["value"], int)
