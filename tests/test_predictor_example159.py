"""Predictor golden test against the reference's shipped end-to-end fixture
(/root/reference/tools/example-159/out.profile.json + out.history.json —
2,424 counts, 3 metrics, states=10, buffersize=1, history=1, fixbound).

The k-step likeliness recursion is deterministic integer-percent math
(predictor/likeliness.go:9-56, math.Round = half away from zero), so its
values on the real fixture are pinned exactly: these assertions fail if
go_round, the direct-ident lookup, or the recursion's accumulate-rounding
semantics drift. Expected vectors were derived with an independent literal
transcription of the Go source and hand-checked against the fixture JSON
(k=1 rows are the raw nextProbs of idents "1"/"9"/"0").
"""

import json
import os

import pytest

from tsprofiler_spark.kernel.predictor import Predictor

FIXTURE_DIR = "/root/reference/tools/example-159"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def profile():
    with open(os.path.join(FIXTURE_DIR, "out.profile.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def history():
    with open(os.path.join(FIXTURE_DIR, "out.history.json")) as f:
        return json.load(f)


def test_fixture_shape(profile, history):
    s = profile["settings"]
    assert (s["states"], s["buffersize"], s["history"], s["fixbound"]) == (10, 1, 1, True)
    assert [t["metric"] for t in profile["roottx"]] == ["metric_0", "metric_1", "metric_2"]
    assert profile["roottx"][0]["stats"]["count"] == 2424
    assert history["historicStates"] == [
        {"metric_0": "1", "metric_1": "9", "metric_2": "0"}
    ]


GOLDEN = {
    1: {
        "metric_0": [10, 78, 12, 0, 0, 0, 0, 0, 0, 0],
        "metric_1": [0, 0, 0, 0, 0, 0, 0, 0, 4, 96],
        "metric_2": [89, 11, 0, 0, 0, 0, 0, 0, 0, 0],
    },
    2: {
        "metric_0": [18, 62, 19, 1, 0, 0, 0, 0, 0, 0],
        "metric_1": [0, 0, 0, 0, 0, 0, 0, 0, 7, 92],
        "metric_2": [81, 18, 0, 0, 0, 0, 0, 0, 0, 0],
    },
    3: {
        "metric_0": [23, 51, 24, 2, 0, 0, 0, 0, 0, 0],
        "metric_1": [0, 0, 0, 0, 0, 0, 0, 0, 10, 89],
        "metric_2": [75, 22, 1, 1, 0, 0, 0, 0, 0, 0],
    },
}


@pytest.mark.parametrize("steps", [1, 2, 3])
def test_k_step_likeliness_golden(profile, history, steps):
    pred = Predictor(profile, mode="roottx", seed=42)
    current = dict(history["historicStates"][0])
    assert pred.likeliness(current, steps) == GOLDEN[steps]


def test_init_state_is_argmax_step_prob(profile):
    """predictor.go:222-244: initial state per metric = ident with the
    highest StepProb. From the fixture: metric_0 "9" (30), metric_1 "0"
    (43), metric_2 "3" (24)."""
    pred = Predictor(profile, mode="roottx", seed=42)
    assert pred.current_state == {"metric_0": "9", "metric_1": "0", "metric_2": "3"}


def test_history_cut_fallback_on_fixture(profile):
    """util.go:29-47: an unknown full ident is cut from the FRONT until a
    known suffix matches. With history=1 idents, "7-1" resolves to "1"."""
    from tsprofiler_spark.kernel.predictor import _find_history

    tx0 = profile["roottx"][0]
    assert _find_history(tx0, "7-1") == tx0["transitions"]["1"]
    assert _find_history(tx0, "unknown") is None


def test_simulate_runs_deterministically_on_fixture(profile, history):
    """Simulation is RNG-dependent (no Go-bit parity claimed) but must be
    deterministic per seed, stay in-range, and honor fixbound value
    reconstruction (util.go:86-95: min + state*round((max-min)/S) + noise)."""
    runs = []
    for _ in range(2):
        pred = Predictor(profile, mode="roottx", seed=159)
        pred.current_state = {
            m: s for m, s in history["historicStates"][0].items()
        }
        runs.append(pred.simulate(steps=25))
    assert runs[0] == runs[1]
    for step_out in runs[0]:
        assert {o["metric"] for o in step_out} == {"metric_0", "metric_1", "metric_2"}
        for o in step_out:
            assert 0 <= o["state"] < 10
            assert 0 <= o["value"] <= 110  # min + 9*10 + bounded noise


def test_counter_rng_walk_matches_independent_replication(profile, history):
    """CounterRng (the SQL-replicable RNG behind predictor_simulate_det)
    must be pure counter arithmetic, and the no-noise kernel walk it
    drives must match an independent in-test replication of the weighted
    choice + argmax-StepProb fallback on the real fixture."""
    from tsprofiler_spark.kernel.predictor import CounterRng

    r = CounterRng(159)
    seq = [r.randrange(100) for _ in range(4)]
    expected = []
    for c in range(4):
        h = (159 * 2654435761 + c * 40503 + 692541) % 2147483647
        expected.append(((16807 * h) % 2147483647) % 100)
    assert seq == expected

    # ident-sort transitions so fallback tie-breaking is pinned (the Go
    # reference iterates a randomized map; any deterministic order is
    # equally faithful — predictor_simulate_det pins min-ident).
    doc = json.loads(json.dumps(profile))
    for tx in doc["roottx"]:
        tx["transitions"] = {k: tx["transitions"][k] for k in sorted(tx["transitions"])}
    pred = Predictor(doc, mode="roottx", rng=CounterRng(159), noise=False)
    pred.current_state = {m: s for m, s in history["historicStates"][0].items()}
    sim = pred.simulate(steps=5)

    # independent replication: one shared counter across metrics per step,
    # iterating metrics in current_state insertion order like the kernel
    cur = dict(history["historicStates"][0])
    rng = CounterRng(159)
    for step_out in sim:
        by_metric = {o["metric"]: o for o in step_out}
        for metric in list(cur):
            tx = next(t for t in doc["roottx"] if t["metric"] == metric)
            step = tx["transitions"].get(cur[metric])
            if step is None:
                best = max(
                    (s for s in tx["transitions"] if tx["transitions"][s]["probability"] > 0),
                    key=lambda s: (tx["transitions"][s]["probability"], [-ord(ch) for ch in s]),
                )
                step = tx["transitions"][best]
            weights = step["nextProbs"]
            total = sum(w for w in weights if w > 0)
            rr = rng.randrange(total)
            acc, nxt = 0, len(weights) - 1
            for i, w in enumerate(weights):
                if w <= 0:
                    continue
                acc += w
                if rr < acc:
                    nxt = i
                    break
            stats = tx["stats"]
            state_size = round((stats["max"] - stats["min"]) / 10)
            want_val = int(stats["min"] + nxt * state_size + 0.5) if state_size > 0 else 0
            got = by_metric[metric]
            assert got["state"] == nxt
            assert got["value"] == want_val
            cur[metric] = str(nxt)
