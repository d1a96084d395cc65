"""Distributed TxMatrix diff/merge vs the kernel oracle, and the
simple-discretize Column formula vs the scalar kernel.

The kernel functions are themselves pinned against the reference goldens
(models/txmatrix_test.go via test_kernel_txmatrix; utils/discretize.go via
test_kernel_discretize), so agreement here chains the relational operators
to the reference fixtures.
"""

import random

import pytest
from pyspark.sql import functions as F

from tsprofiler_spark.config import Settings
from tsprofiler_spark.functions import simple_state
from tsprofiler_spark.kernel.discretize import simple_discretize
from tsprofiler_spark.kernel.stats import TSStats
from tsprofiler_spark.kernel.txmatrix import tx_diff, tx_merge
from tsprofiler_spark.operators.profile import txmatrix_diff, txmatrix_merge

S = 4
SETTINGS = Settings(
    buffer_size=4, states=S, history=1,
    fix_bound=True, fixed_min=0.0, fixed_max=128.0,
)
KEYS = ["k"]


def _kernel_tx(transitions: dict) -> dict:
    return {
        "metric": "m",
        "transitions": {
            i: {"nextProbs": list(v), "probability": 0}
            for i, v in transitions.items()
        },
        "stats": TSStats(),
    }


def _probs_df(spark, transitions: dict, key: str = "x"):
    # sparse form: zero cells dropped — the relational ops must re-densify
    rows = [
        (key, ident, i, int(p))
        for ident, probs in transitions.items()
        for i, p in enumerate(probs)
        if p != 0
    ]
    return spark.createDataFrame(
        rows, "k string, ident string, next_state int, prob_pct int"
    )


# the reference's three golden diff cases (models/txmatrix_test.go:10-62)
TX1 = {"0": [0, 100, 0, 0], "1": [0, 0, 100, 0], "2": [0, 100, 0, 0], "3": [100, 0, 0, 0]}
TX2 = {"0": [100, 0, 0, 0], "1": [0, 0, 0, 100], "2": [50, 0, 0, 50], "3": [0, 0, 0, 100]}
TX3 = {"0": [50, 20, 30, 0], "1": [0, 0, 50, 50], "2": [100, 0, 0, 0], "3": [50, 50, 0, 0]}


@pytest.mark.parametrize(
    "remote,expected_milli", [(TX1, 1000), (TX2, 0), (TX3, 300)]
)
def test_relational_diff_matches_reference_goldens(spark, remote, expected_milli):
    out = txmatrix_diff(
        _probs_df(spark, TX1), _probs_df(spark, remote), SETTINGS, KEYS
    ).collect()
    assert len(out) == 1
    assert out[0].diff_milli == expected_milli


def _random_transitions(rng: random.Random, idents) -> dict:
    out = {}
    for ident in idents:
        probs = [rng.choice([0, 0, 10, 25, 33, 50, 100]) for _ in range(S)]
        if not any(probs):
            probs[rng.randrange(S)] = 100  # corpus probs always have a nonzero cell
        out[ident] = probs
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_relational_diff_and_merge_match_kernel(spark, seed):
    rng = random.Random(seed)
    all_idents = [str(i) for i in range(S)] + ["0-1", "2-3", "1-1"]
    local_idents = rng.sample(all_idents, rng.randrange(2, len(all_idents)))
    remote_idents = rng.sample(all_idents, rng.randrange(2, len(all_idents)))
    local = _random_transitions(rng, local_idents)
    remote = _random_transitions(rng, remote_idents)

    a, b = _probs_df(spark, local), _probs_df(spark, remote)

    kdiff = tx_diff(_kernel_tx(local), _kernel_tx(remote))
    [row] = txmatrix_diff(a, b, SETTINGS, KEYS).collect()
    assert abs(row.diff_milli - kdiff * 1000.0) < 1e-6

    kmerged = _kernel_tx(local)
    tx_merge(kmerged, _kernel_tx(remote))
    got = {
        (r.ident, r.next_state): r.merged_pct
        for r in txmatrix_merge(a, b, SETTINGS, KEYS).collect()
    }
    want = {
        (ident, i): p
        for ident, step in kmerged["transitions"].items()
        for i, p in enumerate(step["nextProbs"])
    }
    assert got == want


@pytest.mark.parametrize(
    "states,vmin,vmax",
    [
        (8, 0.0, 128.0),      # driver-check config: exact step
        (7, -3.2, 9.7),       # inexact step: float boundary accumulation
        (10, 0.0, 1.0),       # step 0.1: classic repeating-binary boundaries
    ],
)
def test_simple_state_column_matches_scalar_kernel(spark, states, vmin, vmax):
    span = vmax - vmin
    values = sorted(
        {vmin + span * k / 40.0 for k in range(-4, 45)}
        | {vmin, vmax, vmin - 1.0, vmax + 1.0}
    )
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = {
        r.v: r.s
        for r in df.select(
            "v", simple_state(F.col("v"), states, vmin, vmax).alias("s")
        ).collect()
    }
    for v in values:
        assert got[v] == simple_discretize(v, states, vmin, vmax), (
            v, states, vmin, vmax,
        )
