"""TxMatrix diff/merge/probability parity fixtures ported from
/root/reference/models/txmatrix_test.go:10-147 and
utils/txprobabilities.go semantics."""

import numpy as np

from tsprofiler_spark.kernel.rounding import go_round
from tsprofiler_spark.kernel.stats import TSStats
from tsprofiler_spark.kernel.txmatrix import (
    compute_probabilities,
    tx_diff,
    tx_likeliness_single,
    tx_merge,
)


def _tx(transitions):
    return {
        "metric": "m",
        "transitions": {
            k: {"nextProbs": v, "probability": 0} for k, v in transitions.items()
        },
        "stats": TSStats(),
    }


TX1 = _tx({"0": [0, 100, 0, 0], "1": [0, 0, 100, 0], "2": [0, 100, 0, 0], "3": [100, 0, 0, 0]})
TX2 = _tx({"0": [100, 0, 0, 0], "1": [0, 0, 0, 100], "2": [50, 0, 0, 50], "3": [0, 0, 0, 100]})
TX3 = _tx({"0": [50, 20, 30, 0], "1": [0, 0, 50, 50], "2": [100, 0, 0, 0], "3": [50, 50, 0, 0]})


def test_diff_golden():
    assert tx_diff(TX1, TX1) == 1.0
    assert tx_diff(TX1, TX2) == 0.0
    assert tx_diff(TX1, TX3) == 0.3


def test_go_round():
    assert go_round(0.5) == 1.0
    assert go_round(-0.5) == -1.0
    assert go_round(2.5) == 3.0  # away from zero, not banker's
    assert go_round(2.4) == 2.0
    assert go_round(-2.5) == -3.0


def test_compute_probabilities():
    probs = compute_probabilities({"0": [1, 2, 0], "1": [0, 0, 0]}, max_count=10.0)
    assert probs["0"]["nextProbs"] == [33, 67, 0]
    assert probs["0"]["probability"] == 30
    assert probs["1"]["nextProbs"] == [0, 0, 0]
    assert probs["1"]["probability"] == 0


def test_merge_is_elementwise_average():
    local = _tx({"0": [0, 100, 0, 0], "9": [10, 20, 30, 40]})
    remote = _tx({"0": [100, 0, 0, 0]})
    tx_merge(local, remote)
    assert local["transitions"]["0"]["nextProbs"] == [50, 50, 0, 0]
    # remote-missing ident untouched
    assert local["transitions"]["9"]["nextProbs"] == [10, 20, 30, 40]


def test_likeliness_history_cut():
    tx = _tx({"2": [0, 0, 0, 100]})
    # reference quirk (models/txmatrix.go:67-74): the cut loop recomputes the
    # ident at iteration start under `len > 1`, so a 2-element history whose
    # full ident misses NEVER tries the single-element ident -> 0
    assert tx_likeliness_single(tx, [1, 2], 3) == np.float32(0.0)
    # a single-element history IS tried directly
    assert tx_likeliness_single(tx, [2], 3) == np.float32(1.0)
    assert tx_likeliness_single(tx, [0], 3) == np.float32(0.0)
    # 3-element history cuts down to the 2-element ident
    tx2 = _tx({"1-2": [0, 0, 0, 50]})
    assert tx_likeliness_single(tx2, [0, 1, 2], 3) == np.float32(0.5)
