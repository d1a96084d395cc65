"""Pin the relational period-tree model used by the parity_tree oracle.

The driver query `parity_tree` value-checks the sequential period-tree fold
(kernel/period.py, reference profiler/period/period.go:66-177) against a
DuckDB SQL re-derivation. That re-derivation rests on four semantic claims
about the kernel (see plans/entry_queries_pipeline.py parity_tree
docstring); this test pins each claim directly against the kernel on random
state sequences, so a future kernel edit that breaks a claim fails HERE
with a named sequence instead of as an opaque driver hash mismatch.

No Spark session needed — pure kernel + arithmetic.
"""

from __future__ import annotations

import random

from tsprofiler_spark.kernel.counter import TSState
from tsprofiler_spark.kernel.period import Period
from tsprofiler_spark.kernel.stats import TSStats

STATES = 8
PERIOD = (4, 6)


def _run_kernel(seq: list[int]) -> dict:
    per = Period(history=1, states=STATES, buffer_size=4, period_size=list(PERIOD))
    for st in seq:
        per.count(
            [
                TSState(
                    metric="m",
                    state=st,
                    stats=TSStats(
                        min=0.0, max=128.0, avg=50.0, count=4, stddev_sum=0.0
                    ),
                )
            ]
        )
    tree = per.get_tx()
    root = tree.root if hasattr(tree, "root") else tree
    out = {}
    for p, child in enumerate(root.children):
        for tx in child.txmatrix:
            for ident, step in tx["transitions"].items():
                out[(p, ident)] = (
                    list(step["nextProbs"]),
                    step["probability"],
                )
    return out


def _run_model(seq: list[int], reset_on_wrap: bool = False) -> dict:
    """The exact integer re-derivation the DuckDB oracle implements.

    ``reset_on_wrap=True`` builds the WRONG variant (counter reset on the
    position wrap at 24) so tests can assert the kernel does NOT behave
    that way."""

    def w_start(k: int) -> int:
        # level-0 counter resets at k ≡ 6,12,18 (mod 24); NOT on the
        # position wrap at 24 (period.py returns before reset on wrap)
        j = (k // 6) * 6
        if j == 0:
            return 0
        if j % 24 == 0 and not reset_on_wrap:
            return j - 6
        return j

    prev = [0] + list(seq[:-1])

    def snapshot(k: int, ident: int):
        lo = w_start(k)
        cnt = [0] * STATES
        rowsum = 0
        for i in range(lo, k + 1):
            if prev[i] == ident:
                cnt[seq[i]] += 1
                rowsum += 1
        if rowsum == 0:
            return None
        # go_round(100*cnt/rowsum) in pure integers
        return [(200 * c + rowsum) // (2 * rowsum) for c in cnt]

    out = {}
    for p in range(PERIOD[0]):
        ks = [k for k in range(len(seq)) if (k // 6) % PERIOD[0] == p]
        if not ks:
            continue
        ident = prev[ks[0]]
        v = snapshot(ks[0], ident)
        for k in ks[1:]:
            s = snapshot(k, ident)
            if s is None:
                continue  # tx_merge skips idents absent from the snapshot
            # go_round((v+s)/2) == (v+s+1)//2 for non-negative ints
            v = [(a + b + 1) // 2 for a, b in zip(v, s)]
        out[(p, str(ident))] = (v, 100)  # probability frozen at 1st snapshot
    return out


def test_tree_fold_matches_relational_model_fuzz():
    rng = random.Random(159)
    for trial in range(300):
        n = rng.randint(1, 80)
        seq = [rng.randint(0, STATES - 1) for _ in range(n)]
        assert _run_kernel(seq) == _run_model(seq), (trial, seq)


def test_tree_fold_wrap_does_not_reset_counter():
    """The quirk the oracle's w_start encodes: the window crossing the
    position wrap at chunk 24 keeps accumulating from chunk 18."""
    # chunks 18-23 are state 0, chunk 24 (the wrap) is state 5, all under
    # ident 0 — so chunk 24's snapshot depends on whether the window
    # starts at 18 (no reset: 6×state0 + 1×state5) or at 24 (reset:
    # 1×state5 only)
    seq = [0] * 24 + [5] * 6
    kern = _run_kernel(seq)
    # the model with the no-reset rule reproduces the kernel exactly
    assert kern == _run_model(seq)
    # and a model WITH a reset at 24 does NOT match: node 0's merged
    # probs flip from [87,...,14] to [2,...,99]
    wrong = _run_model(seq, reset_on_wrap=True)
    assert kern != wrong
    assert kern[(0, "0")][0] != wrong[(0, "0")][0]


def test_tree_probability_frozen_at_first_snapshot():
    for seq in ([0, 1, 2, 3, 4, 5, 6, 7] * 5, [5] * 30, [1, 2] * 20):
        for (_, _), (_, prob) in _run_kernel(seq).items():
            assert prob == 100
