"""Markov transition counter.

Faithful re-expression of reference: profiler/counter/counter.go. Key
semantics preserved bit-exactly:

* per-metric global stats with Min sentinel -1 and weighted 2-way mean
  folds in chunk arrival order (counter.go:113-156);
* dynamic-bound grid rescale via change_dimension whenever the global
  min/max expand (counter.go:123-145);
* the current-state window is initialized to ``history`` zero-states, so
  the first chunk counts a transition from synthetic state 0
  (counter.go:159-162);
* one increment per history *suffix*: with history=2 and window [a, b],
  both ident "a-b" and ident "b" are incremented (counter.go:164-185);
* float32 likeliness arithmetic (counter.go:48-79).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tsprofiler_spark.kernel.stats import TSStats, merge_global_stats
from tsprofiler_spark.kernel.txdimension import change_dimension
from tsprofiler_spark.kernel.txmatrix import compute_probabilities, ident_of


@dataclass
class TSState:
    """Discretized chunk of one metric (models/tsstate.go:4-8)."""

    metric: str
    state: int
    stats: TSStats = field(default_factory=TSStats)


class Counter:
    """Counts state transitions and running stats per metric."""

    def __init__(self, history: int, states: int, buffer_size: int):
        self.history = history
        self.states = states
        self.buffer_size = buffer_size
        self.current_state: dict[str, list[int]] = {}
        self.state_change_counters: dict[str, dict[str, list[int]]] = {}
        self.stats: dict[str, TSStats] = {}

    # -- configuration -----------------------------------------------------

    def update(self, states: int) -> None:
        """Grow the state count (used by phase-tx, counter.go:91-93)."""
        self.states = states

    # -- counting ----------------------------------------------------------

    def count_all(self, tsstates: list[TSState]) -> None:
        for tsstate in tsstates:
            self.count(tsstate)

    def count(self, tsstate: TSState) -> None:
        metric = tsstate.metric

        if metric not in self.stats:
            self.stats[metric] = TSStats(min=-1.0)

        stats = tsstate.stats
        global_stats = self.stats[metric].copy()
        if global_stats.min == -1:
            global_stats.min = stats.min
            global_stats.max = stats.max
        dim_changed = False
        if global_stats.min > stats.min:
            global_stats.min = stats.min
            dim_changed = True
        if global_stats.max < stats.max:
            global_stats.max = stats.max
            dim_changed = True
        if dim_changed:
            self.state_change_counters[metric] = change_dimension(
                self.state_change_counters.get(metric, {}),
                self.stats[metric],
                stats,
                self.states,
            )

        # Shared with the distributed fold: the avg/count/stddev part of the
        # merge is exactly stats.merge_global_stats (counter.go:148-156);
        # min/max sentinel handling stays local above.
        self.stats[metric] = merge_global_stats(global_stats, stats)

        if metric not in self.current_state:
            self.current_state[metric] = [0] * self.history
        previous = list(self.current_state[metric])
        while len(previous) > 0:
            ident = ident_of(previous)
            if metric not in self.state_change_counters:
                self.state_change_counters[metric] = {}
            if ident not in self.state_change_counters[metric]:
                self.state_change_counters[metric][ident] = [0] * self.states
            self.state_change_counters[metric][ident][tsstate.state] += 1
            previous = previous[1:]

        if len(self.current_state[metric]) > 0:
            self.current_state[metric] = self.current_state[metric][1:]
        self.current_state[metric].append(tsstate.state)

    # -- queries -------------------------------------------------------------

    def likeliness(self, next_states: list[TSState]) -> np.float32:
        """P of observing ``next_states`` given current windows
        (counter.go:48-79); float32; NaN when nothing matched."""
        count = np.float32(0)
        lsum = np.float32(0)
        for tsstate in next_states:
            previous = self.current_state.get(tsstate.metric)
            if previous is None:
                continue
            ident = ident_of(previous)
            counts = self.state_change_counters.get(tsstate.metric, {}).get(ident, [])
            total = sum(counts)
            if len(counts) <= tsstate.state:
                continue
            prob = np.float32(counts[tsstate.state]) / np.float32(total)
            lsum += prob
            count += np.float32(1)
        with np.errstate(invalid="ignore", divide="ignore"):
            return lsum / count

    def total_counts(self) -> int:
        return sum(s.count for s in self.stats.values())

    def get_tx(self) -> list[dict]:
        """Probability matrices per metric (counter.go:196-212).

        Metric order = first-counted order (Go map iteration is random;
        we pin insertion order for determinism — comparisons key on metric).
        """
        out = []
        for metric, counters in self.state_change_counters.items():
            stats = self.stats[metric]
            max_count = float(stats.count) / float(self.buffer_size)
            transitions = compute_probabilities(counters, max_count)
            out.append(
                {"metric": metric, "transitions": transitions, "stats": stats.copy()}
            )
        return out

    def get_stats(self) -> dict[str, TSStats]:
        return self.stats

    # -- resets --------------------------------------------------------------

    def reset(self) -> None:
        self.current_state = {}
        self.state_change_counters = {}
        self.stats = {}

    def reset_counters(self) -> None:
        self.state_change_counters = {}

    def reset_stats(self) -> None:
        self.stats = {}
