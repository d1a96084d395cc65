"""Phase detection.

Faithful re-expression of reference: profiler/phase/phase.go:64-206.
Likeliness-threshold clustering of chunks into phases, a sliding float32
likeliness window with optional linear fadeout, plus a 1-metric phase
transition counter whose state count grows with the phase list. Reference
quirks preserved:

* NaN current likeliness (empty counter) is treated as 1 (phase.go:69-72);
* when creating a new phase, the pointer is set to ``len(counters)-1``
  *before* append — i.e. the previous last phase, not the new one
  (phase.go:145-148);
* the lookup scan excludes the newest history item and feeds the incoming
  states as the final "next" step (phase.go:106-138).
"""

from __future__ import annotations

import math

import numpy as np

from tsprofiler_spark.kernel.counter import Counter, TSState
from tsprofiler_spark.kernel.stats import TSStats
from tsprofiler_spark.kernel.txmatrix import tx_likeliness_multi


class Phase:
    def __init__(
        self,
        history: int,
        states: int,
        buffer_size: int,
        phase_likeliness: float,
        phase_history: int,
        phase_history_fadeout: bool,
    ):
        self.history = history
        self.states = states
        self.buffer_size = buffer_size
        self.threshold_likeliness = np.float32(phase_likeliness)
        self.threshold_history = int(phase_history)
        self.fadeout = phase_history_fadeout

        self.phase_counters = [Counter(history, states, buffer_size)]
        self.phase_pointer = 0
        self.phase_tx_counter = Counter(1, 1, 1)
        self.states_history: list[list[TSState]] = []
        self.likeliness_history: list[np.float32] = []

    def count(self, tsstates: list[TSState]) -> None:
        current = self.phase_counters[self.phase_pointer].likeliness(tsstates)
        if math.isnan(float(current)):
            current = np.float32(1)
        self.likeliness_history.append(np.float32(current))
        if len(self.likeliness_history) > self.threshold_history:
            self.likeliness_history = self.likeliness_history[1:]

        hsum = np.float32(0)
        csum = 0
        for i, lk in enumerate(self.likeliness_history):
            if self.fadeout:
                hsum += lk * np.float32(i + 1)
                csum += i + 1
            else:
                hsum += lk
        if self.fadeout:
            history_likeliness = hsum / np.float32(csum)
        else:
            history_likeliness = hsum / np.float32(len(self.likeliness_history))

        if history_likeliness < self.threshold_likeliness:
            # look for a better matching phase
            new_pointer = -1
            for i, phase_counter in enumerate(self.phase_counters):
                if i == self.phase_pointer:
                    continue
                txmatrices = phase_counter.get_tx()
                history = self.states_history[: len(self.states_history) - 1]

                lsum = np.float32(0)
                for j, history_step in enumerate(history):
                    if (j + 1) < len(history):
                        next_state = history[j + 1]
                    else:
                        next_state = tsstates
                    l = tx_likeliness_multi(txmatrices, [history_step], next_state)
                    lsum += l
                with np.errstate(invalid="ignore", divide="ignore"):
                    phase_likeliness = lsum / np.float32(len(history))

                if history_likeliness < phase_likeliness and phase_likeliness > self.threshold_likeliness:
                    new_pointer = i
                    history_likeliness = phase_likeliness
            if new_pointer != -1:
                self.phase_pointer = new_pointer
            else:
                # create a new phase — pointer lands on the OLD last phase
                # (reference off-by-one, phase.go:145-148)
                phase_id = len(self.phase_counters) - 1
                self.phase_counters.append(
                    Counter(self.history, self.states, self.buffer_size)
                )
                self.phase_pointer = phase_id

        self.phase_counters[self.phase_pointer].count_all(tsstates)

        # phase-to-phase transition counting (1-metric counter, growing states)
        phase_tsstate = TSState(
            metric="phasetx",
            state=self.phase_pointer,
            stats=TSStats(
                min=0.0,
                max=float(len(self.phase_counters)),
                stddev=0.0,
                avg=0.0,
                count=1,
                stddev_sum=0.0,
            ),
        )
        self.phase_tx_counter.update(len(self.phase_counters))
        self.phase_tx_counter.count(phase_tsstate)

        self.states_history.append(tsstates)
        if len(self.states_history) > self.threshold_history:
            self.states_history = self.states_history[1:]

    def get_phases_tx(self) -> dict:
        """Phases document (phase.go:176-199)."""
        txs = [c.get_tx() for c in self.phase_counters]
        tx = self.phase_tx_counter.get_tx()
        tx_metric = tx[0] if len(tx) > 0 else None
        return {"phases": txs, "tx": tx_metric}

    def get_phase(self) -> int:
        return self.phase_pointer
