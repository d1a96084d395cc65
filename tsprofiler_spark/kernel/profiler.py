"""Reference-pipeline oracle: the full profiler replayed sequentially.

Faithful re-expression of the reference dataflow
(profiler/profiler.go:99-133 + profiler/buffer/buffer.go +
profiler/discretizer/descretizer.go). This is the golden oracle the Spark
pipeline is validated against, and the kernel that parity-mode
``applyInPandas`` folds execute per series.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tsprofiler_spark.config import Settings
from tsprofiler_spark.kernel.counter import Counter, TSState
from tsprofiler_spark.kernel.discretize import closest_discretize
from tsprofiler_spark.kernel.period import Period
from tsprofiler_spark.kernel.phase import Phase
from tsprofiler_spark.kernel.stats import TSStats, compute_chunk_stats
from tsprofiler_spark.kernel.tree import PeriodTree


@dataclass
class _Buffer:
    """One metric's chunk buffer (models/tsbuffer.go:4-33).

    Quirks preserved: Min sentinel -1; Max zero-init, so all-negative
    chunks keep Max = 0.
    """

    metric: str
    raw: list[float] = field(default_factory=list)
    min: float = -1.0
    max: float = 0.0
    fixed_min: float = 0.0
    fixed_max: float = 0.0

    def append(self, value: float) -> None:
        self.raw.append(value)
        if value > self.max:
            self.max = value
        if self.min == -1 or value < self.min:
            self.min = value


class ReferenceProfiler:
    """Sequential replay of the reference profiler for one series."""

    def __init__(self, settings: Settings):
        self.settings = settings
        self.overall_counter = Counter(
            settings.history, settings.states, settings.buffer_size
        )
        self.period = Period(
            settings.history,
            settings.states,
            settings.buffer_size,
            list(settings.period_size),
        )
        self.phase = Phase(
            settings.history,
            settings.states,
            settings.buffer_size,
            settings.phase_change_likeliness,
            settings.phase_change_history,
            settings.phase_change_history_fadeout,
        )
        self.last_states: list[TSState] = []
        # per-chunk phase assignment trace: (phase_pointer, n_phases) after
        # each closed chunk — two ints per chunk, lets parity_phases expose
        # the phase fold (phase.go:64-206) as a value-checkable relation
        self.phase_trace: list[tuple[int, int]] = []
        self._buffers: list[_Buffer] = []
        self._buffer_index: dict[str, int] = {}
        self._item_count = 0

    # -- ingest --------------------------------------------------------------

    def put(self, metrics: list[tuple[str, float]]) -> None:
        """One TSInput across all metrics (profiler.go:99-133).

        The chunk closes on *input count*, not per-metric count.
        """
        for name, value in metrics:
            idx = self._buffer_index.get(name)
            if idx is None:
                idx = len(self._buffers)
                self._buffers.append(
                    _Buffer(
                        metric=name,
                        fixed_min=self.settings.fixed_min,
                        fixed_max=self.settings.fixed_max,
                    )
                )
                self._buffer_index[name] = idx
            buf = self._buffers[idx]
            buf.append(float(value))
            buf.fixed_min = self.settings.fixed_min
            buf.fixed_max = self.settings.fixed_max
        self._item_count += 1

        if self._item_count >= self.settings.buffer_size:
            buffers = self._buffers
            self._buffers = []
            self._buffer_index = {}
            self._close_chunk(buffers)
            self._item_count = 0

    def _close_chunk(self, buffers: list[_Buffer]) -> None:
        """Chunk-boundary fan-out (profiler.go:107-131): discretize, then
        root counter, period tree, phase detection — in that order, like the
        reference's mutex-serialized dispatch."""
        tsstates = self._discretize(buffers)
        self.overall_counter.count_all(tsstates)
        self.last_states = tsstates
        if len(self.settings.period_size) > 0:
            self.period.count(tsstates)
        if self.settings.phase_change_likeliness != 0:
            self.phase.count(tsstates)
            self.phase_trace.append(
                (self.phase.phase_pointer, len(self.phase.phase_counters))
            )

    def put_block(self, metric_names: list[str], values: np.ndarray) -> None:
        """Vectorized ingest of many complete turns: bit-exact equivalent of
        ``put()`` per row of ``values`` (shape (n_turns, len(metric_names)),
        row order = arrival order, column j = metric_names[j]).

        The reference pipeline is only *sequential per chunk* (the running
        current_avg fold, counter/period/phase) — the per-turn work is pure
        buffer fill, so full chunks skip the per-turn path entirely and the
        chunk min/max come from one numpy reduction per chunk. The pinned
        buffer quirks survive: Max zero-init -> max(0, np.max); the Min
        sentinel (-1) only diverges from np.min when a value is exactly
        -1.0 (models/tsbuffer.go:24-33), and NaN fails both ``<`` and ``>``
        in the sequential fold while np.min/np.max propagate it — so blocks
        containing -1.0 or NaN take the exact per-turn path instead. Partial buffer state (from earlier put()
        calls) is drained per-turn until a chunk boundary; trailing
        incomplete turns are fed per-turn so later puts continue exactly.
        """
        values = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
        n_turns = values.shape[0]
        bsize = self.settings.buffer_size
        i = 0
        while i < n_turns and self._item_count > 0:
            self.put([(m, float(values[i, j])) for j, m in enumerate(metric_names)])
            i += 1
        if not ((values == -1.0).any() or np.isnan(values).any()):
            while i + bsize <= n_turns:
                chunk = values[i : i + bsize]
                buffers = []
                for j, m in enumerate(metric_names):
                    raw = chunk[:, j]
                    buf = _Buffer(
                        metric=m,
                        fixed_min=self.settings.fixed_min,
                        fixed_max=self.settings.fixed_max,
                    )
                    buf.raw = raw
                    buf.min = float(raw.min())
                    mx = float(raw.max())
                    buf.max = mx if mx > 0.0 else 0.0
                    buffers.append(buf)
                self._close_chunk(buffers)
                i += bsize
        for k in range(i, n_turns):
            self.put([(m, float(values[k, j])) for j, m in enumerate(metric_names)])

    def put_series(self, values: np.ndarray, metric: str = "metric_0") -> None:
        """Convenience: feed a 1-metric series in order."""
        for v in np.asarray(values, dtype=np.float64):
            self.put([(metric, float(v))])

    # -- discretizer (descretizer.go:34-85) -----------------------------------

    def _discretize(self, buffers: list[_Buffer]) -> list[TSState]:
        states: list[TSState] = [TSState(metric="", state=0) for _ in buffers]
        current_stats = self.overall_counter.get_stats()
        for i, buf in enumerate(buffers):
            current = current_stats.get(buf.metric)
            current_avg = current.avg if current is not None else 0.0
            stats = compute_chunk_stats(
                np.asarray(buf.raw, dtype=np.float64),
                buf.min,
                buf.max,
                current_avg,
                self.settings.fix_bound,
                buf.fixed_min,
                buf.fixed_max,
            )
            state = closest_discretize(
                stats.avg, self.settings.states, stats.min, stats.max
            )
            if state < 0 or state >= self.settings.states:
                # invalid-state guard leaves the zero-value TSState in place
                # (descretizer.go:52-56)
                continue
            states[i] = TSState(metric=buf.metric, state=state, stats=stats)
        return states

    # -- output ----------------------------------------------------------------

    def get_profile(self) -> dict:
        """Assemble the TSProfile document (profiler.go:151-163)."""
        phases = self.phase.get_phases_tx()
        return {
            "name": self.settings.name,
            "roottx": [
                {
                    "metric": t["metric"],
                    "transitions": t["transitions"],
                    "stats": t["stats"].to_json_dict(),
                }
                for t in self.overall_counter.get_tx()
            ],
            "periodTree": self.period.get_tx().to_json_dict(),
            "phases": {
                "phases": [
                    [
                        {
                            "metric": t["metric"],
                            "transitions": t["transitions"],
                            "stats": t["stats"].to_json_dict(),
                        }
                        for t in phase_tx
                    ]
                    for phase_tx in phases["phases"]
                ],
                "tx": (
                    {
                        "metric": phases["tx"]["metric"],
                        "transitions": phases["tx"]["transitions"],
                        "stats": phases["tx"]["stats"].to_json_dict(),
                    }
                    if phases["tx"] is not None
                    else None
                ),
            },
            "settings": self.settings.to_json_dict(),
        }

    def get_current_phase(self) -> int:
        return self.phase.get_phase()

    def get_current_period_path(self) -> list[int]:
        return self.period.get_current_period_path()

    def get_history(self) -> dict:
        """Predictor resume doc (models/history.go:11-16)."""
        historic = {s.metric: str(s.state) for s in self.last_states if s.metric}
        return {
            "currentPhase": self.get_current_phase(),
            "historicStates": [historic],
            "periodPath": self.get_current_period_path()
            if len(self.settings.period_size) > 0
            else [],
            "nextState": None,
        }
