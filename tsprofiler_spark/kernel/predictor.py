"""Profile consumer: simulation and k-step likeliness.

Re-expression of reference: predictor/*.go. Randomness is a seeded
``random.Random`` (the reference uses math/rand; exact RNG streams carry no
semantics, determinism does). The k-step likeliness recursion replicates the
int-percent arithmetic of predictor/likeliness.go:9-56 exactly.
"""

from __future__ import annotations

import math
import random

from tsprofiler_spark.kernel.rounding import go_round
from tsprofiler_spark.kernel.tree import PeriodTree

MODE_ROOTTX = "roottx"
MODE_PHASES = "phases"
MODE_PERIODS = "periods"


class CounterRng:
    """Deterministic counter-based RNG for the driver's value-checked
    simulation (``predictor_simulate_det``).

    The reference draws from math/rand (predictor/util.go:69-84) — the
    exact stream carries no semantics, only the weighted-choice mechanics
    do — so for a DuckDB-replicable walk we substitute a two-round 31-bit
    LCG mix keyed on (seed, call counter). Call ``c`` yields::

        h = (seed*2654435761 + c*40503 + 692541) % 2147483647
        randrange(n) = ((16807*h) % 2147483647) % n

    All intermediates fit in 64-bit signed integers (max product
    ~2^45), so the identical expression evaluates overflow-free in both
    Spark SQL and DuckDB BIGINT arithmetic.
    """

    def __init__(self, seed: int):
        self.seed = seed
        self.calls = 0

    def randrange(self, n: int) -> int:
        c = self.calls
        self.calls += 1
        h = (self.seed * 2654435761 + c * 40503 + 692541) % 2147483647
        return ((16807 * h) % 2147483647) % n


def _find_metric(txmatrices: list[dict], metric: str) -> dict | None:
    found = None
    for tx in txmatrices:
        if tx["metric"] == metric:
            found = tx
    return found


def _find_history(tx: dict, state_history: str) -> dict | None:
    """Ident lookup with history-cut fallback (predictor/util.go:29-47)."""
    parts = state_history.split("-")
    while len(parts) > 0:
        step = tx["transitions"].get("-".join(parts))
        if step is not None:
            return step
        parts = parts[1:]
    return None


def _find_by_step_prob(tx: dict) -> dict | None:
    """Highest-StepProb fallback (predictor/util.go:49-67)."""
    state = ""
    step_prob = 0
    for s, step in tx["transitions"].items():
        if step["probability"] > step_prob:
            state = s
            step_prob = step["probability"]
    if state == "":
        return None
    return _find_history(tx, state)


class Predictor:
    def __init__(
        self,
        profile: dict,
        mode: str = MODE_ROOTTX,
        seed: int = 42,
        rng=None,
        noise: bool = True,
    ):
        self.profile = profile
        self.mode = mode
        self.rng = rng if rng is not None else random.Random(seed)
        self.noise = noise
        self.settings = profile["settings"]
        self.current_phase = 0
        self.period_path: list[int] = [0] * len(self.settings.get("periodsize", []))
        self.period_path_depth = len(self.period_path)
        self.period_size_counter = [0] * len(self.settings.get("periodsize", []))
        # The profile dict is immutable for the predictor's lifetime, so the
        # period tree is parsed once instead of per simulation step.
        self._period_tree = (
            PeriodTree.from_json_dict(profile["periodTree"]) if mode == MODE_PERIODS else None
        )
        self.current_state: dict[str, str] = {}
        self._initialize_state()

    # -- matrix selection (predictor.go:41-57) ---------------------------------

    def _tx_matrices(self) -> list[dict]:
        if self.mode == MODE_ROOTTX:
            return self.profile["roottx"]
        if self.mode == MODE_PHASES:
            return self.profile["phases"]["phases"][self.current_phase]
        if self.mode == MODE_PERIODS:
            depth = min(self.period_path_depth, len(self.period_path))
            node = self._period_tree.get_node(self.period_path[:depth])
            return node.txmatrix
        return self.profile["roottx"]

    def _initialize_state(self) -> None:
        """Init state = argmax StepProb per metric (predictor.go:222-244)."""
        current: dict[str, str] = {}
        for tx in self._tx_matrices():
            metric = tx["metric"]
            if metric in current:
                continue
            state, step_prob = "", 0
            for s, step in tx["transitions"].items():
                if step["probability"] > step_prob:
                    state, step_prob = s, step["probability"]
            if state == "":
                continue
            current[metric] = state
        self.current_state = current

    # -- simulation -------------------------------------------------------------

    def _weighted_choice(self, weights: list[int]) -> int:
        total = sum(w for w in weights if w > 0)
        if total <= 0:
            raise ValueError("no positive weights for weighted choice")
        r = self.rng.randrange(total)
        acc = 0
        for i, w in enumerate(weights):
            if w <= 0:
                continue
            acc += w
            if r < acc:
                return i
        return len(weights) - 1

    def _next_phase(self) -> None:
        tx = self.profile["phases"]["tx"]
        if tx is None:
            return
        step = _find_history(tx, str(self.current_phase))
        if step is None:
            return
        nxt = self._weighted_choice(step["nextProbs"])
        prev = self.current_phase
        self.current_phase = nxt
        if prev != nxt:
            self._initialize_state()

    def _next_period(self, level: int) -> bool:
        """Odometer advance (predictor.go:142-167)."""
        sizes = self.settings.get("periodsize", [])
        if level < len(self.period_path) - 1:
            if self._next_period(level + 1):
                self.period_path[level] += 1
                if self.period_path[level] >= sizes[level]:
                    self.period_path[level] = 0
                    return True
        else:
            self.period_size_counter[level] += 1
            if self.period_size_counter[level] >= sizes[level]:
                self.period_size_counter[level] = 0
                return True
        return False

    def _value_from_state(self, state: int, states: int, vmin: float, vmax: float, stddev: float) -> int:
        """Value reconstruction (predictor/util.go:86-95)."""
        state_size = go_round(float(vmax - vmin) / float(states))
        if state_size <= 0:
            return 0
        if not self.noise:
            # det mode (predictor_simulate_det): no noise draw, so the RNG
            # call counter advances exactly once per step (weighted choice)
            # and the walk is SQL-replicable.
            return int(go_round(vmin + float(state) * state_size))
        # Go divides stddev/max unguarded (predictor/util.go:93); with
        # max == 0 (possible for non-fixed-bound all-negative series, where
        # the buffer's pinned Max zero-init keeps stats max at 0) float64
        # division yields ±Inf/NaN instead of crashing. Mirror IEEE here:
        # Python raises ZeroDivisionError on float x/0.0, Go does not.
        draw = float(self.rng.randrange(int(state_size)))
        if vmax == 0.0:
            if stddev > 0.0:
                ratio = math.inf
            elif stddev < 0.0:
                ratio = -math.inf
            else:
                ratio = math.nan
        else:
            ratio = stddev / vmax
        noise = draw * ratio
        value = vmin + float(state) * state_size + noise
        if not math.isfinite(value):
            # Go's int64(math.Round(x)) on NaN/±Inf is the amd64 CVTTSD2SI
            # saturation value (math.MinInt64); keep the same defined result.
            return -(2**63)
        return int(go_round(value))

    def simulate(self, steps: int) -> list[list[dict]]:
        """k-step simulation (predictor.go:191-220)."""
        simulation: list[list[dict]] = []
        for _ in range(steps):
            if self.mode == MODE_PHASES:
                self._next_phase()
            elif self.mode == MODE_PERIODS:
                self._next_period(0)
            txmatrices = self._tx_matrices()

            step_out: list[dict] = []
            next_hist: dict[str, str] = {}
            for metric, state_history in self.current_state.items():
                tx = _find_metric(txmatrices, metric)
                if tx is None:
                    continue
                step = _find_history(tx, state_history)
                if step is None:
                    step = _find_by_step_prob(tx)
                    if step is None:
                        raise ValueError(f"no transition found for metric {metric}")
                nxt = self._weighted_choice(step["nextProbs"])
                stats = tx["stats"]
                sim_value = self._value_from_state(
                    nxt,
                    self.settings["states"],
                    stats["min"],
                    stats["max"],
                    stats["stddev"],
                )
                step_out.append({"metric": metric, "state": nxt, "value": sim_value})
                next_hist[metric] = str(nxt)
            self._append_state(next_hist)
            simulation.append(step_out)
        return simulation

    def _append_state(self, states: dict[str, str]) -> None:
        """History window append (predictor.go:246-268)."""
        for metric, state in states.items():
            hist = self.current_state.get(metric)
            if hist is None:
                self.current_state[metric] = state
                continue
            arr = hist.split("-")
            if len(arr) >= self.settings["history"]:
                arr = arr[1:]
            arr.append(state)
            self.current_state[metric] = "-".join(arr)

    # -- k-step likeliness (predictor/likeliness.go:9-56) ------------------------

    def likeliness(self, current_state: dict[str, str], steps: int) -> dict[str, list[int]]:
        output: dict[str, list[int]] = {}
        txmatrices = self._tx_matrices()
        n_states = self.settings["states"]
        for tx in txmatrices:
            metric = tx["metric"]
            if metric not in output:
                output[metric] = [0] * n_states
            step = tx["transitions"].get(current_state.get(metric, ""), {"nextProbs": [0] * n_states})
            if steps > 1:
                for next_state, next_prob in enumerate(step["nextProbs"]):
                    if next_prob <= 0:
                        continue
                    sub = self.likeliness({metric: str(next_state)}, steps - 1)
                    for x in range(len(output[metric])):
                        nsp = float(sub[metric][x]) / 100.0
                        tsp = float(next_prob) / 100.0
                        output[metric][x] += int(go_round(nsp * tsp * 100.0))
            else:
                output[metric] = list(step["nextProbs"])
        return output
