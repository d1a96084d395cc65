#!/usr/bin/env python
"""tspredictor — TSProfile + History JSON in, simulate/likeliness out.

Analogue of the reference's second CLI
(/root/reference/cmd/tspredictor/main.go:25-51). Task selection, flags,
predictor seeding from the history doc (last historic state, current
phase, period path — task/util.go:8-20), and the CSV-ish stdout formats
(task/simulate.go:41-64: metric header + one state row per step;
task/likeliness.go:41-60: state column + per-metric probability columns)
match the reference. Modes accept the reference's numeric values (0/1/2)
or names (roottx/phases/periods — predictor/consts.go:6-15).

Runs the deterministic predictor kernel on the driver (one profile = one
small document; the distributed path for scoring millions of profiles is
`predictor_likeliness` / `predictor_simulate` in __spark_entry__, which
run the same kernel Arrow-batched under mapInPandas).

Usage: python tools/tspredictor.py simulate -p profile.json -y history.json --steps 40
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsprofiler_spark.kernel.predictor import (  # noqa: E402
    MODE_PERIODS,
    MODE_PHASES,
    MODE_ROOTTX,
    Predictor,
)

_MODES = {
    "0": MODE_ROOTTX, "roottx": MODE_ROOTTX,
    "1": MODE_PHASES, "phases": MODE_PHASES,
    "2": MODE_PERIODS, "periods": MODE_PERIODS,
}


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        prog="tspredictor",
        description="Reads a TSProfile from file and runs tasks on it (simulate or likeliness)",
    )
    ap.add_argument("task", choices=("simulate", "likeliness"))
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--mode", default="0", choices=sorted(_MODES),
                    help="0/roottx, 1/phases, 2/periods")
    ap.add_argument("--periodDepth", type=int, default=0)
    ap.add_argument("-p", "--profile", required=True)
    ap.add_argument("-y", "--history", required=True)
    ap.add_argument("--seed", type=int, default=42,
                    help="RNG seed for simulate (reference uses math/rand; "
                    "exact RNG streams carry no semantics, determinism does)")
    return ap.parse_args(argv)


def create_predictor(profile: dict, mode: str, history: dict, period_depth: int, seed: int) -> Predictor:
    """Seed predictor state from the history doc (task/util.go:8-20)."""
    pred = Predictor(profile, mode=mode, seed=seed)
    if history.get("historicStates"):
        pred.current_state = dict(history["historicStates"][-1])
    pred.current_phase = int(history.get("currentPhase", 0))
    period_path = list(history.get("periodPath") or [])
    if period_path:
        pred.period_path = period_path
    if period_depth > 0:
        pred.period_path_depth = period_depth
    return pred


def run(args) -> None:
    with open(args.profile) as f:
        profile = json.load(f)
    with open(args.history) as f:
        history = json.load(f)
    mode = _MODES[args.mode]
    pred = create_predictor(profile, mode, history, args.periodDepth, args.seed)

    if args.task == "simulate":
        simulation = pred.simulate(args.steps)
        if not simulation:
            return
        print(",".join(o["metric"] for o in simulation[0]))
        for step_out in simulation:
            print(",".join(str(o["state"]) for o in step_out))
    else:
        current = history["historicStates"][-1] if history.get("historicStates") else {}
        lik = pred.likeliness(dict(current), args.steps)
        if not lik:
            return
        metrics = list(lik)
        print("state," + ",".join(metrics))
        for state in range(profile["settings"]["states"]):
            print(f"{state}," + ",".join(str(lik[m][state]) for m in metrics))


if __name__ == "__main__":
    run(parse_args())
